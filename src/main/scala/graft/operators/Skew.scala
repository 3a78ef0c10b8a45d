package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utility for hot keys at 100 TB. AQE's skew-join
  * splitting covers sort-merge joins automatically; explicit salting is
  * the deterministic fallback when a handful of keys dominate (e.g. a
  * diff over a key space with one giant tombstone region, or an
  * inverted-index join on a hot shingle).
  *
  * `saltedJoin` replicates the RIGHT side `salt` times and scatters the
  * left side across the replicas: left rows get `salt_id = hash(row) %
  * salt`, right rows are exploded to all salt_ids, and the equi-join key
  * becomes (key, salt_id) — a hot key's rows now spread over `salt`
  * reducers instead of one. Exact same join result, `salt`× right-side
  * duplication as the price. */
object Skew {

  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salt: Int): DataFrame = {
    require(salt > 1, "salt must be > 1")
    val l = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salt)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0L), lit((salt - 1).toLong))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
