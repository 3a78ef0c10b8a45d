package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Source-compatibility gate — the analog of the reference's cluster
  * API-version probe + equality check (`utils/utils.go:13-26`, gating
  * every subcommand at `checksum/checksum.go:134-137`,
  * `scan/scan.go:83-86`, `diff/diff.go:81-84`): before comparing two
  * snapshots, verify they encode keys the same way.
  *
  * The version probe inspects key shape: APIv2 raw keys carry the `r`
  * mode prefix (`codec/codec.go:47`), so a snapshot whose keys ALL begin
  * with byte 'r' is V2, anything else V1. One aggregate per side (3
  * longs of state), merged by a literal cross join of two 1-row frames.
  */
object Gate {

  private val rByte = lit(Array('r'.toByte))

  /** One row: (api_version, n_keys) for a binary KV frame. */
  def apiVersionOf(kv: DataFrame): DataFrame =
    kv.agg(
        count(lit(1)).as("n_keys"),
        min(substring(col("key"), 1, 1)).as("__minb"),
        max(substring(col("key"), 1, 1)).as("__maxb"))
      .select(
        when(col("n_keys") > 0 && col("__minb") === rByte && col("__maxb") === rByte, "V2")
          .otherwise("V1").as("api_version"),
        col("n_keys"))

  /** The gate verdict (`checksum/checksum.go:134-137`): both sides'
    * probed versions plus the compatibility flag. */
  def check(src: DataFrame, dst: DataFrame): DataFrame = {
    val s = apiVersionOf(src).select(
      col("api_version").as("src_api_version"), col("n_keys").as("src_n_keys"))
    val d = apiVersionOf(dst).select(
      col("api_version").as("dst_api_version"), col("n_keys").as("dst_n_keys"))
    s.crossJoin(d).withColumn("compatible",
      col("src_api_version") === col("dst_api_version"))
  }
}
