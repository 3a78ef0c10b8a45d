package graft

import graft.functions.{Checksum, ChecksumAggregator, Crc64, KVPair, RawChecksum}
import graft.sources.KVSnapshot
import org.apache.spark.sql.functions._

class ChecksumSpec extends SparkTestBase {
  import spark.implicits._

  private def kvDs(pairs: Seq[(String, String)]) =
    pairs.map { case (k, v) => KVPair(k.getBytes("UTF-8"), v.getBytes("UTF-8")) }.toDS()

  test("DataFrame checksum matches a hand-folded reference on a tiny set") {
    val pairs = Seq("a" -> "1", "b" -> "22", "c" -> "333")
    val expected = pairs.foldLeft(RawChecksum.zero) { case (acc, (k, v)) =>
      acc.merge(RawChecksum.of(k.getBytes("UTF-8"), v.getBytes("UTF-8")))
    }
    val row = Checksum.of(kvDs(pairs).toDF()).head()
    assert(row.getLong(0) === expected.crc64_xor)
    assert(row.getLong(1) === expected.total_kvs)
    assert(row.getLong(2) === expected.total_bytes)
  }

  test("applyDelta derives the new snapshot's exact checksum from base + delta") {
    // deterministic pseudo-random mutation of a 400-pair base: delete
    // every 7th, mutate every 5th, insert 40 fresh keys — the identity
    // checksum(B) == applyDelta(checksum(A), deletes, inserts) must hold
    // bit-exactly (XOR self-inverse + count/byte arithmetic)
    val a = (1 to 400).map(i => (f"k$i%05d", s"val-${i * 31 % 97}"))
    val deleted = a.filter { case (k, _) => k.drop(1).toInt % 7 == 0 }
    val mutated = a.filter { case (k, _) => k.drop(1).toInt % 7 != 0 && k.drop(1).toInt % 5 == 0 }
    val fresh = (1001 to 1040).map(i => (s"n$i", s"new-$i"))
    val b = a.filterNot(deleted.contains).map { case (k, v) =>
      if (mutated.exists(_._1 == k)) (k, v + "#MUT") else (k, v)
    } ++ fresh
    val dels = deleted ++ mutated                             // old versions leaving
    val inss = mutated.map { case (k, v) => (k, v + "#MUT") } ++ fresh  // new versions arriving
    val derived = Checksum.applyDelta(
      Checksum.of(kvDs(a).toDF()), kvDs(dels).toDF(), kvDs(inss).toDF()).head()
    val direct = Checksum.of(kvDs(b).toDF()).head()
    assert(derived.getLong(0) === direct.getLong(0))
    assert(derived.getLong(1) === direct.getLong(1))
    assert(derived.getLong(2) === direct.getLong(2))
  }

  test("typed Aggregator agrees with expression-form checksum") {
    val pairs = (1 to 500).map(i => (f"k$i%05d", s"value-$i"))
    val ds = kvDs(pairs)
    val typed = ds.select(ChecksumAggregator.toColumn).head()
    val exprRow = Checksum.of(ds.toDF()).head()
    assert(typed.crc64_xor === exprRow.getLong(0))
    assert(typed.total_kvs === exprRow.getLong(1))
    assert(typed.total_bytes === exprRow.getLong(2))
  }

  test("checksum is partitioning-invariant (1 vs 32 partitions)") {
    val pairs = (1 to 2000).map(i => (f"k$i%06d", s"v$i"))
    val one = Checksum.of(kvDs(pairs).repartition(1).toDF()).head()
    val many = Checksum.of(kvDs(pairs).repartition(32).toDF()).head()
    assert(one === many)
  }

  test("empty input yields monoid identity (0,0,0)") {
    val row = Checksum.of(kvDs(Nil).toDF()).head()
    assert(row.getLong(0) === 0L && row.getLong(1) === 0L && row.getLong(2) === 0L)
  }

  test("verdict: src == src matches; src vs dst (injected divergence) does not") {
    val src = KVSnapshot.src(spark, sfSmoke)
    val dst = KVSnapshot.dst(spark, sfSmoke)
    assert(Checksum.verdict(src, src).head().getAs[Boolean]("matches"))
    assert(!Checksum.verdict(src, dst).head().getAs[Boolean]("matches"))
  }

  test("concurrent two-job verdict equals the single-plan verdict") {
    val src = KVSnapshot.src(spark, sfSmoke)
    val dst = KVSnapshot.dst(spark, sfSmoke)
    val single = Checksum.verdict(src, dst).head()
    val conc = Checksum.verdictConcurrent(src, dst).head()
    assert(conc.toSeq === single.toSeq)
    assert(Checksum.verdictConcurrent(src, src).head().getAs[Boolean]("matches"))
  }

  test("grouped checksum buckets merge to the global checksum") {
    val src = KVSnapshot.src(spark, sfSmoke)
    val buckets = Checksum.byBucket(src, substring(col("key").cast("string"), 1, 10))
      .collect()
    val merged = buckets.foldLeft(RawChecksum.zero) { (acc, r) =>
      acc.merge(RawChecksum(r.getAs[Long]("crc64_xor"), r.getAs[Long]("total_kvs"), r.getAs[Long]("total_bytes")))
    }
    val global = Checksum.of(src).head()
    assert(merged.crc64_xor === global.getLong(0))
    assert(merged.total_kvs === global.getLong(1))
    assert(merged.total_bytes === global.getLong(2))
  }

  test("crc64 expression equals scala impl row-by-row") {
    val pairs = Seq("abc" -> "def", "" -> "", "123456789" -> "")
    import graft.functions.Crc64Expr.crc64Pair
    val got = kvDs(pairs).toDF()
      .select(col("key"), crc64Pair(col("key"), col("value")).as("c"))
      .collect()
      .map(r => new String(r.getAs[Array[Byte]]("key"), "UTF-8") -> r.getAs[Long]("c"))
      .toMap
    pairs.foreach { case (k, v) =>
      assert(got(k) === Crc64.crc64(k.getBytes("UTF-8"), v.getBytes("UTF-8")))
    }
  }
}
