package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

import graft.functions.KVPair

/** Typed-API formulation of the diff (`diff/diff.go:18-63`) via
  * `KeyValueGroupedDataset.cogroup`: both snapshots group by key, each
  * key's (src rows, dst rows) iterators meet in one function. Same
  * classification as [[Diff.diff]] (DiffLawsSpec cross-checks them);
  * physically it's the same hash-partitioned shuffle as the join, but
  * the per-key kernel is arbitrary Scala — the escape hatch for compare
  * logic SQL can't express (deep value parsing, structural diffs).
  * Prefer [[Diff.diff]] when the compare IS expressible: the join stays
  * in Tungsten/codegen, cogroup deserializes each row once. */
object TypedDiff {

  case class DiffRecord(key: Array[Byte], src_value: Array[Byte],
                        dst_value: Array[Byte], diff_class: String)

  def cogroupDiff(src: Dataset[KVPair], dst: Dataset[KVPair]): Dataset[DiffRecord] = {
    import src.sparkSession.implicits._
    src.groupByKey(_.key.toSeq)
      .cogroup(dst.groupByKey(_.key.toSeq)) { (key, ss, ds) =>
        // KV snapshots hold unique keys; extra rows would mean a
        // malformed snapshot, surfaced as mismatch via headOption
        val s = ss.toSeq.headOption
        val d = ds.toSeq.headOption
        val k = key.toArray
        (s, d) match {
          case (Some(sv), None) =>
            Iterator.single(DiffRecord(k, sv.value, null, "src_only"))
          case (None, Some(dv)) =>
            Iterator.single(DiffRecord(k, null, dv.value, "dst_only"))
          case (Some(sv), Some(dv)) if !java.util.Arrays.equals(sv.value, dv.value) =>
            Iterator.single(DiffRecord(k, sv.value, dv.value, "mismatch"))
          case _ => Iterator.empty
        }
      }
  }
}
