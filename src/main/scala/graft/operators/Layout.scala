package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Physical-layout operators — how 100 TB of data gets ARRANGED so
  * that scans can skip most of it. The reference's analog is the
  * region-range partitioning its checksum fans out over
  * (`checksum/checksum.go:52-65`): a 1-D sort key gives perfect
  * pruning on that key and none on any other. Z-ordering (bit
  * interleaving, the Morton curve) is the standard multi-dimensional
  * upgrade: sorting by the interleaved key keeps BOTH dimensions
  * locally clustered, so per-file min/max stats prune range predicates
  * on either column — the technique behind Delta/Iceberg Z-ORDER
  * clustering.
  *
  * The key computation is pure integer bit arithmetic on pre-quantized
  * coordinates (shift/and/or of constants — fully codegen'd, and
  * replayable verbatim in any SQL engine), so it is oracle-checkable;
  * the layout BENEFIT (shrunken per-partition bounding boxes) is
  * asserted by LayoutSpec. */
object Layout {

  /** Morton/Z-order key of two quantized coordinates: interleaves the
    * low `bits` bits of each (x in even positions, y in odd). Inputs
    * must already be non-negative and < 2^bits — quantization is the
    * caller's contract (it depends on the column's domain). */
  def zorder2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { b =>
      shiftleft(shiftright(x, b).bitwiseAND(lit(1L)), 2 * b) +
        shiftleft(shiftright(y, b).bitwiseAND(lit(1L)), 2 * b + 1)
    }.reduce(_ + _)
  }

  /** Clamped power-of-two quantizer: floor the double into [0, 2^bits). */
  def quantize(c: Column, bits: Int): Column =
    least(greatest(floor(c), lit(0.0)), lit((1L << bits) - 1.0)).cast("long")

  /** Range-partition + sort by the Z-key: after this, each partition
    * (file, at write time) covers a compact square-ish region of the
    * (x, y) plane instead of a full-width stripe, so min/max stats on
    * BOTH x and y are tight. This is a layout decision — row content
    * is untouched. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, bits: Int,
                 partitions: Int): DataFrame = {
    val withZ = df.withColumn("__z", zorder2(x, y, bits))
    withZ.repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
