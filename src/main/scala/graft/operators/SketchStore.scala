package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-RUN sketch persistence through the house kvbin connector —
  * the incremental corpus-monitor contract: a nightly run builds its
  * wave's sketch cells (HLL registers, bitmap block words, CMS
  * counters) and APPENDS them to a kvbin table; any later run re-reads
  * every persisted wave and folds cells with the sketch's merge law
  * (max for HLL, bit_or for bitmaps, sum for CMS), so the estimate
  * stages ([[Sketches.hllEstimate]], [[Sketches.hllOverlapEstimates]],
  * [[Sketches.bitmapEstimate]], [[Sketches.cmsHeavyHittersFromSketch]])
  * are oblivious to how many runs produced the state. Because the
  * merges are commutative monoids over per-(g, slot) cells, the
  * merged table is EXACTLY the one-shot build over the union of the
  * waves' inputs — the gated entries' oracles are the plain one-shot
  * replays, making the persistence roundtrip + merge a proved
  * identity, not a best-effort approximation. The cells need not be
  * sketches at all: q_ann_ivf_persist stores an IVF codebook's
  * IEEE-754 long bits as single-wave cells, turning the store into a
  * bit-exact model-parameter registry.
  *
  * At 100 TB the payoff is the re-scan this avoids: each wave scans
  * only ITS slice once; the persisted state is |G|·m cells (KBs per
  * group), and pricing NDV / overlap / distinct over the full history
  * reads only those cells. Appends commit via the connector's atomic
  * `_index` swap, so a reader (or the streaming tail) racing a wave's
  * commit sees whole generations only. */
object SketchStore {

  private def fmt = classOf[graft.sources.kvbin.KVBinSource].getName

  /** Persist one wave's sketch cells (g, slot, v: long) as one kvbin
    * generation. Key = `<wave>/<g>/<slot as %012d>` (text — `g` and
    * `wave` must not contain '/', slot must be non-negative: both are
    * asserted IN-PLAN so a violating wave fails its write job rather
    * than corrupting the key order); value = the cell's 8 bytes,
    * big-endian, declared as a `cell:v_be64@0` stat so the read half
    * decodes it as a virtual long column with no byte surgery — and
    * the index sidecar carries per-region cell min/max for free.
    * `mode` "overwrite" starts the table, "append" adds a wave. */
  def writeWave(cells: DataFrame, table: String, wave: String,
                mode: String): Unit = {
    require(!wave.contains("/") && wave.nonEmpty,
      s"wave id must be non-empty and '/'-free, got '$wave'")
    // a RE-appended wave id double-counts under the sum law (and
    // silently no-ops under max/or — same cells twice): the region
    // index's min keys carry the wave prefix, so the check is one
    // driver-side index read, no region opens
    if (mode == "append") {
      val conf = org.apache.spark.sql.SparkSession.active
        .sessionState.newHadoopConf()
      val existing = scala.util.Try(
          graft.sources.kvbin.KVBin.readIndex(table, conf)).toOption
        .getOrElse(Nil)
        .map { case (_, mn, _, _) =>
          new String(mn, "UTF-8").takeWhile(_ != '/') }.toSet
      require(!existing.contains(wave),
        s"SketchStore: wave '$wave' already persisted in $table — " +
        "appending it again would double-count sum-merged cells. Use a " +
        "fresh wave id per run (waves present: " +
        s"${existing.toSeq.sorted.mkString(", ")})")
    }
    val gStr = col("g").cast("string")
    // empty-string rider: evaluates per row, raises on a violating one.
    // Null g / null slot must trip the SAME loud gate — a null would
    // otherwise make the when() condition null, fall to otherwise(), and
    // hand the kvbin writer a silently-null key
    val gate = when(gStr.isNull || col("slot").isNull ||
        gStr.contains("/") || col("slot") < 0,
      raise_error(concat(lit("SketchStore: g must be non-null and " +
        "'/'-free, slot non-null and non-negative, got g="),
        coalesce(gStr, lit("NULL"))))).otherwise(lit(""))
    // once the table declares the `cell` stat, V2 byName resolution
    // demands the virtual column in the input too — the writer ignores
    // its values (stats re-derive from the record bytes), so ship the
    // cell itself: honest placeholder, zero extra compute
    val statCols =
      if (graft.sources.kvbin.KVBinSource.statDefs(table).nonEmpty)
        Seq(col("v").cast("long").as("cell"))
      else Nil
    cells.select(Seq(
        encode(concat(lit(wave + "/"), gStr, lit("/"),
          format_string("%012d", col("slot")), gate), "UTF-8").as("key"),
        unhex(lpad(hex(col("v")), 16, "0")).as("value")) ++ statCols: _*)
      .write.format(fmt).option("path", table)
      .option("stats", "cell:v_be64@0").option("ranges", "4")
      .option("api_version", "V1").mode(mode).save()
  }

  /** Read EVERY persisted wave and fold cells across waves with
    * `merge` (max / bit_or / sum — the sketch's own law). Output
    * (g, slot, v): the shape [[writeWave]] took, feeding the estimate
    * stages unchanged. One kvbin scan of |waves|·|G|·m cell rows — the
    * corpus itself is never touched. */
  def readMerged(s: SparkSession, table: String,
                 merge: Column => Column): DataFrame =
    s.read.format(fmt).option("path", table).load()
      .select(split(decode(col("key"), "UTF-8"), "/").as("parts"),
        col("cell"))
      .select(element_at(col("parts"), 2).as("g"),
        element_at(col("parts"), 3).cast("long").as("slot"),
        col("cell").as("v"))
      .groupBy(col("g"), col("slot"))
      .agg(merge(col("v")).as("v"))
}
