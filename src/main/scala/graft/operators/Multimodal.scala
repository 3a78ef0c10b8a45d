package graft.operators

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.sql.{Column, DataFrame, Dataset}

/** Multimodal-column operators (north-star mandate): image/audio/video
  * content as opaque `BinaryType` blobs with typed, queryable metadata.
  *
  * The Spark-side plumbing — blob schema, header decode, partition-wise
  * batch feature extraction, byte/frame sampling operators, partitioning
  * behavior — is real and tested. The actual media codecs are STUBBED
  * with deterministic fakes (this container has no image/audio
  * libraries): "decode+resize" samples payload bytes, "frame sampling"
  * slices fixed-size frames, "feature extraction" computes byte-moment
  * statistics. Swapping a real codec in changes only the per-record
  * kernel inside `sampleBytes` / `extractFeatures`; every plan shape
  * stays identical.
  *
  * Blob layout (self-describing, 13-byte ASCII header + payload):
  *   [0,4)   magic  "IMG1"
  *   [4,8)   width  (4-digit decimal)
  *   [8,12)  height (4-digit decimal)
  *   [12,13) channels (1 digit)
  *   [13,..) payload bytes
  */
object Multimodal {

  val HeaderLen = 13

  /** Deterministic fake media corpus derived from `embeddings` — blob
    * dimensions and payload are pure functions of vec_id, so the DuckDB
    * oracle can recompute every expected metadata value. */
  def synthesize(emb: DataFrame): DataFrame =
    emb.select(
      col("vec_id").as("media_id"),
      concat(
        lit("IMG1"),
        lpad((lit(16) + col("vec_id") % 48).cast("string"), 4, "0"),
        lpad((lit(16) + col("vec_id") % 32).cast("string"), 4, "0"),
        (lit(1) + col("vec_id") % 3).cast("string"),
        repeat(md5(col("vec_id").cast("string")), 4)).cast("binary").as("blob"))

  /** Typed metadata projection out of the binary header (pure codegen'd
    * substring/cast — the blob never leaves Tungsten format). */
  def decodeMeta(blobs: DataFrame, blobCol: String = "blob"): DataFrame = {
    val b = col(blobCol)
    blobs
      .withColumn("magic", substring(b, 1, 4).cast("string"))
      .withColumn("width", substring(b, 5, 4).cast("string").cast("int"))
      .withColumn("height", substring(b, 9, 4).cast("string").cast("int"))
      .withColumn("channels", substring(b, 13, 1).cast("string").cast("int"))
      .withColumn("payload_bytes", length(b) - HeaderLen)
  }

  /** STUB decode+resize kernel: every `stride`-th chunk of `chunk`
    * payload bytes. thumbnail = (chunk 1, stride k); video frame-sample
    * = (chunk frameSize, stride frameSize*k). */
  def sampleBytes(blob: Array[Byte], offset: Int, stride: Int, chunk: Int): Array[Byte] = {
    if (blob == null || blob.length <= offset) return Array.emptyByteArray
    val n = blob.length
    val out = new java.io.ByteArrayOutputStream()
    var i = offset
    while (i < n) {
      val end = math.min(i + chunk, n)
      out.write(blob, i, end - i)
      i += stride
    }
    out.toByteArray
  }

  /** Column form of the sampling kernel (codegen'd). */
  def sampleBytesCol(blob: Column, offset: Int, stride: Int, chunk: Int): Column =
    Bridge.column(SampleBytesExpr(Bridge.expression(blob), offset, stride, chunk))

  /** Thumbnail stub: every k-th payload byte. */
  def thumbnail(blob: Column, k: Int): Column =
    sampleBytesCol(blob, HeaderLen, k, 1)

  /** Video frame-sampling stub: every k-th frame of `frameSize` bytes. */
  def frameSample(blob: Column, frameSize: Int, k: Int): Column =
    sampleBytesCol(blob, HeaderLen, frameSize * k, frameSize)

  /** STUB feature extraction, batch-per-partition (the Scala analog of a
    * `mapInPandas` batch UDF): each partition streams its blobs through
    * one kernel call, emitting a fixed-width feature vector (byte count
    * + first three byte-value moments of the payload). */
  def extractFeatures(blobs: DataFrame, blobCol: String = "blob",
                      idCol: String = "media_id"): DataFrame = {
    val spark = blobs.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = blobs
      .select(col(idCol).cast("long"), col(blobCol)).as[(Long, Array[Byte])]
    ds.mapPartitions { it =>
      it.map { case (id, blob) =>
        val payload = if (blob.length > HeaderLen) blob.drop(HeaderLen) else Array.emptyByteArray
        val n = payload.length.max(1)
        val m1 = payload.map(_ & 0xFF).sum.toDouble / n
        val m2 = payload.map(b => { val d = (b & 0xFF) - m1; d * d }).sum / n
        val m3 = payload.map(b => { val d = (b & 0xFF) - m1; d * d * d }).sum / n
        (id, payload.length, m1, m2, m3)
      }
    }.toDF(idCol, "payload_bytes", "byte_mean", "byte_var", "byte_skew")
  }

  /** Twin-id offset for [[withPlantedTwins]]: the smallest power of 10
    * strictly above every corpus id — derived by digit count (pure
    * string arithmetic, `'1' || repeat('0', digits(max))`), so the
    * DuckDB oracle replays the identical derivation from `max(vec_id)`
    * at ANY corpus scale and twin ids can never collide with real ids
    * (the round-8 fix for the fixed 1e6 offset, which a 9e7-id sf1
    * corpus collided with). */
  def twinOffset(blobs: DataFrame, idCol: String = "media_id"): Long = {
    val row = blobs.agg(max(col(idCol).cast("long"))).head()
    // max() over zero rows is NULL — surface it as a readable error
    // instead of getLong's bare NullPointerException
    require(!row.isNullAt(0), s"withPlantedTwins: empty corpus (no $idCol)")
    val mx = row.getLong(0)
    require(mx >= 0, s"withPlantedTwins: negative $idCol $mx unsupported")
    ("1" + "0" * mx.toString.length).toLong
  }

  /** Near-duplicate fixture: the corpus plus a perturbed twin of every
    * 10th blob (one payload byte replaced, twin id = id + [[twinOffset]],
    * the smallest power of 10 above the corpus max — collision-free at
    * any scale) — the re-encoded/re-hosted-copy population an image
    * dedup pass hunts. Pure column arithmetic on the blob, so the
    * oracle replays the planting exactly, including the offset
    * derivation. */
  def withPlantedTwins(blobs: DataFrame, idCol: String = "media_id",
                       blobCol: String = "blob"): DataFrame = {
    val off = twinOffset(blobs, idCol)
    blobs.unionAll(blobs.filter(col(idCol) % 10 === 0)
      .select((col(idCol) + lit(off)).as(idCol),
        concat(substring(col(blobCol), 1, HeaderLen),
          lit("z").cast("binary"),
          expr(s"substring($blobCol, ${HeaderLen + 2})")).as(blobCol)))
  }

  /** 60-bit perceptual hash over the stub-decoded payload — the pHash
    * analog on the sanctioned fake kernel: payload bytes fold into 60
    * positional buckets (pos mod 60), bit b = 1 iff bucket b's mean
    * byte value exceeds the reference mean. The comparison is the
    * exact integer cross-multiply `s·n > t·cnt`, so the hash — like
    * every multimodal kernel here — is bit-replayable by the oracle; a
    * real image pipeline swaps the byte buckets for DCT coefficients
    * and keeps every plan shape. One explode + two grouped sums per
    * blob; shuffle currency is (media_id, 60 bucket rows), never blobs.
    *
    * `local = true` thresholds each bucket against its 15-bucket
    * BLOCK's mean instead of the global payload mean (the pHash
    * local-mean refinement): a single-byte perturbation shifts only
    * its own block's threshold, so the 45 bits of the other three
    * blocks cannot flip — recovering the global variant's misses
    * (blobs whose perturbation moved the global mean past several
    * near-threshold buckets) with the same plan shape.
    *
    * PRECONDITION: the byte-faithfulness of the string cast relies on
    * the stub payload being ASCII (hex chars from md5). A real media
    * blob (arbitrary bytes) would be mangled by UTF-8 replacement
    * chars — when real codecs land, fold over the binary directly via
    * the [[sampleBytes]]/[[extractFeatures]] path instead. */
  def phash(blobs: DataFrame, idCol: String = "media_id",
            blobCol: String = "blob", local: Boolean = false): DataFrame = {
    val bytes = blobs
      .select(col(idCol).as("media_id"),
        expr(s"substring($blobCol, ${HeaderLen + 1})").cast("string").as("pay"))
      .select(col("media_id"), posexplode(split(col("pay"), "")).as(Seq("pos", "ch")))
      .filter(col("ch") =!= "")
      .select(col("media_id"), (col("pos") % 60).as("bk"), ascii(col("ch")).as("b"))
    val bs = bytes.groupBy(col("media_id"), col("bk"))
      .agg(sum(col("b")).as("s"), count(lit(1)).as("cnt"))
      // local=false degenerates to one block = the global mean
      .withColumn("blk", if (local) expr("bk div 15") else lit(0))
    val tot = bs.groupBy(col("media_id"), col("blk")).agg(sum(col("s")).as("t"),
      sum(col("cnt")).as("n"))
    bs.join(tot, Seq("media_id", "blk"))
      .groupBy(col("media_id"))
      .agg(sum(when(col("s") * col("n") > col("t") * col("cnt"),
          expr("shiftleft(CAST(1 AS BIGINT), CAST(bk AS INT))"))
        .otherwise(0L)).as("phash"))
  }

  /** Hamming near-duplicate pairs over [[phash]] fingerprints via the
    * [[Dedup.simhashNearDup]] chunk pigeonhole: 4 chunks of 15 bits —
    * hamming ≤ 3 guarantees at least one identical chunk — candidate
    * pairs from a chunk equi-join, exact `bit_count(xor)` verify on
    * candidates only. `maxChunkDf` drops degenerate hot chunks (the
    * all-black-thumbnail class) before the self-join, the same
    * linear-occupancy cap as the text-side banded joins. */
  def phashNearDup(blobs: DataFrame, maxHamming: Int = 3,
                   maxChunkDf: Int = 100, local: Boolean = false): DataFrame = {
    val ph = phash(blobs, local = local)
    val chunks = ph.select(col("media_id"), col("phash"),
        explode(sequence(lit(0), lit(3))).as("c"))
      .withColumn("chunk", expr("(phash >> (c * 15)) & 32767"))
    val keep = chunks.groupBy(col("c"), col("chunk"))
      .agg(count(lit(1)).as("df")).filter(col("df") <= maxChunkDf)
      .select(col("c"), col("chunk"))
    val ck = chunks.join(keep, Seq("c", "chunk"))
    val a = ck.select(col("c"), col("chunk"), col("media_id").as("media_a"),
      col("phash").as("pa"))
    val b = ck.select(col("c"), col("chunk"), col("media_id").as("media_b"),
      col("phash").as("pb"))
    a.join(b, Seq("c", "chunk")).filter(col("media_a") < col("media_b"))
      .select(col("media_a"), col("media_b"), col("pa"), col("pb")).distinct()
      .withColumn("hamming", expr("CAST(bit_count(pa ^ pb) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("media_a"), col("media_b"), col("hamming"))
  }
}

/** `sample_bytes(blob)` with static (offset, stride, chunk) — the
  * stubbed media-decode kernel as a codegen'd expression. */
case class SampleBytesExpr(child: Expression, offset: Int, stride: Int, chunk: Int)
    extends UnaryExpression {
  require(stride > 0 && chunk > 0 && offset >= 0)
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sample_bytes"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sample_bytes requires BINARY, got ${child.dataType.catalogString}")
  override def nullSafeEval(v: Any): Any =
    Multimodal.sampleBytes(v.asInstanceOf[Array[Byte]], offset, stride, chunk)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.operators.Multimodal.sampleBytes($c, $offset, $stride, $chunk)")
  override protected def withNewChildInternal(c: Expression): SampleBytesExpr = copy(child = c)
}
