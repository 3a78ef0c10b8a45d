package graft.sources.kvbin

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** "Region"-file KV storage format backing the [[KVBinSource]] DSv2
  * connector — the engine-side analog of a TiKV cluster's
  * region-partitioned key space (reference `checksum/checksum.go:52-65`
  * builds per-region sub-ranges from PD metadata; here the `_index`
  * sidecar IS the region metadata: one line per file with its key
  * range).
  *
  * Layout: `dir/part-NNNNN.kv` — length-prefixed records
  * `[klen:int32][key][vlen:int32][value]`, sorted by key, each file a
  * contiguous key range; `dir/_index` — `fileName<TAB>minKeyHex<TAB>
  * maxKeyHex<TAB>count` per file.
  *
  * Writes happen on EXECUTORS through the Hadoop FS API (file:// in
  * local mode, HDFS/object stores on a cluster); the driver only
  * collects the per-file (min,max,count) triples — bytes never flow
  * through the driver.
  */
object KVBin {

  val IndexFile = "_index"

  /** Write a binary (key, value) frame as `numRanges` contiguous region
    * files + index, stamped with the cluster API version (`#api_version=`
    * header line in the index — the source-side half of the reference's
    * version gate, `utils/utils.go:13-26`). Returns the index entries. */
  def write(kv: DataFrame, dir: String, numRanges: Int,
            apiVersion: String = "V1"): Seq[(String, Array[Byte], Array[Byte], Long)] = {
    val spark = kv.sparkSession
    import spark.implicits._
    // the session's hadoop conf (session-scoped spark.hadoop.* settings,
    // credentials, FS implementations) drives BOTH the driver-side
    // mkdirs/index write and — via Spark's serializable wrapper — the
    // executor-side region writes
    val sconf = new org.apache.spark.util.SerializableConfiguration(
      spark.sessionState.newHadoopConf())
    val fs = FileSystem.get(new java.net.URI(dir), sconf.value)
    fs.mkdirs(new Path(dir))
    val index = kv
      .select(col("key"), col("value"))
      .repartitionByRange(numRanges, col("key"))
      .sortWithinPartitions(col("key"))
      .as[(Array[Byte], Array[Byte])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val name = f"part-$pid%05d.kv"
          val fs = FileSystem.get(new java.net.URI(dir), sconf.value)
          val out = new DataOutputStream(new BufferedOutputStream(
            fs.create(new Path(dir, name), true), 1 << 16))
          var minK: Array[Byte] = null
          var maxK: Array[Byte] = null
          var n = 0L
          it.foreach { case (k, v) =>
            out.writeInt(k.length); out.write(k)
            out.writeInt(v.length); out.write(v)
            if (minK == null) minK = k
            maxK = k
            n += 1
          }
          out.close()
          Iterator.single((name, minK, maxK, n))
        }
      }
      .collect()
      .toSeq
    val lines = s"#api_version=$apiVersion" +: index.map { case (f, mn, mx, n) =>
      s"$f\t${hexOf(mn)}\t${hexOf(mx)}\t$n"
    }
    val out = fs.create(new Path(dir, IndexFile), true)
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
    index
  }

  def hexOf(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString
  def unhex(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  /** One read of the index file → (metadata, region entries). Metadata
    * comes from `#key=value` header lines; indexes written before the
    * stamp existed report api_version V1. */
  def readAll(dir: String, conf: Configuration)
      : (Map[String, String], Seq[(String, Array[Byte], Array[Byte], Long)]) = {
    val fs = FileSystem.get(new java.net.URI(dir), conf)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      fs.open(new Path(dir, IndexFile)), "UTF-8"))
    try {
      val lines = Iterator.continually(in.readLine()).takeWhile(_ != null)
        .filter(_.nonEmpty).toList
      val meta0 = lines.filter(_.startsWith("#"))
        .map(_.stripPrefix("#").split("=", 2))
        .collect { case Array(k, v) => k -> v }.toMap
      val meta = if (meta0.contains("api_version")) meta0
                 else meta0 + ("api_version" -> "V1")
      val entries = lines.filterNot(_.startsWith("#")).map { line =>
        val Array(f, mn, mx, n) = line.split("\t")
        (f, unhex(mn), unhex(mx), n.toLong)
      }
      (meta, entries)
    } finally in.close()
  }

  /** Region index entries: (file, minKey, maxKey, count). */
  def readIndex(dir: String, conf: Configuration): Seq[(String, Array[Byte], Array[Byte], Long)] =
    readAll(dir, conf)._2

  /** Source metadata from the index header. */
  def readMeta(dir: String, conf: Configuration): Map[String, String] =
    readAll(dir, conf)._1

  /** Iterate one region file's records. */
  def readFile(dir: String, name: String, conf: Configuration): Iterator[(Array[Byte], Array[Byte])] = {
    val fs = FileSystem.get(new java.net.URI(dir), conf)
    val in = new DataInputStream(new BufferedInputStream(
      fs.open(new Path(dir, name)), 1 << 16))
    new Iterator[(Array[Byte], Array[Byte])] {
      private var nextRec: (Array[Byte], Array[Byte]) = advance()
      private def advance(): (Array[Byte], Array[Byte]) = {
        val klen = try in.readInt() catch { case _: java.io.EOFException => in.close(); return null }
        val k = new Array[Byte](klen); in.readFully(k)
        val v = new Array[Byte](in.readInt()); in.readFully(v)
        (k, v)
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): (Array[Byte], Array[Byte]) = {
        val r = nextRec; nextRec = advance(); r
      }
    }
  }

  /** Unsigned-lexicographic byte compare (TiKV key order). */
  def compare(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xFF) - (b(i) & 0xFF)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** Convenience: read a kvbin dir through the DSv2 connector. */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.format(classOf[KVBinSource].getName).option("path", dir).load()
}
