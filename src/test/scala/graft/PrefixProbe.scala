package graft

import org.apache.spark.sql.SparkSession

/** One-off tuning probe (not a test): times editNearDupPrefix at a
  * given SF dir for several q values and proves the outputs identical
  * — q is a volume knob, never a correctness knob, so the bench entry
  * should sit at the cheapest q for the corpus.
  *
  *   sbt "Test/runMain graft.PrefixProbe /root/testdata/sf0.1 2 3 4"
  */
object PrefixProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qs = args.drop(1).map(_.toInt).toSeq match {
      case Nil => Seq(2, 3, 4); case s => s
    }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    var ref: Long = -1L
    qs.foreach { q =>
      val t0 = System.nanoTime()
      val out = graft.operators.Dedup.editNearDupPrefix(
        docs, "text", "doc_id", "lang", maxDistPermille = 50, q = q)
      val rows = out.count()
      val crc = out.selectExpr(
        "sum(crc32(concat_ws('|', doc_a, doc_b, dist)))").head().getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      if (ref == -1L) ref = crc
      println(f"PREFIX_PROBE q=$q%d rows=$rows%d crc=$crc%d sec=$sec%.2f identical=${crc == ref}")
    }
    spark.stop()
  }
}
