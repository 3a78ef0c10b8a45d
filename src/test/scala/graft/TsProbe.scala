package graft
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val ev = spark.read.schema(schema).parquet("/root/testdata/sf0.001/events.parquet")
    ev.select(col("ts"), timestamp_micros((col("ts")/1000L).cast("long")).as("ts2")).show(3, false)
    spark.stop()
  }
}
