package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary dev scratchpad (deleted before final round)
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.printSchema()
    ev.select(col("ts"), (col("ts") / 1000000L).cast("long").as("ms")).show(3, false)
    // char split semantics
    spark.range(1).select(
      split(lit("abc"), "").as("s1"),
      split(lit(""), "").as("s2"),
      split(lit("abc"), "", 0).as("s3")).show(false)
    spark.stop()
  }
}
