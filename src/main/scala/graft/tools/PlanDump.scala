package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan of named gate queries
  * (the "explain and iterate until it's the plan you'd want" loop).
  * Usage: runMain graft.tools.PlanDump <sfDir> <queryName>...
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { name =>
      println(s"===== $name =====")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
