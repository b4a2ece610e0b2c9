package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized logical + executed plan of a declared
  * query — `runMain graft.tools.PlanDump <sfDir> <queryName>`. Not part
  * of the driver contract; exists so plan-shape work (rewrite rules,
  * shuffle audits) has a one-command feedback loop.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args.take(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    // println (not log) — the whole point is stdout you can grep
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString)
    println("=== EXECUTED ===")
    println(df.queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
