package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: print the optimized logical + executed plan of a declared
  * query — `runMain graft.tools.PlanDump <sfDir> <queryName>`. Not part
  * of the driver contract; exists so plan-shape work (rewrite rules,
  * shuffle audits) has a one-command feedback loop.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 2) {
      System.err.println("usage: PlanDump <sfDir> <queryName> [moreQueryNames...]")
      sys.exit(2)
    }
    // -run: execute each query first so the printed adaptive plan is the
    // FINAL one (runtime exchange/stage reuse only appears post-execution)
    val run = args.contains("-run")
    val rest = args.filterNot(_ == "-run")
    val sfDir = rest(0)
    val names = rest.drop(1).toSeq
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    if (unknown.nonEmpty) {
      System.err.println(s"unknown queries: ${unknown.mkString(", ")}")
      sys.exit(2)
    }
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      if (run) df.collect()
      // println (not log) — the whole point is stdout you can grep
      println(s"=== $name OPTIMIZED ===")
      println(df.queryExecution.optimizedPlan.treeString)
      println(s"=== $name EXECUTED ===")
      println(df.queryExecution.executedPlan.treeString)
    }
    spark.stop()
  }
}
