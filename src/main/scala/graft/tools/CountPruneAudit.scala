package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.functions._

/** Dev-only audit for the quality_model_score lesson (r15, commit
  * 8f6eb92): a benched query consumed via `count()` lets Catalyst
  * ELIMINATE joins the real consumer pays for (outer join on a unique
  * key with no right-side column referenced → row-count preserved →
  * join removed), so the bench times less than the query. This tool
  * compares each declared query's optimized plan against the optimized
  * plan of `count()` over it and flags every query whose count plan
  * carries FEWER Join nodes — the driver then decides which flags are
  * real under-measurement vs an honestly count-free aggregate.
  */
object CountPruneAudit {
  private def joins(p: LogicalPlan): Int =
    p.collect { case j: Join => j }.size

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var flagged = 0
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val base = joins(df.queryExecution.optimizedPlan)
        val counted = joins(df.agg(count(lit(1))).queryExecution.optimizedPlan)
        if (counted < base) {
          flagged += 1
          println(s"[count-prune] $name: $base joins in plan, $counted under count()")
        }
      } catch {
        case e: Throwable =>
          println(s"[count-prune] $name: SKIP (${e.getClass.getSimpleName})")
      }
    }
    println(s"[count-prune] flagged=$flagged of ${graft.SparkEntry.queries.size}")
    spark.stop()
  }
}
