package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the iterative graph trio (the round-16
  * creep adjudication): replicates hits_scores' phases with a clock
  * around each job so the wall time attributes to a stage, not a guess.
  */
object GraphProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warm like the bench
    t("warm_edge_table") { graft.queries.Graph.edgeTable(spark, sfDir).count() }
    t("warm_hub_seed") { graft.queries.Graph.hubSeedAndNodes(spark, sfDir) }
    // baseline job latencies in this exact session
    (1 to 3).foreach { i =>
      t(s"baseline_noop_$i") { spark.range(1000).count() }
      t(s"baseline_shuffle_$i") {
        spark.range(1000000).groupBy(expr("id % 100")).count().count()
      }
      t(s"baseline_ckpt_$i") {
        spark.range(1000000).selectExpr("id", "id * 2 AS v")
          .localCheckpoint().count()
      }
      t(s"baseline_edge_scan_$i") {
        graft.queries.Graph.edgeTable(spark, sfDir)
          .filter(col("src") < (1L << 40)).count()
      }
      t(s"baseline_join_agg_nockpt_$i") {
        val PartOffset = 1L << 40
        val sp = graft.queries.Graph.edgeTable(spark, sfDir)
          .filter(col("src") < PartOffset)
          .select(col("src").as("sk"), (col("dst") - PartOffset).as("pk"))
        val h = sp.select(col("sk")).distinct().withColumn("h", lit(1000000L))
        sp.join(broadcast(h), "sk").groupBy(col("pk"))
          .agg(sum(col("h")).as("a0")).count()
      }
    }
    (1 to 2).foreach { p =>
      println(s"--- pass $p ---")
      val PartOffset = 1L << 40
      val sp = graft.queries.Graph.edgeTable(spark, sfDir)
        .filter(col("src") < PartOffset)
        .select(col("src").as("sk"), (col("dst") - PartOffset).as("pk"))
      var h = t("h_distinct") {
        sp.select(col("sk")).distinct().withColumn("h", lit(1000000L))
          .localCheckpoint()
      }
      var a = sp.select(col("pk")).distinct().withColumn("a", lit(1000000L))
      for (i <- 1 to 3) {
        val a0 = t(s"r$i a0_join_agg_ckpt") {
          sp.join(broadcast(h), "sk").groupBy(col("pk"))
            .agg(sum(col("h")).as("a0")).localCheckpoint()
        }
        val am = t(s"r$i a_max") { a0.agg(max(col("a0"))).collect()(0).getLong(0) }
        a = a0.select(col("pk"), expr(s"(a0 * 1000000) div ${am}L").as("a"))
        val h0 = t(s"r$i h0_join_agg_ckpt") {
          sp.join(broadcast(a), "pk").groupBy(col("sk"))
            .agg(sum(col("a")).as("h0")).localCheckpoint()
        }
        val hm = t(s"r$i h_max") { h0.agg(max(col("h0"))).collect()(0).getLong(0) }
        h = h0.select(col("sk"), expr(s"(h0 * 1000000) div ${hm}L").as("h"))
      }
      t("final_topk") {
        h.select(lit("hub").as("kind"), col("sk").as("id"), col("h").as("score"))
          .orderBy(col("score").desc, col("id")).limit(20)
          .union(a.select(lit("authority").as("kind"), col("pk").as("id"),
              col("a").as("score"))
            .orderBy(col("score").desc, col("id")).limit(20))
          .orderBy(col("kind"), col("score").desc, col("id")).count()
      }
    }
    spark.stop()
  }
}
