package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only A/B probe for the r18 iterative-graph rework: times the
  * checkpointed-loop vs fused-linear shapes of bfs_hops / kcore in one
  * session, with job/stage/task counts from a listener, so the
  * per-round fixed cost attributes to a mechanism instead of a guess.
  */
object IterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages += 1; tasks += sc.stageInfo.numTasks
      }
    })
    def t[A](name: String)(body: => A): A = {
      val (j0, s0, t0) = (jobs, stages, tasks)
      val n0 = System.nanoTime()
      val r = body
      println(f"[prof] $name: ${(System.nanoTime() - n0) / 1e9}%.3f s " +
        s"jobs=${jobs - j0} stages=${stages - s0} tasks=${tasks - t0}")
      r
    }
    t("warm_edges") { graft.queries.Graph.edgeTable(spark, sfDir).count() }
    t("warm_hub") { graft.queries.Graph.hubSeedAndNodes(spark, sfDir) }
    val edges = graft.queries.Graph.edgeTable(spark, sfDir)
    val deg = graft.queries.Graph.degreeTable(spark, sfDir)
    val (seed, nNodes) = graft.queries.Graph.hubSeedAndNodes(spark, sfDir)
    val small = nNodes <= graft.operators.PageRank.BroadcastNodeLimit
    def bcIf(df: DataFrame): DataFrame = if (small) broadcast(df) else df

    (1 to 2).foreach { p =>
      println(s"--- pass $p ---")
      // A: old checkpointed bfs loop
      t("bfs_ckpt_loop") {
        var dist = deg.filter(col("src") === seed)
          .select(col("src").as("node"), lit(0L).as("hop"))
        var prev: Option[DataFrame] = None
        for (_ <- 1 to 4) {
          val distSrc = dist.withColumnRenamed("node", "src")
          val nxt = edges.join(bcIf(distSrc), "src")
            .select(col("dst").as("node"), (col("hop") + 1L).as("hop"))
          val updated = dist.union(nxt)
            .groupBy(col("node")).agg(min(col("hop")).as("hop"))
            .localCheckpoint()
          prev.foreach(org.apache.spark.sql.graft.Bridge.unpersistLocalCheckpoint)
          prev = Some(updated)
          dist = updated
        }
        dist.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("hop")).count()
      }
      // B: fused self-loop linear chain
      t("bfs_fused_selfloop") {
        val edges2 = edges.union(deg.select(col("src"), col("src").as("dst")))
        var dist = deg.filter(col("src") === seed)
          .select(col("src").as("node"), lit(0L).as("hop"))
        for (_ <- 1 to 4) {
          val distSrc = dist.withColumnRenamed("node", "src")
          dist = edges2.join(bcIf(distSrc), "src")
            .select(col("dst").as("node"),
              (col("hop") + when(col("dst") === col("src"), 0L).otherwise(1L)).as("hop"))
            .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        }
        dist.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("hop")).count()
      }
      // C: fused self-loop, rank frame checkpointed once at the end
      t("bfs_fused_ckpt_last") {
        val edges2 = edges.union(deg.select(col("src"), col("src").as("dst")))
        var dist = deg.filter(col("src") === seed)
          .select(col("src").as("node"), lit(0L).as("hop"))
        for (_ <- 1 to 4) {
          val distSrc = dist.withColumnRenamed("node", "src")
          dist = edges2.join(bcIf(distSrc), "src")
            .select(col("dst").as("node"),
              (col("hop") + when(col("dst") === col("src"), 0L).otherwise(1L)).as("hop"))
            .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        }
        dist.localCheckpoint().groupBy(col("hop"))
          .agg(count(lit(1)).as("n_nodes")).orderBy(col("hop")).count()
      }
      // D: fused linear chain WITHOUT broadcast hints (shuffle joins)
      t("bfs_fused_noBC") {
        val edges2 = edges.union(deg.select(col("src"), col("src").as("dst")))
        var dist = deg.filter(col("src") === seed)
          .select(col("src").as("node"), lit(0L).as("hop"))
        for (_ <- 1 to 4) {
          val distSrc = dist.withColumnRenamed("node", "src")
          dist = edges2.join(distSrc, "src")
            .select(col("dst").as("node"),
              (col("hop") + when(col("dst") === col("src"), 0L).otherwise(1L)).as("hop"))
            .groupBy(col("node")).agg(min(col("hop")).as("hop"))
        }
        dist.groupBy(col("hop")).agg(count(lit(1)).as("n_nodes"))
          .orderBy(col("hop")).count()
      }
    }
    spark.stop()
  }
}
