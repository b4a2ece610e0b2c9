package graft

import org.apache.spark.sql.SparkSession

/** Recommended session configuration for this engine.
  *
  * Local mode: shuffle partitions sized to the core count (Spark's default
  * 200 is wrong for a single machine); cluster mode: leave
  * `shuffle.partitions` to AQE coalescing and size
  * `files.maxPartitionBytes` so scan tasks stay ~128-256 MB at the target
  * data scale. AQE stays on (runtime re-plan: skew-join splitting,
  * partition coalescing, broadcast demotion).
  */
object GraftSession {

  def builder(master: String = "local[*]", shufflePartitions: Int =
      Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // ObjectHashAggregate (collect_set/collect_list aggs, e.g. the LSH
      // bucket collects) falls back to sort-based aggregation after 128
      // distinct groups per task by default — measured 2x slower on
      // high-cardinality bucket keys; fallback (and its spill safety)
      // re-engages beyond this bound (Dedup sets the same at runtime)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
      .config("spark.ui.enabled", "false")

  /** Build the session and register the graft SQL functions + the
    * TopKPerGroup planner strategy (idempotent).
    */
  def getOrCreate(master: String = "local[*]"): SparkSession = {
    val spark = builder(master).getOrCreate()
    GraftFunctions.register(spark)
    graft.plans.TopKPerGroup.ensureStrategy(spark)
    spark
  }
}
