package graft.streaming

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-drift monitor — the deployment shape of
  * `token_kl_drift`: the baseline corpus is static; ingest batches stream
  * in, and the monitor maintains the INCOMING side's unigram counts as a
  * keyed maintained aggregate, so after any batch the drift report of
  * baseline-vs-ingested-so-far is one cheap join away — no rescan of
  * past batches, ever.
  *
  * The maintained table is PARTITIONED BY TOKEN BUCKET
  * (`bucket = xxhash64(tok) % `[[Drift.NumBuckets]]): a batch reads and
  * rewrites ONLY the bucket partitions its delta touches (dynamic
  * partition overwrite), so per-batch bytes read/written scale with the
  * batch's vocabulary footprint, not the corpus vocabulary — the
  * read-merge-overwrite of the WHOLE table that a flat layout forces is
  * gone. foreachBatch is at-least-once, so every bucket row carries the
  * `last_batch` id that produced it: a replayed batch skips buckets
  * whose stored id is already >= its own (batches apply in order, so a
  * replay can only ever see its own id there), which makes the merge
  * idempotent at bucket granularity even when a crash lands between a
  * partial partition commit and the checkpoint commit. Residual honesty:
  * a crash INSIDE one bucket directory's file commit can still leave
  * that directory torn — a real deployment puts this merge on a keyed
  * transactional store (or a table format with atomic commits); the
  * bucket layout, touched-set pruning and idempotence logic carry over
  * unchanged.
  */
object Drift {

  /** Token-bucket partition count of the maintained table. 64 keeps
    * directory count trivial while making the per-batch rewrite
    * granularity ~1.6% of the vocabulary per bucket; a 100 TB deployment
    * sizes this so one bucket's counts fit one task comfortably.
    */
  val NumBuckets = 64

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("tok", "string").add("c", "long")
        .add("last_batch", "long").add("bucket", "int"))

  private def readCounts(spark: SparkSession, countsDir: String): DataFrame =
    try spark.read.parquet(countsDir)
      .select(col("tok"), col("c"), col("last_batch"), col("bucket").cast("int"))
    catch {
      case _: org.apache.spark.sql.AnalysisException => emptyCounts(spark)
    }

  /** One batch's merge into the maintained table — split out of the
    * stream wiring so the idempotence/pruning contract is directly
    * testable. Returns the bucket ids actually rewritten (empty on a
    * full replay skip).
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, countsDir: String): Seq[Int] = {
    val delta = batch
      .select(explode(Dedup.tokensNE(col("text"))).as("dt"))
      .groupBy(col("dt")).agg(count(lit(1)).as("dc"))
      .withColumn("dbucket", pmod(xxhash64(col("dt")), lit(NumBuckets)).cast("int"))
      .localCheckpoint(true) // evaluated once: touched set + merge below
    // bounded: <= NumBuckets ints
    val touched = delta.select(col("dbucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Nil
    val base = readCounts(spark, countsDir)
      .filter(col("bucket").isin(touched: _*)) // partition-pruned read
      .localCheckpoint(true) // materialize BEFORE overwriting the path
    // at-least-once replay guard: a bucket whose stored last_batch is
    // already >= this batchId was committed by a previous attempt of
    // this same batch — leave it out of the write entirely
    val applied = base.filter(col("last_batch") >= batchId)
      .select(col("bucket")).distinct().collect().map(_.getInt(0)).toSet
    val todo = touched.filterNot(applied)
    if (todo.isEmpty) return Nil
    val merged = base.filter(col("bucket").isin(todo: _*))
      .join(delta.filter(col("dbucket").isin(todo: _*)),
        col("tok") === col("dt"), "full_outer")
      .select(coalesce(col("tok"), col("dt")).as("tok"),
        (coalesce(col("c"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"),
        lit(batchId).as("last_batch"),
        coalesce(col("bucket"), col("dbucket")).as("bucket"))
      .localCheckpoint(true)
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic") // replace ONLY written buckets
      .partitionBy("bucket")
      .parquet(countsDir)
    todo
  }

  /** Maintain the incoming stream's token counts under `countsDir` —
    * see [[applyBatch]] for the per-batch merge contract. Restart-safe:
    * AvailableNow replays only unprocessed files on clean restart, and
    * the last_batch guard makes the crash-replay of a committed batch a
    * no-op.
    */
  def streamingTokenCounts(spark: SparkSession, sfDir: String,
      streamDir: String, countsDir: String, ckpt: String): StreamingQuery = {
    val schema = Tables.documents(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, batch, batchId, countsDir)
        ()
      }
      .start()
  }

  /** The drift report of a static baseline vs the maintained incoming
    * counts: full-outer on token (union vocabulary, absent side counts
    * 0), then EXACTLY the batch query's KL math
    * ([[graft.queries.Quality.klReportOf]] — single-sourced, so the
    * streaming monitor can never drift from the declared oracle-gated
    * semantics). StreamingSpec pins this equal to the batch
    * `token_kl_drift` after a full replay of the odd-id snapshot.
    */
  def driftReport(spark: SparkSession, baselineDocs: DataFrame,
      countsDir: String): DataFrame = {
    val a = baselineDocs
      .select(explode(Dedup.tokensNE(col("text"))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c_a"))
    val b = spark.read.parquet(countsDir)
      .select(col("tok").as("bt"), col("c").as("c_b"))
    graft.queries.Quality.klReportOf(
      a.join(b, col("tok") === col("bt"), "full_outer")
        .select(coalesce(col("tok"), col("bt")).as("tok"),
          coalesce(col("c_a"), lit(0L)).as("c_a"),
          coalesce(col("c_b"), lit(0L)).as("c_b")))
  }
}
