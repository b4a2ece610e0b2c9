package graft.streaming

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming corpus-drift monitor — the deployment shape of
  * `token_kl_drift`: the baseline corpus is static; ingest batches stream
  * in, and the monitor maintains the INCOMING side's unigram counts as a
  * keyed maintained aggregate (the streamingIncrementalAgg
  * read-merge-overwrite posture), so after any batch the drift report of
  * baseline-vs-ingested-so-far is one cheap join away — no rescan of
  * past batches, ever. At 100 TB the maintained count table is a keyed
  * transactional sink and each batch's work is O(batch tokens).
  */
object Drift {

  /** Maintain the incoming stream's token counts under `countsDir`.
    * Each micro-batch: tokenize the batch (map-only), aggregate its
    * delta counts, and merge them into the maintained table by key —
    * read-merge-overwrite here, with the localCheckpoint materializing
    * the merge BEFORE the overwrite (reading and overwriting one path in
    * a single lazy plan is undefined). Restart-safe via the checkpoint:
    * AvailableNow replays only unprocessed files.
    */
  def streamingTokenCounts(spark: SparkSession, sfDir: String,
      streamDir: String, countsDir: String, ckpt: String): StreamingQuery = {
    val schema = Tables.documents(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val delta = batch
          .select(explode(Dedup.tokensNE(col("text"))).as("dt"))
          .groupBy(col("dt")).agg(count(lit(1)).as("dc"))
        val base =
          try spark.read.parquet(countsDir)
          catch { case _: org.apache.spark.sql.AnalysisException =>
            spark.createDataFrame(
              spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
              new org.apache.spark.sql.types.StructType()
                .add("tok", "string").add("c", "long"))
          }
        val merged = base.join(delta, col("tok") === col("dt"), "full_outer")
          .select(coalesce(col("tok"), col("dt")).as("tok"),
            (coalesce(col("c"), lit(0L)) + coalesce(col("dc"), lit(0L))).as("c"))
          .localCheckpoint(true)
        merged.write.mode("overwrite").parquet(countsDir)
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
