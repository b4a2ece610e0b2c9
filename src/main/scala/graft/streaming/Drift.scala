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
  * This is the TOKEN-COUNT instance of [[MaintainedCounts]], which owns
  * the storage contract: token-bucket partitioning (per-batch I/O scales
  * with the batch's vocabulary footprint, not the corpus vocabulary),
  * the atomic versioned-bucket commit (`bucket=<b>/v=<batchId>/` dirs
  * made visible by an atomically created `_COMMIT` marker — a crash
  * anywhere leaves the old committed version intact and the new one
  * invisible), and `last_batch` replay idempotence (an at-least-once
  * replay completes exactly the uncommitted remainder). The streaming
  * image-hash dedup census ([[streamingImageHashCounts]]) rides the SAME
  * operator with a different key extractor — the protocol is an
  * operator, not a one-off.
  */
object Drift {

  /** Token-bucket partition count of the maintained table. 64 keeps
    * directory count trivial while making the per-batch rewrite
    * granularity ~1.6% of the vocabulary per bucket; a 100 TB deployment
    * sizes this so one bucket's counts fit one task comfortably.
    */
  val NumBuckets = 64

  /** Resolved read of the maintained token table (each bucket at its
    * max committed version) in this monitor's schema.
    */
  private[graft] def readCounts(spark: SparkSession, countsDir: String): DataFrame =
    MaintainedCounts.readCounts(spark, countsDir)
      .select(col("k").as("tok"), col("c"), col("last_batch"), col("bucket"))

  /** One batch's merge into the maintained table — the token-count
    * delta handed to [[MaintainedCounts.applyBatch]]. Returns the
    * bucket ids actually committed (empty on a full replay skip).
    * `crashAfterBuckets` is the spec's crash-injection hook.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, countsDir: String,
      crashAfterBuckets: Int = Int.MaxValue): Seq[Int] = {
    val delta = batch
      .select(explode(Dedup.tokensNE(col("text"))).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("dc"))
    MaintainedCounts.applyBatch(spark, delta, batchId, countsDir,
      numBuckets = NumBuckets, crashAfterBuckets = crashAfterBuckets)
  }

  /** Maintain the incoming stream's token counts under `countsDir` —
    * see [[MaintainedCounts]] for the merge/commit contract.
    * Restart-safe: AvailableNow replays only unprocessed files on clean
    * restart, the last_batch guard makes the crash-replay of a
    * committed batch a no-op, and the versioned-bucket commit protocol
    * makes a crash ANYWHERE inside a batch invisible to readers.
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

  /** Streaming MULTIMODAL dedup census: maintain the per-aHash image
    * counts incrementally — the second instance of [[MaintainedCounts]]
    * (key = the payload's decoded 64-bit perceptual hash, rendered
    * `hex(hash_hi):hex(hash_lo)`). After any batch, the maintained
    * table IS the `image_dedup` census of everything ingested so far:
    * a batch decodes only its own payloads (map-only), and the merge
    * touches only the hash buckets the batch's images land in.
    * StreamingSpec pins stream-then-read equal to the batch census
    * across a restart.
    */
  def streamingImageHashCounts(spark: SparkSession, sfDir: String,
      streamDir: String, countsDir: String, ckpt: String): StreamingQuery = {
    val schema = Tables.documents(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = graft.operators.Multimodal.imageHashes(spark, batch).toDF()
          .select(concat(hex(col("hash_hi")), lit(":"), hex(col("hash_lo"))).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("dc"))
        MaintainedCounts.applyBatch(spark, delta, batchId, countsDir,
          numBuckets = NumBuckets)
        ()
      }
      .start()
  }

  /** Streaming AUDIO dedup census — the third [[MaintainedCounts]]
    * instance, completing the modality symmetry (image got the
    * deployment shape in round 13; the batch gates exist for all
    * three): key = `n_frames:fp` of the energy-contour fingerprint
    * ([[graft.queries.Pipeline.audioFingerprintOfDocs]] — the SAME
    * definition the batch `audio_dedup` census groups, so the streamed
    * table can never drift from the declared semantics). A batch
    * decodes only its own WAV payloads (map-only); the merge touches
    * only the fingerprint buckets the batch lands in.
    */
  def streamingAudioFpCounts(spark: SparkSession, sfDir: String,
      streamDir: String, countsDir: String, ckpt: String): StreamingQuery = {
    val schema = Tables.documents(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = graft.queries.Pipeline.audioFingerprintOfDocs(spark, batch)
          .select(concat(col("n_frames"), lit(":"), col("fp")).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("dc"))
        MaintainedCounts.applyBatch(spark, delta, batchId, countsDir,
          numBuckets = NumBuckets)
        ()
      }
      .start()
  }

  /** Streaming VIDEO dedup census — the fourth [[MaintainedCounts]]
    * instance: key = `n_frames:hex(hash_hi):hex(hash_lo):contour` of
    * the per-video fingerprint ([[graft.operators.Multimodal
    * .videoHashes]] — the batch `video_dedup` census key). Same
    * map-only decode + bucket-local merge posture as the image and
    * audio gates.
    */
  def streamingVideoHashCounts(spark: SparkSession, sfDir: String,
      streamDir: String, countsDir: String, ckpt: String): StreamingQuery = {
    val schema = Tables.documents(spark, sfDir).schema
    spark.readStream.schema(schema).parquet(streamDir)
      .writeStream
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = graft.operators.Multimodal.videoHashes(spark, batch).toDF()
          .select(concat(col("n_frames"), lit(":"), hex(col("hash_hi")),
            lit(":"), hex(col("hash_lo")), lit(":"), col("contour_fp")).as("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("dc"))
        MaintainedCounts.applyBatch(spark, delta, batchId, countsDir,
          numBuckets = NumBuckets)
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
    val b = readCounts(spark, countsDir)
      .select(col("tok").as("bt"), col("c").as("c_b"))
    graft.queries.Quality.klReportOf(
      a.join(b, col("tok") === col("bt"), "full_outer")
        .select(coalesce(col("tok"), col("bt")).as("tok"),
          coalesce(col("c_a"), lit(0L)).as("c_a"),
          coalesce(col("c_b"), lit(0L)).as("c_b")))
  }
}
