package graft.streaming

import graft.operators.Dedup
import graft.sources.Tables
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * rewrites ONLY the buckets its delta touches, so per-batch bytes
  * read/written scale with the batch's vocabulary footprint, not the
  * corpus vocabulary.
  *
  * Commit protocol (the torn-bucket window is CLOSED, not documented
  * away): each bucket's state lives in immutable version directories
  * `bucket=<b>/v=<batchId>/`, written whole to a per-batch staging dir
  * and RENAMED into place, then made visible by atomically creating the
  * `_COMMIT` marker file inside — readers resolve each bucket to its
  * max COMMITTED version and never see a directory without its marker.
  * A crash anywhere (mid-write, mid-rename, before the marker) leaves
  * the new version invisible and the old committed version intact; a
  * crash BETWEEN bucket commits leaves a per-bucket-consistent mix of
  * old and new versions, and the at-least-once replay completes exactly
  * the uncommitted remainder: every committed row carries the
  * `last_batch` id that produced it, and a replayed batch skips buckets
  * whose stored id is already >= its own (batches apply in order, so a
  * replay can only ever see its own id there). Superseded versions are
  * GC'd immediately after each commit — safe against crashes (the new
  * marker exists first) though not against a concurrent reader holding
  * the old listing; a multi-writer deployment would move exactly this
  * protocol onto a table format with a shared manifest log, keeping the
  * bucket layout, touched-set pruning and idempotence logic unchanged.
  */
object Drift {

  /** Token-bucket partition count of the maintained table. 64 keeps
    * directory count trivial while making the per-batch rewrite
    * granularity ~1.6% of the vocabulary per bucket; a 100 TB deployment
    * sizes this so one bucket's counts fit one task comfortably.
    */
  val NumBuckets = 64

  /** The atomic visibility point of a bucket version: single-file
    * create (atomic on POSIX and PUT-semantics object stores alike).
    */
  private val CommitMarker = "_COMMIT"

  private def emptyCounts(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      new org.apache.spark.sql.types.StructType()
        .add("tok", "string").add("c", "long")
        .add("last_batch", "long").add("bucket", "int"))

  private def fsOf(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** Per-bucket max committed version dirs — the read-side manifest
    * resolution. Uncommitted (torn) version dirs are invisible here.
    */
  private def committedDirs(fs: FileSystem, root: Path): Seq[Path] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("bucket="))
      .flatMap { bdir =>
        val committed = fs.listStatus(bdir.getPath).toSeq
          .filter(st => st.isDirectory && st.getPath.getName.startsWith("v="))
          .filter(st => fs.exists(new Path(st.getPath, CommitMarker)))
        if (committed.isEmpty) None
        else Some(committed.maxBy(_.getPath.getName.drop(2).toLong).getPath)
      }

  /** Resolved read of the maintained table (each bucket at its max
    * committed version); `buckets` prunes the LISTING to the named
    * bucket dirs — untouched buckets cost zero reads, zero footers.
    */
  private[graft] def readCounts(spark: SparkSession, countsDir: String,
      buckets: Option[Seq[Int]] = None): DataFrame = {
    val (fs, root) = fsOf(spark, countsDir)
    val all = committedDirs(fs, root)
    val dirs = buckets match {
      case Some(bs) =>
        val keep = bs.map(b => s"bucket=$b").toSet
        all.filter(p => keep(p.getParent.getName))
      case None => all
    }
    if (dirs.isEmpty) emptyCounts(spark)
    else spark.read.parquet(dirs.map(_.toString): _*)
      .select(col("tok"), col("c"), col("last_batch"), col("bucket").cast("int"))
  }

  /** One batch's merge into the maintained table — split out of the
    * stream wiring so the idempotence/pruning/commit contract is
    * directly testable. Returns the bucket ids actually committed
    * (empty on a full replay skip). `crashAfterBuckets` is the spec's
    * crash-injection hook: throw after that many bucket commits, as if
    * the process died between buckets.
    */
  private[graft] def applyBatch(spark: SparkSession, batch: DataFrame,
      batchId: Long, countsDir: String,
      crashAfterBuckets: Int = Int.MaxValue): Seq[Int] = {
    val delta = batch
      .select(explode(Dedup.tokensNE(col("text"))).as("dt"))
      .groupBy(col("dt")).agg(count(lit(1)).as("dc"))
      .withColumn("dbucket", pmod(xxhash64(col("dt")), lit(NumBuckets)).cast("int"))
      .localCheckpoint(true) // evaluated once: touched set + merge below
    // bounded: <= NumBuckets ints
    val touched = delta.select(col("dbucket")).distinct()
      .collect().map(_.getInt(0)).toSeq.sorted
    if (touched.isEmpty) return Nil
    val base = readCounts(spark, countsDir, Some(touched)) // listing-pruned
      .localCheckpoint(true) // materialize BEFORE renaming new versions in
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
    // ONE write job into the batch's staging dir ("bkt" duplicates the
    // bucket column because partitionBy consumes its column), then a
    // metadata-only rename + atomic marker per bucket
    val (fs, root) = fsOf(spark, countsDir)
    val staging = new Path(root, s".staging-b$batchId")
    fs.delete(staging, true) // torn previous attempt of this batch
    merged.withColumn("bkt", col("bucket"))
      .write.partitionBy("bkt").parquet(staging.toString)
    var committed = 0
    todo.foreach { b =>
      if (committed >= crashAfterBuckets)
        throw new RuntimeException(
          s"injected crash after $committed bucket commits of batch $batchId")
      val bdir = new Path(root, s"bucket=$b")
      val dst = new Path(bdir, s"v=$batchId")
      fs.mkdirs(bdir)
      if (fs.exists(dst)) fs.delete(dst, true) // torn, uncommitted remnant
      require(fs.rename(new Path(staging, s"bkt=$b"), dst),
        s"rename into $dst failed")
      fs.create(new Path(dst, CommitMarker), true).close() // THE commit point
      committed += 1
      // GC every superseded/torn sibling version — the new marker exists,
      // so a crash mid-GC only delays cleanup, never loses state
      fs.listStatus(bdir).foreach { st =>
        if (st.getPath.getName != s"v=$batchId") fs.delete(st.getPath, true)
      }
    }
    fs.delete(staging, true)
    todo
  }

  /** Maintain the incoming stream's token counts under `countsDir` —
    * see [[applyBatch]] for the per-batch merge contract. Restart-safe:
    * AvailableNow replays only unprocessed files on clean restart, the
    * last_batch guard makes the crash-replay of a committed batch a
    * no-op, and the versioned-bucket commit protocol makes a crash
    * ANYWHERE inside a batch invisible to readers.
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
    val b = readCounts(spark, countsDir)
      .select(col("tok").as("bt"), col("c").as("c_b"))
    graft.queries.Quality.klReportOf(
      a.join(b, col("tok") === col("bt"), "full_outer")
        .select(coalesce(col("tok"), col("bt")).as("tok"),
          coalesce(col("c_a"), lit(0L)).as("c_a"),
          coalesce(col("c_b"), lit(0L)).as("c_b")))
  }
}
