package graft

import graft.streaming.Sessions
import org.apache.spark.sql.functions._

/** Structured Streaming sessionization: the streaming session_window query
  * over the events file stream must agree with the batch session_window
  * aggregation (same operator, incremental execution + watermark state).
  */
class StreamingSpec extends SparkSuite {

  test("streaming session_window equals batch session_window on replay") {
    // stage the events file into a monitored stream directory
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val stream = Sessions.streamingSessionCounts(spark, sf0001, streamDir.toString)
    val q = stream.writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_sessions")
      .start()
    try {
      q.processAllAvailable()
    } finally {
      q.stop()
    }
    val streamed = spark.table("stream_sessions")
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Sessions.sessionWindowAgg(spark, sf0001)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    // watermark may hold back the tail sessions in append mode; everything
    // emitted must match batch, and most sessions must have been emitted
    assert(streamed.subsetOf(batch), s"streamed-only rows: ${streamed -- batch}")
    assert(streamed.size >= batch.size / 2,
      s"too few streamed sessions: ${streamed.size} of ${batch.size}")
    spark.sql("DROP TABLE IF EXISTS stream_sessions")
  }

  test("checkpoint restart: dedup state and file-sink exactly-once survive a stop/start") {
    // The durability contract a production pipeline leans on: stop a
    // stream, restart from the same checkpoint, and (a) the file sink
    // stays exactly-once, (b) operator state (here dropDuplicates ids)
    // is RESTORED — replays arriving after the restart are still
    // dropped. Phase 2 deliberately re-ships 20 phase-1 events.
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ck").toString
    val ev = Sessions.events(spark, sf0001)
      .select(col("event_id"), col("user_id"), col("ts_ms"), col("event_type"))
    // FileStreamSource lists flat files only: copy the part-file out of
    // the directory a DataFrame write produces
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit = {
      val q = spark.readStream.schema(ev.schema).parquet(streamDir.toString)
        .dropDuplicates("event_id")
        .writeStream.outputMode("append")
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val even = ev.filter(col("event_id") % 2 === 0)
    stageFlat(even, "h1.parquet")
    runOnce()
    stageFlat(ev.filter(col("event_id") % 2 === 1).unionAll(even.limit(20)), "h2.parquet")
    runOnce()
    val out = spark.read.parquet(outDir)
    val n = ev.count()
    assert(out.count() === n, "restart must neither duplicate nor lose events")
    assert(out.select("event_id").distinct().count() === n,
      "replayed phase-1 ids must be dropped by state restored from the checkpoint")
  }

  test("streaming incremental-agg maintenance converges to the batch aggregate across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivm")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val target = base.resolve("tgt").toString
    val ckpt = base.resolve("ck").toString
    val ev = Sessions.events(spark, sf0001)
      .select(col("event_id"), col("event_type"), col("ts"), col("user_id"),
        col("value"), col("props"))
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-ivm-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit = {
      val q = Sessions.streamingIncrementalAgg(spark, sf0001,
        streamDir.toString, target, ckpt)
      q.awaitTermination()
    }
    stageFlat(ev.filter(col("event_id") % 2 === 0), "p1.parquet")
    runOnce()
    stageFlat(ev.filter(col("event_id") % 2 === 1), "p2.parquet")
    runOnce() // restart from the same checkpoint: p1 must NOT re-merge
    val got = spark.read.parquet(target).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val expect = Sessions.events(spark, sf0001)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("c"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expect,
      "maintained table must equal the batch aggregate over all ingested events")
  }

  test("streaming drift monitor converges to the batch token_kl_drift across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val countsDir = base.resolve("counts").toString
    val ckpt = base.resolve("ck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val odd = docs.filter(col("doc_id") % 2 === 1)
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-drift-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit =
      graft.streaming.Drift.streamingTokenCounts(spark, sf0001,
        streamDir.toString, countsDir, ckpt).awaitTermination()
    // two ingest batches with a full stop/start between them: the
    // maintained counts must merge, not re-merge, across the restart
    stageFlat(odd.filter(col("doc_id") % 4 === 1), "p1.parquet")
    runOnce()
    stageFlat(odd.filter(col("doc_id") % 4 === 3), "p2.parquet")
    runOnce()
    val got = graft.streaming.Drift
      .driftReport(spark, docs.filter(col("doc_id") % 2 === 0), countsDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expect = graft.queries.Quality.tokenKlDrift(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty && got.sameElements(expect),
      "streamed drift report must equal the batch token_kl_drift after full replay")
  }

  test("transformWithState event-time timers close sessions like batch gap-sessionization") {
    val base = java.nio.file.Files.createTempDirectory("graft-tws-sess")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val events = Sessions.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("ts_ms"), col("user_id"),
        col("event_type"), col("value"), col("props"))
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-tws-stage").toString
      df.drop("ts_ms").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    // file 1: the real corpus; file 2: one sentinel event 10 years out
    // for a dedicated user — once its batch runs, the watermark passes
    // every real session's close timer, so ALL real sessions must close
    stageFlat(events, "e1.parquet")
    val maxMs = events.agg(max(col("ts_ms"))).collect()(0).getLong(0)
    stageFlat(events.limit(1)
      .withColumn("user_id", lit(999999L))
      .withColumn("ts", timestamp_millis(lit(maxMs + 315360000000L))
        .cast(events.schema("ts").dataType)), "e2.parquet")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Sessions.streamingSessionClose(spark, sf0001, streamDir.toString)
        .toDF().writeStream
        .outputMode("append")
        .option("checkpointLocation", base.resolve("ck").toString)
        .format("memory").queryName("tws_sessions").start()
      try q.processAllAvailable() finally q.stop()
      val got = spark.table("tws_sessions")
        .filter(col("user_id") =!= 999999L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      // reference: plain-Scala 30-min gap sessionization of the corpus
      val byUser = events.select(col("user_id"), col("ts_ms")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).groupBy(_._1)
      val ref = byUser.flatMap { case (u, rows) =>
        val ts = rows.map(_._2).sorted
        val sessions = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long)]
        var start = ts.head; var last = ts.head; var n = 1L
        ts.tail.foreach { t =>
          if (t - last > Sessions.GapMs) {
            sessions += ((u, start, last, n)); start = t; last = t; n = 1L
          } else { last = t; n += 1L }
        }
        sessions += ((u, start, last, n))
        sessions
      }.toSet
      assert(got == ref,
        s"closed sessions ${got.size} != batch gap-sessions ${ref.size}")
      assert(got.nonEmpty)
      spark.sql("DROP TABLE IF EXISTS tws_sessions")
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming MG summary converges to batch heavy hitters across a restart") {
    import graft.operators.HeavyHitters
    val k = 32
    val base = java.nio.file.Files.createTempDirectory("graft-mg")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val stateDir = base.resolve("state").toString
    val ckpt = base.resolve("ck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-mg-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit =
      graft.streaming.Sketches.streamingHeavyHitterSummary(spark, sf0001,
        streamDir.toString, stateDir, ckpt, k).awaitTermination()
    // two ingest batches with a full stop/start between them
    stageFlat(docs.filter(col("doc_id") % 2 === 0), "p1.parquet")
    runOnce()
    stageFlat(docs.filter(col("doc_id") % 2 === 1), "p2.parquet")
    runOnce()
    // the on-demand exact report over the ingested corpus must equal
    // the batch two-pass query at the same k
    import spark.implicits._
    val items = docs.select(
      explode(graft.operators.Dedup.tokensNE(col("text"))).as("t")).as[String]
    val batch = HeavyHitters.topOver(items, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    val streamed = graft.streaming.Sketches
      .heavyHittersFrom(spark, docs, stateDir, k).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(batch.nonEmpty && streamed == batch)
    // at-least-once replay of an already-applied batch id is a no-op
    assert(!graft.streaming.Sketches.applySummaryBatch(
      spark, docs.limit(5), 0L, stateDir, k))
    // and the merge's trim honors the mergeable-summaries bound on a
    // crafted over-capacity pair: survivors are the dominant keys
    val a = (1 to 6).map(i => s"a$i" -> 10L).toMap
    val b = (1 to 6).map(i => s"b$i" -> (if (i == 1) 100L else 1L)).toMap
    val m = HeavyHitters.merge(a, b, 4)
    assert(m.size <= 4 && m.contains("b1"), s"merge lost the dominant key: $m")
  }

  test("drift merge is bucket-incremental and replay-idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft-drift-idem")
    val countsDir = base.resolve("counts").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val b1 = docs.filter(col("doc_id") % 4 === 1)
    val b2 = docs.filter(col("doc_id") === 3) // one doc: touches few buckets
    def snap() = graft.streaming.Drift.readCounts(spark, countsDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w1 = graft.streaming.Drift.applyBatch(spark, b1, 0L, countsDir)
    assert(w1.nonEmpty)
    val s1 = snap()
    // at-least-once replay of the SAME batch id must be a full no-op:
    // no bucket rewritten, table unchanged
    assert(graft.streaming.Drift.applyBatch(spark, b1, 0L, countsDir).isEmpty)
    assert(snap() == s1)
    // the next batch rewrites ONLY the buckets its delta touches; every
    // untouched bucket still carries batch 0's id (it was not re-written)
    val w2 = graft.streaming.Drift.applyBatch(spark, b2, 1L, countsDir)
    assert(w2.nonEmpty && w2.size < w1.size,
      s"one doc should touch fewer buckets than the big batch (${w2.size} vs ${w1.size})")
    val byBucket = graft.streaming.Drift.readCounts(spark, countsDir)
      .groupBy(col("bucket")).agg(max(col("last_batch")).as("lb")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    w2.foreach(b => assert(byBucket(b) == 1L))
    byBucket.filterNot { case (b, _) => w2.contains(b) }
      .foreach { case (b, lb) => assert(lb == 0L, s"bucket $b rewritten: $lb") }
    // and the maintained counts equal the batch aggregate over b1 ∪ b2
    val expect = b1.union(b2)
      .select(explode(graft.operators.Dedup.tokensNE(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(snap() == expect)
  }

  test("streaming image-hash census converges to the batch image_dedup counts across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-imgstream")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val countsDir = base.resolve("counts").toString
    val ckpt = base.resolve("ck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-imgstream-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit =
      graft.streaming.Drift.streamingImageHashCounts(spark, sf0001,
        streamDir.toString, countsDir, ckpt).awaitTermination()
    // two ingest batches with a full stop/start between them
    stageFlat(docs.filter(col("doc_id") % 2 === 0), "p1.parquet")
    runOnce()
    stageFlat(docs.filter(col("doc_id") % 2 === 1), "p2.parquet")
    runOnce()
    val got = graft.streaming.MaintainedCounts.readCounts(spark, countsDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // the maintained table IS the batch census of everything ingested
    val expect = graft.operators.Multimodal.imageHashes(spark, docs).collect()
      .groupBy(h => f"${h.hash_hi}%X:${h.hash_lo}%X")
      .map { case (k, v) => k -> v.length.toLong }
    assert(got == expect,
      "streamed image-hash census must equal the batch census after full replay")
  }

  test("streaming audio-fp census converges to the batch audio_dedup counts across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-audstream")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val countsDir = base.resolve("counts").toString
    val ckpt = base.resolve("ck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-audstream-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit =
      graft.streaming.Drift.streamingAudioFpCounts(spark, sf0001,
        streamDir.toString, countsDir, ckpt).awaitTermination()
    stageFlat(docs.filter(col("doc_id") % 2 === 0), "p1.parquet")
    runOnce()
    stageFlat(docs.filter(col("doc_id") % 2 === 1), "p2.parquet")
    runOnce()
    val got = graft.streaming.MaintainedCounts.readCounts(spark, countsDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expect = graft.queries.Pipeline.audioFingerprintOfDocs(spark, docs)
      .collect().map(r => s"${r.getLong(1)}:${r.getLong(2)}")
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(got == expect,
      "streamed audio-fp census must equal the batch census after full replay")
  }

  test("streaming video-hash census converges to the batch video_dedup counts across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-vidstream")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val countsDir = base.resolve("counts").toString
    val ckpt = base.resolve("ck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-vidstream-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit =
      graft.streaming.Drift.streamingVideoHashCounts(spark, sf0001,
        streamDir.toString, countsDir, ckpt).awaitTermination()
    stageFlat(docs.filter(col("doc_id") % 2 === 0), "p1.parquet")
    runOnce()
    stageFlat(docs.filter(col("doc_id") % 2 === 1), "p2.parquet")
    runOnce()
    val got = graft.streaming.MaintainedCounts.readCounts(spark, countsDir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val expect = graft.operators.Multimodal.videoHashes(spark, docs).collect()
      .groupBy(h => f"${h.n_frames}%d:${h.hash_hi}%X:${h.hash_lo}%X:${h.contour_fp}%d")
      .map { case (k, v) => k -> v.length.toLong }
    assert(got == expect,
      "streamed video-hash census must equal the batch census after full replay")
  }

  test("streaming quality scores converge to the batch scorer across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-qmstream")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val outDir = base.resolve("scored").toString
    val ckpt = base.resolve("ck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-qmstream-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit =
      graft.queries.Quality.streamingQualityScores(spark, sf0001,
        streamDir.toString, outDir, ckpt).awaitTermination()
    // two ingest batches with a full stop/start between them — scored
    // against the FROZEN model trained on the base corpus
    stageFlat(docs.filter(col("doc_id") % 2 === 0), "p1.parquet")
    runOnce()
    stageFlat(docs.filter(col("doc_id") % 2 === 1), "p2.parquet")
    runOnce()
    val got = spark.read.parquet(outDir)
      .select(col("doc_id"), col("score"), col("pred_kept")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val expect = graft.queries.Quality.qualityModelScore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.toSeq == expect.toSeq,
      "streamed scores must equal the batch scorer after full replay")
  }

  test("streaming jsonl ingest converges to the batch contracted parse across a restart, preserves rejects, and survives redelivery") {
    import graft.sources.RawIngest
    val base = java.nio.file.Files.createTempDirectory("graft-jsonl-stream")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val outDir = base.resolve("ingested").toString
    val ckpt = base.resolve("ck").toString
    def runOnce(): Unit =
      graft.queries.Ingest.streamingJsonlIngest(spark,
        streamDir.toString, outDir, ckpt).awaitTermination()
    def stage(name: String, rows: Seq[String]): Unit =
      java.nio.file.Files.writeString(streamDir.resolve(name),
        rows.mkString("", "\n", "\n"))
    def doc(id: Long): String =
      s"""{"doc_id": $id, "text": "tok$id a b", "lang": "en", "source": "s${id % 3}", "n_chars": 9}"""
    // batch 1: clean shard; full stop/start; batch 2: shard with 2
    // corrupt lines interleaved
    stage("p1.json", (0L until 10L).map(doc))
    runOnce()
    stage("p2.json",
      (10L until 15L).map(doc) ++ Seq("{torn", "not json") ++ (15L until 20L).map(doc))
    runOnce()
    val got = spark.read.parquet(s"$outDir/accepted")
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    // the batch FAILFAST reader must DIE on this landing dir (it holds
    // torn lines) — the stream's job is to survive what the gate kills
    intercept[Exception](RawIngest.jsonl(spark, streamDir.toString).collect())
    val expectAcc = RawIngest.jsonlWithRejects(spark, streamDir.toString)
      .filter(col("_corrupt").isNull)
      .select(col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(got == expectAcc, s"streamed ingest drifted: ${got.length} vs ${expectAcc.length}")
    val rejects = spark.read.parquet(s"$outDir/rejects")
      .select(col("_corrupt")).collect().map(_.getString(0)).sorted.toSeq
    assert(rejects == Seq("{torn", "not json").sorted, rejects.toString)
    // redelivery: re-apply batch 1's content under its batchId — no dups
    val b1 = RawIngest.jsonlWithRejects(spark, streamDir.resolve("p1.json").toString)
    graft.queries.Ingest.applyIngestBatch(b1, 0L, outDir)
    val again = spark.read.parquet(s"$outDir/accepted").count()
    assert(again == got.length, s"redelivered batch duplicated rows: $again vs ${got.length}")
  }

  test("quality-score sink is idempotent: a batch redelivered after a crash between write and checkpoint commit does not duplicate rows") {
    // the crash window: foreachBatch wrote the parquet, the process died
    // before the checkpoint committed, the engine redelivers the SAME
    // batchId on restart. The sink must converge, not append twice.
    val base = java.nio.file.Files.createTempDirectory("graft-qmredeliver")
    val outDir = base.resolve("scored").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val (w, theta) = graft.queries.Quality.qmModel(spark, sf0001)
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    graft.queries.Quality.qmApplyScoredBatch(spark, b0, 0L, outDir, w, theta)
    graft.queries.Quality.qmApplyScoredBatch(spark, b0, 0L, outDir, w, theta) // redelivery
    graft.queries.Quality.qmApplyScoredBatch(spark, b1, 1L, outDir, w, theta)
    val got = spark.read.parquet(outDir)
      .select(col("doc_id"), col("score"), col("pred_kept")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    val expect = graft.queries.Quality.qualityModelScore(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).sortBy(_._1)
    assert(got.length == expect.length,
      s"redelivered batch duplicated rows: ${got.length} vs ${expect.length}")
    assert(got.toSeq == expect.toSeq)
  }

  test("drift bucket commit is atomic: crash between bucket commits, restart, batch equality") {
    import graft.streaming.Drift
    val base = java.nio.file.Files.createTempDirectory("graft-drift-crash")
    val countsDir = base.resolve("counts").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val b1 = docs.filter(col("doc_id") % 4 === 1)
    val b2 = docs.filter(col("doc_id") % 4 === 3)
    def snap() = Drift.readCounts(spark, countsDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val w1 = Drift.applyBatch(spark, b1, 0L, countsDir)
    assert(w1.size > 2, s"need >2 touched buckets to crash between commits: $w1")
    val afterB1 = snap()
    // inject a crash after 2 of batch 1's bucket commits — the process
    // "dies" with a per-bucket-consistent mix of old and new versions
    intercept[RuntimeException](
      Drift.applyBatch(spark, b2, 1L, countsDir, crashAfterBuckets = 2))
    // torn state is READABLE and per-bucket consistent: exactly the 2
    // committed buckets carry batch 1's id, every other bucket still
    // reads batch 0's committed content (no partial bucket anywhere)
    val torn = Drift.readCounts(spark, countsDir)
      .groupBy(col("bucket")).agg(max(col("last_batch")).as("lb")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(torn.values.count(_ == 1L) == 2, s"expected exactly 2 committed buckets: $torn")
    // an uncommitted version dir written by the dead attempt must be
    // invisible — plant one more with garbage bytes to prove the reader
    // keys on the _COMMIT marker, not directory existence
    val junkDir = java.nio.file.Paths.get(countsDir, s"bucket=${w1.head}", "v=99")
    java.nio.file.Files.createDirectories(junkDir)
    java.nio.file.Files.write(junkDir.resolve("part-junk.parquet"),
      Array[Byte](1, 2, 3))
    // restart: the replay of batch 1 commits exactly the remaining
    // buckets (the 2 already-committed ones are skipped by the
    // last_batch guard) and the final table equals the clean two-batch
    // application — crash-then-replay is indistinguishable from no crash
    val replayed = Drift.applyBatch(spark, b2, 1L, countsDir)
    assert(replayed.nonEmpty && !replayed.exists(b => torn.get(b).contains(1L)),
      s"replay must not rewrite already-committed buckets: $replayed vs $torn")
    val expect = b1.union(b2)
      .select(explode(graft.operators.Dedup.tokensNE(col("text"))).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("c")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(snap() == expect)
    assert(afterB1 != expect, "batch 2 must actually change the table")
    // and a second full replay of batch 1 is a complete no-op
    assert(Drift.applyBatch(spark, b2, 1L, countsDir).isEmpty)
    assert(snap() == expect)
  }

  test("flatMapGroupsWithState running totals converge to batch totals") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-state")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val q = Sessions.streamingUserTotals(spark, sf0001, streamDir.toString)
      .toDF().writeStream
      .outputMode("append")
      .format("memory")
      .queryName("stream_totals")
      .start()
    try q.processAllAvailable() finally q.stop()
    // last emitted state per user == batch aggregate
    val streamed = spark.table("stream_totals")
      .groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n"), max(col("value_cents")).as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val batch = Sessions.events(spark, sf0001)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(streamed == batch)
    spark.sql("DROP TABLE IF EXISTS stream_totals")
  }

  test("transformWithState running totals converge to batch totals (RocksDB store)") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-tws")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    // transformWithState requires the RocksDB provider — also the 100 TB
    // posture (off-heap keyed state + changelog checkpoints). Scoped to
    // this query; restored after so other streaming tests keep HDFS-backed.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val old = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val q = Sessions.streamingUserTotalsTws(spark, sf0001, streamDir.toString)
        .toDF().writeStream
        .outputMode("update")
        .format("memory")
        .queryName("tws_totals")
        .start()
      try q.processAllAvailable() finally q.stop()
      val streamed = spark.table("tws_totals")
        .groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n"), max(col("value_cents")).as("cents"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val batch = Sessions.events(spark, sf0001)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100).cast("long")).as("cents"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(streamed == batch)
      spark.sql("DROP TABLE IF EXISTS tws_totals")
    } finally {
      old match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("stream-stream range join equals the batch join on replay") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val q = Sessions.streamingViewPurchaseJoin(spark, sf0001, streamDir.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_vp").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_vp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val ev = Sessions.events(spark, sf0001)
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_ms").as("view_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_ms").as("purchase_ms"))
    val batch = views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ms") >= col("view_ms") &&
          col("purchase_ms") <= col("view_ms") + lit(1800000L))
      .select(col("user_id"), col("view_id"), col("purchase_id"),
        col("view_ms"), col("purchase_ms"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(batch.nonEmpty, "batch comparator produced no view->purchase pairs")
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
    spark.sql("DROP TABLE IF EXISTS stream_vp")
  }

  test("streaming funnel: two time-ordered batches carry stage state and equal the batch funnel") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-funnel")
    // split the corpus into two TIME-ORDERED files (the documented
    // ordering contract) and force one batch per file so the second
    // batch genuinely exercises the carried state
    val ev = Sessions.events(spark, sf0001)
    val mid = ev.agg(expr("CAST(percentile(ts_ms, 0.5) AS LONG)")).head().getLong(0)
    val schema = graft.sources.Tables.events(spark, sf0001).schema
    ev.filter(col("ts_ms") < mid).select(schema.fieldNames.map(col): _*)
      .coalesce(1).write.parquet(s"$streamDir/b0")
    ev.filter(col("ts_ms") >= mid).select(schema.fieldNames.map(col): _*)
      .coalesce(1).write.parquet(s"$streamDir/b1")
    val inDir = java.nio.file.Files.createTempDirectory("graft-funnel-in")
    def onlyParquet(sub: String) = java.nio.file.Files.list(
        java.nio.file.Paths.get(streamDir.toString, sub)).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".parquet")).head
    java.nio.file.Files.copy(onlyParquet("b0"), inDir.resolve("00.parquet"))
    java.nio.file.Files.copy(onlyParquet("b1"), inDir.resolve("01.parquet"))
    val q = Sessions.streamingFunnel(spark, sf0001, inDir.toString,
        maxFilesPerTrigger = 1) // one file per batch -> the state carries
      .toDF().writeStream.outputMode("append").format("memory")
      .queryName("stream_funnel")
      .start()
    try q.processAllAvailable() finally q.stop()
    // last emitted state per user (stages only ever advance)
    val streamed = spark.table("stream_funnel")
      .groupBy(col("user_id"))
      .agg(max(col("view_ms")).as("v"), max(col("click_ms")).as("c"),
        max(col("purchase_ms")).as("p"))
      .collect()
    val nv = streamed.count(_.getLong(1) >= 0)
    val nc = streamed.count(_.getLong(2) >= 0)
    val np = streamed.count(_.getLong(3) >= 0)
    val b = graft.queries.Journey.funnel(spark, sf0001).head()
    assert((nv.toLong, nc.toLong, np.toLong) == ((b.getLong(1), b.getLong(2), b.getLong(3))),
      s"stream ($nv,$nc,$np) != batch (${b.getLong(1)},${b.getLong(2)},${b.getLong(3)})")
  }

  test("stream-stream LEFT OUTER join emits null-matched views past the watermark") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssljoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val q = Sessions.streamingViewPurchaseLeftJoin(spark, sf0001, streamDir.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_vpl").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("stream_vpl").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    val ev = Sessions.events(spark, sf0001)
    // outer-join rows for views younger than (max ts - watermark - window)
    // are legitimately still held back when the stream drains; compare
    // only the emitted horizon (see streamingViewPurchaseLeftJoin doc)
    val maxMs = ev.agg(max(col("ts_ms"))).head().getLong(0)
    val cutoff = maxMs - 3600000L - 1800000L - 60000L
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"), col("ts_ms").as("view_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_ms").as("purchase_ms"))
    val batch = views.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ms") >= col("view_ms") &&
          col("purchase_ms") <= col("view_ms") + lit(1800000L), "left_outer")
      .select(col("user_id"), col("view_id"), col("purchase_id"), col("view_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSet
    val sOld = streamed.filter(_._4 < cutoff)
    val bOld = batch.filter(_._4 < cutoff)
    assert(bOld.exists(_._3 == -1L), "comparator horizon has no unmatched views")
    assert(sOld == bOld,
      s"stream-only: ${(sOld -- bOld).take(3)}; batch-only: ${(bOld -- sOld).take(3)}")
    // matched pairs emit eagerly — they must ALL be present, horizon or not
    assert(batch.filter(_._3 != -1L).subsetOf(streamed))
    spark.sql("DROP TABLE IF EXISTS stream_vpl")
  }

  test("stream-stream FULL OUTER join emits both unmatched sides past the watermark") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssfjoin")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val q = Sessions.streamingViewPurchaseFullJoin(spark, sf0001, streamDir.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_vpf").start()
    try q.processAllAvailable() finally q.stop()
    def key(u: Long, v: Long, p: Long) = (u, v, p)
    val streamed = spark.table("stream_vpf").collect().map { r =>
      (key(r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)),
        // the horizon clock of a row is whichever side is present
        if (r.isNullAt(3)) r.getLong(4) else r.getLong(3))
    }.toSet
    val ev = Sessions.events(spark, sf0001)
    val maxMs = ev.agg(max(col("ts_ms"))).head().getLong(0)
    // the purchase side's state watermark subtracts the join window AGAIN
    // (a view in [p_ts-30min, p_ts] may arrive until the watermark passes
    // p_ts + 30min) — one extra window of slack below the left-outer
    // test's horizon keeps the comparator strictly inside both sides'
    // emitted regions
    val cutoff = maxMs - 3600000L - 2 * 1800000L - 60000L
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("ts_ms").as("view_ms"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("ts_ms").as("purchase_ms"))
    val batch = views.join(purchases,
        col("v_user") === col("p_user") &&
          col("purchase_ms") >= col("view_ms") &&
          col("purchase_ms") <= col("view_ms") + lit(1800000L), "full_outer")
      .collect().map { r =>
        val vNull = r.isNullAt(1)
        (key(if (vNull) r.getLong(3) else r.getLong(0),
          if (vNull) -1L else r.getLong(1),
          if (r.isNullAt(4)) -1L else r.getLong(4)),
          if (vNull) r.getLong(5) else r.getLong(2))
      }.toSet
    val sOld = streamed.filter(_._2 < cutoff).map(_._1)
    val bOld = batch.filter(_._2 < cutoff).map(_._1)
    // the comparator horizon must exercise BOTH unmatched flavors
    assert(bOld.exists(_._2 == -1L), "no unmatched purchases below horizon")
    assert(bOld.exists(_._3 == -1L), "no unmatched views below horizon")
    assert(sOld == bOld,
      s"stream-only: ${(sOld -- bOld).take(3)}; batch-only: ${(bOld -- sOld).take(3)}")
    // matched pairs emit eagerly — all present regardless of horizon
    assert(batch.map(_._1).filter(k => k._2 != -1L && k._3 != -1L)
      .subsetOf(streamed.map(_._1)))
    spark.sql("DROP TABLE IF EXISTS stream_vpf")
  }

  test("dropDuplicatesWithinWatermark: replayed duplicate batch is fully deduped") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dedup")
    // same events file staged twice -> every event_id arrives twice
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-001.parquet"))
    val q = Sessions.streamingDedupEvents(spark, sf0001, streamDir.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_dedup").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("stream_dedup").collect().map(_.getLong(0))
    val expected = Sessions.events(spark, sf0001).select("event_id")
      .distinct().count()
    assert(ids.length == ids.distinct.length, "duplicate event_ids in deduped stream")
    assert(ids.length == expected,
      s"deduped stream has ${ids.length} ids, batch-distinct has $expected")
    spark.sql("DROP TABLE IF EXISTS stream_dedup")
  }

  test("stream-static join: streaming events enrich against a static dimension") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-ssd")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    // static side: per-user event quota computed in batch (any static dim works)
    val dim = Sessions.events(spark, sf0001)
      .groupBy(col("user_id")).agg(count(lit(1)).as("user_total"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val schema = graft.sources.Tables.events(spark, sf0001).schema
    val enriched = spark.readStream.schema(schema).parquet(streamDir.toString)
      .select(col("event_id"), col("user_id"))
      .join(dim, "user_id") // stream-static: no watermark needed, dim re-read per batch
    val q = enriched.writeStream.outputMode("append").format("memory")
      .queryName("stream_enriched").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_enriched")
    val n = Sessions.events(spark, sf0001).count()
    assert(got.count() == n, "every event must join its user's static row")
    // spot-check: the joined total matches the batch aggregate
    val bad = got.join(dim.withColumnRenamed("user_total", "expect"), "user_id")
      .filter(col("user_total") =!= col("expect")).count()
    assert(bad == 0)
    spark.sql("DROP TABLE IF EXISTS stream_enriched")
  }

  test("foreachBatch golden: streamed session counts land in parquet EQUAL to the batch query") {
    // Full equality, not subset: append mode only emits a session once
    // the watermark passes its end, so a far-future sentinel event staged
    // as a second file pushes the watermark past every real session. The
    // sentinel's own (still-open) session is the only row excluded.
    val streamDir = java.nio.file.Files.createTempDirectory("graft-golden-in")
    val outDir = java.nio.file.Files.createTempDirectory("graft-golden-out").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val q = Sessions.streamingSessionCounts(spark, sf0001, streamDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        batch.write.mode("append").parquet(s"$outDir/sessions")
        ()
      }
      .start()
    val sentinelUser = 999999999L
    try {
      q.processAllAvailable()
      // sentinel: one event 10 days past the corpus max, written in
      // whatever physical ts type the current footer resolves to (raw
      // int64 nanos rounds 1-7, TIMESTAMP_NTZ micros round 8+) so the
      // copied part-file matches the stream's schema
      val tsDt = graft.sources.Tables.events(spark, sf0001).schema("ts").dataType
      val maxUs = Sessions.events(spark, sf0001).agg(max(col("ts_us"))).collect().head.getLong(0)
      val sentinelUs = maxUs + 10L * 24 * 3600 * 1000000L
      val sentinelTs = tsDt match {
        case org.apache.spark.sql.types.LongType => lit(sentinelUs * 1000L)
        case org.apache.spark.sql.types.TimestampNTZType =>
          timestamp_micros(lit(sentinelUs)).cast(org.apache.spark.sql.types.TimestampNTZType)
        case _ => timestamp_micros(lit(sentinelUs))
      }
      // the file source lists flat files only: write the one-row sentinel
      // to a scratch dir and copy its part-file into the stream dir
      val scratch = java.nio.file.Files.createTempDirectory("graft-golden-sentinel")
      Sessions.events(spark, sf0001).limit(1)
        .drop("ts_ms", "ts_us")
        .withColumn("user_id", lit(sentinelUser))
        .withColumn("ts", sentinelTs)
        .coalesce(1)
        .write.mode("overwrite").parquet(scratch.resolve("w").toString)
      val part = java.nio.file.Files.list(scratch.resolve("w")).iterator()
        .asInstanceOf[java.util.Iterator[java.nio.file.Path]]
      var copied = false
      while (part.hasNext && !copied) {
        val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, streamDir.resolve("events-001.parquet"))
          copied = true
        }
      }
      assert(copied, "sentinel part-file not found")
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(s"$outDir/sessions")
      .filter(col("user_id") =!= sentinelUser)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val batch = Sessions.sessionWindowAgg(spark, sf0001)
      .select("user_id", "start_ms", "end_ms", "n_events")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(batch.nonEmpty)
    assert(streamed == batch,
      s"stream-only: ${(streamed -- batch).take(3)}; batch-only: ${(batch -- streamed).take(3)}")
  }

  test("foreachBatch sink: streaming dedup lands in parquet once per event") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-fb-in")
    val outDir = java.nio.file.Files.createTempDirectory("graft-fb-out").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-001.parquet"))
    val q = Sessions.streamingDedupEvents(spark, sf0001, streamDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        // the standard custom-sink escape hatch: per-microbatch batch
        // write (idempotent per batchId in a production upsert sink)
        batch.write.mode("append").parquet(s"$outDir/b$batchId")
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    val landed = spark.read.parquet(s"$outDir/b*").select("event_id")
    val expected = Sessions.events(spark, sf0001).select("event_id").distinct().count()
    assert(landed.count() == expected)
    assert(landed.distinct().count() == expected)
  }

  test("streaming ingest gate: LSH-incremental foreachBatch admits only novel docs across batches") {
    // The 100 TB ingest-gate story end-to-end in streaming form: each
    // micro-batch of incoming documents is LSH-probed against the
    // CURRENT admitted corpus (Dedup.minhashIncremental — O(batch)
    // bucket lookups, never old-vs-old), survivors append to the
    // corpus, and a near-dup of a doc admitted in an EARLIER batch must
    // be rejected — the corpus the gate probes has to grow.
    import spark.implicits._
    val corpusDir = java.nio.file.Files.createTempDirectory("gate-corpus").toString
    val streamDir = java.nio.file.Files.createTempDirectory("gate-in")
    def tokens(seed: String): String = (1 to 60).map(j => s"${seed}_$j").mkString(" ")
    def nearDup(src: String): String =
      src.split(" ").dropRight(2).mkString(" ") + " changed tail"
    val base = (0L until 8L).map(i => (i, tokens(s"w$i")))
    base.toDF("doc_id", "text").write.mode("overwrite").parquet(corpusDir)
    val novel1 = tokens("fresh1"); val novel2 = tokens("fresh2")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def stage(n: Int, rows: Seq[(Long, String)]): Unit = {
      val scratch = java.nio.file.Files.createTempDirectory(s"gate-b$n")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(scratch.resolve("w").toString)
      val it = java.nio.file.Files.list(scratch.resolve("w")).iterator()
      var copied = false
      while (it.hasNext && !copied) {
        val p = it.next()
        if (p.getFileName.toString.endsWith(".parquet")) {
          java.nio.file.Files.copy(p, streamDir.resolve(f"batch-$n%03d.parquet"))
          copied = true
        }
      }
      assert(copied)
    }
    val q = spark.readStream.schema(schema).parquet(streamDir.toString)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
          batchId: Long) =>
        if (!batch.isEmpty) {
          val corpus = batch.sparkSession.read.parquet(corpusDir)
          val dupIds = graft.operators.Dedup.minhashIncremental(batch.toDF(), corpus)
            .select("new_id").distinct().collect().map(_.getLong(0))
          batch.filter(!col("doc_id").isin(dupIds.toSeq: _*))
            .write.mode("append").parquet(corpusDir)
        }
        ()
      }
      .start()
    try {
      stage(1, Seq((100L, nearDup(base(3)._2)), (101L, novel1)))
      q.processAllAvailable()
      // 200 duplicates a doc admitted in batch 1 — the gate must see it
      stage(2, Seq((200L, nearDup(novel1)), (201L, novel2)))
      q.processAllAvailable()
    } finally q.stop()
    val ids = spark.read.parquet(corpusDir).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ids == (0L until 8L).toSet ++ Set(101L, 201L),
      s"admitted=$ids — near-dups 100 (of base 3) and 200 (of batch-1's 101) must be rejected")
  }

  test("stream-static enrichment join equals the batch join, exactly once per event") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-enrich")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "events.parquet"),
      streamDir.resolve("events-000.parquet"))
    val q = Sessions.streamingEnrich(spark, sf0001, streamDir.toString)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_enrich").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("stream_enrich").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // the profile covers every user in the batch history and the stream
    // replays exactly that history, so the inner join drops nothing:
    // one enriched row per event, values equal to the batch-side join
    assert(got.length == got.map(_._1).distinct.length, "event_id emitted twice")
    val ev = Sessions.events(spark, sf0001)
    val batch = ev
      .select(col("event_id"), col("user_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .join(ev.groupBy(col("user_id").as("p_user"))
          .agg(count(lit(1)).as("lifetime_events"),
            sum(round(col("value") * 100).cast("long")).as("lifetime_cents")),
        col("user_id") === col("p_user"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("cents"), col("lifetime_events"), col("lifetime_cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got.toSet == batch.toSet,
      s"stream/batch mismatch: ${got.toSet -- batch.toSet} | ${batch.toSet -- got.toSet}")
    spark.sql("DROP TABLE IF EXISTS stream_enrich")
  }

  test("streaming badwords census converges to the batch safety gate across a restart") {
    val base = java.nio.file.Files.createTempDirectory("graft-bwstream")
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    val countsDir = base.resolve("counts").toString
    val ckpt = base.resolve("ck").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    def stageFlat(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-bwstream-stage").toString
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(_.getName.endsWith(".parquet")).get.toPath
      java.nio.file.Files.copy(part, streamDir.resolve(name))
    }
    def runOnce(): Unit =
      graft.queries.Safety.streamingBadwordsCounts(spark, sf0001,
        streamDir.toString, countsDir, ckpt).awaitTermination()
    // two ingest batches with a full stop/start between them
    stageFlat(docs.filter(col("doc_id") % 2 === 0), "p1.parquet")
    runOnce()
    stageFlat(docs.filter(col("doc_id") % 2 === 1), "p2.parquet")
    runOnce()
    val got = graft.queries.Safety
      .badwordsCensusFromCounts(spark, countsDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val expect = SparkEntry.queries("badwords_census")(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == expect.toSeq,
      "streamed safety census must equal the batch census after full replay")
  }
}
