package graft

import org.apache.spark.sql.functions._

/** The content-safety battery ([[graft.queries.Safety]]): flagged sets
  * must be EXACTLY the planted sets (known positives, zero false
  * positives), hit counts must match the plant arithmetic, and the
  * n-gram ladder's n=2 rung must agree with `repetition_ngram` — the
  * single-source gate between the two formulations of the same signal.
  */
class SafetySpec extends SparkSuite {

  test("badwords: flagged set is exactly the planted set, counts exact") {
    val rows = SparkEntry.queries("badwords_filter")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, hits, kept) = (r.getLong(0), r.getLong(1), r.getBoolean(2))
      val expect = (if (id % 7 == 0) 1L else 0L) + (if (id % 11 == 0) 2L else 0L)
      assert(hits == expect, s"doc $id: n_hits=$hits expected $expect")
      assert(kept == (expect == 0L), s"doc $id: kept=$kept with $hits hits")
    }
    // the fixture vocabulary must stay blocklist-free for the zero-
    // false-positive claim to mean anything; catch a fixture drift loudly
    val planted = rows.count(r => r.getLong(0) % 7 == 0 || r.getLong(0) % 11 == 0)
    assert(rows.count(!_.getBoolean(2)) == planted)
  }

  test("badwords census: per-source totals fold the per-doc verdicts") {
    val per = SparkEntry.queries("badwords_filter")(spark, sf0001)
    val src = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"))
    val expect = per.join(src, "doc_id").groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("n_hits") > 0, 1L).otherwise(0L)).as("n_flagged"),
        sum(col("n_hits")).as("n_hits_total"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val got = SparkEntry.queries("badwords_census")(spark, sf0001).collect()
    got.foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == e,
        s"${r.getString(0)}: census drifted from per-doc fold")
      assert(r.getLong(4) == 10000L * e._2 / e._1, s"${r.getString(0)}: flag_bp")
    }
    assert(got.map(_.getString(0)).toSet == expect.keySet)
  }

  test("code detect: is_code is exactly the planted set; prose is symbol-free") {
    val rows = SparkEntry.queries("code_detect")(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nSym, symBp, kw, isCode) = (r.getLong(0), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))
      if (id % 5 == 0) {
        assert(isCode, s"doc $id: planted code not detected " +
          s"(n_sym=$nSym sym_bp=$symBp kw_hits=$kw)")
        assert(kw == 3L, s"doc $id: kw_hits=$kw (function/var/return)")
      } else {
        assert(!isCode, s"doc $id: prose misdetected as code")
        // the detector's margin on this corpus is structural: the
        // fixture vocabulary carries no code symbols at all
        assert(nSym == 0L, s"doc $id: prose has $nSym code symbols")
      }
    }
  }

  test("code census folds the per-doc verdicts") {
    val per = SparkEntry.queries("code_detect")(spark, sf0001)
    val src = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"))
    val expect = per.join(src, "doc_id").groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("is_code"), 1L).otherwise(0L)).as("nc"),
        sum(col("n_sym")).as("ns"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    SparkEntry.queries("code_census")(spark, sf0001).collect().foreach { r =>
      val e = expect(r.getString(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) == e,
        s"${r.getString(0)}: census drifted from per-doc fold")
      assert(r.getLong(4) == 10000L * e._2 / e._1, s"${r.getString(0)}: code_bp")
    }
  }

  test("curation funnel: stages fold the per-stage queries, monotone") {
    val n = graft.sources.Tables.documents(spark, sf0001).count()
    val bw = SparkEntry.queries("badwords_filter")(spark, sf0001)
      .filter(col("kept")).count()
    val rows = SparkEntry.queries("curation_funnel")(spark, sf0001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows.keySet == Set("1_all", "2_badwords", "3_code", "4_gopher",
      "5_dedup"))
    assert(rows("1_all")._1 == n && rows("1_all")._2 == 0L)
    assert(rows("2_badwords")._1 == bw,
      "funnel stage 2 drifted from badwords_filter's own keep count")
    // survival is monotone non-increasing and every planted code doc
    // that passed badwords dies at stage 3
    val ns = Seq("1_all", "2_badwords", "3_code", "4_gopher", "5_dedup")
      .map(rows(_)._1)
    assert(ns == ns.sorted.reverse, s"non-monotone funnel: $ns")
    val codeSurvivors = SparkEntry.queries("badwords_filter")(spark, sf0001)
      .filter(col("kept") && col("doc_id") % 5 === 0).count()
    assert(rows("2_badwords")._1 - rows("3_code")._1 == codeSurvivors)
    assert(rows("2_badwords")._2 ==
      10000L * (n - rows("2_badwords")._1) / n)
  }

  test("ngram ladder: n=2 rung agrees with repetition_ngram exactly") {
    val rung2 = SparkEntry.queries("repetition_ngram_ladder")(spark, sf0001)
      .filter(col("n") === 2)
      .select(col("doc_id"), col("ng"), col("maxc"), col("gram"))
    val bi = SparkEntry.queries("repetition_ngram")(spark, sf0001)
      .select(col("doc_id"), col("nb"),
        col("maxc").as("maxc2"), concat_ws(" ", col("w1"), col("w2")).as("g2"))
    val joined = rung2.join(bi, "doc_id")
    assert(joined.count() == rung2.count() && rung2.count() > 0)
    val drift = joined.filter(col("ng") =!= col("nb") ||
      col("maxc") =!= col("maxc2") || col("gram") =!= col("g2")).count()
    assert(drift == 0, s"$drift docs drifted between the two n=2 formulations")
  }

  test("ngram ladder: every rung matches a driver recompute on a sample") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 60).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val got = SparkEntry.queries("repetition_ngram_ladder")(spark, sf0001)
      .filter(col("doc_id") < 60).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getString(4), r.getLong(5))).toMap
    for ((id, text) <- docs; n <- 2 to 4) {
      val ts = text.split("[ \t\n\r]", -1).filter(_.nonEmpty)
      if (ts.length >= n) {
        val grams = ts.sliding(n).map(_.mkString(" ")).toSeq
        val counts = grams.groupBy(identity).view.mapValues(_.size.toLong)
        val maxc = counts.values.max
        val win = counts.filter(_._2 == maxc).keys.min // smallest gram wins
        val ng = grams.size.toLong
        assert(got((id, n.toLong)) == (ng, maxc, win, 10000L * maxc / ng),
          s"doc $id n=$n drifted from driver recompute")
      } else assert(!got.contains((id, n.toLong)), s"doc $id n=$n: short doc kept")
    }
  }
}
