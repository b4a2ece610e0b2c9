package graft

import graft.queries.Curation
import org.apache.spark.sql.functions._

/** Invariants of the round-4 curation/relational batch (hash parity vs
  * DuckDB is the driver gate; these pin the operator semantics).
  */
class CurationSpec extends SparkSuite {

  test("hybrid_search: RRF fusion of the two rankings matches a plain-Scala recompute") {
    // lexical ranking from the declared bm25 scores (score parity is the
    // bm25 oracle's job; THIS spec pins ranking + fusion)
    val lexRank = Curation.bm25(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    // dense ranking from an independent cosine recompute (the
    // CosineSimExpr fold, then HALF_UP at 6 dp)
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val qv = vecs.find(_._1 == 0L).get._2
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val denseRank = vecs.filter(_._1 != 0L).map { case (id, v) => (id, sim(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    def rrf(r: Long) = if (r > 0) 1000000000L / (60L + r) else 0L
    val fused = (lexRank.keySet ++ denseRank.keySet).toSeq.map { id =>
      val l = lexRank.getOrElse(id, 0L)
      val v = denseRank.getOrElse(id, 0L)
      (id, l, v, rrf(l) + rrf(v))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(20)
    val got = Curation.hybridSearch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == fused)
    // both retrieval modes must actually contribute to the fused top-20
    assert(got.exists(_._2 > 0) && got.exists(_._3 > 0))
  }

  test("mixture_temperature: α=0.7 weights match a driver recompute and flatten the mix") {
    val rows = graft.queries.Curation.mixtureTemperature(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val perDoc = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("source", "text").collect()
      .map(r => r.getString(0) ->
        r.getString(1).split("[ \t\n\r]", -1).count(_.nonEmpty).toLong)
    val bySrc = perDoc.groupBy(_._1).map { case (s0, xs) => s0 -> xs.map(_._2).sum }
    val tot = bySrc.values.sum.toDouble
    val srcs = bySrc.keys.toSeq.sorted
    val nums = srcs.map(s0 => math.pow(bySrc(s0) / tot, 0.7))
    val den = nums.foldLeft(0.0)(_ + _) // same left fold order as the query
    val expect = srcs.zip(nums).map { case (s0, n) =>
      (s0, bySrc(s0), math.round(1e9 * bySrc(s0) / tot), math.round(1e9 * n / den)) }
    assert(rows == expect)
    // α<1 flattening: weights sum to ~1e9 and every below-average source's
    // weight share strictly exceeds its raw share (the upsampling point)
    assert(math.abs(rows.map(_._4).sum - 1000000000L) <= rows.size)
    val avgShare = 1000000000L / rows.size
    rows.filter(_._3 < avgShare).foreach { case (s0, _, share, w) =>
      assert(w > share, s"$s0: below-average source must be upsampled ($w <= $share)")
    }
  }

  test("prefix_cache_hits: census matches a driver recompute and the hit identity holds") {
    val prefixes = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("text")).collect()
      .map(_.getString(0).split("[ \t\n\r]", -1).filter(_.nonEmpty)
        .take(32).mkString(" "))
    val groups = prefixes.groupBy(identity).values.map(_.length.toLong).toSeq
    val nDocs = prefixes.length.toLong
    val nPref = groups.size.toLong
    val shared = groups.filter(_ > 1).sum
    val hits = groups.filter(_ > 1).map(_ - 1).sum
    val r = Curation.prefixCacheHits(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((nDocs, nPref, shared, hits, 10000L * hits / nDocs)))
    // identity: hits are exactly the docs beyond one per distinct prefix
    assert(r.getLong(3) == r.getLong(0) - r.getLong(1))
    // the planted duplicates make the cache non-trivially useful
    assert(r.getLong(3) > 0)
  }

  test("retrieval_ndcg: DCG/IDCG match a driver recompute over the fused ranking") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split("[ \t\n\r]", -1).filter(_.nonEmpty)))
    val rel = docs.map { case (id, ts) =>
      id -> math.min(ts.count(_ == "spark") + ts.count(_ == "vector"), 4).toLong
    }.toMap
    val fused = Curation.hybridSearch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(3)))
      .sortBy { case (id, s) => (-s, id) }.take(10)
    def gain(relv: Long, rank: Int): Long =
      math.round(1e9 * ((1L << relv) - 1) * math.log(2) / math.log(rank + 1))
    val dcg = fused.zipWithIndex
      .map { case ((id, _), i) => gain(rel(id), i + 1) }.sum
    val ideal = rel.toSeq.sortBy { case (id, rv) => (-rv, id) }.take(10)
    val idcg = ideal.zipWithIndex
      .map { case ((_, rv), i) => gain(rv, i + 1) }.sum
    val r = Curation.retrievalNdcg(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((10L, dcg, idcg, 10000L * dcg / idcg)))
    // the metric discriminates: the fused ranking is not the ideal one
    // (the dense leg trades some lexical relevance), but beats random
    assert(r.getLong(3) > 5000L && r.getLong(3) < 10000L)
  }

  test("dsir_weights: nano-nat weights match a plain-Scala refit and rank the target lang first") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def bucket(t: String): Int =
      (t.foldLeft(5381L)((a, c) => (a * 33 + c.toInt) % 2147483648L) % 64L).toInt
    val toks = docs.map { case (id, lang, text) =>
      (id, lang, text.split("[ \t\n\r]", -1).filter(_.nonEmpty).map(bucket)) }
    val cR = new Array[Long](64); val cT = new Array[Long](64)
    toks.foreach { case (_, lang, bs) =>
      bs.foreach { b => cR(b) += 1; if (lang == "en") cT(b) += 1 } }
    val nR = cR.sum; val nT = cT.sum
    // lr only defined for buckets present in the corpus (the query's model
    // rows); absent buckets have no doc occurrences so they never score
    val lr = (0 until 64).map(b => b -> math.round(1e9 * math.log(
      ((cT(b) + 1) * (nR + 64)).toDouble / ((cR(b) + 1) * (nT + 64)).toDouble))).toMap
    val expect = toks.map { case (id, lang, bs) =>
      (id, lang, bs.length.toLong, bs.map(b => lr(b)).sum) }.sortBy(_._1).toSeq
    val rows = Curation.dsirWeights(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == expect)
    // the point of DSIR: docs drawn from the target slice must look more
    // target-like than the rest, per token (mean normalized weight)
    val (en, rest) = rows.partition(_._2 == "en")
    def meanPerTok(xs: Seq[(Long, String, Long, Long)]) =
      xs.map(x => x._4.toDouble / x._3).sum / xs.size
    assert(meanPerTok(en) > meanPerTok(rest),
      "target-language docs must carry higher importance weight per token")
  }

  test("length_buckets: histogram reconciles and bounds are exact bit widths") {
    val nts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect()
      .map(_.getString(0).split("[ \t\n\r]", -1).count(_.nonEmpty).toLong)
    def bucketOf(n: Long): Long =
      if (n == 0) -1L else 63L - java.lang.Long.numberOfLeadingZeros(n)
    val expect = nts.groupBy(bucketOf).map { case (b, xs) =>
      val (lo, hi) = if (b < 0) (0L, 0L) else (1L << b, (1L << (b + 1)) - 1)
      b -> ((lo, hi, xs.length.toLong, xs.sum))
    }
    val rows = graft.queries.Curation.lengthBuckets(spark, sf0001).collect()
    assert(rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap == expect)
    assert(rows.map(_.getLong(3)).sum == nts.length.toLong, "doc count must reconcile")
    assert(rows.map(_.getLong(4)).sum == nts.sum, "token mass must reconcile")
  }

  test("pack_sequences conserves tokens and numbers bins contiguously per source") {
    val bins = Curation.packSequences(spark, sf001).cache()
    val perSource = bins.groupBy("source")
      .agg(sum("n_tokens").as("toks"), min("bin_id").as("lo"),
        max("bin_id").as("hi"), countDistinct("bin_id").as("nb"))
      .collect()
    val totals = graft.sources.Tables.documents(spark, sf001)
      .groupBy("source")
      .agg(sum(size(graft.operators.Dedup.tokensNE(col("text"))).cast("long")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.nonEmpty)
    perSource.foreach { r =>
      assert(r.getLong(1) === totals(r.getString(0)), s"token loss in ${r.getString(0)}")
      assert(r.getLong(2) === 0L, "bins must start at 0")
      assert(r.getLong(4) === r.getLong(3) + 1, "bin ids must be contiguous")
    }
    bins.unpersist()
  }

  test("pii_scrub removes every planted email/phone/id and counts them") {
    val out = Curation.piiScrub(spark, sf001)
    assert(out.filter(col("n_emails") < 1 || col("n_phones") < 1 || col("n_ids") < 1).count() === 0)
    // re-derive one scrubbed doc and assert no residual PII patterns
    val sc = graft.sources.Tables.documents(spark, sf001).limit(20)
      .select(regexp_replace(regexp_replace(regexp_replace(
        concat(col("text"), lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com or +1-555-"),
          lpad(pmod(col("doc_id"), lit(10000L)).cast("string"), 4, "0"),
          lit(" ref "), (col("doc_id") + lit(1000000L)).cast("string")),
        Curation.EmailRe, "<EMAIL>"),
        Curation.PhoneRe, "<PHONE>"),
        Curation.NumRe, "<NUM>").as("sc"))
    assert(sc.filter(col("sc").rlike("@|[0-9]{5,}")).count() === 0)
  }

  test("stratified_sample downsamples the dominant language deterministically") {
    val a = Curation.stratifiedSample(spark, sf001).collect()
    val b = Curation.stratifiedSample(spark, sf001).collect()
    assert(a.toSeq === b.toSeq, "sampling must be deterministic")
    a.foreach(r => assert(r.getLong(2) <= r.getLong(1)))
    val byLang = a.map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val (enT, enS) = byLang("en")
    assert(enS.toDouble / enT < 0.35, "en must be downsampled toward 20%")
  }

  test("bm25 scores exactly the docs containing a query term, positively") {
    val scored = Curation.bm25(spark, sf001)
    val expected = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), graft.operators.Dedup.tokensNE(col("text")).as("ts"))
      .filter(array_contains(col("ts"), "spark") || array_contains(col("ts"), "vector"))
    assert(scored.count() === expected.count())
    assert(scored.filter(col("bm25") <= 0).count() === 0)
  }

  test("bigram_pmi only reports pairs at the support threshold, with finite pmi") {
    val out = Curation.bigramPmi(spark, sf001).cache()
    assert(out.count() > 0)
    assert(out.filter(col("c12") < 5).count() === 0)
    assert(out.filter(isnan(col("pmi")) || col("pmi").isNull).count() === 0)
    out.unpersist()
  }

  test("containment dominates jaccard on every shared pair") {
    val j = graft.queries.Pipeline.ngramJaccard(spark, sf001)
      .select(col("id1"), col("id2"), col("jaccard"))
    val c = Curation.ngramContainment(spark, sf001)
    // J = I/|union| <= I/|A| and I/|B|: both containments bound jaccard
    val joined = j.join(c, Seq("id1", "id2"))
    assert(joined.filter(col("jaccard") > col("cont12") + 1e-9 ||
      col("jaccard") > col("cont21") + 1e-9).count() === 0)
  }

  test("struct min equals the argmin window pick") {
    val viaStruct = Curation.structFuncs(spark, sf001)
      .select("o_orderpriority", "min_cents").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val direct = graft.sources.Tables(spark, sf001, "orders")
      .groupBy("o_orderpriority")
      .agg(min(round(col("o_totalprice") * 100).cast("long")).as("m"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaStruct === direct)
  }

  test("lateral_topk returns at most 2 orders per customer, the top ones") {
    val out = Curation.lateralTopk(spark, sf001).cache()
    val over = out.groupBy("c_custkey").count().filter(col("count") > 2)
    assert(over.count() === 0)
    // spot-check one customer against a direct sort
    val one = out.limit(1).collect()(0).getLong(0)
    val got = out.filter(col("c_custkey") === one).select("cents")
      .collect().map(_.getLong(0)).toSeq
    val want = graft.sources.Tables(spark, sf001, "orders")
      .filter(col("o_custkey") === one)
      .select(round(col("o_totalprice") * 100).cast("long").as("c"))
      .orderBy(col("c").desc).limit(2).collect().map(_.getLong(0)).toSeq
    assert(got === want)
    out.unpersist()
  }

  test("token_budget_sample boundaries: infinite budget = whole corpus, budget 1 = best doc") {
    val P = graft.queries.Pipeline
    val full = P.tokenBudgetSample(spark, sf001, Long.MaxValue / 4)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val direct = graft.sources.Tables.documents(spark, sf001)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(size(graft.operators.Dedup.tokensNE(col("text"))).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(full === direct, "an unreachable budget must admit every document")
    val one = P.tokenBudgetSample(spark, sf001, 1L).collect()
    val bestQ = graft.sources.Tables.documents(spark, sf001)
      .select(col("lang"), graft.functions.TextFns.qualityScore(col("text")).as("q"))
      .groupBy("lang").agg(max("q").as("mq"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    one.foreach { r =>
      assert(r.getLong(1) === 1L, "budget 1 admits exactly the first (boundary-straddling) doc")
      assert(r.getDouble(3) === bestQ(r.getString(0)), "and that doc is the best-quality one")
    }
  }

  test("percentile_cont is monotone across quarters and brackets the median") {
    Curation.percentileCont(spark, sf001).collect().foreach { r =>
      val (p25, p50, p75, med) = (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(p25 <= p50 && p50 <= p75)
      assert(med === p50)
    }
  }

  test("weighted_sample: per-shard top-k re-merged equals the global top-k (A-ES mergeability)") {
    import org.apache.spark.sql.functions._
    val global = Curation.weightedSample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    // three arbitrary shards; keys come from the SAME single-sourced
    // expression the query uses (Curation.aesKey)
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val perShard = (0 to 2).flatMap { sh =>
      docs.filter(pmod(col("doc_id"), lit(3L)) === sh.toLong)
        .select(col("doc_id"), Curation.aesKey.as("key"))
        .orderBy(col("key").desc, col("doc_id")).limit(20)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
    }
    val merged = perShard.sortBy { case (id, k) => (-k, id) }.take(20)
    assert(merged == global, "A-ES: union of shard top-20s re-topped == global top-20")
  }

  test("PrefixSum.exclusive equals the sequential scan and stays distributed") {
    val df = graft.sources.Tables.orders(spark, sf0001)
      .select(col("o_orderkey"), round(col("o_totalprice") * 100).cast("long").as("cents"))
    val got = graft.operators.PrefixSum
      .exclusive(df, Seq(col("o_orderkey")), col("cents"), "off")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var acc = 0L
    val expect = got.map(t => (t._1, t._2)).sortBy(_._1).map { case (k, v) =>
      val r = (k, v, acc); acc += v; r
    }
    assert(got.toSeq == expect.toSeq)
  }

  test("training_order: a reproducible permutation that actually scatters; chunks conserve chars") {
    val ord = Curation.trainingOrder(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // contiguous 1-based sequence over exactly the corpus doc ids
    assert(ord.map(_._1).toSeq == (1L to ord.length.toLong))
    val docIds = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ord.map(_._2).toSet == docIds && ord.length == docIds.size)
    // the epoch permutation must SCATTER, not echo doc_id order (the
    // honest 0-based comparison: seq_id is 1-based — the round-17 fix;
    // a single Lehmer step was rank-preserving here and slipped past
    // the old seq == id form, which could never be true anyway)
    assert(ord.count { case (seq, id) => seq - 1 == id } < ord.length / 10,
      "shuffle left most docs at their original position")
    // two evaluations agree bit-for-bit (reproducibility is the point)
    val again = Curation.trainingOrder(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ord.sameElements(again))
    // the shuffled chunk pass conserves chars, full windows throughout
    val rows = Curation.trainingChunks(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val totalChars = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("n_chars") > 0).agg(sum("n_chars")).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == totalChars)
    rows.init.foreach { w => assert(w._2 == 4096L, s"window ${w._1} not full") }
  }

  test("training_order epochs: complete permutations, provably distinct, reproducible") {
    def orderAt(e: Int) = Curation.trainingOrderAt(spark, sf0001, e)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val e0 = orderAt(0); val e1 = orderAt(1); val e2 = orderAt(2)
    val docIds = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    // every epoch is a complete 1..n permutation of the SAME corpus
    Seq(e0, e1, e2).foreach { e =>
      assert(e.map(_._1).toSeq == (1L to e.length.toLong))
      assert(e.map(_._2).toSet == docIds)
    }
    // epoch 0 is the historical declared order (seed 42, unchanged)
    val legacy = Curation.trainingOrder(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(e0.sameElements(legacy), "epoch 0 drifted from training_order")
    // epochs are DISTINCT permutations: most docs move between epochs
    def agree(a: Array[(Long, Long)], b: Array[(Long, Long)]) =
      a.zip(b).count { case ((s1, d1), (s2, d2)) => d1 == d2 }
    assert(agree(e0, e1) < e0.length / 10, s"epoch 0/1 overlap ${agree(e0, e1)}")
    assert(agree(e0, e2) < e0.length / 10, s"epoch 0/2 overlap ${agree(e0, e2)}")
    assert(agree(e1, e2) < e0.length / 10, s"epoch 1/2 overlap ${agree(e1, e2)}")
    // each epoch reproduces bit-for-bit on re-evaluation
    assert(orderAt(2).sameElements(e2))
  }

  test("chunk_overlap: stride-2048 windows double-cover all chars past the first stride") {
    val rows = Curation.chunkOverlap(spark, sf0001).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalChars = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("n_chars") > 0).agg(sum("n_chars")).collect()(0).getLong(0)
    // windows are contiguous from 0; a char at corpus position p lies in
    // exactly 2 windows except positions p < stride (only window 0), so
    // the per-window char totals sum to 2·total − min(stride, total)
    assert(rows.map(_._1).toSeq == (0L until rows.length.toLong))
    assert(rows.map(_._3).sum == 2L * totalChars - math.min(2048L, totalChars),
      s"overlap coverage identity broken: ${rows.map(_._3).sum} vs $totalChars")
    // every full interior window carries exactly W=4096 chars
    rows.drop(1).dropRight(2).foreach { w =>
      assert(w._3 == 4096L, s"interior window ${w._1} not full: ${w._3}")
    }
    // doc spans are monotone and consecutive windows overlap or touch
    rows.sliding(2).filter(_.length == 2).foreach { p =>
      assert(p(0)._4 <= p(1)._4 && p(0)._5 <= p(1)._5,
        "window doc spans must be monotone in window order")
      assert(p(1)._4 <= p(0)._5, "stride < width: adjacent windows must share docs")
    }
  }

  test("chunk_windows: full windows, conserved chars, distributed prefix (one range exchange, reused)") {
    val q = Curation.chunkWindows(spark, sf0001)
    val rows = q.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val totalChars = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("n_chars") > 0).agg(sum("n_chars")).collect()(0).getLong(0)
    // windows are contiguous from 0; every window except the last holds
    // exactly 4096 chars; chars are conserved; doc spans are monotone
    assert(rows.map(_._1).toSeq == (0L until rows.length.toLong))
    rows.init.foreach { w => assert(w._3 == 4096L, s"window ${w._1} not full") }
    assert(rows.map(_._3).sum == totalChars)
    rows.sliding(2).filter(_.length == 2).foreach { p =>
      assert(p(0)._5 >= p(1)._4 - 1 && p(0)._5 <= p(1)._4,
        "a window's last doc must be the next window's first doc or its predecessor")
    }
    // scale guards: the plan must never funnel DATA through one task.
    // The only SinglePartition exchange allowed is the offset fold —
    // it receives one partial_collect_list row per upstream partition
    // (≤ shuffle.partitions rows), like the scalar-count exception in
    // the equidepth guard. And after execution the final adaptive plan
    // must materialize the range layout ONCE (ReuseExchange dedupes the
    // offset branch — a second live range exchange means the corpus is
    // scanned and shuffled twice)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val finalPlan = plan.split("Initial Plan")(0)
    val lines = plan.linesIterator.toIndexedSeq
    val spIdx = lines.zipWithIndex.collect {
      case (l, i) if l.contains("SinglePartition") => i
    }
    assert(spIdx.forall(i => lines.drop(i + 1).take(2)
      .exists(_.contains("partial_collect_list"))),
      "a SinglePartition exchange fed by anything but the per-partition " +
        "sums fold is the global-funnel anti-pattern:\n" + plan.take(1200))
    // PrefixSum now persist()s the range layout (single evaluation is a
    // CORRECTNESS requirement on _ps_pid — see the operator comment).
    // The guard is structural, not textual: both consumers of the layout
    // must resolve to InMemoryRelations sharing ONE CachedRDDBuilder —
    // one physical materialization of the range shuffle, no possibility
    // of independently sampled bounds.
    assert(plan.contains("InMemoryTableScan"), plan.take(1500))
    val builders = q.queryExecution.withCachedData.collect {
      case r: org.apache.spark.sql.execution.columnar.InMemoryRelation
        if r.output.exists(_.name == "_ps_pid") => r.cacheBuilder
    }
    assert(builders.size == 2,
      s"both PrefixSum branches must read the cached layout, got ${builders.size}")
    assert(builders.map(System.identityHashCode).toSet.size == 1,
      "the two branches must share ONE physical cache build")
  }

  test("span_masking: deterministic (doc_id + pos) % 7 rule matches a driver recompute") {
    val expect = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect().map { r =>
        val id = r.getLong(0)
        val ts = r.getString(1).split("[ \t\n\r]").filter(_.nonEmpty)
        val ms = ts.zipWithIndex.map { case (t, i) =>
          if ((id + i) % 7 == 0) "<mask>" else t }
        id -> ((ts.length.toLong, ms.count(_ == "<mask>").toLong, ms.mkString(" ")))
      }.toMap
    val got = graft.queries.Curation.spanMasking(spark, sf0001).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (n, m, txt) = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getString(3)) == ((n, m, txt)),
        s"doc ${r.getLong(0)}")
    }
    // masking is a pure function of (doc_id, position): rerun is identical
    val again = graft.queries.Curation.spanMasking(spark, sf0001).collect()
    assert(got.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
