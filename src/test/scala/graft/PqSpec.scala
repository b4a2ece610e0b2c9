package graft

import graft.operators.{Kmeans, Multimodal, Pq}
import graft.queries.{Pipeline, Quality}
import org.apache.spark.sql.functions._

/** Product quantization, semantic dedup, the two multimodal transform
  * stages, and the trained n-gram language classifier — each pinned
  * against an independent plain-Scala recompute (no Spark expressions on
  * the reference side).
  */
class PqSpec extends SparkSuite {

  test("pq model shape and codes are the true per-subspace residual argmin") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val coarse = Kmeans.train(emb, k = 8, iters = 2)
    val model = Pq.train(emb, coarse)
    assert(model.length == Pq.M)
    model.foreach { cb =>
      assert(cb.length == Pq.K)
      cb.foreach(c => assert(c.length == Pq.SubDim))
    }
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val got = Kmeans.quantized(emb)
      .join(Pq.codesWide(emb, coarse, model), "vec_id")
      .select(col("vec_id"), col("v"), col("cell"), col("codes"))
      .collect()
    assert(got.length == 500)
    got.take(100).foreach { r =>
      val v = r.getSeq[Long](1).toArray
      val cell = r.getInt(2)
      val codes = r.getSeq[Int](3)
      // the declared IVFADC contract: cell is the coarse argmin, codes
      // are per-subspace argmins over the RESIDUAL v - coarse(cell)
      val refCell = coarse.zipWithIndex.map { case (c, cid) =>
        (sqd(v, c), cid) }.min._2
      assert(cell == refCell, s"vec ${r.getLong(0)} cell")
      val res = v.indices.map(i => v(i) - coarse(cell)(i)).toArray
      for (m <- 0 until Pq.M) {
        val sub = res.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
        val best = model(m).zipWithIndex.map { case (c, cid) =>
          (sqd(sub, c), cid)
        }.min // (dist, cid) lexicographic — the declared tie-break
        assert(codes(m) == best._2,
          s"vec ${r.getLong(0)} sub $m: got ${codes(m)}, want ${best._2}")
      }
    }
  }

  test("embedding_topk_pq equals a plain-Scala residual-ADC recompute") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val coarse = Pipeline.kmeansModel(spark, sf0001)
    val model = Pipeline.pqModel(spark, sf0001)
    val qv = Kmeans.quantized(emb.filter(col("vec_id") === 0))
      .select(col("v")).collect()(0).getSeq[Long](0).toArray
    val dt = Pq.distTables(model, coarse, qv)
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    // reference: assign the cell, encode the residual (argmin per
    // subspace), sum the per-cell table lookups
    val ref = Kmeans.quantized(emb).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("v")).collect()
      .map { r =>
        val v = r.getSeq[Long](1).toArray
        val cell = coarse.zipWithIndex.map { case (c, cid) =>
          (sqd(v, c), cid) }.min._2
        val res = v.indices.map(i => v(i) - coarse(cell)(i)).toArray
        val adc = (0 until Pq.M).map { m =>
          val sub = res.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
          val code = model(m).zipWithIndex.map { case (c, cid) =>
            (sqd(sub, c), cid)
          }.min._2
          dt(cell)(m)(code)
        }.sum
        (r.getLong(0), adc)
      }
      .sortBy { case (id, adc) => (adc, id) }
      .take(20)
    val got = Pipeline.embeddingTopkPq(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == ref.toSeq)
  }

  test("ivf_pq_topk equals a plain-Scala probe-and-ADC recompute") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val coarse = Pipeline.kmeansModel(spark, sf0001)
    val pq = Pipeline.pqModel(spark, sf0001)
    val qv = Kmeans.quantized(emb.filter(col("vec_id") === 0))
      .select(col("v")).collect()(0).getSeq[Long](0).toArray
    val dt = Pq.distTables(pq, coarse, qv)
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val probe = coarse.zipWithIndex.map { case (c, cid) => (sqd(qv, c), cid) }
      .sorted.take(3).map(_._2).toSet
    val ref = Kmeans.quantized(emb).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("v")).collect()
      .flatMap { r =>
        val v = r.getSeq[Long](1).toArray
        val cell = coarse.zipWithIndex.map { case (c, cid) =>
          (sqd(v, c), cid) }.min._2
        if (!probe(cell)) None
        else {
          val res = v.indices.map(i => v(i) - coarse(cell)(i)).toArray
          Some((r.getLong(0), (0 until Pq.M).map { m =>
            val sub = res.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
            dt(cell)(m)(
              pq(m).zipWithIndex.map { case (c, cid) => (sqd(sub, c), cid) }.min._2)
          }.sum))
        }
      }
      .sortBy { case (id, adc) => (adc, id) }.take(20)
    val got = Pipeline.ivfPqTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == ref.toSeq)
  }

  test("ivf_pq_batch equals a plain-Scala per-query probe recompute") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val coarse = Pipeline.kmeansModel(spark, sf0001)
    val pq = Pipeline.pqModel(spark, sf0001)
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val rows = Kmeans.quantized(emb).select(col("vec_id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
    val ref = rows.filter(_._1 < 8).sortBy(_._1).flatMap { case (qid, qv) =>
      val probe = coarse.zipWithIndex.map { case (c, cid) => (sqd(qv, c), cid) }
        .sorted.take(3).map(_._2).toSet
      val dt = Pq.distTables(pq, coarse, qv)
      rows.filter(_._1 != qid).flatMap { case (id, v) =>
        val cell = coarse.zipWithIndex.map { case (c, cid) =>
          (sqd(v, c), cid) }.min._2
        if (!probe(cell)) None
        else {
          val res = v.indices.map(i => v(i) - coarse(cell)(i)).toArray
          Some((id, (0 until Pq.M).map { m =>
            val sub = res.slice(m * Pq.SubDim, (m + 1) * Pq.SubDim)
            dt(cell)(m)(pq(m).zipWithIndex
              .map { case (c, cid) => (sqd(sub, c), cid) }.min._2)
          }.sum))
        }
      }.sortBy { case (id, adc) => (adc, id) }.take(20)
        .map { case (id, adc) => (qid, id, adc) }
    }
    val got = Pipeline.ivfPqBatch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == ref.toSeq)
    // the shared scan must prune at the directory level like the
    // single-query probe
    val plan = Pipeline.ivfPqBatch(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(1200))
  }

  test("mmr_rerank: greedy selection properties and real diversification") {
    val cand = Pipeline.embeddingTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val got = Pipeline.mmrRerank(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.length == 10 && got.map(_._1).toSeq == (1 to 10))
    // first pick is the relevance argmax ((sim desc, vec_id) tie-break)
    val top1 = cand.minBy { case (id, s0) => (-s0, id) }
    assert(got.head._2 == top1._1)
    assert(math.abs(got.head._3 - BigDecimal(0.5 * top1._2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    // every pick comes from the candidate set, no repeats
    val candIds = cand.map(_._1).toSet
    assert(got.map(_._2).forall(candIds) && got.map(_._2).distinct.length == 10)
    // full independent greedy recompute (pairwise sims re-derived from
    // raw embeddings here, not taken from the query's internals). NOTE:
    // scores are NOT monotone — a NEGATIVE max-relevance to the selected
    // set boosts a later pick above an earlier one, which the fixture
    // actually exhibits.
    val vecs = graft.sources.Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(cand.map(_._1): _*))
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val simq = cand.toMap
    var sel = List.empty[Long]
    val ref = (1 to 10).map { t =>
      val (c, sc) = cand.map(_._1).filterNot(sel.contains).map { c0 =>
        val maxRel = if (sel.isEmpty) 0.0
          else sel.map(s0 => sim(vecs(c0), vecs(s0))).max
        (c0, 0.5 * simq(c0) - 0.5 * maxRel)
      }.minBy { case (c0, s0) => (-s0, c0) }
      sel = sel :+ c
      (t, c, BigDecimal(sc).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    assert(got.toSeq == ref)
    // the diversification must actually bite on this fixture: MMR order
    // differs from the plain relevance order (not just a prefix copy)
    val plain = cand.sortBy { case (id, s0) => (-s0, id) }.take(10).map(_._1)
    assert(got.map(_._2).toSeq != plain.toSeq,
      "MMR returned the plain relevance ranking — diversity term dead")
  }

  test("embedding_topk_pq plans zero exchanges (map scan into TakeOrdered)") {
    // the declared scale contract: encode + ADC are per-row, top-k is
    // TakeOrderedAndProject — nothing in the plan may shuffle
    val plan = Pipeline.embeddingTopkPq(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(1000))
    assert(plan.contains("TakeOrderedAndProject"), plan.take(500))
  }

  test("ivf_pq_pruned: same answer as the inline probe, via directory pruning") {
    val inline = Pipeline.ivfPqTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val pruned = Pipeline.ivfPqPruned(spark, sf0001)
    val got = pruned.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == inline)
    // the probed-cell predicate must prune at the DIRECTORY level (an
    // unprobed cell's files are never opened), not as a post-scan filter
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"), plan.take(1200))
    // and the scan reads the 4-byte packed form, not raw vectors/arrays
    assert(plan.contains("code32:int"), plan.take(1200))
  }

  test("kmeans_profile matches a plain-Scala per-cell recompute") {
    val model = Pipeline.kmeansModel(spark, sf0001)
    val rows = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toArray
        val (dist, cid) = model.zipWithIndex.map { case (c, i) =>
          (c.indices.map(j => (v(j) - c(j)) * (v(j) - c(j))).sum, i) }.min
        (r.getLong(0), cid, dist, r.getInt(2))
      }
    val ref = rows.groupBy(_._2).map { case (cid, cell) =>
      val labels = cell.groupBy(_._4).map { case (l, o) => (l, o.length) }
      val (topLabel, topCnt) = labels.toSeq.minBy { case (l, c) => (-c, l) }
      cid.toLong -> (cell.length.toLong, cell.map(_._3).sum / cell.length,
        topLabel, 10000L * topCnt / cell.length)
    }
    val got = Pipeline.kmeansProfile(spark, sf0001).collect()
    assert(got.length == ref.size)
    got.foreach { r =>
      val (n, avg, lab, bp) = ref(r.getLong(0))
      assert(r.getLong(1) == n && r.getLong(2) == avg
        && r.getInt(3) == lab && r.getLong(4) == bp, s"cell ${r.getLong(0)}")
    }
  }

  test("lsh_recall counts the caught exact pairs from the two declared artifacts") {
    val exact = Pipeline.ngramJaccard(spark, sf0001)
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Pipeline.minhashBandCollisions(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val caught = exact.count(cand)
    val r = Pipeline.lshRecall(spark, sf0001).head()
    assert(r.getLong(0) == exact.size.toLong && r.getLong(1) == caught.toLong)
    assert(r.getLong(2) ==
      (if (exact.isEmpty) 10000L else 10000L * caught / exact.size))
    assert(exact.nonEmpty, "no exact pairs — the recall row would be vacuous")
  }

  test("pq_recall is internally consistent and non-trivial") {
    val r = Pipeline.pqRecall(spark, sf0001).collect()(0)
    val (k, nHit, bp) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(k == 20L)
    assert(nHit >= 1L && nHit <= 20L, s"n_hit $nHit")
    assert(bp == 10000L * nHit / 20L)
  }

  test("pq_rerank: top-20 comes from the ADC top-100 and recall dominates raw ADC") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val coarse = Pipeline.kmeansModel(spark, sf0001)
    val model = Pipeline.pqModel(spark, sf0001)
    val qv = Kmeans.quantized(emb.filter(col("vec_id") === 0))
      .select(col("v")).collect()(0).getSeq[Long](0).toArray
    val dt = Pq.distTables(model, coarse, qv)
    val shortlist = Pq.codesWide(emb, coarse, model).filter(col("vec_id") =!= 0)
      .select(col("vec_id"), Pq.adcScore(col("cell"), col("codes"), dt).as("adc"))
      .orderBy(col("adc"), col("vec_id")).limit(100)
      .collect().map(_.getLong(0)).toSet
    val rerank = Pipeline.pqRerankTopk(spark, sf0001).collect()
    assert(rerank.length == 20)
    assert(rerank.forall(r => shortlist(r.getLong(0))),
      "every re-ranked hit must come from the ADC shortlist")
    // re-rank distances are the exact integer L2 (spot-check vs driver math)
    val byId = emb.collect().map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray).toMap
    rerank.foreach { r =>
      val v = byId(r.getLong(0))
      val d = v.indices.map(i => { val dd = v(i) - qv(i); dd * dd }).sum
      assert(r.getLong(1) == d, s"vec ${r.getLong(0)}")
    }
    // the published contract: exact re-rank never loses to raw ADC top-20
    val adcRecall = Pipeline.pqRecall(spark, sf0001).collect()(0).getLong(1)
    val rrRecall = Pipeline.pqRerankRecall(spark, sf0001).collect()(0).getLong(1)
    assert(rrRecall >= adcRecall, s"rerank $rrRecall < adc $adcRecall")
  }

  test("bq_topk: sign-code Hamming scan matches a plain-Scala recompute") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def code(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) if (v(i) > 0f) lo |= (1L << i)
      for (i <- 32 until 64) if (v(i) > 0f) hi |= (1L << (i - 32))
      (lo, hi)
    }
    val (ql, qh) = code(rows(0L))
    val expect = rows.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val (lo, hi) = code(v)
      (id, java.lang.Long.bitCount(lo ^ ql).toLong
        + java.lang.Long.bitCount(hi ^ qh).toLong)
    }.sortBy { case (id, h) => (h, id) }.take(20)
    val got = Pipeline.bqTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
  }

  test("bq_rerank: picks come from the Hamming shortlist; recall dominates raw BQ") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def code(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      for (i <- 0 until 32) if (v(i) > 0f) lo |= (1L << i)
      for (i <- 32 until 64) if (v(i) > 0f) hi |= (1L << (i - 32))
      (lo, hi)
    }
    val (ql, qh) = code(rows(0L))
    val shortlist = rows.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val (lo, hi) = code(v)
      (id, java.lang.Long.bitCount(lo ^ ql) + java.lang.Long.bitCount(hi ^ qh))
    }.sortBy { case (id, h) => (h, id) }.take(100).map(_._1).toSet
    def sim6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = Pipeline.bqRerankTopk(spark, sf0001).collect()
    assert(got.length == 20)
    got.foreach { r =>
      assert(shortlist(r.getLong(0)), s"vec ${r.getLong(0)} not in shortlist")
      assert(r.getDouble(1) == sim6(rows(r.getLong(0)), rows(0L)),
        s"vec ${r.getLong(0)} sim")
    }
    // raw Hamming top-20 is a prefix of the shortlist order, so any exact
    // top-20 member it catches is also caught after exact re-ranking
    val raw = Pipeline.bqRecall(spark, sf0001).collect()(0).getLong(1)
    val rr = Pipeline.bqRerankRecall(spark, sf0001).collect()(0).getLong(1)
    assert(rr >= raw, s"rerank $rr < raw $raw")
    assert(raw >= 1L, "degenerate fixture: raw BQ catches nothing")
  }

  test("sq8_topk: 8-bit scalar-quantized scan matches a plain-Scala recompute") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
      .toMap
    val dims = micro(0L).length
    val mins = (0 until dims).map(i => micro.values.map(_(i)).min).toArray
    val rngs = (0 until dims).map(i =>
      math.max(micro.values.map(_(i)).max - mins(i), 1L)).toArray
    def code(v: Array[Long]): Array[Long] =
      v.indices.map(i => ((v(i) - mins(i)) * 255L) / rngs(i)).toArray
    val qc = code(micro(0L))
    val expect = micro.toSeq.filter(_._1 != 0L).map { case (id, v) =>
      val c = code(v)
      (id, c.indices.map(i => (c(i) - qc(i)) * (c(i) - qc(i))).sum)
    }.sortBy { case (id, qd) => (qd, id) }.take(20)
    val got = Pipeline.sq8Topk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    // codes are genuinely 8-bit: the recompute's grid stays in [0, 255]
    micro.values.foreach(v => code(v).foreach(c => assert(c >= 0L && c <= 255L)))
    val bp = Pipeline.sq8Recall(spark, sf0001).collect()(0).getLong(2)
    assert(bp >= 1000L, s"degenerate fixture: sq8 recall $bp bp")
  }

  test("intrinsic_dim: two-NN Facco estimate matches a plain-Scala recompute") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
    val terms = micro.filter(_._1 < 500).map { case (i, vi) =>
      val ds = micro.filter(_._1 != i).map { case (j, vj) =>
        (vi.indices.map(k => (vi(k) - vj(k)) * (vi(k) - vj(k))).sum, j)
      }.filter(_._1 > 0).sorted.take(2)
      Math.round(0.5 * math.log(ds(1)._1.toDouble / ds(0)._1.toDouble) * 1e9)
    }
    val r = graft.queries.Pipeline.intrinsicDim(spark, sf0001).collect().head
    assert(r.getLong(0) == terms.length.toLong)
    assert(r.getLong(1) == terms.sum)
    assert(r.getLong(2) == 1000L * terms.length * 1000000000L / terms.sum)
    // a real dimensionality read: well inside (0, ambient 64)
    assert(r.getLong(2) > 1000L && r.getLong(2) < 64000L)
  }

  test("pca_power: loadings match a plain-Scala power iteration and capture real variance") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
    val dims = 64
    val mu = Array.tabulate(dims)(j => micro.map(_(j)).sum / micro.length)
    val c = micro.map(v => Array.tabulate(dims)(j => v(j) - mu(j)))
    var v = Array.fill(dims)(125L)
    for (_ <- 1 to 3) {
      val w = Array.fill(dims)(BigInt(0))
      c.foreach { ci =>
        var dot = 0L
        for (j <- 0 until dims) dot += ci(j) * v(j)
        for (j <- 0 until dims) w(j) += BigInt(ci(j)) * BigInt(dot)
      }
      val wd = w.map(_.toDouble)
      val norm = math.sqrt(wd.foldLeft(0.0)((a, x) => a + x * x))
      v = wd.map(x => math.round(1000.0 * x / norm))
    }
    val got = Pipeline.pcaPower(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSeq
    assert(got == v.zipWithIndex.map { case (x, j) => (j, x) }.toSeq)
    // direction is genuinely unit on the milli lattice
    val n2 = got.map(_._2).map(x => x * x).sum
    assert(math.abs(math.sqrt(n2.toDouble) - 1000.0) < 35.0)
    // and captures more variance than the mean coordinate axis: Rayleigh
    // quotient along v must beat the average per-axis variance
    def rayleigh(dir: Array[Long]): Double = {
      val d2 = dir.map(x => x * x).sum.toDouble
      c.map { ci =>
        val dot = ci.indices.map(j => ci(j) * dir(j)).sum
        dot.toDouble * dot.toDouble / d2
      }.sum / c.length
    }
    val avgVar = c.map(_.map(x => x.toDouble * x).sum).sum / c.length / dims
    assert(rayleigh(v) > avgVar,
      "top PC must explain more than an average axis")
  }

  test("ann_pareto: table equals the individual recall contracts and re-rank never loses") {
    val got = Pipeline.annPareto(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def bp(df: org.apache.spark.sql.DataFrame) = df.collect()(0).getLong(2)
    val expect = Map(
      "pq4" -> ((4L, bp(Pipeline.pqRecall(spark, sf0001)))),
      "pq4_rerank" -> ((4L, bp(Pipeline.pqRerankRecall(spark, sf0001)))),
      "bq8" -> ((8L, bp(Pipeline.bqRecall(spark, sf0001)))),
      "bq8_rerank" -> ((8L, bp(Pipeline.bqRerankRecall(spark, sf0001)))),
      "sq8_64" -> ((64L, bp(Pipeline.sq8Recall(spark, sf0001)))),
      "rp16_128" -> ((128L, bp(Pipeline.rpRecall(spark, sf0001)))))
    assert(got == expect)
    // the re-rank rows must never fall below their raw-scan siblings
    assert(got("pq4_rerank")._2 >= got("pq4")._2)
    assert(got("bq8_rerank")._2 >= got("bq8")._2)
  }

  test("quantization_error: three-method MSE table matches a plain-Scala recompute") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
    val n = micro.length
    // pq: nearest-coarse cell, then per-subspace nearest residual codebook
    val coarse = Pipeline.kmeansModel(spark, sf0001)
    val model = Pipeline.pqModel(spark, sf0001)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val pqSe = micro.map { v =>
      val cell = coarse.zipWithIndex
        .map { case (c, i) => (d2(v, c), i) }.min._2
      val r = v.indices.map(i => v(i) - coarse(cell)(i)).toArray
      (0 until 4).map { m =>
        val sub = r.slice(m * 16, m * 16 + 16)
        model(m).map(cb => d2(sub, cb)).min
      }.sum
    }.map(BigInt(_)).sum
    // sq8 grid round-trip
    val mn = Array.tabulate(64)(j => micro.map(_(j)).min)
    val rng = Array.tabulate(64)(j => math.max(micro.map(_(j)).max - mn(j), 1L))
    val sqSe = micro.map { v =>
      v.indices.map { j =>
        val code = (v(j) - mn(j)) * 255 / rng(j)
        val rec = mn(j) + code * rng(j) / 255
        (v(j) - rec) * (v(j) - rec)
      }.sum
    }.map(BigInt(_)).sum
    // bq sign-amplitude
    val amp = Array.tabulate(64)(j => micro.map(x => math.abs(x(j))).sum / n)
    val bqSe = micro.map { v =>
      v.indices.map { j =>
        val rec = if (v(j) >= 0) amp(j) else -amp(j)
        (v(j) - rec) * (v(j) - rec)
      }.sum
    }.map(BigInt(_)).sum
    val expect = Seq(
      ("bq", 8L, n.toLong, (bqSe / n).toLong),
      ("pq", 4L, n.toLong, (pqSe / n).toLong),
      ("sq8", 64L, n.toLong, (sqSe / n).toLong))
    val got = Pipeline.quantizationError(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // the ladder is real: 64 B/vec must beat both compact codes
    val mse = got.map(r => r._1 -> r._4).toMap
    assert(mse("sq8") < mse("bq") && mse("sq8") < mse("pq"))
  }

  test("mutual_knn: pairs match a brute-force recompute and mutuality is the precision filter") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .filter(col("vec_id") < 1000)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def sim6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val xs = rows.filter(_._1 % 2 == 0); val ys = rows.filter(_._1 % 2 == 1)
    val tx = xs.map { case (x, xv) =>
      x -> ys.map { case (y2, yv) => (y2, sim6(xv, yv)) }
        .sortBy { case (y2, s0) => (-s0, y2) }.head }.toMap
    val ty = ys.map { case (y2, yv) =>
      y2 -> xs.map { case (x, xv) => (x, sim6(xv, yv)) }
        .sortBy { case (x, s0) => (-s0, x) }.head._1 }.toMap
    val expect = tx.toSeq.collect {
      case (x, (y2, s0)) if ty(y2) == x => (x, y2, s0)
    }.sortBy(_._1)
    val got = Pipeline.mutualKnn(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
    // mutuality genuinely filters: strictly fewer pairs than one-way top-1s
    assert(got.nonEmpty && got.size < tx.size)
    // and it is a matching: no endpoint repeats
    assert(got.map(_._1).distinct.size == got.size)
    assert(got.map(_._2).distinct.size == got.size)
  }

  test("embedding_anisotropy: exact ratio matches a driver recompute; fixture reads isotropic") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
    val n = micro.length
    val mu = Array.tabulate(64)(j => micro.map(_(j)).sum / n)
    val mu2 = mu.map(m => BigInt(m) * m).sum
    val sn2 = micro.map(v => BigInt(v.map(x => x * x).sum)).sum
    val r = Pipeline.embeddingAnisotropy(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((n.toLong, mu2.toLong, (sn2 / n).toLong,
        (BigInt(10000) * mu2 / (sn2 / n)).toLong)))
    // unit-norm vectors: mean squared norm sits at the 1e12 micro^2 unit
    assert(math.abs(r.getLong(2) - 1000000000000L) < 2000000000L)
    // the synthetic space is honestly ISOTROPIC (tiny mean vector): the
    // diagnostic must say "no centering needed", not flatter itself
    assert(r.getLong(3) < 500L)
  }

  test("mmd_drift: linear-time estimator matches a driver recompute of the quadruple kernel") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray).toMap
    def k(a: Array[Long], b: Array[Long]): Long = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      val dd = d / 1000000 + 1000000
      dd * dd
    }
    val quads = micro.keys.map(_ / 4).toSeq.distinct.sorted.flatMap { i =>
      val ids = (0 to 3).map(p => 4 * i + p)
      if (ids.forall(micro.contains)) {
        val Seq(x1, y1, x2, y2) = ids.map(micro)
        Some(k(x1, x2) + k(y1, y2) - k(x1, y2) - k(x2, y1))
      } else None
    }
    val expect = (quads.length.toLong,
      (quads.map(BigInt(_)).sum / quads.length).toLong)
    val r = Pipeline.mmdDrift(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == expect)
    // iid split sanity: |MMD_l| far below the kernel's own scale (1e12)
    assert(math.abs(r.getLong(1)) < 400000000000L,
      "an even/odd split of one corpus must not read as massive drift")
  }

  test("rp_topk: JL-projected scan matches a plain-Scala recompute of the ±1 projection") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
    def proj(v: Array[Long]): Array[Long] =
      Array.tabulate(16)(o =>
        v.indices.map(i => v(i) * Pipeline.rpSign(o, i)).sum)
    val ps = micro.map { case (id, v) => id -> proj(v) }
    val qp = ps.find(_._1 == 0L).get._2
    val expect = ps.filter(_._1 != 0L).map { case (id, p) =>
      (id, p.indices.map(o => (p(o) - qp(o)) * (p(o) - qp(o))).sum)
    }.sortBy { case (id, d) => (d, id) }.take(20).toSeq
    val got = Pipeline.rpTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expect)
    // the signs are genuinely mixed (a constant matrix would be a
    // projection onto one direction repeated 16 times)
    val allSigns = for (o <- 0 until 16; i <- 0 until 64) yield Pipeline.rpSign(o, i)
    assert(allSigns.contains(1L) && allSigns.contains(-1L))
    // published contract exists and is non-degenerate
    val bp = Pipeline.rpRecall(spark, sf0001).collect()(0).getLong(2)
    assert(bp > 0L && bp <= 10000L)
  }

  test("kcenter_coreset: 8 centers match a plain-Scala Gonzalez traversal") {
    val micro = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => Math.round(x.toDouble * 1e6)).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    var picked = Vector((micro.head._1, micro.head._2, 0L))
    for (_ <- 1 to 7) {
      val far = micro.map { case (id, v) =>
        (id, v, picked.map(c => d2(v, c._2)).min)
      }.sortBy { case (id, _, m) => (-m, id) }.head
      picked :+= ((far._1, far._2, far._3))
    }
    val expect = picked.zipWithIndex
      .map { case ((id, _, r), t) => (t, id, r) }.toSeq
    val got = Pipeline.kcenterCoreset(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // the greedy invariant: the coverage radius never increases
    val radii = got.drop(1).map(_._3)
    assert(radii == radii.sorted.reverse, "radii must be non-increasing")
    assert(got.map(_._2).distinct.size == 8, "centers must be distinct")
  }

  test("knn_label_consistency: neighborhood vote matches a plain-Scala recompute") {
    val rows = spark.read.parquet(s"$sf0001/embeddings.parquet").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def sim6(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = rows.filter(_._1 % 25 == 0).map { case (qid, qv, qlab) =>
      val nn = rows.filter(_._1 != qid)
        .map { case (id, v, lab) => (id, lab, sim6(v, qv)) }
        .sortBy { case (id, _, s) => (-s, id) }.take(10)
      (qid, qlab, nn.count(_._2 == qlab).toLong)
    }.sortBy { case (id, _, n) => (n, id) }.toSeq
    val got = Pipeline.knnLabelConsistency(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == expect)
    // the audit is non-degenerate: the vote separates vectors
    assert(expect.map(_._3).distinct.length >= 2)
  }

  test("hard_negatives: per-anchor cross-label top-5 matches a plain-Scala recompute") {
    val rows = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding"), col("label")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray, r.getInt(2)))
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ref = rows.filter(_._1 < 8).sortBy(_._1).flatMap { case (aid, ae, al) =>
      rows.filter(_._3 != al)
        .map { case (id, e, _) => (sim(ae, e), id) }
        .sortBy { case (s0, id) => (-s0, id) }
        .take(5).zipWithIndex
        .map { case ((s0, id), i) => (aid, id, s0, i + 1) }
    }
    val got = Pipeline.hardNegatives(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.toSeq == ref.toSeq)
    // the mined negatives must actually be hard (high-sim) or the
    // fixture proves nothing
    assert(ref.forall(_._3 > 0.0) && ref.size == 40)
  }

  test("semantic_contamination: within-cell test/train leaks match a plain-Scala recompute") {
    val model = Pipeline.semanticModel(spark, sf0001)
    val rows = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray
        val v = e.map(x => math.round(x.toDouble * 1e6))
        val cid = model.zipWithIndex.map { case (c, i) =>
          (c.indices.map(j => (v(j) - c(j)) * (v(j) - c(j))).sum, i)
        }.min._2
        (r.getLong(0), cid, e)
      }
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      BigDecimal(dot / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val ref = (for {
      (tid, tc, te) <- rows if tid % 10 == 0
      (rid, rc, re) <- rows if rid % 10 != 0 && rc == tc
      s0 = sim(te, re) if s0 >= 0.35
    } yield (tid, rid, s0)).sortBy { case (a, b, _) => (a, b) }
    val got = Pipeline.semanticContamination(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == ref.toSeq)
    assert(ref.nonEmpty, "no leaks on fixture — threshold dead, spec vacuous")
  }

  test("embedding_drift: per-label centroid shift matches a plain-Scala recompute") {
    val rows = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("label"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.round(x.toDouble * 1e6)).toArray))
    val ref = rows.groupBy(_._2).flatMap { case (label, vs) =>
      val a = vs.filter(_._1 % 2 == 0)
      val b = vs.filter(_._1 % 2 == 1)
      if (a.isEmpty || b.isEmpty) None
      else {
        def cent(g: Array[(Long, Int, Array[Long])]): Array[Long] =
          Array.tabulate(64)(i => g.map(_._3(i)).sum / g.length)
        val (ca, cb) = (cent(a), cent(b))
        val shift = (0 until 64).map(i => (ca(i) - cb(i)) * (ca(i) - cb(i))).sum
        Some((label, a.length.toLong, b.length.toLong, shift))
      }
    }.toSeq.sortBy(_._1)
    val got = Pipeline.embeddingDrift(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == ref)
    assert(ref.nonEmpty && ref.exists(_._4 > 0L),
      "fixture snapshots identical — drift report vacuous")
  }

  test("dedup_semantic: keep-lowest-id rule matches a plain-Scala recompute") {
    val model = Pipeline.semanticModel(spark, sf0001)
    val rows = graft.sources.Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val e = r.getSeq[Float](1).toArray
        val v = e.map(x => math.round(x.toDouble * 1e6))
        val cid = model.zipWithIndex.map { case (c, i) =>
          (c.indices.map(j => (v(j) - c(j)) * (v(j) - c(j))).sum, i)
        }.min._2
        (r.getLong(0), cid, e)
      }
    // the exact fold CosineSimExpr implements, then HALF_UP at 6 dp
    def sim(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb))
      BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byCell = rows.groupBy(_._2)
    val dropped = byCell.values.flatMap { cell =>
      val sorted = cell.sortBy(_._1)
      for {
        j <- sorted.indices
        i <- 0 until j
        if sim(sorted(i)._3, sorted(j)._3) >= 0.35
      } yield sorted(j)._1
    }.toSet
    val got = Pipeline.dedupSemantic(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.length == rows.length)
    got.foreach { case (id, cid, kept) =>
      val refCell = rows.find(_._1 == id).get._2.toLong
      assert(cid == refCell, s"vec $id cell: got $cid want $refCell")
      assert(kept == !dropped(id), s"vec $id kept: got $kept")
    }
    // the rule must actually fire on this corpus, or the spec proves nothing
    assert(dropped.nonEmpty, "no semantic duplicates found — threshold dead?")
  }

  test("streaming PQ encode equals the batch encode pass on replay") {
    val coarse = Pipeline.kmeansModel(spark, sf0001)
    val model = Pipeline.pqModel(spark, sf0001)
    val streamDir = java.nio.file.Files.createTempDirectory("graft-pq-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(sf0001, "embeddings.parquet"),
      streamDir.resolve("embeddings-000.parquet"))
    val q = Pq.encodeStream(spark, sf0001, streamDir.toString, coarse, model)
      .selectExpr("vec_id", "cell",
        "codes[0] c0", "codes[1] c1", "codes[2] c2", "codes[3] c3")
      .writeStream.outputMode("append").format("memory")
      .queryName("pq_stream").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("pq_stream").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5))).toSet
    val batch = Pq.codesWide(
        graft.sources.Tables.embeddings(spark, sf0001), coarse, model)
      .collect().map { r =>
        val c = r.getSeq[Int](2)
        (r.getLong(0), r.getInt(1), c(0), c(1), c(2), c(3))
      }.toSet
    assert(streamed == batch)
    spark.sql("DROP TABLE IF EXISTS pq_stream")
  }

  test("streamed index appends are visible to the cell-pruned probe without rebuild") {
    // the encodeStream scaladoc's contract, pinned: new vectors encoded
    // on ingest and APPENDED into the cell=<cid> layout are served by
    // the same directory-pruned ADC probe, no index rebuild
    val coarse = Pipeline.kmeansModel(spark, sf0001)
    val model = Pipeline.pqModel(spark, sf0001)
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val base = java.nio.file.Files.createTempDirectory("graft-pq-append")
    val idxDir = base.resolve("index").toString
    val streamDir = java.nio.file.Files.createDirectory(base.resolve("in"))
    // initial index build: the batch encode pass, partitioned by cell
    graft.sources.Layout.writePartitioned(
      Pq.codesWide(emb, coarse, model).select(col("vec_id"), col("cell"),
        Pq.packCodes(col("codes")).as("code32")), idxDir, "cell")
    val n0 = spark.read.parquet(idxDir).count()
    // a new vector batch arrives: same payloads, shifted ids (staged as
    // a FLAT file — the file stream source does not list nested dirs)
    val stage = java.nio.file.Files.createTempDirectory("graft-pq-append-stage")
    emb.withColumn("vec_id", col("vec_id") + 100000L)
      .coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = new java.io.File(stage.toString).listFiles()
      .find(_.getName.endsWith(".parquet")).get.toPath
    java.nio.file.Files.copy(part, streamDir.resolve("b0.parquet"))
    val q = Pq.encodeStream(spark, sf0001, streamDir.toString, coarse, model)
      .select(col("vec_id"), col("cell"), Pq.packCodes(col("codes")).as("code32"))
      .writeStream
      .option("checkpointLocation", base.resolve("ck").toString)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.write.mode("append").partitionBy("cell").parquet(idxDir)
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val idx = spark.read.parquet(idxDir)
    assert(idx.count() == 2 * n0, "appended batch missing from the index")
    // probe exactly like ivfPqPruned and require hits from the APPENDED ids
    val qv = graft.operators.Kmeans.quantized(emb.filter(col("vec_id") === 0))
      .select(col("v")).collect()(0).getSeq[Long](0).toArray
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val probed = coarse.zipWithIndex.map { case (c, cid) => (sqd(qv, c), cid) }
      .sorted.take(3).map(_._2)
    val dt = Pq.distTables(model, coarse, qv)
    val top = idx.filter(col("cell").isin(probed: _*))
      .filter(col("vec_id") =!= 0 && col("vec_id") =!= 100000L)
      .select(col("vec_id"),
        Pq.adcScorePacked(col("cell"), col("code32"), dt).as("adc"))
      .orderBy(col("adc"), col("vec_id")).limit(40).collect()
    val ids = top.map(_.getLong(0)).toSet
    assert(ids.exists(_ >= 100000L), "probe never surfaced an appended vector")
    // every appended twin scores identically to its original (same
    // payload -> same cell, same codes, same ADC)
    val byScore = top.map(r => (r.getLong(0), r.getLong(1)))
    byScore.filter(_._1 >= 100000L).foreach { case (id, adc) =>
      val twin = byScore.find(_._1 == id - 100000L)
      twin.foreach { case (_, a2) => assert(a2 == adc, s"twin of $id differs") }
    }
  }

  test("image thumbnail samples the real frame-0 pixel bytes") {
    import Multimodal.{BmpFile, BmpThumbCodec, MediaIn}
    val codec = new BmpThumbCodec
    // non-uniform geometry: stride padding (w=7 -> rb=24 != 21) exercised
    val (w, h, seed) = (7, 5, 99L)
    val bytes = BmpFile.build(w, h, seed)
    val px = codec.thumb(MediaIn(7L, bytes))
    assert(px.length == 16)
    px.foreach { p =>
      val sx = p.px * w / 4; val sy = p.py * h / 4
      val base = sx * 3 + sy * 31 + seed
      assert(p.b == ((base + 0) & 0xFF) && p.g == ((base + 1) & 0xFF)
        && p.r == ((base + 2) & 0xFF), s"pixel (${p.px},${p.py})")
    }
    // multi-frame payload: only frame 0 is sampled (seed shift would show)
    val two = BmpFile.build(w, h, 5L) ++ BmpFile.build(w, h, 6L)
    val p0 = codec.thumb(MediaIn(1L, two))
    assert(p0.head.b == ((0 * 3 + 0 * 31 + 5L) & 0xFF).toInt)
    // corrupted magic must throw, not fabricate pixels
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](codec.thumb(MediaIn(2L, bad)))
    // BITMAPV5 header (bfOffBits=138): same image, longer header — the
    // codec must honor bfOffBits, not hash header bytes as pixels
    assert(codec.thumb(MediaIn(7L, BmpFile.buildV5(w, h, seed))) == px)
    // a lying pixel offset (past the buffer) must throw, not read junk
    val lied = bytes.clone()
    java.nio.ByteBuffer.wrap(lied).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, bytes.length + 1)
    intercept[IllegalArgumentException](codec.thumb(MediaIn(3L, lied)))
    // a V5 file (declared 124-byte DIB) lying bfOffBits=60 must throw:
    // the truncation guard alone would pass (the file is long enough)
    // and the codec would silently hash header-extension bytes as pixels
    val liedV5 = BmpFile.buildV5(w, h, seed)
    java.nio.ByteBuffer.wrap(liedV5).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, 60)
    intercept[IllegalArgumentException](codec.thumb(MediaIn(4L, liedV5)))
    // hostile DIB size near Int.MaxValue: `14 + dib` in INT arithmetic
    // overflows negative, so the cross-check would pass ANY bfOffBits —
    // here one pointing INTO the header (off=14) — and silently sample
    // header bytes as pixels. The guard must run in long arithmetic
    // (and cap dib), so this throws.
    val hostile = bytes.clone()
    java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, 14).putInt(14, Int.MaxValue)
    intercept[IllegalArgumentException](codec.thumb(MediaIn(5L, hostile)))
  }

  test("image_phash: aHash bits come from the real decoded gray grid") {
    import Multimodal.{BmpFile, BmpAHashCodec, MediaIn}
    val codec = new BmpAHashCodec
    val (w, h, seed) = (7, 5, 99L)
    val r = codec.ahash(MediaIn(7L, BmpFile.build(w, h, seed)))
    assert(r.w == w && r.h == h)
    // independent recompute from the builder's pixel formula
    val gray = (0 until 64).map { i =>
      val py = i / 8; val px = i % 8
      val base = (px * w / 8) * 3 + (py * h / 8) * 31 + seed
      ((base + 0) % 256) + ((base + 1) % 256) + ((base + 2) % 256)
    }
    val mean = gray.sum / 64
    assert(r.gray_mean == mean)
    (0 until 64).foreach { i =>
      val bit = if (i < 32) (r.hash_lo >> i) & 1L else (r.hash_hi >> (i - 32)) & 1L
      assert(bit == (if (gray(i) > mean) 1L else 0L), s"bit $i")
    }
    // a one-pixel-region change flips only nearby bits (locality — the
    // property that makes aHash a near-dup key, not an exact hash)
    val r2 = codec.ahash(MediaIn(8L, BmpFile.build(w, h, seed + 1)))
    val ham = java.lang.Long.bitCount(r.hash_lo ^ r2.hash_lo) +
      java.lang.Long.bitCount(r.hash_hi ^ r2.hash_hi)
    assert(ham < 64, "similar images must not produce unrelated hashes")
    // corrupted magic must throw, not fabricate a hash
    val bad = BmpFile.build(w, h, seed); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](codec.ahash(MediaIn(9L, bad)))
    // BITMAPV5 header: identical pixels at bfOffBits=138 must hash
    // identically (the offset-honoring contract, thumbnail sibling)
    val r5 = codec.ahash(MediaIn(7L, BmpFile.buildV5(w, h, seed)))
    assert(r5 == r)
    // V5 file lying bfOffBits below 14 + declared DIB size must throw
    // (the thumbnail sibling's DIB cross-check)
    val liedV5 = BmpFile.buildV5(w, h, seed)
    java.nio.ByteBuffer.wrap(liedV5).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, 60)
    intercept[IllegalArgumentException](codec.ahash(MediaIn(10L, liedV5)))
    // hostile DIB size near Int.MaxValue overflowing `14 + dib` in Int:
    // the thumbnail sibling's long-arithmetic/dib-cap regression
    val hostile = BmpFile.build(w, h, seed)
    java.nio.ByteBuffer.wrap(hostile).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(10, 14).putInt(14, Int.MaxValue)
    intercept[IllegalArgumentException](codec.ahash(MediaIn(11L, hostile)))
  }

  test("imageio codec: PNG decode is exact, JPEG near, corrupt streams throw") {
    import Multimodal.{BmpAHashCodec, BmpFile, ImageIoCodec, ImageIoFile, MediaIn}
    val codec = new ImageIoCodec
    val (w, h, seed) = (7, 5, 99L)
    // PNG is lossless: thumb pixels equal the planted arithmetic exactly,
    // and the aHash matches the pure-JVM BMP codec's hash of the same
    // planted image — two decoders, two container formats, one raster
    val png = ImageIoFile.buildPng(w, h, seed)
    assert(codec.sniff(png) == "png")
    codec.thumb(MediaIn(7L, png)).foreach { p =>
      val base = (p.px * w / 4) * 3 + (p.py * h / 4) * 31 + seed
      assert(p.b == (base & 0xFF) && p.g == ((base + 1) & 0xFF)
        && p.r == ((base + 2) & 0xFF), s"png pixel (${p.px},${p.py})")
    }
    val viaPng = codec.ahash(MediaIn(7L, png))
    val viaBmp = new BmpAHashCodec().ahash(MediaIn(7L, BmpFile.build(w, h, seed)))
    assert(viaPng == viaBmp)
    // JPEG is lossy by design: geometry is exact, the DC (mean gray) and
    // the aHash bits move only within the measured q=1.0 rounding band
    // (max mean err 4, max Hamming 4 across the full fixture geometry
    // range — asserted at 2x slack)
    val jpg = ImageIoFile.buildJpeg(w, h, seed)
    assert(codec.sniff(jpg) == "jpeg")
    val m = codec.meta(MediaIn(3L, jpg))
    assert(m.format == "jpeg" && m.w == w && m.h == h)
    val viaJpg = codec.ahash(MediaIn(3L, jpg))
    assert(math.abs(viaJpg.gray_mean - viaPng.gray_mean) <= 8)
    val ham = java.lang.Long.bitCount(viaJpg.hash_lo ^ viaPng.hash_lo) +
      java.lang.Long.bitCount(viaJpg.hash_hi ^ viaPng.hash_hi)
    assert(ham <= 8, s"jpeg ahash drifted $ham bits from the lossless hash")
    // corrupt streams must throw, not fabricate pixels: wrong magic,
    // truncated PNG, bit-flipped PNG header chunk, truncated JPEG
    intercept[IllegalArgumentException](codec.meta(MediaIn(1L, Array[Byte](1, 2, 3, 4))))
    intercept[IllegalArgumentException](
      codec.thumb(MediaIn(2L, java.util.Arrays.copyOf(png, png.length / 2))))
    val flipped = png.clone(); flipped(20) = (flipped(20) ^ 0x55).toByte
    intercept[IllegalArgumentException](codec.thumb(MediaIn(4L, flipped)))
    intercept[IllegalArgumentException](
      codec.ahash(MediaIn(5L, java.util.Arrays.copyOf(jpg, jpg.length / 2))))
  }

  test("image_dedup / image_neardup: hash clusters and banded pairs match brute force") {
    val hs = graft.operators.Multimodal
      .imageHashes(spark, graft.sources.Tables.documents(spark, sf0001)).collect()
      .map(h => (h.doc_id, h.hash_lo, h.hash_hi))
    // dedup census = plain groupBy of the collected hashes
    val expectClusters = hs.groupBy(h => (h._2, h._3)).map { case ((lo, hi), v) =>
      (v.map(_._1).min, v.length.toLong, lo, hi)
    }.toSeq.sortBy(_._1)
    val gotClusters = Pipeline.imageDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotClusters == expectClusters)
    assert(gotClusters.exists(_._2 > 1), "fixture must exhibit hash collapse")
    // banded near-dup pairs = brute-force Hamming <= 3 over all pairs:
    // the pigeonhole contract (3 flips touch <= 3 of 4 bands, so some
    // band survives intact) makes the band join lossless at this
    // threshold — equality with brute force IS the recall proof
    val bounded = hs.filter(_._1 < 500)
    val expectPairs = (for {
      i <- bounded.indices; j <- (i + 1) until bounded.length
    } yield {
      val (a, b) = (bounded(i), bounded(j))
      val (id1, id2) = if (a._1 < b._1) (a._1, b._1) else (b._1, a._1)
      val ham = java.lang.Long.bitCount(a._2 ^ b._2) +
        java.lang.Long.bitCount(a._3 ^ b._3)
      (id1, id2, ham)
    }).filter(_._3 <= 3).sortBy(p => (p._1, p._2))
    val gotPairs = Pipeline.imageNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(gotPairs == expectPairs)
    assert(gotPairs.nonEmpty, "fixture must exhibit near-dup images")
  }

  test("ann_filtered_topk: pre-filtered exact top-k matches a driver recompute") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val allowed = docs.filter(col("lang") === "en")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val vecs = graft.sources.Tables.embeddings(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toMap
    val qv = vecs(0L)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.indices.map(i => a(i) * b(i)).sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      BigDecimal(dot / (na * nb)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val expect = vecs.toSeq
      .filter { case (id, _) => id != 0L && allowed(id) }
      .map { case (id, v) => (id, cos(v, qv)) }
      .sortBy { case (id, s) => (-s, id) }.take(20)
    val got = Pipeline.annFilteredTopk(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == expect)
    // the predicate binds: every hit is allowed, and the filtered list
    // differs from the unfiltered one (non-en vectors rank in the top-20)
    assert(got.forall(r => allowed(r._1)))
    val unfiltered = Pipeline.embeddingTopk(spark, sf0001).collect()
      .map(_.getLong(0)).toSeq
    assert(got.map(_._1) != unfiltered)
  }

  test("ann_filtered_topk_ivf / ann_filtered_recall: probe respects the predicate, recall is the overlap") {
    val allowed = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("lang") === "en").collect().map(_.getAs[Long]("doc_id")).toSet
    val exact = Pipeline.annFilteredTopk(spark, sf0001).collect().map(_.getLong(0)).toSeq
    val probed = Pipeline.annFilteredTopkIvf(spark, sf0001).collect().map(_.getLong(0)).toSeq
    assert(probed.nonEmpty && probed.forall(allowed))
    // probe hits are a subset of what brute force over probed cells
    // would return; recall is exactly the published overlap
    val hit = exact.count(probed.toSet)
    val got = Pipeline.annFilteredRecall(spark, sf0001).collect().head
    assert(got.getLong(0) == 20L && got.getLong(1) == hit.toLong
      && got.getLong(2) == 10000L * hit / 20)
  }

  test("ann_filtered_rerank: over-fetched shortlist fills k under the predicate, recall matches") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val allowed = docs.filter(col("lang") === "en")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val got = Pipeline.annFilteredRerank(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    // the point of the 2*k/selectivity over-fetch: k results survive the
    // predicate (a plain top-k shortlist would under-fill here —
    // selectivity is well under 1), and every one satisfies it
    assert(got.size == 20 && got.forall(r => allowed(r._1)))
    // exact filtered integer-L2 truth side, recomputed on the driver
    val q = graft.operators.Kmeans
      .quantized(graft.sources.Tables.embeddings(spark, sf0001)
        .filter(col("vec_id") === 0))
      .select(col("v")).collect()(0).getSeq[Long](0).toArray
    val exact = graft.operators.Kmeans
      .quantized(graft.sources.Tables.embeddings(spark, sf0001))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("v")).collect()
      .filter(r => allowed(r.getLong(0)))
      .map { r =>
        val v = r.getSeq[Long](1)
        (r.getLong(0), v.indices.map(i => { val d = v(i) - q(i); d * d }).sum)
      }.sortBy(p => (p._2, p._1)).take(20)
    // the re-ranked distances are the EXACT distances of whatever the
    // shortlist proposed (re-rank never approximates)
    val exactDist = exact.toMap ++ graft.operators.Kmeans
      .quantized(graft.sources.Tables.embeddings(spark, sf0001))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"), col("v")).collect()
      .map { r =>
        val v = r.getSeq[Long](1)
        (r.getLong(0), v.indices.map(i => { val d = v(i) - q(i); d * d }).sum)
      }.toMap
    got.foreach { case (id, dist) => assert(dist == exactDist(id), s"vec $id") }
    // the recall row is exactly the overlap with the exact filtered scan
    val hit = exact.map(_._1).count(got.map(_._1).toSet)
    val rec = Pipeline.annFilteredRerankRecall(spark, sf0001).collect().head
    assert(rec.getLong(0) == 20L && rec.getLong(1) == hit.toLong
      && rec.getLong(2) == 10000L * hit / 20)
  }

  test("imageio codec: PNG roundtrip is exact over the full fixture geometry range") {
    import Multimodal.{BmpAHashCodec, BmpFile, ImageIoCodec, ImageIoFile, MediaIn}
    val codec = new ImageIoCodec
    val bmp = new BmpAHashCodec
    // every (w, h) the payload builders can emit (w 4-15, h 4-14), two
    // seeds each: the JDK decoder must return the planted raster exactly
    // (PNG is lossless) — pinned via hash equality with the independent
    // pure-JVM BMP codec on the same planted image
    for (w <- 4 to 15; h <- 4 to 14; seed <- Seq(0L, 31L * (w * 16 + h))) {
      val viaPng = codec.ahash(MediaIn(1L, ImageIoFile.buildPng(w, h, seed)))
      val viaBmp = bmp.ahash(MediaIn(1L, BmpFile.build(w, h, seed)))
      assert(viaPng == viaBmp, s"geometry ${w}x$h seed $seed")
    }
  }

  test("image_dedup_incremental: the ingest gate drops exactly the already-seen hashes") {
    val hs = graft.operators.Multimodal
      .imageHashes(spark, graft.sources.Tables.documents(spark, sf0001)).collect()
      .map(h => (h.doc_id, h.hash_lo, h.hash_hi))
    val seen = hs.filter(_._1 < 300).map(h => (h._2, h._3)).toSet
    val expect = hs.filter(_._1 >= 250).filterNot(h => seen((h._2, h._3)))
      .sortBy(_._1).toSeq
    val got = Pipeline.imageDedupIncremental(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // the overlap slice (250-299) is guaranteed already-seen and drops
    assert(got.forall(_._1 >= 300))
    assert(got.nonEmpty && got.size < hs.count(_._1 >= 300),
      "the gate must drop some genuinely-new docs whose hash collides too")
  }

  test("video/audio incremental gates drop exactly the already-seen fingerprints") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    // video gate: the image_dedup_incremental contract on the 4-part key
    val vhs = graft.operators.Multimodal.videoHashes(spark, docs).collect()
    val vseen = vhs.filter(_.doc_id < 300)
      .map(v => (v.n_frames, v.hash_lo, v.hash_hi, v.contour_fp)).toSet
    val vexpect = vhs.filter(_.doc_id >= 250)
      .filterNot(v => vseen((v.n_frames, v.hash_lo, v.hash_hi, v.contour_fp)))
      .sortBy(_.doc_id)
      .map(v => (v.doc_id, v.n_frames, v.hash_lo, v.hash_hi, v.contour_fp)).toSeq
    val vgot = Pipeline.videoDedupIncremental(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(vgot == vexpect)
    // the replayed overlap slice (250-299) is guaranteed already-seen
    assert(vgot.nonEmpty && vgot.forall(_._1 >= 300))
    // audio gate on the (n_frames, fp) key
    val fps = Pipeline.audioFingerprint(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val aseen = fps.filter(_._1 < 300).map(f => (f._2, f._3)).toSet
    val aexpect = fps.filter(_._1 >= 250).filterNot(f => aseen((f._2, f._3)))
      .sortBy(_._1).toSeq
    val agot = Pipeline.audioDedupIncremental(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(agot == aexpect)
    assert(agot.forall(_._1 >= 300))
    // the fixture's strong audio collapse (71 codes / 500 clips) makes
    // the audio gate the harshest of the three: it must keep FEWER
    // survivors than the video gate over the same replayed batch
    assert(agot.size < vgot.size)
  }

  test("audio_dedup / modality_dedup_summary: censuses match driver recomputes") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val fps = Pipeline.audioFingerprint(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expectAudio = fps.groupBy(f => (f._2, f._3)).map { case ((nf, fp), v) =>
      (v.map(_._1).min, v.length.toLong, nf, fp)
    }.toSeq.sortBy(_._1)
    val gotAudio = Pipeline.audioDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gotAudio == expectAudio)
    assert(gotAudio.exists(_._2 > 1), "fixture must exhibit fingerprint collapse")
    // the card: per-modality (n_items, n_distinct) from independent keys
    val nTxt = docs.select(col("text")).collect().map(_.getString(0))
    val imgs = graft.operators.Multimodal.imageHashes(spark, docs).collect()
      .map(h => (h.hash_lo, h.hash_hi))
    val vids = graft.operators.Multimodal.videoHashes(spark, docs).collect()
      .map(v => (v.n_frames, v.hash_lo, v.hash_hi, v.contour_fp))
    def row(m: String, n: Long, d0: Long) =
      (m, n, d0, n - d0, 10000L * (n - d0) / n)
    val expect = Seq(
      row("audio", fps.length.toLong, fps.map(f => (f._2, f._3)).distinct.length.toLong),
      row("image", imgs.length.toLong, imgs.distinct.length.toLong),
      row("text", nTxt.length.toLong, nTxt.distinct.length.toLong),
      row("video", vids.length.toLong, vids.distinct.length.toLong))
    val got = Pipeline.modalityDedupSummary(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
  }

  test("image_codec_meta / png twins: mixed-format corpus decodes to the planted geometry") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val expect = docs.select(col("doc_id"), octet_length(col("text")).as("n"))
      .collect().map { r =>
        val (id, n) = (r.getLong(0), r.getInt(1).toLong)
        (id, if (id % 2 == 0) "png" else "jpeg",
          4 + (n % 12).toInt, 4 + ((n * 31) % 11).toInt)
      }.sortBy(_._1).toSeq
    val got = Pipeline.imageCodecMeta(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getInt(3))).toSeq
    assert(got == expect)
    // the PNG thumbnail query agrees row-for-row with the pure-JVM BMP
    // one: same planted raster through two independent decoders
    val bmpSide = Pipeline.imageThumb(spark, sf0001).collect().toSeq
    val pngSide = Pipeline.imageThumbPng(spark, sf0001).collect().toSeq
    assert(pngSide == bmpSide)
    val bmpHash = Pipeline.imagePhash(spark, sf0001).collect().toSeq
    val pngHash = Pipeline.imagePhashPng(spark, sf0001).collect().toSeq
    assert(pngHash == bmpHash)
  }

  test("gif codec: animated frames round-trip losslessly, corrupt streams throw") {
    import Multimodal.{GifCodec, GifFile, MediaIn}
    val codec = new GifCodec
    // full builder geometry range (w 4-15, h 4-14, 2-5 frames): every
    // decoded frame pixel equals the planted arithmetic. h=4 is the
    // REGRESSION geometry — the JDK writer's default interlacing
    // permutes rows there (pass 2 of the interlace schedule starts at
    // the nonexistent row 4), which is why GifFile writes progressive-
    // mode-disabled streams.
    for (w <- Seq(4, 7, 15); h <- Seq(4, 5, 14); nf <- Seq(2, 5)) {
      val seed = 31L * (w * 16 + h) + nf
      val samples = codec.frameSamples(MediaIn(1L, GifFile.build(w, h, nf, seed)))
      assert(samples.map(s => (s.sample_ord, s.frame_idx, s.n_frames)) ==
        Seq((1, 0, nf), (2, nf / 2, nf), (3, nf - 1, nf)), s"${w}x$h nf=$nf")
      samples.foreach { s =>
        assert(s.p00 == ((7L * s.frame_idx + seed) & 0xFF).toInt,
          s"${w}x$h nf=$nf frame ${s.frame_idx}")
      }
      // videoHash vs an independent recompute of the planted grid
      val vh = codec.videoHash(MediaIn(1L, GifFile.build(w, h, nf, seed)))
      val means = (0 until nf).map { f =>
        (0 until 64).map { i =>
          (3L * ((i % 8) * w / 8) + 31L * ((i / 8) * h / 8) + 7L * f + seed) & 0xFF
        }.sum / 64
      }
      val gray0 = (0 until 64).map { i =>
        (3L * ((i % 8) * w / 8) + 31L * ((i / 8) * h / 8) + seed) & 0xFF
      }
      var lo = 0L; var hi = 0L
      (0 until 64).foreach { i =>
        if (gray0(i) > means(0)) {
          if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
        }
      }
      val cfp = (0 until nf - 1).map(f => if (means(f + 1) > means(f)) 1L << f else 0L).sum
      assert(vh == Multimodal.VideoHash(1L, nf, lo, hi, cfp), s"${w}x$h nf=$nf")
    }
    val good = GifFile.build(7, 5, 3, 99L)
    // corrupt magic must throw FROM OUR SNIFF: the JDK format-named
    // reader demonstrably decodes a magic-corrupted stream (it trusts
    // the caller's format choice), so skipping the sniff would fabricate
    // frames from non-GIF bytes
    val bad = good.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](codec.frameSamples(MediaIn(2L, bad)))
    // truncated stream must throw, not yield partial frames
    intercept[IllegalArgumentException](
      codec.videoHash(MediaIn(3L, good.take(good.length / 2))))
  }

  test("avi codec: DIB frames round-trip losslessly, corrupt streams throw") {
    import Multimodal.{AviCodec, AviFile, MediaIn}
    val codec = new AviCodec
    // full builder geometry range, incl. widths that exercise DIB row
    // padding (w % 4 != 0) and the h=4 GIF-regression geometry (no
    // interlace concept in DIB — must be exact everywhere)
    for (w <- Seq(4, 7, 15); h <- Seq(4, 5, 14); nf <- Seq(2, 5)) {
      val seed = 31L * (w * 16 + h) + nf
      val samples = codec.frameSamples(MediaIn(1L, AviFile.build(w, h, nf, seed)))
      assert(samples.map(s => (s.sample_ord, s.frame_idx, s.n_frames)) ==
        Seq((1, 0, nf), (2, nf / 2, nf), (3, nf - 1, nf)), s"${w}x$h nf=$nf")
      samples.foreach { s =>
        assert(s.p00 == ((7L * s.frame_idx + seed) & 0xFF).toInt,
          s"${w}x$h nf=$nf frame ${s.frame_idx}")
      }
    }
    val good = AviFile.build(7, 5, 3, 99L)
    // corrupt magic: both the RIFF fourcc and the AVI form type
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](codec.frameSamples(MediaIn(2L, badMagic)))
    val badForm = good.clone(); badForm(8) = 'W'.toByte
    intercept[IllegalArgumentException](codec.frameSamples(MediaIn(3L, badForm)))
    // truncated stream: the declared RIFF size no longer matches
    intercept[IllegalArgumentException](
      codec.frameSamples(MediaIn(4L, good.take(good.length / 2))))
    // header/movi frame-count mismatch: patch avih dwTotalFrames
    // (offset 12 RIFF + 12 LIST hdrl + 8 avih header + 16 into avih)
    val badCount = good.clone(); badCount(12 + 12 + 8 + 16) = 9.toByte
    val e = intercept[IllegalArgumentException](
      codec.frameSamples(MediaIn(5L, badCount)))
    assert(e.getMessage.contains("frames"), e.getMessage)
    // unsupported bit depth must be rejected, not misread: patch
    // biBitCount (hdrl: avih 8+56, strl LIST 12, strh 8+56, strf 8 + 14)
    val badBits = good.clone()
    val strfBits = 12 + 12 + (8 + 56) + 12 + (8 + 56) + 8 + 14
    badBits(strfBits) = 24.toByte
    intercept[IllegalArgumentException](codec.frameSamples(MediaIn(6L, badBits)))
  }

  test("video seam is container-agnostic: AVI and GIF decode to identical frame samples") {
    // same geometry + planted seed per doc through two UNRELATED
    // containers and decoders (JDK ImageIO sequence reader vs pure-JVM
    // RIFF walker): the decoded frame-sample rows must be identical —
    // the audio seam's WAV-vs-BMP proof, replayed on video
    val gif = Pipeline.videoFrames(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    val avi = Pipeline.videoFramesAvi(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(gif.nonEmpty && gif.toSeq == avi.toSeq)
    // and the dedup FINGERPRINT survives the container migration: the
    // same logical clip hashes identically through either decoder, so a
    // corpus re-encoded GIF -> AVI keeps its video_dedup clusters
    import Multimodal.{AviCodec, AviFile, GifCodec, GifFile, MediaIn}
    val (gc, ac) = (new GifCodec, new AviCodec)
    for (w <- Seq(4, 7, 15); h <- Seq(5, 14); nf <- Seq(2, 5)) {
      val seed = 31L * (w * 16 + h) + nf
      val hg = gc.videoHash(MediaIn(9L, GifFile.build(w, h, nf, seed)))
      val ha = ac.videoHash(MediaIn(9L, AviFile.build(w, h, nf, seed)))
      assert(hg == ha, s"${w}x$h nf=$nf: gif=$hg avi=$ha")
    }
  }

  test("video_frames / video_dedup: per-frame decode and census match driver recomputes") {
    val geo = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), octet_length(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    // video_frames: first/middle/last with the planted (0,0) witness
    val expectFrames = geo.flatMap { case (id, n) =>
      val nf = 2 + (n % 4).toInt
      Seq((1, 0), (2, nf / 2), (3, nf - 1)).map { case (ord, fi) =>
        (id, ord, fi, nf, ((7L * fi + id * 31) & 0xFF).toInt)
      }
    }.sortBy(r => (r._1, r._2)).toSeq
    val gotFrames = Pipeline.videoFrames(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toSeq
    assert(gotFrames == expectFrames)
    // video_dedup census = plain groupBy of the per-doc fingerprints
    val vhs = graft.operators.Multimodal
      .videoHashes(spark, graft.sources.Tables.documents(spark, sf0001)).collect()
    val expectCensus = vhs.groupBy(v => (v.n_frames, v.hash_lo, v.hash_hi, v.contour_fp))
      .map { case ((nf, lo, hi, fp), v) =>
        (v.map(_.doc_id).min, v.length.toLong, nf, lo, hi, fp)
      }.toSeq.sortBy(_._1)
    val gotCensus = Pipeline.videoDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(gotCensus == expectCensus)
  }

  test("video_neardup / audio_neardup: banded joins equal brute-force Hamming") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("doc_id") < 500)
    // video: brute force over the per-doc fingerprints, blocked the same
    // way the query declares (n_frames + contour equality, Hamming <= 3)
    val vhs = graft.operators.Multimodal.videoHashes(spark, docs).collect()
    val expectV = (for {
      a <- vhs; b <- vhs
      if a.doc_id < b.doc_id && a.n_frames == b.n_frames &&
        a.contour_fp == b.contour_fp
      ham = java.lang.Long.bitCount(a.hash_lo ^ b.hash_lo) +
        java.lang.Long.bitCount(a.hash_hi ^ b.hash_hi)
      if ham <= 3
    } yield (a.doc_id, b.doc_id, a.n_frames, ham)).toSeq.sortBy(r => (r._1, r._2))
    val gotV = Pipeline.videoNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSeq
    assert(gotV == expectV)
    assert(gotV.nonEmpty, "fixture must exhibit near-dup videos")
    // audio: Hamming in [1, 2] (exact collapse is audio_dedup's census —
    // the near report must never contain a 0-distance pair)
    val fps = Pipeline.audioFingerprint(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 < 500)
    val expectA = (for {
      a <- fps; b <- fps
      if a._1 < b._1 && a._2 == b._2
      ham = java.lang.Long.bitCount(a._3 ^ b._3)
      if ham >= 1 && ham <= 2
    } yield (a._1, b._1, a._2, ham)).toSeq.sortBy(r => (r._1, r._2))
    val gotA = Pipeline.audioNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    assert(gotA == expectA)
    assert(gotA.forall(_._4 >= 1), "no exact-dup pair may leak into the near report")
  }

  test("modality_neardup_summary: the card reconciles with the three neardup queries") {
    def statsFrom(rows: Array[(Long, Long)]): (Long, Long) =
      (rows.length.toLong, rows.flatMap(r => Seq(r._1, r._2)).distinct.length.toLong)
    val img = statsFrom(Pipeline.imageNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))))
    val aud = statsFrom(Pipeline.audioNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))))
    val vid = statsFrom(Pipeline.videoNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))))
    val got = Pipeline.modalityNeardupSummary(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set("audio", "image", "video"))
    assert(got("image") == img && got("audio") == aud && got("video") == vid)
    assert(got.values.forall(_._1 > 0), "every modality exhibits near-dups in the fixture")
  }

  test("video_scene_cuts: census matches a driver recompute of the decoded frame means") {
    import Multimodal.MediaIn
    val codec = new Multimodal.GifCodec
    val geo = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), octet_length(col("text")).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong))
    val expect = geo.map { case (id, n) =>
      val payload = Multimodal.GifFile.build(
        4 + (n % 12).toInt, 4 + ((n * 31) % 11).toInt, 2 + (n % 4).toInt, id * 31)
      val means = codec.frameMeans(MediaIn(id, payload)).map(_.fmean)
      val cuts = (1 until means.length)
        .filter(f => math.abs(means(f) - means(f - 1)) > 16)
      (id, means.length, cuts.length.toLong, cuts.mkString(","))
    }.sortBy(_._1).toSeq
    val got = Pipeline.videoSceneCuts(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getString(3))).toSeq
    assert(got == expect)
    assert(got.exists(_._3 > 0), "fixture must exhibit at least one hard cut")
    assert(got.forall(r => r._3 <= r._2 - 1), "cuts are frame transitions")
  }

  test("ivf_ingest: per-cell delta census reconciles with the full assignment pass") {
    val assign = Pipeline.kmeansAssign(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val batch = assign.filter(_._1 < 500)
    val expect = batch.groupBy(_._2).map { case (cid, v) =>
      cid -> ((v.length.toLong, v.map(_._3).sum))
    }
    val got = Pipeline.ivfIngest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == (0L until 8L), "all 8 cells emitted, ordered")
    got.filter(_._2 > 0).foreach { case (cid, n, sd) =>
      assert(expect(cid) == ((n, sd)), s"cell $cid delta mismatch")
    }
    assert(got.map(_._2).sum == batch.length.toLong, "census covers the whole batch")
    got.filter(_._2 == 0).foreach { case (cid, _, sd) =>
      assert(!expect.contains(cid) && sd == 0L, s"cell $cid must be empty")
    }
  }

  test("semdedup_threshold_curve: monotone and reconciles with dedup_semantic at 0.35") {
    val curve = Pipeline.semdedupThresholdCurve(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(curve.map(_._1).toSeq == Seq(20, 25, 30, 35, 40, 45, 50))
    // drop count is non-increasing in the threshold (a stricter rung
    // can only drop a subset)
    assert(curve.sliding(2).forall(w => w(0)._2 >= w(1)._2))
    // the 0.35 rung IS dedup_semantic's drop count — the curve and the
    // committed operator cannot disagree about the shipped threshold
    val kept35 = Pipeline.dedupSemantic(spark, sf0001)
      .filter(col("kept")).count()
    val rung35 = curve.find(_._1 == 35).get
    assert(rung35._3 == kept35, s"curve n_kept ${rung35._3} != dedup_semantic $kept35")
    assert(curve.forall(r => r._2 + r._3 == rung35._2 + rung35._3), "totals constant")
    assert(curve.head._2 > curve.last._2, "fixture must spread across rungs")
  }

  test("video_frames_at_cuts: one decoded witness row per shot, reconciling with the cut census") {
    val got = Pipeline.videoFramesAtCuts(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    // per doc: frame 0 is always shot 1, shot_ords are 1..k contiguous,
    // and row count = the census's n_cuts + 1
    val cuts = Pipeline.videoSceneCuts(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val byDoc = got.groupBy(_._1)
    assert(byDoc.keySet == cuts.keySet, "every video has at least one shot")
    byDoc.foreach { case (id, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.head._2 == 1 && sorted.head._3 == 0, s"doc $id: shot 1 is frame 0")
      assert(sorted.map(_._2).toSeq == (1 to rows.length), s"doc $id: contiguous shot_ord")
      assert(rows.length.toLong == cuts(id) + 1, s"doc $id: shots = cuts + 1")
    }
    // the pixel witness is the real decoded (0,0) gray of THAT frame:
    // frame f plants (7f + doc_id*31) mod 256
    assert(got.forall { case (id, _, fi, _, p00) =>
      p00 == (((7L * fi + id * 31) % 256 + 256) % 256).toInt })
    assert(got.exists(_._2 > 1), "fixture must exhibit multi-shot videos")
  }

  test("crossmodal_mismatch: recaptioned-reupload clusters reconcile with the modality card") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val txt = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val hs = graft.operators.Multimodal.imageHashes(spark, docs).collect()
    val clusters = hs.groupBy(h => (h.hash_lo, h.hash_hi))
    val expect = clusters.toSeq.flatMap { case ((lo, hi), v) =>
      val texts = v.map(m => txt(m.doc_id)).distinct.length.toLong
      if (v.length >= 2 && texts > 1)
        Some((v.map(_.doc_id).min, v.length.toLong, texts, lo, hi))
      else None
    }.sortBy(_._1)
    val got = Pipeline.crossmodalMismatch(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "fixture must exhibit image-dup/text-differs clusters")
    // reconciliation with the dataset card: total image dupes =
    // sum(n_members - 1) over ALL image-hash clusters, and every
    // reported mismatch cluster is one of those dup clusters
    val card = Pipeline.modalityDedupSummary(spark, sf0001).collect()
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    val imgDupes = clusters.values.map(v => (v.length - 1).toLong).sum
    assert(card("image") == imgDupes)
    val dupReps = clusters.values.filter(_.length >= 2).map(_.map(_.doc_id).min).toSet
    assert(got.forall(g => dupReps(g._1)))
  }

  test("audio_downsample: decimated energies recompute from the real bytes via stride 2") {
    import Multimodal.MediaIn
    val codec = new Multimodal.WavFrameCodec
    val payloads = Multimodal.audioPayloads(spark,
      graft.sources.Tables.documents(spark, sf0001)).collect()
    val expect = payloads.flatMap(p => codec.framesStrided(MediaIn(p.doc_id, p.media), 2))
      .map(f => (f.doc_id, f.frame_idx, f.n_sam, f.energy))
      .sortBy(r => (r._1, r._2)).toSeq
    val got = Pipeline.audioDownsample(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // decimation halves the sample count: per doc, kept = (total+1)/2
    val fullByDoc = payloads.map(p =>
      p.doc_id -> codec.frames(MediaIn(p.doc_id, p.media)).map(_.n_sam).sum).toMap
    val downByDoc = got.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(downByDoc.forall { case (id, n) => n == (fullByDoc(id) + 1) / 2 })
    // stride 1 IS the plain frame stream (the generalization is exact)
    val p0 = MediaIn(payloads.head.doc_id, payloads.head.media)
    assert(codec.framesStrided(p0, 1) == codec.frames(p0))
  }

  test("audio frame energies come from the decoded PCM stream") {
    import Multimodal.{MediaIn, WavFile, WavFrameCodec}
    val codec = new WavFrameCodec
    val (sr, ch, ns, lb, seed) = (16000, 2, 100, 6, 123L)
    val bytes = WavFile.build(sr, ch, ns, lb, seed)
    val frames = codec.frames(MediaIn(3L, bytes))
    val total = ns * ch
    assert(frames.length == (total + 63) / 64)
    frames.foreach { f =>
      val lo = f.frame_idx * 64; val hi = math.min(total, lo + 64)
      assert(f.n_sam == hi - lo)
      val ref = (lo until hi).map { s =>
        val v = (seed * 31 + s * 7) & 0x7FFF; v * v
      }.sum
      assert(f.energy == ref, s"frame ${f.frame_idx}")
    }
    // last frame is partial: 200 % 64 = 8
    assert(frames.last.n_sam == total % 64)
    val bad = bytes.clone(); bad(9) = 'X'.toByte
    intercept[IllegalArgumentException](codec.frames(MediaIn(4L, bad)))
  }

  test("audio_fingerprint: delta-sign bits match the planted energy contour") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).getBytes("UTF-8").length.toLong))
    val expect = docs.map { case (id, n) =>
      val ch = 1 + n % 2; val ns = 100 + (n * 7) % 400; val seed = id * 17 + n
      val total = ns * ch
      val nf = ((total + 63) / 64).toInt
      val energies = (0 until nf).map { fi =>
        val lo = fi * 64L; val hi = math.min(total, lo + 64)
        (lo until hi).map { s0 => val v = (seed * 31 + s0 * 7) & 0x7FFF; v * v }.sum
      }
      val fp = (0 until nf - 1).map { i =>
        if (energies(i + 1) > energies(i)) 1L << i else 0L }.sum
      (id, nf.toLong, fp)
    }.sortBy(_._1).toSeq
    val got = graft.queries.Pipeline.audioFingerprint(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect)
    // the contour genuinely varies across the corpus (not a constant hash)
    assert(expect.map(_._3).distinct.length > 10)
  }

  test("hashed_features: bucket counts match the scalar hashing-trick recompute") {
    val M31 = 2147483648L
    def bucket(t: String): Int =
      (t.foldLeft(5381L)((a, c) => (a * 33 + c.toInt) % M31) % 64).toInt
    val ref = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        r.getString(1).split("[ \t\n\r]", -1).filter(_.nonEmpty)
          .map(t => (r.getLong(0), bucket(t)))
      }
      .groupBy(identity).map { case ((id, b), o) => (id, b, o.length.toLong) }
      .toSet
    val got = Pipeline.hashedFeatures(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == ref)
  }

  test("lang_id_ngram: profile-vote argmax matches a plain-Scala recompute") {
    val docs = graft.sources.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def tris(text: String): Seq[String] =
      text.split("[ \t\n\r]", -1).toSeq.filter(_.nonEmpty)
        .filter(_.length >= 3)
        .flatMap(w => (0 to w.length - 3).map(i => w.substring(i, i + 3)))
    // train: top-5 trigrams per language (count desc, trigram asc)
    val prof: Map[String, Set[String]] = docs.groupBy(_._2).map { case (lang, ds) =>
      val counts = ds.flatMap(d => tris(d._3)).groupBy(identity)
        .map { case (t, o) => (t, o.length) }
      lang -> counts.toSeq.sortBy { case (t, c) => (-c, t) }.take(5).map(_._1).toSet
    }
    val langs = docs.map(_._2).distinct.sorted
    val got = Quality.langIdNgram(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(2), r.getLong(3), r.getBoolean(4)))
    assert(got.length == docs.length)
    got.foreach { case (id, pred, score, correct) =>
      val (_, actual, text) = docs.find(_._1 == id).get
      val scores = langs.map(l => (l, tris(text).count(prof(l)))).toMap
      val refPred = langs.minBy(l => (-scores(l), l))
      assert(pred == refPred, s"doc $id: got $pred want $refPred")
      assert(score == scores(refPred).toLong, s"doc $id score")
      assert(correct == (pred == actual))
    }
    // the classifier must beat chance on its own training corpus
    val acc = got.count(_._4).toDouble / got.length
    assert(acc > 1.0 / langs.length, s"accuracy $acc not above chance")
  }
}
