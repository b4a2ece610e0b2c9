package graft

import graft.functions.{Djb2, TextFns}
import graft.operators.{Dedup, Multimodal}
import graft.queries.Pipeline
import org.apache.spark.sql.functions._

/** Tier C operator semantics (LSH ops have no SQL oracle — these specs are
  * their correctness gate).
  */
class PipelineSpec extends SparkSuite {

  test("dedup_exact: unique texts → one group per doc, all n_copies 1; planted dups collapse") {
    import spark.implicits._
    val base = Pipeline.dedupExact(spark, sf0001).collect()
    assert(base.length == 500 && base.forall(_.getLong(2) == 1L))
    // planted duplicates collapse to min doc_id
    val docs = Seq((1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "dd")).toDF("doc_id", "text")
    val got = Dedup.exact(docs).collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 2L), (3L, 1L)))
  }

  test("dedup_keep_best: planted duplicates keep the highest-quality copy, ties to min id") {
    import spark.implicits._
    // documents-shaped fixture: three clusters — {1,2} and {3,4} are
    // equal-quality duplicates (tie -> min id), {5} is a singleton
    val tmp = java.nio.file.Files.createTempDirectory("graft-keepbest").toString
    val loQ = "xx yy zz"
    val hiQ = "the a of is xx"
    Seq((1L, "aa bb cc", "en", "s", 8L), (2L, "aa bb cc", "en", "s", 8L),
        (3L, loQ, "en", "s", loQ.length.toLong))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .unionByName(Seq((4L, loQ, "en", "s", loQ.length.toLong),
        (5L, hiQ, "en", "s", hiQ.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val got = Pipeline.dedupKeepBest(spark, tmp).collect()
      .map(r => (r.getLong(1), r.getLong(3))).toSet // (keep_doc_id, n_copies)
    assert(got == Set((1L, 2L), (3L, 2L), (5L, 1L)),
      s"equal-quality tie -> min id; got $got")
    // on the real corpus: one row per distinct text, and the kept id's
    // quality equals the cluster max (recomputed in pure Scala)
    def q(text: String): Long = {
      val ts = text.split("[ \t\n\r]", -1)
      val stop = ts.count(Set("the", "a", "and", "of", "is", "not"))
      val v = 0.5 * math.min(1.0, ts.length.toDouble / 100.0) +
        0.5 * (stop.toDouble / ts.length)
      Math.round(BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1000000)
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = Pipeline.dedupKeepBest(spark, sf0001).collect()
    assert(rows.length == docs.values.toSeq.distinct.length)
    rows.foreach { r =>
      assert(q(docs(r.getLong(1))) == r.getLong(2),
        s"kept doc ${r.getLong(1)} must carry the cluster-max quality")
    }
  }

  test("ivf_recall: overlap of the declared exact and IVF top-20 lists, in exact bp") {
    val exact = Pipeline.embeddingTopk(spark, sf0001).collect().map(_.getLong(0)).toSet
    val ivf = Pipeline.embeddingTopkIvf(spark, sf0001).collect().map(_.getLong(0)).toSet
    val r = Pipeline.ivfRecall(spark, sf0001).collect().head
    val hits = (exact & ivf).size.toLong
    assert(r.getLong(0) == 20L)
    assert(r.getLong(1) == hits)
    assert(r.getLong(2) == 10000L * hits / 20L)
    assert(hits >= 10L,
      s"IVF at nprobe=3 should keep most of the true top-20; got $hits/20")
  }

  test("ivf_recall_curve: the cell-rank shortcut equals the real probe at every point") {
    // the curve computes recall WITHOUT per-nprobe rescans, on the claim
    // that an exact-top-20 member is in the IVF top-20 iff its cell is
    // probed — pin that claim against the actual probe queries at both
    // declared operating points, plus monotonicity and the exhaustive end
    val curve = Pipeline.ivfRecallCurve(spark, sf0001).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val atDefault = Pipeline.ivfRecall(spark, sf0001).collect().head.getLong(1)
    val atTuned = Pipeline.ivfRecallTuned(spark, sf0001).collect().head.getLong(1)
    assert(curve(3L) == atDefault, s"curve@3=${curve(3L)} probe=$atDefault")
    assert(curve(8L) == atTuned, s"curve@8=${curve(8L)} probe=$atTuned")
    val byNprobe = curve.toSeq.sortBy(_._1).map(_._2)
    assert(byNprobe.sliding(2).forall(s => s.head <= s.last), s"not monotone: $byNprobe")
    assert(byNprobe.last == 20L, "probing every cell must recover the exact top-20")
  }

  test("dup_rate_by_source reconciles exactly with dedup_kept") {
    // n_dupes per source must equal the docs dedup_kept dropped there —
    // the two consumers of the CC-labels artifact cannot disagree
    val srcOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val kept = Pipeline.dedupKept(spark, sf0001).collect().map(_.getLong(0)).toSet
    val droppedBySrc = srcOf.filterNot { case (id, _) => kept(id) }
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val rows = Pipeline.dupRateBySource(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (src, nDocs, nDupes, bp) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nDocs == srcOf.values.count(_ == src).toLong, src)
      assert(nDupes == droppedBySrc.getOrElse(src, 0L), src)
      assert(bp == 10000L * nDupes / nDocs, src)
    }
    assert(rows.map(_.getLong(2)).sum == (srcOf.size - kept.size).toLong,
      "total dupes must reconcile with the kept complement")
  }

  test("source_dedup_matrix reconciles with the pair list and a driver recompute") {
    val srcOf = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = Pipeline.ngramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val ref = pairs.map { case (a, b) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        if (sa <= sb) (sa, sb) else (sb, sa)
      }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = Pipeline.sourceDedupMatrix(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == ref)
    // every verified pair lands in exactly one matrix cell
    assert(got.values.sum == pairs.length.toLong)
    assert(got.nonEmpty)
  }

  test("dedup_cluster_sizes: histogram equals a driver recompute and reconciles to row count") {
    val texts = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val expect = texts.groupBy(identity).map(_._2.length.toLong)
      .groupBy(identity).map { case (sz, cs) => sz -> cs.size.toLong }
    val rows = Pipeline.dedupClusterSizes(spark, sf0001).collect()
    assert(rows.map(r => r.getLong(0) -> r.getLong(1)).toMap == expect)
    rows.foreach(r => assert(r.getLong(2) == r.getLong(0) * r.getLong(1)))
    assert(rows.map(_.getLong(2)).sum == texts.length.toLong,
      "n_docs must reconcile to the corpus row count")
  }

  test("minhash LSH finds exactly the brute-force jaccard>=0.5 pairs (planted data)") {
    import spark.implicits._
    val sets = Dedup.shingleSets(graft.sources.Tables.documents(spark, sf0001))
    val a = sets.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val b = sets.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    val exact = a.join(b, col("id1") < col("id2"))
      .withColumn("jac", size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
        size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jac") >= 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    val lsh = Pipeline.dedupMinhash(spark, sf0001)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(lsh == exact, s"missed=${exact -- lsh} extra=${lsh -- exact}")
  }

  test("minhash signatures estimate jaccard (property: |est - true| small on planted pairs)") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf0001)
    val sigs = Dedup.minhashSignatures(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sets = Dedup.shingleSets(docs)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val pairs = Pipeline.dedupMinhash(spark, sf0001)
      .select("id1", "id2").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y } / 64.0
      val trueJac = sets(a).intersect(sets(b)).size.toDouble / sets(a).union(sets(b)).size
      assert(math.abs(est - trueJac) < 0.3, s"pair ($a,$b): est=$est true=$trueJac")
    }
  }

  test("simhash pairs: id1<id2, hamming<=3, and known near-dups included") {
    val rows = Pipeline.dedupSimhash(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) <= 3)
    }
  }

  test("embedding near-dup: triangle pre-shard is lossless (pair-set equality)") {
    import graft.sources.Tables
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf0001)
    // ncells=4 over 500 vectors → ~125-member cells; shardAbove=16 forces
    // every cell through the shard-pair path (ns up to 8), while
    // Int.MaxValue takes the direct all-pairs explode. The verified
    // outputs must be SET-equal — the pre-shard is a layout change, not
    // a semantics change.
    def pairsWith(shardAbove: Int) =
      Dedup.embeddingNearDup(emb, minCos = 0.35, ncells = 4,
          shardAbove = shardAbove)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
    val sharded = pairsWith(16)
    val direct = pairsWith(Int.MaxValue)
    assert(sharded == direct,
      s"pre-shard lost/invented pairs: only-sharded=${sharded.diff(direct).take(5)} " +
        s"only-direct=${direct.diff(sharded).take(5)}")
    assert(direct.nonEmpty, "forced-shard fixture found no pairs — spec vacuous")
  }

  test("embedding near-dup equals a plain-Scala within-cell brute force") {
    import graft.sources.Tables
    val emb = Tables.embeddings(spark, sf0001)
    val n = emb.count()
    val model = graft.operators.Kmeans.train(emb,
      k = graft.operators.Kmeans.ncellsFor(n), iters = 2)
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
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
      cell <- rows.groupBy(_._2).values
      sorted = cell.sortBy(_._1)
      j <- sorted.indices; i <- 0 until j
      s0 = sim(sorted(i)._3, sorted(j)._3) if s0 >= 0.35
    } yield (sorted(i)._1, sorted(j)._1, s0)).toSet
    val got = Pipeline.embeddingNearDup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == ref, s"within-cell brute force disagrees: got=${got.size} ref=${ref.size}")
    assert(ref.nonEmpty, "no near-dups under the trained cells — spec vacuous")
  }

  test("embedding near-dup: exact cosine verified, threshold respected") {
    import graft.sources.Tables
    val rows = Pipeline.embeddingNearDup(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(2) >= 0.35 && r.getLong(0) < r.getLong(1)))
    // spot-check one pair against a scalar cosine
    val (i1, i2, sim) = (rows.head.getLong(0), rows.head.getLong(1), rows.head.getDouble(2))
    val vecs = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id").isin(i1, i2)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    val (x, y) = (vecs(i1), vecs(i2))
    val dot = x.zip(y).map { case (p, q) => p * q }.sum
    val scalar = dot / (math.sqrt(x.map(v => v * v).sum) * math.sqrt(y.map(v => v * v).sum))
    assert(math.abs(scalar - sim) < 1e-5)
  }

  test("LSH near-dup finds injected duplicate vectors at cos>=0.9") {
    import spark.implicits._
    val base = graft.sources.Tables.embeddings(spark, sf0001)
    // clone vec 1 and 2 with tiny perturbations -> cos ~ 1.0
    val clones = base.filter(col("vec_id").isin(1, 2))
      .select((col("vec_id") + 10000).as("vec_id"),
        transform(col("embedding"), x => x * 1.000001f).as("embedding"),
        col("label"))
    val withDups = base.unionByName(clones)
    val got = Dedup.embeddingNearDupLsh(withDups, 64)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(got.contains((1L, 10001L)), s"missing planted pair in $got")
    assert(got.contains((2L, 10002L)), s"missing planted pair in $got")
  }

  test("native cosine expression is bit-identical to the HOF fold") {
    import graft.functions.VectorFns
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("q_emb"))
    val diffs = emb.crossJoin(broadcast(q))
      .select(VectorFns.cosine(col("embedding"), col("q_emb")).as("native"),
        VectorFns.cosineHof(col("embedding"), col("q_emb")).as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diffs == 0L)
  }

  test("doc_fingerprint matches a scalar reimplementation") {
    import spark.implicits._
    val M = 2147483648L
    def tokHash(t: String): Long =
      t.foldLeft(5381L)((a, c) => (a * 33 + c.toInt) % M)
    def fp(text: String): Option[Long] = {
      val hs = text.split("[ \t\n\r]", -1).filter(_.nonEmpty).map(tokHash)
      if (hs.length < 3) None
      else Some(hs.sliding(3).map(w => ((w(0) * 31 + w(1)) % M * 31 + w(2)) % M).min)
    }
    val texts = Seq((0L, "aa bb cc dd"), (1L, "x y"), (2L, "one two three"))
    // through the SAME definition the doc_fingerprint query ships
    val got = TextFns.fingerprintDf(texts.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> Some(r.getLong(1))).toMap
    texts.foreach { case (id, t) =>
      assert(got.getOrElse(id, None) == fp(t), s"doc $id") // <3 tokens -> absent
    }
  }

  test("lang_id: marker argmax with alphabetical tie-break and 'und' fallback") {
    import spark.implicits._
    val cases = Seq(
      (0L, "the cat and the hat", "en"),
      (1L, "der hund ist gut", "de"),
      (2L, "the der", "de"), // tie en=1 de=1 -> alphabetical first
      (3L, "zzz qqq", "und"),
      (4L, "el que no es", "es"))
    val got = cases.map(c => (c._1, c._2)).toDF("doc_id", "text")
      .select(col("doc_id"), TextFns.langId(col("text")).as("l"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (id, _, exp) => assert(got(id) == exp, s"doc $id") }
  }

  test("lsh_precision: agrees with lsh_recall's caught set and the candidate census") {
    val p = graft.queries.Pipeline.lshPrecision(spark, sf0001).collect()(0)
    val r = graft.queries.Pipeline.lshRecall(spark, sf0001).collect()(0)
    // the two contracts share one intersection: every exact pair lives in
    // the doc_id<500 slice, so recall's caught set IS precision's
    // true-positive set
    assert(p.getLong(1) == r.getLong(1),
      "precision true-positives must equal recall's caught pairs")
    assert(p.getLong(1) <= p.getLong(0))
    // census: the slice-restricted candidates match the generator
    val cand = graft.operators.Dedup.minhashCandidates(
        graft.sources.Tables.documents(spark, sf0001))
      .filter(col("id1") < 500 && col("id2") < 500).count()
    assert(p.getLong(0) == cand)
    // fixture read is PERFECT precision (non-dup pairs share ~no
    // shingles, so 4-row bands cannot collide on them) — pin it so a
    // banding change that starts paying false positives is visible
    assert(p.getLong(2) == 10000L)
  }

  test("split_balance: per-key train/test shares match a driver recompute") {
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def splitOf(id: Long): String = {
      val b = (id % 2147483647L) * 2654435761L % 100L
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    val tt = rows.map(r => (splitOf(r._1), r._2, r._3))
      .filter(r => r._1 == "train" || r._1 == "test")
    def dim(name: String, key: ((String, String, String)) => String) = {
      val tot = tt.groupBy(_._1).map { case (s0, v) => s0 -> v.length.toLong }
      tt.groupBy(r => (key(r), r._1)).map { case ((k, s0), v) =>
        (k, s0) -> (10000L * v.length / tot(s0)) }
    }
    def table(name: String, key: ((String, String, String)) => String) = {
      val sh = dim(name, key)
      sh.keys.map(_._1).toSeq.distinct.sorted.map { k =>
        val tr = sh.getOrElse((k, "train"), 0L)
        val te = sh.getOrElse((k, "test"), 0L)
        (name, k, tr, te, math.abs(tr - te))
      }
    }
    val expect = table("lang", _._2) ++ table("source", _._3)
    val got = graft.queries.Pipeline.splitBalance(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expect)
    // the audit reads as balanced on the hash split (no key drifts by
    // more than 10% absolute share)
    assert(got.map(_._5).max < 1000L)
  }

  test("split_leakage: cross-split near-dup census matches a driver recompute") {
    def splitOf(id: Long): String = {
      val b = (id % 2147483647L) * 2654435761L % 100L
      if (b < 80) "train" else if (b < 90) "valid" else "test"
    }
    // independent pair labels from the exact pair list + the split rule
    val pairs = graft.queries.Pipeline.ngramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val cells = pairs.map { case (a, b) =>
      val (sa, sb) = (splitOf(a), splitOf(b))
      (if (sa <= sb) sa else sb, if (sa <= sb) sb else sa)
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val tot = cells.values.sum
    val expect = cells.toSeq.sortBy(_._1).map { case ((a, b), n) =>
      (a, b, n, 10000L * n / tot, if (a != b) 1 else 0)
    }
    val got = graft.queries.Pipeline.splitLeakage(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4))).toSeq
    assert(got == expect)
    // the number that motivates kfold_assign's group folds: a doc-level
    // hash split leaks a REAL share of near-dup pairs across the boundary
    assert(got.exists(r => r._5 == 1 && r._3 > 0),
      "fixture must exhibit cross-split leakage for the audit to mean anything")
  }

  test("cluster_kfold: census recomputes and cross-fold leakage is exactly zero") {
    def foldOf(grp: Long): Long = (grp % 2147483647L) * 2654435761L % 5L
    // independent union-find over the declared pair list — the spec does
    // not reuse the production CC operator it is checking against
    val pairList = graft.queries.Pipeline.ngramJaccard(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairList.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split("[ \t\n\r]", -1).count(_.nonEmpty).toLong))
    def grpOf(id: Long): Long = find(id)
    val expect = docs.groupBy(d => foldOf(grpOf(d._1))).toSeq.sortBy(_._1)
      .map { case (f, ds) =>
        (f, ds.length.toLong, ds.map(d => grpOf(d._1)).distinct.length.toLong,
          ds.map(_._2).sum) }
    val got = graft.queries.Pipeline.clusterKfold(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // THE contract split_leakage motivates: under cluster-grouped folds,
    // zero near-dup pairs cross a fold boundary (over the same pair
    // artifact the leakage audit reads — where the doc-level split
    // measurably leaked)
    assert(pairList.nonEmpty)
    val crossed = pairList.count { case (a, b) => foldOf(grpOf(a)) != foldOf(grpOf(b)) }
    assert(crossed == 0, s"$crossed near-dup pairs crossed a cluster fold")
  }

  test("fold_strategy_compare: the 3-row card ranks the strategies and the cluster row is zero") {
    val got = graft.queries.Pipeline.foldStrategyCompare(spark, sf0001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == Seq("cluster", "doc", "source"))
    val n = got.head._2
    assert(n > 0 && got.forall(_._2 == n), "one shared pair total")
    val byS = got.map(r => r._1 -> r._3).toMap
    assert(byS("cluster") == 0L, "cluster folds leak nothing by construction")
    assert(byS("doc") > 0L, "the doc-level split must exhibit the leakage the audit found")
    // bp is the integer share of the same total
    assert(got.forall(r => r._4 == 10000L * r._3 / n))
  }

  test("kfold_assign: group-by-source folds match a driver recompute and never split a source") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("source"), col("text")).collect()
      .map(r => (r.getString(0),
        r.getString(1).split("[ \t\n\r]", -1).count(_.nonEmpty).toLong))
    def foldOf(src: String): Long = {
      val h = src.foldLeft(5381L)((a, c) => (a * 33 + c.toInt) % 2147483648L)
      (h % 2147483647L) * 2654435761L % 5L
    }
    val expect = docs.groupBy(d => foldOf(d._1)).toSeq.sortBy(_._1)
      .map { case (f, ds) =>
        (f, ds.length.toLong, ds.map(_._2).sum, ds.map(_._1).distinct.length.toLong) }
    val got = graft.queries.Pipeline.kfoldAssign(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    // group integrity: every source sits in exactly one fold
    assert(got.map(_._4).sum ==
      docs.map(_._1).distinct.length.toLong)
  }

  test("lang_id_agreement: accuracy and Cohen's kappa match a driver recompute") {
    val rows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("lang"), TextFns.langId(col("text")).as("pred"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val n = rows.length.toLong
    val agree = rows.count(r => r._1 == r._2).toLong
    val rm = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val cm = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    val src = rm.keys.map(k => rm(k) * cm.getOrElse(k, 0L)).sum
    val expect = (n, agree, 10000L * agree / n,
      1000000L * (agree * n - src) / (n * n - src))
    val r = graft.queries.Pipeline.langIdAgreement(spark, sf0001).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == expect)
    // the point of kappa: it is chance-corrected, so it must sit BELOW
    // raw accuracy here (the marker heuristic is near chance level
    // against the declared labels — kappa says so, accuracy hides it)
    assert(r.getLong(3) < r.getLong(2) * 100,
      "kappa_micro must fall below acc_bp on the chance-level heuristic")
  }

  test("dedup_clusters_lsh equals the exact-Jaccard clusters on the oracle-able slice") {
    // dedup_clusters runs exact pairwise Jaccard on doc_id < 500 (the
    // DuckDB-feasible slice); the full-corpus LSH pipeline restricted to
    // the same slice must produce identical clusters. sf0.001 has exactly
    // 500 docs, so "restricted to the slice" is the whole corpus — the
    // declared query itself is what runs.
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getString(3))
    val lsh = graft.queries.Pipeline.dedupClustersLsh(spark, sf0001)
      .collect().map(key).toSet
    val exact = graft.queries.Pipeline.dedupClusters(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(lsh == exact, s"lsh-only=${lsh -- exact} exact-only=${exact -- lsh}")
    // n_dropped bookkeeping: docs_kept = n_docs - sum(n_dropped)
    val dropped = graft.queries.Pipeline.dedupClustersLsh(spark, sf0001)
      .agg(sum(col("n_dropped"))).collect().head.getLong(0)
    val members = exact.toSeq.map(_._2).sum - exact.size
    assert(dropped == members)
  }

  test("connected components: planted chains collapse to min-id reps") {
    import spark.implicits._
    // chain 1-2-3 (no direct 1-3 edge), pair 5-6, isolated-in-pairs 8-9
    val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L), (9L, 8L)).toDF("id1", "id2")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L, 8L -> 8L, 9L -> 8L))
  }

  test("connected components match a scalar union-find on random graphs (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 3) {
      val n = 60
      val edges = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.connectedComponents(edges.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // scalar union-find oracle
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // normalize union-find roots to the min id of each component
      val byRoot = vertices.groupBy(find)
      val expected = byRoot.values.flatMap(vs => vs.map(_ -> vs.min)).toMap
      assert(got == expected)
    }
  }

  test("star-contraction CC matches union-find on random graphs and labelprop on real pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    for (_ <- 1 to 2) {
      val n = 60
      val edges = (1 to 80).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val got = Dedup.connectedComponentsStar(edges.toDF("id1", "id2"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val vertices = edges.flatMap(e => Seq(e._1, e._2)).distinct
      val byRoot = vertices.groupBy(find)
      val expected = byRoot.values.flatMap(vs => vs.map(_ -> vs.min)).toMap
      assert(got == expected)
    }
    // agreement with label propagation on the real near-dup pair list
    val pairs = graft.queries.Pipeline.ngramJaccard(spark, sf0001)
    val star = Dedup.connectedComponentsStar(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    val prop = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(star == prop)
  }

  test("star-contraction CC collapses a 300-hop chain (labelprop's documented failure mode)") {
    import spark.implicits._
    // path graph 0-1-2-...-300: diameter 300 > labelprop's default
    // maxIter=50, the exact case ADVICE flagged; star contraction needs
    // only O(log n) alternations
    val chain = (0L until 300L).map(i => (i, i + 1)).toDF("id1", "id2")
    val got = Dedup.connectedComponentsStar(chain)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 301 && got.values.forall(_ == 0L))
    // and label propagation does abort loudly rather than mislabel
    val ex = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(chain, maxIter = 20).collect()
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("multimodal codec: metadata comes from parsing real BMP bytes") {
    import Multimodal.{BmpCodec, BmpFile, MediaIn}
    val codec = new BmpCodec
    // single handcrafted frame with known dims: the parser must read them
    // back from the header bytes alone
    val one = codec.decode(MediaIn(1L, BmpFile.build(7, 5, seed = 99L)))
    assert(one.width == 7 && one.height == 5 && one.n_frames == 1)
    assert(one.n_bytes == BmpFile.size(7, 5).toLong)
    assert(one.frame_samples == Seq(0, 0, 0))
    // three concatenated frames: counted by walking the fileSize chain
    val f = BmpFile.build(9, 4, seed = 1L)
    val tri = codec.decode(MediaIn(2L, f ++ BmpFile.build(9, 4, 2L) ++ BmpFile.build(9, 4, 3L)))
    assert(tri.n_frames == 3 && tri.width == 9 && tri.height == 4)
    assert(tri.frame_samples == Seq(0, 1, 2))
    // corrupted magic must throw, not fabricate metadata
    val bad = BmpFile.build(7, 5, 0L); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](codec.decode(MediaIn(3L, bad)))
    // truncated mid-chain (second frame's declared size overruns) throws
    intercept[IllegalArgumentException](
      codec.decode(MediaIn(4L, f ++ f.take(60))))
  }

  test("band-collision twins bound their verified queries: pairs survive only from candidates") {
    // dedup_near = candidates ∩ (jaccard >= 0.5); the twin IS the
    // candidate set, so every verified pair must appear in it — and the
    // incremental gate likewise in its parity-filtered twin. This pins
    // the declared twins to the queries they stand oracle for.
    val cand = Pipeline.minhashBandCollisions(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val pairs = Pipeline.dedupMinhash(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.subsetOf(cand), s"verified pairs not within candidates: ${pairs -- cand}")
    val icand = Pipeline.minhashIncrementalCollisions(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ipairs = Pipeline.dedupIncrementalNear(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ipairs.subsetOf(icand), s"incremental pairs not within candidates: ${ipairs -- icand}")
    // and the parity contract of the incremental twin holds
    icand.foreach { case (n, o) => assert(n % 2 == 1 && o % 2 == 0) }
  }

  test("multimodal audio codec: metadata comes from chunk-walking real RIFF bytes") {
    import Multimodal.{MediaIn, WavCodec, WavFile}
    val codec = new WavCodec
    // handcrafted file with known format: recovered from the bytes alone,
    // and the planted LIST chunk between fmt and data must be SKIPPED by
    // its declared length (a fixed-layout parser would misread data)
    val a = codec.decode(MediaIn(1L, WavFile.build(16000, 2, 250, 10, seed = 5L)))
    assert(a.sample_rate == 16000 && a.channels == 2 && a.n_samples == 250L)
    assert(a.n_bytes == WavFile.size(2, 250, 10))
    assert(a.duration_ms == 250L * 1000 / 16000)
    // zero-length LIST chunk also fine
    val b = codec.decode(MediaIn(2L, WavFile.build(8000, 1, 100, 0, seed = 1L)))
    assert(b.sample_rate == 8000 && b.channels == 1 && b.duration_ms == 12L)
    // corrupted magic must throw, not fabricate metadata
    val bad = WavFile.build(8000, 1, 100, 0, 0L); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException](codec.decode(MediaIn(3L, bad)))
    // a chunk whose declared size overruns the payload throws
    val over = WavFile.build(8000, 1, 100, 0, 0L)
    java.nio.ByteBuffer.wrap(over).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(48, 1 << 20) // inflate the data chunk's declared size (data header at 44 when lb=0)
    intercept[IllegalArgumentException](codec.decode(MediaIn(4L, over)))
    // declared RIFF size disagreeing with the payload length throws
    val trunc = WavFile.build(8000, 1, 100, 0, 0L).dropRight(2)
    intercept[IllegalArgumentException](codec.decode(MediaIn(5L, trunc)))
  }

  test("multimodal audio pipeline: planted format round-trips through the byte decode") {
    import spark.implicits._
    val docs = Seq((7L, "abcd")).toDF("doc_id", "text") // 4 bytes
    val m = Multimodal.decodeAudio(spark, docs).collect().head
    // n=4: sr by 4%3=1 -> 16000, ch=1+4%2=1, ns=100+(4*7)%400=128, lb=(4%10)*2=8
    assert(m.doc_id == 7L && m.sample_rate == 16000 && m.channels == 1)
    assert(m.n_samples == 128L && m.n_bytes == Multimodal.WavFile.size(1, 128, 8))
    assert(m.duration_ms == 128L * 1000 / 16000)
  }

  test("multimodal pipeline: planted geometry round-trips through the byte decode") {
    import spark.implicits._
    val docs = Seq((7L, "abcd")).toDF("doc_id", "text") // 4 bytes
    val m = Multimodal.decodeMeta(spark, docs).collect().head
    val (w, h, f) = (4 + 4 % 12, 4 + (4 * 31) % 11, 1 + 4 % 5)
    assert(m.doc_id == 7L && m.width == w && m.height == h && m.n_frames == f)
    assert(m.n_bytes == (Multimodal.BmpFile.size(w, h) * f).toLong)
    assert(m.frame_samples == Seq(0, f / 2, f - 1))
  }

  test("djb2 column hash used by simhash equals the scalar reference hash") {
    import spark.implicits._
    val words = Seq("spark join merge", "the fast key")
    val got = words.toDF("w").select(Djb2.djb2(col("w"))).collect().map(_.getLong(0))
    assert(got.sameElements(words.map(Djb2.hash)))
  }

  test("incremental near-dup gate equals the symmetric pair list restricted to the split") {
    // odd ids = incoming batch, even = existing corpus: the asymmetric
    // band-probe must find exactly the parity-crossing pairs of the full
    // symmetric LSH run, re-keyed as (new_id, old_id)
    val full = graft.operators.Dedup.minhash(
        graft.sources.Tables.documents(spark, sf001))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = full.collect {
      case (a, b) if a % 2 == 1 && b % 2 == 0 => (a, b)
      case (a, b) if a % 2 == 0 && b % 2 == 1 => (b, a)
    }.toSet
    val got = graft.queries.Pipeline.dedupIncrementalNear(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty, "split must cross at least one near-dup pair")
    assert(got === expected)
  }

  test("simhash_signatures: every signature equals a scalar djb2+bit-vote recompute") {
    // independent reference: re-derive each doc's 3-token shingles in
    // plain Scala, hash with the scalar Djb2.hash, bit-vote — no
    // Catalyst expression in the loop
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val got = graft.queries.Pipeline.simhashSignatures(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.nonEmpty)
    got.foreach { case (id, sig) =>
      val toks = docs(id).split("[ \t\n\r]").filter(_.nonEmpty)
      val shingles = toks.sliding(3).filter(_.length == 3)
        .map(_.mkString(" ")).toSeq.distinct
      val acc = new Array[Int](64)
      shingles.foreach { sh =>
        val h = graft.functions.Djb2.hash(sh)
        (0 until 64).foreach(i =>
          acc(i) += (if (((h >>> i) & 1L) == 1L) 1 else -1))
      }
      var ref = 0L
      (0 until 64).foreach(i => if (acc(i) > 0) ref |= (1L << i))
      assert(sig == ref, s"doc $id")
    }
  }

  test("duplicate_spans: planted shared span is found, span-exactly, and nothing else") {
    import spark.implicits._
    // docs 1 and 2 share an exact 10-token run => exactly 3 shared
    // 8-token spans (10-8+1), each n_docs=2; doc 3 shares nothing; the
    // repeated span inside doc 4 alone must NOT appear (n_docs=1)
    val shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val df = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"$shared five six seven"),
      (3L, "completely different words with no overlap at all here ok"),
      (4L, "rep rep rep rep rep rep rep rep rep rep rep rep")
    ).toDF("doc_id", "text")
    val got = graft.queries.Pipeline.duplicateSpansOf(df).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.length == 3, got.mkString(";"))
    got.foreach { case (nDocs, nOcc, sample) =>
      assert(nDocs == 2L && nOcc == 2L && sample == "1,2")
    }
    // and the hashes are exactly the fingerprints of the 3 shared spans
    val toks = shared.split(" ")
    val spans = (0 to 2).map(i => toks.slice(i, i + 8).mkString(" "))
    val expectHashes = spans.map { sp =>
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(sp.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
    }.sorted
    val gotHashes = graft.queries.Pipeline.duplicateSpansOf(df).collect()
      .map(_.getLong(0)).sorted.toSeq
    assert(gotHashes == expectHashes)
  }

  test("setsim_join: prefix-filtered exact join equals the all-pairs formulation") {
    // at sf0.001 every doc_id < 500, so the bounded all-pairs twin IS the
    // full-corpus answer — the prefix-filtered candidate path must land on
    // the identical pair set and jaccard values
    val exact = graft.queries.Pipeline.ngramJaccard(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = graft.queries.Pipeline.setsimJoin(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(exact.nonEmpty, "test corpus must contain qualifying pairs")
    assert(got == exact)
  }

  test("setsim_join plan: no cartesian product (candidates come from prefix postings)") {
    val plan = graft.queries.Pipeline.setsimJoin(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }

  test("cdc_chunking: content-defined chunks match a plain-Scala recompute") {
    def h31(t: String): Long =
      t.foldLeft(5381L)((acc, c) => (acc * 33 + c.toInt) % 2147483648L)
    def chunksOf(toks: Array[String]): Seq[Array[String]] = {
      val out = scala.collection.mutable.ArrayBuffer[Array[String]]()
      val cur = scala.collection.mutable.ArrayBuffer[String]()
      toks.foreach { t =>
        cur += t
        if (h31(t) % 4 == 0) { out += cur.toArray; cur.clear() }
      }
      if (cur.nonEmpty) out += cur.toArray
      out.toSeq
    }
    def sha15(s0: String): Long =
      java.lang.Long.parseLong(
        java.security.MessageDigest.getInstance("SHA-256")
          .digest(s0.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15), 16)
    val docRows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("[ \t\n\r]", -1)
        .filter(_.nonEmpty))
    val occ = docRows.flatMap { case (id, ts) =>
      chunksOf(ts).map(c => (sha15(c.mkString(" ")), id, c.length.toLong)) }
    val expect = occ.groupBy(_._1).toSeq.map { case (h, os) =>
      (h, os.map(_._2).distinct.length.toLong, os.length.toLong, os.map(_._3).min)
    }.filter(_._2 >= 2).sortBy(_._1)
    val got = graft.queries.Pipeline.cdcChunking(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expect)
    assert(got.nonEmpty)
  }

  test("cdc_chunking re-aligns after an insertion (the property fixed windows lack)") {
    import spark.implicits._
    val base = ("alpha beta gamma part delta epsilon agg zeta eta theta " +
      "vector iota kappa part lambda mu agg nu xi omicron").trim
    // doc 2 = doc 1 with one token INSERTED at the front: every chunk
    // after the first boundary re-aligns and still collides
    val df = Seq((1L, base), (2L, s"inserted $base")).toDF("doc_id", "text")
    val shared = graft.queries.Pipeline.cdcChunkingOf(df).collect()
    // 'part' and 'agg' are boundary tokens (hash31 % 4 == 0), so the two
    // docs share every chunk from the first boundary on
    assert(shared.length >= 3, s"expected re-aligned shared chunks, got ${shared.length}")
    assert(shared.forall(r => r.getLong(1) == 2L))
  }

  test("sorted_neighborhood: two-pass window blocking matches a plain-Scala recompute") {
    val w = 10
    val docRows = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split("[ \t\n\r]", -1)
        .filter(_.nonEmpty)).filter(_._2.length >= 4)
    def windowPairs(key: Long => String): Set[(Long, Long)] = {
      val ranked = docRows.map { case (id, _) => id }
        .sortBy(id => (key(id), id)).zipWithIndex
      (for {
        (a, ra) <- ranked; (b, rb) <- ranked
        if rb > ra && rb <= ra + w
      } yield (math.min(a, b), math.max(a, b))).toSet
    }
    val byId = docRows.toMap
    val cand = windowPairs(id => byId(id).take(4).mkString(" ")) ++
      windowPairs(id => byId(id).takeRight(4).reverse.mkString(" "))
    val shingles = docRows.filter(_._2.length >= 3).map { case (id, ts) =>
      id -> ts.sliding(3).map(_.mkString(" ")).toSet
    }.toMap
    val expect = cand.toSeq.flatMap { case (id1, id2) =>
      (shingles.get(id1), shingles.get(id2)) match {
        case (Some(s1), Some(s2)) =>
          val inter = (s1 & s2).size
          val j = BigDecimal(inter.toDouble / (s1.size + s2.size - inter))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          if (j >= 0.5) Some((id1, id2, j)) else None
        case _ => None
      }
    }.sortBy(p => (p._1, p._2))
    val got = graft.queries.Pipeline.sortedNeighborhood(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expect)
    assert(got.nonEmpty, "fixture must contain window-caught near-dups")
    // the blocking bound the family is chosen for: O(n·w) candidates/pass
    assert(cand.size <= 2 * docRows.length * w)
    // published recall contract reconciles with the recomputed overlap
    val exact = graft.queries.Pipeline.setsimJoin(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val r = graft.queries.Pipeline.snmRecall(spark, sf0001).collect().head
    assert(r.getLong(0) == exact.size.toLong)
    assert(r.getLong(1) == exact.count(p => got.exists(g => (g._1, g._2) == p)).toLong)
    assert(r.getLong(2) == (if (exact.isEmpty) 10000L
      else 10000L * r.getLong(1) / r.getLong(0)))
  }
}
