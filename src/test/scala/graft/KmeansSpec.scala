package graft

import graft.operators.Kmeans
import org.apache.spark.sql.functions._

/** The integer-lattice k-means trainer: assignments are the true argmin
  * (independent Scala recompute), training is bit-reproducible, and the
  * declared empty-cluster rule holds on a crafted degenerate input.
  */
class KmeansSpec extends SparkSuite {

  test("assignment is the exact argmin with the (dist, cid) tie-break") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val model = Kmeans.train(emb, k = 8, iters = 2)
    val got = Kmeans.quantized(emb)
      .select(col("vec_id"), col("v"), Kmeans.nearest(model).as("nc"))
      .collect()
    assert(got.nonEmpty)
    got.take(50).foreach { r =>
      val v = r.getSeq[Long](1).toArray
      // independent reference: plain loops, no Spark expressions
      val dists = model.map(c =>
        c.indices.map(i => (v(i) - c(i)) * (v(i) - c(i))).sum)
      val best = dists.zipWithIndex.min // (dist, cid) lexicographic
      val nc = r.getStruct(2)
      assert((nc.getLong(0), nc.getInt(1)) == best,
        s"vec ${r.getLong(0)}: got ${(nc.getLong(0), nc.getInt(1))}, want $best")
    }
  }

  test("ivf_size_profile matches a plain-Scala probe recompute at both sizes") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val rows = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toArray))
    val n = rows.length.toLong
    def sqd(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val qv = rows.find(_._1 == 0L).get._2
    val exact = rows.filter(_._1 != 0L)
      .map { case (id, v) => (sqd(v, qv), id) }.sorted.take(20).map(_._2).toSet
    val ref = Seq(8, Kmeans.ncellsFor(n)).map { k =>
      // the trainer itself is pinned by the other tests; reuse it here
      val model = Kmeans.train(emb, k = k, iters = 2)
      val nprobe = math.max(1, 3 * k / 8)
      val probed = model.zipWithIndex.map { case (c, cid) =>
        (sqd(qv, c), cid) }.sorted.take(nprobe).map(_._2).toSet
      val ivf = rows.filter(_._1 != 0L)
        .filter { case (_, v) =>
          probed(model.zipWithIndex.map { case (c, cid) => (sqd(v, c), cid) }.min._2) }
        .map { case (id, v) => (sqd(v, qv), id) }.sorted.take(20).map(_._2)
      (k, nprobe, ivf.count(exact).toLong)
    }
    val got = graft.queries.Pipeline.ivfSizeProfile(spark, sf0001).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    assert(got.length == ref.length)
    got.zip(ref.sortBy(_._1)).foreach { case ((k, np, hit, bp), (rk, rnp, rhit)) =>
      assert(k == rk && np == rnp && hit == rhit && bp == 10000L * rhit / 20L,
        s"ncells $k: got ($np, $hit, $bp) want ($rnp, $rhit)")
    }
  }

  test("training is bit-reproducible across runs") {
    val emb = graft.sources.Tables.embeddings(spark, sf0001)
    val a = Kmeans.train(emb, k = 8, iters = 2)
    val b = Kmeans.train(emb, k = 8, iters = 2)
    assert(a.length == b.length)
    a.zip(b).foreach { case (x, y) => assert(x.sameElements(y)) }
  }

  test("a cluster left empty keeps its previous centroid") {
    import spark.implicits._
    // 4 identical far-away points + the two init vectors: after round 1
    // every point assigns to whichever init centroid is nearer (cid 0 on
    // the tie), so the other cluster goes empty and must keep its init
    // centroid verbatim
    val vecs = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(0.001f, 0.0f)),
      (2L, Array(10.0f, 10.0f)),
      (3L, Array(10.0f, 10.0f)),
      (4L, Array(10.0f, 10.0f)),
      (5L, Array(10.0f, 10.0f))).toDF("vec_id", "embedding")
    val m = Kmeans.train(vecs, k = 2, iters = 1)
    // cluster 1 (init = vec 1) is nearer to the mass at (10,10)? No —
    // both inits sit near the origin; all of 2..5 go to the closer one.
    // vec 0 -> cid 0 (dist 0), vec 1 -> cid 1 (dist 0); 2..5 are nearer
    // to cid 1 (0.001 closer on x). So NO cluster is empty here; instead
    // verify against the hand-computed update:
    assert(m(0).sameElements(Array(0L, 0L))) // only vec 0
    val exp1 = Array((1000L + 4 * 10000000L) / 5, (0L + 4 * 10000000L) / 5)
    assert(m(1).sameElements(exp1), m(1).toSeq.toString)
    // degenerate: every point identical -> cluster 1 empty after round 1,
    // keeps its init centroid (the first point's vector) by the rule
    val same = Seq.tabulate(5)(i => (i.toLong, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding")
    val m2 = Kmeans.train(same, k = 2, iters = 1)
    assert(m2(0).sameElements(Array(3000000L, 4000000L)))
    assert(m2(1).sameElements(Array(3000000L, 4000000L))) // kept, not NaN/zeroed
  }
}
