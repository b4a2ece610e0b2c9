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
