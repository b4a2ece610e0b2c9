package graft

import org.apache.spark.sql.functions._

/** The embedding-modality incremental ingest gate:
  * gate(batch | frozen corpus) must equal the full near-dup recompute
  * on the union restricted to batch ids — pinned on planted twins that
  * straddle the batch/corpus boundary.
  */
class IncrementalGateSpec extends SparkSuite {

  private val Dim = 8

  /** Unit-ish vector along axis `a` with a deterministic per-id wiggle
    * so k-means has non-degenerate cells.
    */
  private def vec(a: Int, wiggle: Float): Array[Float] = {
    val v = Array.fill(Dim)(0.01f * wiggle)
    v(a) = 1.0f
    v
  }

  test("embedding_neardup_incremental: planted cross-boundary twins drop; gate equals the union recompute") {
    import spark.implicits._
    // batch = vec_id < 500; corpus = vec_id >= 500. Twins: batch 0 ~
    // corpus 500 (same axis), batch 1 ~ corpus 501. Batch 2/3 sit on
    // axes the corpus never uses (kept). Corpus also has axis-4/5
    // vectors with no batch twin (irrelevant to the gate).
    val rows = Seq(
      (0L, vec(0, 1f)), (1L, vec(1, 2f)), (2L, vec(2, 3f)), (3L, vec(3, 4f)),
      (500L, vec(0, 5f)), (501L, vec(1, 6f)),
      (502L, vec(4, 7f)), (503L, vec(5, 8f)), (504L, vec(4, 9f)),
      (505L, vec(5, 1f)), (506L, vec(4, 2f)), (507L, vec(5, 3f)))
    val emb = rows.toDF("vec_id", "embedding")
    val model = graft.operators.Kmeans.train(emb, k = 4, iters = 2)
    val got = graft.queries.Pipeline
      .embeddingNeardupIncrementalFrom(emb, model)
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    // plain-Scala recompute of the SAME declared semantics on the union:
    // integer-micro argmin cell assignment, exact cosine, 6-dp round
    def micros(v: Array[Float]): Array[Long] =
      v.map(x => math.round(x.toDouble * 1e6))
    def cellOf(v: Array[Float]): Int = {
      val m = micros(v)
      model.zipWithIndex.map { case (c, i) =>
        (c.zip(m).map { case (a, b) => val dd = a - b; dd * dd }.sum, i)
      }.minBy(identity)._2
    }
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x.toDouble).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x.toDouble).sum)
      BigDecimal(dot / (na * nb))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = rows.toMap
    val batchIds = rows.map(_._1).filter(_ < 500L)
    val corpusIds = rows.map(_._1).filter(_ >= 500L)
    val expect = batchIds.filter { b =>
      !corpusIds.exists(c =>
        cellOf(byId(c)) == cellOf(byId(b)) && cos(byId(b), byId(c)) >= 0.35)
    }.sorted.map(id => (id, cellOf(byId(id)).toLong))

    assert(got.toSeq == expect, s"got ${got.toSeq}, expect $expect")
    // the planted twins really exercised the drop path
    assert(!got.map(_._1).contains(0L) && !got.map(_._1).contains(1L),
      "planted cross-boundary twins were admitted")
    assert(got.map(_._1).toSet == Set(2L, 3L),
      "novel batch vectors must be admitted")
  }

  test("embedding_neardup_incremental on the fixture admits exactly the vectors with no within-cell corpus twin") {
    val model = graft.queries.Pipeline.semanticModel(spark, sf0001)
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val got = graft.queries.Pipeline
      .embeddingNeardupIncrementalFrom(emb, model)
      .collect().map(_.getLong(0)).toSet
    // recompute the dup set through the engine's own bounded pair
    // machinery on the UNION (full recompute), restricted to batch ids
    val pairs = graft.operators.Dedup
      .embeddingNearDupPairsFrom(emb, model, minCos = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dupBatch = pairs.collect {
      case (a, b) if a < 500 && b >= 500 => a
      case (a, b) if b < 500 && a >= 500 => b
    }.toSet
    val batchIds = emb.filter(col("vec_id") < 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got == batchIds -- dupBatch,
      s"gate drifted from the union recompute: extra=${got -- (batchIds -- dupBatch)} missing=${(batchIds -- dupBatch) -- got}")
  }
}
