package graft.examples

import graft.operators.{Kmeans, Pq}
import graft.sources.Layout
import org.apache.spark.sql.functions._

/** End-to-end ANN index lifecycle over the embeddings table — the
  * composition the similarity-search operators exist for (the vector
  * analog of [[CurationPipelineExample]]):
  *
  *   1. TRAIN: the coarse quantizer (k-means cells) and the M
  *      per-subspace PQ codebooks, both on the exact integer lattice
  *      (bit-reproducible run-to-run)
  *   2. BUILD: encode every vector to M one-byte codes and write the
  *      index partitioned by cell (`cell=<cid>` directories) — the
  *      write-once artifact every probe reads
  *   3. PROBE: rank cells by the query's distance to the trained
  *      centroids (driver-side, k distances), read ONLY the nprobe
  *      nearest cells' directories (PartitionFilters pruning), score
  *      by ADC table lookups, take the top-k
  *   4. MEASURE: recall@k of the probe against the exact integer-L2
  *      scan — the quality number an index deployment publishes
  *
  * Train is the only driver-looped stage (bounded k×dims folds); build
  * and probe are map-only, and the probe's scan cost is
  * nprobe/ncells × 4 bytes/vector no matter how wide the corpus is.
  * Usage: runMain graft.examples.AnnIndexExample <sfDir> <indexDir>
  */
object AnnIndexExample {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val indexDir = if (args.length > 1) args(1) else "/tmp/graft-ann-index"
    val spark = graft.GraftSession.getOrCreate(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)

    // 1. train both index halves (the codebooks on residuals — IVFADC)
    val coarse = Kmeans.train(emb, k = 8, iters = 2)
    val pq = Pq.train(emb, coarse)

    // 2. build: residual codes + cell, written once, partitioned by cell
    val index = Pq.codesWide(emb, coarse, pq).select(col("vec_id"),
      col("cell"), Pq.packCodes(col("codes")).as("code32"))
    Layout.writePartitioned(index, indexDir, "cell")

    // 3. probe for query vec_id=0: cells ranked on the driver, ADC over
    // only the probed directories
    val qv = Kmeans.quantized(emb.filter(col("vec_id") === 0))
      .select(col("v")).collect()(0).getSeq[Long](0).toArray
    val probed = coarse.zipWithIndex.map { case (c, cid) =>
      (c.indices.map(i => (qv(i) - c(i)) * (qv(i) - c(i))).sum, cid)
    }.sorted.take(3).map(_._2)
    val dt = Pq.distTables(pq, coarse, qv)
    val topk = spark.read.parquet(indexDir)
      .filter(col("cell").isin(probed.toIndexedSeq: _*))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Pq.adcScorePacked(col("cell"), col("code32"), dt).as("adc_micro2"))
      .orderBy(col("adc_micro2"), col("vec_id"))
      .limit(20)
    val hits = topk.collect().map(_.getLong(0)).toSet

    // 4. SERVE: the two-stage shape production stacks use — ADC proposes
    // a top-100 shortlist from the probed cells (still 4 B/vector), the
    // raw vectors exactly re-rank ONLY those 100 (O(shortlist) cost at
    // any corpus width)
    val shortlist = spark.read.parquet(indexDir)
      .filter(col("cell").isin(probed.toIndexedSeq: _*))
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        Pq.adcScorePacked(col("cell"), col("code32"), dt).as("adc_micro2"))
      .orderBy(col("adc_micro2"), col("vec_id"))
      .limit(100)
      .select(col("vec_id"))
    val reranked = Kmeans.quantized(emb)
      .join(broadcast(shortlist), "vec_id")
      .select(col("vec_id"),
        graft.functions.SketchExprs.nearestCentroid(col("v"), Array(qv))
          .getField("dist").as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSet

    // 5. MEASURE: recall@20 of both probe stages vs the exact scan —
    // the quality numbers an index deployment publishes
    val exact = Kmeans.quantized(emb).filter(col("vec_id") =!= 0)
      .select(col("vec_id"),
        graft.functions.SketchExprs.nearestCentroid(col("v"), Array(qv))
          .getField("dist").as("dist"))
      .orderBy(col("dist"), col("vec_id")).limit(20)
      .collect().map(_.getLong(0)).toSet
    val recall = 10000 * (exact & hits).size / 20
    val recallRr = 10000 * (exact & reranked).size / 20
    println(s"ANN index at $indexDir: probed cells ${probed.mkString(",")}, " +
      s"top-20 recall ${recall} bp raw ADC / ${recallRr} bp after exact " +
      s"re-rank of the ADC top-100, vs exact scan")
  }
}
