package graft.examples

import graft.functions.TextFns
import graft.operators.Dedup
import graft.sources.{Sources, Tables}
import org.apache.spark.sql.functions._

/** End-to-end LLM-training-data curation pipeline over the documents
  * table — the composition these operators exist for:
  *
  *   1. exact dedup (sha256 keep-min)
  *   2. near-dup CLUSTER removal (MinHash/LSH pairs -> connected
  *      components -> keep each cluster's min-id representative; pairwise
  *      "drop id2" under-removes transitive groups)
  *   3. quality + language filters
  *   4. per-doc stats, normalized text, fingerprint, deterministic
  *      train/valid/test split
  *   5. partitioned parquet out (pruned downstream scans)
  *
  * Every stage is shuffle-bounded; the only driver involvement is the
  * per-round convergence count inside connectedComponents.
  * Usage: runMain graft.examples.CurationPipelineExample <sfDir> <outDir>
  */
object CurationPipelineExample {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft-curated"
    val spark = graft.GraftSession.getOrCreate(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, sfDir)
    val n0 = docs.count()

    // 1. exact dedup: survivors = min doc_id per content hash
    val exactSurvivors = Dedup.exact(docs).select(col("keep_doc_id").as("doc_id"))
    val afterExact = docs.join(exactSurvivors, "doc_id")

    // 2. near-dup cluster removal: pairs -> components -> keep the rep
    // (unsorted pair variant: CC reshuffles immediately, a sorted pair
    // report would pay a wasted global sort)
    val nearDupLosers = Dedup.connectedComponents(
        Dedup.minhashPairs(afterExact, minJac = 0.5))
      .filter(col("id") =!= col("label"))
      .select(col("id").as("doc_id"))
    val afterNear = afterExact.join(nearDupLosers, Seq("doc_id"), "left_anti")

    // 3. quality + language gates
    val gated = afterNear
      .withColumn("quality", TextFns.qualityScore(col("text")))
      .withColumn("lang_pred", TextFns.langId(col("text")))
      .filter(col("quality") >= 0.2)

    // 4. per-doc features, normalized text, stable train/valid/test split
    // (normalizeColumn/splitColumn are the SAME definitions the oracle-
    // gated normalize_text / train_test_split queries run — no drift)
    val curated = gated
      .withColumn("n_tokens", size(TextFns.tokens(col("text"))))
      .withColumn("norm_text", graft.queries.Pipeline.normalizeColumn(col("text")))
      .withColumn("split", graft.queries.Pipeline.splitColumn(col("doc_id")))
      .join(TextFns.fingerprintDf(gated, "doc_id", "text"), Seq("doc_id"), "left_outer")

    // 5. partitioned write for pruned downstream reads
    Sources.writeParquet(curated, outDir, partitionBy = Seq("lang", "split"))

    val n1 = spark.read.parquet(outDir).count()
    println(s"[pipeline] $n0 docs in -> $n1 curated out " +
      s"(exact survivors ${exactSurvivors.count()}, near-dup losers ${nearDupLosers.count()})")
    spark.stop()
  }
}
