package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage-by-stage timing of the embedding_neardup chain at
  * a given sfDir — separates count / train / assign / bucket / verify so
  * a regression names its stage instead of the whole query.
  */
object ProfileNearDup {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    def t[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val n = t("count")(emb.count())
    val k = graft.operators.Kmeans.ncellsFor(n)
    println(s"[profile] n=$n k=$k")
    val model = t("train")(graft.operators.Kmeans.train(emb, k, iters = 2))
    val cells = graft.operators.Kmeans.quantized(emb)
      .select(graft.operators.Kmeans.nearest(model).getField("cid").as("bkey"),
        col("vec_id"))
    t("assign+bucket") {
      cells.groupBy(col("bkey"))
        .agg(count(lit(1)).as("m")).agg(sum(col("m") * col("m"))).collect()
    }
    t("full query") {
      graft.operators.Dedup.embeddingNearDup(emb).count()
    }
    spark.stop()
  }
}
