package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B harness for the MinHash bench-time investigation
  * (BENCH_r02 showed dedup_minhash/dedup_near 2-3x their r1 times).
  * Runs, in ONE JVM on the same session the bench uses:
  *
  *   warmup -> minhash x3 -> connectedComponents pipeline -> minhash x3
  *
  * If the post-CC runs are slower than the pre-CC runs, accumulated
  * session/JVM state from the iterative CC job (checkpoint blocks, GC
  * pressure, codegen cache churn) is inflating subsequent heavy
  * aggregations; if all six are flat, the r2 numbers were host load.
  * Prints one JSON line with the six timings plus GC deltas.
  */
object MinhashAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def gcMs: Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def timed(label: String)(f: => Unit): (String, Double, Long) = {
      val g0 = gcMs; val t0 = System.nanoTime()
      f
      (label, (System.nanoTime() - t0) / 1e9, gcMs - g0)
    }

    // same warmup the bench uses
    val docsSmall = spark.read.parquet(s"$sfDir/documents.parquet").limit(50)
    graft.operators.Dedup.minhash(docsSmall).count()

    def minhashRun(): Unit =
      graft.queries.Pipeline.dedupMinhash(spark, sfDir).count()

    val pre = (1 to 3).map(i => timed(s"pre$i")(minhashRun()))
    val cc = timed("cc")(graft.queries.Pipeline.dedupClustersLsh(spark, sfDir).count())
    val post = (1 to 3).map(i => timed(s"post$i")(minhashRun()))

    val all = pre ++ Seq(cc) ++ post
    val js = all.map { case (l, s, g) => s""""$l":{"sec":$s,"gc_ms":$g}""" }
      .mkString("{", ",", "}")
    println(s"""{"minhash_ab":$js}""")
    spark.stop()
  }
}
