package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev tool: print a declared query's result rows (first 50) on a given
  * fixture dir — the quick way to eyeball a contract number (a recall_bp,
  * a flag column) without a full Verify sweep.
  * Usage: runMain graft.tools.ShowQ <sfDir> <query> [query ...]
  */
object ShowQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.drop(1).foreach { q =>
      println(s"== $q @ $sfDir")
      graft.SparkEntry.queries(q)(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
