package graft

import org.apache.spark.sql.functions._

/** The DSv2 read path over the engine's own partitioned text sink:
  * values round-trip byte-exactly, partition filters prune FILES (not
  * just rows), residual filters still evaluate, and column pruning
  * reaches the reader.
  */
class MrTextSourceSpec extends SparkSuite {

  private def writeCorpus(): (String, Map[String, Long], Int) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("mrtext").toString
    val counts = Map("alpha" -> 3L, "beta" -> 1L, "gamma" -> 7L,
      "delta" -> 2L, "epsilon" -> 5L, "zeta" -> 11L)
    val p = 5
    graft.operators.TextSink.write(spark,
      counts.toSeq.toDF("key", "value"), dir, p)
    (dir, counts, p)
  }

  test("mrtext: full read round-trips the sink, part column matches djb2") {
    val (dir, counts, p) = writeCorpus()
    val rows = spark.read.format("graft-mrtext").load(dir).collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      assert(counts(r.getString(0)) == r.getString(1).toLong)
      assert(r.getInt(2) == (graft.functions.Djb2.hash(r.getString(0)) % p + p) % p)
    }
  }

  test("mrtext: a part filter prunes whole files — unselected partitions never open") {
    val (dir, _, _) = writeCorpus()
    val all = spark.read.format("graft-mrtext").load(dir)
    val parts = all.select("part").distinct().collect().map(_.getInt(0)).sorted
    assert(parts.length > 1, "corpus must span several partitions")
    MrTextSourceTestHook.reset()
    val chosen = parts.head
    val got = spark.read.format("graft-mrtext").load(dir)
      .filter(col("part") === chosen).collect()
    assert(got.nonEmpty && got.forall(_.getInt(2) == chosen))
    val opened = MrTextSourceTestHook.opened
    assert(opened.size == 1 && opened.head.endsWith(s"result-$chosen.txt"),
      s"pruning must open exactly the selected file, opened=$opened")
  }

  test("mrtext: residual key filter still evaluates; key-only projection prunes columns") {
    val (dir, counts, _) = writeCorpus()
    val got = spark.read.format("graft-mrtext").load(dir)
      .filter(col("key") === "gamma").select("value").collect()
    assert(got.map(_.getString(0)).toSeq == Seq(counts("gamma").toString))
    // part-only projection: the BatchScan's output list drops key/value
    // (pruneColumns reached the reader — its output is [part#N] alone)
    val plan = spark.read.format("graft-mrtext").load(dir)
      .select("part").queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan") && plan.contains("[part#")
      && !plan.contains("key#"), plan.take(600))
  }

  test("mrtext: a nonexistent path fails loudly at plan time, never an empty result") {
    // pre-fix behavior: File.listFiles() null → 0 rows, silently
    // swallowing typos and unsupported remote URIs (hdfs://, s3://)
    val e = intercept[Exception] {
      spark.read.format("graft-mrtext").load("/no/such/dir-mrtext").count()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "\n" + chain(t.getCause)
    assert(chain(e).contains("not a listable local directory"), chain(e).take(400))
  }

  test("mrtext: a malformed line fails loudly with the file named, never silent garbage") {
    val dir = java.nio.file.Files.createTempDirectory("mrtext-bad")
    java.nio.file.Files.write(dir.resolve("result-0.txt"),
      "ok: 1\nno separator here\n".getBytes("UTF-8"))
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("graft-mrtext").load(dir.toString).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("malformed mrtext line") || msg.contains("result-0.txt"), msg.take(400))
  }
}

/** Test-only window onto [[graft.sources.MrTextSource.openedFiles]]
  * (package-private there).
  */
object MrTextSourceTestHook {
  def reset(): Unit = graft.sources.MrTextHookBridge.reset()
  def opened: Set[String] = graft.sources.MrTextHookBridge.opened
}
