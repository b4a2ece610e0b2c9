package graft.sources

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** The raw-ingest first mile: schema-contracted JSONL/CSV readers —
  * round-trip parity with the parquet table, corrupt-line FAILFAST
  * kill, and the PERMISSIVE reject census on planted garbage.
  */
class RawIngestSpec extends SparkSuite {

  private def docsSorted(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq

  test("jsonl and csv round-trips equal the parquet documents table exactly") {
    val expect = docsSorted(Tables.documents(spark, sf0001))
    val jl = docsSorted(RawIngest.jsonl(spark, RawIngest.stageJsonl(spark, sf0001)))
    assert(jl == expect, "JSONL round-trip drifted from the parquet table")
    val cv = docsSorted(RawIngest.csv(spark, RawIngest.stageCsv(spark, sf0001)))
    assert(cv == expect, "CSV round-trip drifted from the parquet table")
  }

  test("gzip JSONL round-trips exactly and reads one task per shard") {
    val expect = docsSorted(Tables.documents(spark, sf0001))
    val dir = RawIngest.stageJsonlGz(spark, sf0001)
    val gz = RawIngest.jsonl(spark, dir)
    assert(docsSorted(gz) == expect,
      "gzip JSONL round-trip drifted from the parquet table")
    // the scale-honesty pin: gzip is not splittable, so the scan's
    // task count equals the shard count no matter how small
    // maxPartitionBytes is — parallelism rides the producer's shard
    // size, which is exactly what the RawIngest scaladoc promises
    val shards = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".json.gz"))
    assert(shards > 0, s"no .json.gz shards staged under $dir")
    val tasks = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
      val parts = RawIngest.jsonl(spark, dir).rdd.getNumPartitions
      assert(parts == shards,
        s"expected one task per gzip shard ($shards), planner chose $parts")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", tasks)
  }

  test("recompression rung: gz jsonl -> zstd parquet round-trips exactly") {
    val expect = docsSorted(Tables.documents(spark, sf0001))
    val dir = RawIngest.stageRecompressed(spark, sf0001)
    val back = docsSorted(spark.read.parquet(dir)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars")))
    assert(back == expect, "recompressed parquet drifted from the table")
    // the layout really is zstd parquet (codec is part of the shard name)
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(names.exists(n => n.contains("zstd") && n.endsWith(".parquet")),
      s"no zstd parquet shard in: ${names.mkString(", ")}")
  }

  test("csv quoting survives embedded delimiters, quotes, and newlines") {
    import spark.implicits._
    val nasty = Seq(
      (1L, "plain text", "en", "s1", 10L),
      (2L, "comma, inside", "en", "s1", 13L),
      (3L, "quote \" inside", "en", "s2", 14L),
      (4L, "newline\ninside", "en", "s2", 14L),
      (5L, "all, \"of\"\nthem", "en", "s3", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft-nasty-csv").toString
    nasty.write.mode("overwrite")
      .option("header", "false").option("quote", "\"").option("escape", "\"")
      .csv(dir)
    val back = docsSorted(RawIngest.csv(spark, dir))
    assert(back == docsSorted(nasty), s"RFC-4180 round-trip drifted: $back")
  }

  test("FAILFAST kills on a corrupt line; PERMISSIVE censuses it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bad-jsonl")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "a", "n_chars": 2}
        |{this is not json at all
        |{"doc_id": 2, "text": "ok2", "lang": "en", "source": "a", "n_chars": 3}
        |""".stripMargin)
    val e = intercept[Exception](
      RawIngest.jsonl(spark, dir.toString).count())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: chain(x.getCause))
    assert(chain(e).exists(s => s.contains("Malformed") || s.contains("FAILFAST")),
      chain(e).take(3).mkString(" | "))
    val census = RawIngest.rejectCensus(
        RawIngest.jsonlWithRejects(spark, dir.toString))
      .collect()(0)
    assert((census.getLong(0), census.getLong(1), census.getLong(2))
        == ((2L, 1L, 2L)),
      s"expected 2 accepted / 1 rejected / 2 with id, got $census")
    // the corrupt line itself is preserved verbatim for forensics
    // (doc_id rides along: a corrupt-column-only scan is disallowed)
    val rej = RawIngest.jsonlWithRejects(spark, dir.toString)
      .filter(col("_corrupt").isNotNull)
      .select(col("_corrupt"), col("doc_id"))
      .collect().map(_.getString(0)).toSeq
    assert(rej == Seq("{this is not json at all"), rej)
  }

  test("a type-incompatible field fails the contract loudly (never coerces)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-drift-jsonl")
    java.nio.file.Files.writeString(dir.resolve("part-0.json"),
      """{"doc_id": "not-a-number", "text": "x", "lang": "en", "source": "a", "n_chars": 1}
        |""".stripMargin)
    // collect(), not count(): a count prunes every column, so the
    // parser never touches doc_id and the drift would go unseen
    intercept[Exception](RawIngest.jsonl(spark, dir.toString).collect())
    // PERMISSIVE: the drifted row lands whole in _corrupt, not half-parsed
    val rows = RawIngest.jsonlWithRejects(spark, dir.toString).collect()
    assert(rows.length == 1 && !rows(0).isNullAt(5) && rows(0).isNullAt(0),
      rows.mkString("; "))
  }
}
