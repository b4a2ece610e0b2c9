package graft

import graft.sources.AvroSource
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The native Avro container source/sink (avro-core API — the
  * spark-avro connector module is absent from the offline container;
  * the interchange gap closes with a direct reader/writer instead).
  */
class AvroSourceSpec extends SparkSuite {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  test("avro sink + source round-trip the documents table exactly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro").toString
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(docSchema.fields.map(f => col(f.name)).toIndexedSeq: _*)
    AvroSource.write(docs, dir)
    // one container per partition — the partitioned TextSink shape
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".avro"))
    assert(files.length == docs.rdd.getNumPartitions)
    val back = AvroSource.read(spark, dir, docSchema)
    val a = docs.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    val b = back.collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(a.length == b.length && a.sameElements(b),
      s"round-trip mismatch: ${a.length} vs ${b.length} rows")
    // and the read is genuinely consumable by the query layer: a plain
    // aggregate over the avro-sourced frame equals the parquet one
    val aggAvro = back.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val aggPq = docs.groupBy(col("lang")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(aggAvro == aggPq)
  }

  test("avro source fails loudly on corrupt containers and missing fields") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avro-bad").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part-junk.avro"),
      Array[Byte](0x4f, 0x62, 0x6a, 0x00, 1, 2, 3)) // 'Obj\0' torn header
    val e = intercept[Exception](
      AvroSource.read(spark, dir, docSchema).count())
    def chain(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.toString +: chain(x.getCause))
    assert(chain(e).exists(_.contains("Avro container")), chain(e).mkString(" | "))
    // a VALID container read under a schema demanding a field it never
    // wrote must fail resolution, not fabricate a column
    val okDir = java.nio.file.Files.createTempDirectory("graft-avro-res").toString
    AvroSource.write(
      spark.read.parquet(s"$sf0001/documents.parquet")
        .select(col("doc_id"), col("lang")), okDir)
    val wider = StructType(Seq(StructField("doc_id", LongType),
      StructField("lang", StringType), StructField("missing_col", StringType)))
    val e2 = intercept[Exception](AvroSource.read(spark, okDir, wider).count())
    assert(chain(e2).exists(s =>
      s.contains("missing_col") || s.contains("incompatible")), chain(e2).take(3).mkString(" | "))
  }
}
