package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Native Avro container source/sink on the avro-core API.
  *
  * The `spark-avro` connector module is absent from this offline
  * container (re-confirmed rounds 9–15), but the avro CORE jars
  * (avro/avro-ipc/avro-mapred 1.12) ship with the Spark distribution —
  * so the interchange gap closes with a direct reader/writer over the
  * Avro object-container format instead of staying environment-blocked:
  *
  *  - [[read]] is a distributed scan: one task per container file
  *    (`binaryFiles` keeps the stream lazy — `DataFileStream` decodes
  *    record-by-record, never the whole file in memory), rows converted
  *    to the caller's flat [[StructType]] with loud failure on a
  *    missing field or an un-mapped type — a source never fabricates
  *    columns.
  *  - [[write]] is the [[graft.operators.TextSink]] posture: each
  *    partition writes its own `part-<p>.avro` container (null codec —
  *    no compression-codec dependency), so the sink scales with the
  *    partition count and no executor ever holds more than its slice.
  *
  * Scale note: `binaryFiles` parallelism is one task per FILE; at
  * 100 TB the container files are the ingest's own shard granularity
  * (the standard Avro layout), so task count rides the shard count.
  * Column pruning/pushdown do NOT reach inside Avro blocks (the format
  * is row-major) — the documented trade vs parquet; this source exists
  * for interchange, with parquet as the analytical layout.
  */
object AvroSource {

  private def avroSchemaFor(schema: StructType): Schema = {
    val fields = SchemaBuilder.record("row").namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      f.dataType match {
        case LongType    => fs.requiredLong(f.name)
        case IntegerType => fs.requiredInt(f.name)
        case DoubleType  => fs.requiredDouble(f.name)
        case BooleanType => fs.requiredBoolean(f.name)
        case StringType  => fs.requiredString(f.name)
        case t => throw new IllegalArgumentException(
          s"AvroSource: unsupported field type $t for '${f.name}'")
      }
    }.endRecord()
  }

  /** Read every `.avro` container under `dir` as a DataFrame with the
    * given flat schema. Corrupt containers and missing fields throw —
    * the codec-seam contract.
    *
    * Rows STREAM through the task: the iterator decodes
    * record-by-record off the open `DataFileStream` and closes both
    * the reader and the underlying stream on exhaustion (or on the
    * decode error that kills the task) — a large ingest shard never
    * materializes in executor memory. A task-completion listener
    * closes them too, so partial consumption (limit/take, a
    * downstream exception, a task kill) cannot leak the file handle.
    */
  def read(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val schemaJson = avroSchemaFor(schema).toString // tasks re-parse (Schema is not serializable-stable)
    val names = schema.fields.map(_.name)
    val types = schema.fields.map(_.dataType)
    val rows = spark.sparkContext.binaryFiles(dir + "/*.avro")
      .flatMap { case (path, pds) =>
        // reader schema = the caller's expectation: Avro schema
        // RESOLUTION runs per file, so a container missing a field or
        // carrying an incompatible type fails the task loudly here —
        // as does a corrupt/truncated container (bad magic, torn block)
        val expected = new Schema.Parser().parse(schemaJson)
        val stream = pds.open()
        val reader =
          try new DataFileStream(stream,
            new GenericDatumReader[GenericRecord](null, expected))
          catch {
            case e: Exception =>
              stream.close()
              throw new IllegalArgumentException(
                s"$path: corrupt or incompatible Avro container", e)
          }
        var open = true
        def closeAll(): Unit = if (open) {
          open = false; reader.close(); stream.close()
        }
        // A task that stops consuming EARLY (limit/take, a downstream
        // failure, a kill) never exhausts the iterator — the completion
        // listener is what releases the handle on those paths.
        val tc = org.apache.spark.TaskContext.get()
        if (tc != null) tc.addTaskCompletionListener[Unit](_ => closeAll())
        new Iterator[Row] {
          private def failing[A](body: => A): A =
            try body catch {
              case e: Exception =>
                closeAll()
                throw new IllegalArgumentException(
                  s"$path: corrupt or incompatible Avro container", e)
            }
          def hasNext: Boolean = open && {
            val h = failing(reader.hasNext)
            if (!h) closeAll()
            h
          }
          def next(): Row = {
            if (!hasNext) throw new NoSuchElementException(path)
            val rec = failing(reader.next())
            Row.fromSeq(names.indices.map { i =>
              types(i) match {
                case StringType => String.valueOf(rec.get(i))
                case _ => rec.get(i)
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, schema)
  }

  /** Write `df` as one Avro container per partition under `dir`
    * (`part-<p>.avro`, null codec) — the partitioned TextSink shape.
    * Local-filesystem paths (the fixture/test posture; a cluster
    * deployment points this at shared storage).
    *
    * Overwrite semantics: any pre-existing `part-*.avro` under `dir`
    * is deleted FIRST (driver-side), so a re-run with fewer partitions
    * cannot leave stale shards that [[read]] would silently include.
    * Each task writes to a dot-prefixed temp file and atomically
    * renames into place, so a torn task attempt never leaves a
    * half-container matching the read glob. Task attempts are not
    * otherwise coordinated — run this sink with speculation off (the
    * local-mode default), as two attempts racing the same rename would
    * both produce complete, identical containers but waste the work.
    */
  def write(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    val schemaJson = avroSchemaFor(schema).toString
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.createDirectories(root)
    val stale = new java.io.File(dir).listFiles()
    if (stale != null)
      stale.filter { f =>
        // temp shards are dot-prefixed (".part-NNNNN.avro.tmp") — strip
        // the dot so crashed-run leftovers are swept too
        val n = f.getName.stripPrefix(".")
        n.startsWith("part-") &&
          (n.endsWith(".avro") || n.endsWith(".avro.tmp"))
      }.foreach(f => java.nio.file.Files.delete(f.toPath))
    df.rdd.mapPartitionsWithIndex { (p, it) =>
      val avroSchema = new Schema.Parser().parse(schemaJson)
      val tmp = new java.io.File(dir, f".part-$p%05d.avro.tmp")
      val dst = new java.io.File(dir, f"part-$p%05d.avro")
      val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avroSchema))
      w.create(avroSchema, tmp)
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(avroSchema)
          schema.fields.indices.foreach(i => rec.put(i, row.get(i)))
          w.append(rec)
        }
      } finally w.close()
      java.nio.file.Files.move(tmp.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      Iterator.single(p)
    }.count() // one job runs the sink
    ()
  }
}
