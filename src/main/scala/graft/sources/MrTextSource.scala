package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 reader for the engine's OWN partitioned text sink layout
  * ([[graft.operators.TextSink]] — the reference's A10 `result-<p>.txt`
  * files, lines `"key: value"`, partition = djb2(key) % P). This closes
  * the loop on the reference's storage contract: what the MR shim
  * writes is a first-class queryable table, read WITHOUT re-listing
  * into a full scan —
  *
  *   spark.read.format("graft-mrtext").load(dir)
  *     .filter($"part" === 3)          // reads ONLY result-3.txt
  *
  * Pushdown surface:
  *  - PARTITION PRUNING: filters that reference only the `part` column
  *    (=, IN, <, <=, >, >=) are consumed at planning time and prune
  *    whole FILES — the moral equivalent of Hive partition pruning,
  *    exploiting the sink invariant that file p holds exactly the keys
  *    with djb2(key) % P == p. All other filters are left as residuals
  *    for Spark to evaluate (correctness never depends on pushdown).
  *  - COLUMN PRUNING: the reader materializes only requested columns
  *    (`part`-only scans never even split the line).
  *
  * One InputPartition per file — the sink's partition is the unit of
  * parallelism, as in the reference. Keys cannot contain the `": "`
  * separator (sink keys are tokens; documented contract), so the first
  * occurrence splits key from value.
  */
class MrTextSource extends TableProvider with org.apache.spark.sql.sources.DataSourceRegister {
  override def shortName(): String = "graft-mrtext"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    MrTextSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new MrTextTable(properties.get("path"))
}

object MrTextSource {
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("value", StringType),
    StructField("part", IntegerType, nullable = false)))

  private val FileRe = "result-(\\d+)\\.txt".r

  /** Test instrumentation: file paths actually opened by readers in this
    * JVM (local mode) — the pruning spec proves non-selected partitions
    * were never read. Not part of the source's contract.
    */
  private[graft] val openedFiles: util.Set[String] =
    ConcurrentHashMap.newKeySet[String]()

  private[sources] def partOf(name: String): Option[Int] = name match {
    case FileRe(p) => Some(p.toInt)
    case _ => None
  }
}

private[sources] class MrTextTable(path: String) extends Table with SupportsRead {
  require(path != null, "graft-mrtext requires a path (load(dir))")
  override def name(): String = s"graft-mrtext:$path"
  override def schema(): StructType = MrTextSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MrTextScanBuilder(path)
}

private[sources] class MrTextScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = MrTextSource.Schema

  /** Consume filters that reference ONLY `part`; everything else stays
    * with Spark. Conjunction semantics: a file survives only if every
    * consumed filter accepts its partition id.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ours, residual) = filters.partition(f =>
      f.references.sameElements(Array("part")) && interp(f).isDefined)
    pushed = ours
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  private def interp(f: Filter): Option[Int => Boolean] = f match {
    case EqualTo("part", v: Int) => Some(_ == v)
    case In("part", vs) if vs.forall(_.isInstanceOf[Int]) =>
      val s = vs.map(_.asInstanceOf[Int]).toSet; Some(s.contains)
    case LessThan("part", v: Int) => Some(_ < v)
    case LessThanOrEqual("part", v: Int) => Some(_ <= v)
    case GreaterThan("part", v: Int) => Some(_ > v)
    case GreaterThanOrEqual("part", v: Int) => Some(_ >= v)
    case _ => None
  }

  override def build(): Scan = {
    val preds = pushed.flatMap(interp)
    new MrTextScan(path, required, p => preds.forall(_(p)))
  }
}

private[sources] class MrTextScan(path: String, required: StructType,
    keep: Int => Boolean) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val dir = new java.io.File(path)
    // Fail loudly like the built-in sources do: listFiles() returns null
    // for a nonexistent, non-directory, or unlistable path, and mapping
    // that to "0 rows" silently swallows typos and — because this reader
    // is java.io local-FS only, unlike the Hadoop-FS sink paths used
    // elsewhere — any hdfs:// or s3:// URI a user might reasonably pass.
    require(dir.isDirectory,
      s"graft-mrtext path is not a listable local directory: $path " +
        "(the reader is local-filesystem-only; remote URIs are not supported)")
    val files = Option(dir.listFiles()).getOrElse(
      throw new IllegalArgumentException(s"cannot list graft-mrtext dir: $path"))
    files.toSeq
      .flatMap(f => MrTextSource.partOf(f.getName).map(p => (p, f.getPath)))
      .filter { case (p, _) => keep(p) }
      .sortBy(_._1)
      .map { case (p, f) => MrTextPartition(p, f): InputPartition }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new MrTextReaderFactory(required)
}

private[sources] case class MrTextPartition(part: Int, file: String) extends InputPartition

private[sources] class MrTextReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[MrTextPartition]
    MrTextSource.openedFiles.add(p.file)
    new PartitionReader[InternalRow] {
      private val lines = java.nio.file.Files.newBufferedReader(
        java.nio.file.Paths.get(p.file), java.nio.charset.StandardCharsets.UTF_8)
      private var line: String = _
      // column pruning: a part-only projection never splits the line
      private val wantKey = required.fieldNames.contains("key")
      private val wantValue = required.fieldNames.contains("value")
      private val fields: Array[String] = required.fieldNames

      override def next(): Boolean = { line = lines.readLine(); line != null }

      override def get(): InternalRow = {
        var key: UTF8String = null
        var value: UTF8String = null
        if (wantKey || wantValue) {
          val i = line.indexOf(": ")
          require(i >= 0, s"malformed mrtext line in ${p.file}: $line")
          if (wantKey) key = UTF8String.fromString(line.substring(0, i))
          if (wantValue) value = UTF8String.fromString(line.substring(i + 2))
        }
        InternalRow.fromSeq(fields.toSeq.map {
          case "key" => key
          case "value" => value
          case "part" => p.part
        })
      }

      override def close(): Unit = lines.close()
    }
  }
}
