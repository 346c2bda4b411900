package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** STREAMING read of [[GraftAvro]] container files (SURVEY.md §2.1 —
  * the reference's flink-avro feeds streaming pipelines through
  * AvroFormatFactory's DeserializationSchema; Spark ships no avro
  * module in this container, so this is a from-scratch DSv2
  * MicroBatchStream playing the FileStreamSource role for the one
  * format Spark's file stream source cannot read):
  *
  *  - an Offset is the SET of container files already processed
  *    (sorted names — the same seen-files contract FileStreamSource
  *    keeps in its log; files are immutable once written, the
  *    format's writer never appends to a published file). GROWTH
  *    BOUND (advisor r10, closed r12): without options the offset
  *    re-serializes every seen name each micro-batch — names carry
  *    no ordering a high-water mark could compact on (UUID-stamped).
  *    `.option("maxFileAgeMs", …)` bounds it the way FileStreamSource
  *    does: names older than (newest mod time − maxFileAge) are
  *    EVICTED from the offset and no longer planned, so the
  *    serialized set holds at most one age-window of names; a file
  *    must land within maxFileAge of the newest file to be read at
  *    all (the documented maxFileAge trade). Directory rolling (the
  *    sink's directory-per-day layouts) remains the zero-trade
  *    alternative;
  *  - each micro-batch plans one InputPartition per NEW file —
  *    distributed, no driver row materialization;
  *  - rows convert GenericRecord → external Row ([[GraftAvro]]'s
  *    recursive converters, nested records included) → InternalRow
  *    via the Catalyst converter for the declared schema.
  *
  * Usage: `spark.readStream.format(classOf[AvroStreamProvider]
  * .getName).load(dir)` — schema inferred from the first file's
  * header, or supplied with `.schema(...)` for a not-yet-populated
  * directory (what the DDL facade passes from the declared columns).
  */
class AvroStreamProvider extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val dir = AvroStreamProvider.pathOf(options)
    val files = GraftAvro.listFiles(dir)
    require(files.nonEmpty,
      s"avro stream: no .avro files under $dir to infer a schema from — " +
        "declare the schema explicitly (.schema(...) / DDL columns)")
    GraftAvro.structType(
      new org.apache.avro.Schema.Parser().parse(
        GraftAvro.headerSchemaJson(files.head)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new AvroStreamProvider.AvroTable(schema,
      AvroStreamProvider.pathOf(opts),
      Option(opts.get("maxFileAgeMs")).map(_.toLong))
  }

  override def supportsExternalMetadata(): Boolean = true
}

object AvroStreamProvider {

  private def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "avro stream: a path is required")
    p
  }

  private final class AvroTable(declared: StructType, dir: String,
                                maxFileAgeMs: Option[Long])
      extends Table with SupportsRead {
    override def name(): String = s"avro-stream($dir)"
    override def schema(): StructType = declared
    override def capabilities(): java.util.Set[TableCapability] =
      java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
    override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
      () => new AvroScan(declared, dir, maxFileAgeMs)
  }

  private final class AvroScan(declared: StructType, dir: String,
                               maxFileAgeMs: Option[Long]) extends Scan {
    override def readSchema(): StructType = declared
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new AvroMicroBatchStream(declared, dir, maxFileAgeMs)
  }

  /** Offset = sorted processed-file names, JSON-encoded, plus the age
    * cutoff (epoch ms) files older than which have been EVICTED from
    * the set — the r12 compaction closing the advisor's growth bound:
    * with `maxFileAgeMs` set, the serialized offset holds only names
    * younger than (newest mod time − maxFileAge), exactly
    * FileStreamSource's maxFileAge contract. The legacy bare-array
    * JSON form deserializes with cutoff 0 (no eviction), so existing
    * checkpoints resume unchanged. */
  private final case class AvroOffset(files: Seq[String],
                                      cutoffMs: Long = 0L) extends Offset {
    override def json(): String = {
      val arr =
        files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
          .mkString("[", ",", "]")
      if (cutoffMs == 0L) arr else s"""{"cut":$cutoffMs,"files":$arr}"""
    }
  }

  private object AvroOffset {
    private val strRe = """"((?:[^"\\]|\\.)*)"""".r
    private val cutRe = """"cut"\s*:\s*(\d+)""".r
    def fromJson(s: String): AvroOffset = {
      val cut = cutRe.findFirstMatchIn(s).map(_.group(1).toLong).getOrElse(0L)
      // both forms carry the names as the (only) JSON array — scan
      // from its '[' so the object form's keys are never mis-read
      val arrStart = s.indexOf('[')
      val body = if (arrStart >= 0) s.substring(arrStart) else "[]"
      AvroOffset(strRe.findAllMatchIn(body).map(
        _.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq, cut)
    }
  }

  private final class AvroMicroBatchStream(declared: StructType, dir: String,
                                           maxFileAgeMs: Option[Long])
      extends MicroBatchStream {
    override def initialOffset(): Offset = AvroOffset(Seq.empty)
    override def latestOffset(): Offset = maxFileAgeMs match {
      case None => AvroOffset(GraftAvro.listFiles(dir))
      case Some(age) =>
        val listed = GraftAvro.listFilesWithMtime(dir)
        if (listed.isEmpty) AvroOffset(Seq.empty)
        else {
          // files that aged past the cutoff are evicted from the
          // offset AND no longer planned — a file must land within
          // maxFileAge of the newest file to be read at all
          // (FileStreamSource's documented maxFileAge semantics)
          val cut = math.max(0L, listed.map(_._2).max - age)
          AvroOffset(listed.collect { case (f, m) if m >= cut => f }, cut)
        }
    }
    override def deserializeOffset(json: String): Offset =
      AvroOffset.fromJson(json)
    override def commit(end: Offset): Unit = ()
    override def stop(): Unit = ()
    override def planInputPartitions(start: Offset,
                                     end: Offset): Array[InputPartition] = {
      val seen = start.asInstanceOf[AvroOffset].files.toSet
      val fresh = end.asInstanceOf[AvroOffset].files.filterNot(seen)
      if (fresh.isEmpty) return Array.empty
      // the executor resolves each file against its OWN header at open
      // time (per-file schema correctness with zero extra driver I/O —
      // review r10)
      fresh.map(f => AvroFilePartition(f, declared): InputPartition).toArray
    }
    override def createReaderFactory(): PartitionReaderFactory =
      new AvroReaderFactory
  }

  private final case class AvroFilePartition(file: String,
                                             declared: StructType)
      extends InputPartition

  private final class AvroReaderFactory extends PartitionReaderFactory {
    override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
      val part = p.asInstanceOf[AvroFilePartition]
      val toInternal =
        CatalystTypeConverters.createToCatalystConverter(part.declared)
      val (rows, closer) =
        GraftAvro.openFileRows(part.file, part.declared)
      new PartitionReader[InternalRow] {
        private var cur: InternalRow = _
        override def next(): Boolean = {
          if (!rows.hasNext) return false
          cur = toInternal(rows.next()).asInstanceOf[InternalRow]
          true
        }
        override def get(): InternalRow = cur
        // a cancelled/limited read must release the file handle —
        // exhaustion-close alone leaks it (review r10)
        override def close(): Unit = closer()
      }
    }
  }
}
