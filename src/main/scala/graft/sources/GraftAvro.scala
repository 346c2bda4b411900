package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro FORMAT for the DDL facade (SURVEY.md §2.1 —
  * `flink-formats/flink-avro/.../AvroFormatFactory.java`; earlier
  * rounds DE-SCOPED this because `/opt/spark/jars` ships no
  * `spark-avro` data source MODULE — but it DOES ship avro-core
  * 1.12, which is all a format needs). This is a from-scratch
  * implementation over the generic-record API:
  *
  *  - write: each DataFrame partition serializes itself to one
  *    container file under the target directory through the Hadoop
  *    FileSystem API (task-side, distributed — no driver collect;
  *    works the same on file:// here and hdfs:// on a cluster);
  *  - read: file list → one Spark partition per container file →
  *    DataFileReader streams records off the FS; the Avro schema is
  *    read once from the first file's header and mapped back to a
  *    StructType. Streaming read = [[AvroStreamProvider]] (DSv2
  *    MicroBatchStream over the same container files, r10).
  *
  * Type mapping (both directions, RECURSIVE as of r10 — the
  * reference's flink-avro AvroSchemaConverter maps nested rows,
  * arrays, and maps the same way): boolean/int/long/float/double/
  * string/bytes plus logical timestamp-micros and date, records ↔
  * structs, arrays ↔ arrays, string-keyed maps ↔ maps — every field
  * and element a nullable union.
  */
object GraftAvro {

  import org.apache.avro.{LogicalTypes, Schema}
  import org.apache.avro.file.{DataFileReader, DataFileWriter}
  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
  import org.apache.avro.mapred.FsInput
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.{FileSystem, Path}

  private def nullable(s: Schema): Schema =
    Schema.createUnion(java.util.Arrays.asList(
      Schema.create(Schema.Type.NULL), s))

  /** Spark type → Avro schema, recursive; nested record names come
    * from `fresh` (Avro requires unique names within one schema). */
  private def avroType(dt: DataType, fresh: () => String): Schema = dt match {
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case IntegerType | ShortType | ByteType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType | TimestampNTZType =>
      LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
    case DateType =>
      LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
    case st: StructType => recordSchema(st, fresh(), fresh)
    case ArrayType(elem, _) =>
      Schema.createArray(nullable(avroType(elem, fresh)))
    case MapType(StringType, v, _) =>
      Schema.createMap(nullable(avroType(v, fresh)))
    case t => sys.error(s"avro format: unsupported Spark type ${t.simpleString}")
  }

  private def recordSchema(st: StructType, name: String,
                           fresh: () => String): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      fields.add(new Schema.Field(f.name, nullable(avroType(f.dataType, fresh)),
        null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord(name, null, "graft.avro", false, fields)
  }

  /** StructType → Avro record schema, every field union(null, T). */
  def avroSchema(st: StructType): Schema = {
    var n = 0
    def fresh(): String = { n += 1; s"r$n" }
    recordSchema(st, "row", () => fresh())
  }

  private def nonNull(s: Schema): Schema = s.getType match {
    case Schema.Type.UNION =>
      val ts = s.getTypes
      val it = ts.iterator()
      var out: Schema = null
      while (it.hasNext) { val t = it.next(); if (t.getType != Schema.Type.NULL) out = t }
      if (out == null) sys.error(s"avro format: union of only null: $s")
      out
    case _ => s
  }

  /** Avro schema → Spark type (inverse of [[avroType]], recursive). */
  private def sparkType(s0: Schema): DataType = {
    val t = nonNull(s0)
    t.getType match {
      case Schema.Type.BOOLEAN => BooleanType
      case Schema.Type.INT =>
        if (t.getLogicalType != null &&
          t.getLogicalType.getName == "date") DateType else IntegerType
      case Schema.Type.LONG =>
        if (t.getLogicalType != null &&
          t.getLogicalType.getName.startsWith("timestamp")) TimestampType
        else LongType
      case Schema.Type.FLOAT => FloatType
      case Schema.Type.DOUBLE => DoubleType
      case Schema.Type.STRING | Schema.Type.ENUM => StringType
      case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
      case Schema.Type.RECORD => structType(t)
      case Schema.Type.ARRAY => ArrayType(sparkType(t.getElementType))
      case Schema.Type.MAP => MapType(StringType, sparkType(t.getValueType))
      case other => sys.error(s"avro format: unsupported Avro type $other")
    }
  }

  /** Avro record schema → StructType (inverse of [[avroSchema]]). */
  def structType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"avro format: root must be a record, got ${schema.getType}")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      StructField(f.name, sparkType(f.schema()), nullable = true)
    })
  }

  // ---- value conversion (recursive, null-preserving) --------------

  /** Spark EXTERNAL value (Row/Seq/Map/java.sql.*) → Avro generic
    * value of the matching (non-null branch of) `sch0`. */
  private def toAvroConv(dt: DataType, sch0: Schema): Any => AnyRef = {
    val sch = nonNull(sch0)
    dt match {
      case TimestampType => v =>
        java.lang.Long.valueOf(org.apache.spark.sql.catalyst.util.DateTimeUtils
          .fromJavaTimestamp(v.asInstanceOf[java.sql.Timestamp]))
      case TimestampNTZType => v =>
        java.lang.Long.valueOf(org.apache.spark.sql.catalyst.util.DateTimeUtils
          .localDateTimeToMicros(v.asInstanceOf[java.time.LocalDateTime]))
      case DateType => v =>
        java.lang.Integer.valueOf(
          v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
      case BinaryType => v =>
        java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      // declared as avro INT — avro's union resolution is
      // `instanceof Integer`, so Short/Byte must widen
      case ShortType => v =>
        java.lang.Integer.valueOf(v.asInstanceOf[java.lang.Short].intValue)
      case ByteType => v =>
        java.lang.Integer.valueOf(v.asInstanceOf[java.lang.Byte].intValue)
      case st: StructType =>
        val convs = st.fields.zipWithIndex.map { case (f, i) =>
          toAvroConv(f.dataType, sch.getFields.get(i).schema())
        }
        v => {
          val row = v.asInstanceOf[Row]
          val rec = new GenericData.Record(sch)
          var i = 0
          while (i < convs.length) {
            val x = row.get(i)
            rec.put(i, if (x == null) null else convs(i)(x))
            i += 1
          }
          rec
        }
      case ArrayType(elem, _) =>
        val c = toAvroConv(elem, sch.getElementType)
        v => {
          val xs = v.asInstanceOf[scala.collection.Seq[Any]]
          val out = new java.util.ArrayList[AnyRef](xs.size)
          xs.foreach(x => out.add(if (x == null) null else c(x)))
          out
        }
      case MapType(_, mv, _) =>
        val c = toAvroConv(mv, sch.getValueType)
        v => {
          val m = v.asInstanceOf[scala.collection.Map[String, Any]]
          val out = new java.util.HashMap[String, AnyRef]()
          m.foreach { case (k, x) =>
            out.put(k, if (x == null) null else c(x))
          }
          out
        }
      case _ => v => v.asInstanceOf[AnyRef]
    }
  }

  /** Avro generic value → Spark EXTERNAL value of `dt`; `sch0` is the
    * WRITER schema of the value (logical-type aware: a foreign
    * timestamp-millis scales to micros instead of being misread
    * 1000× off — review r10). */
  private def fromAvroConv(dt: DataType, sch0: Schema): Any => Any = {
    val sch = nonNull(sch0)
    def tsMicros(v: Any): Long = {
      val raw = v.asInstanceOf[java.lang.Long].longValue()
      if (sch.getLogicalType != null &&
          sch.getLogicalType.getName.endsWith("millis")) raw * 1000L
      else raw
    }
    dt match {
      case TimestampType => v =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .toJavaTimestamp(tsMicros(v))
      case TimestampNTZType => v =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .microsToLocalDateTime(tsMicros(v))
      case DateType => v =>
        java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(
          v.asInstanceOf[java.lang.Integer].longValue()))
      case StringType => v => v.toString // Utf8 → String
      // a DECLARED streaming schema may narrow avro INT back to the
      // declared type (the writer widens Short/Byte at write time —
      // see toAvroConv); out-of-range foreign values fail LOUDLY
      // instead of wrapping (review r10)
      case ShortType => v =>
        val n = v.asInstanceOf[java.lang.Number].intValue()
        require(n >= Short.MinValue && n <= Short.MaxValue,
          s"avro format: value $n overflows declared SMALLINT")
        java.lang.Short.valueOf(n.toShort)
      case ByteType => v =>
        val n = v.asInstanceOf[java.lang.Number].intValue()
        require(n >= Byte.MinValue && n <= Byte.MaxValue,
          s"avro format: value $n overflows declared TINYINT")
        java.lang.Byte.valueOf(n.toByte)
      case BinaryType => {
        // BYTES decodes as ByteBuffer, FIXED as GenericFixed — both
        // land in BinaryType (sparkType maps FIXED there too)
        case bb: java.nio.ByteBuffer =>
          val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
        case fx: org.apache.avro.generic.GenericFixed => fx.bytes().clone()
        case other => sys.error(
          s"avro format: unexpected binary value ${other.getClass.getName}")
      }
      case st: StructType =>
        // resolve nested fields BY NAME against the writer schema,
        // mirroring the top-level contract (a schema-evolved writer
        // may order nested fields differently — positional pairing
        // would silently misread them; advisor r10)
        val writerPos = st.fields.map { f =>
          val wf = sch.getField(f.name)
          require(wf != null, s"avro format: nested field '${f.name}' " +
            s"missing from writer record schema ${sch.getFullName}")
          wf.pos()
        }
        val convs = st.fields.zipWithIndex.map { case (f, i) =>
          fromAvroConv(f.dataType, sch.getFields.get(writerPos(i)).schema())
        }
        v => {
          val rec = v.asInstanceOf[GenericRecord]
          Row.fromSeq(st.fields.indices.map { i =>
            val x = rec.get(writerPos(i))
            if (x == null) null else convs(i)(x)
          })
        }
      case ArrayType(elem, _) =>
        val c = fromAvroConv(elem, sch.getElementType)
        v => {
          val xs = v.asInstanceOf[java.util.List[AnyRef]]
          val out = Vector.newBuilder[Any]
          val it = xs.iterator()
          while (it.hasNext) {
            val x = it.next()
            out += (if (x == null) null else c(x))
          }
          out.result()
        }
      case MapType(_, mv, _) =>
        val c = fromAvroConv(mv, sch.getValueType)
        v => {
          val m = v.asInstanceOf[java.util.Map[AnyRef, AnyRef]]
          val out = Map.newBuilder[String, Any]
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            out += e.getKey.toString ->
              (if (e.getValue == null) null else c(e.getValue))
          }
          out.result()
        }
      case _ => identity
    }
  }

  /** Distributed write: one container file per partition under `dir`.
    * `overwrite` clears the directory first (the INSERT OVERWRITE
    * semantics); append just adds files (INSERT INTO). */
  def write(df: DataFrame, dir: String, overwrite: Boolean): Unit = {
    val sparkSchema = df.schema
    val schemaJson = avroSchema(sparkSchema).toString
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    if (overwrite && fs.exists(root)) fs.delete(root, true)
    fs.mkdirs(root)
    val stamp = java.util.UUID.randomUUID().toString.take(8)
    df.rdd.foreachPartition { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val convs = sparkSchema.fields.zipWithIndex.map { case (f, i) =>
        toAvroConv(f.dataType, schema.getFields.get(i).schema())
      }
      val tc = org.apache.spark.TaskContext.get()
      val pid = tc.partitionId()
      val out = new Path(dir, f"part-$pid%05d-$stamp.avro")
      // write under an ATTEMPT-unique temp name, publish by rename: a
      // concurrent STREAMING reader ([[AvroStreamProvider]]) lists
      // only *.avro, so it can never observe a half-written container,
      // and a speculative/retried attempt writes its own tmp instead
      // of interleaving into a sibling's (the same atomic-publish
      // convention file stream sinks rely on)
      val tmp = new Path(dir, out.getName + s".${tc.taskAttemptId()}.tmp")
      val taskFs = out.getFileSystem(new Configuration())
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, taskFs.create(tmp, true))
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            val v = row.get(i)
            rec.put(i, if (v == null) null else convs(i)(v))
            i += 1
          }
          w.append(rec)
        }
      } finally w.close()
      if (!taskFs.rename(tmp, out)) {
        // a racing attempt of this partition may have published first
        // (rename refuses an existing destination on HDFS semantics):
        // the data is identical, so tolerate and drop our tmp
        require(taskFs.exists(out),
          s"avro format: failed to publish $tmp -> $out")
        taskFs.delete(tmp, false)
        ()
      }
    }
    // sweep dead attempts' tmp litter AFTER the job completes (a
    // killed attempt can't clean up after itself): the driver-side
    // pass runs when every task attempt — speculative ones included —
    // has finished, so it can't yank a tmp out from under a
    // still-writing attempt the way the old in-task sweep could
    // (advisor r10). Scoped to THIS job's stamp — a blanket *.tmp
    // glob would delete a concurrently-appending job's in-flight
    // attempts in the same directory (review r11). One glob, best
    // effort.
    fs.globStatus(new Path(dir, s"*-$stamp.avro.*.tmp"))
      .foreach(st => fs.delete(st.getPath, false))
  }

  /** Any container files under `dir` yet? (A freshly-created sink
    * table has none — its view is an empty frame of the declared
    * schema until the first INSERT.) */
  def hasFiles(dir: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(new Configuration())
    fs.exists(root) && fs.listStatus(root).exists(_.getPath.getName.endsWith(".avro"))
  }

  /** Current .avro files under `dir`, sorted (shared with the
    * streaming source's per-batch listing). */
  private[sources] def listFiles(dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(new Configuration())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted.toSeq
  }

  /** [[listFiles]] with modification times — the age dimension the
    * streaming source's offset compaction evicts on (r12). */
  private[sources] def listFilesWithMtime(dir: String): Seq[(String, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(new Configuration())
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root)
      .filter(_.getPath.getName.endsWith(".avro"))
      .map(st => (st.getPath.toString, st.getModificationTime))
      .sortBy(_._1).toSeq
  }

  /** The avro-header schema of the first file (all files written by
    * this format carry the same one). */
  private[sources] def headerSchemaJson(file: String): String = {
    val header = new DataFileReader[GenericRecord](
      new FsInput(new Path(file), new Configuration()),
      new GenericDatumReader[GenericRecord]())
    try header.getSchema.toString finally header.close()
  }

  /** Iterator of EXTERNAL Rows from one container file — the shared
    * per-file scan of the batch read and the streaming source. Fields
    * resolve BY NAME against the file's writer schema (the streaming
    * source reads into a DECLARED schema whose order may differ from
    * a foreign writer's; extra writer fields are ignored, a missing
    * one is loud). */
  private[sources] def openFileRows(file: String,
                                    sparkSchema: StructType)
      : (Iterator[Row], () => Unit) = {
    // ONE open per file: the reader's own header supplies the writer
    // schema (per-file, so a schema-evolved sibling in the same batch
    // resolves against ITS schema — review r10), columns resolve by
    // NAME against the declared schema
    val r = new DataFileReader[GenericRecord](
      new FsInput(new Path(file), new Configuration()),
      new GenericDatumReader[GenericRecord]())
    val schema = r.getSchema
    val pos = sparkSchema.fields.map { f =>
      val wf = schema.getField(f.name)
      require(wf != null,
        s"avro format: declared column '${f.name}' not in $file's schema")
      wf.pos()
    }
    val convs = sparkSchema.fields.map { f =>
      fromAvroConv(f.dataType,
        schema.getField(f.name).schema())
    }
    val it = new Iterator[Row] {
      def hasNext: Boolean = { val h = r.hasNext; if (!h) r.close(); h }
      def next(): Row = {
        val rec = r.next()
        Row.fromSeq(sparkSchema.fields.indices.map { i =>
          val v = rec.get(pos(i))
          if (v == null) null else convs(i)(v)
        })
      }
    }
    (it, () => r.close())
  }

  /** Exhaustion-closing iterator for the batch RDD path; a partially
    * consumed task (limit, cancellation) closes at task completion —
    * the reader must not leak its file handle (review r10). */
  private[sources] def fileRows(file: String,
                                sparkSchema: StructType): Iterator[Row] = {
    val (it, close) = openFileRows(file, sparkSchema)
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => close()))
    it
  }

  /** Distributed read: one Spark partition per container file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val files = listFiles(dir)
    require(files.nonEmpty, s"avro format: no .avro files under $dir")
    val schemaJson = headerSchemaJson(files.head)
    val sparkSchema = structType(new Schema.Parser().parse(schemaJson))
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap(file => fileRows(file, sparkSchema))
    spark.createDataFrame(rows, sparkSchema)
  }
}
