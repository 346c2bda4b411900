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
  *    StructType.
  *
  * Type mapping (both directions): boolean/int/long/float/double/
  * string/bytes plus logical timestamp-micros and date, every field a
  * nullable union — the same physical subset the reference's format
  * binds for flat rows. Nested records are out of scope and fail
  * loudly.
  */
object GraftAvro {

  import org.apache.avro.{LogicalTypes, Schema}
  import org.apache.avro.file.{DataFileReader, DataFileWriter}
  import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
  import org.apache.avro.mapred.FsInput
  import org.apache.hadoop.conf.Configuration
  import org.apache.hadoop.fs.{FileSystem, Path}

  private def baseAvroType(dt: DataType): Schema = dt match {
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
    case t => sys.error(s"avro format: unsupported Spark type ${t.simpleString}")
  }

  /** StructType → Avro record schema, every field union(null, T). */
  def avroSchema(st: StructType): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val u = Schema.createUnion(java.util.Arrays.asList(
        Schema.create(Schema.Type.NULL), baseAvroType(f.dataType)))
      fields.add(new Schema.Field(f.name, u, null, Schema.Field.NULL_DEFAULT_VALUE))
    }
    Schema.createRecord("row", null, "graft.avro", false, fields)
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

  /** Avro record schema → StructType (inverse of [[avroSchema]]). */
  def structType(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"avro format: root must be a record, got ${schema.getType}")
    StructType(schema.getFields.toArray(Array.empty[Schema.Field]).map { f =>
      val t = nonNull(f.schema())
      val dt = t.getType match {
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
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => sys.error(s"avro format: unsupported Avro type $other")
      }
      StructField(f.name, dt, nullable = true)
    })
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
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val out = new Path(dir, f"part-$pid%05d-$stamp.avro")
      val taskFs = out.getFileSystem(new Configuration())
      val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, taskFs.create(out, true))
      try it.foreach { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < sparkSchema.length) {
          val v = row.get(i)
          val converted =
            if (v == null) null
            else sparkSchema(i).dataType match {
              case TimestampType =>
                java.lang.Long.valueOf(org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .fromJavaTimestamp(v.asInstanceOf[java.sql.Timestamp]))
              case TimestampNTZType =>
                java.lang.Long.valueOf(org.apache.spark.sql.catalyst.util.DateTimeUtils
                  .localDateTimeToMicros(v.asInstanceOf[java.time.LocalDateTime]))
              case DateType =>
                java.lang.Integer.valueOf(v.asInstanceOf[java.sql.Date].toLocalDate
                  .toEpochDay.toInt)
              case BinaryType => java.nio.ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
              case ShortType =>
                // declared as avro INT — avro's union resolution is
                // `instanceof Integer`, so Short/Byte must widen
                java.lang.Integer.valueOf(v.asInstanceOf[java.lang.Short].intValue)
              case ByteType =>
                java.lang.Integer.valueOf(v.asInstanceOf[java.lang.Byte].intValue)
              case _ => v.asInstanceOf[AnyRef]
            }
          rec.put(i, converted)
          i += 1
        }
        w.append(rec)
      } finally w.close()
    }
  }

  /** Any container files under `dir` yet? (A freshly-created sink
    * table has none — its view is an empty frame of the declared
    * schema until the first INSERT.) */
  def hasFiles(dir: String): Boolean = {
    val root = new Path(dir)
    val fs = root.getFileSystem(new Configuration())
    fs.exists(root) && fs.listStatus(root).exists(_.getPath.getName.endsWith(".avro"))
  }

  /** Distributed read: one Spark partition per container file. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new Configuration()
    val root = new Path(dir)
    val fs = root.getFileSystem(conf)
    val files = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.endsWith(".avro")).map(_.toString).sorted
    require(files.nonEmpty, s"avro format: no .avro files under $dir")
    // schema off the first file's header (every file written by this
    // format carries the same one)
    val header = new DataFileReader[GenericRecord](
      new FsInput(new Path(files.head), conf),
      new GenericDatumReader[GenericRecord]())
    val schemaJson = try header.getSchema.toString finally header.close()
    val sparkSchema = structType(new Schema.Parser().parse(schemaJson))
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, files.length)
      .flatMap { file =>
        val schema = new Schema.Parser().parse(schemaJson)
        val r = new DataFileReader[GenericRecord](
          new FsInput(new Path(file), new Configuration()),
          new GenericDatumReader[GenericRecord](schema))
        new Iterator[Row] {
          def hasNext: Boolean = { val h = r.hasNext; if (!h) r.close(); h }
          def next(): Row = {
            val rec = r.next()
            Row.fromSeq(sparkSchema.fields.indices.map { i =>
              val v = rec.get(i)
              if (v == null) null
              else sparkSchema(i).dataType match {
                case TimestampType =>
                  org.apache.spark.sql.catalyst.util.DateTimeUtils
                    .toJavaTimestamp(v.asInstanceOf[java.lang.Long])
                case DateType =>
                  java.sql.Date.valueOf(
                    java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue()))
                case StringType => v.toString
                case BinaryType =>
                  val bb = v.asInstanceOf[java.nio.ByteBuffer]
                  val arr = new Array[Byte](bb.remaining()); bb.get(arr); arr
                case _ => v
              }
            })
          }
        }
      }
    spark.createDataFrame(rows, sparkSchema)
  }
}
