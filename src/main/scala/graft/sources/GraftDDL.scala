package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Minimal SQL DDL facade (SURVEY.md §2.1/§2.9 —
  * flink-sql-parser/.../ddl/SqlCreateTable.java,
  * SqlWatermark.java:39): maps
  *
  *   CREATE TABLE name (col TYPE, ...,
  *     computed AS <sql expr>,          -- computed column (SqlCreateTable)
  *     pt AS PROCTIME(),                -- proctime attribute
  *     PRIMARY KEY (k) NOT ENFORCED,    -- upsert-sink key (parsed, exposed)
  *     WATERMARK FOR ts AS ts - INTERVAL '5' SECOND)
  *   WITH ('connector'='filesystem', 'path'='...', 'format'='parquet',
  *         'mode'='streaming')
  *
  * onto a Spark DataSource read (or readStream when mode=streaming)
  * with the watermark applied, registered as a temp view — the
  * DDL→connector binding the reference's catalog performs. Only the
  * filesystem connector exists here (no network in this container);
  * the parse/bind/register pipeline is the real surface.
  */
object GraftDDL {

  private val createRe =
    """(?is)\s*CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(\w+)\s*\((.+)\)\s*WITH\s*\((.+)\)\s*;?\s*""".r
  private val watermarkRe =
    """(?is)WATERMARK\s+FOR\s+(\w+)\s+AS\s+\w+\s*-\s*INTERVAL\s*'(\d+)'\s*(\w+)""".r
  private val propRe = """'([^']+)'\s*=\s*'([^']*)'""".r
  private val computedRe = """(?is)^(\w+)\s+AS\s+(.+)$""".r
  private val pkRe =
    """(?is)^PRIMARY\s+KEY\s*\(([^)]*)\)(\s+NOT\s+ENFORCED)?$""".r

  /** Split a column list on TOP-LEVEL commas only (CAST(x AS T),
    * PROCTIME(), PRIMARY KEY (a, b) keep their internal commas). */
  private def splitCols(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    s.foreach {
      case '(' => depth += 1; sb += '('
      case ')' => depth -= 1; sb += ')'
      case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString.trim
    out.result().filter(_.nonEmpty)
  }

  /** Primary key declared in the DDL (SqlTableConstraint; Flink
    * requires NOT ENFORCED) — the MERGE key of the upsert-sink
    * pattern (see SourcesSpec's foreachBatch upsert). Empty when the
    * DDL declares none. */
  def primaryKey(ddl: String): Seq[String] = ddl match {
    case createRe(_, colsText, _) =>
      splitCols(colsText).collectFirst {
        case pkRe(cols, _) => cols.split(",").map(_.trim).toSeq
      }.getOrElse(Seq.empty)
    case _ => sys.error(s"unsupported DDL: $ddl")
  }

  private val metadataRe =
    """(?is)^(\w+)\s+\w+(?:\(\d+\))?\s+METADATA(?:\s+FROM\s+'([^']+)')?(?:\s+VIRTUAL)?$""".r

  /** Kafka connector metadata keys (ref KafkaDynamicSource.java
    * ReadableMetadata) → the column of the same meaning on Spark's
    * kafka DSv2 relation. */
  private val kafkaMetadata = Map(
    "timestamp" -> "timestamp",
    "partition" -> "partition",
    "offset" -> "offset",
    "topic" -> "topic",
    "headers" -> "headers")

  /** METADATA column bindings of a kafka DDL (SqlCreateTable metadata
    * columns, `ts TIMESTAMP(3) METADATA FROM 'timestamp'`, `off BIGINT
    * METADATA VIRTUAL`): (declared name → Spark kafka column). The
    * declared name defaults to the metadata key when FROM is absent;
    * unknown keys fail loudly (the reference validates the same way).
    * On a cluster these become `df.select(..., col(sparkCol).as(name))`
    * over `readStream.format("kafka")`'s fixed relation schema. */
  def kafkaMetadataColumns(ddl: String): Seq[(String, String)] = ddl match {
    case createRe(_, colsText, _) =>
      splitCols(colsText).collect { case metadataRe(name, from) =>
        val key = Option(from).getOrElse(name).toLowerCase
        name -> kafkaMetadata.getOrElse(key,
          sys.error(s"unsupported kafka metadata key: '$key'"))
      }
    case _ => sys.error(s"unsupported DDL: $ddl")
  }

  /** Parse a CREATE TABLE with `'connector'='kafka'` and return the
    * Spark kafka reader options it binds to (KafkaDynamicSource.java:37
    * analog). The option map is what `readStream.format("kafka")` would
    * receive on a cluster with the connector jar; in this container
    * (no jar, no broker) the binding stops here — spec-locked in
    * SourcesSpec. */
  def kafkaSourceOptions(ddl: String): Map[String, String] = ddl match {
    case createRe(_, _, propsText) =>
      val props = propRe.findAllMatchIn(propsText)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      KafkaConnector.sourceOptions(props)
    case _ => sys.error(s"unsupported DDL: $ddl")
  }

  private val insertRe =
    """(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(SELECT\s+.+)\s*;?\s*""".r
  private val viewRe =
    """(?is)\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(\w+)\s+AS\s+(SELECT\s+.+)\s*;?\s*""".r

  /** Sink bindings captured at CREATE TABLE time: table name →
    * (path, format, declared schema, streaming?), consulted by INSERT. */
  private val sinks = new java.util.concurrent.ConcurrentHashMap[
    String, (String, String, StructType, Boolean)]()

  /** `INSERT INTO|OVERWRITE t SELECT ...` (SqlToOperationConverter's
    * insert path): runs the query against the registered views and
    * writes it through the target's filesystem binding — INTO appends,
    * OVERWRITE replaces, the same two modes the reference's
    * INSERT statements bind to. The target view is refreshed so
    * subsequent reads observe the write. Returns the written rows. */
  def executeInsert(spark: SparkSession, stmt: String): DataFrame = stmt match {
    case insertRe(mode, name, query) =>
      val (path, format, schema, streaming) =
        Option(sinks.get(name.toLowerCase)).getOrElse(
          sys.error(s"INSERT target '$name' has no CREATE TABLE binding"))
      val df = spark.sql(query)
      df.write.format(format)
        .mode(if (mode.equalsIgnoreCase("OVERWRITE")) "overwrite" else "append")
        .save(path)
      // a batch view bound at CREATE time snapshotted the file listing
      // of that moment — re-register so readers observe the write (a
      // streaming target needs no refresh: the file stream source
      // discovers new files by itself)
      if (!streaming) {
        spark.catalog.refreshByPath(path)
        spark.read.schema(schema).format(format).load(path)
          .createOrReplaceTempView(name)
      }
      df
    case _ => sys.error(s"unsupported INSERT: $stmt")
  }

  private val stmtSetRe =
    """(?is)\s*(?:EXECUTE\s+)?(?:BEGIN\s+)?STATEMENT\s+SET\s*;?(.*?)(?:END)\s*;?\s*""".r

  /** `[EXECUTE] [BEGIN] STATEMENT SET; INSERT ...; INSERT ...; END` —
    * the reference's multi-sink statement set
    * (SqlToOperationConverter statement-set path). Each INSERT runs
    * through [[executeInsert]] in order. Delta vs the reference,
    * documented: Flink's planner fuses the statements into one DAG so
    * a shared source is scanned once; here each INSERT plans
    * independently — pre-register a persisted view for the shared
    * input when scan reuse matters. Returns per-statement written
    * counts. */
  def executeStatementSet(spark: SparkSession, stmt: String): Seq[Long] =
    stmt match {
      case stmtSetRe(body) =>
        val inserts = body.split(";").map(_.trim).filter(_.nonEmpty)
        require(inserts.nonEmpty, "empty STATEMENT SET")
        inserts.toSeq.map(s => executeInsert(spark, s).count())
      case _ => sys.error(s"unsupported STATEMENT SET: $stmt")
    }

  /** `CREATE [TEMPORARY] VIEW v AS SELECT ...` (SqlCreateView):
    * registers the query as a temp view over the already-registered
    * tables. */
  def executeView(spark: SparkSession, stmt: String): DataFrame = stmt match {
    case viewRe(name, query) =>
      val df = spark.sql(query)
      df.createOrReplaceTempView(name)
      df
    case _ => sys.error(s"unsupported CREATE VIEW: $stmt")
  }

  private val explainRe =
    """(?is)\s*EXPLAIN\s+(?:PLAN\s+FOR\s+)?(SELECT\s+.+)\s*;?\s*""".r
  private val descRe = """(?is)\s*DESCRIBE\s+(\w+)\s*;?\s*""".r

  /** `EXPLAIN [PLAN FOR] SELECT ...` (SqlRichExplain / the reference's
    * EXPLAIN statement): the optimized + physical plan of the query
    * against the registered views, as Spark's formatted explain. */
  def executeExplain(spark: SparkSession, stmt: String): String = stmt match {
    case explainRe(query) =>
      spark.sql(query).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    case _ => sys.error(s"unsupported EXPLAIN: $stmt")
  }

  /** `DESCRIBE t` → (col_name, data_type, nullable) rows of the
    * registered view (SqlRichDescribeTable analog). */
  def executeDescribe(spark: SparkSession, stmt: String): Seq[(String, String, Boolean)] =
    stmt match {
      case descRe(name) => spark.table(name).schema.fields.toSeq
        .map(f => (f.name, f.dataType.simpleString, f.nullable))
      case _ => sys.error(s"unsupported DESCRIBE: $stmt")
    }

  /** `SHOW TABLES` analog: every temp view currently registered. */
  def showTables(spark: SparkSession): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).sorted.toSeq

  /** Parse + bind + register; returns the bound DataFrame. */
  def execute(spark: SparkSession, ddl: String): DataFrame = ddl match {
    case createRe(name, colsText, propsText) =>
      val props = propRe.findAllMatchIn(propsText)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      require(props.get("connector").forall(_ == "filesystem"),
        s"unsupported connector here: ${props.get("connector")} " +
          "(kafka binds via kafkaSourceOptions; no broker in this container)")
      val path = props.getOrElse("path",
        sys.error("DDL requires a 'path' property"))
      val format = props.getOrElse("format", "parquet")
      val watermark = watermarkRe.findFirstMatchIn(colsText)
        .map(m => (m.group(1), s"${m.group(2)} ${m.group(3).toLowerCase}"))
      val cols = splitCols(colsText)
        .filterNot(c => c.toUpperCase.startsWith("WATERMARK"))
        .filterNot(c => pkRe.findFirstIn(c).isDefined)
      // computed columns (SqlCreateTable `name AS expr`): NOT part of
      // the physical read schema — applied as projections after the
      // load, in declaration order (later ones may reference earlier
      // ones). PROCTIME() maps to current_timestamp(): the processing-
      // time attribute is micro-batch evaluation time here, exactly
      // the reference's proctime semantics one batch at a time.
      val (computedCols, physicalCols) = cols.partition {
        case computedRe(_, _) => true
        case _ => false
      }
      val computed = computedCols.map { case computedRe(n, e) =>
        n -> (if (e.trim.equalsIgnoreCase("PROCTIME()")) "current_timestamp()"
              else e.trim)
      }
      val schema = StructType.fromDDL(physicalCols.mkString(", "))
      val df0 =
        if (props.get("mode").contains("streaming")) {
          // the file stream source monitors a DIRECTORY; a file path
          // becomes its parent dir + a glob on the file name
          val f = new java.io.File(path)
          val (dir, glob) =
            if (f.isFile) (f.getParent, Some(f.getName)) else (path, None)
          val rd = spark.readStream.schema(schema).format(format)
          glob.fold(rd)(g => rd.option("pathGlobFilter", g)).load(dir)
        } else
          spark.read.schema(schema).format(format).load(path)
      // computed columns first: a WATERMARK may be declared on a
      // computed rowtime (the reference's derived-rowtime pattern)
      val df1 = computed.foldLeft(df0) { case (d, (n, e)) =>
        d.withColumn(n, expr(e))
      }
      val df = watermark match {
        case Some((tsCol, delay)) => df1.withWatermark(tsCol, delay)
        case None                 => df1
      }
      df.createOrReplaceTempView(name)
      sinks.put(name.toLowerCase,
        (path, format, schema, props.get("mode").contains("streaming")))
      df
    case _ => sys.error(s"unsupported DDL: $ddl")
  }
}
