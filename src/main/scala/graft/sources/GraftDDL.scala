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

  import graft.sources.{SqlText => S}

  /** Structural CREATE TABLE recognition on the [[SqlText]] token
    * model (round 7 — the old `(.+)`-based regex mis-lexed comments
    * inside the column list, quoted identifiers, and property values
    * containing `WITH (`): CREATE [TEMPORARY] TABLE <name> ( cols )
    * WITH ( props ), the parens matched structurally, the fragments
    * re-rendered comment-free for the per-item parsers below. Returns
    * (name, colsText, propsText) or None when the statement is not a
    * CREATE TABLE at all (callers fail loudly with their own shape). */
  private def createStructure(ddl: String): Option[(String, String, String)] = {
    val toks = S.lex(ddl)
    def at(i: Int, kw: String) = i < toks.length && toks(i).is(kw)
    var i = 0
    if (!at(i, "CREATE")) return None
    i += 1
    if (at(i, "TEMPORARY")) i += 1
    if (!at(i, "TABLE")) return None
    i += 1
    if (i >= toks.length ||
      (toks(i).kind != S.Ident && toks(i).kind != S.QIdent)) return None
    val name = toks(i).ident
    i += 1
    if (i >= toks.length || toks(i).text != "(") return None
    val closeCols = S.closeParen(toks, i)
    val colsText = S.render(toks.slice(i + 1, closeCols))
    var j = closeCols + 1
    if (!at(j, "WITH")) return None
    j += 1
    if (j >= toks.length || toks(j).text != "(") return None
    val closeProps = S.closeParen(toks, j)
    val propsText = S.render(toks.slice(j + 1, closeProps))
    val tail = toks.drop(closeProps + 1)
    require(tail.isEmpty || (tail.length == 1 && tail.head.text == ";"),
      s"unsupported trailing text after CREATE TABLE: ${S.render(tail)}")
    Some((name, colsText, propsText))
  }

  /** Regex-shaped view of [[createStructure]] so the existing
    * per-fragment extractors keep their match-style call sites. */
  private object createRe {
    def unapply(ddl: String): Option[(String, String, String)] =
      createStructure(ddl)
  }
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
    """(?is)\s*INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(SELECT\s+.+?)\s*;?\s*""".r
  private val viewRe =
    """(?is)\s*CREATE\s+(?:TEMPORARY\s+)?VIEW\s+(\w+)\s+AS\s+(SELECT\s+.+)\s*;?\s*""".r

  /** The full CREATE TABLE binding, captured once and replayed on every
    * re-registration: computed columns and the watermark are part of
    * the table's identity, so a post-INSERT refresh must re-apply them
    * (a bare `spark.read.load(path)` view would silently drop a
    * computed PROCTIME or a WATERMARK after the first INSERT). */
  private final case class Binding(path: String, format: String,
                                   schema: StructType, streaming: Boolean,
                                   computed: Seq[(String, String)],
                                   watermark: Option[(String, String)])

  /** Sink bindings captured at CREATE TABLE time, consulted by INSERT. */
  private val sinks =
    new java.util.concurrent.ConcurrentHashMap[String, Binding]()

  /** Rowtime (version) column of a DDL-registered table: the column its
    * WATERMARK was declared on — what `FOR SYSTEM_TIME AS OF` versions
    * against (the reference reads the same attribute off its catalog). */
  def rowtimeOf(table: String): Option[String] =
    Option(sinks.get(table.toLowerCase)).flatMap(_.watermark.map(_._1))

  /** Read the binding's source and register it as the temp view `name`
    * — the single registration path shared by CREATE TABLE and the
    * post-INSERT refresh, so both observe identical computed-column and
    * watermark semantics. */
  private def register(spark: SparkSession, name: String, b: Binding): DataFrame = {
    val df0 =
      if (b.streaming) {
        // the file stream source monitors a DIRECTORY; a file path
        // becomes its parent dir + a glob on the file name
        val f = new java.io.File(b.path)
        val (dir, glob) =
          if (f.isFile) (f.getParent, Some(f.getName)) else (b.path, None)
        val rd = spark.readStream.schema(b.schema).format(b.format)
        glob.fold(rd)(g => rd.option("pathGlobFilter", g)).load(dir)
      } else
        spark.read.schema(b.schema).format(b.format).load(b.path)
    // computed columns first: a WATERMARK may be declared on a
    // computed rowtime (the reference's derived-rowtime pattern)
    val df1 = b.computed.foldLeft(df0) { case (d, (n, e)) =>
      d.withColumn(n, expr(e))
    }
    val df = b.watermark match {
      case Some((tsCol, delay)) => df1.withWatermark(tsCol, delay)
      case None                 => df1
    }
    df.createOrReplaceTempView(name)
    df
  }

  /** `INSERT INTO|OVERWRITE t SELECT ...` (SqlToOperationConverter's
    * insert path): runs the query against the registered views and
    * writes it through the target's filesystem binding — INTO appends,
    * OVERWRITE replaces, the same two modes the reference's
    * INSERT statements bind to. The target view is refreshed so
    * subsequent reads observe the write. Returns the written rows. */
  def executeInsert(spark: SparkSession, stmt: String): DataFrame = stmt match {
    case insertRe(mode, name, query) =>
      val b = Option(sinks.get(name.toLowerCase)).getOrElse(
        sys.error(s"INSERT target '$name' has no CREATE TABLE binding"))
      val df = spark.sql(query)
      df.write.format(b.format)
        .mode(if (mode.equalsIgnoreCase("OVERWRITE")) "overwrite" else "append")
        .save(b.path)
      // a batch view bound at CREATE time snapshotted the file listing
      // of that moment — re-register THROUGH THE FULL BINDING so readers
      // observe the write without losing the table's computed columns or
      // watermark (a streaming target needs no refresh: the file stream
      // source discovers new files by itself)
      if (!b.streaming) {
        spark.catalog.refreshByPath(b.path)
        register(spark, name, b)
      }
      df
    case _ => sys.error(s"unsupported INSERT: $stmt")
  }

  // END must be delimited (a preceding ';' or whitespace): a lazy
  // `(.*?)END` alone can bind to the 'end' inside an identifier or
  // string literal (append_log, 'the end') when the tail happens to
  // parse, truncating the body.
  private val stmtSetRe =
    """(?is)\s*(?:EXECUTE\s+)?(?:BEGIN\s+)?STATEMENT\s+SET\s*;?(.*?)(?:;|\s)END\s*;?\s*""".r

  /** Split a statement-set body on ';' OUTSIDE string literals only —
    * a literal like 'a;b' in an INSERT's SELECT must not split the
    * statement. Single quotes with '' escaping (SQL standard). */
  private def splitStatements(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQuote = false
    body.foreach {
      case '\'' => inQuote = !inQuote; sb += '\''
      case ';' if !inQuote => out += sb.toString.trim; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString.trim
    out.result().filter(_.nonEmpty)
  }

  /** Source tables a SQL query references, by parsed plan (not text):
    * the basis of statement-set scan sharing. */
  private def referencedTables(spark: SparkSession, query: String): Seq[String] =
    spark.sessionState.sqlParser.parsePlan(query).collect {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        u.multipartIdentifier.last.toLowerCase
    }

  /** `[EXECUTE] [BEGIN] STATEMENT SET; INSERT ...; INSERT ...; END` —
    * the reference's multi-sink statement set
    * (SqlToOperationConverter statement-set path). Each INSERT runs
    * through [[executeInsert]] in order. Scan sharing (the reference
    * fuses the set into one DAG so a shared source is scanned once —
    * StreamCommonSubGraphBasedOptimizer): any registered view referenced
    * by ≥2 statements of the set is persisted for the duration of the
    * set and unpersisted after, so the shared input is read from
    * storage exactly once. Returns per-statement written counts. */
  def executeStatementSet(spark: SparkSession, stmt: String): Seq[Long] =
    stmt match {
      case stmtSetRe(body) =>
        val inserts = splitStatements(body)
        require(inserts.nonEmpty, "empty STATEMENT SET")
        val queries = inserts.map {
          case insertRe(_, _, q) => q
          case s => sys.error(s"unsupported statement in STATEMENT SET: $s")
        }
        val viewNames = spark.catalog.listTables().collect()
          .map(_.name.toLowerCase).toSet
        val shared = queries.flatMap(q =>
            referencedTables(spark, q).distinct.filter(viewNames))
          .groupBy(identity).collect { case (t, refs) if refs.size >= 2 => t }
          .toSeq.sorted
        val pinned = shared.map(t => spark.table(t).persist())
        try inserts.map(s => executeInsert(spark, s).count())
        finally pinned.foreach(_.unpersist())
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
  private val explainInsertRe =
    """(?is)\s*EXPLAIN\s+(?:PLAN\s+FOR\s+)?INSERT\s+(INTO|OVERWRITE)\s+(\w+)\s+(SELECT\s+.+)\s*;?\s*""".r
  private val explainSetRe =
    """(?is)\s*EXPLAIN\s+(?:PLAN\s+FOR\s+)?((?:EXECUTE\s+)?(?:BEGIN\s+)?STATEMENT\s+SET.+)""".r
  private val descRe = """(?is)\s*DESCRIBE\s+(\w+)\s*;?\s*""".r

  private def formatted(spark: SparkSession, query: String): String =
    spark.sql(query).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** `EXPLAIN [PLAN FOR] <stmt>` (SqlRichExplain — the reference's
    * EXPLAIN covers DML, not just queries): for a SELECT, Spark's
    * formatted optimized+physical plan against the registered views;
    * for an INSERT, the same plan for its SELECT plus a sink header
    * naming the bound target (path/format/mode); for a STATEMENT SET,
    * one such section per member statement. Nothing executes and no
    * file is written — explain is plan-only, like the reference. */
  def executeExplain(spark: SparkSession, stmt: String): String = stmt match {
    case explainInsertRe(mode, name, query) =>
      val b = Option(sinks.get(name.toLowerCase)).getOrElse(
        sys.error(s"EXPLAIN INSERT target '$name' has no CREATE TABLE binding"))
      val sinkMode =
        if (mode.equalsIgnoreCase("OVERWRITE")) "overwrite" else "append"
      s"== Sink ==\nInsert $name [path=${b.path}, format=${b.format}, " +
        s"mode=$sinkMode]\n\n" + formatted(spark, query)
    case explainSetRe(setText) => setText match {
      case stmtSetRe(body) =>
        splitStatements(body).map {
          case insertRe(mode, name, query) =>
            executeExplain(spark, s"EXPLAIN INSERT $mode $name $query")
          case s => sys.error(s"unsupported statement in STATEMENT SET: $s")
        }.mkString("\n")
      case _ => sys.error(s"unsupported EXPLAIN STATEMENT SET: $setText")
    }
    case explainRe(query) => formatted(spark, query)
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

  /** The rest of the reference's SHOW family (SqlToOperationConverter
    * show-statement paths; catalog metadata only, no data reads):
    * SHOW CATALOGS → the session's catalog names; SHOW DATABASES →
    * namespaces of the current catalog; SHOW VIEWS → temp views
    * (every DDL-registered table here IS a view binding); SHOW
    * FUNCTIONS → registered function names, including the gap
    * functions GraftExtensions injects (is_alpha …). */
  def executeShow(spark: SparkSession, stmt: String): Seq[String] =
    stmt.trim.toUpperCase.stripSuffix(";").trim match {
      case "SHOW TABLES" => showTables(spark)
      case "SHOW CATALOGS" =>
        spark.catalog.listCatalogs().collect().map(_.name).sorted.toSeq
      case "SHOW DATABASES" =>
        spark.catalog.listDatabases().collect().map(_.name).sorted.toSeq
      case "SHOW VIEWS" =>
        spark.catalog.listTables().collect()
          .filter(t => t.tableType == "TEMPORARY" || t.tableType == "VIEW")
          .map(_.name).sorted.toSeq
      case "SHOW FUNCTIONS" =>
        spark.catalog.listFunctions().collect().map(_.name).sorted.toSeq
      case other => sys.error(s"unsupported SHOW statement: $other")
    }

  private val alterSetRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+SET\s*\((.+)\)\s*;?\s*""".r
  private val alterRenameRe =
    """(?is)\s*ALTER\s+TABLE\s+(\w+)\s+RENAME\s+TO\s+(\w+)\s*;?\s*""".r

  /** `ALTER TABLE t SET ('k'='v', ...)` / `ALTER TABLE t RENAME TO t2`
    * (SqlToOperationConverter's alter-table paths,
    * SqlAlterTableOptions / SqlAlterTableRename): SET merges the new
    * connector properties into the stored binding and re-registers the
    * view through it (a changed path/format is observed immediately,
    * exactly the reference's catalog-update semantics); RENAME moves
    * the binding and the view. Unknown tables fail loudly. */
  def executeAlter(spark: SparkSession, stmt: String): DataFrame = stmt match {
    case alterSetRe(name, propsText) =>
      val b = Option(sinks.get(name.toLowerCase)).getOrElse(
        sys.error(s"ALTER TABLE target '$name' has no CREATE TABLE binding"))
      val props = propRe.findAllMatchIn(propsText)
        .map(m => m.group(1).toLowerCase -> m.group(2)).toMap
      require(props.nonEmpty, s"ALTER TABLE ... SET with no options: $stmt")
      require(props.get("connector").forall(_ == "filesystem"),
        s"unsupported connector: ${props.get("connector")}")
      val b2 = b.copy(
        path = props.getOrElse("path", b.path),
        format = props.getOrElse("format", b.format),
        streaming = props.get("mode").map(_ == "streaming").getOrElse(b.streaming))
      sinks.put(name.toLowerCase, b2)
      register(spark, name, b2)
    case alterRenameRe(from, to) =>
      val b = Option(sinks.remove(from.toLowerCase)).getOrElse(
        sys.error(s"ALTER TABLE target '$from' has no CREATE TABLE binding"))
      sinks.put(to.toLowerCase, b)
      spark.catalog.dropTempView(from)
      register(spark, to, b)
    case _ => sys.error(s"unsupported ALTER TABLE: $stmt")
  }

  private val dropRe =
    """(?is)\s*DROP\s+(TABLE|TEMPORARY\s+VIEW|VIEW)\s+(IF\s+EXISTS\s+)?(\w+)\s*;?\s*""".r

  /** `DROP TABLE [IF EXISTS] t` / `DROP [TEMPORARY] VIEW [IF EXISTS] v`
    * (SqlToOperationConverter drop paths): removes the binding (tables)
    * and the temp view. Returns true when something was dropped;
    * a missing target without IF EXISTS fails loudly, like the
    * reference's catalog. */
  def executeDrop(spark: SparkSession, stmt: String): Boolean = stmt match {
    case dropRe(kind, ifExists, name) =>
      val hadBinding =
        if (kind.equalsIgnoreCase("TABLE"))
          sinks.remove(name.toLowerCase) != null
        else false
      val hadView = spark.catalog.dropTempView(name)
      val dropped = hadBinding || hadView
      if (!dropped && ifExists == null)
        sys.error(s"DROP ${kind.toUpperCase}: '$name' does not exist")
      dropped
    case _ => sys.error(s"unsupported DROP statement: $stmt")
  }

  private val createFnRe =
    """(?is)\s*CREATE\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+(?:IF\s+NOT\s+EXISTS\s+)?(\w+)\s+AS\s+'([\w.$]+)'\s*;?\s*""".r

  /** `CREATE [TEMPORARY] FUNCTION name AS 'class'` (SqlCreateFunction
    * → the reference's class-backed catalog functions): the class must
    * be a Catalyst `Expression` with an all-Expression constructor on
    * the classpath (e.g. `graft.functions.SplitIndex`) — the same
    * contract `GraftExtensions` uses to inject the built-ins, exposed
    * as a statement. The function becomes callable from any subsequent
    * spark.sql text. Unknown classes or non-Expression classes fail
    * loudly at CREATE time, like the reference's validator. */
  def executeCreateFunction(spark: SparkSession, stmt: String): String =
    stmt match {
      case createFnRe(name, className) =>
        val cls =
          try Class.forName(className)
          catch { case _: ClassNotFoundException =>
            sys.error(s"CREATE FUNCTION: class '$className' not on classpath") }
        require(classOf[org.apache.spark.sql.catalyst.expressions.Expression]
            .isAssignableFrom(cls),
          s"CREATE FUNCTION: '$className' is not a Catalyst Expression")
        val ctors = cls.getConstructors.filter(_.getParameterTypes.forall(
          classOf[org.apache.spark.sql.catalyst.expressions.Expression]
            .isAssignableFrom))
        require(ctors.nonEmpty,
          s"CREATE FUNCTION: '$className' has no all-Expression constructor")
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(
          name.toLowerCase,
          (es: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
            val ctor = ctors.find(_.getParameterCount == es.length).getOrElse(
              sys.error(s"$name takes ${ctors.map(_.getParameterCount).toSeq
                .sorted.mkString("/")} arguments, got ${es.length}"))
            ctor.newInstance(es: _*)
              .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]
          },
          "scala_udf")
        name.toLowerCase
      case _ => sys.error(s"unsupported CREATE FUNCTION: $stmt")
    }

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
      val b = Binding(path, format, schema,
        props.get("mode").contains("streaming"), computed, watermark)
      sinks.put(name.toLowerCase, b)
      register(spark, name, b)
    case _ => sys.error(s"unsupported DDL: $ddl")
  }
}
