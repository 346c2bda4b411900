package graft.sources

import graft.sources.{SqlText => S}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single-statement entry point (SURVEY.md §3.1 — the reference's
  * `TableEnvironment.executeSql`, which routes EVERY statement kind
  * through SqlToOperationConverter.java:180's dispatch, and the thin
  * SqlClient REPL on top of it). A user of the reference drives the
  * whole engine through one call; this object gives the same door:
  *
  *   - DDL: CREATE TABLE … WITH, CREATE [TEMPORARY] VIEW,
  *     CREATE [TEMPORARY] FUNCTION … AS 'class', ALTER TABLE
  *     SET/RENAME, DROP TABLE/VIEW [IF EXISTS]
  *   - DML: INSERT INTO/OVERWRITE, [EXECUTE] STATEMENT SET … END
  *   - introspection: EXPLAIN [PLAN FOR], DESCRIBE, SHOW …
  *   - queries: SELECT/WITH … (through `spark.sql`, which carries the
  *     injected dialect rewrites — temporal `FOR SYSTEM_TIME AS OF`,
  *     group-window TUMBLE/HOP/SESSION text, windowing TVF), and
  *     `SELECT … FROM t MATCH_RECOGNIZE (…)` statements routed to
  *     [[MatchRecognizeSql]]
  *
  * Every result is a DataFrame (statements without a natural result
  * return a small status frame), mirroring executeSql's uniform
  * TableResult. Unknown statement kinds fail loudly naming the
  * statement — never a silent no-op.
  */
/** Session properties set through the SQL-client `SET key=value`
  * statement (SqlCommandParser.java:287 — the client's SET/RESET
  * pair over the executor's session properties). Tracks each key's
  * PRE-SET value so `RESET` restores exactly the properties the
  * client changed — never a blanket reset of engine defaults (the
  * reference resets the session's environment to its defaults the
  * same way: only client-made changes are undone). Tracking is keyed
  * per SparkSession (RuntimeConfig is per-session state; a JVM-global
  * map would let one session's RESET restore another's values). */
object SqlSessionConfig {
  import scala.jdk.CollectionConverters._
  private val bySession = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession,
      java.util.concurrent.ConcurrentHashMap[String, Option[String]]]())

  private def prior(spark: SparkSession) =
    bySession.synchronized {
      bySession.computeIfAbsent(spark,
        _ => new java.util.concurrent.ConcurrentHashMap[String, Option[String]]())
    }

  def set(spark: SparkSession, key: String, value: String): Unit = {
    val p = prior(spark)
    val old = spark.conf.getOption(key)
    // conf.set FIRST: a static/non-modifiable conf throws here, and
    // must not be recorded as client-set (a poisoned entry would make
    // every later RESET re-throw on the same key)
    spark.conf.set(key, value)
    // remember the first pre-SET value only: SET a=1; SET a=2; RESET
    // must restore the original, not 1
    p.putIfAbsent(key, old)
  }

  /** The client-set properties with their CURRENT values (bare `SET`). */
  def entries(spark: SparkSession): Seq[(String, String)] =
    prior(spark).keySet().asScala.toSeq.sorted
      .map(k => k -> spark.conf.getOption(k).getOrElse(""))

  private def restore(spark: SparkSession, k: String,
                      old: Option[String]): Unit = old match {
    case Some(v) => spark.conf.set(k, v)
    case None    => spark.conf.unset(k)
  }

  /** Restore every client-set property; returns how many. */
  def reset(spark: SparkSession): Int = {
    val p = prior(spark)
    val snapshot = p.asScala.toMap
    snapshot.foreach { case (k, old) => restore(spark, k, old) }
    snapshot.keys.foreach(p.remove)
    snapshot.size
  }

  /** Restore ONE client-set property (`RESET key` — the later
    * clients' per-key form); a key the client never set is loud. */
  def reset(spark: SparkSession, key: String): Unit = {
    val p = prior(spark)
    val old = Option(p.get(key)).getOrElse(sys.error(
      s"RESET '$key': not a client-set property (only properties " +
        "changed via SET can be reset)"))
    restore(spark, key, old)
    p.remove(key)
  }
}

object GraftSqlExecutor {

  /** First two significant keywords of the statement (lexed, so
    * comments/strings cannot fake a keyword). */
  private def heads(stmt: String): (String, String, Vector[S.Tok]) = {
    val toks = S.lex(stmt)
    def kw(i: Int) =
      if (i < toks.length && toks(i).kind == S.Ident) toks(i).text.toUpperCase
      else ""
    (kw(0), kw(1), toks)
  }

  private def status(spark: SparkSession, rows: Seq[String]): DataFrame = {
    import spark.implicits._
    rows.toDF("result")
  }

  /** True when the statement is a query whose FROM clause applies a
    * MATCH_RECOGNIZE clause (the one query shape Spark's parser cannot
    * take even after rewriting). */
  private def isMatchRecognize(toks: Vector[S.Tok]): Boolean =
    toks.exists(_.is("MATCH_RECOGNIZE"))

  def executeSql(spark: SparkSession, stmt: String): DataFrame = {
    val (k1, k2, toks) = heads(stmt)
    (k1, k2) match {
      case ("CREATE", _) =>
        // the created object kind sits within CREATE [TEMPORARY]
        // [SYSTEM] <kind> — positions 1..3 only, so an identifier
        // named "view"/"function" later in the statement cannot
        // mis-route the dispatch
        toks.slice(1, 4).collectFirst {
          case t if t.is("TABLE")    => "TABLE"
          case t if t.is("VIEW")     => "VIEW"
          case t if t.is("FUNCTION") => "FUNCTION"
          case t if t.is("CATALOG")  => "CATALOG"
          case t if t.is("DATABASE") || t.is("SCHEMA") => "DATABASE"
        } match {
          case Some("TABLE") => GraftDDL.execute(spark, stmt)
          case Some("VIEW")  => GraftDDL.executeView(spark, stmt)
          case Some("FUNCTION") =>
            val name = GraftDDL.executeCreateFunction(spark, stmt)
            status(spark, Seq(s"function $name created"))
          case Some("CATALOG") =>
            // SqlCreateCatalog → GraftInMemoryCatalog registration
            val name = GraftDDL.executeCreateCatalog(spark, stmt)
            status(spark, Seq(s"catalog $name created"))
          case Some("DATABASE") =>
            // SqlCreateDatabase (the reference's catalog-database
            // statements, SqlToOperationConverter database paths) —
            // Spark's session catalog speaks this natively
            spark.sql(stmt)
            status(spark, Seq("database created"))
          case _ => sys.error(s"unsupported CREATE statement: $stmt")
        }
      case ("ALTER", "TABLE") => GraftDDL.executeAlter(spark, stmt)
      case ("ALTER", "VIEW") => GraftDDL.executeAlterView(spark, stmt)
      case ("ALTER", "FUNCTION") | ("ALTER", "TEMPORARY") =>
        val name = GraftDDL.executeAlterFunction(spark, stmt)
        status(spark, Seq(s"function $name altered"))
      case ("ALTER", "DATABASE") | ("ALTER", "SCHEMA") =>
        spark.sql(stmt); status(spark, Seq("database altered"))
      case ("DROP", "CATALOG") =>
        val dropped = GraftDDL.executeDropCatalog(spark, stmt)
        status(spark, Seq(if (dropped) "catalog dropped" else "nothing to drop"))
      case ("DROP", "DATABASE") | ("DROP", "SCHEMA") =>
        spark.sql(stmt); status(spark, Seq("database dropped"))
      case ("USE", "CATALOG") =>
        // SqlUseCatalog → Spark's SET CATALOG spelling
        val name = toks.lift(2).map(_.ident).getOrElse(
          sys.error(s"USE CATALOG needs a catalog name: $stmt"))
        spark.sql(s"SET CATALOG $name")
        status(spark, Seq(s"catalog set to $name"))
      case ("USE", _) => // SqlUseDatabase
        spark.sql(stmt); status(spark, Seq("database switched"))
      case ("DROP", "FUNCTION") =>
        val dropped = GraftDDL.executeDropFunction(spark, stmt)
        status(spark, Seq(if (dropped) "function dropped" else "nothing to drop"))
      case ("DROP", "TEMPORARY") if toks.slice(2, 4).exists(_.is("FUNCTION")) =>
        val dropped = GraftDDL.executeDropFunction(spark, stmt)
        status(spark, Seq(if (dropped) "function dropped" else "nothing to drop"))
      case ("DROP", _) =>
        val dropped = GraftDDL.executeDrop(spark, stmt)
        status(spark, Seq(if (dropped) "dropped" else "nothing to drop"))
      case ("INSERT", _) => GraftDDL.executeInsert(spark, stmt)
      case ("EXECUTE", _) | ("BEGIN", _) | ("STATEMENT", "SET") =>
        val counts = GraftDDL.executeStatementSet(spark, stmt)
        status(spark, counts.map(c => s"$c rows written"))
      case ("EXPLAIN", _) =>
        status(spark, Seq(GraftDDL.executeExplain(spark, stmt)))
      case ("DESCRIBE", "CATALOG") | ("DESC", "CATALOG") =>
        status(spark, GraftDDL.executeDescribeCatalog(spark,
          stmt.replaceAll("(?i)^\\s*DESC\\b", "DESCRIBE")))
      case ("DESCRIBE", "DATABASE") | ("DESC", "DATABASE") |
           ("DESCRIBE", "SCHEMA") | ("DESC", "SCHEMA") =>
        // SqlDescribeDatabase — Spark's namespace describe is native
        spark.sql(stmt)
      case ("DESCRIBE", _) | ("DESC", _) =>
        import spark.implicits._
        GraftDDL.executeDescribe(spark,
            stmt.replaceAll("(?i)^\\s*DESC\\b", "DESCRIBE"))
          .toDF("col_name", "data_type", "nullable")
      case ("SHOW", _) =>
        status(spark, GraftDDL.executeShow(spark, stmt))
      case ("SET", _) =>
        // SqlCommandParser.java:287 — `SET` lists the client-set
        // properties; `SET key=value` sets one (key may be the later
        // quoted spelling `'key'='value'`). Parsed from the TOKEN
        // stream, so trailing comments never leak into the value and
        // '' escapes unquote correctly. `SET CATALOG` and similar
        // non-assignment forms are not this statement — fail loudly
        // (the reference's client rejects them the same way).
        val body = toks.drop(1).filterNot(t => t.kind == S.Sym && t.text == ";")
        if (body.isEmpty) {
          import spark.implicits._
          SqlSessionConfig.entries(spark).toDF("key", "value")
        } else {
          val eqIdx = body.indexWhere(t => t.kind == S.Sym && t.text == "=")
          require(eqIdx > 0 && eqIdx < body.length - 1,
            s"SET takes key=value: $stmt")
          def span(ts: Vector[S.Tok]): String = {
            require(ts.nonEmpty, s"SET takes key=value: $stmt")
            if (ts.length == 1 && ts.head.kind == S.Str)
              ts.head.text.stripPrefix("'").stripSuffix("'").replace("''", "'")
            else stmt.substring(ts.head.start, ts.last.end)
          }
          val key = span(body.take(eqIdx))
          val value = span(body.drop(eqIdx + 1))
          require(key.nonEmpty && !key.exists(_.isWhitespace),
            s"SET key must be a single property name: $stmt")
          SqlSessionConfig.set(spark, key, value)
          status(spark, Seq(s"$key=$value"))
        }
      case ("RESET", _) =>
        val body = toks.drop(1).filterNot(t => t.kind == S.Sym && t.text == ";")
        if (body.isEmpty) {
          val n = SqlSessionConfig.reset(spark)
          status(spark, Seq(s"$n propert${if (n == 1) "y" else "ies"} reset"))
        } else {
          // per-key form (the later clients' `RESET 'key'`): reset
          // exactly the named property, loud if it was never SET
          val key =
            if (body.length == 1 && body.head.kind == S.Str)
              body.head.text.stripPrefix("'").stripSuffix("'").replace("''", "'")
            else stmt.substring(body.head.start, body.last.end)
          SqlSessionConfig.reset(spark, key)
          status(spark, Seq(s"$key reset"))
        }
      case ("SELECT", _) | ("WITH", _) | ("VALUES", _) | ("TABLE", _) =>
        if (isMatchRecognize(toks)) MatchRecognizeSql.sql(spark, stmt)
        else spark.sql(stmt)
      case (other, _) =>
        sys.error(s"unsupported statement kind '$other': $stmt")
    }
  }
}
