package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL-script shell (SURVEY.md §3.1 — SqlClient.java script mode
  * over the executeSql door; tableau rendering per
  * CliTableauResultView.java). */
class SqlShellSpec extends AnyFunSuite {
  lazy val spark: SparkSession = StreamHarness.spark
  import graft.sources.SqlShell

  test("script split: quotes, comments, and STATEMENT SET blocks") {
    val script =
      """CREATE TABLE t1 (k INT) WITH ('connector'='blackhole');
        |-- a comment; with a semicolon
        |SELECT 'a;b' AS s;
        |EXECUTE STATEMENT SET;
        |  INSERT INTO t1 SELECT 1 AS k;
        |  INSERT INTO t1 SELECT 2 AS k;
        |END;
        |/* block; comment */ SELECT 2 AS two""".stripMargin
    val stmts = SqlShell.splitScript(script)
    assert(stmts.length == 4, stmts.mkString("\n---\n"))
    assert(stmts(1).contains("'a;b'"))
    assert(stmts(2).toUpperCase.startsWith("EXECUTE STATEMENT SET"))
    assert(stmts(2).toUpperCase.endsWith("END;"))
    assert(stmts(3).contains("SELECT 2"))
    // a leading comment must not hide the opener
    val commented = SqlShell.splitScript(
      "-- multi-sink\nSTATEMENT SET; INSERT INTO x SELECT 1; END;")
    assert(commented.length == 1, commented)
    // unterminated set is loud
    val e = intercept[Exception](
      SqlShell.splitScript("STATEMENT SET; INSERT INTO x SELECT 1;"))
    assert(e.getMessage.contains("unterminated"), e.getMessage)
  }

  test("tableau rendering and end-to-end script execution") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1, "alice"), (2, null.asInstanceOf[String])).toDF("id", "name")
    val t = SqlShell.renderTableau(df)
    val lines = t.linesIterator.toSeq
    assert(lines.head.matches("\\+-+\\+-+\\+"), t)
    assert(lines(1).matches("\\| id \\| name\\s+\\|"), t)
    assert(lines.exists(_.contains("NULL")), t)
    assert(lines.last == "2 rows in set", t)
    // end-to-end: DDL + INSERT + SELECT through the shell, results back
    val d = java.nio.file.Files.createTempDirectory("shell_t").toString
    val results = SqlShell.runScript(sp,
      s"""CREATE TABLE shell_t (k BIGINT, v STRING)
         |WITH ('connector'='filesystem', 'path'='$d', 'format'='parquet');
         |INSERT INTO shell_t VALUES (1, 'x'), (2, 'y');
         |SELECT k, v FROM shell_t ORDER BY k;
         |DROP TABLE shell_t""".stripMargin)
    assert(results.length == 4)
    val sel = results(2)._2.collect()
    assert(sel.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "x"), (2L, "y")), sel.toSeq)
    // a failing statement aborts loudly, naming the statement
    val err = intercept[RuntimeException](SqlShell.runScript(sp,
      "SELECT 1 AS one; FROB THE KNOB; SELECT 2 AS two"))
    assert(err.getMessage.contains("statement failed: FROB"), err.getMessage)
  }

  test("SET / RESET session properties (SqlCommandParser SET family)") {
    val sp = spark
    import graft.sources.GraftSqlExecutor.executeSql
    val key = "graft.test.shell.prop"
    assert(sp.conf.getOption(key).isEmpty)
    executeSql(sp, s"SET $key=42")
    assert(sp.conf.get(key) == "42")
    // quoted spelling, value keeps inner content verbatim
    executeSql(sp, s"SET '$key'='hello world'")
    assert(sp.conf.get(key) == "hello world")
    // bare SET lists client-set properties
    val listed = executeSql(sp, "SET").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(listed.get(key).contains("hello world"), listed)
    // a pre-existing conf is RESTORED by RESET, not unset
    val pre = "spark.sql.shuffle.partitions"
    val orig = sp.conf.get(pre)
    executeSql(sp, s"SET $pre=7")
    assert(sp.conf.get(pre) == "7")
    executeSql(sp, "RESET")
    assert(sp.conf.get(pre) == orig)
    assert(sp.conf.getOption(key).isEmpty, "client-introduced key must unset")
    // token-based parse: trailing comments never leak into the value
    executeSql(sp, s"SET $key=7 -- a note")
    assert(sp.conf.get(key) == "7")
    // per-key RESET restores exactly that property
    executeSql(sp, s"SET $key=8")
    executeSql(sp, "SET graft.test.shell.other=9")
    executeSql(sp, s"RESET $key")
    assert(sp.conf.getOption(key).isEmpty)
    assert(sp.conf.get("graft.test.shell.other") == "9")
    val er = intercept[Exception](executeSql(sp, "RESET graft.never.set"))
    assert(er.getMessage.contains("not a client-set"), er.getMessage)
    executeSql(sp, "RESET")
    // a failed SET of a non-modifiable conf must not poison RESET
    val es = intercept[Exception](
      executeSql(sp, "SET spark.sql.warehouse.dir=/tmp/elsewhere"))
    assert(es.getMessage.toLowerCase.contains("modif"), es.getMessage)
    executeSql(sp, "RESET") // must not throw on the failed key
    // non-assignment SET forms are not this statement — loud
    val e = intercept[Exception](executeSql(sp, "SET CATALOG somewhere"))
    assert(e.getMessage.contains("key=value"), e.getMessage)
    // SHOW MODULES: the default core module, like the reference session
    assert(executeSql(sp, "SHOW MODULES").collect().map(_.getString(0)).toSeq
      == Seq("core"))
  }

  test("QUIT stops the whole script (even from a SOURCE'd file); HELP/CLEAR") {
    val sp = spark
    val results = SqlShell.runScript(sp,
      "SELECT 1 AS x; HELP; CLEAR; QUIT; SELECT 2 AS x")
    // the statement after QUIT never ran
    assert(results.length == 4, results.map(_._1))
    assert(results(1)._2.columns.toSeq == Seq("command"))
    assert(results(1)._2.count() >= 5)
    assert(results.last._1.equalsIgnoreCase("QUIT"))
    // EXIT inside a SOURCE'd file exits the OUTER script too, like the
    // reference client exiting entirely
    val f = java.nio.file.Files.createTempFile("shell_quit", ".sql")
    java.nio.file.Files.write(f, "SELECT 10 AS x; EXIT;".getBytes)
    val r2 = SqlShell.runScript(sp, s"SELECT 9 AS x; SOURCE $f; SELECT 11 AS x")
    assert(r2.length == 3, r2.map(_._1))
    assert(r2.last._1.equalsIgnoreCase("EXIT"))
  }

  test("SOURCE inlines a script file; self-sourcing is a loud error") {
    val sp = spark
    val f = java.nio.file.Files.createTempFile("shell_src", ".sql")
    java.nio.file.Files.write(f, "SELECT 41 AS x; SELECT 42 AS x;".getBytes)
    val results = SqlShell.runScript(sp,
      s"SELECT 40 AS x; SOURCE $f; SELECT 43 AS x")
    assert(results.map(_._2.collect().head.getInt(0)) == Seq(40, 41, 42, 43))
    val loop = java.nio.file.Files.createTempFile("shell_loop", ".sql")
    java.nio.file.Files.write(loop, s"SOURCE $loop;".getBytes)
    val e = intercept[Exception](SqlShell.runScript(sp, s"SOURCE $loop"))
    assert(e.getMessage.contains("nesting"), e.getMessage)
    // a missing file names the SOURCE statement
    val miss = intercept[RuntimeException](
      SqlShell.runScript(sp, "SOURCE /no/such/file.sql"))
    assert(miss.getMessage.contains("statement failed: SOURCE"), miss.getMessage)
  }

  test("changelog result view renders +I/-U/+U incrementally across batches") {
    // CliChangelogResultView.java analog: a streaming aggregate's
    // updates arrive as an upsert changelog; the view diffs each
    // micro-batch against its key→row state and renders the
    // insert / update-before / update-after notation
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    val input = StreamHarness.mkStream()
    val agg = input.toDS().toDF()
      .groupBy("key").agg(org.apache.spark.sql.functions.sum("value").as("total"))
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    val perBatch = scala.collection.mutable.ListBuffer.empty[Seq[String]]
    val view = SqlShell.changelogView(agg, Seq("key"), emit = l => lines += l)
    try {
      input.addData(Seq(StreamHarness.ev(1, 10, 1, value = 5.0)))
      view.processAllAvailable()
      perBatch += lines.toSeq; lines.clear()
      input.addData(Seq(StreamHarness.ev(1, 20, 2, value = 3.0),
        StreamHarness.ev(2, 20, 3, value = 7.0)))
      view.processAllAvailable()
      perBatch += lines.toSeq; lines.clear()
      input.addData(Seq(StreamHarness.ev(2, 30, 4, value = 1.0)))
      view.processAllAvailable()
      perBatch += lines.toSeq
    } finally view.stop()
    assert(perBatch(0) == Seq("+I [1, 5.0]"), perBatch)
    assert(perBatch(1).sorted == Seq("+I [2, 7.0]", "+U [1, 8.0]", "-U [1, 5.0]"),
      perBatch)
    assert(perBatch(2) == Seq("-U [2, 7.0]", "+U [2, 8.0]"), perBatch)
    // the -U always precedes its +U (the reference's retract pair)
    val all = perBatch.flatten
    assert(all.indexOf("-U [1, 5.0]") < all.indexOf("+U [1, 8.0]"), all)
  }

  test("changelog view: -D on disappearance in complete mode; key validation") {
    val sp = spark
    implicit val sql = sp.sqlContext
    import sp.implicits._
    import org.apache.spark.sql.functions._
    val input = StreamHarness.mkStream()
    // complete-mode top-1: the whole result table re-emits per batch;
    // a key falling out of the top renders -D
    val top1 = input.toDS().toDF()
      .groupBy("key").agg(sum("value").as("total"))
      .orderBy(desc("total")).limit(1)
    val lines = scala.collection.mutable.ListBuffer.empty[String]
    val view = SqlShell.changelogView(top1, Seq("key"),
      complete = true, emit = l => lines += l)
    try {
      input.addData(Seq(StreamHarness.ev(1, 10, 1, value = 5.0)))
      view.processAllAvailable()
      input.addData(Seq(StreamHarness.ev(2, 20, 2, value = 9.0)))
      view.processAllAvailable()
    } finally view.stop()
    assert(lines.toSeq == Seq("+I [1, 5.0]", "+I [2, 9.0]", "-D [1, 5.0]"),
      lines)
    // a batch frame is rejected loudly; so is a bogus key column
    val batchErr = intercept[IllegalArgumentException](
      SqlShell.changelogView(Seq((1, 2)).toDF("a", "b"), Seq("a")))
    assert(batchErr.getMessage.contains("STREAMING"), batchErr.getMessage)
    val keyErr = intercept[IllegalArgumentException](
      SqlShell.changelogView(input.toDS().toDF()
        .groupBy("key").agg(sum("value").as("t")), Seq("nope")))
    assert(keyErr.getMessage.contains("not in result schema"), keyErr.getMessage)
  }

  test("shell main path routes streaming SELECT results to the changelog view") {
    // inferKeyCols: aggregate grouping columns when present, full row
    // (append changelog) otherwise
    val sp = spark
    implicit val sql = sp.sqlContext
    val input = StreamHarness.mkStream()
    val agg = input.toDS().toDF().groupBy("key", "kind")
      .agg(org.apache.spark.sql.functions.count("*").as("n"))
    assert(SqlShell.inferKeyCols(agg) == Seq("key", "kind"))
    assert(SqlShell.inferKeyCols(input.toDS().toDF()) ==
      Seq("key", "tsMicros", "id", "kind", "value"))
  }
}
