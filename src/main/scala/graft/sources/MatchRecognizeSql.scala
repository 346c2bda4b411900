package graft.sources

import graft.sources.{SqlText => S}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Statement-level MATCH_RECOGNIZE SQL (SURVEY.md §2.9 — the
  * reference parses the full clause in flink-sql-parser and plans it
  * at StreamExecMatch.scala:68; its ITCase corpus writes
  *
  * {{{
  * SELECT * FROM events MATCH_RECOGNIZE (
  *   PARTITION BY user_id ORDER BY ts
  *   MEASURES A.event_id AS a_id, LAST(B.value) AS b_value
  *   ONE ROW PER MATCH
  *   AFTER MATCH SKIP TO NEXT ROW
  *   PATTERN (A B+) WITHIN INTERVAL '2' HOUR
  *   DEFINE A AS event_type = 'signup', B AS event_type = 'click'
  * ) [AS T] [ORDER BY ...]
  * }}}
  *
  * The round-6 repo had the full capability — clause compilation,
  * batch NFA, true streaming operator — but only as the
  * `lib:MatchRecognize` facade taking a pre-canonicalized event
  * frame. This object closes the statement surface: it parses the
  * statement on the [[SqlText]] token model, canonicalizes the FROM
  * table's columns from the clause's own PARTITION BY / ORDER BY
  * (key ← partition column, tsMicros ← order column — exactly where
  * the reference's planner reads the partitioning and the rowtime
  * order of a MATCH), and routes: a batch view to
  * [[graft.operators.MatchRecognize.run]], a STREAMING view to
  * [[graft.streaming.StreamingMatchRecognize]] (MEASURES batch-only
  * there, like the reference's restriction). The partition column
  * keeps its original name in the output, as the reference emits it.
  *
  * Requirements the canonicalization enforces loudly: the partition
  * column must be integral (it becomes the state key), the order
  * column a timestamp or epoch-micros long, and the table must carry
  * an `id`/`event_id` tiebreak column (the NFA's deterministic
  * within-timestamp order; the reference leaves equal-rowtime order
  * undefined — this engine pins it).
  */
object MatchRecognizeSql {

  private final case class Parsed(selStar: Boolean, selCols: Seq[String],
                                  table: String, clause: String,
                                  partCol: String, orderCol: String,
                                  orderBy: Seq[(String, Boolean)])

  private def parse(sql: String): Parsed = {
    val toks = S.lex(sql)
    def at(i: Int, kw: String) = i < toks.length && toks(i).is(kw)
    def isSym(i: Int, s: String) =
      i < toks.length && toks(i).kind == S.Sym && toks(i).text == s
    require(toks.nonEmpty && toks.head.is("SELECT"),
      s"MATCH_RECOGNIZE statement must start with SELECT: $sql")
    val fromIdx = toks.indexWhere(_.is("FROM"))
    require(fromIdx > 0, s"missing FROM: $sql")
    val selToks = toks.slice(1, fromIdx)
    val selStar = selToks.length == 1 && selToks.head.text == "*"
    val selCols =
      if (selStar) Seq.empty
      else S.splitTopLevel(toks, 1, fromIdx).map { case (a, b) =>
        require(b - a == 1 && (toks(a).kind == S.Ident || toks(a).kind == S.QIdent),
          "statement SELECT list supports * or bare output columns " +
            s"(project/alias inside MEASURES): ${S.textOf(sql, toks, a, b)}")
        toks(a).ident
      }
    require(fromIdx + 1 < toks.length &&
      (toks(fromIdx + 1).kind == S.Ident || toks(fromIdx + 1).kind == S.QIdent),
      s"FROM must name a table/view: $sql")
    val table = toks(fromIdx + 1).ident
    val mrIdx = fromIdx + 2
    require(at(mrIdx, "MATCH_RECOGNIZE") && isSym(mrIdx + 1, "("),
      s"expected MATCH_RECOGNIZE ( after FROM $table: $sql")
    val close = S.closeParen(toks, mrIdx + 1)
    val clause = sql.substring(toks(mrIdx).start, toks(close).end)
    // clause-level PARTITION BY <col> ORDER BY <col>
    var partCol: String = null
    var orderCol: String = null
    var i = mrIdx + 2
    while (i < close) {
      if (at(i, "PARTITION") && at(i + 1, "BY")) {
        require(i + 2 < close, "PARTITION BY needs a column")
        partCol = toks(i + 2).ident
        require(i + 3 >= close || toks(i + 3).text != ",",
          "one PARTITION BY column (the reference's streaming key shape here)")
        i += 3
      } else if (at(i, "ORDER") && at(i + 1, "BY") && orderCol == null) {
        require(i + 2 < close, "ORDER BY needs a column")
        orderCol = toks(i + 2).ident
        i += 3
      } else i += 1
    }
    require(partCol != null, s"MATCH_RECOGNIZE requires PARTITION BY: $sql")
    require(orderCol != null, s"MATCH_RECOGNIZE requires ORDER BY: $sql")
    // optional [AS alias] then optional statement ORDER BY
    var j = close + 1
    if (at(j, "AS")) j += 1
    if (j < toks.length && (toks(j).kind == S.Ident || toks(j).kind == S.QIdent)
        && !toks(j).is("ORDER")) j += 1
    val orderBy = Seq.newBuilder[(String, Boolean)]
    if (at(j, "ORDER") && at(j + 1, "BY")) {
      S.splitTopLevel(toks, j + 2, toks.length).foreach { case (a, b) =>
        val col = toks(a).ident
        val asc = !(b - a > 1 && toks(b - 1).is("DESC"))
        orderBy += ((col, asc))
      }
      j = toks.length
    }
    require(j >= toks.length || (isSym(j, ";") && j == toks.length - 1),
      s"unsupported trailing text after MATCH_RECOGNIZE: " +
        S.textOf(sql, toks, j, toks.length))
    Parsed(selStar, selCols, table, clause, partCol, orderCol,
      orderBy.result())
  }

  /** Canonicalize the source columns for the NFA: key/tsMicros/id
    * derived from the clause's PARTITION BY / ORDER BY; every original
    * column stays visible to DEFINE and MEASURES. */
  private def canonicalize(src: DataFrame, p: Parsed): DataFrame = {
    val fields = src.schema.fields.map(f => f.name -> f.dataType).toMap
    val keyT = fields.getOrElse(p.partCol,
      sys.error(s"PARTITION BY column '${p.partCol}' not in ${p.table}"))
    require(Seq("tinyint", "smallint", "int", "bigint")
        .contains(keyT.simpleString),
      s"PARTITION BY column must be integral (becomes the state key), " +
        s"got ${p.partCol}: $keyT")
    val tsExpr = fields.getOrElse(p.orderCol,
      sys.error(s"ORDER BY column '${p.orderCol}' not in ${p.table}")) match {
      case TimestampType | TimestampNTZType => unix_micros(col(p.orderCol).cast("timestamp"))
      case LongType => col(p.orderCol)
      case other => sys.error(
        s"ORDER BY column must be a timestamp or epoch-micros long, " +
          s"got ${p.orderCol}: $other")
    }
    val idCol = Seq("id", "event_id").find(fields.contains).getOrElse(
      sys.error(s"${p.table} needs an id/event_id column (the deterministic " +
        "within-timestamp tiebreak)"))
    // the id column moves into the canonical `id`, and a copy is ALSO
    // exposed as `event_id`: DEFINE-side references (a running
    // COUNT(B.event_id)) read it from the events frame, while a
    // MEASURES reference like FIRST(A.event_id) resolves to the
    // bindings frame's event_id after the join-back (run() drops the
    // events-side copy before joining, so the reference stays
    // unambiguous)
    val passThrough = src.columns.toSeq
      .filterNot(Set("key", "tsMicros", "id", "event_id", idCol).contains)
      .map(col)
    src.select(Seq(col(p.partCol).cast("long").as("key"),
      tsExpr.cast("long").as("tsMicros"), col(idCol).cast("long").as("id"),
      col(idCol).cast("long").as("event_id"))
      ++ passThrough: _*)
  }

  /** Execute the full statement. Batch views run the batch NFA +
    * measure aggregation; streaming views run the incremental
    * operator (PMatch shape — MEASURES is batch-only there). */
  def sql(spark: SparkSession, stmt: String): DataFrame = {
    val p = parse(stmt)
    val src = spark.table(p.table)
    val events = canonicalize(src, p)
    // a PROCTIME() ORDER BY (StreamExecMatch.scala:197 isProctime —
    // the reference accepts proc-time MATCH_RECOGNIZE) is in-order by
    // construction (micro-batch evaluation time is monotone), so the
    // ordering needs no out-of-orderness allowance: zero watermark
    // delay makes the within-timer fire as soon as processing time
    // passes anchor+within, the reference's proc-time firing (r10).
    // Micro-batch granularity is the documented delta: events of ONE
    // batch share a proctime; strict row-pattern adjacency breaks the
    // tie by id, so same-batch steps chain in id order (the reference
    // stamps per-event arrival times; a micro-batch engine pins the
    // id tiebreak as its sub-batch arrival order)
    val isProctime = src.schema.fields.find(_.name == p.orderCol)
      .exists(_.metadata.contains(GraftDDL.proctimeKey))
    val out0 =
      if (src.isStreaming)
        graft.streaming.StreamingMatchRecognize(spark, events, p.clause,
          watermarkDelay =
            if (isProctime) "0 seconds" else "10 minutes").toDF()
      else graft.operators.MatchRecognize.run(spark, events, p.clause)
    // the partition column keeps its declared name in the output
    val out = if (p.partCol == "key") out0
      else out0.withColumnRenamed("key", p.partCol)
    val selected =
      if (p.selStar) out
      else out.select(p.selCols.map(col): _*)
    if (p.orderBy.isEmpty) selected
    else selected.orderBy(p.orderBy.map { case (c, asc) =>
      if (asc) col(c).asc else col(c).desc }: _*)
  }
}
