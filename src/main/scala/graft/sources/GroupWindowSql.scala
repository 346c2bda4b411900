package graft.sources

import graft.sources.{SqlText => S}

/** Group-window SQL text surface (SURVEY.md §2.4/§2.8 — the
  * reference's most-used streaming SQL form: `GROUP BY TUMBLE(ts,
  * INTERVAL '10' MINUTE)` with the TUMBLE_START/TUMBLE_END/
  * TUMBLE_ROWTIME auxiliaries, plus the HOP and SESSION families;
  * flink-table/.../functions/sql/FlinkSqlOperatorTable.java:868 and
  * the planner/runtime/stream/sql/WindowAggregateITCase corpus).
  *
  * Spark's native window form is `window(ts, '10 minutes')` /
  * `session_window(ts, gap)` — same bucketing semantics, different
  * spelling — so this is a token-level TEXT rewrite that maps the
  * reference's spelling onto Spark's and lets Catalyst plan it (batch
  * and streaming identically; on a watermarked streaming view the
  * rewritten text plans Spark's incremental windowed aggregation):
  *
  *  - `TUMBLE(ts, INTERVAL 'n' U)`            → `window(ts, 'n u')`
  *  - `HOP(ts, INTERVAL 's' U, INTERVAL 'z' U)` → `window(ts, 'z u', 's u')`
  *    (HOP's argument order is slide-then-size; Spark's is
  *    size-then-slide — FlinkSqlOperatorTable HOP vs functions.window)
  *  - `SESSION(ts, INTERVAL 'g' U)`  → `session_window(ts, 'g u')`
  *  - `TUMBLE_START(...)`/`HOP_START(...)`   → `window.start`
  *  - `TUMBLE_END(...)`/`HOP_END(...)`       → `window.end`
  *  - `SESSION_START/END(...)`  → `session_window.start/.end`
  *  - `*_ROWTIME(...)` → `<struct>.end - INTERVAL '0.001' SECOND`
  *    (the rowtime attribute is window end − 1ms — the reference's
  *    SliceAssigners/WindowProperties convention — so a cascaded
  *    window on the rowtime lands in the right outer bucket)
  *
  * The auxiliaries' arguments must textually repeat the group
  * window's (the same rule the reference's validator enforces); they
  * are not re-checked here because the rewrite never reads them — the
  * struct field is the same regardless. Proctime auxiliaries
  * (`*_PROCTIME`) map to the window END — the proctime property
  * convention (r10); processing-time group windows themselves run by
  * grouping on a PROCTIME() computed column (= micro-batch evaluation
  * time), which the TUMBLE/HOP/SESSION rewrites accept like any other
  * timestamp column.
  */
object GroupWindowSql {

  private val groupFns = Map(
    "TUMBLE" -> "window", "HOP" -> "window", "SESSION" -> "session_window")
  private val auxSuffix = Map(
    "_START" -> ".start", "_END" -> ".end",
    "_ROWTIME" -> ".end - INTERVAL '0.001' SECOND",
    // the proctime property of a group window is its END (no −1ms:
    // proc-time has no watermark boundary — the reference's
    // WindowProperties proctime attribute convention); over this
    // engine's PROCTIME() (= micro-batch evaluation time, GraftDDL)
    // a cascaded window on it buckets by the emitting batch's time,
    // the same one-batch-at-a-time proctime the reference's
    // processing-time windows see (r10 — previously failed loudly)
    "_PROCTIME" -> ".end")

  /** Fast probe: does the text mention any group-window name at all?
    * (Callers on the hot parse path skip the full lex when not.) */
  def mentionsGroupWindow(sql: String): Boolean = {
    val up = sql.toUpperCase
    up.contains("TUMBLE") || up.contains("HOP") || up.contains("SESSION") ||
      up.contains("CUMULATE")
  }

  /** `INTERVAL 'n' UNIT` token range → Spark duration string "n unit". */
  private def duration(toks: Vector[S.Tok], from: Int, to: Int): String = {
    require(to - from == 3 && toks(from).is("INTERVAL") &&
        toks(from + 1).kind == S.Str && toks(from + 2).kind == S.Ident,
      s"expected INTERVAL '<n>' <unit>, got: " +
        toks.slice(from, to).map(_.text).mkString(" "))
    val n = toks(from + 1).text.stripPrefix("'").stripSuffix("'")
    val unit = toks(from + 2).text.toLowerCase.stripSuffix("s")
    require(Set("second", "minute", "hour", "day").contains(unit),
      s"unsupported group-window interval unit: $unit")
    s"$n $unit"
  }

  /** "n unit" duration string → milliseconds (HOP TVF window-count
    * arithmetic). */
  private def millisOf(dur: String): Long = {
    val Array(n, unit) = dur.split(" ")
    n.toLong * (unit match {
      case "second" => 1000L
      case "minute" => 60000L
      case "hour"   => 3600000L
      case "day"    => 86400000L
    })
  }

  /** "n unit" → the ANSI `INTERVAL 'n' UNIT` spelling for generated
    * text. */
  private def ansi(dur: String): String = {
    val Array(n, unit) = dur.split(" ")
    s"INTERVAL '$n' ${unit.toUpperCase}"
  }

  /** The windowing-TVF form (the reference's newer spelling,
    * flink-table/.../functions/sql/SqlWindowTableFunction.java):
    * `TABLE(TUMBLE(TABLE src, DESCRIPTOR(ts), INTERVAL '10' MINUTE))`
    * in a FROM clause → a subquery appending the TVF's window_start /
    * window_end / window_time columns via Spark's window() struct.
    *
    * BATCH-side only: extracting `window(ts, …).start` in a projection
    * severs Spark's watermark linkage, so a downstream streaming
    * `GROUP BY window_start` is rejected at start (probed — the
    * analyzer accepts, `writeStream.start` refuses the output mode).
    * On a stream, use the `GROUP BY TUMBLE/HOP/SESSION(…)` spelling,
    * which plans the incremental windowed aggregation (st32/st35).
    *
    * TUMBLE assigns exactly one window per row, so the mapping is a
    * projection. HOP replicates each row into ceil(size/slide)
    * windows: the rewrite anchors the latest slide-aligned start with
    * `window(ts, slide).start` (its own projection level, so Spark's
    * TimeWindowing rule sees it in a plain Project), explodes a
    * sequence of the ceil(size/slide) candidate starts stepping back
    * by the slide, and keeps those whose window still covers the row
    * — the same per-row expansion the reference's
    * StreamExecWindowTableFunction performs, as an Expand the
    * optimizer can see through. CUMULATE (FLIP-145's fourth TVF)
    * replicates each row into the max/step cumulative windows that
    * share its max-aligned start — the same explode shape anchored on
    * `window(ts, max).start`. SESSION windows depend on NEIGHBORING
    * rows (gap merge), which no per-row mapping can express — fail
    * loudly toward the GROUP BY spelling, which covers the
    * capability. */
  /** One parsed `TABLE(FN(TABLE src [PARTITION BY …], DESCRIPTOR(ts),
    * …intervals))` call: everything both the batch rewrite and the
    * streaming GROUP-BY-form rewrite need. `start`/`outerClose` span
    * the whole TABLE(...) text. */
  private final case class TvfCall(fn: String, src: String,
                                   partKeys: List[String], tsCol: String,
                                   args: Seq[(Int, Int)],
                                   start: Int, outerClose: Int)

  private def parseTvfCall(toks: Vector[S.Tok], i: Int,
                           sql: String): Option[TvfCall] = {
    def is(j: Int, kw: String) = j < toks.length && toks(j).is(kw)
    def sym(j: Int, s: String) =
      j < toks.length && toks(j).kind == S.Sym && toks(j).text == s
    if (!(is(i, "TABLE") && sym(i + 1, "("))) return None
    val inner = i + 2
    if (inner >= toks.length || toks(inner).kind != S.Ident) return None
    val fn = toks(inner).text.toUpperCase
    if (!groupFns.contains(fn) && fn != "CUMULATE") return None
    require(sym(inner + 1, "("), s"malformed TVF: $sql")
    val closeInner = S.closeParen(toks, inner + 1)
    val outerClose = S.closeParen(toks, i + 1)
    require(outerClose == closeInner + 1, s"malformed TABLE(...) TVF: $sql")
    val args = S.splitTopLevel(toks, inner + 2, closeInner)
    val arity = if (fn == "HOP" || fn == "CUMULATE") 4 else 3
    require(args.length == arity,
      s"$fn TVF takes (TABLE t, DESCRIPTOR(ts), " +
        s"${if (fn == "HOP") "slide, size"
           else if (fn == "CUMULATE") "step, max size"
           else if (fn == "SESSION") "gap"
           else "size"}): $sql")
    require(is(args(0)._1, "TABLE"),
      s"$fn TVF first argument must be TABLE <source>: $sql")
    // `TABLE src [PARTITION BY k | PARTITION BY (k1, k2, ...)]` — the
    // standard's PTF partitioning, which SESSION requires for keyed
    // sessions (SqlSessionTableFunction); a multi-key list needs its
    // parens, because the TVF argument split is on top-level commas.
    // TUMBLE/HOP map each row independently, so a PARTITION BY there
    // is semantically inert — accepted and ignored, as in the
    // reference.
    val partIdx = (args(0)._1 until args(0)._2)
      .find(k => toks(k).is("PARTITION"))
    val (src, partKeys) = partIdx match {
      case None => (S.textOf(sql, toks, args(0)._1 + 1, args(0)._2), Nil)
      case Some(p) =>
        require(is(p + 1, "BY") && p + 2 < args(0)._2,
          s"$fn TVF: PARTITION must be followed by BY <keys>: $sql")
        val keys =
          if (sym(p + 2, "(")) {
            val c = S.closeParen(toks, p + 2)
            require(c == args(0)._2 - 1, s"malformed PARTITION BY list: $sql")
            S.splitTopLevel(toks, p + 3, c)
              .map { case (a, b) => S.textOf(sql, toks, a, b) }
          } else Seq(S.textOf(sql, toks, p + 2, args(0)._2))
        (S.textOf(sql, toks, args(0)._1 + 1, p), keys.toList)
    }
    require(is(args(1)._1, "DESCRIPTOR"),
      s"$fn TVF second argument must be DESCRIPTOR(<time col>): $sql")
    val tsCol = S.textOf(sql, toks, args(1)._1 + 2, args(1)._2 - 1)
    Some(TvfCall(fn, src, partKeys, tsCol, args, toks(i).start,
      toks(outerClose).end))
  }

  private def rewriteTvf(toks: Vector[S.Tok], i: Int,
                         sql: String): Option[(S.Splice, Int)] = {
    val call = parseTvfCall(toks, i, sql).getOrElse(return None)
    val TvfCall(fn, src, partKeys, tsCol, args, _, _) = call
    val outerClose = S.closeParen(toks, i + 1)
    val repl = fn match {
      case "TUMBLE" =>
        val dur = duration(toks, args(2)._1, args(2)._2)
        val w = s"window($tsCol, '$dur')"
        s"(SELECT *, $w.start AS window_start, $w.end AS window_end, " +
          s"$w.end - INTERVAL '0.001' SECOND AS window_time FROM $src)"
      case "HOP" =>
        val slide = duration(toks, args(2)._1, args(2)._2)
        val size = duration(toks, args(3)._1, args(3)._2)
        val slideMs = millisOf(slide)
        val n = ((millisOf(size) + slideMs - 1) / slideMs).toInt // ceil
        val Array(slideN, slideUnit) = slide.split(" ")
        val back = s"INTERVAL '${(n - 1) * slideN.toLong}' ${slideUnit.toUpperCase}"
        s"""(SELECT * EXCEPT(_gw_smax, _gw_ws), _gw_ws AS window_start,
           |  _gw_ws + ${ansi(size)} AS window_end,
           |  _gw_ws + ${ansi(size)} - INTERVAL '0.001' SECOND AS window_time
           |FROM (SELECT *, explode(sequence(_gw_smax - $back, _gw_smax,
           |                                 ${ansi(slide)})) AS _gw_ws
           |      FROM (SELECT *, window($tsCol, '$slide').start AS _gw_smax
           |            FROM $src))
           |WHERE $tsCol < _gw_ws + ${ansi(size)})""".stripMargin
      case "CUMULATE" =>
        // CUMULATE (FLIP-145; SqlCumulateTableFunction /
        // CumulativeWindowAssigner semantics): every row's windows
        // share one max-size-aligned start W and the ends grow in
        // step increments — [W, W+step), [W, W+2·step), …,
        // [W, W+max); the row belongs to those whose end exceeds its
        // timestamp. Per-row fan-out is bounded by max/step (the
        // reference requires max to be an integral multiple of step,
        // enforced here too), and the expansion is an explode inside
        // the scan partition — no shuffle added beyond the consumer's
        // own GROUP BY window_start, window_end.
        val step = duration(toks, args(2)._1, args(2)._2)
        val size = duration(toks, args(3)._1, args(3)._2)
        require(millisOf(size) % millisOf(step) == 0,
          s"CUMULATE max size must be an integral multiple of step: $sql")
        s"""(SELECT * EXCEPT(_gw_ws, _gw_we), _gw_ws AS window_start,
           |  _gw_we AS window_end,
           |  _gw_we - INTERVAL '0.001' SECOND AS window_time
           |FROM (SELECT *, explode(sequence(_gw_ws + ${ansi(step)},
           |                                 _gw_ws + ${ansi(size)},
           |                                 ${ansi(step)})) AS _gw_we
           |      FROM (SELECT *, window($tsCol, '$size').start AS _gw_ws
           |            FROM $src))
           |WHERE $tsCol < _gw_we)""".stripMargin
      case "SESSION" =>
        // SESSION windows merge NEIGHBORING rows within the gap, so
        // the per-row window is a gaps-and-islands computation, not a
        // projection (SqlSessionTableFunction; runtime semantics =
        // the reference's merging session assigner): a row OPENS a
        // session iff no row of its partition falls in [ts−gap, ts);
        // the running count of openers is the session id; each
        // session's window is [min(ts), max(ts)+gap). Every frame is
        // RANGE-based (peers included), so equal-timestamp rows get
        // identical opener flags and ids regardless of tie order —
        // the result is partition-layout deterministic. One shuffle:
        // the opener pass, id pass, and bounds pass all cluster by
        // the partition keys (the (keys, id) clustering is satisfied
        // by the keys partitioning), so Catalyst plans sorts, not
        // re-shuffles. Keyless SESSION is a single global ordering —
        // inherently serial, exactly as in the reference.
        val gap = ansi(duration(toks, args(2)._1, args(2)._2))
        val pk = partKeys.mkString(", ")
        val over = if (partKeys.isEmpty) "" else s"PARTITION BY $pk "
        val sess = if (partKeys.isEmpty) "PARTITION BY _gw_sid"
                   else s"PARTITION BY $pk, _gw_sid"
        s"""(SELECT * EXCEPT(_gw_new, _gw_sid),
           |  min($tsCol) OVER ($sess) AS window_start,
           |  max($tsCol) OVER ($sess) + $gap AS window_end,
           |  max($tsCol) OVER ($sess) + $gap
           |    - INTERVAL '0.001' SECOND AS window_time
           |FROM (SELECT *, sum(_gw_new) OVER (${over}ORDER BY $tsCol
           |        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           |        AS _gw_sid
           |      FROM (SELECT *, CASE WHEN
           |              count(*) OVER (${over}ORDER BY $tsCol
           |                RANGE BETWEEN $gap PRECEDING AND CURRENT ROW)
           |              = count(*) OVER (PARTITION BY ${
                            if (partKeys.isEmpty) tsCol
                            else s"$pk, $tsCol"})
           |            THEN 1 ELSE 0 END AS _gw_new
           |            FROM $src)))""".stripMargin
    }
    Some((S.Splice(toks(i).start, toks(outerClose).end, repl), outerClose + 1))
  }

  private def isStreamingView(name: String): Boolean =
    scala.util.Try(
      org.apache.spark.sql.SparkSession.active.table(name).isStreaming)
      .getOrElse(false)

  /** Windowing-TVF text over a STREAMING view — the reference's
    * primary spelling, previously rejected loudly: the batch rewrite
    * projects `window(ts, …).start` BEFORE aggregation, which severs
    * Spark's watermark linkage, so here the statement is rewritten to
    * the WATERMARK-PRESERVING `GROUP BY window(ts, …)` form instead:
    *
    *  - the `TABLE(TUMBLE/HOP(TABLE src, DESCRIPTOR(ts), …))` span
    *    becomes just `src`;
    *  - `window_start`/`window_end`/`window_time` appearing as
    *    TOP-LEVEL GROUP BY items collapse into ONE `window(ts, …)`
    *    grouping key (Spark's incremental windowed aggregation —
    *    exactly what the `GROUP BY TUMBLE(...)` legacy spelling
    *    plans, st32/st35);
    *  - every other occurrence becomes `window.start` / `window.end`
    *    / the end−1ms rowtime — resolvable AFTER the aggregate.
    *
    * TUMBLE maps to `window(ts, size)`, HOP to `window(ts, size,
    * slide)`, SESSION to `session_window(ts, gap)` (Spark's native
    * incremental MERGING session aggregation; the PTF's PARTITION BY
    * keys must appear in the consumer's GROUP BY — enforced loudly,
    * since dropping them would silently sessionize globally), and
    * CUMULATE to ONE tumbling step-window aggregate over a per-row
    * shifted fan-out view with per-end firing (see the branch
    * comment). Returns None when the statement has no streaming
    * TVF. */
  private def rewriteStreamingTvfs(sql: String): Option[String] = {
    val toks = S.lex(sql)
    var i = 0
    while (i < toks.length) {
      parseTvfCall(toks, i, sql) match {
        case Some(call) if isStreamingView(call.src) =>
          if (call.fn == "SESSION") {
            // the STREAMING side has exactly what the batch islands
            // rewrite lacks: Spark's native session_window() grouping
            // key plans the incremental MERGING session aggregation
            // (st35's GROUP BY spelling) — so the TVF text maps to it.
            // Spark keys sessions by the consumer's OTHER GROUP BY
            // columns, so the PTF's PARTITION BY keys must appear
            // there — silently dropping one would sessionize globally
            // (wrong rows), so a missing key is loud. The probe reads
            // the bare top-level items of the GROUP BY in the TVF's
            // OWN query block — a statement-global identifier sweep
            // would accept a key grouped only in some unrelated
            // subquery or inside an expression (advisor r9).
            val gap = duration(toks, call.args(2)._1, call.args(2)._2)
            val gbIdents = blockGroupByBareItems(toks, call)
            call.partKeys.foreach { k =>
              require(gbIdents(k.toUpperCase),
                s"SESSION TVF on a STREAMING view: PARTITION BY key $k " +
                  "must appear as a bare item of the consumer's own " +
                  "GROUP BY (Spark keys merging sessions by the " +
                  "grouping columns): " + sql)
            }
            return Some(spliceStreamingTvf(sql, toks, call,
              winExpr = s"session_window(${call.tsCol}, '$gap')",
              endExpr = "session_window.end",
              startExpr = "session_window.start"))
          }
          if (call.fn == "CUMULATE") {
            // CUMULATE on a stream — PER-END firing, single pass
            // (FLIP-145's SqlCumulateTableFunction; the reference
            // fires each cumulate window [W, W+k·step) at ITS OWN end
            // — r9's UNION-ALL-of-branches deferred every emission to
            // the MAX window's maturity and rescanned the source once
            // per branch, VERDICT r9 #1/#3). Each row — slice j =
            // (its offset within the max-aligned window) div step —
            // belongs to the cumulate windows k = j+1..max/step; fan
            // it out per k with its timestamp SHIFTED into the k-th
            // window's FINAL step slice: ts' = ts + (k−1−j)·step. The
            // tumbling window(ts', step) group is then exactly
            // [W+(k−1)·step, W+k·step), which (a) decodes losslessly
            // — window_start = max-floor of its start = W, window_end
            // = its end = W+k·step — and (b) is evicted by Spark when
            // the watermark passes W+k·step: per-end firing with the
            // source's own watermark, because the shift never touches
            // the EventTimeWatermark node computing it. One scan, one
            // incremental tumbling aggregate; per-key live state is
            // the ≤ max/step open step-slices (bounded, same as the
            // reference's slice assigner). SQL text cannot attach
            // watermark metadata to the shifted column, so the
            // fan-out is a registered DataFrame view re-attaching the
            // source column's delay metadata to the shifted alias —
            // the analyzer check reads the metadata; the watermark
            // VALUE still comes from the source node below.
            val step = duration(toks, call.args(2)._1, call.args(2)._2)
            val size = duration(toks, call.args(3)._1, call.args(3)._2)
            val stepMs = millisOf(step)
            val sizeMs = millisOf(size)
            require(sizeMs % stepMs == 0,
              s"CUMULATE max size must be an integral multiple of step: $sql")
            val m = (sizeMs / stepMs).toInt
            val stepUs = stepMs * 1000L
            val sizeUs = sizeMs * 1000L
            val ts = call.tsCol
            val spark = org.apache.spark.sql.SparkSession.active
            val src = spark.table(call.src)
            val tsField = src.schema.fields
              .find(_.name.equalsIgnoreCase(
                ts.stripPrefix("`").stripSuffix("`")))
              .getOrElse(sys.error(
                s"CUMULATE TVF: DESCRIPTOR column $ts not in ${call.src}"))
            require(tsField.metadata.contains("spark.watermarkDelayMs"),
              s"CUMULATE TVF on a STREAMING view needs a watermark on $ts " +
                s"(the per-end firing rides its eviction): $sql")
            // j = offset-in-max-window in step units; pmod keeps
            // pre-1970 timestamps aligned the same way window() does
            val jExpr = s"(pmod(unix_micros($ts), $sizeUs) div $stepUs)"
            val shifted = s"timestampadd(MICROSECOND, " +
              s"(CAST(_graft_k AS BIGINT) - 1 - $jExpr) * $stepUs, $ts)"
            import org.apache.spark.sql.functions.{col, explode, expr}
            val cols = src.columns.toSeq.map { c =>
              if (c == tsField.name) expr(shifted).as(c, tsField.metadata)
              else col(c)
            }
            // the name carries EVERY parameter that shapes the view
            // (source, DESCRIPTOR column, step, max) so two CUMULATEs
            // differing only in the time column cannot clobber each
            // other's registration (review r10)
            val view = (call.src + "_graft_cum_" + ts +
                s"_${stepMs}_$sizeMs")
              .replaceAll("[^A-Za-z0-9_]", "_")
            src.withColumn("_graft_k",
                explode(expr(s"sequence($jExpr + 1, CAST($m AS BIGINT))")))
              .select(cols: _*)
              .createOrReplaceTempView(view)
            return Some(spliceStreamingTvf(sql, toks, call.copy(src = view),
              winExpr = s"window($ts, '$step')",
              startExpr = s"timestamp_micros(unix_micros(window.start) " +
                s"- pmod(unix_micros(window.start), $sizeUs))",
              endExpr = "window.end"))
          }
          val winExpr = call.fn match {
            case "TUMBLE" =>
              val size = duration(toks, call.args(2)._1, call.args(2)._2)
              s"window(${call.tsCol}, '$size')"
            case "HOP" =>
              val slide = duration(toks, call.args(2)._1, call.args(2)._2)
              val size = duration(toks, call.args(3)._1, call.args(3)._2)
              s"window(${call.tsCol}, '$size', '$slide')"
          }
          return Some(spliceStreamingTvf(sql, toks, call, winExpr))
        case _ =>
      }
      i += 1
    }
    None
  }

  /** Character-offset bounds of the TVF's own query BLOCK: the
    * innermost paren pair enclosing the call (the whole statement when
    * the TVF sits at top level). window_* references outside the
    * block belong to other scopes. */
  private def blockBounds(toks: Vector[S.Tok], call: TvfCall): (Int, Int) = {
    var blockFrom = 0
    var blockTo = Int.MaxValue
    val stack = scala.collection.mutable.Stack[Int]()
    var j = 0
    var found = false
    while (j < toks.length && !found) {
      val tj = toks(j)
      if (tj.start >= call.start) {
        if (stack.nonEmpty) {
          val open = stack.top
          val close = S.closeParen(toks, open)
          blockFrom = toks(open).end
          blockTo = toks(close).start
        }
        found = true
      } else if (tj.kind == S.Sym && tj.text == "(") stack.push(j)
      else if (tj.kind == S.Sym && tj.text == ")") {
        if (stack.nonEmpty) { stack.pop(); () }
      }
      j += 1
    }
    (blockFrom, blockTo)
  }

  /** Does the paren at token index `open` start a separate
    * name-resolution SCOPE — a derived table, scalar subquery, or CTE
    * body, i.e. its first non-paren token is SELECT or WITH?
    * Expression parens (function arguments, CASE arms, arithmetic) are
    * NOT scopes: window_* inside them still belongs to the enclosing
    * query block and must be rewritten (advisor r9 —
    * date_format(window_start, …) was previously skipped wholesale and
    * failed analysis or silently bound to a same-named source
    * column). */
  private def opensScope(toks: Vector[S.Tok], open: Int): Boolean = {
    var j = open + 1
    while (j < toks.length && toks(j).kind == S.Sym && toks(j).text == "(")
      j += 1
    j < toks.length && (toks(j).is("SELECT") || toks(j).is("WITH"))
  }

  /** Bare top-level items of the GROUP BY in the TVF's own query block
    * — the uppercased (trailing) identifier of single- or
    * qualified-identifier items; expression items (`f(k)`, `k + 1`)
    * contribute nothing. Drives the SESSION TVF partition-key guard:
    * a statement-global sweep would accept a key grouped only in an
    * unrelated subquery or inside an expression, and the sessions
    * would then silently merge across partition keys. */
  private def blockGroupByBareItems(toks: Vector[S.Tok],
                                    call: TvfCall): Set[String] = {
    val (blockFrom, blockTo) = blockBounds(toks, call)
    val out = Set.newBuilder[String]
    var inGb = false
    // item accumulator: last identifier seen, token count, paren flag
    var itemToks = 0
    var itemLastIdent: String = null
    var itemQualOk = true // shape stays IDENT (. IDENT)* so far
    var itemParens = false
    def flush(): Unit = {
      // any odd-length IDENT (. IDENT)* chain is a bare (possibly
      // multi-part qualified) column — db.t.k included (review r10)
      if (itemLastIdent != null && itemQualOk && !itemParens &&
          itemToks % 2 == 1)
        out += itemLastIdent
      itemToks = 0; itemLastIdent = null; itemQualOk = true
      itemParens = false
    }
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if ((t.start >= call.start && t.end <= call.outerClose) ||
          t.start < blockFrom || t.end > blockTo) { i += 1 }
      else if (t.kind == S.Sym && t.text == "(") {
        // any paren subtree: a subquery's GROUP BY is not this block's;
        // a paren inside an item makes it an expression, not a bare key
        if (inGb) itemParens = true
        i = S.closeParen(toks, i) + 1
      } else {
        if (t.is("GROUP") && i + 1 < toks.length && toks(i + 1).is("BY")) {
          inGb = true; i += 1
        } else if (inGb && t.kind == S.Ident &&
            gbTerminators(t.text.toUpperCase)) {
          flush(); inGb = false
        } else if (inGb && t.kind == S.Sym && t.text == ",") flush()
        else if (inGb && (t.kind == S.Ident || t.kind == S.QIdent)) {
          itemToks += 1
          itemLastIdent = t.ident.toUpperCase
          if (itemToks % 2 == 0) itemQualOk = false // ident in a '.' slot
        } else if (inGb) {
          itemToks += 1
          if (!(t.kind == S.Sym && t.text == "." && itemToks % 2 == 0))
            itemQualOk = false
        }
        i += 1
      }
    }
    if (inGb) flush()
    out.result()
  }

  private val winCols = Set("WINDOW_START", "WINDOW_END", "WINDOW_TIME")
  private val gbTerminators = Set("HAVING", "ORDER", "LIMIT", "WINDOW",
    "UNION", "INTERSECT", "EXCEPT", "QUALIFY")

  /** The token-level statement rewrite for one streaming TVF (see
    * [[rewriteStreamingTvfs]]). `endExpr`/`startExpr` are the scalar
    * replacements for `window_end`/`window_start` — `window.*` for
    * TUMBLE/HOP, `session_window.*` for SESSION, the growing
    * `window.start + k·step` end for a CUMULATE branch. */
  private def spliceStreamingTvf(sql: String, toks: Vector[S.Tok],
                                 call: TvfCall, winExpr: String,
                                 endExpr: String = "window.end",
                                 startExpr: String = "window.start"): String = {
    val edits = Seq.newBuilder[S.Splice]
    edits += S.Splice(call.start, call.outerClose, call.src)
    // the TVF's own query BLOCK (see [[blockBounds]]): window_*
    // references OUTSIDE the block belong to other scopes — an outer
    // query's window_start is a plain output-column reference and is
    // not this rewrite's to touch.
    val (blockFrom, blockTo) = blockBounds(toks, call)
    var depth = 0
    var inGroupBy = false
    var gbDepth = 0
    var gbKeyDone = false
    var inSelect = false
    var selDepth = 0
    var i = 0
    def scalarFor(up: String): String = up match {
      case "WINDOW_START" => startExpr
      case "WINDOW_END" => endExpr
      case _ => s"($endExpr - INTERVAL '0.001' SECOND)"
    }
    while (i < toks.length) {
      val t = toks(i)
      // skip the TVF span itself (already spliced) and everything
      // outside the TVF's query block
      if ((t.start >= call.start && t.end <= call.outerClose) ||
          t.start < blockFrom || t.end > blockTo) { i += 1 }
      else if (t.kind == S.Sym && t.text == "(" && {
          // a SIBLING scope — a paren subtree that does NOT contain
          // the TVF AND opens a genuinely separate name-resolution
          // scope (first non-paren token SELECT/WITH: CTE bodies,
          // scalar subqueries, other derived tables) — is skipped
          // wholesale: its window_* columns are not this rewrite's to
          // touch. Plain EXPRESSION parens (function arguments, CASE
          // arms) stay in scope: window_* inside them gets the scalar
          // form — date_format(window_start, …) in the select list or
          // a HAVING over max(window_time) must rewrite, not skip
          // (advisor r9).
          val close = S.closeParen(toks, i)
          !(t.start <= call.start && toks(close).end >= call.outerClose) &&
            opensScope(toks, i) && {
              i = close + 1; true
            }
        }) { /* skipped to the subtree's end */ }
      else {
        if (t.kind == S.Sym && t.text == "(") depth += 1
        else if (t.kind == S.Sym && t.text == ")") {
          depth -= 1
          if (inGroupBy && depth < gbDepth) inGroupBy = false
        }
        if (t.is("SELECT")) { inSelect = true; selDepth = depth }
        else if (inSelect && depth == selDepth && t.is("FROM")) inSelect = false
        if (t.is("GROUP") && i + 1 < toks.length && toks(i + 1).is("BY")) {
          inGroupBy = true; gbDepth = depth; gbKeyDone = false; i += 1
        } else if (inGroupBy && depth == gbDepth && t.kind == S.Ident &&
            gbTerminators(t.text.toUpperCase)) {
          inGroupBy = false
        } else if (t.kind == S.Ident && winCols(t.text.toUpperCase)) {
          val up = t.text.toUpperCase
          // a source-alias qualifier (t.window_start — the TVF's
          // derived-table alias) folds into the replacement span: the
          // window struct is unqualified after the rewrite
          val prev1 = if (i > 0) toks(i - 1) else null
          val qualified = prev1 != null && prev1.kind == S.Sym &&
            prev1.text == "." && i >= 2 &&
            (toks(i - 2).kind == S.Ident || toks(i - 2).kind == S.QIdent)
          val spliceFrom = if (qualified) toks(i - 2).start else t.start
          // a bare top-level GROUP BY item: neighbors are BY/commas/
          // clause boundaries — anything else means the column sits
          // inside a bigger expression and gets the scalar form
          val prevTok =
            if (qualified) { if (i >= 3) toks(i - 3) else null } else prev1
          val nextTok = if (i + 1 < toks.length) toks(i + 1) else null
          val bareItem = inGroupBy && depth == gbDepth &&
            (prevTok == null || prevTok.is("BY") ||
              (prevTok.kind == S.Sym && prevTok.text == ",")) &&
            (nextTok == null ||
              (nextTok.kind == S.Sym && (nextTok.text == "," || nextTok.text == ")")) ||
              (nextTok.kind == S.Ident && gbTerminators(nextTok.text.toUpperCase)))
          if (bareItem) {
            if (!gbKeyDone) { edits += S.Splice(spliceFrom, t.end, winExpr); gbKeyDone = true }
            else {
              // drop the duplicate key together with its leading comma
              val from = if (prevTok != null && prevTok.kind == S.Sym &&
                prevTok.text == ",") prevTok.start else spliceFrom
              edits += S.Splice(from, t.end, "")
            }
          } else {
            // a BARE select-list item keeps its output name: the next
            // token ends the item (comma / FROM) and no alias follows
            val bareSelectItem = inSelect && depth == selDepth &&
              nextTok != null && (nextTok.is("FROM") ||
                (nextTok.kind == S.Sym && nextTok.text == ","))
            val repl = if (bareSelectItem)
              s"${scalarFor(up)} AS ${t.text}" else scalarFor(up)
            edits += S.Splice(spliceFrom, t.end, repl)
          }
        }
        i += 1
      }
    }
    S.splice(sql, edits.result())
  }

  /** Rewrite every group-window call in the statement; text without
    * any is returned unchanged. A malformed call fails loudly —
    * silently passing it to Spark would produce an
    * unresolved-function error naming the wrong dialect. */
  def rewrite(sql: String): String = {
    if (!mentionsGroupWindow(sql)) return sql
    rewriteStreamingTvfs(sql) match {
      case Some(rewritten) => return rewrite(rewritten)
      case None =>
    }
    val toks = S.lex(sql)
    val edits = Seq.newBuilder[S.Splice]
    var i = 0
    while (i < toks.length) {
      val tvf = rewriteTvf(toks, i, sql)
      if (tvf.isDefined) {
        edits += tvf.get._1
        i = tvf.get._2
      } else {
      val t = toks(i)
      val isCall = t.kind == S.Ident && i + 1 < toks.length &&
        toks(i + 1).kind == S.Sym && toks(i + 1).text == "("
      val up = if (t.kind == S.Ident) t.text.toUpperCase else ""
      if (isCall && groupFns.contains(up)) {
        val close = S.closeParen(toks, i + 1)
        val args = S.splitTopLevel(toks, i + 2, close)
        val tsText = S.textOf(sql, toks, args.head._1, args.head._2)
        val repl = up match {
          case "TUMBLE" =>
            require(args.length == 2, s"TUMBLE takes (time, size): $sql")
            s"window($tsText, '${duration(toks, args(1)._1, args(1)._2)}')"
          case "HOP" =>
            require(args.length == 3, s"HOP takes (time, slide, size): $sql")
            val slide = duration(toks, args(1)._1, args(1)._2)
            val size = duration(toks, args(2)._1, args(2)._2)
            s"window($tsText, '$size', '$slide')"
          case "SESSION" =>
            require(args.length == 2, s"SESSION takes (time, gap): $sql")
            s"session_window($tsText, '${duration(toks, args(1)._1, args(1)._2)}')"
        }
        edits += S.Splice(t.start, toks(close).end, repl)
        i = close + 1
      } else if (isCall && auxSuffix.keys.exists(s => up.endsWith(s)) &&
          groupFns.contains(auxSuffix.keys.filter(up.endsWith)
            .foldLeft(up)((n, s) => n.stripSuffix(s)))) {
        val suffix = auxSuffix.keys.find(up.endsWith).get
        val family = up.stripSuffix(suffix)
        val struct = groupFns(family)
        val close = S.closeParen(toks, i + 1)
        edits += S.Splice(t.start, toks(close).end, s"$struct${auxSuffix(suffix)}")
        i = close + 1
      } else if (isCall && up == "CUMULATE") {
        // The reference defines CUMULATE ONLY as a windowing TVF
        // (FLIP-145) — there is no GROUP BY CUMULATE(...) legacy form
        // — so a bare call here is a dialect error, not something to
        // hand Spark (which would name the wrong function).
        sys.error("CUMULATE is a windowing TVF: use FROM TABLE(" +
          "CUMULATE(TABLE t, DESCRIPTOR(ts), step, max)) — there is " +
          "no GROUP BY CUMULATE form")
      } else i += 1
      }
    }
    val es = edits.result()
    if (es.isEmpty) sql else S.splice(sql, es)
  }
}
