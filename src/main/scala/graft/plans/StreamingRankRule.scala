package graft.plans

import graft.streaming.{GEvent, StreamingDedupKeepFirst, StreamingDedupKeepLast, StreamingTopN}
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias, Window}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.IntegerType

/** Streaming recognition of the SQL rank shape — the reference plans
  * `row_number() OVER (PARTITION BY k ORDER BY s) <= N` on a stream
  * into its stateful Rank / Deduplicate operators instead of a window
  * sort (flink-table/flink-table-planner-blink/src/main/scala/org/
  * apache/flink/table/planner/plan/rules/logical/
  * FlinkLogicalRankRule.scala:39 and
  * .../physical/stream/StreamExecDeduplicateRule.scala).
  *
  * Spark has no streaming SQL rank surface at all: the analyzer
  * accepts the query but `writeStream.start()` rejects any
  * non-time-based window function on a streaming DataFrame. This rule
  * closes that gap the same way the reference does — recognize the
  * logical shape, route to the incremental operator:
  *
  *  - `rn <= N` ordered DESCENDING on a metric column →
  *    [[graft.streaming.StreamingTopN]] (per-key top-n buffer in keyed
  *    state, Update-mode revisions; ties broken by `id` ascending, so
  *    a secondary `id` sort key, if present, must be ascending);
  *  - `rn = 1` ordered ASCENDING on the event-time column →
  *    keep-first deduplication: the canonical keyed-event shape routes
  *    to [[graft.streaming.StreamingDedupKeepFirst]] (rowtime
  *    DeduplicateKeepFirstRowFunction semantics — the batch-equal
  *    first row per group, exactly once, at watermark maturity);
  *    other shapes fall back to `dropDuplicates` (arrival-order /
  *    proctime dedup state);
  *  - `rn = 1` ordered DESCENDING on the event-time column →
  *    [[graft.streaming.StreamingDedupKeepLast]]
  *    (DeduplicateKeepLastRowFunction: an update stream of the latest
  *    row per group, folded to the final row by max emitSeq).
  *
  * The TopN route requires the canonical keyed-event column shape the
  * streaming operators share (`key, tsMicros, id, kind, value` — the
  * reference's RowData contract plays the same role); the ORDER BY
  * column becomes the ranking `value`. Output is the operator's
  * changelog shape ([[graft.streaming.TopNEmit]]), folded to the final
  * ranking by max(emitSeq) — exactly how st4 consumes it.
  */
object StreamingRankRule {

  /** The recognized rank shape: rank attribute, limit N (and the
    * range start — 1 unless the filter carries a lower bound), window
    * partition/order, and the plan BELOW the Window node (the input
    * the stateful operator consumes). */
  case class RankShape(limit: Long, startRank: Long,
                       partition: Seq[Attribute],
                       order: Seq[SortOrder], child: LogicalPlan)

  /** Upper bound: `rn <= N` / `rn < N+1` / reversed — (rank attr, N). */
  private def upperBound(cond: Expression): Option[(Attribute, Long)] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(n: Int, IntegerType)) =>
      Some((a, n.toLong))
    case LessThan(a: AttributeReference, Literal(n: Int, IntegerType)) =>
      Some((a, n.toLong - 1))
    case GreaterThanOrEqual(Literal(n: Int, IntegerType), a: AttributeReference) =>
      Some((a, n.toLong))
    case GreaterThan(Literal(n: Int, IntegerType), a: AttributeReference) =>
      Some((a, n.toLong - 1))
    case _ => None
  }

  /** Lower bound: `rn > L` / `rn >= L+1` / reversed — (rank attr, first
    * SELECTED rank). */
  private def lowerBound(cond: Expression): Option[(Attribute, Long)] = cond match {
    case GreaterThan(a: AttributeReference, Literal(n: Int, IntegerType)) =>
      Some((a, n.toLong + 1))
    case GreaterThanOrEqual(a: AttributeReference, Literal(n: Int, IntegerType)) =>
      Some((a, n.toLong))
    case LessThan(Literal(n: Int, IntegerType), a: AttributeReference) =>
      Some((a, n.toLong + 1))
    case LessThanOrEqual(Literal(n: Int, IntegerType), a: AttributeReference) =>
      Some((a, n.toLong))
    case _ => None
  }

  /** `rn <= N` / `rn = K` / `rn > L AND rn <= N` (the reference's
    * RankRange — AbstractTopNFunction rankStart/rankEnd; r10) —
    * (rank attr, startRank, limit). */
  private def rankLimit(cond: Expression): Option[(Attribute, Long, Long)] =
    cond match {
      case EqualTo(a: AttributeReference, Literal(n: Int, IntegerType)) =>
        Some((a, n.toLong, n.toLong))
      case EqualTo(Literal(n: Int, IntegerType), a: AttributeReference) =>
        Some((a, n.toLong, n.toLong))
      case And(l, r) =>
        for {
          (ua, hi) <- upperBound(l).orElse(upperBound(r))
          (la, lo) <- lowerBound(l).orElse(lowerBound(r))
          if ua.exprId == la.exprId && lo <= hi
          // a redundant lower bound (`rn >= 0`) clamps to rank 1 — it
          // selects 1..hi, the plain top-n
        } yield (ua, lo max 1L, hi)
      case _ => upperBound(cond).map { case (a, hi) => (a, 1L, hi) }
    }

  /** Descend from the rank filter to the Window that produced the rank
    * attribute, crossing ONLY pass-through nodes (Project that keeps
    * the attribute un-re-aliased, SubqueryAlias). Anything else — an
    * intermediate Filter, a join, an aggregate — means the routed
    * operator would NOT see the rows the SQL text describes, so the
    * shape must not be recognized (collectFirst over the whole subtree
    * would silently skip such operators). */
  private def findWindow(plan: LogicalPlan,
                         rn: Attribute): Option[(WindowSpecDefinition, LogicalPlan)] =
    plan match {
      case w: Window =>
        w.windowExpressions.collectFirst {
          case a @ Alias(WindowExpression(_: RowNumber,
              s: WindowSpecDefinition), _) if a.exprId == rn.exprId =>
            (s, w.child)
        }
      case p: Project if p.projectList.exists {
          case a: Attribute => a.exprId == rn.exprId
          case _ => false
        } => findWindow(p.child, rn)
      case s: SubqueryAlias => findWindow(s.child, rn)
      case _ => None
    }

  /** The rank-shape check at a single Filter node. */
  private def shapeAt(plan: LogicalPlan): Option[RankShape] = plan match {
    case Filter(cond, fchild) =>
      for {
        (rn, startRank, limit) <- rankLimit(cond)
        (spec, child) <- findWindow(fchild, rn)
        parts <- Some(spec.partitionSpec).collect {
          case ps if ps.nonEmpty && ps.forall(_.isInstanceOf[AttributeReference]) =>
            ps.map(_.asInstanceOf[AttributeReference].asInstanceOf[Attribute])
        }
        if spec.orderSpec.nonEmpty &&
          spec.orderSpec.forall(_.child.isInstanceOf[AttributeReference])
      } yield RankShape(limit, startRank, parts, spec.orderSpec, child)
    case _ => None
  }

  /** Recognize the Filter(rank-limit) … Window(row_number) shape in an
    * analyzed plan. The rank attribute must be produced by a Window
    * node below the filter through pass-through nodes only, AND the
    * filter must be the plan ROOT modulo the same pass-through nodes
    * (attribute-only Project, SubqueryAlias): the routed operator
    * replaces the whole query, so any operator ABOVE the rank filter
    * (an aggregate, another filter, a join) would be silently
    * discarded — exactly the mis-route the reference's rule ordering
    * prevents. */
  def recognize(df: DataFrame): Option[RankShape] =
    rootShape(df.queryExecution.analyzed)

  private def rootShape(plan: LogicalPlan): Option[RankShape] = plan match {
    case f: Filter => shapeAt(f)
    case p: Project if p.projectList.forall(_.isInstanceOf[Attribute]) =>
      rootShape(p.child)
    case s: SubqueryAlias => rootShape(s.child)
    case _ => None
  }

  /** A rank shape buried below NON-pass-through operators: recognizing
    * it would discard those operators, so `rewrite` fails loudly
    * instead of routing (the round-6 silent-discard defect). */
  private def buriedShape(plan: LogicalPlan): Boolean =
    rootShape(plan).isEmpty &&
      plan.collectFirst(Function.unlift(shapeAt)).isDefined

  /** Names Spark/the corpus use for event-time columns — the only
    * ORDER BY columns for which an arrival-order dedup fallback is
    * semantically defensible (proctime ≈ rowtime on an in-order feed).
    * An rn=1 ordered by a VALUE column must never silently become
    * "whichever row arrived first". */
  private val timeColNames = Set("tsmicros", "ts", "timestamp", "rowtime",
    "proctime", "event_time", "eventtime")

  /** The canonical keyed-event dedup shape: canonical columns present,
    * partition ⊆ {key, kind} incl. key, tsMicros order with an optional
    * id tiebreak in `dir`. */
  private def canonicalDedupShape(child: DataFrame, s: RankShape,
                                  orderCol: String,
                                  dir: SortDirection): Boolean = {
    val names = s.partition.map(_.name).toSet
    Seq("key", "tsMicros", "id", "kind", "value").forall(child.columns.contains) &&
      orderCol == "tsMicros" &&
      names.subsetOf(Set("key", "kind")) && names.contains("key") &&
      s.order.drop(1).forall(so =>
        so.child.asInstanceOf[AttributeReference].name == "id" &&
          so.direction == dir)
  }

  private def asGEvents(spark: SparkSession, child: DataFrame,
                        s: RankShape): org.apache.spark.sql.Dataset[GEvent] = {
    import spark.implicits._
    child.select("key", "tsMicros", "id", "kind", "value").as[GEvent]
  }

  /** Route a recognized rank-shaped streaming DataFrame to the
    * incremental operator. None = not the rank shape (caller falls
    * back to whatever it had); a recognized shape the operators cannot
    * honor fails loudly rather than degrade semantics. */
  def rewrite(spark: SparkSession, df: DataFrame): Option[DataFrame] = {
    require(!buriedShape(df.queryExecution.analyzed),
      "rank shape found below non-pass-through operators (e.g. an aggregate " +
        "or extra filter ABOVE the rank filter): routing would silently " +
        "discard those operators — not routable")
    recognize(df).map { s =>
      require(s.limit >= 1,
        s"rank limit ${s.limit} selects no rows: refusing to route to an " +
          "operator that would emit an empty changelog")
      require(s.startRank >= 1 && s.startRank <= s.limit,
        s"rank range [${s.startRank}, ${s.limit}] selects no rows")
      import spark.implicits._
      val child = GraftSqlBridge.ofRows(spark, s.child)
      val orderCol = s.order.head.child.asInstanceOf[AttributeReference].name
      val ascending = s.order.head.direction == Ascending
      if (s.limit == 1L && ascending) {
        // startRank is necessarily 1 here (1 <= startRank <= limit == 1)
        // keep-first dedup (StreamExecDeduplicateRule's keep-first):
        // ORDER BY <time> ASC, rn = 1. Canonical shape → the
        // EVENT-TIME dedup operator (rowtime
        // DeduplicateKeepFirstRowFunction: the batch-equal first row,
        // exactly once, at watermark maturity); other shapes fall back
        // to dropDuplicates (arrival-order/proctime state) ONLY when
        // ordering by a time column — first-by-arrival for a value
        // ordering would be a silently different answer.
        if (canonicalDedupShape(child, s, orderCol, Ascending))
          StreamingDedupKeepFirst(spark, asGEvents(spark, child, s),
            byKind = s.partition.exists(_.name == "kind")).toDF()
        else {
          require(timeColNames.contains(orderCol.toLowerCase),
            s"rn=1 ordered ASC by non-time column '$orderCol': arrival-order " +
              "dedup state cannot honor a value ordering — not routable")
          // ARRIVAL-order state (dropDuplicates) can keep a different
          // row than the SQL text's event-time rank-1 on an
          // out-of-order multi-partition stream, so the degradation is
          // opt-in, never silent (ADVICE r6).
          require(spark.conf.getOption(
              "graft.streaming.rank.arrivalOrderFallback").exists(_.toBoolean),
            s"rn=1 ASC by '$orderCol' outside the canonical keyed-event shape " +
              "is only honorable by ARRIVAL-order dedup state, which may keep " +
              "a different row than the event-time rank-1; set " +
              "graft.streaming.rank.arrivalOrderFallback=true to accept that")
          child.dropDuplicates(s.partition.map(_.name))
        }
      } else if (s.limit == 1L &&
          canonicalDedupShape(child, s, orderCol, Descending)) {
        // keep-last dedup (DeduplicateKeepLastRowFunction): rn=1
        // ORDER BY <time> DESC — an update stream of the latest row
        // per group, folded to the final row by max(emitSeq)
        StreamingDedupKeepLast(spark, asGEvents(spark, child, s),
          byKind = s.partition.exists(_.name == "kind")).toDF()
      } else {
        require(!ascending,
          "streaming rank supports ORDER BY ... DESC (top-n) or rn=1 ASC (dedup)")
        require(s.partition.size == 1,
          "streaming top-n recognizes a single partition key")
        s.order.drop(1).foreach { so =>
          val n = so.child.asInstanceOf[AttributeReference].name
          require(n == "id" && so.direction == Ascending,
            s"streaming top-n breaks ties by id ASC; unsupported sort key: $n")
        }
        val canonical = Seq("key", "tsMicros", "id", "kind")
        canonical.foreach(c => require(child.columns.contains(c),
          s"streaming top-n needs the canonical keyed-event shape; missing: $c"))
        // GEvent.key is a long: a non-integral partition column would
        // cast to NULL and silently collapse groups
        val pType = child.schema(s.partition.head.name).dataType
        require(Seq("tinyint", "smallint", "int", "bigint")
            .contains(pType.simpleString),
          s"streaming top-n partition key must be integral, got $pType")
        val ds = child.select(
          col(s.partition.head.name).cast("long").as("key"),
          col("tsMicros").cast("long"),
          col("id").cast("long"),
          col("kind"),
          col(orderCol).cast("double").as("value")).as[GEvent]
        StreamingTopN(spark, ds, n = s.limit.toInt,
          startRank = s.startRank.toInt).toDF()
      }
    }
  }

  /** SQL-text surface: parse, recognize, route — fails loudly when the
    * text is not the rank shape (mirrors the reference, where the rule
    * either fires or the statement is rejected for a stream). */
  def sql(spark: SparkSession, sqlText: String): DataFrame = {
    val df = spark.sql(sqlText)
    rewrite(spark, df).getOrElse(
      sys.error("not a streaming rank shape: expected " +
        "row_number() OVER (PARTITION BY k ORDER BY s) <= N above a stream"))
  }
}
