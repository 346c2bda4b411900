package graft.plans

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project, Union, UnresolvedHint, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Planner recognition of the temporal (as-of) join SQL shape —
  * the reference rewrites `FOR SYSTEM_TIME AS OF` correlates into its
  * temporal-join operator at plan time
  * (flink-table/flink-table-planner-blink/src/main/scala/org/apache/
  * flink/table/planner/plan/rules/logical/
  * LogicalCorrelateToJoinFromTemporalTableRule.scala:34). Spark's
  * grammar reserves `FOR SYSTEM_TIME AS OF` for constant time travel,
  * so the recognized surface here is two-layered:
  *
  *  1. [[graft.sources.GraftSqlParser]] rewrites the reference's exact
  *     textual form (`JOIN versioned FOR SYSTEM_TIME AS OF l.ts AS r
  *     ON ...`) into the hinted shape below, pulling the versioned
  *     side's rowtime from its DDL WATERMARK declaration — the same
  *     place the reference finds it.
  *  2. This resolution rule plans the hinted shape: a join marked
  *     `/*+ ASOF_JOIN */` whose condition is equi-key conjuncts plus
  *     exactly one `r.time <= l.time` bound.
  *
  * The produced plan is [[graft.operators.AsOfJoin]]'s scale shape —
  * union both sides, ONE window pass per key carrying the latest
  * right-side version forward (single shuffle, linear, spillable) —
  * generalized to expose EVERY right column of the matched version
  * under its original attribute ids, so `r.rate` in the outer SELECT
  * resolves untouched. INNER drops left rows with no preceding
  * version (the reference's inner temporal join); LEFT keeps them with
  * null right columns. At equal timestamps the version row sorts
  * before the probe row, so an exact tie matches (ASOF `>=`).
  * Versions are assumed unique per (key, time) — the reference's
  * versioned-table contract.
  */
object AsOfJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase("ASOF_JOIN") && child.resolved =>
      // hint parameters (emitted by GraftSqlParser) name the versioned
      // sides' rowtime columns: only a join whose time bound uses one
      // of them is the temporal join — an unrelated range join in the
      // same block must not be hijacked. A bare hint (library users)
      // matches any shape.
      val rowtimes: Set[String] = params.collect {
        case UnresolvedAttribute(parts) => parts.last.toLowerCase
        case a: Attribute => a.name.toLowerCase
      }.toSet
      var rewritten = 0
      val out = child.transformUp {
        case j @ Join(l, r, jt, Some(cond), _) if jt == Inner || jt == LeftOuter =>
          matchShape(l, r, cond)
            .filter { case (_, _, rt) =>
              rowtimes.isEmpty || rowtimes.contains(rt.name.toLowerCase) }
            .map { case (keys, lt, rt) =>
              rewritten += 1; rewrite(l, r, jt == Inner, keys, lt, rt) }
            .getOrElse(j)
        // The temporal-table-FUNCTION correlate (LATERAL TABLE
        // (Rates(o.ts)) — GraftSqlParser.rewriteLateralTemporal) leaves
        // the version-key equality in the WHERE clause, exactly where
        // the reference's users write it; its converter relies on
        // filter-into-join pushdown before the temporal rule fires
        // (LogicalCorrelateToJoinFromTemporalTableFunctionRule.scala).
        // This analysis-time rule runs BEFORE pushdown, so it performs
        // the same move itself: key-equality conjuncts of the Filter
        // directly above the join are consumed into the as-of match and
        // every other conjunct stays as a residual Filter over the
        // as-of output (whose right columns keep their original
        // attribute ids, so those residuals resolve untouched).
        // INNER only: for a LEFT OUTER join a WHERE key equality
        // eliminates the null-padded rows (null = x is not true), so
        // consuming it into an outer as-of match would RESURRECT rows
        // the plain-Spark semantics discard — those stay un-rewritten
        // (and trip the loud no-match guard rather than mis-answer).
        case f @ Filter(fc, Join(l, r, jt, Some(cond), _)) if jt == Inner =>
          val fcs = splitConjunctivePredicates(fc)
          val (keyConjs, residual) = fcs.partition {
            case EqualTo(a: Attribute, b: Attribute) =>
              (l.outputSet.contains(a) && r.outputSet.contains(b)) ||
                (l.outputSet.contains(b) && r.outputSet.contains(a))
            case _ => false
          }
          if (keyConjs.isEmpty) f
          else matchShape(l, r, (splitConjunctivePredicates(cond) ++ keyConjs)
              .reduce(And))
            .filter { case (_, _, rt) =>
              rowtimes.isEmpty || rowtimes.contains(rt.name.toLowerCase) }
            .map { case (keys, lt, rt) =>
              rewritten += 1
              val asof = rewrite(l, r, jt == Inner, keys, lt, rt)
              if (residual.isEmpty) asof else Filter(residual.reduce(And), asof)
            }
            .getOrElse(f)
      }
      // the hint PROMISES as-of semantics — silently leaving the raw
      // `r.time <= l.time` join (every version multiplying) would be a
      // wrong answer, not a fallback. Fail loudly instead.
      if (rewritten == 0)
        sys.error("ASOF_JOIN hint did not match any join: expected " +
          "equi-key conjuncts plus exactly one r.time <= l.time bound" +
          (if (rowtimes.nonEmpty) s" on rowtime ${rowtimes.mkString(",")}" else ""))
      out
  }

  /** Some((left key, right key) pairs, left time, right time) iff the
    * condition is equi-key conjuncts ∧ exactly one r.time <= l.time. */
  private def matchShape(l: LogicalPlan, r: LogicalPlan, cond: Expression)
      : Option[(Seq[(Attribute, Attribute)], Attribute, Attribute)] = {
    val lset = l.outputSet
    val rset = r.outputSet
    val keys = Seq.newBuilder[(Attribute, Attribute)]
    var time: Option[(Attribute, Attribute)] = None
    var ok = true
    splitConjunctivePredicates(cond).foreach {
      case EqualTo(a: Attribute, b: Attribute)
          if lset.contains(a) && rset.contains(b) => keys += ((a, b))
      case EqualTo(b: Attribute, a: Attribute)
          if lset.contains(a) && rset.contains(b) => keys += ((a, b))
      case LessThanOrEqual(rt: Attribute, lt: Attribute)
          if rset.contains(rt) && lset.contains(lt) && time.isEmpty =>
        time = Some((lt, rt))
      case GreaterThanOrEqual(lt: Attribute, rt: Attribute)
          if lset.contains(lt) && rset.contains(rt) && time.isEmpty =>
        time = Some((lt, rt))
      case _ => ok = false
    }
    val ks = keys.result()
    if (ok && ks.nonEmpty && time.exists(t => t._1.dataType == t._2.dataType) &&
        ks.forall(p => p._1.dataType == p._2.dataType))
      time.map(t => (ks, t._1, t._2))
    else None
  }

  private def rewrite(l: LogicalPlan, r: LogicalPlan, inner: Boolean,
                      keys: Seq[(Attribute, Attribute)],
                      lt: Attribute, rt: Attribute): LogicalPlan = {
    val lOut = l.output
    val rOut = r.output
    val nk = keys.size
    // column layout below the union: keys, _t, _side, version STRUCT,
    // left cols — fresh names/ids; the original ids re-surface at the
    // top. The version travels as ONE struct so last(_, ignoreNulls)
    // carries WHOLE versions forward: a per-column last would reach
    // back to an OLDER version for any column legitimately NULL in
    // the matched one, emitting a row that never existed.
    val vType = org.apache.spark.sql.types.StructType(
      rOut.map(a => org.apache.spark.sql.types.StructField(
        a.name, a.dataType, nullable = true)))
    val rProj = Project(
      keys.zipWithIndex.map { case ((_, rk), i) => Alias(rk, s"_asof_k$i")() } ++
        Seq(Alias(rt, "_asof_t")(), Alias(Literal(0), "_asof_side")(),
          Alias(CreateStruct(rOut), "_asof_v")()) ++
        lOut.map(a => Alias(Literal.create(null, a.dataType), s"_asof_l_${a.name}")()),
      r)
    val lProj = Project(
      keys.zipWithIndex.map { case ((lk, _), i) => Alias(lk, s"_asof_k$i")() } ++
        Seq(Alias(lt, "_asof_t")(), Alias(Literal(1), "_asof_side")(),
          Alias(Literal.create(null, vType), "_asof_v")()) ++
        lOut.map(a => Alias(a, s"_asof_l_${a.name}")()),
      l)
    val union = Union(Seq(rProj, lProj))
    val uOut = union.output
    val keyAttrs: Seq[Expression] = uOut.take(nk)
    val tAttr = uOut(nk)
    val sideAttr = uOut(nk + 1)
    val vAttr = uOut(nk + 2)
    val lAttrs = uOut.drop(nk + 3)
    val orderSpec = Seq(SortOrder(tAttr, Ascending), SortOrder(sideAttr, Ascending))
    val spec = WindowSpecDefinition(keyAttrs, orderSpec,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    // last(version struct, ignoreNulls) over (key | t, side) carries
    // the most recent WHOLE version forward (null only when no version
    // precedes the probe row).
    val vWin = Alias(
      WindowExpression(
        AggregateExpression(Last(vAttr, ignoreNulls = true), Complete, isDistinct = false),
        spec),
      "_asof_vw")()
    val win = Window(Seq(vWin), keyAttrs, orderSpec, union)
    val vw = vWin.toAttribute
    val probeRows = Filter(EqualTo(sideAttr, Literal(1)), win)
    val matched =
      if (inner) Filter(IsNotNull(vw), probeRows) else probeRows
    // unpack the matched version's fields back onto the ORIGINAL right
    // attribute ids so references above the join resolve to them.
    Project(
      lOut.zip(lAttrs).map { case (orig, u) =>
        Alias(u, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
      } ++ rOut.zipWithIndex.map { case (orig, i) =>
        Alias(GetStructField(vw, i, Some(orig.name)), orig.name)(
          exprId = orig.exprId, qualifier = orig.qualifier)
      },
      matched)
  }
}
