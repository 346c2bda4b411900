package graft.plans

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
    case UnresolvedHint(name, _, child)
        if name.equalsIgnoreCase("ASOF_JOIN") && child.resolved =>
      child.transformUp {
        case j @ Join(l, r, jt, Some(cond), _) if jt == Inner || jt == LeftOuter =>
          matchShape(l, r, cond)
            .map { case (keys, lt, rt) => rewrite(l, r, jt == Inner, keys, lt, rt) }
            .getOrElse(j)
      }
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
    // column layout below the union: keys, _t, _side, right cols, left
    // cols — fresh names/ids; the original ids re-surface at the top.
    val rProj = Project(
      keys.zipWithIndex.map { case ((_, rk), i) => Alias(rk, s"_asof_k$i")() } ++
        Seq(Alias(rt, "_asof_t")(), Alias(Literal(0), "_asof_side")()) ++
        rOut.map(a => Alias(a, s"_asof_r_${a.name}")()) ++
        lOut.map(a => Alias(Literal.create(null, a.dataType), s"_asof_l_${a.name}")()),
      r)
    val lProj = Project(
      keys.zipWithIndex.map { case ((lk, _), i) => Alias(lk, s"_asof_k$i")() } ++
        Seq(Alias(lt, "_asof_t")(), Alias(Literal(1), "_asof_side")()) ++
        rOut.map(a => Alias(Literal.create(null, a.dataType), s"_asof_r_${a.name}")()) ++
        lOut.map(a => Alias(a, s"_asof_l_${a.name}")()),
      l)
    val union = Union(Seq(rProj, lProj))
    val uOut = union.output
    val keyAttrs: Seq[Expression] = uOut.take(nk)
    val tAttr = uOut(nk)
    val sideAttr = uOut(nk + 1)
    val rAttrs = uOut.slice(nk + 2, nk + 2 + rOut.size)
    val lAttrs = uOut.drop(nk + 2 + rOut.size)
    val orderSpec = Seq(SortOrder(tAttr, Ascending), SortOrder(sideAttr, Ascending))
    val spec = WindowSpecDefinition(keyAttrs, orderSpec,
      SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))
    // last(_, ignoreNulls) over (key | t, side) carries the most recent
    // version forward; aliased back to the ORIGINAL right attribute ids
    // so references above the join resolve to the as-of values.
    val winAliases = rOut.zip(rAttrs).map { case (orig, u) =>
      Alias(
        WindowExpression(
          AggregateExpression(Last(u, ignoreNulls = true), Complete, isDistinct = false),
          spec),
        orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
    }
    val win = Window(winAliases, keyAttrs, orderSpec, union)
    val probeRows = Filter(EqualTo(sideAttr, Literal(1)), win)
    val matched =
      if (inner) {
        val asofRt = winAliases(rOut.indexWhere(_.exprId == rt.exprId)).toAttribute
        Filter(IsNotNull(asofRt), probeRows)
      } else probeRows
    Project(
      lOut.zip(lAttrs).map { case (orig, u) =>
        Alias(u, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
      } ++ winAliases.map(_.toAttribute),
      matched)
  }
}
