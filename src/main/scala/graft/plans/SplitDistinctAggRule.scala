package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Automatic skewed-distinct-aggregate split — the reference's
  * SplitAggregateRule (flink-table/flink-table-planner-blink/src/main/
  * scala/org/apache/flink/table/planner/plan/rules/logical/
  * SplitAggregateRule.scala:108, gated by
  * `table.optimizer.distinct-agg.split.enabled`): a
  * `COUNT(DISTINCT d) ... GROUP BY g` with a hot g concentrates every
  * distinct d of that group in one task. The rewrite inserts a bucket
  * key `pmod(hash(d), N)` so the distinct set of each group spreads
  * over N tasks, then recombines:
  *
  * {{{
  * Aggregate(g, count(distinct d) ∥ sum(s) ∥ ...)
  *   ⇒ Aggregate(g, sum(pcd) ∥ sum(ps) ∥ ...,
  *       Aggregate(g ∥ pmod(hash(d), N), count(distinct d) AS pcd ∥
  *                 sum(s) AS ps ∥ ..., child))
  * }}}
  *
  * Correct because bucketing by hash(d) partitions the distinct values
  * of d exactly (equal values share a bucket), so per-bucket distinct
  * counts add; accompanying SUM/COUNT/MIN/MAX decompose the standard
  * two-level way. Both levels then still get Spark's own partial/final
  * split, so the plan is the reference's four-stage
  * partial→final(bucketed)→partial→final pipeline.
  *
  * Gated off by default (`spark.graft.optimizer.splitDistinctAgg
  * .enabled`, bucket count `...splitDistinctAgg.buckets`, default 256)
  * exactly like the reference — the extra level costs a shuffle of the
  * (g × bucket) groups and only pays when g is skewed or low-cardinality
  * with high |d|. [[maybeSplit]] applies the same rewrite explicitly to
  * one plan (the conf-independent library surface; the oracle query
  * `q8_distinct_split_auto` goes through it).
  *
  * Scope guards (anything outside reverts to Spark's Expand-based
  * distinct planning, which is always correct): grouping keys must be
  * plain attributes; every aggregate a top-level Alias(agg) without
  * FILTER; distinct aggs all over the SAME single argument, functions
  * COUNT/SUM; non-distinct functions COUNT/SUM/MIN/MAX.
  */
object SplitDistinctAggRule extends Rule[LogicalPlan] {

  val EnabledKey = "spark.graft.optimizer.splitDistinctAgg.enabled"
  val BucketsKey = "spark.graft.optimizer.splitDistinctAgg.buckets"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledKey, "false").toBoolean) plan
    else maybeSplit(plan, conf.getConfString(BucketsKey, "256").toInt)

  /** Conf-independent entry: rewrite every eligible aggregate in
    * `plan`. Ineligible plans come back unchanged. */
  def maybeSplit(plan: LogicalPlan, buckets: Int): LogicalPlan =
    plan.transformUp {
      case agg: Aggregate if eligible(agg) => split(agg, buckets)
    }

  // the bucket expression this rule itself inserts — its presence in a
  // grouping list marks an already-split inner level (do not re-match)
  private def isBucket(e: Expression): Boolean = e match {
    case Pmod(_: Murmur3Hash, _, _) => true
    case _ => false
  }

  private def distinctOk(f: AggregateFunction): Boolean = f match {
    case c: Count => c.children.size == 1
    case _: Sum => true
    case _ => false
  }

  private def plainOk(f: AggregateFunction): Boolean = f match {
    case c: Count => c.children.size == 1
    case _: Sum | _: Min | _: Max => true
    case _ => false
  }

  private def eligible(agg: Aggregate): Boolean = {
    val gAttrs = agg.groupingExpressions
    if (!gAttrs.forall(_.isInstanceOf[AttributeReference])) return false
    if (gAttrs.exists(isBucket)) return false
    val gSet = AttributeSet(gAttrs.map(_.asInstanceOf[AttributeReference]))
    val aggs = agg.aggregateExpressions.collect {
      case Alias(ae: AggregateExpression, _) => ae
    }
    // every output is a group passthrough or exactly Alias(agg), no FILTER
    val shapeOk = agg.aggregateExpressions.forall {
      case Alias(ae: AggregateExpression, _) => ae.filter.isEmpty
      case ne => ne.references.subsetOf(gSet) &&
        !ne.exists(_.isInstanceOf[AggregateExpression])
    }
    val distincts = aggs.filter(_.isDistinct)
    val dArgs = distincts.flatMap(_.aggregateFunction.children)
    shapeOk && distincts.nonEmpty &&
      distincts.forall(ae => distinctOk(ae.aggregateFunction)) &&
      aggs.filterNot(_.isDistinct).forall(ae => plainOk(ae.aggregateFunction)) &&
      dArgs.nonEmpty && dArgs.forall(_.semanticEquals(dArgs.head)) &&
      distincts.forall(_.aggregateFunction.children.size == 1)
  }

  private def split(agg: Aggregate, buckets: Int): LogicalPlan = {
    val gAttrs = agg.groupingExpressions.map(_.asInstanceOf[AttributeReference])
    val dArg = agg.aggregateExpressions.collectFirst {
      case Alias(ae: AggregateExpression, _) if ae.isDistinct =>
        ae.aggregateFunction.children.head
    }.get
    val bucket = Pmod(new Murmur3Hash(Seq(dArg)), Literal(buckets))
    val partials = Seq.newBuilder[NamedExpression]
    def partial(name: String, e: AggregateExpression): Attribute = {
      val al = Alias(e, name)()
      partials += al
      al.toAttribute
    }
    val outerExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case orig @ Alias(ae: AggregateExpression, _) =>
        // COUNT over empty input is 0, but the outer Sum over zero
        // inner rows is NULL — coalesce restores the unsplit
        // semantics (a global aggregate over empty input must still
        // return 0, not NULL). SUM/MIN/MAX are NULL on empty input in
        // both forms, so they need no guard.
        def sumCounts(p: Attribute): Expression = Coalesce(Seq(
          AggregateExpression(Sum(p), Complete, isDistinct = false),
          Literal(0L)))
        val combined: Expression = ae.aggregateFunction match {
          // distinct: per-bucket distinct count/sum, then add buckets
          case c: Count if ae.isDistinct =>
            val p = partial("_pcd", AggregateExpression(c, Complete, isDistinct = true))
            sumCounts(p)
          case s: Sum if ae.isDistinct =>
            val p = partial("_psd", AggregateExpression(s, Complete, isDistinct = true))
            AggregateExpression(Sum(p), Complete, isDistinct = false)
          // plain: standard two-level decomposition
          case c: Count =>
            val p = partial("_pc", AggregateExpression(c, Complete, isDistinct = false))
            sumCounts(p)
          case s: Sum =>
            val p = partial("_ps", AggregateExpression(s, Complete, isDistinct = false))
            AggregateExpression(Sum(p), Complete, isDistinct = false)
          case m: Min =>
            val p = partial("_pmin", AggregateExpression(m, Complete, isDistinct = false))
            AggregateExpression(Min(p), Complete, isDistinct = false)
          case m: Max =>
            val p = partial("_pmax", AggregateExpression(m, Complete, isDistinct = false))
            AggregateExpression(Max(p), Complete, isDistinct = false)
        }
        // sum-of-sums can widen (LongType for counts, decimal precision
        // for sums) — land exactly on the original output type
        val typed =
          if (combined.dataType == orig.dataType) combined
          else Cast(combined, orig.dataType)
        Alias(typed, orig.name)(exprId = orig.exprId, qualifier = orig.qualifier)
      case passthrough => passthrough
    }
    val inner = Aggregate(gAttrs :+ bucket,
      (gAttrs: Seq[NamedExpression]) ++ partials.result(), agg.child)
    Aggregate(gAttrs, outerExprs, inner)
  }
}
