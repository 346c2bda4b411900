package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, LogicalPlan, ResolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule

/** Safety limiter for pinned broadcasts (SURVEY.md §9; VERDICT r3 #1).
  *
  * The reference never broadcasts unconditionally — its build side is
  * gated by a size threshold
  * (`flink-table-planner-blink/.../OptimizerConfigOptions.java:53`
  * `TABLE_OPTIMIZER_BROADCAST_JOIN_THRESHOLD`). Spark's `broadcast()`
  * hint, by contrast, OVERRIDES `autoBroadcastJoinThreshold`: a hint
  * that was correct at test scale pins a `BroadcastExchange` that OOMs
  * the driver and every executor once the table has grown 100×.
  *
  * This optimizer rule restores the reference's contract: a broadcast
  * hint whose side's ESTIMATED size exceeds a hard cap is removed,
  * letting physical planning fall back to the threshold/AQE decision.
  * Hints under the cap are honored unchanged, so the "threshold −1 +
  * explicit hint" control idiom keeps working for genuinely small
  * sides. Result semantics are never affected — only join strategy.
  *
  * Mechanics: `EliminateResolvedHint` folds `broadcast()` marks into
  * the `Join`'s [[JoinHint]] in the optimizer's first batch, and
  * injected/extra rules run after it — so the gate rewrites
  * `JoinHint`s (a `ResolvedHint` case is kept for plans inspected
  * pre-elimination). Cap: `spark.graft.maxPinnedBroadcastBytes` if
  * set, else 8 × max(autoBroadcastJoinThreshold, 10 MB) — generous for
  * deliberate slightly-over-threshold pins, far below driver-OOM
  * territory. Registered via [[graft.GraftExtensions]]
  * (`injectOptimizerRule`) for new sessions, or appended to
  * `spark.experimental.extraOptimizations` on a live one.
  */
object GateBroadcastHints extends Rule[LogicalPlan] {

  private val DefaultFloor = 10L * 1024 * 1024

  private def cap: BigInt =
    BigInt(conf.getConfString("spark.graft.maxPinnedBroadcastBytes", "").trim match {
      case "" => 8L * math.max(conf.autoBroadcastJoinThreshold, DefaultFloor)
      case s  => s.toLong
    })

  private def gate(h: Option[HintInfo], side: LogicalPlan,
                   limit: BigInt): Option[HintInfo] = h match {
    case Some(hi) if hi.strategy.contains(BROADCAST) &&
        side.stats.sizeInBytes > limit =>
      logWarning(
        s"dropping broadcast hint: side estimated ${side.stats.sizeInBytes} bytes " +
          s"> cap $limit (spark.graft.maxPinnedBroadcastBytes); " +
          "join strategy falls back to autoBroadcastJoinThreshold/AQE")
      Some(hi.copy(strategy = None))
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val limit = cap
    plan.transformUp {
      case j @ Join(l, r, _, _, hint) =>
        val (nl, nr) = (gate(hint.leftHint, l, limit), gate(hint.rightHint, r, limit))
        if (nl != hint.leftHint || nr != hint.rightHint) j.copy(hint = JoinHint(nl, nr))
        else j
      case h @ ResolvedHint(child, hi) if hi.strategy.contains(BROADCAST) &&
          child.stats.sizeInBytes > limit =>
        logWarning(
          s"dropping broadcast hint: subtree estimated ${child.stats.sizeInBytes} bytes " +
            s"> cap $limit")
        child
    }
  }
}
