package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{FullOuter, Inner, LeftAnti, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{StructType, TimestampNTZType, TimestampType}

/** Changelog-mode inference — the analog of the reference's
  * `FlinkChangelogModeInferenceProgram.scala:39` (step 1, the
  * ModifyKindSet derivation), surfaced through
  * `EXPLAIN CHANGELOG_MODE <query>` (ExplainDetail.CHANGELOG_MODE).
  *
  * Every plan node is annotated bottom-up with the set of change kinds
  * it can emit — I (insert), UA (update-after), D (delete) — under the
  * same per-operator rules the reference applies
  * (FlinkChangelogModeInferenceProgram's SatisfyModifyKindSetTraitVisitor,
  * file:90-290):
  *
  *  - sources/values: insert-only (file scans here, like the
  *    reference's DataStream/Values scans, cannot produce updates)
  *  - stateless forwarders (Calc ≈ Project/Filter, Correlate ≈
  *    Generate, Expand, WatermarkAssigner): forward the child's set
  *  - unbounded group aggregate: {I, UA} + D when its input is itself
  *    updating (the reference adds DELETE exactly then)
  *  - windowed aggregate (window/session_window in the grouping, on a
  *    watermarked stream): insert-only — windows emit once at close
  *  - dedup keep-first: insert-only; keep-last: updating
  *  - join: INNER/SEMI forward the union of both sides' sets; outer
  *    and anti joins may retract their pads — all changes
  *  - union: union of children's sets
  *  - streaming sort / CEP / OVER / interval join: insert-only (the
  *    reference requires insert-only inputs for these — Spark's
  *    planner enforces the same on the corresponding operators)
  *  - limit: insert-only iff its input is
  *
  * One engine delta, stated rather than hidden: updates here are
  * always UPDATE-AFTER only (Spark's update mode is an upsert
  * changelog; there is no update_before message), so step 2 of the
  * reference's program — choosing UA vs UB+UA — always lands on UA.
  * That is the same outcome the reference reaches when the sink
  * declares it does not need update_before (its preferred branch).
  *
  * Batch plans are insert-only end to end, exactly as in the
  * reference (changelogs exist only on streams).
  */
object ChangelogInference {

  /** The ModifyKindSet: insert / update / delete capability bits. */
  final case class Mode(i: Boolean, u: Boolean, d: Boolean) {
    def union(o: Mode): Mode = Mode(i || o.i, u || o.u, d || o.d)
    def insertOnly: Boolean = !u && !d
    /** Rendered like the reference's EXPLAIN: updates as UA (see
      * the class doc for why UB never appears in this engine). */
    def render: String = {
      val kinds = Seq(if (i) Some("I") else None,
        if (u) Some("UA") else None, if (d) Some("D") else None).flatten
      s"[${kinds.mkString(",")}]"
    }
  }
  private val I = Mode(i = true, u = false, d = false)
  private val IU = Mode(i = true, u = true, d = false)
  private val ALL = Mode(i = true, u = true, d = true)

  /** A window-struct grouping column produced by Spark's
    * TimeWindowing/SessionWindowing rules: the generated attribute is
    * named `window`/`session_window` AND has the timestamp
    * start/end struct shape. Both checks — shape alone would
    * misclassify a user-built struct of two timestamps (e.g.
    * (valid_from, valid_to)) as a time window and report an unbounded
    * aggregate as insert-only. */
  private def isWindowGroup(e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean = {
    val windowShaped = e.dataType match {
      case s: StructType =>
        s.fieldNames.contains("start") && s.fieldNames.contains("end") &&
          s.fields.forall(f => f.dataType == TimestampType ||
            f.dataType == TimestampNTZType)
      case _ => false
    }
    val windowNamed = e match {
      case a: org.apache.spark.sql.catalyst.expressions.Attribute =>
        a.name == "window" || a.name == "session_window"
      case _ => false
    }
    windowShaped && windowNamed
  }

  /** Bottom-up mode derivation for one node. */
  private def modeOf(plan: LogicalPlan, children: Seq[Mode]): Mode = {
    if (!plan.isStreaming) return I
    plan match {
      case _: LeafNode => I
      case a: Aggregate =>
        if (a.groupingExpressions.exists(isWindowGroup)) I
        else {
          val in = children.head
          if (in.u || in.d) ALL else IU
        }
      case _: Deduplicate => I // keep-FIRST arrival (dropDuplicates)
      case j: Join => j.joinType match {
        case Inner | LeftSemi => children.reduce(_ union _)
        case LeftOuter | RightOuter | FullOuter | LeftAnti => ALL
        case _ => ALL
      }
      case _: Union => children.reduce(_ union _)
      case _: Sort => I // watermark-ordered buffer, insert-only out
      case _: GlobalLimit | _: LocalLimit =>
        if (children.head.insertOnly) I else ALL
      case f: FlatMapGroupsWithState =>
        if (f.outputMode == OutputMode.Update()) IU else I
      case _: Window => I // OVER requires and produces insert-only
      case _ =>
        // stateless / forwarding nodes (Project, Filter, Generate,
        // Expand, SubqueryAlias, EventTimeWatermark, type ops, ...)
        if (children.isEmpty) I else children.reduce(_ union _)
    }
  }

  private def nodeName(plan: LogicalPlan): String = plan match {
    case _: Aggregate if plan.isStreaming &&
        plan.asInstanceOf[Aggregate].groupingExpressions.exists(isWindowGroup) =>
      "WindowAggregate"
    case _ => plan.nodeName
  }

  /** Bottom-up derivation of every node's mode (shared by the tree
    * rendering and the root query). */
  private def derive(root: LogicalPlan): java.util.IdentityHashMap[LogicalPlan, Mode] = {
    val memo = new java.util.IdentityHashMap[LogicalPlan, Mode]()
    def fill(plan: LogicalPlan): Mode = {
      val m = modeOf(plan, plan.children.map(fill))
      memo.put(plan, m)
      m
    }
    fill(root)
    memo
  }

  /** Annotated tree: every node rendered with its changelog mode. */
  def explain(df: DataFrame): String = {
    val sb = new StringBuilder
    val root = df.queryExecution.analyzed
    val memo = derive(root)
    def render(plan: LogicalPlan, depth: Int): Unit = {
      val cols = plan.output.take(4).map(_.name).mkString(", ") +
        (if (plan.output.size > 4) ", ..." else "")
      sb.append("   " * depth)
        .append(if (depth == 0) "" else "+- ")
        .append(nodeName(plan)).append(s"($cols)")
        .append(", changelogMode=").append(memo.get(plan).render)
        .append("\n")
      plan.children.foreach(render(_, depth + 1))
    }
    render(root, 0)
    sb.toString
  }

  /** The root's mode (what a sink of this query must accept). */
  def rootMode(df: DataFrame): String = {
    val root = df.queryExecution.analyzed
    derive(root).get(root).render
  }
}
