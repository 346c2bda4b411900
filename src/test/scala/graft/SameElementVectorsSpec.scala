package graft

import graft.operators.PatternNFA
import graft.operators.PatternNFA._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Same-element parity pinned to the REFERENCE'S OWN expected match
  * sets — vectors transcribed from flink-libraries/flink-cep/src/test/
  * java/org/apache/flink/cep/nfa/SameElementITCase.java (all 8 tests;
  * line anchors at each). The r13 VERDICT flagged this file as
  * "needs a design decision: value-identity collapsing vs (ts, id)
  * positional identity" — READING THE EXPECTED SETS SETTLES IT: the
  * reference binds EVERY fed copy of an equal-valued event as its own
  * element (testEagerZeroOrMoreSameElement feeds middleEvent1 three
  * times and the maximal run has SIX loop elements;
  * testSimplePatternWSameElement expects TWO value-identical matches,
  * one per copy). That IS this engine's positional (ts, id) model —
  * each copy becomes a row with the shared timestamp and its own id,
  * and the r13 positional-contiguity scan binds them in feed order.
  * No flag, no divergence; the only collapse in the reference is in
  * the HARNESS comparison (comparePatterns compares by Object#equals,
  * so id-distinct copies print alike), which the id-space sets below
  * are strictly finer than.
  *
  * Not transcribed: the two NFAState.getPartialMatches() size asserts
  * inside testClearingBuffer* (SharedBuffer internals — the NFAITCase
  * precedent; the observable match sets ARE transcribed).
  */
class SameElementVectorsSpec extends AnyFunSuite {
  lazy val spark = StreamHarness.spark

  private val W = 3600000000L

  /** (ts, kind) rows; id = feed position (ties share ts). */
  private def evT(rows: (Int, String)*): DataFrame = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((ts, k), i) =>
      (0L, ts.toLong * 1000000L, (i + 1).toLong, k) }
      .toDF("key", "tsMicros", "id", "kind")
  }

  private def matches(df: DataFrame, steps: Seq[Step]): Set[(String, String)] =
    PatternNFA.run(spark, df, steps, W, NoSkip)
      .collect().map(r => (r.getAs[String]("chain"), r.getAs[String]("counts")))
      .toSet

  test("SameElementITCase testEagerZeroOrMoreSameElement:50 — each fed copy is its own loop element") {
    // c@1, m1@3 ×3, m2@4, d@5, m3@6 ×2, b@7: the eager run holds SIX
    // elements (positions 2,3,4,5,7,8) — every prefix plus the empty
    val df = evT((1, "c"), (3, "a"), (3, "a"), (3, "a"), (4, "a"),
      (5, "d"), (6, "a"), (6, "a"), (7, "b"))
    val got = matches(df, Seq(Step("S", "c"), Step("M", "a", ZeroOrMore()),
      Step("E", "b")))
    assert(got == ((1 to 6).map(k => ("1,2,9", s"M:$k")).toSet +
      (("1,9", "M:0"))), got)
  }

  test("SameElementITCase testClearingBuffer:145 — tied-timestamp chain binds positionally") {
    val df = evT((1, "a"), (2, "b"), (2, "c"), (2, "d"))
    val got = matches(df, Seq(Step("A", "a"), Step("B", "b"),
      Step("C", "c"), Step("D", "d")))
    assert(got == Set(("1,2,3,4", "")), got)
  }

  test("SameElementITCase testClearingBufferWithUntilAtTheEnd:206 — iterative COUNT until over tied copies") {
    // a@1, d@2 ×3, d@4; d+ until(count(d) == 3), pre-take: the fourth
    // d sees three bound and the stop fires — extents 1..3
    import org.apache.spark.sql.functions.col
    val df = evT((1, "a"), (2, "d"), (2, "d"), (2, "d"), (4, "d"))
    val got = PatternNFA.runPredicates(spark,
        df.withColumn("v", org.apache.spark.sql.functions.lit(1.0)),
        Seq(Step("A", "A"), Step("D", "D", OneOrMore())),
        Seq("A" -> (col("kind") === "a"), "D" -> (col("kind") === "d")),
        W, NoSkip, navCols = Seq("v"),
        untilCtx = Map("D" -> Seq(CtxCmp("=",
          NavExpr.VarAgg("COUNT", Seq("D"), NavExpr.Cur(0)),
          NavExpr.Lit(3.0)))))
      .collect().map(r => (r.getAs[String]("chain"), r.getAs[String]("counts")))
      .toSet
    assert(got == Set(("1,2", "D:1"), ("1,2", "D:2"), ("1,2", "D:3")),
      got)
  }

  test("SameElementITCase testZeroOrMoreSameElement:267 — ANY subsets over tied copies") {
    // c@1, m1@3, m1a@3, m2@4, d@5, m3@6, m3a@6, b@7: every in-order
    // subset of positions {2,3,4,6,7} (empty included) — 32 matches
    val df = evT((1, "c"), (3, "a"), (3, "a"), (4, "a"), (5, "d"),
      (6, "a"), (6, "a"), (7, "b"))
    val got = matches(df, Seq(Step("S", "c"),
      Step("M", "a", LoopAny(1, Int.MaxValue, zeroOk = true,
        entryAny = true)),
      Step("E", "b", AnyOne)))
    val loopIds = Seq(2, 3, 4, 6, 7)
    val want = (0 until 32).map { mask =>
      val sub = loopIds.zipWithIndex.collect {
        case (id, i) if (mask & (1 << i)) != 0 => id }
      ((Seq(1) ++ sub ++ Seq(8)).mkString(","), s"M:${sub.size}")
    }.toSet
    assert(got == want, got)
  }

  test("SameElementITCase testSimplePatternWSameElement:414 — one branch per tied copy") {
    val df = evT((1, "c"), (3, "a"), (3, "a"), (7, "b"))
    val got = matches(df, Seq(Step("S", "c"), Step("M", "a", AnyOne),
      Step("E", "b")))
    assert(got == Set(("1,2,4", ""), ("1,3,4", "")), got)
  }

  test("SameElementITCase testIterativeConditionWSameElement:473 — a SUM-gated end binds a loop-kind event") {
    // c@1, a@3 ×3 (price 2), b@7 (price 5); end's ONLY condition is
    // SUM(middle.price) == 4 — the third 'a' itself can bind end
    import org.apache.spark.sql.functions.{col, lit}
    import spark.implicits._
    val df = Seq(
      (0L, 1000000L, 1L, "c", 1.0), (0L, 3000000L, 2L, "a", 2.0),
      (0L, 3000000L, 3L, "a", 2.0), (0L, 3000000L, 4L, "a", 2.0),
      (0L, 7000000L, 5L, "b", 5.0))
      .toDF("key", "tsMicros", "id", "kind", "price")
    val got = PatternNFA.runPredicates(spark, df,
        Seq(Step("S", "S"),
          Step("M", "M", LoopAny(1, Int.MaxValue, zeroOk = true,
            entryAny = true)),
          Step("E", "E")),
        Seq("S" -> (col("kind") === "c"), "M" -> (col("kind") === "a"),
          "E" -> lit(true)),
        W, NoSkip, navCols = Seq("price"),
        ctx = Map("E" -> Seq(CtxCmp("=",
          NavExpr.VarAgg("SUM", Seq("M"), NavExpr.Cur(0)),
          NavExpr.Lit(4.0)))))
      .collect().map(r => (r.getAs[String]("chain"), r.getAs[String]("counts")))
      .toSet
    assert(got == Set(("1,2,3,4", "M:2"), ("1,2,4,5", "M:2"),
      ("1,3,4,5", "M:2")), got)
  }

  test("SameElementITCase testEndWLoopingWSameElement:545 — trailing ANY-entry prefixes over tied copies") {
    val df = evT((1, "c"), (3, "a"), (3, "a"), (3, "a"), (7, "b"))
    val got = matches(df, Seq(Step("S", "c"),
      Step("M", "a", AnyEntry(ZeroOrMore()))))
    assert(got == Set(
      ("1", "M:0"), ("1,2", "M:1"), ("1,3", "M:1"), ("1,4", "M:1"),
      ("1,2,3", "M:2"), ("1,3,4", "M:2"), ("1,2,3,4", "M:3")), got)
  }

  test("SameElementITCase testRepeatingPatternWSameElement:604 — a reused kind across loop, optional, and end") {
    // c@1, a@3, a@3, a@3, d@5, b@6, a@7; pattern c a*(eager) b? a:
    // loop extents 0..3 × optional-b branches × the committed end 'a'
    val df = evT((1, "c"), (3, "a"), (3, "a"), (3, "a"), (5, "d"),
      (6, "b"), (7, "a"))
    // distinct step kinds are required by the ctx-free compile here;
    // the reused 'a' kind across M1 and E rides runPredicates
    import org.apache.spark.sql.functions.col
    val got = PatternNFA.runPredicates(spark, df,
        Seq(Step("S", "S"), Step("M1", "M1", ZeroOrMore()),
          Step("M2", "M2", Optional), Step("E", "E")),
        Seq("S" -> (col("kind") === "c"), "M1" -> (col("kind") === "a"),
          "M2" -> (col("kind") === "b"), "E" -> (col("kind") === "a")),
        W, NoSkip)
      .collect().map(r => (r.getAs[String]("chain"), r.getAs[String]("counts")))
      .toSet
    val want = Set(
      ("1,2", "M1:0"), ("1,6,7", "M1:0"),
      ("1,2,3", "M1:1"), ("1,2,6,7", "M1:1"),
      ("1,2,4", "M1:2"), ("1,2,6,7", "M1:2"),
      ("1,2,7", "M1:3"), ("1,2,6,7", "M1:3"))
    assert(got == want, got)
  }
}
