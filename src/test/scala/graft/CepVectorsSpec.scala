package graft

import graft.operators.PatternNFA
import graft.operators.PatternNFA._
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** CEP-library parity pinned to the REFERENCE'S OWN expected match
  * sets — the r10/r11 structural lesson (self-authored oracles can
  * encode the engine's own semantics) applied to the CEP API doors,
  * whose cep* oracles are all self-authored. Vectors transcribed from
  * flink-libraries/flink-cep/src/test/java/org/apache/flink/cep/nfa/
  * NFAITCase.java (line anchors at each test). All run with NO SKIP,
  * the reference harness's default (feedNFA emits every match).
  *
  * Adaptations: the reference's where()-conditions become kind
  * columns (condition evaluation is data prep for a kind-equality
  * NFA — the engine's predicate generality is exercised by the
  * MATCH_RECOGNIZE family); event timestamps are made DISTINCT where
  * the reference reuses one (this engine's relaxed relations pin
  * strictly-increasing timestamps between neighbor bindings — its
  * deterministic (ts, id) order contract — while consecutive-interior
  * runs chain same-timestamp ADJACENT events like the reference);
  * match sets compare as (chain, counts) pairs — a loop's binding is
  * its first element + extent, which uniquely names the reference's
  * event lists under prefix-contiguous loop semantics.
  *
  * r12 closed all three r11 structural deltas: SKIP_TILL_ANY loops
  * beyond the times(2) pairs door ([[PatternNFA.LoopAny]] — subset
  * enumeration), next()-ENTRY into a loop ([[PatternNFA.NextEntry]]),
  * and loop-FIRST patterns on the relaxed door (every loop-kind event
  * anchors its own run — enumFromAnchor; the empty-loop class anchors
  * on the rest head), plus the WITHIN boundary flip and per-branch
  * timeout emission ([[PatternNFA.runTimeoutBranches]]). Remaining
  * adaptation (not a delta): same-timestamp neighbor bindings in
  * relaxed relations, see above.
  */
class CepVectorsSpec extends AnyFunSuite {
  lazy val spark = StreamHarness.spark

  private val W = 3600000000L // 1 hour — wider than any vector's span

  private def ev(rows: (Int, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.map { case (id, k) => (0L, id.toLong * 1000000L, id.toLong, k) }
      .toDF("key", "tsMicros", "id", "kind")
  }

  private def matches(df: DataFrame, steps: Seq[Step],
                      am: AfterMatch = NoSkip): Set[(String, String)] =
    PatternNFA.run(spark, df, steps, W, am)
      .collect().map(r => (r.getAs[String]("chain"), r.getAs[String]("counts")))
      .toSet

  // the shared ConsecutiveData shape (NFAITCase:2606 + the
  // testOneOrMore/testZeroOrMore feeders :2730/:2950): c, d, a, a, a,
  // d, a, b — distinct ts (m2/m3 share one in the reference; see doc)
  private val consecData = ev(1 -> "c", 2 -> "d", 3 -> "a", 4 -> "a",
    5 -> "a", 6 -> "d", 7 -> "a", 8 -> "b")

  test("NFAITCase testSimplePatternWithTimeWindowNFA:338 — WITHIN is boundary-exclusive") {
    // start@1, start@2, middle@3, foobar@4, end@11, end@13, within 10:
    // the reference expires a deadline-t anchor BEFORE processing an
    // event at t (advanceTime-first order), so start@1 (deadline 11)
    // must NOT match end@11 — only (start@2, middle@3, end@11) does.
    // r12 acceptance vector for the boundary flip.
    import spark.implicits._
    val df = Seq(
      (0L, 1L, 1L, "start"), (0L, 2L, 2L, "start"), (0L, 3L, 3L, "middle"),
      (0L, 4L, 4L, "foobar"), (0L, 11L, 5L, "end"), (0L, 13L, 6L, "end"))
      .toDF("key", "tsMicros", "id", "kind")
    val got = PatternNFA.run(spark, df,
        Seq(Step("S", "start"), Step("M", "middle"), Step("E", "end")),
        withinMicros = 10L, NoSkip)
      .collect().map(r => (r.getAs[String]("chain"), r.getAs[String]("counts")))
      .toSet
    assert(got == Set(("2,3,5", "")), got)
  }

  test("NFAITCase testSimplePatternNFA:187 — one committed match across noise") {
    val df = ev(1 -> "start", 2 -> "x", 3 -> "x2", 4 -> "mid",
      5 -> "start", 6 -> "end")
    val got = matches(df, Seq(Step("S", "start"), Step("M", "mid"),
      Step("E", "end")))
    // the second start has no mid after it — exactly one match
    assert(got == Set(("1,4,6", "")), got)
  }

  test("NFAITCase testStrictContinuityWithResults:248 — next() binds the adjacent event") {
    val got = matches(ev(1 -> "a", 2 -> "b"),
      Seq(Step("M", "a"), Step("E", "b", Next)))
    assert(got == Set(("1,2", "")), got)
  }

  test("NFAITCase testStrictContinuityNoResults:291 — an intervening event kills next()") {
    val got = matches(ev(1 -> "a", 2 -> "c", 3 -> "b"),
      Seq(Step("M", "a"), Step("E", "b", Next)))
    assert(got.isEmpty, got)
  }

  test("NFAITCase testSkipTillNextOneOrMore:2642 — relaxed 1+ emits run prefixes") {
    val got = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", OneOrMore()), Step("E", "b")))
    // prefixes of the eligible run m@3..m@7 (the d's are skipped),
    // never shifted starts
    assert(got == (1 to 4).map(k => ("1,3,8", s"M:$k")).toSet, got)
  }

  test("NFAITCase testSkipTillNextZeroOrMore:2930 — 0+ adds the empty extent") {
    val got = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", ZeroOrMore()), Step("E", "b")))
    assert(got == ((1 to 4).map(k => ("1,3,8", s"M:$k")).toSet +
      (("1,8", "M:0"))), got)
  }

  test("NFAITCase testStrictOneOrMore:2618 — consecutive() run ends at the first gap") {
    val got = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", OneOrMore(consecutive = true)), Step("E", "b")))
    // adjacent run m@3,m@4,m@5 — d@6 ends it, m@7 is unreachable;
    // entry m@3 is NOT adjacent to the start (entry stays relaxed)
    assert(got == (1 to 3).map(k => ("1,3,8", s"M:$k")).toSet, got)
  }

  test("NFAITCase testStrictEagerZeroOrMore:2795 — consecutive 0+ adds the empty extent") {
    val got = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", ZeroOrMore(consecutive = true)), Step("E", "b")))
    assert(got == ((1 to 3).map(k => ("1,3,8", s"M:$k")).toSet +
      (("1,8", "M:0"))), got)
  }

  test("NFAITCase testEagerZeroOrMore:774 — relaxed run skips interleaved noise") {
    val df = ev(1 -> "c", 3 -> "a", 4 -> "a", 5 -> "d", 6 -> "a", 7 -> "b")
    val got = matches(df, Seq(Step("S", "c"),
      Step("M", "a", ZeroOrMore()), Step("E", "b")))
    assert(got == ((1 to 3).map(k => ("1,3,7", s"M:$k")).toSet +
      (("1,7", "M:0"))), got)
  }

  test("NFAITCase testOptional:1455 — NO SKIP emits both optional branches") {
    val df = ev(1 -> "c", 5 -> "a", 6 -> "b")
    val got = matches(df, Seq(Step("S", "c"), Step("M", "a", Optional),
      Step("E", "b")))
    assert(got == Set(("1,5,6", ""), ("1,6", "")), got)
  }

  test("NFAITCase testTimesStrict:2976 — times(2).consecutive() advances past a broken pair") {
    val df = ev(1 -> "c", 2 -> "f", 3 -> "a", 4 -> "f", 5 -> "a",
      6 -> "a", 7 -> "b")
    val got = matches(df, Seq(Step("S", "c"),
      Step("M", "a", Times(2, consecutive = true)), Step("E", "b")))
    // the pair from m@3 is broken by f@4; the committed entry advances
    // to m@5 — exactly the reference's single (start, m2, m3, end);
    // bounded Times chains every bound id (no counts entry)
    assert(got == Set(("1,5,6,7", "")), got)
  }

  test("NFAITCase testTimesNonStrict:3039 — times(2).allowCombinations() emits every pair") {
    val df = ev(1 -> "c", 2 -> "f", 3 -> "a", 4 -> "f", 5 -> "a",
      6 -> "a", 7 -> "b")
    val got = PatternNFA.runCombinationsPairs(spark, df, "c", "a", "b", W)
      .collect().map(_.getAs[String]("chain")).toSet
    assert(got == Set("1,3,5,7", "1,3,6,7", "1,5,6,7"), got)
  }

  test("NFAITCase testEndWithZeroOrMore:1928 — a trailing loop emits every extent") {
    val df = ev(1 -> "c", 3 -> "a", 4 -> "a", 5 -> "a")
    val got = matches(df, Seq(Step("S", "c"), Step("M", "a", ZeroOrMore())))
    assert(got == ((1 to 3).map(k => ("1,3", s"M:$k")).toSet +
      (("1", "M:0"))), got)
  }

  test("NFAITCase testBranchingPattern:499 — followedByAny chains branch into the full cross product") {
    // start, three qualifying middles, two next-ones, one end — every
    // (middle, next) combination emits its own match: 3 × 2 × 1 = 6
    val df = ev(1 -> "start", 3 -> "mid", 4 -> "mid", 5 -> "mid",
      6 -> "nx", 7 -> "nx", 8 -> "end")
    val got = matches(df, Seq(Step("S", "start"),
      Step("M", "mid", AnyOne), Step("N", "nx", AnyOne),
      Step("E", "end", AnyOne)))
    assert(got == (for (m <- 3 to 5; n <- 6 to 7)
      yield (s"1,$m,$n,8", "")).toSet, got)
  }

  test("NFAITCase testNoConditionNFA:82 — condition-less steps commit to the next event") {
    // begin.followedBy with NO conditions: every event anchors and the
    // second step commits to the immediately-following event — exactly
    // the reference's (a,b),(b,c),(c,d),(d,e)
    import org.apache.spark.sql.functions.lit
    val df = ev(1 -> "x", 2 -> "x", 3 -> "x", 4 -> "x", 5 -> "x")
    val preds = Seq("S" -> lit(true), "E" -> lit(true))
    val got = PatternNFA.runPredicates(spark, df,
        Seq(Step("S", "S"), Step("E", "E")), preds, W, NoSkip)
      .collect().map(_.getAs[String]("chain")).toSet
    assert(got == Set("1,2", "2,3", "3,4", "4,5"), got)
  }

  test("NFAITCase testNoConditionLoopingNFA:113 — condition-less trailing 1+ emits every contiguous substring") {
    import org.apache.spark.sql.functions.lit
    val df = ev(1 -> "x", 2 -> "x", 3 -> "x", 4 -> "x", 5 -> "x")
    val preds = Seq("S" -> lit(true), "E" -> lit(true))
    val got = PatternNFA.runPredicates(spark, df,
        Seq(Step("S", "S"), Step("E", "E", OneOrMore())), preds, W, NoSkip)
      .collect().map(r => (r.getAs[String]("chain"), r.getAs[String]("counts")))
      .toSet
    // the reference's ten substrings: anchors a..d, loop extents 1..4
    val want = (for (a <- 1 to 4; k <- 1 to 5 - a)
      yield (s"$a,${a + 1}", s"E:$k")).toSet
    assert(got == want, got)
  }

  test("NFAITCase testSkipTillAnyOneOrMore:2674 — ANY-interior 1+ emits every in-order subset") {
    // allowCombinations on a 1+ loop: entry commits to the earliest
    // eligible (all reference matches start with middleEvent1), the
    // interior branches on EVERY later eligible — 2^3 = 8 subsets.
    // ANY-loop chains carry FULL loop ids (subsets are otherwise
    // indistinguishable — the times(2) pairs door's convention).
    val got = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", LoopAny(1, Int.MaxValue)), Step("E", "b")))
    val want = Set(
      ("1,3,8", "M:1"), ("1,3,4,8", "M:2"), ("1,3,5,8", "M:2"),
      ("1,3,7,8", "M:2"), ("1,3,4,5,8", "M:3"), ("1,3,4,7,8", "M:3"),
      ("1,3,5,7,8", "M:3"), ("1,3,4,5,7,8", "M:4"))
    assert(got == want, got)
  }

  test("NFAITCase testSkipTillAnyZeroOrMore:2820 — ANY-interior 0+ adds the empty extent") {
    val got = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", LoopAny(1, Int.MaxValue, zeroOk = true)),
      Step("E", "b")))
    val want = Set(
      ("1,8", "M:0"),
      ("1,3,8", "M:1"), ("1,3,4,8", "M:2"), ("1,3,5,8", "M:2"),
      ("1,3,7,8", "M:2"), ("1,3,4,5,8", "M:3"), ("1,3,4,7,8", "M:3"),
      ("1,3,5,7,8", "M:3"), ("1,3,4,5,7,8", "M:4"))
    assert(got == want, got)
  }

  test("NFAITCase testNextZeroOrMore:1323 — next()-entry kills non-adjacent loop binds") {
    // next(middle).oneOrMore().optional().consecutive(): the loop's
    // first element must be ADJACENT to start; the noise event at 2
    // kills every bound branch — only (start, end) survives.
    val df = ev(1 -> "start", 2 -> "event", 3 -> "middle", 4 -> "middle",
      5 -> "middle", 6 -> "end")
    val got = matches(df, Seq(Step("S", "start"),
      Step("M", "middle", NextEntry(ZeroOrMore(consecutive = true))),
      Step("E", "end")))
    assert(got == Set(("1,6", "M:0")), got)
  }

  test("NFAITCase testTimesNonStrictWithNext:1629 — next()-entry pairs with ANY interior") {
    // next(middle).times(2).allowCombinations(): entry adjacent (m1@2
    // IS adjacent to c@1), second element = every later eligible.
    val df = ev(1 -> "c", 2 -> "a", 3 -> "f", 4 -> "a", 5 -> "f",
      6 -> "a", 7 -> "b")
    val got = matches(df, Seq(Step("S", "c"),
      Step("M", "a", LoopAny(2, 2, entryNext = true)), Step("E", "b")))
    assert(got == Set(("1,2,4,7", "M:2"), ("1,2,6,7", "M:2")), got)
  }

  test("NFAITCase testOptionalTimesNonStrictWithNext:2535 — optional adds the empty branch") {
    val df = ev(1 -> "c", 2 -> "a", 3 -> "f", 4 -> "a", 5 -> "f",
      6 -> "a", 7 -> "b")
    val got = matches(df, Seq(Step("S", "c"),
      Step("M", "a", LoopAny(2, 2, zeroOk = true, entryNext = true)),
      Step("E", "b")))
    assert(got == Set(("1,2,4,7", "M:2"), ("1,2,6,7", "M:2"),
      ("1,7", "M:0")), got)
  }

  test("NFAITCase testTimesStrictWithNextAndConsecutive:1828 — adjacency gap starves the run") {
    // next(middle).times(2).consecutive(): entry adjacent (m1@2), but
    // the consecutive second element must be at index 3 — it's 'f'.
    val df = ev(1 -> "c", 2 -> "a", 3 -> "f", 4 -> "a", 6 -> "a", 7 -> "b")
    val got = matches(df, Seq(Step("S", "c"),
      Step("M", "a", NextEntry(Times(2, consecutive = true))),
      Step("E", "b")))
    assert(got.isEmpty, got)
  }

  test("NFAITCase testSimplePatternWithTimeoutHandling:403 — every live partial branch times out") {
    // followedByAny twice, within 10: FOUR timeouts — two per anchor
    // (the bare anchor's stay and the [start, middle] branch), each
    // stamped with the anchor's deadline, INCLUDING the anchor that
    // also fully matched (start@2's stays expire at 12).
    import spark.implicits._
    val df = Seq(
      (0L, 1L, 1L, "start"), (0L, 2L, 2L, "start"), (0L, 3L, 3L, "middle"),
      (0L, 4L, 4L, "foobar"), (0L, 11L, 5L, "end"), (0L, 13L, 6L, "end"))
      .toDF("key", "tsMicros", "id", "kind")
    val steps = Seq(Step("S", "start"), Step("M", "middle", AnyOne),
      Step("E", "end", AnyOne))
    // the full-match side is unchanged: exactly one match
    val full = PatternNFA.run(spark, df, steps, withinMicros = 10L, NoSkip)
      .collect().map(_.getAs[String]("chain")).toSet
    assert(full == Set("2,3,5"), full)
    val tmo = PatternNFA.runTimeoutBranches(spark, df, steps,
        withinMicros = 10L)
      .collect().map(r => (r.getAs[Long]("anchor_id"),
        r.getAs[String]("chain"), r.getAs[Int]("n_bound"),
        r.getAs[Long]("timeout_us"))).toSet
    val want = Set(
      (1L, "1", 1, 11L), (1L, "1,3", 2, 11L),
      (2L, "2", 1, 12L), (2L, "2,3", 2, 12L))
    assert(tmo == want, tmo)
  }

  test("NFAITCase testBeginWithZeroOrMore:842 — loop-first anchors every loop event + one empty class") {
    // begin(a).oneOrMore().optional() followedBy b: every 'a' anchors
    // its own run (relaxed prefixes from that anchor), and every
    // rest-head 'b' anchors the empty-loop branch.
    val df = ev(3 -> "a", 4 -> "a", 5 -> "a", 6 -> "b")
    val got = matches(df, Seq(Step("M", "a", ZeroOrMore()),
      Step("E", "b")))
    val want = Set(
      ("3,6", "M:3"), ("3,6", "M:2"), ("4,6", "M:2"),
      ("3,6", "M:1"), ("4,6", "M:1"), ("5,6", "M:1"), ("6", "M:0"))
    assert(got == want, got)
  }

  test("NFAITCase testBeginWithAtLeastOne:1267 — ANY-loop-first emits every subset per anchor") {
    val df = ev(3 -> "a", 4 -> "a", 5 -> "a", 6 -> "b")
    val got = matches(df, Seq(Step("S", "a", LoopAny(1, Int.MaxValue)),
      Step("E", "b")))
    val want = Set(
      ("3,6", "S:1"), ("3,4,6", "S:2"), ("3,5,6", "S:2"),
      ("3,4,5,6", "S:3"), ("4,6", "S:1"), ("4,5,6", "S:2"),
      ("5,6", "S:1"))
    assert(got == want, got)
  }

  test("NFAITCase testStartWithTimes:1578 — times(2).consecutive() first anchors each adjacent pair") {
    val df = ev(2 -> "a", 3 -> "a", 4 -> "a", 6 -> "b")
    val got = matches(df, Seq(Step("M", "a", Times(2, consecutive = true)),
      Step("E", "b")))
    assert(got == Set(("2,3,6", ""), ("3,4,6", "")), got)
  }

  test("NFAITCase testStartWithOneOrMoreStrict:3133 / ZeroOrMoreStrict:3112 — loop-only pattern") {
    // a+ consecutive as the WHOLE pattern: each 'a' anchors its
    // adjacent run's prefixes; the zeroOrMore spelling emits the SAME
    // set (a zero-width match with nothing else bound is no match)
    val df = ev(1 -> "c", 3 -> "a", 4 -> "c", 5 -> "a", 6 -> "a")
    // loop chains carry the FIRST element + extent (emit convention)
    val want = Set(("3", "S:1"), ("5", "S:1"), ("5", "S:2"),
      ("6", "S:1"))
    val one = matches(df,
      Seq(Step("S", "a", OneOrMore(consecutive = true))))
    assert(one == want, one)
    val zero = matches(df,
      Seq(Step("S", "a", ZeroOrMore(consecutive = true))))
    assert(zero == want, zero)
  }

  test("NFAITCase testStartWithOptional:1883 — optional-first emits both classes") {
    val got = matches(ev(1 -> "c", 6 -> "b"),
      Seq(Step("S", "c", Optional), Step("E", "b")))
    assert(got == Set(("1,6", ""), ("6", "")), got)
  }

  test("committed doors: consecutive loops bind the greedy adjacent run") {
    // the committed (SkipToNextRow) scan of the same testStrictOneOrMore
    // shape: one match per anchor, the full adjacent run
    val got = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", OneOrMore(consecutive = true)), Step("E", "b")),
      am = SkipToNextRow)
    assert(got == Set(("1,3,8", "M:3")), got)
    // reluctant consecutive grows from the front instead
    val rel = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", OneOrMore(reluctant = true, consecutive = true)),
      Step("E", "b")), am = SkipToNextRow)
    assert(rel == Set(("1,3,8", "M:1")), rel)
    // timesOrMore(2).consecutive(): floor honored, greedy to the gap
    val t2 = matches(consecData, Seq(Step("S", "c"),
      Step("M", "a", TimesOrMore(2, consecutive = true)), Step("E", "b")),
      am = SkipToNextRow)
    assert(t2 == Set(("1,3,8", "M:3")), t2)
    // a gap directly after the only entry starves the 2-floor
    val starved = matches(ev(1 -> "c", 3 -> "a", 4 -> "d", 5 -> "a",
      6 -> "d", 7 -> "b"), Seq(Step("S", "c"),
      Step("M", "a", TimesOrMore(2, consecutive = true)), Step("E", "b")),
      am = SkipToNextRow)
    assert(starved.isEmpty, starved)
  }
}
