package graft

import graft.operators.MatchRecognize
import org.scalatest.funsuite.AnyFunSuite

/** STRICT-contiguity MATCH_RECOGNIZE parity, pinned to the REFERENCE'S
  * OWN expected outputs — not to oracles this engine authored (the r10
  * lesson: self-authored oracles can encode the engine's own
  * semantics). Vectors transcribed from:
  *
  *  - flink-table-planner-blink/.../stream/sql/MatchRecognizeITCase
  *    .scala (testSimplePattern:50, testSimplePatternWithNulls:96,
  *    testLogicalOffsets:372, testPartitionByWithParallelSource:421,
  *    testLogicalOffsetsWithStarVariable:467,
  *    testLogicalOffsetOutsideOfRangeInMeasures:527,
  *    testAggregates:578, testAggregatesWithNullInputs:639)
  *  - docs/dev/table/streaming/match_recognize.md (the greedy vs
  *    reluctant Ticker example :372-420 and the AFTER MATCH strategy
  *    example :910-1010)
  *
  * Adaptations, each noted at its test: the reference's ITCases run
  * without WITHIN (unbounded proc-time patterns); this engine requires
  * WITHIN for bounded state, so a horizon far wider than each vector's
  * span is added — it binds nothing. ORDER BY here is (ts, id); tests
  * whose reference form orders by proctime use the row sequence as ts.
  * The weightedAvg UDF measure/conjunct of testAggregates is dropped
  * (UDFs in MEASURES are a different surface); the trace is unchanged
  * because it never gates a binding there.
  */
class MatchStrictSpec extends AnyFunSuite {
  lazy val spark = StreamHarness.spark

  private val W = "WITHIN INTERVAL '1' HOUR"

  /** (id, name) rows, ts = id seconds, key 0. */
  private def named(rows: (Int, String)*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, n) =>
      (0L, id.toLong * 1000000L, id.toLong, n) }
      .toDF("key", "tsMicros", "id", "name")
  }

  test("ITCase testSimplePattern: strict contiguity skips the gapped triple") {
    // names: a z b c d a b c h — the (1,3,4) a/b/c triple has z between
    // a and b, so ONLY (6,7,8) matches (the reference's one expected row)
    val ev = named(1 -> "a", 2 -> "z", 3 -> "b", 4 -> "c", 5 -> "d",
      6 -> "a", 7 -> "b", 8 -> "c", 9 -> "h")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES A.id AS aid, B.id AS bid, C.id AS cid
         |  ONE ROW PER MATCH
         |  PATTERN (A B C) $W
         |  DEFINE A AS name = 'a', B AS name = 'b', C AS name = 'c')""".stripMargin)
      .select("aid", "bid", "cid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((6L, 7L, 8L)), out)
  }

  test("ITCase testSimplePatternWithNulls: null fields navigate and emit as NULL") {
    import spark.implicits._
    val ev = Seq[(Long, Long, Long, String, Option[String])](
      (0L, 1L, 1L, "a", None), (0L, 2L, 2L, "b", None),
      (0L, 3L, 3L, "c", None), (0L, 4L, 4L, "d", None),
      (0L, 5L, 5L, null, None), (0L, 6L, 6L, "a", None),
      (0L, 7L, 7L, "b", None), (0L, 8L, 8L, "c", None),
      (0L, 9L, 9L, null, None))
      .toDF("key", "tsMicros", "id", "name", "nullField")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES A.id AS aid, A.nullField AS aNull,
         |           LAST(B.nullField) AS bNull, C.id AS cid
         |  ONE ROW PER MATCH
         |  PATTERN (A B C) $W
         |  DEFINE A AS name = 'a' AND nullField IS NULL,
         |         B AS name = 'b' AND LAST(A.nullField) IS NULL,
         |         C AS name = 'c')""".stripMargin)
      .select("aid", "bNull", "cid", "aNull").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), r.getLong(2), Option(r.get(3))))
      .toSeq.sortBy(_._1)
    assert(out == Seq((1L, None, 3L, None), (6L, None, 8L, None)), out)
  }

  test("ITCase testLogicalOffsets: down-run with OR / IS NULL, committed greedy") {
    import spark.implicits._
    // (tstamp, price, tax) — the committed-greedy {2,} run means the
    // 19/17/13 descent followed by a NON-qualifying 20 yields NO match
    // (the reference emits only 6,7,8,33,33)
    val ev = Seq((1, 19, 1), (2, 17, 2), (3, 13, 3), (4, 20, 4),
      (5, 20, 5), (6, 26, 6), (7, 20, 7), (8, 25, 8))
      .map { case (t, p, x) => (0L, t.toLong * 1000000L, t.toLong, p.toDouble, x.toDouble, t.toLong) }
      .toDF("key", "tsMicros", "id", "price", "tax", "tstamp")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES FIRST(DOWN.tstamp) AS start_tstamp,
         |           LAST(DOWN.tstamp) AS bottom_tstamp,
         |           UP.tstamp AS end_tstamp,
         |           FIRST(DOWN.price + DOWN.tax + 1) AS bottom_total,
         |           UP.price + UP.tax AS end_total
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (DOWN{2,} UP) $W
         |  DEFINE DOWN AS price < LAST(DOWN.price, 1) OR LAST(DOWN.price, 1) IS NULL,
         |         UP AS price < FIRST(DOWN.price))""".stripMargin)
      .select("start_tstamp", "bottom_tstamp", "end_tstamp", "bottom_total",
        "end_total")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))).toSeq
    assert(out == Seq((6L, 7L, 8L, 33.0, 33.0)), out)
  }

  test("ITCase testPartitionByWithParallelSource: adjacent DOWN UP pair") {
    import spark.implicits._
    val ev = Seq((1, 19, 1), (2, 17, 2), (3, 13, 3), (4, 20, 4))
      .map { case (t, p, x) => (0L, t.toLong * 1000000L, t.toLong, p.toDouble, x.toLong) }
      .toDF("key", "tsMicros", "id", "price", "tax")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES DOWN.tax AS bottom_tax, UP.tax AS end_tax
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (DOWN UP) $W
         |  DEFINE DOWN AS DOWN.price = 13, UP AS UP.price = 20)""".stripMargin)
      .select("bottom_tax", "end_tax").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out == Seq((3L, 4L)), out)
  }

  test("ITCase testLogicalOffsetsWithStarVariable: unqualified FIRST/LAST offsets") {
    import spark.implicits._
    val ev = (1 to 8).zip(Seq(20, 19, 18, 17, 16, 15, 14, 20))
      .map { case (id, p) => (0L, id.toLong * 1000000L, id.toLong, p.toDouble) }
      .toDF("key", "tsMicros", "id", "price")
    val measures = ((0 to 7).map(k => s"FIRST(id, $k) AS f$k") ++
      (0 to 7).map(k => s"LAST(id, $k) AS l$k")).mkString(",\n")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES $measures
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (DOWN{2,} UP) $W
         |  DEFINE DOWN AS price < LAST(price, 1) OR LAST(price, 1) IS NULL,
         |         UP AS price = FIRST(price) AND price > FIRST(price, 3)
         |           AND price = LAST(price, 7))""".stripMargin).collect()
    assert(out.length == 1, out.toSeq)
    val r = out.head
    val fs = (0 to 7).map(k => r.getAs[Long](s"f$k"))
    val ls = (0 to 7).map(k => r.getAs[Long](s"l$k"))
    assert(fs == (1L to 8L), fs)
    assert(ls == (8L to 1L by -1), ls)
  }

  test("ITCase testLogicalOffsetOutsideOfRangeInMeasures: NULL measure") {
    import spark.implicits._
    val ev = Seq((1, 19), (2, 17), (3, 13), (4, 20))
      .map { case (t, p) => (0L, t.toLong * 1000000L, t.toLong, p.toDouble) }
      .toDF("key", "tsMicros", "id", "price")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES FIRST(DOWN.price) AS fst, LAST(DOWN.price) AS lst,
         |           FIRST(DOWN.price, 5) AS nullPrice
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (DOWN{2,} UP) $W
         |  DEFINE DOWN AS price < LAST(DOWN.price, 1) OR LAST(DOWN.price, 1) IS NULL,
         |         UP AS price > LAST(DOWN.price))""".stripMargin)
      .select("fst", "lst", "nullPrice").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), Option(r.get(2)))).toSeq
    assert(out == Seq((19.0, 13.0, None)), out)
  }

  test("ITCase testAggregates: quantified anchor, running aggs, optional prefers the earlier-ending match") {
    import spark.implicits._
    val ev = Seq(
      (1, "a", 1, 0.8), (2, "z", 2, 0.8), (3, "b", 1, 0.8), (4, "c", 1, 0.8),
      (5, "d", 4, 0.1), (6, "a", 2, 1.5), (7, "b", 2, 0.8), (8, "c", 1, 0.8),
      (9, "h", 4, 0.8), (10, "h", 4, 0.8), (11, "h", 2, 0.8), (12, "h", 2, 0.8))
      .map { case (id, n, p, r) =>
        (0L, id.toLong * 1000000L, id.toLong, n, p.toDouble, r) }
      .toDF("key", "tsMicros", "id", "name", "price", "rate")
    // C, D, E carry no DEFINE — the reference's default TRUE condition.
    // Expected (reference): "1,5,0,null,3,3.4,8" and "9,4,0,null,4,3.2,12"
    // (weightedAvg dropped). endId 8/12 pins D? binding EMPTY: the
    // D-empty match completes one event earlier and wins.
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES FIRST(id) AS startId, SUM(A.price) AS sumA,
         |           COUNT(D.price) AS countD, SUM(D.price) AS sumD,
         |           AVG(B.price) AS avgB,
         |           ROUND(SUM(B.price * B.rate), 6) AS sumExprB,
         |           LAST(id) AS endId
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (A+ B+ C D? E) $W
         |  DEFINE A AS SUM(A.price) < 6,
         |         B AS SUM(B.price * B.rate) < SUM(A.price) AND
         |              SUM(B.price * B.rate) > 0.2 AND
         |              SUM(B.price) >= 1 AND AVG(B.price) >= 1)""".stripMargin)
      .select("startId", "sumA", "countD", "sumD", "avgB", "sumExprB", "endId")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        Option(r.get(3)), r.getDouble(4), r.getDouble(5), r.getLong(6)))
      .toSeq.sortBy(_._1)
    assert(out == Seq(
      (1L, 5.0, 0L, None, 3.0, 3.4, 8L),
      (9L, 4.0, 0L, None, 4.0, 3.2, 12L)), out)
  }

  test("ITCase testAggregatesWithNullInputs: null-skipping running SUM, COUNT battery") {
    import spark.implicits._
    val ev = Seq[(Int, String, Option[Int])](
      (1, "a", Some(10)), (2, "z", Some(10)), (3, "b", None), (4, "c", None),
      (5, "d", Some(3)), (6, "c", Some(3)), (7, "c", Some(3)),
      (8, "c", Some(3)), (9, "c", Some(2)))
      .map { case (id, n, p) =>
        (0L, id.toLong * 1000000L, id.toLong, n, p.map(_.toDouble)) }
      .toDF("key", "tsMicros", "id", "name", "price")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES SUM(A.price) AS sumA, COUNT(A.id) AS countAId,
         |           COUNT(A.price) AS countAPrice, COUNT(*) AS countAll,
         |           COUNT(price) AS countAllPrice, LAST(id) AS endId
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (A+ C) $W
         |  DEFINE A AS SUM(A.price) < 30, C AS C.name = 'c')""".stripMargin)
      .select("sumA", "countAId", "countAPrice", "countAll", "countAllPrice",
        "endId").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq((29.0, 7L, 5L, 8L, 6L, 8L)), out)
  }

  test("ITCase testCodeSplitsAreProperlyGenerated: two STRING partition columns") {
    // the reference partitions by TWO STRING columns (key1, key2) —
    // the statement door's general surrogate-key path; DEFINE exercises
    // LIKE (row-local), LAST(A.name, 2) IS NULL (out-of-range string
    // navigation) and LAST(A.name) = 'a' (string navigation equality).
    // Adaptation: ORDER BY proctime → ts = id seconds (the vectors are
    // arrival-ordered); the maxGeneratedCodeLength config is a
    // flink-codegen knob with no analog here.
    import spark.implicits._
    Seq(
      (1L, "a", "key1", "second_key3"), (2L, "b", "key1", "second_key3"),
      (3L, "c", "key1", "second_key3"), (4L, "d", "key", "second_key"),
      (5L, "e", "key", "second_key"), (6L, "a", "key2", "second_key4"),
      (7L, "b", "key2", "second_key4"), (8L, "c", "key2", "second_key4"),
      (9L, "f", "key", "second_key"))
      .map { case (id, n, k1, k2) =>
        (id, new java.sql.Timestamp(id * 1000L), n, k1, k2) }
      .toDF("id", "ts", "name", "key1", "key2")
      .createOrReplaceTempView("codesplit_events")
    val out = graft.sources.MatchRecognizeSql.sql(spark,
      s"""SELECT * FROM codesplit_events MATCH_RECOGNIZE (
         |  PARTITION BY key1, key2
         |  ORDER BY ts
         |  MEASURES A.id AS aid, A.key1 AS akey1, LAST(B.id) AS bid,
         |           C.id AS cid, C.key2 AS ckey2
         |  ONE ROW PER MATCH
         |  PATTERN (A B C) $W
         |  DEFINE A AS name = 'a' AND key1 LIKE '%key%' AND id > 0,
         |         B AS name = 'b' AND LAST(A.name, 2) IS NULL,
         |         C AS name = 'c' AND LAST(A.name) = 'a')""".stripMargin)
    assert(out.columns.take(2).toSeq == Seq("key1", "key2"), out.columns.toSeq)
    val rows = out.select("key1", "key2", "aid", "akey1", "bid", "cid", "ckey2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getString(6)))
      .toSeq.sortBy(_._3)
    assert(rows == Seq(
      ("key1", "second_key3", 1L, "key1", 2L, 3L, "second_key3"),
      ("key2", "second_key4", 6L, "key2", 7L, 8L, "second_key4")), rows)
  }

  test("ITCase testEventsAreProperlyOrdered: secondary/ternary ORDER BY columns") {
    // ORDER BY rowtime, secondaryOrder DESC, ternaryOrder ASC — only
    // the last (a b c) triple survives the declared tie-break order;
    // the first three candidate triples are each broken by event-time,
    // secondary (DESC) or ternary (ASC) ordering respectively.
    // Adaptation: measures read A.event_id (the canonical copy of the
    // user id column — the canonical sequence id is the row_number of
    // the declared order here).
    import spark.implicits._
    Seq(
      (2L, 12L, 1L, "a", 1L), (1L, 11L, 2L, "b", 2L), (3L, 10L, 3L, "c", 3L),
      (4L, 8L, 4L, "a", 4L), (4L, 9L, 5L, "b", 5L), (5L, 7L, 6L, "c", 6L),
      (6L, 6L, 8L, "a", 7L), (6L, 6L, 7L, "b", 8L), (8L, 4L, 9L, "c", 9L),
      (9L, 3L, 10L, "a", 10L), (10L, 2L, 11L, "b", 11L), (11L, 1L, 12L, "c", 12L))
      .map { case (ts, sec, ter, n, id) =>
        (0L, new java.sql.Timestamp(ts * 1000L), sec, ter, n, id) }
      .toDF("part", "rowtime", "secondaryOrder", "ternaryOrder", "name",
        "event_id") // the secondary-order shape requires the
                    // unambiguous event_id spelling (a column named
                    // `id` would be shadowed by the sequence id)
      .createOrReplaceTempView("ordered_events")
    val out = graft.sources.MatchRecognizeSql.sql(spark,
      s"""SELECT aid, bid, cid FROM ordered_events MATCH_RECOGNIZE (
         |  PARTITION BY part
         |  ORDER BY rowtime, secondaryOrder DESC, ternaryOrder ASC
         |  MEASURES A.event_id AS aid, B.event_id AS bid, C.event_id AS cid
         |  ONE ROW PER MATCH
         |  PATTERN (A B C) $W
         |  DEFINE A AS name = 'a', B AS name = 'b', C AS name = 'c')""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((10L, 11L, 12L)), out)
  }

  test("ITCase testAccessingCurrentTime: CURRENT_TIMESTAMP in DEFINE") {
    // the reference gates A on `proctime >= CURRENT_TIMESTAMP -
    // INTERVAL '1' day` over a single-row source; here the event
    // carries a wall-clock timestamp column the row-local predicate
    // compares the same way (the proctime measure columns are not
    // asserted by the reference either — non-deterministic)
    import spark.implicits._
    val now = new java.sql.Timestamp(System.currentTimeMillis())
    val ev = Seq((0L, 1000000L, 1L, "a", now))
      .toDF("key", "tsMicros", "id", "name", "arrival")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES A.id AS aid
         |  ONE ROW PER MATCH
         |  PATTERN (A) $W
         |  DEFINE A AS arrival >= CURRENT_TIMESTAMP - INTERVAL '1' DAY)""".stripMargin)
      .select("aid").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L), out)
  }

  test("ITCase testUserDefinedFunctions: scalar UDF in DEFINE and MEASURES") {
    // the reference registers prefix (scalar, open()-parameterized to
    // 'PREF') and countFrom (an agg UDF counting from start=4) —
    // prefix transcribes directly as a registered Spark UDF in both a
    // row-local DEFINE conjunct and a scalar measure; countFrom(x) =
    // start + COUNT(x) rewrites onto the built-in running COUNT
    // (countFrom(A.price) <= 8 ≡ COUNT(A.price) <= 4), with the
    // measure asserting COUNT and the +4 applied in the expectation.
    import spark.implicits._
    spark.udf.register("prefix_fn", (s: String) => "PREF:" + s)
    val ev = named(1 -> "a", 2 -> "a", 3 -> "a", 4 -> "a", 5 -> "a",
      6 -> "b", 7 -> "a", 8 -> "a", 9 -> "f")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES FIRST(id) AS firstId,
         |           prefix_fn(A.name) AS prefixedNameA,
         |           COUNT(A.id) AS countA,
         |           LAST(id) AS lastId
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN (A+ C) $W
         |  DEFINE A AS prefix_fn(A.name) = 'PREF:a' AND COUNT(A.id) <= 4)""".stripMargin)
      .select("firstId", "prefixedNameA", "countA", "lastId").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2) + 4L, r.getLong(3)))
      .toSeq.sortBy(_._1)
    // reference expectation: "1,PREF:a,8,5" and "7,PREF:a,6,9"
    assert(out == Seq((1L, "PREF:a", 8L, 5L), (7L, "PREF:a", 6L, 9L)), out)
  }

  test("doc greedy vs reluctant Ticker example (match_recognize.md:372-420)") {
    import spark.implicits._
    val ev = Seq((2, 10), (3, 11), (4, 12), (5, 13), (6, 14), (7, 16))
      .map { case (t, p) => (0L, t.toLong * 1000000L, t.toLong, p.toDouble) }
      .toDF("key", "tsMicros", "id", "price")
    def run(pat: String) = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES C.price AS lastPrice
         |  ONE ROW PER MATCH
         |  AFTER MATCH SKIP PAST LAST ROW
         |  PATTERN ($pat) $W
         |  DEFINE A AS A.price > 10, B AS B.price < 15,
         |         C AS C.price > 12)""".stripMargin)
      .select("lastPrice").collect().map(_.getDouble(0)).toSeq.sorted
    assert(run("A B* C") == Seq(16.0))          // greedy swallows 12,13,14
    assert(run("A B*? C") == Seq(13.0, 16.0))   // reluctant stops at 12
  }

  test("doc AFTER MATCH strategy example (match_recognize.md:910-1010)") {
    import spark.implicits._
    val ev = Seq((1, 7), (2, 9), (3, 10), (4, 5), (5, 10), (6, 7), (7, 14))
      .map { case (t, p) => (0L, t.toLong * 1000000L, t.toLong, p.toDouble) }
      .toDF("key", "tsMicros", "id", "price")
    def run(strategy: String) = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES SUM(A.price) AS sumPrice, FIRST(tsMicros) AS startTime,
         |           LAST(tsMicros) AS endTime
         |  ONE ROW PER MATCH
         |  AFTER MATCH $strategy
         |  PATTERN (A+ C) $W
         |  DEFINE A AS SUM(A.price) < 30)""".stripMargin)
      .select("sumPrice", "startTime", "endTime").collect()
      .map(r => (r.getDouble(0), r.getLong(1) / 1000000L,
        r.getLong(2) / 1000000L)).toSeq.sortBy(_._2)
    // C has no DEFINE — default TRUE. The committed greedy A+ means the
    // attempt at row 6 (A absorbs 6,7, no row left for C) emits NOTHING
    // — the doc's outputs pin exactly this.
    assert(run("SKIP PAST LAST ROW") == Seq((26.0, 1L, 4L), (17.0, 5L, 7L)))
    assert(run("SKIP TO NEXT ROW") == Seq(
      (26.0, 1L, 4L), (24.0, 2L, 5L), (25.0, 3L, 6L), (22.0, 4L, 7L),
      (17.0, 5L, 7L)))
    assert(run("SKIP TO LAST A") == Seq(
      (26.0, 1L, 4L), (25.0, 3L, 6L), (17.0, 5L, 7L)))
    // SKIP TO FIRST A re-anchors at the match start — the reference
    // throws (AfterMatchSkipStrategy throwExceptionOnMiss)
    val e = intercept[Exception] { run("SKIP TO FIRST A") }
    assert(e.getMessage != null)
  }

  test("strict contiguity matrix: gaps, loops, {,m}, default DEFINE, ties") {
    import spark.implicits._
    def chains(rows: Seq[(Int, String)], clause: String): Seq[String] = {
      val ev = named(rows.map { case (i, n) => i -> n }: _*)
      MatchRecognize.run(spark, ev, clause).select("chain")
        .collect().map(_.getString(0)).toSeq.sorted
    }
    val abc = s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
                 |  PATTERN (A B) $W
                 |  DEFINE A AS name = 'a', B AS name = 'b')""".stripMargin
    // bare concatenation: a gap of ANY unmapped row kills the match
    assert(chains(Seq(1 -> "a", 2 -> "x", 3 -> "b"), abc).isEmpty)
    assert(chains(Seq(1 -> "a", 2 -> "b"), abc) == Seq("1,2"))
    // B+ run interrupted by an unmapped row: no match
    val abp = s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
                 |  PATTERN (A B+ P) $W
                 |  DEFINE A AS name = 'a', B AS name = 'b', P AS name = 'p')""".stripMargin
    assert(chains(Seq(1 -> "a", 2 -> "b", 3 -> "x", 4 -> "b", 5 -> "p"), abp)
      .isEmpty)
    assert(chains(Seq(1 -> "a", 2 -> "b", 3 -> "b", 4 -> "p"), abp)
      == Seq("1,2,4"))  // loop chain convention: first element + counts
    // {,m} = 0..m rows (match_recognize.md:357)
    val a2p = s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
                 |  PATTERN (A B{,2} P) $W
                 |  DEFINE A AS name = 'a', B AS name = 'b', P AS name = 'p')""".stripMargin
    assert(chains(Seq(1 -> "a", 2 -> "p"), a2p) == Seq("1,2"))
    assert(chains(Seq(1 -> "a", 2 -> "b", 3 -> "b", 4 -> "p"), a2p)
      == Seq("1,2,3,4"))
    // three b's exceed {,2}: committed munch caps at 2, P must bind the
    // third b — dead
    assert(chains(Seq(1 -> "a", 2 -> "b", 3 -> "b", 4 -> "b", 5 -> "p"), a2p)
      .isEmpty)
    // a variable without DEFINE defaults to TRUE (md:257)
    val defl = s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
                  |  PATTERN (A X P) $W
                  |  DEFINE A AS name = 'a', P AS name = 'p')""".stripMargin
    assert(chains(Seq(1 -> "a", 2 -> "zz", 3 -> "p"), defl) == Seq("1,2,3"))
    // equal-timestamp neighbors chain: adjacency is (ts, id) positional
    val ev = Seq((0L, 10L, 1L, "a"), (0L, 10L, 2L, "b"))
      .toDF("key", "tsMicros", "id", "name")
    val tied = MatchRecognize.run(spark, ev, abc).select("chain")
      .collect().map(_.getString(0)).toSeq
    assert(tied == Seq("1,2"), tied)
  }

  test("DEFINE mixing top-level AND and OR keeps SQL precedence (r11 review)") {
    // (name = 'a' AND id > 5) OR name = 'z' — splitting at the AND
    // would regroup it as name='a' AND (id>5 OR name='z') and reject
    // the z row; the row-local whole-body path keeps expr()'s native
    // precedence
    val ev = named(1 -> "z", 2 -> "b")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  PATTERN (A B) $W
         |  DEFINE A AS name = 'a' AND id > 5 OR name = 'z',
         |         B AS name = 'b')""".stripMargin)
      .select("chain").collect().map(_.getString(0)).toSeq
    assert(out == Seq("1,2"), out)
    // ...and with navigation in the mix the ambiguity is LOUD
    val e = intercept[RuntimeException] {
      MatchRecognize.run(spark, named(1 -> "a", 2 -> "b"),
        s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
           |  PATTERN (A B) $W
           |  DEFINE A AS name = 'a',
           |         B AS name = 'b' AND id > LAST(A.id) OR name = 'z')""".stripMargin)
        .collect()
    }
    assert(e.getMessage.contains("parenthesize"), e.getMessage)
  }

  test("MEASURES string literals survive qualifier stripping (r11 review)") {
    // a literal containing "B." must not be rewritten by the
    // variable-prefix strip
    val ev = named(1 -> "a", 2 -> "b")
    val out = MatchRecognize.run(spark, ev,
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  MEASURES concat('B.', B.name) AS tag
         |  ONE ROW PER MATCH
         |  PATTERN (A B) $W
         |  DEFINE A AS name = 'a', B AS name = 'b')""".stripMargin)
      .select("tag").collect().map(_.getString(0)).toSeq
    assert(out == Seq("B.b"), out)
  }

  test("pattern-shape rejections mirror the reference's") {
    def bad(pattern: String, defines: String = "A AS name = 'a'"): String =
      intercept[RuntimeException] {
        MatchRecognize.compile(
          s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
             |  PATTERN ($pattern) $W DEFINE $defines)""".stripMargin)
      }.getMessage
    // empty-match patterns (StreamExecMatch.scala:181)
    assert(bad("A*?").contains("empty match"))
    assert(bad("A? B*", "A AS name = 'a', B AS name = 'b'")
      .contains("empty match"))
    // greedy quantifier may not end the pattern (:188)
    assert(bad("A B+", "A AS name = 'a', B AS name = 'b'")
      .contains("greedy"))
    assert(bad("A B{1,3}", "A AS name = 'a', B AS name = 'b'")
      .contains("greedy"))
    // ...but a reluctant loop, exact count, or optional may
    MatchRecognize.compile(
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  PATTERN (A B+?) $W
         |  DEFINE A AS name = 'a', B AS name = 'b')""".stripMargin)
    MatchRecognize.compile(
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  PATTERN (A B{2}) $W
         |  DEFINE A AS name = 'a', B AS name = 'b')""".stripMargin)
    MatchRecognize.compile(
      s"""MATCH_RECOGNIZE (PARTITION BY key ORDER BY ts
         |  PATTERN (A B?) $W
         |  DEFINE A AS name = 'a', B AS name = 'b')""".stripMargin)
    // reluctant optional (:445) — all three spellings
    assert(bad("A B??", "A AS name = 'a', B AS name = 'b'")
      .contains("reluctant optional"))
    assert(bad("A B{0,1}?", "A AS name = 'a', B AS name = 'b'")
      .contains("reluctant optional"))
    assert(bad("A B{,1}?", "A AS name = 'a', B AS name = 'b'")
      .contains("reluctant optional"))
    // unique variables (:409)
    assert(bad("A B A", "A AS name = 'a', B AS name = 'b'")
      .contains("unique"))
    // {n} requires n > 0 (md:355)
    assert(bad("A B{0}", "A AS name = 'a', B AS name = 'b'")
      .contains("n > 0"))
  }
}
