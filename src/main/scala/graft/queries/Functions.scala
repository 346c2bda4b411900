package graft.queries

import graft.QueryGroup
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar function parity (SURVEY.md §2.8 — FlinkSqlOperatorTable /
  * BuiltInFunctionDefinitions): string, math, temporal, conditional,
  * collection, JSON and hash batteries, plus the reference's functions
  * Spark lacks (IS_ALPHA / IS_DIGIT / IS_DECIMAL / SPLIT_INDEX) as
  * native codegen'd Catalyst expressions.
  *
  * Each query evaluates a battery per row (whole-stage codegen, no
  * UDF boxing) over a bounded slice, with a DuckDB-equivalent oracle.
  */
object Functions extends QueryGroup {

  override def queries = Seq(

    q("f1_string",
      """SELECT p_partkey,
        |  length(p_name) AS len,
        |  upper(p_name) AS up, lower(p_brand) AS lo,
        |  substr(p_name, 2, 5) AS sub,
        |  concat_ws('-', p_brand, p_type) AS cat,
        |  lpad(p_brand, 12, '*') AS lp, rpad(p_brand, 12, '*') AS rp,
        |  trim('  ' || p_name || '  ') AS trm,
        |  replace(p_type, ' ', '_') AS repl,
        |  reverse(p_name) AS rev,
        |  strpos(p_name, 'a') AS pos,
        |  split_part(p_name, ' ', 2) AS spl,
        |  regexp_extract(p_brand, '([0-9]+)', 1) AS rex,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS rrep,
        |  ascii(p_brand) AS asc_c, chr(65 + p_size % 26) AS chr_c,
        |  repeat('ab', p_size % 3) AS rept,
        |  translate(p_name, 'ae', 'XY') AS trans,
        |  left(p_name, 4) AS l4, right(p_name, 4) AS r4
        |FROM part WHERE p_partkey <= 500
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir)("part").filter(col("p_partkey") <= 500)
        .select(
          col("p_partkey"),
          length(col("p_name")).as("len"),
          upper(col("p_name")).as("up"), lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 2, 5).as("sub"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cat"),
          lpad(col("p_brand"), 12, "*").as("lp"), rpad(col("p_brand"), 12, "*").as("rp"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trm"),
          regexp_replace(col("p_type"), " ", "_").as("repl"),
          reverse(col("p_name")).as("rev"),
          instr(col("p_name"), "a").as("pos"),
          split_part(col("p_name"), lit(" "), lit(2)).as("spl"),
          regexp_extract(col("p_brand"), "([0-9]+)", 1).as("rex"),
          regexp_replace(col("p_name"), "[aeiou]", "*").as("rrep"),
          ascii(col("p_brand")).as("asc_c"), chr(lit(65) + col("p_size") % 26).as("chr_c"),
          repeat(lit("ab"), (col("p_size") % 3).cast(IntegerType)).as("rept"),
          translate(col("p_name"), "ae", "XY").as("trans"),
          substring(col("p_name"), 1, 4).as("l4"),
          expr("right(p_name, 4)").as("r4"))
        .orderBy("p_partkey")
    },

    q("f2_math",
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS a,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS fl,
        |  round(l_extendedprice, 1) AS rnd,
        |  round(sqrt(l_quantity), 6) AS sq,
        |  round(exp(l_discount), 6) AS ex,
        |  round(ln(l_extendedprice), 6) AS lg,
        |  round(log10(l_extendedprice), 6) AS lg10,
        |  round(power(l_quantity, 2), 1) AS pw,
        |  mod(CAST(l_quantity AS BIGINT), 7) AS md,
        |  CAST(sign(l_quantity - 25) AS INT) AS sg,
        |  round(sin(l_discount), 6) AS sn,
        |  round(atan2(l_quantity, l_extendedprice), 6) AS at2,
        |  round(degrees(l_discount), 6) AS dg,
        |  greatest(l_quantity, l_discount * 100) AS gr,
        |  least(l_quantity, l_discount * 100) AS ls,
        |  l_orderkey & 255 AS band, l_orderkey | 256 AS bor, xor(l_orderkey, 85) AS bxor
        |FROM lineitem WHERE l_orderkey <= 1000
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem").filter(col("l_orderkey") <= 1000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_quantity") - 25).as("a"),
          ceil(col("l_extendedprice")).cast(LongType).as("ce"),
          floor(col("l_extendedprice")).cast(LongType).as("fl"),
          round(col("l_extendedprice"), 1).as("rnd"),
          round(sqrt(col("l_quantity")), 6).as("sq"),
          round(exp(col("l_discount")), 6).as("ex"),
          round(log(col("l_extendedprice")), 6).as("lg"),
          round(log10(col("l_extendedprice")), 6).as("lg10"),
          round(pow(col("l_quantity"), 2), 1).as("pw"),
          (col("l_quantity").cast(LongType) % 7).as("md"),
          signum(col("l_quantity") - 25).cast(IntegerType).as("sg"),
          round(sin(col("l_discount")), 6).as("sn"),
          round(atan2(col("l_quantity"), col("l_extendedprice")), 6).as("at2"),
          round(degrees(col("l_discount")), 6).as("dg"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_quantity"), col("l_discount") * 100).as("ls"),
          expr("l_orderkey & 255").as("band"),
          expr("l_orderkey | 256").as("bor"),
          expr("l_orderkey ^ 85").as("bxor"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    q("f3_temporal",
      """SELECT o_orderkey,
        |  year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |  quarter(o_orderdate) AS q, dayofyear(o_orderdate) AS doy,
        |  weekofyear(o_orderdate) AS woy,
        |  (dayofweek(o_orderdate) % 7) + 1 AS dow,
        |  hour(o_orderdate) AS hh, minute(o_orderdate) AS mi, second(o_orderdate) AS ss,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
        |  strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS fmt,
        |  CAST(epoch(o_orderdate) AS BIGINT) AS unix_s,
        |  CAST(o_orderdate AS DATE) + 30 AS plus30,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since
        |FROM orders WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir)("orders").filter(col("o_orderkey") <= 2000)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          quarter(col("o_orderdate")).as("q"), dayofyear(col("o_orderdate")).as("doy"),
          weekofyear(col("o_orderdate")).as("woy"),
          dayofweek(col("o_orderdate")).as("dow"),
          hour(col("o_orderdate")).as("hh"), minute(col("o_orderdate")).as("mi"),
          second(col("o_orderdate")).as("ss"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("mon_start"),
          date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("fmt"),
          unix_timestamp(col("o_orderdate")).as("unix_s"),
          date_add(col("o_orderdate").cast(DateType), 30).as("plus30"),
          last_day(col("o_orderdate").cast(DateType)).as("eom"),
          datediff(col("o_orderdate").cast(DateType), lit("1995-01-01").cast(DateType)).as("days_since"))
        .orderBy("o_orderkey")
    },

    q("f4_conditional",
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'debt' WHEN c_acctbal < 5000 THEN 'mid' ELSE 'rich' END AS bucket,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '<masked>') AS seg,
        |  CASE WHEN c_acctbal IS NULL THEN 1 ELSE 0 END AS bal_null,
        |  CASE WHEN c_nationkey IS DISTINCT FROM 3 THEN 1 ELSE 0 END AS not_n3,
        |  greatest(c_acctbal, 0) AS floor0,
        |  if(c_acctbal > 0, 'pos', 'neg') AS sgn
        |FROM customer WHERE c_custkey <= 500
        |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      t(s, dir)("customer").filter(col("c_custkey") <= 500)
        .select(
          col("c_custkey"),
          when(col("c_acctbal") < 0, "debt").when(col("c_acctbal") < 5000, "mid")
            .otherwise("rich").as("bucket"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("<masked>")).as("seg"),
          when(col("c_acctbal").isNull, 1).otherwise(0).as("bal_null"),
          when(!(col("c_nationkey") <=> lit(3)), 1).otherwise(0).as("not_n3"),
          greatest(col("c_acctbal"), lit(0)).as("floor0"),
          when(col("c_acctbal") > 0, "pos").otherwise("neg").as("sgn"))
        .orderBy("c_custkey")
    },

    q("f5_array",
      """SELECT doc_id,
        |  len(string_split_regex(trim(text), '\s+')) AS n_tokens,
        |  array_to_string(list_slice(string_split_regex(trim(text), '\s+'), 1, 3), ' ') AS first3,
        |  array_to_string(list_slice(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), 1, 5), ',') AS vocab5,
        |  CAST(list_contains(string_split_regex(trim(text), '\s+'), 'spark') AS INT) AS has_spark
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val toks = split(trim(col("text")), "\\s+")
      t(s, dir)("documents").filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          size(toks).as("n_tokens"),
          array_join(slice(toks, 1, 3), " ").as("first3"),
          array_join(slice(array_sort(array_distinct(toks)), 1, 5), ",").as("vocab5"),
          array_contains(toks, "spark").cast(IntegerType).as("has_spark"))
        .orderBy("doc_id")
    },

    // UNNEST / Correlate (SURVEY §2.2): explode tokens → global counts.
    q("f6_unnest",
      """SELECT token, count(*) AS n
        |FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS token
        |      FROM documents WHERE doc_id < 50)
        |GROUP BY token
        |ORDER BY token""".stripMargin) { (s, dir) =>
      t(s, dir)("documents").filter(col("doc_id") < 50)
        .select(explode(split(trim(col("text")), "\\s+")).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy("token")
    },

    // posexplode / WITH ORDINALITY.
    q("f7_posexplode",
      """SELECT doc_id, CAST(g.i AS INT) AS pos, toks[CAST(g.i AS INT)] AS token
        |FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
        |      FROM documents WHERE doc_id < 10) d
        |JOIN range(1, 10000) g(i) ON g.i <= len(toks)
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      t(s, dir)("documents").filter(col("doc_id") < 10)
        .select(col("doc_id"), posexplode(split(trim(col("text")), "\\s+")))
        .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("token"))
        .orderBy("doc_id", "pos")
    },

    q("f8_hash_json",
      """SELECT event_id,
        |  md5(props) AS h_md5,
        |  sha256(props) AS h_sha,
        |  lower(hex(event_type)) AS h_hex,
        |  to_base64(encode(event_type)) AS h_b64,
        |  bin(event_id) AS h_bin,
        |  json_extract_string(props, '$.k') AS json_k
        |FROM events WHERE event_id < 500
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir)("events").filter(col("event_id") < 500)
        .select(
          col("event_id"),
          md5(col("props").cast(BinaryType)).as("h_md5"),
          sha2(col("props").cast(BinaryType), 256).as("h_sha"),
          lower(hex(col("event_type"))).as("h_hex"),
          base64(col("event_type").cast(BinaryType)).as("h_b64"),
          bin(col("event_id")).as("h_bin"),
          get_json_object(col("props"), "$.k").as("json_k"))
        .orderBy("event_id")
    },

    // JSON parse + map functions: from_json typed extraction, map
    // keys/values/concat (MULTISET/MAP surface, SURVEY §1.2).
    q("f11_json_map",
      """SELECT event_id,
        |  CAST(props->>'$.k' AS INT) AS k_typed,
        |  CAST(props->>'$.k' AS INT) * 2 AS k2,
        |  'k,lang' AS mkeys,
        |  (props->>'$.k') || ',' || lang AS mvals
        |FROM (SELECT e.event_id, e.props, d.lang
        |      FROM events e JOIN documents d ON e.event_id % 500 = d.doc_id
        |      WHERE e.event_id < 300)
        |ORDER BY event_id""".stripMargin) { (s, dir) =>
      val e = t(s, dir)("events").filter(col("event_id") < 300)
      val d = t(s, dir)("documents")
      val joined = e.join(d, e("event_id") % 500 === d("doc_id"))
      val parsed = from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
      val m = map_concat(
        expr("map('k', get_json_object(props, '$.k'))"),
        expr("map('lang', lang)"))
      joined.select(
          col("event_id"),
          parsed.getField("k").as("k_typed"),
          (parsed.getField("k") * 2).as("k2"),
          array_join(array_sort(map_keys(m)), ",").as("mkeys"),
          concat(element_at(m, "k"), lit(","), element_at(m, "lang")).as("mvals"))
        .orderBy("event_id")
    },

    // OVERLAY / PARSE_URL / STR_TO_MAP / LEVENSHTEIN — reference
    // functions without direct DuckDB twins; oracles emulate them.
    q("f10_string_gaps",
      """SELECT doc_id,
        |  substr(lang, 1, 0) || 'XX' || substr(lang, 3) AS ovl,
        |  regexp_extract('https://' || source || '.example.com/d/' || doc_id || '?lang=' || lang,
        |                 '^[a-z]+://([^/]+)', 1) AS host,
        |  regexp_extract('https://' || source || '.example.com/d/' || doc_id || '?lang=' || lang,
        |                 '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract('https://' || source || '.example.com/d/' || doc_id || '?lang=' || lang,
        |                 '\?(.*)$', 1) AS query,
        |  lang AS m_lang, source AS m_src,
        |  levenshtein(lang, 'en') AS lev
        |FROM documents WHERE doc_id < 100
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val url = concat(lit("https://"), col("source"), lit(".example.com/d/"),
        col("doc_id"), lit("?lang="), col("lang"))
      val m = expr("str_to_map(concat('lang=', lang, '&src=', source), '&', '=')")
      t(s, dir)("documents").filter(col("doc_id") < 100)
        .select(
          col("doc_id"),
          overlay(col("lang"), lit("XX"), lit(1), lit(2)).as("ovl"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY")).as("query"),
          element_at(m, "lang").as("m_lang"),
          element_at(m, "src").as("m_src"),
          levenshtein(col("lang"), lit("en")).as("lev"))
        .orderBy("doc_id")
    },

    // CAST / TRY_CAST semantics battery (SURVEY §1.2 type system).
    // Documented delta mirrored in the oracle: Spark casts double→int
    // by TRUNCATION, DuckDB by rounding — oracle uses trunc().
    q("f12_casts",
      """SELECT o_orderkey,
        |  CAST(trunc(o_totalprice) AS BIGINT) AS d2l,
        |  CAST(o_totalprice AS VARCHAR) AS d2s,
        |  TRY_CAST(o_orderpriority AS INT) AS bad_int,
        |  TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INT) AS rt_int,
        |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS ts2s,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS dec2d,
        |  CAST(o_orderkey % 2 = 0 AS INT) AS b2i
        |FROM orders WHERE o_orderkey <= 1000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir)("orders").filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          col("o_totalprice").cast(LongType).as("d2l"),
          col("o_totalprice").cast(StringType).as("d2s"),
          expr("try_cast(o_orderpriority AS INT)").as("bad_int"),
          col("o_orderkey").cast(StringType).cast(IntegerType).as("rt_int"),
          col("o_orderdate").cast(DateType).cast(StringType).as("ts2s"),
          col("o_totalprice").cast(DecimalType(18, 2)).cast(DoubleType).as("dec2d"),
          (col("o_orderkey") % 2 === 0).cast(IntegerType).as("b2i"))
        .orderBy("o_orderkey")
    },

    // Trig/hyperbolic battery (hyperbolics emulated via exp in the
    // oracle — DuckDB lacks sinh/cosh/tanh).
    q("f13_trig",
      """SELECT l_orderkey, l_linenumber,
        |  round(tan(l_discount), 6) AS tn,
        |  round(cot(l_discount + 0.01), 6) AS ct,
        |  round(asin(l_discount), 6) AS asn,
        |  round(acos(l_discount), 6) AS acs,
        |  round(atan(l_quantity), 6) AS atn,
        |  round(cbrt(l_quantity), 6) AS cbr,
        |  round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS snh,
        |  round((exp(l_discount) + exp(-l_discount)) / 2, 6) AS csh,
        |  round((exp(2 * l_discount) - 1) / (exp(2 * l_discount) + 1), 6) AS tnh
        |FROM lineitem WHERE l_orderkey <= 300
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem").filter(col("l_orderkey") <= 300)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(tan(col("l_discount")), 6).as("tn"),
          round(expr("cot(l_discount + 0.01)"), 6).as("ct"),
          round(asin(col("l_discount")), 6).as("asn"),
          round(acos(col("l_discount")), 6).as("acs"),
          round(atan(col("l_quantity")), 6).as("atn"),
          round(cbrt(col("l_quantity")), 6).as("cbr"),
          round(sinh(col("l_discount")), 6).as("snh"),
          round(cosh(col("l_discount")), 6).as("csh"),
          round(tanh(col("l_discount")), 6).as("tnh"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // The reference's gap functions as native Catalyst expressions
    // (IS_ALPHA / IS_DIGIT / IS_DECIMAL / SPLIT_INDEX — SURVEY §2.8).
    q("f9_flink_gaps",
      """SELECT p_partkey,
        |  CAST(regexp_matches(p_type, '^[A-Za-z]+$') AS INT) AS alpha_type,
        |  CAST(CASE WHEN len(string_split(p_brand, '#')) > 1
        |       THEN regexp_matches(string_split(p_brand, '#')[2], '^[0-9]+$') ELSE 0 END AS INT) AS digit_id,
        |  CAST(regexp_matches(CAST(p_retailprice AS VARCHAR), '^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$') AS INT) AS dec_price,
        |  CASE WHEN len(string_split(p_name, ' ')) > 1 THEN string_split(p_name, ' ')[2] END AS name_part1
        |FROM part WHERE p_partkey <= 300
        |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      import GraftFunctions._
      GraftFunctions.register(s)
      t(s, dir)("part").filter(col("p_partkey") <= 300)
        .select(
          col("p_partkey"),
          is_alpha(col("p_type")).cast(IntegerType).as("alpha_type"),
          coalesce(is_digit(split_index(col("p_brand"), lit("#"), lit(1))), lit(false))
            .cast(IntegerType).as("digit_id"),
          is_decimal(col("p_retailprice").cast(StringType)).cast(IntegerType).as("dec_price"),
          split_index(col("p_name"), lit(" "), lit(1)).as("name_part1"))
        .orderBy("p_partkey")
    },

    // ROW type surface (the reference's ROW<...> constructor, nested
    // field access, and ARRAY<ROW> — SURVEY §2.8): per customer the
    // order history is folded into a date-sorted array of structs,
    // then first/last elements are accessed by position and field.
    // Struct comparison sorts lexicographically by field order, so
    // (date, orderkey, price) structs sort exactly like the oracle's
    // ORDER BY o_orderdate, o_orderkey.
    q("f14_row_type",
      """WITH a AS (
        |  SELECT o_custkey,
        |    list(struct_pack(d := o_orderdate, k := o_orderkey, p := o_totalprice)
        |         ORDER BY o_orderdate, o_orderkey) AS arr
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, len(arr) AS n_orders,
        |  arr[1].d AS first_date, arr[1].p AS first_price,
        |  arr[-1].d AS last_date, arr[-1].p AS last_price
        |FROM a ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      val a = t(s, dir)("orders")
        .groupBy("o_custkey")
        .agg(sort_array(collect_list(struct(
          col("o_orderdate").as("d"), col("o_orderkey").as("k"),
          col("o_totalprice").as("p")))).as("arr"))
      a.select(col("o_custkey"), size(col("arr")).as("n_orders"),
          element_at(col("arr"), 1).getField("d").as("first_date"),
          element_at(col("arr"), 1).getField("p").as("first_price"),
          element_at(col("arr"), -1).getField("d").as("last_date"),
          element_at(col("arr"), -1).getField("p").as("last_price"))
        .orderBy("o_custkey")
    },

    // Remaining reference scalar-function stragglers with DuckDB
    // equivalents: TIMESTAMPADD / TIMESTAMPDIFF (day/hour units on
    // day-aligned timestamps so boundary-crossing vs elapsed-unit
    // semantics coincide), FROM_UNIXTIME (UTC-rendered), LOCATE, and
    // numeric TRUNCATE emulated as floor-scaling (Flink TRUNCATE(x,2);
    // identical IEEE ops in both engines). INITCAP and CONVERT_TZ have
    // no DuckDB twin — spec-pinned in FunctionsSpec instead.
    q("f15_function_extras",
      """SELECT o_orderkey,
        |  o_orderdate + INTERVAL 3 DAY AS plus3,
        |  date_diff('day', DATE '1995-01-01', o_orderdate) AS dd,
        |  date_diff('hour', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS hh,
        |  strftime(to_timestamp(o_orderkey % 100000) AT TIME ZONE 'UTC',
        |           '%Y-%m-%d %H:%M:%S') AS fu,
        |  strpos(o_orderpriority, 'URGENT') AS loc,
        |  floor(o_totalprice * 100) / 100 AS trunc2
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir)("orders").select(col("o_orderkey"),
          expr("timestampadd(DAY, 3, o_orderdate)").as("plus3"),
          expr("timestampdiff(DAY, DATE'1995-01-01', o_orderdate)").as("dd"),
          expr("timestampdiff(HOUR, TIMESTAMP'1995-01-01 00:00:00', o_orderdate)")
            .as("hh"),
          from_unixtime(col("o_orderkey") % 100000).as("fu"),
          locate("URGENT", col("o_orderpriority")).cast(LongType).as("loc"),
          (floor(col("o_totalprice") * 100) / 100).as("trunc2"))
        .orderBy("o_orderkey")
    },

    // SIMILAR TO (SURVEY §2.8 — SqlStdOperatorTable.SIMILAR_TO via
    // FlinkSqlOperatorTable.java:1032; Spark's grammar has no SIMILAR
    // TO): the infix text goes through GraftSqlParser's rewrite to
    // the codegen'd similar_to expression — whole-string SQL:2003
    // match with % / _ / alternation, regex metachars as literals.
    // DuckDB's own SIMILAR TO is plain-regex (non-standard), so the
    // oracle spells the TRANSLATED pattern via regexp_full_match.
    q("f16_similar_to",
      """SELECT p_partkey,
        |  regexp_full_match(p_name, '.*(widget|rod).*') AS m1,
        |  regexp_full_match(p_brand, 'Brand#1.') AS m2,
        |  NOT regexp_full_match(p_type, '.*(ECONOMY|PROMO)') AS m3
        |FROM part ORDER BY p_partkey""".stripMargin) { (s, dir) =>
      t(s, dir)("part").createOrReplaceTempView("f16_part")
      s.sql(
        """SELECT p_partkey,
          |  p_name SIMILAR TO '%(widget|rod)%' AS m1,
          |  p_brand SIMILAR TO 'Brand#1_' AS m2,
          |  p_type NOT SIMILAR TO '%(ECONOMY|PROMO)' AS m3
          |FROM f16_part ORDER BY p_partkey""".stripMargin)
    },

    // IS JSON predicate family (SURVEY §2.8 — FlinkSqlOperatorTable
    // IS_JSON_VALUE/OBJECT/ARRAY/SCALAR; runtime vectors from the
    // reference's JsonFunctionsTest). events.props carries real JSON
    // objects; the derived columns exercise array wrapping and a
    // deliberately broken suffix. DuckDB oracle via json_valid +
    // json_type.
    q("f17_is_json",
      """SELECT event_id,
        |  json_valid(props) AS v,
        |  CASE WHEN json_valid(props) THEN json_type(props) = 'OBJECT'
        |       ELSE false END AS o,
        |  json_valid('[' || props || ']')
        |    AND json_type('[' || props || ']') = 'ARRAY' AS a,
        |  json_valid(substr(props, 2)) AS broken
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir)("events").createOrReplaceTempView("f17_events")
      s.sql(
        """SELECT event_id,
          |  props IS JSON VALUE AS v,
          |  props IS JSON OBJECT AS o,
          |  concat('[', props, ']') IS JSON ARRAY AS a,
          |  substr(props, 2) IS JSON VALUE AS broken
          |FROM f17_events ORDER BY event_id""".stripMargin)
    },

    // OVERLAPS period predicate (SURVEY §2.8 —
    // SqlStdOperatorTable.OVERLAPS; reference vectors spec-pinned in
    // SqlTextSpec): each event's half-hour window against its day's
    // fixed 12:00–13:00 slot. Oracle spells the closed-interval
    // normalization the operator compiles to.
    q("f18_overlaps",
      """SELECT event_id,
        |  greatest(ts, date_trunc('day', ts) + INTERVAL 12 HOUR)
        |    <= least(ts + INTERVAL 30 MINUTE,
        |             date_trunc('day', ts) + INTERVAL 13 HOUR) AS ov
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir)("events").createOrReplaceTempView("f18_events")
      s.sql(
        """SELECT event_id,
          |  (ts, ts + INTERVAL '30' MINUTE) OVERLAPS
          |    (date_trunc('DAY', ts) + INTERVAL '12' HOUR, INTERVAL '1' HOUR) AS ov
          |FROM f18_events ORDER BY event_id""".stripMargin)
    },

    // BETWEEN SYMMETRIC (bounds swapped into order —
    // SqlStdOperatorTable SYMMETRIC_BETWEEN) and ELEMENT (Calcite's
    // sole-element extractor: null on empty, error on >1) through the
    // SQL text surface.
    q("f19_symmetric_element",
      """SELECT o_orderkey,
        |  o_totalprice BETWEEN 100000 AND 200000 AS inband,
        |  o_orderkey AS el
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      t(s, dir)("orders").createOrReplaceTempView("f19_orders")
      s.sql(
        """SELECT o_orderkey,
          |  o_totalprice BETWEEN SYMMETRIC 200000 AND 100000 AS inband,
          |  element(array(o_orderkey)) AS el
          |FROM f19_orders ORDER BY o_orderkey""".stripMargin)
    },

    // HASH_CODE(s) (FlinkSqlOperatorTable HASH_CODE — Java
    // String.hashCode: the 31-polynomial over UTF-16 code units with
    // silent int32 wraparound; r10). The oracle re-derives the exact
    // arithmetic in DuckDB: fold 31·h + ord(c), wrapping each step
    // into signed-int range (6442450944 = 2^32 + 2^31). The
    // sha224/sha384/sha512 named spellings registered alongside are
    // spec-gated (DuckDB core ships sha256 only).
    q("f20_hash_code",
      """SELECT event_type,
        |  list_reduce(
        |    list_prepend(CAST(0 AS BIGINT),
        |      list_transform(string_split(event_type, ''),
        |                     c -> CAST(ord(c) AS BIGINT))),
        |    (a, x) -> ((((a * 31 + x) % 4294967296) + 6442450944)
        |               % 4294967296) - 2147483648) AS hc
        |FROM (SELECT DISTINCT event_type FROM events)
        |ORDER BY event_type""".stripMargin) { (s, dir) =>
      t(s, dir)("events").createOrReplaceTempView("f20_events")
      s.sql(
        """SELECT event_type, CAST(hash_code(event_type) AS BIGINT) AS hc
          |FROM (SELECT DISTINCT event_type FROM f20_events)
          |ORDER BY event_type""".stripMargin)
    },

    // KEYVALUE(str, pairSep, kvSep, key) (SqlFunctionUtils.keyValue —
    // first matching pair's value, null when absent) and numeric
    // TRUNCATE(x, d) (Calcite struncate: decimal-string truncation
    // toward zero). The kv string is assembled from event columns so
    // the extraction round-trips; the oracle truncates through the
    // same shortest-decimal route (CAST to VARCHAR → DECIMAL → scaled
    // floor — prices are positive).
    q("f21_keyvalue_truncate",
      """SELECT event_id,
        |  CAST(user_id AS VARCHAR) AS uid,
        |  NULL AS missing,
        |  CAST(floor(CAST(CAST(value AS VARCHAR) AS DECIMAL(28, 10)) * 10)
        |       / 10.0 AS DOUBLE) AS v_trunc
        |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
      t(s, dir)("events").createOrReplaceTempView("f21_events")
      s.sql(
        """SELECT event_id,
          |  keyvalue(concat('type=', event_type, ';uid=', user_id),
          |           ';', '=', 'uid') AS uid,
          |  keyvalue(concat('type=', event_type, ';uid=', user_id),
          |           ';', '=', 'absent') AS missing,
          |  truncate(value, 1) AS v_trunc
          |FROM f21_events ORDER BY event_id""".stripMargin)
    })
}
