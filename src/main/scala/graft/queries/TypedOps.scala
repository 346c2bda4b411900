package graft.queries

import graft.QueryGroup
import graft.operators.{Changelog, LookupJoin}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Typed Dataset / DataSet-API capability parity (SURVEY.md §2.11):
  * mapPartitions, groupByKey+reduceGroups, cogroup — plus the
  * changelog fold/unfold convention and the lookup join.
  */
object TypedOps extends QueryGroup {

  private val dec18_2 = DecimalType(18, 2)

  case class Li(l_orderkey: Long, l_quantity: Double, l_extendedprice: Double)
  case class Ord(o_custkey: Long, o_orderkey: Long, o_totalprice: Double)

  override def queries = Seq(

    // mapPartitions (DataSet.mapPartition:239): per-partition streaming
    // pass computing derived values — no driver collect, no shuffle.
    q("ty1_mappartitions",
      """SELECT l_orderkey, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity * 2 + 1 AS BIGINT)) AS BIGINT) AS derived
        |FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir)("lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice").as[Li]
        .mapPartitions(it => it.map(l => (l.l_orderkey, (l.l_quantity * 2 + 1).toLong)))
        .toDF("l_orderkey", "d")
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n_lines"), sum("d").as("derived"))
        .orderBy("l_orderkey")
    },

    // groupByKey + reduceGroups (DataSet.reduce:448): max order per
    // customer by (totalprice, orderkey).
    q("ty2_reduce_groups",
      """SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |                           ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn
        |      FROM orders)
        |WHERE rn = 1 ORDER BY o_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      t(s, dir)("orders")
        .select("o_custkey", "o_orderkey", "o_totalprice").as[Ord]
        .groupByKey(_.o_custkey)
        .reduceGroups((a: Ord, b: Ord) =>
          if (a.o_totalprice > b.o_totalprice ||
              (a.o_totalprice == b.o_totalprice && a.o_orderkey >= b.o_orderkey)) a else b)
        .map(_._2)
        .toDF()
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("totalprice"))
        .orderBy("o_custkey")
    },

    // cogroup (DataSet.coGroup:1033): customers × their orders in one
    // pass, including order-less customers.
    q("ty3_cogroup",
      """SELECT c_custkey, count(o_orderkey) AS n_orders,
        |  CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      val cust = t(s, dir)("customer").select(col("c_custkey")).as[Long]
      val ords = t(s, dir)("orders")
        .select("o_custkey", "o_orderkey", "o_totalprice").as[Ord]
      cust.groupByKey(identity)
        .cogroup(ords.groupByKey(_.o_custkey)) { (k, cs, os) =>
          if (cs.isEmpty) Iterator.empty
          else {
            val l = os.toSeq
            Iterator((k, l.size.toLong,
              BigDecimal(l.map(o => BigDecimal(o.o_totalprice).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toString)))
          }
        }
        .toDF("c_custkey", "n_orders", "spend")
        .select(col("c_custkey"), col("n_orders"),
          col("spend").cast(DoubleType).as("spend"))
        .orderBy("c_custkey")
    },

    // Changelog round-trip: unfold per-user event versions into a
    // retract stream (+I/-U/+U), fold back to final state; outputs the
    // net version plus changelog cardinality (2·versions − 1).
    q("ty4_changelog_roundtrip",
      """WITH v AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS n_versions
        |  FROM events)
        |SELECT user_id, event_id AS final_event, value AS final_value,
        |  2 * n_versions - 1 AS n_changelog_rows
        |FROM v WHERE rn = n_versions
        |ORDER BY user_id""".stripMargin) { (s, dir) =>
      val versions = t(s, dir)("events")
        .select("user_id", "event_id", "value")
      val log = Changelog.unfold(versions, Seq("user_id"), "event_id").persist()
      val counts = log.groupBy("user_id").agg(count(lit(1)).as("n_changelog_rows"))
      Changelog.fold(log, Seq("user_id"), "event_id")
        .join(counts, "user_id")
        .select(col("user_id"), col("event_id").as("final_event"),
          col("value").as("final_value"), col("n_changelog_rows"))
        .orderBy("user_id")
    },

    // Retract-consuming aggregation: SUM over a changelog nets out
    // -U rows (GroupAggFunction retraction handling, SURVEY §2.4) —
    // the folded total equals the sum of each key's final version.
    q("ty6_retract_sum",
      """WITH v AS (SELECT user_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nv
        |  FROM events)
        |SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS net_total,
        |  count(*) AS n_keys
        |FROM v WHERE rn = nv""".stripMargin) { (s, dir) =>
      val versions = t(s, dir)("events").select("user_id", "event_id", "value")
      val log = graft.operators.Changelog.unfold(versions, Seq("user_id"), "event_id")
      val signed = log.withColumn("_sign",
        when(col("_change_kind").isin("+I", "+U"), 1).otherwise(-1))
      signed.agg(
        sum(col("value").cast(dec18_2) * col("_sign")).cast(DoubleType).as("net_total"),
        (sum(col("_sign"))).cast(LongType).as("n_keys"))
    },

    // Retract-consuming MIN/MAX/FIRST/LAST/LISTAGG
    // (MinWithRetractAggFunction.java and siblings): the changelog at
    // (user, event_type) granularity retracts every superseded version,
    // so the per-user aggregate runs over each type's SURVIVING value —
    // a retraction of the current min/max must expose the next-best,
    // which the multiset netting provides.
    q("ty8_retract_minmax",
      """WITH v AS (SELECT user_id, event_type, event_id, value,
        |    row_number() OVER (PARTITION BY user_id, event_type ORDER BY event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id, event_type) AS nv
        |  FROM events),
        |s AS (SELECT user_id, event_type, event_id, value FROM v WHERE rn = nv)
        |SELECT user_id, count(*) AS n_rows,
        |  min(value) AS min_v, max(value) AS max_v,
        |  min_by(value, event_id) AS first_v, max_by(value, event_id) AS last_v,
        |  string_agg(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR), ',' ORDER BY event_id) AS vals
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
      val versions = t(s, dir)("events")
        .select("user_id", "event_type", "event_id", "value")
      val log = Changelog.unfold(versions, Seq("user_id", "event_type"), "event_id")
      graft.operators.RetractAgg.minMaxFirstLastListAgg(
          log, Seq("user_id"), "value", "event_id")
        .orderBy("user_id")
    },

    // Canal-JSON CDC ingestion (CanalJsonDeserializationSchema.java:64):
    // a simulated CDC feed — INSERT for each user's first version,
    // UPDATE {data, old} for each later one — rendered to JSON in the
    // query (no Kafka in this container), parsed back through the
    // format factory into _change_kind rows, folded to final state.
    q("ty9_changelog_json",
      """WITH v AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nv
        |  FROM events)
        |SELECT user_id, event_id AS final_event, value AS final_value,
        |  2 * nv - 1 AS n_ops
        |FROM v WHERE rn = nv ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
      val v = t(s, dir)("events").select("user_id", "event_id", "value")
        .withColumn("_rn", row_number().over(w))
        .withColumn("_pev", lag(col("event_id"), 1).over(w))
        .withColumn("_pval", lag(col("value"), 1).over(w))
      val msgs = v.select(
        when(col("_rn") === 1,
          to_json(struct(lit("INSERT").as("type"),
            array(struct(col("user_id"), col("event_id"), col("value"))).as("data"))))
        .otherwise(
          to_json(struct(lit("UPDATE").as("type"),
            array(struct(col("user_id"), col("event_id"), col("value"))).as("data"),
            array(struct(col("user_id"), col("_pev").as("event_id"),
              col("_pval").as("value"))).as("old"))))
        .as("msg"))
      val rowSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("value", DoubleType)))
      val log = graft.operators.ChangelogJson.parse(msgs, "msg", rowSchema).persist()
      val counts = log.groupBy("user_id").agg(count(lit(1)).as("n_ops"))
      Changelog.fold(log, Seq("user_id"), "event_id")
        .join(counts, "user_id")
        .select(col("user_id"), col("event_id").as("final_event"),
          col("value").as("final_value"), col("n_ops"))
        .orderBy("user_id")
    },

    // Debezium-JSON CDC ingestion (DebeziumJsonDeserializationSchema
    // .java — single before/after rows, op codes c/u/d/r): the same
    // simulated feed as ty9 rendered in the debezium envelope, parsed
    // through the format factory and folded to final state.
    q("ty11_debezium_json",
      """WITH v AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nv
        |  FROM events)
        |SELECT user_id, event_id AS final_event, value AS final_value,
        |  2 * nv - 1 AS n_ops
        |FROM v WHERE rn = nv ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
      val v = t(s, dir)("events").select("user_id", "event_id", "value")
        .withColumn("_rn", row_number().over(w))
        .withColumn("_pev", lag(col("event_id"), 1).over(w))
        .withColumn("_pval", lag(col("value"), 1).over(w))
      val msgs = v.select(
        when(col("_rn") === 1,
          to_json(struct(lit("c").as("op"),
            struct(col("user_id"), col("event_id"), col("value")).as("after"))))
        .otherwise(
          to_json(struct(lit("u").as("op"),
            struct(col("user_id"), col("_pev").as("event_id"),
              col("_pval").as("value")).as("before"),
            struct(col("user_id"), col("event_id"), col("value")).as("after"))))
        .as("msg"))
      val rowSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("value", DoubleType)))
      val log = graft.operators.ChangelogJson
        .parseDebezium(msgs, "msg", rowSchema).persist()
      val counts = log.groupBy("user_id").agg(count(lit(1)).as("n_ops"))
      Changelog.fold(log, Seq("user_id"), "event_id")
        .join(counts, "user_id")
        .select(col("user_id"), col("event_id").as("final_event"),
          col("value").as("final_value"), col("n_ops"))
        .orderBy("user_id")
    },

    // Maxwell-JSON CDC ingestion (MaxwellJsonDeserializationSchema —
    // single rows, lowercase types, and `old` carrying ONLY the
    // changed columns: user_id is omitted from the update's old image,
    // so the -U row exercises the field-by-field merge of old over
    // data). Same feed and fold as ty9/ty11.
    q("ty12_maxwell_json",
      """WITH v AS (SELECT user_id, event_id, value,
        |    row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn,
        |    count(*) OVER (PARTITION BY user_id) AS nv
        |  FROM events)
        |SELECT user_id, event_id AS final_event, value AS final_value,
        |  2 * nv - 1 AS n_ops
        |FROM v WHERE rn = nv ORDER BY user_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("event_id")
      val v = t(s, dir)("events").select("user_id", "event_id", "value")
        .withColumn("_rn", row_number().over(w))
        .withColumn("_pev", lag(col("event_id"), 1).over(w))
        .withColumn("_pval", lag(col("value"), 1).over(w))
      val msgs = v.select(
        when(col("_rn") === 1,
          to_json(struct(lit("insert").as("type"),
            struct(col("user_id"), col("event_id"), col("value")).as("data"))))
        .otherwise(
          to_json(struct(lit("update").as("type"),
            struct(col("user_id"), col("event_id"), col("value")).as("data"),
            // maxwell old image: changed columns only (no user_id)
            struct(col("_pev").as("event_id"),
              col("_pval").as("value")).as("old"))))
        .as("msg"))
      val rowSchema = StructType(Seq(
        StructField("user_id", LongType), StructField("event_id", LongType),
        StructField("value", DoubleType)))
      val log = graft.operators.ChangelogJson
        .parseMaxwell(msgs, "msg", rowSchema).persist()
      val counts = log.groupBy("user_id").agg(count(lit(1)).as("n_ops"))
      Changelog.fold(log, Seq("user_id"), "event_id")
        .join(counts, "user_id")
        .select(col("user_id"), col("event_id").as("final_event"),
          col("value").as("final_value"), col("n_ops"))
        .orderBy("user_id")
    },

    // Salted two-phase aggregation (skew split): identical result to a
    // direct groupBy, hot keys fanned over 8 reducers first.
    q("ty7_salted_agg",
      """SELECT event_type,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, count(*) AS n
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, dir) =>
      graft.operators.SkewJoin.saltedSumCount(
          t(s, dir)("events"), "event_type", col("value").cast(dec18_2), salts = 8)
        .select(col("event_type"), col("total").cast(DoubleType).as("total"), col("n"))
        .orderBy("event_type")
    },

    // Salted equi-join (skew split on the join key): identical rows to
    // the plain join, each hot part key fanned over 8 (key, salt)
    // reducers; dim side replicated ×8 instead of broadcast.
    q("ty10_salted_join",
      """SELECT p_type, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS amount
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p_type ORDER BY p_type""".stripMargin) { (s, dir) =>
      graft.operators.SkewJoin.saltedJoin(
          fact = t(s, dir)("lineitem"), dim = t(s, dir)("part"),
          factKey = "l_partkey", dimKey = "p_partkey",
          saltExpr = hash(col("l_orderkey"), col("l_linenumber")), salts = 8)
        .groupBy("p_type")
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(dec18_2)).cast(DoubleType).as("amount"))
        .orderBy("p_type")
    },

    // Lookup join through a broadcast dimension snapshot.
    q("ty5_lookup_join",
      """SELECT l_orderkey, l_linenumber, p.p_brand AS brand
        |FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l_orderkey <= 500
        |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, dir) =>
      LookupJoin.broadcastLookup(s,
          facts = t(s, dir)("lineitem").filter(col("l_orderkey") <= 500),
          factKey = "l_partkey",
          dim = t(s, dir)("part"), dimKey = "p_partkey", dimValue = "p_brand",
          outCol = "brand")
        .select("l_orderkey", "l_linenumber", "brand")
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Async I/O ordered-wait lookup (SURVEY §2.9 — AsyncDataStream
    // .orderedWait / AsyncWaitOperator.java:78): per-partition bounded
    // in-flight Future window standing where an async KV/HTTP client
    // would; emission is input-ordered, so the result equals the plain
    // join the oracle runs. The "service" stand-in is a PARTITION-LOCAL
    // snapshot of the customer dimension, co-partitioned with the probe
    // on the lookup key (both sides hash-repartitioned on custkey, then
    // zipped partition-by-partition) — per-task service state is
    // |dim| / parts, never a driver collect of an SF-scaling table, so
    // the stand-in itself survives 100 TB. Capacity 32 keeps at most 32
    // requests in flight per partition — the reference's
    // AsyncDataStream capacity knob.
    q("ty13_async_lookup",
      """SELECT o_orderkey, c.c_name AS cust_name
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE o_orderkey <= 2000
        |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
      import s.implicits._
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.Future
      val parts = 8
      val probe = t(s, dir)("orders").filter(col("o_orderkey") <= 2000)
        .select(col("o_orderkey").cast("long"), col("o_custkey").cast("long"))
        .repartition(parts, col("o_custkey")).as[(Long, Long)]
      val dim = t(s, dir)("customer")
        .select(col("c_custkey").cast("long"), col("c_name"))
        .repartition(parts, col("c_custkey")).as[(Long, String)]
      // identical hash partitioning on the key on both sides → partition
      // i of the probe only ever looks up keys living in partition i of
      // the dimension (the manual sibling of a co-located shuffle join)
      probe.rdd.zipPartitions(dim.rdd) { (pit, dit) =>
          val svc = dit.toMap
          graft.operators.AsyncLookup
            .orderedWait(pit, capacity = 32,
              (ok: (Long, Long)) => Future(svc(ok._2)))
            .map { case ((okey, _), name) => (okey, name) }
        }
        .toDF("o_orderkey", "cust_name")
        .orderBy("o_orderkey")
    },

    // datagen connector (SURVEY §2.1 — DataGenTableSourceFactory
    // .java:57): a sequence-bounded generated table through the DDL
    // facade; the generator is ordinary codegen'd column expressions
    // over spark.range, so generation distributes with no driver
    // loop. Deterministic (sequence fields only) → exact oracle via
    // DuckDB's range().
    q("ty14_datagen_seq",
      """SELECT range AS id, range * 7 % 5 AS bucket
        |FROM range(1, 201)
        |ORDER BY id""".stripMargin) { (s, _) =>
      graft.sources.GraftDDL.execute(s,
        """CREATE TABLE ty14_gen (id BIGINT)
          |WITH ('connector'='datagen',
          |      'fields.id.kind'='sequence',
          |      'fields.id.start'='1', 'fields.id.end'='200')""".stripMargin)
      s.sql("""SELECT id, id * 7 % 5 AS bucket FROM ty14_gen ORDER BY id""")
    },

    // PARTITIONED BY + partition pruning (SURVEY §2.1 —
    // SqlCreateTable.java:321's PARTITIONED BY; at 100 TB the point of
    // the clause is that a filter on the partition column prunes
    // directories before any file opens — the write below lays out
    // hive-style p=<value> dirs and the read-back filter scans exactly
    // one of them, plan-asserted in SourcesSpec).
    q("ty15_partitioned_prune",
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
      val out = java.nio.file.Files.createTempDirectory("ty15_part").toString
      graft.sources.GraftDDL.execute(s,
        s"""CREATE TABLE ty15_orders (o_orderkey BIGINT, o_totalprice DOUBLE,
           |  o_orderpriority STRING)
           |PARTITIONED BY (o_orderpriority)
           |WITH ('connector'='filesystem', 'path'='$out', 'format'='parquet')"""
          .stripMargin)
      t(s, dir)("orders").select("o_orderkey", "o_totalprice", "o_orderpriority")
        .createOrReplaceTempView("ty15_src")
      graft.sources.GraftDDL.executeInsert(s,
        "INSERT OVERWRITE ty15_orders SELECT * FROM ty15_src")
      s.sql(
        """SELECT o_orderpriority, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM ty15_orders WHERE o_orderpriority = '1-URGENT'
          |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    },

    // Avro format (SURVEY §2.1 — AvroFormatFactory.java; previously
    // DE-SCOPED for lack of the spark-avro module, now implemented
    // from scratch over avro-core as GraftAvro: one container file per
    // partition on write, one Spark partition per file on read). The
    // query writes an orders projection through the 'format'='avro'
    // DDL binding and aggregates the read-back — equal to aggregating
    // the source directly, which is the oracle.
    q("ty16_avro_roundtrip",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        |  CAST(min(o_orderdate) AS TIMESTAMP) AS first_d
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val out = java.nio.file.Files.createTempDirectory("ty16_avro").toString
      t(s, dir)("orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
        .createOrReplaceTempView("ty16_src")
      graft.sources.GraftDDL.execute(s,
        s"""CREATE TABLE ty16_orders (o_orderkey BIGINT, o_orderstatus STRING,
           |  o_totalprice DOUBLE, o_orderdate TIMESTAMP)
           |WITH ('connector'='filesystem', 'path'='$out', 'format'='avro')"""
          .stripMargin)
      graft.sources.GraftDDL.executeInsert(s,
        "INSERT OVERWRITE ty16_orders SELECT * FROM ty16_src")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
          |  min(o_orderdate) AS first_d
          |FROM ty16_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // Avro NESTED records (r10 — flink-avro's AvroSchemaConverter maps
    // rows-in-rows, arrays, and maps; GraftAvro previously failed
    // loudly on nesting): pack each order into struct-in-struct +
    // array + map columns, round-trip through the container format,
    // unpack and aggregate — equal to aggregating the source, which is
    // the oracle. The sum deliberately reads the MAP value and the
    // group key the inner struct, so every nested branch is exercised.
    q("ty22_avro_nested",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val out = java.nio.file.Files.createTempDirectory("ty22_avro").toString
      val src = t(s, dir)("orders").select(
        col("o_orderkey"),
        struct(col("o_orderkey").as("k"),
          struct(col("o_orderstatus").as("st")).as("inner")).as("s"),
        array(col("o_totalprice")).as("arr"),
        map(lit("price"), col("o_totalprice")).as("m"))
      graft.sources.GraftAvro.write(src, out, overwrite = true)
      graft.sources.GraftAvro.read(s, out)
        .select(col("s.inner.st").as("o_orderstatus"),
          col("m")(lit("price")).as("price"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          sum(col("price").cast(dec18_2)).cast(DoubleType).as("total"))
        .orderBy("o_orderstatus")
    },

    // LIVE JDBC round-trip (r10 — JdbcDynamicTableSource/Sink,
    // flink-connector-jdbc; the option binding existed since r7 but
    // nothing could execute until the embedded-Derby realization:
    // Spark ships Derby for the Hive metastore, so a real zero-egress
    // database IS in the container). Orders project through a
    // 'connector'='jdbc' sink into Derby, read back through the
    // partitioned scan (scan.partition.* → 4 parallel range reads),
    // and aggregate — equal to aggregating the source, the oracle.
    q("ty23_jdbc_roundtrip",
      """SELECT o_orderstatus, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val url = "jdbc:derby:memory:ty23db;create=true"
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        try conn.createStatement().execute(
          "CREATE TABLE t_orders (o_orderkey BIGINT, " +
            "o_orderstatus VARCHAR(8), o_totalprice DOUBLE)")
        catch { case e: java.sql.SQLException if e.getSQLState == "X0Y32" =>
          () // table exists from a prior run in this JVM
        }
      } finally conn.close()
      t(s, dir)("orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .createOrReplaceTempView("ty23_src")
      graft.sources.GraftDDL.execute(s,
        s"""CREATE TABLE ty23_orders (o_orderkey BIGINT,
           |  o_orderstatus STRING, o_totalprice DOUBLE)
           |WITH ('connector'='jdbc', 'url'='$url', 'table-name'='t_orders',
           |      'scan.partition.column'='o_orderkey',
           |      'scan.partition.num'='4',
           |      'scan.partition.lower-bound'='0',
           |      'scan.partition.upper-bound'='6000000')""".stripMargin)
      graft.sources.GraftDDL.executeInsert(s,
        "INSERT OVERWRITE ty23_orders SELECT * FROM ty23_src")
      s.sql(
        """SELECT o_orderstatus, count(*) AS n,
          |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |FROM ty23_orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
    },

    // zipWithIndex (flink-java utils/DataSetUtils.java:93 — two-phase
    // contiguous index assignment: count elements per partition, then
    // offset each partition by the prefix sum of the counts). Spark's
    // RDD.zipWithIndex runs the identical two-phase algorithm; it is
    // made deterministic — and therefore oracle-checkable — by
    // range-partitioning + intra-partition sort on a total key first,
    // so the assigned index equals the global (orderkey, linenumber)
    // rank WITHOUT a single-partition global sort (the scalable
    // alternative to an empty-partition row_number window at 100 TB).
    q("ty18_zip_with_index",
      """SELECT l_orderkey, l_linenumber,
        |  row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS idx
        |FROM lineitem
        |WHERE l_orderkey % 97 = 0
        |ORDER BY idx""".stripMargin) { (s, dir) =>
      val src = t(s, dir)("lineitem")
        .filter(col("l_orderkey") % 97 === 0)
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartitionByRange(col("l_orderkey"), col("l_linenumber"))
        .sortWithinPartitions("l_orderkey", "l_linenumber")
      val schema = src.schema.add("idx", LongType, nullable = false)
      val rdd = src.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }
      s.createDataFrame(rdd, schema).orderBy("idx")
    },

    // Exact-size sampling (flink-java DataSetUtils.java:274
    // sampleWithSize — per-partition reservoirs merged to exactly k
    // rows). The Spark-first determinized form: rank rows by a
    // uniform hash of their key and keep the global bottom-k, which
    // plans TakeOrderedAndProject — per-partition top-k heaps merged
    // on the driver, exactly the reference's reservoir-merge shape
    // but reproducible (same k rows on every run/layout, so the
    // sample is auditable and the oracle can check it).
    // The hash key covers the WHOLE row (the synthetic lineitem
    // duplicates (orderkey, linenumber) pairs with different
    // quantities — a key-only hash would tie such rows at the LIMIT
    // boundary and make the selected multiset engine-dependent;
    // identical full rows tying is harmless). Quantities are integral
    // by construction, so the BIGINT cast renders identically in both
    // engines.
    q("ty19_exact_sample",
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |    md5(CAST(l_orderkey * 8 + l_linenumber AS VARCHAR) || '|'
        |        || CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)) AS h
        |  FROM lineitem
        |  ORDER BY h, l_orderkey, l_linenumber, l_quantity
        |  LIMIT 200)
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin) { (s, dir) =>
      t(s, dir)("lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          md5(concat(
            (col("l_orderkey") * 8 + col("l_linenumber")).cast("string"),
            lit("|"), col("l_quantity").cast("long").cast("string")))
            .as("_h"))
        .orderBy("_h", "l_orderkey", "l_linenumber", "l_quantity")
        .limit(200)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity")
    },

    // Hadoop SequenceFile round-trip (flink-formats/flink-sequence-file
    // SequenceFileWriterFactory.java): key/value Writable pairs written
    // one file per partition and read back partition-parallel — the
    // RDD API is the right level here (SequenceFile IS a (Writable,
    // Writable) container; there is no DataFrame schema to bind).
    // Aggregating the read-back equals aggregating the source, which
    // is the oracle.
    q("ty20_sequence_file",
      """SELECT o_orderstatus, count(*) AS n, min(o_orderkey) AS min_k,
        |  max(o_orderkey) AS max_k
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
      val out = java.nio.file.Files.createTempDirectory("ty20_seq").toString + "/data"
      t(s, dir)("orders").select("o_orderkey", "o_orderstatus")
        .rdd.map(r => (r.getLong(0), r.getString(1)))
        .saveAsSequenceFile(out)
      val back = s.sparkContext.sequenceFile[Long, String](out)
      import s.implicits._
      back.toDF("o_orderkey", "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), min("o_orderkey").as("min_k"),
          max("o_orderkey").as("max_k"))
        .orderBy("o_orderstatus")
    })
}
