package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canal-style CDC JSON ingestion (SURVEY.md §2.9 —
  * flink-formats/flink-json/.../canal/CanalJsonDeserializationSchema
  * .java:64 / CanalJsonFormatFactory.java): each message carries
  * {"type": "INSERT"|"UPDATE"|"DELETE", "data": [rows], "old":
  * [previous rows]} and unfolds into the `_change_kind` convention:
  * INSERT → +I per data row, UPDATE → -U per old row and +U per data
  * row, DELETE → -D per data row. The result feeds Changelog.fold /
  * RetractAgg like any native retract stream.
  */
object ChangelogJson {

  /** Parse a column of canal-JSON strings into changelog rows with the
    * payload schema's columns plus `_change_kind`. Codegen-friendly
    * and SINGLE-PASS: one from_json, one kind-tagged array build, one
    * explode — no UDFs, and (unlike a filter-per-kind union) the
    * upstream is evaluated once, not once per change kind. */
  def parse(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val envelope = StructType(Seq(
      StructField("type", StringType),
      StructField("data", ArrayType(rowSchema)),
      StructField("old", ArrayType(rowSchema))))
    def tag(rows: Column, kind: String): Column =
      transform(rows, r => struct(r.as("_r"), lit(kind).as("_k")))
    // UPDATE is explicit and null-safe: a missing "old" array must not
    // null out the +U rows (concat is NULL-propagating), and unknown
    // envelope types (canal also emits CREATE/ALTER/QUERY…) fall to
    // NULL and are dropped by the explode — not misparsed as updates.
    df.select(from_json(col(jsonCol), envelope).as("_e"))
      .select(explode(
        when(col("_e.type") === "INSERT", tag(col("_e.data"), "+I"))
          .when(col("_e.type") === "DELETE", tag(col("_e.data"), "-D"))
          .when(col("_e.type") === "UPDATE", concat(
            coalesce(tag(col("_e.old"), "-U"), array()),
            coalesce(tag(col("_e.data"), "+U"), array()))))
        .as("_p"))
      .select(col("_p._r.*"), col("_p._k").as("_change_kind"))
  }

  /** Debezium-style CDC envelope (the reference's debezium-json format
    * sibling of canal, flink-formats/flink-json/.../debezium/
    * DebeziumJsonDeserializationSchema.java): {"op": "c"|"r"|"u"|"d",
    * "before": row|null, "after": row|null} — note SINGLE rows, not
    * arrays. c/r → +I(after); u → -U(before) then +U(after);
    * d → -D(before). Unknown ops fall to NULL and are dropped; a null
    * before/after half of an update contributes no row rather than
    * nulling the other half out. */
  def parseDebezium(df: DataFrame, jsonCol: String,
                    rowSchema: StructType): DataFrame = {
    val envelope = StructType(Seq(
      StructField("op", StringType),
      StructField("before", rowSchema),
      StructField("after", rowSchema)))
    def tag1(row: Column, kind: String): Column =
      when(row.isNotNull, struct(row.as("_r"), lit(kind).as("_k")))
    df.select(from_json(col(jsonCol), envelope).as("_e"))
      .select(explode(filter(
        when(col("_e.op").isin("c", "r"), array(tag1(col("_e.after"), "+I")))
          .when(col("_e.op") === "d", array(tag1(col("_e.before"), "-D")))
          .when(col("_e.op") === "u", array(
            tag1(col("_e.before"), "-U"), tag1(col("_e.after"), "+U"))),
        x => x.isNotNull)).as("_p"))
      .select(col("_p._r.*"), col("_p._k").as("_change_kind"))
  }

  /** Maxwell-style CDC envelope (the reference's maxwell-json format,
    * flink-formats/flink-json/.../maxwell/
    * MaxwellJsonDeserializationSchema.java): {"type":
    * "insert"|"update"|"delete", "data": row, "old": partial row} —
    * single rows, lowercase types, and `old` carries ONLY the changed
    * columns' previous values. insert → +I(data); delete → -D(data);
    * update → -U(data overlaid with old where old is non-null — the
    * reference merges field-by-field the same way, with the same
    * delta: an update that set a column TO null from a null old value
    * is indistinguishable from an unchanged column) then +U(data).
    * Unknown types (maxwell also emits bootstrap-* rows) drop. */
  def parseMaxwell(df: DataFrame, jsonCol: String,
                   rowSchema: StructType): DataFrame = {
    val envelope = StructType(Seq(
      StructField("type", StringType),
      StructField("data", rowSchema),
      StructField("old", rowSchema)))
    def tag1(row: Column, kind: String): Column =
      when(row.isNotNull, struct(row.as("_r"), lit(kind).as("_k")))
    val before = struct(rowSchema.fields.toIndexedSeq.map(f =>
      coalesce(col(s"_e.old.${f.name}"), col(s"_e.data.${f.name}"))
        .as(f.name)): _*)
    val tagBefore =
      when(col("_e.data").isNotNull, struct(before.as("_r"), lit("-U").as("_k")))
    df.select(from_json(col(jsonCol), envelope).as("_e"))
      .select(explode(filter(
        when(col("_e.type") === "insert", array(tag1(col("_e.data"), "+I")))
          .when(col("_e.type") === "delete", array(tag1(col("_e.data"), "-D")))
          .when(col("_e.type") === "update", array(
            tagBefore, tag1(col("_e.data"), "+U"))),
        x => x.isNotNull)).as("_p"))
      .select(col("_p._r.*"), col("_p._k").as("_change_kind"))
  }
}
