package graft.operators

import org.apache.spark.sql.DataFrame
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
    * payload schema's columns plus `_change_kind`. Codegen-friendly:
    * one from_json, three filtered projections, one union — no UDFs. */
  def parse(df: DataFrame, jsonCol: String, rowSchema: StructType): DataFrame = {
    val envelope = StructType(Seq(
      StructField("type", StringType),
      StructField("data", ArrayType(rowSchema)),
      StructField("old", ArrayType(rowSchema))))
    val parsed = df.select(from_json(col(jsonCol), envelope).as("_e"))
    def rows(kindFilter: String, arrayField: String, changeKind: String) =
      parsed.filter(col("_e.type") === kindFilter)
        .select(explode(col(s"_e.$arrayField")).as("_r"))
        .select(col("_r.*"))
        .withColumn("_change_kind", lit(changeKind))
    rows("INSERT", "data", "+I")
      .unionByName(rows("UPDATE", "old", "-U"))
      .unionByName(rows("UPDATE", "data", "+U"))
      .unionByName(rows("DELETE", "data", "-D"))
  }
}
