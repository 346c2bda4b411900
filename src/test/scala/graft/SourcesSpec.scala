package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/format round-trips (SURVEY.md §2.1: CSV/JSON/Parquet formats
  * map to native Spark formats; Kafka/JDBC need external systems not
  * present in this container and are covered by the same DataFrame
  * surface). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = StreamHarness.spark
  private val dir = "/root/testdata/sf0.001"

  private def roundTrip(fmt: String, options: Map[String, String] = Map.empty): Unit = {
    val out = java.nio.file.Files.createTempDirectory(s"graft_$fmt").toString
    val src = Tables(spark, dir, "nation")
    src.write.options(options).mode("overwrite").format(fmt).save(out)
    val back = spark.read.options(options).schema(src.schema).format(fmt).load(out)
    assert(back.count() == src.count())
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      src.orderBy("n_nationkey").collect().toSeq, s"$fmt round-trip mismatch")
  }

  test("csv round-trip")  { roundTrip("csv", Map("header" -> "true")) }
  test("json round-trip") { roundTrip("json") }
  test("parquet round-trip") { roundTrip("parquet") }
  test("orc round-trip") { roundTrip("orc") }

  test("GraftExtensions function injections resolve in SQL") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions()(ext)
    org.apache.spark.sql.GraftSqlBridge.applyFunctionExtensions(ext, spark)
    val r = spark.sql("SELECT is_alpha('abc'), split_index('a:b', ':', 1)").head
    assert(r.getBoolean(0) && r.getString(1) == "b")
  }

  test("CREATE TABLE ... USING parquet DDL facade reads the testdata") {
    spark.sql("DROP TABLE IF EXISTS ddl_nation")
    spark.sql(
      s"""CREATE TABLE ddl_nation USING parquet
         |OPTIONS (path '$dir/nation.parquet')""".stripMargin)
    try {
      assert(spark.sql("SELECT count(*) FROM ddl_nation").head.getLong(0) == 25)
      assert(spark.sql("SELECT n_name FROM ddl_nation WHERE n_nationkey = 0").head.getString(0).nonEmpty)
    } finally spark.sql("DROP TABLE ddl_nation")
  }

  test("streaming file sink writes exactly-once parquet output") {
    val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_chk").toString
    val sp = StreamHarness.spark
    val input = StreamHarness.mkStream()
    val q = input.toDS().writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", chk)
      .start()
    input.addData(Seq(StreamHarness.ev(1, 10, 1), StreamHarness.ev(2, 20, 2)))
    q.processAllAvailable()
    q.stop()
    assert(sp.read.parquet(out).count() == 2)
  }
}
