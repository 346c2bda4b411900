package graft
object Mr16Probe {
  def main(args: Array[String]): Unit = {
    val s = org.apache.spark.sql.SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    Tables(s, "/root/testdata/sf0.01", "events").createOrReplaceTempView("mr16_events")
    s.sql(
      """SELECT user_id, TUMBLE_START(ts, INTERVAL '1' HOUR) AS hr,
        |  count(*) AS n,
        |  unix_seconds(TUMBLE_START(ts, INTERVAL '1' HOUR)) AS id
        |FROM mr16_events
        |GROUP BY user_id, TUMBLE(ts, INTERVAL '1' HOUR)""".stripMargin)
      .createOrReplaceTempView("mr16_hourly")
    println("XHOURLY=" + s.table("mr16_hourly").count())
    val out = graft.sources.MatchRecognizeSql.sql(s,
      """SELECT * FROM mr16_hourly MATCH_RECOGNIZE (
        |  PARTITION BY user_id
        |  ORDER BY hr
        |  MEASURES FIRST(A.hr) AS a_hr, FIRST(A.n) AS a_n, LAST(R.n) AS b_n
        |  ONE ROW PER MATCH
        |  AFTER MATCH SKIP TO NEXT ROW
        |  PATTERN (A R)
        |  WITHIN INTERVAL '72' HOUR
        |  DEFINE A AS n > 0,
        |         R AS n > FIRST(A.n)
        |) AS T""".stripMargin)
    println("XMR=" + out.count())
    println("XVIOL=" + out.filter("b_n <= a_n").count())
    out.orderBy("user_id", "a_hr").show(5, false)
    s.stop()
  }
}
