package graft

import graft.streaming.GEvent
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Element-by-element streaming test harness in the style of the
  * reference's OneInputStreamOperatorTestHarness
  * (flink-streaming-java/.../util/OneInputStreamOperatorTestHarness.java:48):
  * push explicit batches through a MemoryStream, let the watermark
  * advance between batches, collect everything the operator emitted.
  */
object StreamHarness {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def mkStream(): MemoryStream[GEvent] = {
    implicit val sql = spark.sqlContext
    import spark.implicits._
    MemoryStream[GEvent]
  }

  /** Run `build(stream)` over the given batches; each batch is
    * processed as its own micro-batch (watermark advances in between),
    * plus trailing empty commits so event-time timeouts fire. */
  def run(batches: Seq[Seq[GEvent]], mode: OutputMode, name: String)
         (build: Dataset[GEvent] => DataFrame): DataFrame = {
    val input = mkStream()
    spark.catalog.dropTempView(name)
    val q = build(input.toDS()).writeStream
      .outputMode(mode).format("memory").queryName(name).start()
    try {
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
      }
      // extra empty passes let no-data batches run timeout logic
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name)
  }

  /** Micro helper: seconds → micros, building GEvents tersely. */
  def ev(key: Long, tSec: Long, id: Long, kind: String = "x",
         value: Double = 0.0): GEvent =
    GEvent(key, tSec * 1000000L, id, kind, value)
}
