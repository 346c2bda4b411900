package graft.sources

/** JDBC DDL option binding (SURVEY.md §2.1 — the option surface of
  * flink-connectors/flink-connector-jdbc/.../table/JdbcDynamicTableSource.java
  * and JdbcConnectorOptions): translates the reference's
  * `WITH ('connector'='jdbc', ...)` properties to the option map of
  * Spark's built-in JDBC source (`spark.read.format("jdbc")`).
  *
  * The partitioned-scan options are the scale surface: Flink's
  * `scan.partition.*` quadruple maps 1:1 onto Spark's
  * partitionColumn/numPartitions/lowerBound/upperBound, which is what
  * turns a single-connection table pull into N parallel range reads.
  * No database ships in this container, so the binding stops at the
  * option map (spec-locked in SourcesSpec), same contract as
  * [[KafkaConnector]].
  */
object JdbcConnector {

  private val direct = Map(
    "url" -> "url",
    "table-name" -> "dbtable",
    "driver" -> "driver",
    "username" -> "user",
    "password" -> "password",
    "scan.partition.column" -> "partitionColumn",
    "scan.partition.num" -> "numPartitions",
    "scan.partition.lower-bound" -> "lowerBound",
    "scan.partition.upper-bound" -> "upperBound",
    "scan.fetch-size" -> "fetchsize")

  /** Flink duration literal ("60s", "500 ms", "1 min", "2h") → whole
    * seconds, rounded up so a sub-second timeout doesn't become 0
    * (= infinite for most drivers). */
  private[graft] def durationToSeconds(v: String): Long = {
    val m = "^\\s*(\\d+)\\s*(ms|s|min|m|h|d)?\\s*$".r
    v.trim match {
      case m(n, unit) =>
        val ms = Option(unit).getOrElse("ms") match {
          case "ms" => n.toLong
          case "s" => n.toLong * 1000
          case "min" | "m" => n.toLong * 60000
          case "h" => n.toLong * 3600000
          case "d" => n.toLong * 86400000
        }
        (ms + 999) / 1000
      case _ => throw new IllegalArgumentException(s"bad duration: '$v'")
    }
  }

  /** `connection.max-retry-timeout` is a Duration in the reference
    * (JdbcConnectorOptions.MAX_RETRY_TIMEOUT, default '60s'); Spark's
    * JDBC source has no connect-retry budget, so the closest documented
    * knob is `queryTimeout` (whole seconds, applied per statement).
    * Mapping the raw string to a driver property would be wrong twice:
    * unknown keys pass through as raw driver properties, and drivers
    * that do take connect timeouts expect integer milliseconds. */
  private def retryTimeout(props: Map[String, String]): Map[String, String] =
    props.get("connection.max-retry-timeout")
      .map(v => "queryTimeout" -> durationToSeconds(v).toString).toMap

  /** Source-side translation. Requires url + table-name; the four
    * scan.partition.* options must be given together (the same
    * all-or-nothing contract both engines enforce). */
  def sourceOptions(props: Map[String, String]): Map[String, String] = {
    require(props.get("connector").contains("jdbc"),
      s"not a jdbc source: ${props.get("connector")}")
    require(props.contains("url"), "jdbc source requires url")
    require(props.contains("table-name"), "jdbc source requires table-name")
    val partKeys = Seq("scan.partition.column", "scan.partition.num",
      "scan.partition.lower-bound", "scan.partition.upper-bound")
    val nPart = partKeys.count(props.contains)
    require(nPart == 0 || nPart == 4,
      s"scan.partition.* options must be given together; got $nPart of 4")
    props.collect { case (k, v) if direct.contains(k) => direct(k) -> v } ++
      retryTimeout(props)
  }

  /** Sink-side translation: url/table/credentials plus Flink's batch
    * write knob (`sink.buffer-flush.max-rows` → Spark `batchsize`). */
  def sinkOptions(props: Map[String, String]): Map[String, String] = {
    require(props.get("connector").contains("jdbc"),
      s"not a jdbc sink: ${props.get("connector")}")
    require(props.contains("url") && props.contains("table-name"),
      "jdbc sink requires url and table-name")
    val base = props.collect { case (k, v) if direct.contains(k) => direct(k) -> v }
    base ++ retryTimeout(props) ++
      props.get("sink.buffer-flush.max-rows").map("batchsize" -> _)
  }
}
