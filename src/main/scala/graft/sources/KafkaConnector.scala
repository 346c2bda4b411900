package graft.sources

/** Kafka DDL option binding (SURVEY.md §2.1 — the option surface of
  * flink-connectors/flink-connector-kafka/.../table/KafkaDynamicSource.java:37
  * and KafkaConnectorOptions.java): translates the reference's
  * `WITH ('connector'='kafka', ...)` properties to the option map of
  * Spark's built-in kafka DSv2 source/sink
  * (`spark.readStream.format("kafka").options(...)`).
  *
  * This container has no kafka connector jar and no network, so the
  * binding stops at the option map — GraftDDL surfaces it via
  * [[GraftDDL.kafkaSourceOptions]] and the translation table is
  * spec-locked in SourcesSpec. On a real deployment the returned map
  * feeds `readStream.format("kafka")` unchanged.
  */
object KafkaConnector {

  /** Flink `'partition:0,offset:42;partition:1,offset:300'` →
    * Spark `{"<topic>":{"0":42,"1":300}}` (startingOffsets JSON).
    * `topic` must be a SINGLE topic: the reference rejects
    * specific-offsets against a topic list too (the offsets spec has
    * no per-topic qualifier), and a raw `a;b` interpolated as the JSON
    * key would produce an offsets map for a topic that doesn't exist.
    * Partition/offset values must be numeric — they are interpolated
    * into JSON unquoted. */
  private def specificOffsetsJson(topic: String, spec: String): String = {
    require(!topic.contains(";"),
      s"scan.startup.mode=specific-offsets requires a single topic, got list: '$topic'")
    val num = "^-?\\d+$".r
    val entries = spec.split(";").toSeq.map { part =>
      val kv = part.split(",").map(_.trim.split(":").map(_.trim))
        .map(a => a(0) -> a(1)).toMap
      val p = kv.getOrElse("partition",
        sys.error(s"specific-offsets entry missing partition: $part"))
      val o = kv.getOrElse("offset",
        sys.error(s"specific-offsets entry missing offset: $part"))
      require(num.matches(p) && num.matches(o),
        s"specific-offsets partition/offset must be numeric: '$part'")
      s""""$p":$o"""
    }
    s"""{"$topic":{${entries.mkString(",")}}}"""
  }

  /** Source-side translation. Key mappings (ref KafkaConnectorOptions):
    *   topic                         → subscribe (semicolon list → comma)
    *   topic-pattern                 → subscribePattern
    *   properties.bootstrap.servers  → kafka.bootstrap.servers
    *   properties.*                  → kafka.* (passed through to the client)
    *   scan.startup.mode=earliest-offset → startingOffsets=earliest
    *   scan.startup.mode=latest-offset   → startingOffsets=latest
    *   scan.startup.mode=timestamp       → startingTimestamp (ms, from
    *                                       scan.startup.timestamp-millis)
    *   scan.startup.mode=specific-offsets → startingOffsets per-partition JSON
    *                                       (from scan.startup.specific-offsets)
    * group-offsets has no Spark analog (Spark manages offsets in its own
    * checkpoint, by design) and is rejected rather than silently changed.
    */
  def sourceOptions(props: Map[String, String]): Map[String, String] = {
    require(props.get("connector").contains("kafka"),
      s"not a kafka source: ${props.get("connector")}")
    val out = Map.newBuilder[String, String]
    props.get("topic").foreach(t =>
      out += ("subscribe" -> t.split(";").map(_.trim).mkString(",")))
    props.get("topic-pattern").foreach(p => out += ("subscribePattern" -> p))
    require(props.contains("topic") ^ props.contains("topic-pattern"),
      "exactly one of topic / topic-pattern is required")
    props.foreach {
      case (k, v) if k.startsWith("properties.") =>
        out += (s"kafka.${k.stripPrefix("properties.")}" -> v)
      case _ =>
    }
    require(props.contains("properties.bootstrap.servers"),
      "kafka source requires properties.bootstrap.servers")
    props.getOrElse("scan.startup.mode", "group-offsets") match {
      case "earliest-offset" => out += ("startingOffsets" -> "earliest")
      case "latest-offset"   => out += ("startingOffsets" -> "latest")
      case "timestamp" =>
        out += ("startingTimestamp" -> props.getOrElse(
          "scan.startup.timestamp-millis",
          sys.error("timestamp mode requires scan.startup.timestamp-millis")))
      case "specific-offsets" =>
        out += ("startingOffsets" -> specificOffsetsJson(
          props.getOrElse("topic", sys.error("specific-offsets requires topic")),
          props.getOrElse("scan.startup.specific-offsets",
            sys.error("specific-offsets mode requires scan.startup.specific-offsets"))))
      case other => sys.error(
        s"scan.startup.mode=$other has no Spark analog (offsets live in the checkpoint)")
    }
    out.result()
  }

  /** Sink-side translation: topic → topic, properties.* → kafka.*. */
  def sinkOptions(props: Map[String, String]): Map[String, String] = {
    require(props.get("connector").contains("kafka"),
      s"not a kafka sink: ${props.get("connector")}")
    require(props.contains("properties.bootstrap.servers"),
      "kafka sink requires properties.bootstrap.servers")
    val base = props.collect {
      case (k, v) if k.startsWith("properties.") =>
        s"kafka.${k.stripPrefix("properties.")}" -> v
    }
    base ++ props.get("topic").map("topic" -> _)
  }
}
