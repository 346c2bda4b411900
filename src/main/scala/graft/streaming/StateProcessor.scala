package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Offline state inspection and bootstrap (SURVEY.md §2.9 — the
  * reference's flink-libraries/flink-state-processor-api: read a
  * savepoint's operator state as a dataset, transform it, and
  * bootstrap a new job's state from the result).
  *
  * The Spark-native analogs this facade binds together:
  *
  *  - READ: Spark's `statestore` DataSource v2 reads any checkpointed
  *    stateful operator's store as (key, value, partition_id) rows —
  *    aggregation state, dedup state, join state, custom
  *    [GroupState] state alike — plus the `state-metadata` source
  *    enumerating the checkpoint's operators/stores. This is exactly
  *    the savepoint-reader half of the state-processor-api, already
  *    distributed, scan-parallel by state partition.
  *
  *  - BOOTSTRAP: Spark has no state WRITER, but the
  *    `flatMapGroupsWithState(..., initialState)` overload seeds a
  *    new query's keyed state from an arbitrary
  *    KeyValueGroupedDataset — the bootstrap half. Read the old
  *    query's state offline, transform it as a plain DataFrame
  *    (the state "surgery"), and hand it to the new query as its
  *    initial state: the reference's
  *    SavepointWriter/StateBootstrapTransformation workflow with the
  *    write step expressed as first-batch seeding instead of a
  *    savepoint file.
  *
  * [[BootstrappedRunningCount]] demonstrates the full loop and is
  * spec-pinned: a SQL aggregation's checkpoint is read offline, its
  * counts adjusted, and a CUSTOM operator continues from the adjusted
  * state — cross-operator state migration, the hardest
  * state-processor-api use case.
  */
object StateProcessor {

  /** Read one operator's store from a checkpoint as (key, value,
    * partition_id) rows. Defaults address the single-stateful-operator
    * query; `batchId` selects a historical version (default: latest
    * committed). */
  def readState(spark: SparkSession, checkpointDir: String,
                operatorId: Long = 0L, storeName: String = "default",
                batchId: Option[Long] = None): DataFrame = {
    val rd = spark.read.format("statestore")
      .option("operatorId", operatorId)
      .option("storeName", storeName)
    batchId.fold(rd)(b => rd.option("batchId", b)).load(checkpointDir)
  }

  /** The checkpoint's operator/store inventory (`state-metadata`
    * source) — the savepoint manifest the reference's reader starts
    * from. */
  def stateMetadata(spark: SparkSession, checkpointDir: String): DataFrame =
    spark.read.format("state-metadata").load(checkpointDir)
}

/** Running per-key event count whose state can be BOOTSTRAPPED from an
  * offline (key, count) frame — the bootstrap-half demonstrator: seed
  * it with state read (and transformed) from ANOTHER query's
  * checkpoint. Emits (key, count) on every update. */
object BootstrappedRunningCount {
  def apply(spark: SparkSession, ds: Dataset[GEvent],
            initial: Dataset[(Long, Long)]): Dataset[(Long, Long)] = {
    import spark.implicits._
    val init = initial.groupByKey(_._1).mapValues(_._2)
    ds.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Update, GroupStateTimeout.NoTimeout, init) {
      (key: Long, rows: Iterator[GEvent], state: GroupState[Long]) =>
        val n = state.getOption.getOrElse(0L) + rows.size
        state.update(n)
        Iterator.single(key -> n)
    }
  }
}
