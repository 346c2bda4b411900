package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Upsert sink — the materializing half of the reference's
  * `UpsertStreamTableSink` contract
  * (flink-table/flink-table-api-java-bridge/src/main/java/org/apache/
  * flink/table/sinks/UpsertStreamTableSink.java:55: a changelog of
  * (Boolean flag, row) messages where flag=true upserts the row under
  * its key and flag=false deletes the key — the shape upsert-kafka,
  * JDBC, and HBase sinks consume). The external systems those sinks
  * write to aren't reachable here (zero-egress), so this operator IS
  * the keyed store: a parquet table the changelog maintains
  * incrementally.
  *
  * Scale design (the part that must survive 100 TB):
  *
  *  - The table is hive-partitioned by `bucket = pmod(hash(keys), N)`.
  *    Each micro-batch touches only the buckets its keys hash into:
  *    the read side prunes to those partitions (partition pruning on
  *    the bucket directory layout), and the write side replaces only
  *    those directories (dynamic partition overwrite). Per-batch cost
  *    is O(batch + touched_buckets · table/N), never O(table).
  *  - Conflict resolution is SEQUENCE-based, not arrival-based: every
  *    message carries ordering columns (event time + tiebreaker), the
  *    stored row keeps them, and merge keeps the per-key max. Late or
  *    redelivered messages therefore converge to the same table —
  *    the merge is idempotent and commutative, which also makes the
  *    foreachBatch retry semantics (at-least-once) safe.
  *  - The merged result is localCheckpoint'ed before the overwrite:
  *    Spark refuses a write whose lineage reads the path being
  *    overwritten; cutting the lineage materializes only the touched
  *    buckets, keeping the staging cost proportional to the batch.
  */
object UpsertSink {

  /** Apply a bounded changelog stream to the keyed table at
    * `tablePath`, micro-batch by micro-batch, and block until drained.
    *
    * `changelog` must be a STREAMING DataFrame containing `keyCols`,
    * `seqCols` (ordering columns, highest wins; must be
    * lexicographically comparable), the boolean `flagCol`
    * (true = upsert, false = delete), and any value columns.
    */
  def run(spark: SparkSession, changelog: DataFrame, tablePath: String,
          keyCols: Seq[String], seqCols: Seq[String],
          flagCol: String = "upsert", numBuckets: Int = 16,
          checkpointDir: Option[String] = None): Unit = {
    require(changelog.isStreaming, "UpsertSink.run takes a streaming changelog")
    require(keyCols.nonEmpty && seqCols.nonEmpty)
    val w0 = changelog.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(spark, batch, tablePath, keyCols, seqCols, flagCol,
          numBuckets)
        ()
      }
    val q = checkpointDir.fold(w0)(d => w0.option("checkpointLocation", d))
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** One micro-batch merge (also the unit the spec drives directly). */
  def applyBatch(spark: SparkSession, batch: DataFrame, tablePath: String,
                 keyCols: Seq[String], seqCols: Seq[String],
                 flagCol: String, numBuckets: Int): Unit = {
    if (batch.isEmpty) return
    val keyExprs = keyCols.map(col)
    val withBucket = batch.withColumn("bucket",
      pmod(hash(keyExprs: _*), lit(numBuckets)))
    // within-batch + vs-stored resolution are the SAME rule (max seq
    // per key), so the batch needs no pre-dedup — one union, one rank
    val touched = withBucket.select("bucket").distinct()
      .collect().map(_.getInt(0)).sorted
    val exists = {
      val p = new org.apache.hadoop.fs.Path(tablePath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // at least one bucket directory (a root holding only _SUCCESS
      // markers — e.g. after every key was deleted — has no schema)
      fs.exists(p) &&
        fs.listStatus(p).exists(_.getPath.getName.startsWith("bucket="))
    }
    val existing =
      if (exists)
        spark.read.parquet(tablePath)
          .where(col("bucket").isin(touched.map(Integer.valueOf): _*))
          .withColumn(flagCol, lit(true))
          .select(withBucket.columns.map(col): _*)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        withBucket.schema)
    val rank = Window.partitionBy(keyExprs: _*)
      .orderBy(seqCols.map(col(_).desc): _*)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val merged = existing.union(withBucket)
      .withColumn("_rn", row_number().over(rank))
      .where(col("_rn") === 1 && col(flagCol))
      .drop("_rn", flagCol)
      // cut lineage: the overwrite below must not read its own target
      .localCheckpoint(true)
    try {
      merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(tablePath)
      // dynamic overwrite only replaces partitions PRESENT in the write:
      // a bucket whose last row was deleted writes nothing and would
      // keep its stale files — remove emptied bucket dirs explicitly
      val written = merged.select("bucket").distinct()
        .collect().map(_.getInt(0)).toSet
      val root = new org.apache.hadoop.fs.Path(tablePath)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched.filterNot(written).foreach { b =>
        val d = new org.apache.hadoop.fs.Path(root, s"bucket=$b")
        if (fs.exists(d)) fs.delete(d, true)
      }
    } finally {
      // release THIS batch's checkpoint blocks — over a long stream
      // they would otherwise accumulate one per batch (same hygiene
      // as GraphOps' in-loop superstep release)
      val live = spark.sparkContext.getPersistentRDDs
      (live.keySet -- persistedBefore)
        .foreach(id => live.get(id).foreach(_.unpersist(false)))
    }
  }

  /** The materialized table (without the internal bucket column). */
  def read(spark: SparkSession, tablePath: String): DataFrame =
    spark.read.parquet(tablePath).drop("bucket")
}
