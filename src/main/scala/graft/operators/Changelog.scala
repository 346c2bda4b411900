package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Changelog / RowKind convention (SURVEY.md §1.1, §7.2): Spark has no
  * per-row change flag, so retract streams are modeled with an
  * explicit `_change_kind` column ('+I', '-U', '+U', '-D') plus
  * helpers to unfold a versioned table into a retract stream and fold
  * a retract stream back to final state — mirroring the reference's
  * RowKind (flink-core/.../types/RowKind.java:25) and the
  * UPDATE_BEFORE/UPDATE_AFTER pairs its GroupAggFunction emits.
  */
object Changelog {

  /** Unfold versions (keyCols, seqCol orders versions) into a retract
    * changelog: first version → +I; each later version v → (-U of
    * v-1, +U of v). Output = input columns + `_change_kind`. */
  def unfold(versions: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    val withRn = versions.withColumn("_rn", row_number().over(w))
    val inserts = withRn.filter(col("_rn") === 1)
      .withColumn("_change_kind", lit("+I"))
    val updates = withRn.filter(col("_rn") > 1)
      .withColumn("_change_kind", lit("+U"))
    val retracts = withRn
      .withColumn("_next_rn",
        lead(col("_rn"), 1).over(w))
      .filter(col("_next_rn").isNotNull)
      .drop("_next_rn")
      .withColumn("_change_kind", lit("-U"))
    inserts.unionByName(updates).unionByName(retracts).drop("_rn")
  }

  /** Fold a changelog to final state: net out -U/-D rows, keep the
    * last surviving version per key (by seqCol). */
  def fold(changelog: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val additions = changelog.filter(col("_change_kind").isin("+I", "+U"))
    val retractions = changelog.filter(col("_change_kind").isin("-U", "-D"))
      .groupBy((keyCols :+ seqCol).map(col): _*)
      .agg(count(lit(1)).as("_n_retract"))
    val net = additions.join(retractions, keyCols :+ seqCol, "left_anti")
    Dedup.keepLast(net.drop("_change_kind"), keyCols, seqCol, seqCol)
  }
}
