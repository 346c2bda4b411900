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
    * v-1, +U of v). Output = input columns + `_change_kind`.
    *
    * Single pass: one window (row_number + lead computed in the same
    * sort), each row emits its change kinds as an array, one explode
    * — the input is scanned and shuffled exactly once, vs the naive
    * three filtered branches + union (3× scan, 3× window sort).
    */
  def unfold(versions: DataFrame, keyCols: Seq[String], seqCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(seqCol))
    versions
      .withColumn("_rn", row_number().over(w))
      // lead over a literal marks every non-last version — those are
      // retracted when their successor arrives.
      .withColumn("_has_next", lead(lit(1), 1).over(w).isNotNull)
      .withColumn("_change_kind", explode(concat(
        array(when(col("_rn") === 1, lit("+I")).otherwise(lit("+U"))),
        when(col("_has_next"), array(lit("-U")))
          .otherwise(typedLit(Seq.empty[String])))))
      .drop("_rn", "_has_next")
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
