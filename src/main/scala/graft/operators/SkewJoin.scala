package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY.md §4.2 / the reference's SplitAggregateRule
  * bucketed distinct-agg split): salting utilities that turn one hot
  * key into `salts` sub-keys so no single reducer drowns.
  *
  * AQE's skew-join handling covers sort-merge joins automatically;
  * these helpers cover the aggregate path (pre-aggregate per salted
  * key, then merge) — the two-level MOD(HASH_CODE(x), N) rewrite of
  * SplitAggregateRule.scala expressed as plain DataFrame ops.
  */
object SkewJoin {

  /** Two-phase salted aggregation: sum/count grouped by `key` computed
    * as groupBy(key, salt) partial → groupBy(key) final. Result is
    * identical to a direct groupBy (addition is associative on longs/
    * decimals) but the first shuffle fans each hot key over `salts`
    * reducers. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
                     salts: Int): DataFrame = {
    val salt = fresh(df.columns, "_salt")
    val salted = df.withColumn(salt, pmod(hash(monotonically_increasing_id()), lit(salts)))
    salted
      .groupBy(col(key), col(salt))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum("_psum").as("total"), sum("_pcnt").as("n"))
  }

  /** Internal-column name that cannot collide with user columns: if the
    * preferred name is taken, suffix a counter until it is free. Keeps
    * the documented row-identity guarantee even when the input already
    * carries a `_salt` column. */
  private def fresh(existing: Array[String], base: String): String = {
    if (!existing.contains(base)) base
    else Iterator.from(0).map(i => s"$base$i").find(!existing.contains(_)).get
  }

  /** Salted equi-join for a skewed fact side when the dim side is too
    * big to broadcast outright but small enough to replicate `salts`
    * times: each fact row gets a deterministic salt from `saltExpr`
    * (any expression over fact columns — NOT the join key, which is
    * the skewed one), the dim side is exploded once per salt value,
    * and the shuffle keys become (key, salt) — a hot key now lands on
    * `salts` reducers instead of one. Row-identical to
    * `fact.join(dim, factKey === dimKey)`.
    *
    * This is the manual form for when AQE skew-join can't help
    * (e.g. the skew is in a shuffled hash join under a stateful op).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, saltExpr: Column, salts: Int): DataFrame = {
    val salt = fresh(fact.columns ++ dim.columns, "_salt")
    val saltedFact = fact.withColumn(salt, pmod(saltExpr, lit(salts)))
    val repDim = dim.withColumn(salt,
      explode(sequence(lit(0), lit(salts - 1)).cast("array<int>")))
    saltedFact.join(repDim,
        saltedFact(factKey) === repDim(dimKey) &&
          saltedFact(salt) === repDim(salt))
      .drop(salt)
  }
}
