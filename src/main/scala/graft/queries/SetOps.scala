package graft.queries

import graft.QueryGroup
import org.apache.spark.sql.functions._

/** Set operations (SURVEY.md §2.7): UNION ALL / UNION / INTERSECT /
  * EXCEPT and the count-based ALL variants. The reference rewrites
  * INTERSECT/EXCEPT to semi/anti joins
  * (ReplaceIntersectWithSemiJoinRule.scala) — Catalyst does the same
  * rewrite natively, so these are pure declarative calls.
  */
object SetOps extends QueryGroup {

  // Two deterministic overlapping sets of customer keys.
  private def setA(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir)("orders").filter(col("o_totalprice") > 250000)
      .select(col("o_custkey").as("custkey"))
  private def setB(s: org.apache.spark.sql.SparkSession, dir: String) =
    t(s, dir)("customer").filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("custkey"))

  private val sqlA = "SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 250000"
  private val sqlB = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"

  override def queries = Seq(

    q("s1_union_all",
      s"""SELECT custkey, count(*) AS n FROM ($sqlA UNION ALL $sqlB)
         |GROUP BY custkey ORDER BY custkey""".stripMargin) { (s, dir) =>
      setA(s, dir).unionAll(setB(s, dir))
        .groupBy("custkey").agg(count(lit(1)).as("n"))
        .orderBy("custkey")
    },

    q("s2_union_distinct",
      s"SELECT custkey FROM ($sqlA UNION $sqlB) ORDER BY custkey") { (s, dir) =>
      setA(s, dir).union(setB(s, dir)).distinct()
        .orderBy("custkey")
    },

    q("s3_intersect",
      s"SELECT custkey FROM ($sqlA INTERSECT $sqlB) ORDER BY custkey") { (s, dir) =>
      setA(s, dir).intersect(setB(s, dir)).orderBy("custkey")
    },

    q("s4_except",
      s"SELECT custkey FROM ($sqlA EXCEPT $sqlB) ORDER BY custkey") { (s, dir) =>
      setA(s, dir).except(setB(s, dir)).orderBy("custkey")
    },

    q("s5_intersect_all",
      s"SELECT custkey FROM ($sqlA INTERSECT ALL $sqlB) ORDER BY custkey") { (s, dir) =>
      setA(s, dir).intersectAll(setB(s, dir)).orderBy("custkey")
    },

    q("s6_except_all",
      s"SELECT custkey FROM ($sqlA EXCEPT ALL $sqlB) ORDER BY custkey") { (s, dir) =>
      setA(s, dir).exceptAll(setB(s, dir)).orderBy("custkey")
    })
}
