package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph generators (SURVEY.md §2.11 — Gelly
  * `flink-gelly/.../graph/generator/`: CompleteGraph, CycleGraph,
  * PathGraph, StarGraph, HypercubeGraph, CirculantGraph, GridGraph,
  * EmptyGraph, SingletonEdgeGraph, RMatGraph).
  *
  * Spark shape: every edge is a PURE FUNCTION of its `spark.range`
  * index — map-only, no shuffle, no driver loop, no RNG state — so a
  * 10^12-edge graph generates embarrassingly parallel exactly like
  * the reference's `LongValueSequenceIterator` splits. All index
  * arithmetic uses integer `div`/`%` (never double division — exact
  * at any scale). Undirected graphs are emitted as both-direction
  * directed edge lists, the reference's convention. RMat replaces the
  * reference's seeded `RandomGenerator` with a splitmix64 counter
  * hash of (seed, edge, level): same distribution shape, reproducible
  * on any cluster layout.
  */
object GraphGenerators {

  /** CompleteGraph.java: every ordered pair (v, w), v ≠ w.
    * vertexCount >= 2 mirrors the reference generator's
    * GraphGeneratorUtils argument validation. */
  def complete(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 2, s"complete graph needs vertexCount >= 2, got $n")
    spark.range(n * (n - 1)).select(
      expr(s"id div ${n - 1}").as("src"),
      expr(s"(id div ${n - 1} + id % ${n - 1} + 1) % $n").as("dst"))
  }

  /** CycleGraph.java: v → (v+1) mod n, both directions
    * (vertexCount >= 2, the reference's bound). */
  def cycle(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 2, s"cycle graph needs vertexCount >= 2, got $n")
    spark.range(2 * n).select(
      expr(s"id % $n").as("src"),
      expr(s"IF(id < $n, (id + 1) % $n, (id % $n + $n - 1) % $n)").as("dst"))
  }

  /** PathGraph.java: v → v+1 for v < n−1, both directions
    * (vertexCount >= 2). */
  def path(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 2, s"path graph needs vertexCount >= 2, got $n")
    spark.range(2 * (n - 1)).select(
      expr(s"IF(id < ${n - 1}, id, id - $n + 2)").as("src"),
      expr(s"IF(id < ${n - 1}, id + 1, id - $n + 1)").as("dst"))
  }

  /** StarGraph.java: center 0 ↔ each leaf (vertexCount >= 2). */
  def star(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 2, s"star graph needs vertexCount >= 2, got $n")
    spark.range(2 * (n - 1)).select(
      expr(s"IF(id < ${n - 1}, 0L, id - $n + 2)").as("src"),
      expr(s"IF(id < ${n - 1}, id + 1, 0L)").as("dst"))
  }

  /** HypercubeGraph.java: v ↔ v xor 2^bit for each of `dims` bits
    * (1 <= dims <= 62 keeps 2^dims a positive long). */
  def hypercube(spark: SparkSession, dims: Int): DataFrame = {
    require(dims >= 1 && dims <= 62, s"hypercube needs 1 <= dims <= 62, got $dims")
    val n = 1L << dims
    spark.range(n * dims).select(
      expr(s"id div $dims").as("src"),
      expr(s"(id div $dims) ^ shiftleft(1L, cast(id % $dims AS INT))").as("dst"))
  }

  /** CirculantGraph.java: v ↔ (v ± off) mod n for each offset.
    * Offsets must lie in [1, n-1] (the reference's
    * CirculantGraph.addRange validation) — an offset >= n would make
    * (v - off + n) % n negative under the JVM's signed %, emitting
    * invalid vertex ids. */
  def circulant(spark: SparkSession, n: Long, offsets: Seq[Long]): DataFrame = {
    require(n >= 2, s"circulant graph needs vertexCount >= 2, got $n")
    require(offsets.nonEmpty && offsets.forall(o => o >= 1 && o <= n - 1),
      s"circulant offsets must lie in [1, ${n - 1}], got $offsets")
    val k = offsets.size.toLong
    val offs = offsets.mkString("array(", ", ", ")")
    spark.range(2 * n * k).select(
      expr(s"id div ${2 * k}").as("src"),
      expr(s"""IF((id div $k) % 2 = 0,
               |  (id div ${2 * k} + element_at($offs, cast(id % $k AS INT) + 1)) % $n,
               |  (id div ${2 * k} - element_at($offs, cast(id % $k AS INT) + 1) + $n) % $n)"""
        .stripMargin).as("dst"))
  }

  /** GridGraph.java (2-D, no wrap): right/down/left/up neighbors,
    * rim edges filtered (each dimension >= 2, GridGraph.addDimension). */
  def grid(spark: SparkSession, rows: Long, cols: Long): DataFrame = {
    require(rows >= 2 && cols >= 2,
      s"grid graph needs each dimension >= 2, got ${rows}x$cols")
    spark.range(4 * rows * cols)
      .select(expr("id div 4").as("v"), expr("id % 4").as("d"))
      .select(col("v"), col("d"),
        expr(s"v % $cols").as("c"), expr(s"v div $cols").as("r"))
      .filter(
        (col("d") === 0 && col("c") < cols - 1) ||
        (col("d") === 1 && col("r") < rows - 1) ||
        (col("d") === 2 && col("c") > 0) ||
        (col("d") === 3 && col("r") > 0))
      .select(col("v").as("src"),
        when(col("d") === 0, col("v") + 1)
          .when(col("d") === 1, col("v") + cols)
          .when(col("d") === 2, col("v") - 1)
          .otherwise(col("v") - cols).as("dst"))
  }

  /** EmptyGraph.java: n vertices, no edges (n >= 0). */
  def empty(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 0, s"empty graph needs vertexCount >= 0, got $n")
    spark.range(0).toDF("src").select(col("src"), col("src").as("dst"))
  }

  /** SingletonEdgeGraph.java: k disjoint pairs (2i ↔ 2i+1), k >= 1. */
  def singletonEdge(spark: SparkSession, k: Long): DataFrame = {
    require(k >= 1, s"singleton-edge graph needs vertexPairCount >= 1, got $k")
    spark.range(2 * k).select(col("id").as("src"),
      expr("IF(id % 2 = 0, id + 1, id - 1)").as("dst"))
  }

  /** Declared vertex set (isolated vertices included — EmptyGraph
    * consists of nothing else). */
  def vertices(spark: SparkSession, n: Long): DataFrame = {
    require(n >= 0, s"vertex set needs n >= 0, got $n")
    spark.range(n).toDF("node")
  }

  private def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** RMatGraph.java:152 — recursive-quadrant power-law generator.
    * Per edge index, `scale` quadrant draws build one bit of src and
    * dst each; the draw for (edge e, level l) is splitmix64(seed, e,
    * l) mapped to [0,1) — a counter-based RNG, so the graph is a pure
    * function of (seed, scale, edgeCount) on any partitioning (the
    * reference seeds a mutable RandomGenerator per split; same
    * distribution shape, stronger reproducibility). Defaults are the
    * reference's noise-free (a,b,c) = (0.57, 0.19, 0.19). */
  def rmat(spark: SparkSession, scale: Int, edgeCount: Long, seed: Long,
           a: Double = 0.57, b: Double = 0.19, c: Double = 0.19,
           parallelism: Option[Int] = None): DataFrame = {
    import spark.implicits._
    require(scale >= 1 && scale <= 62, s"rmat needs 1 <= scale <= 62, got $scale")
    require(edgeCount >= 0, s"rmat needs edgeCount >= 0, got $edgeCount")
    require(a > 0 && b > 0 && c > 0 && a + b + c < 1,
      s"rmat needs positive (a, b, c) with a+b+c < 1, got ($a, $b, $c)")
    // `parallelism` exists so layout-independence is testable AT THE
    // GENERATION SITE: the counter hash must emit the same graph no
    // matter how the index range is split across tasks
    val range = parallelism match {
      case Some(p) => spark.range(0L, edgeCount, 1L, p)
      case None => spark.range(edgeCount)
    }
    range.as[Long].mapPartitions { it =>
      it.map { e =>
        var src = 0L
        var dst = 0L
        var l = 0
        while (l < scale) {
          // sequential mixing, not seed^e: XORing seed into the edge
          // index merely PERMUTES the per-edge draw multiset across
          // seeds (sorted edge lists collide); chaining mix64 breaks
          // the bijection
          val h = mix64(mix64(mix64(seed) + e) + l.toLong)
          val u = (h >>> 11).toDouble / (1L << 53).toDouble // [0,1)
          if (u < a) { /* top-left quadrant: both bits 0 */ }
          else if (u < a + b) { dst |= 1L << l }
          else if (u < a + b + c) { src |= 1L << l }
          else { src |= 1L << l; dst |= 1L << l }
          l += 1
        }
        (src, dst)
      }
    }.toDF("src", "dst")
  }
}
