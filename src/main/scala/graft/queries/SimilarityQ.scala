package graft.queries

import graft.QueryGroup
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (Array[Float], 64-d):
  * brute-force cosine top-k as the correctness baseline, and
  * sign-random-projection LSH bucketing as the 100 TB scale path
  * (bucket-partitioned self-join, never O(n²)).
  */
object SimilarityQ extends QueryGroup {

  /** DuckDB fragments: dot products / norms via a constant range join
    * (positional list arithmetic, double precision end-to-end). */
  private val normSql =
    """nrm AS (SELECT vec_id, sqrt(sum(CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) * CAST(embedding[CAST(g.i AS INT)] AS DOUBLE))) AS nrm
      |        FROM embeddings JOIN range(1, 65) g(i) ON true GROUP BY vec_id)""".stripMargin

  /** Generated DuckDB oracle for the IVF coarse quantizer: unrolled
    * Lloyd iterations, all arithmetic rounded to 6dp like the Spark
    * implementation. */
  private def ivfOracle(seedIds: Seq[Long], iterations: Int): String =
    ivfPrefix(seedIds, iterations) +
      "\nSELECT vec_id, cluster FROM af ORDER BY vec_id"

  /** Generated oracle for IVF top-k search: the fit prefix, then probe
    * selection from the final-centroid cosines (pf), cluster-member
    * candidates, and exact re-scoring — mirroring
    * `Similarity.ivfSearch` CTE for CTE. */
  private def ivfSearchOracle(seedIds: Seq[Long], iterations: Int,
                              nProbe: Int, k: Int): String =
    ivfPrefix(seedIds, iterations) + s""",
      |$normSql,
      |qp AS (SELECT vec_id AS query_id, cid, cos,
      |         row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
      |       FROM pf WHERE vec_id < 5),
      |probes AS (SELECT query_id, cid FROM qp WHERE rn <= $nProbe),
      |cand AS (SELECT p.query_id, a.vec_id AS neighbor_id
      |         FROM probes p JOIN af a ON a.cluster = p.cid AND a.vec_id <> p.query_id),
      |d AS (SELECT c.query_id, c.neighbor_id,
      |        sum(CAST(q.embedding[CAST(g.i AS INT)] AS DOUBLE) * CAST(n.embedding[CAST(g.i AS INT)] AS DOUBLE)) AS dp
      |      FROM cand c
      |      JOIN embeddings q ON q.vec_id = c.query_id
      |      JOIN embeddings n ON n.vec_id = c.neighbor_id
      |      JOIN range(1, 65) g(i) ON true
      |      GROUP BY 1, 2),
      |scored AS (SELECT query_id, neighbor_id, round(dp / (a.nrm * b.nrm), 6) AS cos
      |  FROM d JOIN nrm a ON a.vec_id = query_id JOIN nrm b ON b.vec_id = neighbor_id),
      |ranked AS (SELECT query_id, neighbor_id, cos,
      |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored)
      |SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= $k
      |ORDER BY query_id, rank""".stripMargin

  private def ivfPrefix(seedIds: Seq[Long], iterations: Int): String = {
    def pair(c: String) =
      s"""SELECT e.vec_id, c.cid,
         |  round(sum(CAST(e.embedding[CAST(g.i AS INT)] AS DOUBLE) * c.cv[CAST(g.i AS INT)])
         |    / (sqrt(sum(CAST(e.embedding[CAST(g.i AS INT)] AS DOUBLE) * CAST(e.embedding[CAST(g.i AS INT)] AS DOUBLE)))
         |       * sqrt(sum(c.cv[CAST(g.i AS INT)] * c.cv[CAST(g.i AS INT)]))), 6) AS cos
         |FROM embeddings e, $c c, range(1, 65) g(i)
         |GROUP BY e.vec_id, c.cid""".stripMargin
    def assign(p: String) =
      s"""SELECT vec_id, cid AS cluster FROM (
         |  SELECT vec_id, cid, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid) AS rn
         |  FROM $p) WHERE rn = 1""".stripMargin
    val sb = new StringBuilder
    sb.append(
      s"""WITH c0 AS (
         |  SELECT vec_id AS cid, list_transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cv
         |  FROM embeddings WHERE vec_id IN (${seedIds.mkString(",")})),
         |""".stripMargin)
    for (k <- 0 until iterations) {
      sb.append(s"p$k AS (${pair(s"c$k")}),\n")
      sb.append(s"a$k AS (${assign(s"p$k")}),\n")
      sb.append(
        s"""m$k AS (
           |  SELECT a.cluster AS cid, CAST(g.i AS INT) AS i,
           |    round(avg(CAST(e.embedding[CAST(g.i AS INT)] AS DOUBLE)), 6) AS m
           |  FROM a$k a JOIN embeddings e USING (vec_id), range(1, 65) g(i)
           |  GROUP BY 1, 2),
           |c${k + 1} AS (SELECT cid, list(m ORDER BY i) AS cv FROM m$k GROUP BY cid),
           |""".stripMargin)
    }
    sb.append(s"pf AS (${pair(s"c$iterations")}),\n")
    sb.append(s"af AS (${assign("pf")})")
    sb.toString
  }

  override def queries = Seq(

    // IVF coarse quantizer (the ANN scale path beyond LSH): fixed-seed
    // k-means, 2 Lloyd iterations, full assignment oracle-checked.
    q("v4_ivf_assign", ivfOracle(seedIds = 0L to 7L, iterations = 2)) { (s, dir) =>
      Similarity.ivfAssign(t(s, dir)("embeddings"), "vec_id", "embedding",
          seedIds = 0L to 7L, iterations = 2)
        .orderBy("vec_id")
    },

    // IVF top-k SEARCH: probe the 2 nearest of 8 coarse clusters per
    // query, exact re-score only cluster members — the ANN query path
    // (assignment above is the offline fit). Same output contract as
    // the brute-force baseline v1.
    q("v5_ivf_search",
      ivfSearchOracle(seedIds = 0L to 7L, iterations = 2, nProbe = 2, k = 3)) {
      (s, dir) =>
        val emb = t(s, dir)("embeddings")
        Similarity.ivfSearch(
            corpus = emb, queries = emb.filter(col("vec_id") < 5),
            idCol = "vec_id", vecCol = "embedding",
            seedIds = 0L to 7L, iterations = 2, nProbe = 2, k = 3)
          .orderBy("query_id", "rank")
    },

    // Semantic deduplication (SemDeDup, Abbas et al. 2023): IVF-
    // cluster the embeddings, flag every vector with a smaller-id
    // within-cluster neighbor at cosine ≥ 0.35 (deterministic min-id
    // exemplar retention). Pairs are generated within clusters only —
    // Σ|cluster|² candidates, never n² — which is the published recipe
    // for embedding dedup at corpus scale.
    q("v7_semantic_dedup",
      ivfPrefix(seedIds = 0L to 7L, iterations = 2) + s""",
        |$normSql,
        |mem AS (SELECT a.vec_id, a.cluster FROM af a),
        |pd AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b,
        |        sum(CAST(ex.embedding[CAST(g.i AS INT)] AS DOUBLE) * CAST(ey.embedding[CAST(g.i AS INT)] AS DOUBLE)) AS dp
        |      FROM mem x JOIN mem y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
        |      JOIN embeddings ex ON ex.vec_id = x.vec_id
        |      JOIN embeddings ey ON ey.vec_id = y.vec_id
        |      JOIN range(1, 65) g(i) ON true
        |      GROUP BY 1, 2),
        |cls AS (SELECT id_b, count(*) AS n_close
        |  FROM pd JOIN nrm a ON a.vec_id = id_a JOIN nrm b ON b.vec_id = id_b
        |  WHERE round(dp / (a.nrm * b.nrm), 6) >= 0.35
        |  GROUP BY id_b)
        |SELECT m.vec_id, m.cluster, CAST(coalesce(c.n_close, 0) AS BIGINT) AS n_close,
        |  CASE WHEN c.n_close IS NOT NULL THEN 'dropped' ELSE 'kept' END AS status
        |FROM mem m LEFT JOIN cls c ON c.id_b = m.vec_id
        |ORDER BY m.vec_id""".stripMargin) { (s, dir) =>
      Similarity.semanticDedup(t(s, dir)("embeddings"), "vec_id", "embedding",
          seedIds = 0L to 7L, iterations = 2, threshold = 0.35)
        .orderBy("vec_id")
    },

    // Brute-force cosine top-3 neighbors for query vectors vec_id < 5.
    q("v1_knn_brute",
      s"""WITH $normSql,
         |d AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |        sum(CAST(q.embedding[CAST(g.i AS INT)] AS DOUBLE) * CAST(c.embedding[CAST(g.i AS INT)] AS DOUBLE)) AS dp
         |      FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND q.vec_id <> c.vec_id
         |      JOIN range(1, 65) g(i) ON true
         |      GROUP BY 1, 2),
         |scored AS (SELECT query_id, neighbor_id,
         |    round(dp / (a.nrm * b.nrm), 6) AS cos
         |  FROM d JOIN nrm a ON a.vec_id = query_id JOIN nrm b ON b.vec_id = neighbor_id),
         |ranked AS (SELECT query_id, neighbor_id, cos,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         |  FROM scored)
         |SELECT query_id, rank, neighbor_id, cos FROM ranked WHERE rank <= 3
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val emb = t(s, dir)("embeddings")
      Similarity.bruteForceKnn(
          queries = emb.filter(col("vec_id") < 5), corpus = emb,
          idCol = "vec_id", vecCol = "embedding", k = 3)
        .orderBy("query_id", "rank")
    },

    // Sign-LSH (4 planes): bucket histogram — validates the bucketing
    // expression end-to-end (the scale-path candidate generator).
    q("v2_lsh_buckets",
      """WITH comp AS (
        |  SELECT p.p, CAST(g.i AS INT) AS i,
        |    (CAST('0x' || substr(md5(p.p || ':' || CAST(g.i - 1 AS INT)), 1, 8) AS BIGINT) % 2) * 2 - 1 AS c
        |  FROM range(0, 4) p(p) CROSS JOIN range(1, 65) g(i)),
        |proj AS (
        |  SELECT e.vec_id, comp.p,
        |    sum(CAST(e.embedding[comp.i] AS DOUBLE) * comp.c) AS pr
        |  FROM embeddings e JOIN comp ON true
        |  GROUP BY 1, 2),
        |buck AS (
        |  SELECT vec_id,
        |    CAST(sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket
        |  FROM proj GROUP BY vec_id)
        |SELECT bucket, count(*) AS n, min(vec_id) AS min_vec, max(vec_id) AS max_vec
        |FROM buck GROUP BY bucket
        |ORDER BY bucket""".stripMargin) { (s, dir) =>
      t(s, dir)("embeddings")
        .select(col("vec_id"),
          Similarity.bucketExpr(col("embedding"), numPlanes = 4, dims = 64).as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min("vec_id").as("min_vec"), max("vec_id").as("max_vec"))
        .orderBy("bucket")
    },

    // LSH-bucketed near-dup candidates verified by cosine ≥ 0.35 —
    // brute force only within buckets.
    q("v3_lsh_neardup",
      s"""WITH comp AS (
         |  SELECT p.p, CAST(g.i AS INT) AS i,
         |    (CAST('0x' || substr(md5(p.p || ':' || CAST(g.i - 1 AS INT)), 1, 8) AS BIGINT) % 2) * 2 - 1 AS c
         |  FROM range(0, 4) p(p) CROSS JOIN range(1, 65) g(i)),
         |proj AS (
         |  SELECT e.vec_id, comp.p, sum(CAST(e.embedding[comp.i] AS DOUBLE) * comp.c) AS pr
         |  FROM embeddings e JOIN comp ON true GROUP BY 1, 2),
         |buck AS (
         |  SELECT vec_id,
         |    CAST(sum(CASE WHEN pr > 0 THEN CAST(1 AS BIGINT) << CAST(p AS INT) ELSE 0 END) AS BIGINT) AS bucket
         |  FROM proj GROUP BY vec_id),
         |$normSql,
         |cand AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM buck a JOIN buck b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
         |d AS (SELECT id_a, id_b,
         |        sum(CAST(ea.embedding[CAST(g.i AS INT)] AS DOUBLE) * CAST(eb.embedding[CAST(g.i AS INT)] AS DOUBLE)) AS dp
         |      FROM cand JOIN embeddings ea ON ea.vec_id = id_a
         |      JOIN embeddings eb ON eb.vec_id = id_b
         |      JOIN range(1, 65) g(i) ON true
         |      GROUP BY 1, 2)
         |SELECT id_a, id_b, round(dp / (a.nrm * b.nrm), 6) AS cos
         |FROM d JOIN nrm a ON a.vec_id = id_a JOIN nrm b ON b.vec_id = id_b
         |WHERE round(dp / (a.nrm * b.nrm), 6) >= 0.35
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Similarity.lshNearDups(t(s, dir)("embeddings"), "vec_id", "embedding",
          numPlanes = 4, dims = 64, threshold = 0.35)
        .orderBy("id_a", "id_b")
    },

    // Symmetric int8 quantization of the embedding column (the
    // compression step before shipping vectors to an ANN index):
    // per-vector scale = 127/max|x|, code = floor(x·scale), plus the
    // dequantization error that decides whether int8 is acceptable.
    // Pure Column-expression folds over the array — no UDF, stays in
    // codegen, and the per-row arithmetic is order-deterministic in
    // both engines (sequential left-to-right fold).
    q("v6_int8_quantize",
      """WITH s AS (SELECT vec_id, embedding,
        |    127.0 / list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS sc
        |  FROM embeddings)
        |SELECT vec_id, round(sc, 6) AS scale,
        |  round(list_sum(list_transform(embedding,
        |    x -> abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) * sc) / sc)))
        |    / len(embedding), 6) AS mean_abs_err
        |FROM s ORDER BY vec_id""".stripMargin) { (s, dir) =>
      val sc = lit(127.0) / array_max(transform(col("embedding"),
        x => abs(x.cast("double"))))
      t(s, dir)("embeddings")
        .select(col("vec_id"), col("embedding"), sc.as("sc"))
        .select(col("vec_id"), round(col("sc"), 6).as("scale"),
          // one codegen'd kernel (r15): the aggregate·transform fold
          // interpreted its abs/floor lambda per element
          round(call_function("quant_abs_err_sum", col("embedding"),
            col("sc")) / size(col("embedding")), 6)
            .as("mean_abs_err"))
        .orderBy("vec_id")
    },

    // Diagonal-Gaussian outlier scoring (flink-ml-lib
    // common/statistics/basicstatistic/MultivariateGaussian.java —
    // the density model there, with the diagonal-covariance
    // restriction that keeps the fit a single aggregation pass):
    // per (label, dim) fit mu/var over the corpus, then score each
    // vector's log-pdf under its label's Gaussian and keep the 5
    // least-likely per label. Stats table is labels×dims rows —
    // broadcast back; both passes are shuffles on (label, dim) /
    // (label, vec_id) only, so the shape holds at 100 TB. Scores
    // rounded to 6dp before ranking (ties broken by vec_id) so the
    // rank is engine- and order-independent.
    q("v8_gaussian_outlier",
      """WITH e AS (
        |  SELECT vec_id, label, g.i AS dim,
        |    CAST(embedding[CAST(g.i AS INT)] AS DOUBLE) AS x
        |  FROM embeddings JOIN range(1, 65) g(i) ON true),
        |st AS (SELECT label, dim, avg(x) AS mu,
        |         greatest(var_pop(x), 1e-9) AS v
        |       FROM e GROUP BY 1, 2),
        |sc AS (SELECT e.label, e.vec_id,
        |    round(-0.5 * sum(ln(2 * pi() * st.v)
        |      + (e.x - st.mu) * (e.x - st.mu) / st.v), 6) AS score
        |  FROM e JOIN st ON st.label = e.label AND st.dim = e.dim
        |  GROUP BY 1, 2),
        |rk AS (SELECT label, vec_id, score,
        |    row_number() OVER (PARTITION BY label ORDER BY score, vec_id) AS rn
        |  FROM sc)
        |SELECT label, vec_id, score, rn FROM rk
        |WHERE rn <= 5 ORDER BY label, rn""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val e = t(s, dir)("embeddings")
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "xf")))
        .select(col("vec_id"), col("label"), col("dim"),
          col("xf").cast("double").as("x"))
      // variance floor: a constant (label, dim) slice would make
      // var_pop = 0, so ln(2πv) = -Inf and (x-mu)²/v = NaN with
      // engine-divergent NULL/Inf handling — the reference's
      // MultivariateGaussian regularizes singular covariance the same
      // way (flink-ml MultivariateGaussian.java's epsilon floor)
      val stats = e.groupBy("label", "dim")
        .agg(avg("x").as("mu"), greatest(var_pop("x"), lit(1e-9)).as("v"))
      // r15 (guide §2.3/§2.4 + kernel): the stats table is labels×64
      // rows at ANY scale, so pivot it to one sorted (dim, mu, v)
      // array per label and score each vector MAP-ONLY against the
      // broadcast array — the 64×|vectors| explode-join-reaggregate
      // (a second pass over e plus a |vectors|-row shuffle) drops out.
      // array_sort fixes the fold order by dim; the replaced form
      // summed in join-emission order and leaned on the same 6-dp
      // round to be order-free.
      val statsArr = stats
        .groupBy("label")
        .agg(array_sort(collect_list(struct(col("dim"), col("mu"), col("v"))))
          .as("_st"))
      val scored = t(s, dir)("embeddings")
        .join(broadcast(statsArr), "label")
        .select(col("label"), col("vec_id"),
          round(lit(-0.5) *
            call_function("gauss_log_sum", col("embedding"), col("_st")), 6)
            .as("score"))
      scored
        .withColumn("rn", row_number().over(
          Window.partitionBy("label").orderBy(col("score"), col("vec_id"))))
        .filter(col("rn") <= 5)
        .orderBy("label", "rn")
    },

    // flink-ml PIPELINE API analog (flink-ml-api/.../core/Pipeline.java
    // dual Estimator/Transformer role, Params.java, JSON persistence):
    // StandardScaler ESTIMATOR (one distributed fit pass) chained into
    // a sigmoid-gate TRANSFORMER; the fitted pipeline round-trips
    // through its JSON form before transforming — fit, persistence,
    // and the map-only scalar-literal transform are all on the oracle
    // gate. keep = 1 iff sigmoid(2z - 0.5) > 0.5, i.e. z > 0.25.
    q("ml1_pipeline",
      """WITH st AS (SELECT avg(n_chars * 1.0) AS mu,
        |    greatest(var_pop(n_chars * 1.0), 1e-12) AS v FROM documents),
        |z AS (SELECT doc_id, (n_chars - mu) / sqrt(v) AS z
        |      FROM documents CROSS JOIN st)
        |SELECT doc_id, round(z, 6) AS z,
        |  CAST(CASE WHEN 1.0 / (1.0 + exp(-(2.0 * z - 0.5))) > 0.5
        |    THEN 1 ELSE 0 END AS INT) AS keep
        |FROM z ORDER BY doc_id""".stripMargin) { (s, dir) =>
      import graft.operators.MlPipeline._
      val pipe = Pipeline(Seq(
        StandardScaler(Params()
          .set("inputCol", "n_chars").set("outputCol", "z")),
        SigmoidGate(Params()
          .set("inputCol", "z").set("keepCol", "keep")
          .set("w", 2.0).set("b", -0.5).set("threshold", 0.5))))
      val fitted = pipe.fit(t(s, dir)("documents"))
      // persistence round-trip: the fitted models' scalar state rides
      // in the JSON; the restored pipeline is a pure Transformer
      val restored = Pipeline.fromJson(Pipeline(fitted.fitted).toJson)
      restored.transform(t(s, dir)("documents"))
        .select(col("doc_id"), round(col("z"), 6).as("z"), col("keep"))
        .orderBy("doc_id")
    })
}
