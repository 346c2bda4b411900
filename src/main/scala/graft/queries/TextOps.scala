package graft.queries

import graft.QueryGroup
import graft.functions.TextFunctions._
import graft.operators.TextDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data pipeline text operators over `documents`:
  * exact dedup, fingerprinting, token statistics, quality scoring,
  * language-ID, n-gram Jaccard near-dup, MinHash-LSH near-dup, and
  * SimHash near-dup — every one oracle-checked against the identical
  * formula in DuckDB SQL.
  */
object TextOps extends QueryGroup {

  /** DuckDB fragments shared by the oracles. */
  private val toksSql = "string_split_regex(trim(text), '\\s+')"
  private val bigramsSql =
    s"list_transform(generate_series(1, len($toksSql) - 1), i -> $toksSql[i] || ' ' || $toksSql[i+1])"
  private def mhSql(k: Int) =
    s"list_min(list_transform(list_distinct($bigramsSql), s -> (CAST('0x' || substr(md5(s), 1, 8) AS BIGINT) * ${2 * k + 1} + ${(k.toLong * 2654435761L) % 4294967291L}) % 4294967291))"

  override def queries = Seq(

    // Exact dedup: hash-groupBy on content digest (one shuffle).
    q("x1_exact_dedup",
      """SELECT md5(text) AS digest, min(doc_id) AS canonical_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY digest""".stripMargin) { (s, dir) =>
      TextDedup.exact(t(s, dir)("documents"), "doc_id", "text")
        .orderBy("digest")
    },

    // Normalized-content fingerprint per doc.
    q("x2_fingerprint",
      s"""SELECT doc_id, md5(array_to_string($toksSql, ' ')) AS fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir)("documents")
        .select(col("doc_id"), fingerprint(col("text")).as("fp"))
        .orderBy("doc_id")
    },

    // Order-sensitive rolling-hash fingerprint (Rabin–Karp over the
    // token stream): detects reorder edits that the normalized md5
    // fingerprint (x2) is blind to.
    q("x12_rolling_fingerprint",
      s"""SELECT doc_id,
         |  list_reduce(
         |    list_prepend(CAST(0 AS BIGINT),
         |      list_transform($toksSql, t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT))),
         |    (acc, x) -> (acc * 31 + x) % 4294967296) AS roll_fp
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      t(s, dir)("documents")
        .select(col("doc_id"), rollingHash(tokens(col("text"))).as("roll_fp"))
        .orderBy("doc_id")
    },

    // BPE-ish token counting: letter/digit/punctuation runs (the
    // merge-free pre-tokenizer skeleton) next to whitespace tokens —
    // the fertility ratio is the standard tokenizer-cost estimate.
    q("x13_bpe_tokens",
      s"""SELECT doc_id,
         |  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) AS n_bpe,
         |  len($toksSql) AS n_ws,
         |  round(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+')) * 1.0
         |        / len($toksSql), 6) AS fertility
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val bpe = bpeTokens(col("text"))
      val ws = tokens(col("text"))
      t(s, dir)("documents")
        .select(col("doc_id"),
          size(bpe).as("n_bpe"),
          size(ws).as("n_ws"),
          round(size(bpe).cast(DoubleType) / size(ws), 6).as("fertility"))
        .orderBy("doc_id")
    },

    // Token statistics: counts, type-token ratio, mean token length.
    q("x3_token_stats",
      s"""SELECT doc_id,
         |  len($toksSql) AS n_tokens,
         |  len(list_distinct($toksSql)) AS n_unique,
         |  round(len(list_distinct($toksSql)) * 1.0 / len($toksSql), 6) AS ttr,
         |  round(list_sum(list_transform($toksSql, x -> len(x))) * 1.0 / len($toksSql), 6) AS mean_len
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val tk = tokens(col("text"))
      t(s, dir)("documents")
        .select(
          col("doc_id"),
          size(tk).as("n_tokens"),
          size(array_distinct(tk)).as("n_unique"),
          round(size(array_distinct(tk)).cast(DoubleType) / size(tk), 6).as("ttr"),
          round(tokenLengthSum(tk).cast(DoubleType) / size(tk), 6)
            .as("mean_len"))
        .orderBy("doc_id")
    },

    // Quality scoring: stopword ratio, digit ratio, mean-length-based
    // heuristic score (deterministic arithmetic in both engines).
    q("x4_quality",
      s"""SELECT doc_id,
         |  round(len(list_filter($toksSql, x -> x IN ('the', 'a'))) * 1.0 / len($toksSql), 6) AS stop_ratio,
         |  round(length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text), 6) AS digit_ratio,
         |  round(0.5 * (len(list_distinct($toksSql)) * 1.0 / len($toksSql))
         |      + 0.5 * least(len($toksSql) / 100.0, 1.0), 6) AS quality
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val tk = tokens(col("text"))
      t(s, dir)("documents")
        .select(
          col("doc_id"),
          round(size(filter(tk, x => x.isin("the", "a"))).cast(DoubleType) / size(tk), 6)
            .as("stop_ratio"),
          round(length(regexp_replace(col("text"), "[^0-9]", "")).cast(DoubleType) /
            length(col("text")), 6).as("digit_ratio"),
          round(size(array_distinct(tk)).cast(DoubleType) / size(tk) * 0.5 +
            least(size(tk).cast(DoubleType) / 100.0, lit(1.0)) * 0.5, 6).as("quality"))
        .orderBy("doc_id")
    },

    // N-gram-marker language ID with deterministic tiebreak.
    q("x5_lang_id",
      s"""SELECT doc_id,
         |  len(list_filter($toksSql, x -> x IN ('the', 'a'))) AS c_en,
         |  len(list_filter($toksSql, x -> x IN ('spark', 'vector'))) AS c_tech,
         |  len(list_filter($toksSql, x -> x IN ('data', 'table', 'row'))) AS c_db,
         |  CASE
         |    WHEN len(list_filter($toksSql, x -> x IN ('the', 'a'))) >= len(list_filter($toksSql, x -> x IN ('spark', 'vector')))
         |     AND len(list_filter($toksSql, x -> x IN ('the', 'a'))) >= len(list_filter($toksSql, x -> x IN ('data', 'table', 'row'))) THEN 'en'
         |    WHEN len(list_filter($toksSql, x -> x IN ('spark', 'vector'))) >= len(list_filter($toksSql, x -> x IN ('data', 'table', 'row'))) THEN 'tech'
         |    ELSE 'db' END AS pred_lang
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val tk = tokens(col("text"))
      val cEn = size(filter(tk, x => x.isin("the", "a")))
      val cTech = size(filter(tk, x => x.isin("spark", "vector")))
      val cDb = size(filter(tk, x => x.isin("data", "table", "row")))
      t(s, dir)("documents")
        .select(
          col("doc_id"),
          cEn.as("c_en"), cTech.as("c_tech"), cDb.as("c_db"),
          when(cEn >= cTech && cEn >= cDb, "en")
            .when(cTech >= cDb, "tech")
            .otherwise("db").as("pred_lang"))
        .orderBy("doc_id")
    },

    // Exact bigram-Jaccard near-dups within a blocking key (source).
    q("x6_ngram_jaccard",
      s"""WITH t AS (SELECT doc_id, source, list_distinct($bigramsSql) AS sh FROM documents),
         |p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |        len(list_intersect(a.sh, b.sh)) AS i,
         |        len(a.sh) AS na, len(b.sh) AS nb
         |      FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id)
         |SELECT id_a, id_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard
         |FROM p WHERE i * 1.0 / (na + nb - i) >= 0.05
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      TextDedup.jaccardNearDups(t(s, dir)("documents"), "doc_id", "text",
          blockCol = "source", threshold = 0.05)
        .orderBy("id_a", "id_b")
    },

    // MinHash(8) + LSH(2 bands × 4) near-dup pipeline, verified ≥ 0.2.
    q("x7_minhash_lsh",
      s"""WITH sig AS (SELECT doc_id,
         |    ${(0 until 8).map(k => s"${mhSql(k)} AS h$k").mkString(", ")}
         |  FROM documents),
         |bb AS (
         |  SELECT doc_id, 0 AS band, CAST(h0 AS VARCHAR) || ':' || h1 || ':' || h2 || ':' || h3 AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, CAST(h4 AS VARCHAR) || ':' || h5 || ':' || h6 || ':' || h7 AS bucket FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |              AND a.doc_id < b.doc_id),
         |t AS (SELECT doc_id, list_distinct($bigramsSql) AS sh FROM documents),
         |j AS (SELECT id_a, id_b,
         |        len(list_intersect(ta.sh, tb.sh)) AS i, len(ta.sh) AS na, len(tb.sh) AS nb
         |      FROM cand JOIN t ta ON ta.doc_id = id_a JOIN t tb ON tb.doc_id = id_b)
         |SELECT id_a, id_b, round(i * 1.0 / (na + nb - i), 6) AS jaccard
         |FROM j WHERE i * 1.0 / (na + nb - i) >= 0.2
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      TextDedup.minHashNearDups(t(s, dir)("documents"), "doc_id", "text",
          numHashes = 8, bands = 2, threshold = 0.2)
        .orderBy("id_a", "id_b")
    },

    // End-to-end dedup clustering: MinHash-LSH near-dup pairs →
    // connected components → canonical doc per cluster. The full
    // "dedup 100 TB of documents" composition: LSH candidates (never
    // O(n²)), verified pairs, then 5 label-propagation supersteps.
    q("x10_dedup_clusters",
      s"""WITH sig AS (SELECT doc_id,
         |    ${(0 until 8).map(k => s"${mhSql(k)} AS h$k").mkString(", ")}
         |  FROM documents),
         |bb AS (
         |  SELECT doc_id, 0 AS band, CAST(h0 AS VARCHAR) || ':' || h1 || ':' || h2 || ':' || h3 AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, CAST(h4 AS VARCHAR) || ':' || h5 || ':' || h6 || ':' || h7 AS bucket FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |              AND a.doc_id < b.doc_id),
         |t AS (SELECT doc_id, list_distinct($bigramsSql) AS sh FROM documents),
         |pairs AS (
         |  SELECT id_a, id_b FROM (
         |    SELECT id_a, id_b,
         |      len(list_intersect(ta.sh, tb.sh)) AS i, len(ta.sh) AS na, len(tb.sh) AS nb
         |    FROM cand JOIN t ta ON ta.doc_id = id_a JOIN t tb ON tb.doc_id = id_b)
         |  WHERE i * 1.0 / (na + nb - i) >= 0.2),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |lbl AS (
         |  -- propagate min labels to CONVERGENCE (not a fixed superstep
         |  -- count): min reachable id = the component's canonical id
         |  WITH RECURSIVE r AS (
         |    SELECT doc_id AS node, doc_id AS label FROM documents
         |    UNION
         |    SELECT e.dst AS node, r.label FROM r JOIN edges e ON e.src = r.node)
         |  SELECT node, min(label) AS label FROM r GROUP BY node)
         |SELECT node AS doc_id, label AS canonical_id,
         |  count(*) OVER (PARTITION BY label) AS cluster_size
         |FROM lbl ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir)("documents")
      val pairs = TextDedup.minHashNearDups(docs, "doc_id", "text",
        numHashes = 8, bands = 2, threshold = 0.2).select("id_a", "id_b")
      val nodes = docs.select(col("doc_id").as("node"))
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      // early-terminating delta iteration: stops as soon as a superstep
      // changes no label — the form that survives deep graphs where a
      // fixed superstep count under-converges.
      graft.operators.GraphOps.labelPropagationDelta(nodes, edges, maxIterations = 50)
        .select(col("node").as("doc_id"), col("label").as("canonical_id"))
        .withColumn("cluster_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("canonical_id")))
        .orderBy("doc_id")
    },

    // Full corpus-selection pipeline: dedup clusters → keep canonical
    // docs only → quality gate → language gate. The composition a
    // training-data pipeline runs end-to-end over 100 TB.
    q("x11_corpus_select",
      s"""WITH sig AS (SELECT doc_id,
         |    ${(0 until 8).map(k => s"${mhSql(k)} AS h$k").mkString(", ")}
         |  FROM documents),
         |bb AS (
         |  SELECT doc_id, 0 AS band, CAST(h0 AS VARCHAR) || ':' || h1 || ':' || h2 || ':' || h3 AS bucket FROM sig
         |  UNION ALL
         |  SELECT doc_id, 1 AS band, CAST(h4 AS VARCHAR) || ':' || h5 || ':' || h6 || ':' || h7 AS bucket FROM sig),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM bb a JOIN bb b ON a.band = b.band AND a.bucket = b.bucket
         |              AND a.doc_id < b.doc_id),
         |t AS (SELECT doc_id, list_distinct($bigramsSql) AS sh FROM documents),
         |dups AS (
         |  SELECT id_b AS doc_id FROM (
         |    SELECT id_a, id_b,
         |      len(list_intersect(ta.sh, tb.sh)) AS i, len(ta.sh) AS na, len(tb.sh) AS nb
         |    FROM cand JOIN t ta ON ta.doc_id = id_a JOIN t tb ON tb.doc_id = id_b)
         |  WHERE i * 1.0 / (na + nb - i) >= 0.2),
         |quality AS (
         |  SELECT doc_id,
         |    round(0.5 * (len(list_distinct($toksSql)) * 1.0 / len($toksSql))
         |        + 0.5 * least(len($toksSql) / 100.0, 1.0), 6) AS q
         |  FROM documents)
         |SELECT d.doc_id, q.q AS quality
         |FROM documents d JOIN quality q ON d.doc_id = q.doc_id
         |WHERE d.doc_id NOT IN (SELECT doc_id FROM dups)
         |  AND q.q >= 0.6
         |  AND d.lang = 'en'
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir)("documents")
      // near-dup pairs: drop the higher doc_id of each verified pair
      val dups = TextDedup.minHashNearDups(docs, "doc_id", "text",
          numHashes = 8, bands = 2, threshold = 0.2)
        .select(col("id_b").as("doc_id")).distinct()
      val tk = tokens(col("text"))
      val quality = docs.select(col("doc_id"),
        round(size(array_distinct(tk)).cast("double") / size(tk) * 0.5 +
          least(size(tk).cast("double") / 100.0, lit(1.0)) * 0.5, 6).as("quality"))
      // gates: declared-language filter, quality floor (0.6 keeps a
      // selective but NON-EMPTY set at every SF — 0.7 is above this
      // corpus's max score and would make the check vacuous), dedup.
      docs.filter(col("lang") === "en")
        .join(dups, Seq("doc_id"), "left_anti")
        .join(quality, "doc_id")
        .filter(col("quality") >= 0.6)
        .select("doc_id", "quality")
        .orderBy("doc_id")
    },

    // Deterministic hash-based train/val split (90/10), stratified
    // report by language — the reproducible-at-any-scale alternative
    // to RNG sampling: membership is a pure function of doc_id, so
    // re-runs, retries, and cluster re-partitioning cannot move a
    // document across the split boundary.
    q("x14_hash_split",
      """WITH s AS (
        |  SELECT lang,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10 < 9
        |         THEN 'train' ELSE 'val' END AS split
        |  FROM documents)
        |SELECT lang, split, count(*) AS n
        |FROM s GROUP BY lang, split
        |ORDER BY lang, split""".stripMargin) { (s, dir) =>
      t(s, dir)("documents")
        .select(col("lang"),
          when(conv(substring(md5(col("doc_id").cast(StringType)
              .cast(BinaryType)), 1, 8), 16, 10)
              .cast(LongType) % 10 < 9, "train")
            .otherwise("val").as("split"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"))
        .orderBy("lang", "split")
    },

    // 32-bit SimHash signature per document.
    q("x8_simhash",
      s"""WITH tok AS (
         |  SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents)),
         |bits AS (
         |  SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS s
         |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
         |  GROUP BY doc_id, b)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      TextDedup.simHash(t(s, dir)("documents"), "doc_id", "text")
        .orderBy("doc_id")
    },

    // SimHash near-dups (hamming ≤ 8) within source blocks.
    q("x9_simhash_neardup",
      s"""WITH tok AS (
         |  SELECT doc_id, CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) AS h
         |  FROM (SELECT doc_id, unnest($toksSql) AS t FROM documents)),
         |bits AS (
         |  SELECT doc_id, b, sum(2 * ((h >> b) & 1) - 1) AS s
         |  FROM tok CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b)
         |  GROUP BY doc_id, b),
         |sig AS (
         |  SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS BIGINT) AS simhash
         |  FROM bits GROUP BY doc_id),
         |blk AS (SELECT d.doc_id, d.source, sig.simhash FROM documents d JOIN sig ON d.doc_id = sig.doc_id)
         |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM blk a JOIN blk b ON a.source = b.source AND a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      TextDedup.simHashNearDups(t(s, dir)("documents"), "doc_id", "text",
          blockCol = "source", maxHamming = 8)
        .orderBy("id_a", "id_b")
    },

    // TF-IDF: top-3 terms per document. tf and df are computed with
    // ONE explode pass (the tf table is persisted and feeds both the
    // document-frequency rollup and the scoring join); the vocabulary
    // join runs shuffled on term — at corpus scale the vocab is far
    // too big to broadcast. Ranking uses the ROUNDED score so the
    // tiebreak (term asc) is decided identically in both engines.
    q("x15_tfidf",
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS term FROM documents),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents),
         |sc AS (SELECT doc_id, tf.term AS term,
         |         round(tf * ln(n * 1.0 / df), 6) AS score
         |       FROM tf JOIN df ON tf.term = df.term, n)
         |SELECT doc_id, term, score FROM (
         |  SELECT *, row_number() OVER (PARTITION BY doc_id
         |    ORDER BY score DESC, term) AS rn FROM sc)
         |WHERE rn <= 3 ORDER BY doc_id, term""".stripMargin) { (s, dir) =>
      val tok = t(s, dir)("documents")
        .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      val tf = tok.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        .persist() // feeds both the df rollup and the scoring join
      val dfT = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val n = t(s, dir)("documents").agg(count(lit(1)).as("n"))
      val sc = tf.join(dfT, "term").crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          round(col("tf") * log(col("n") * 1.0 / col("df")), 6).as("score"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
      sc.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("doc_id", "term", "score")
        .orderBy("doc_id", "term")
    },

    // Heavy hitters: corpus-wide most frequent tokens. Two-phase hash
    // aggregation (map-side partial combine collapses each partition
    // to its local vocabulary before the shuffle), then a global
    // TakeOrdered — never a driver-side collect of the full vocab.
    q("x16_heavy_hitters",
      s"""WITH tok AS (SELECT unnest($toksSql) AS token FROM documents)
         |SELECT token, count(*) AS n FROM tok GROUP BY token
         |ORDER BY n DESC, token LIMIT 20""".stripMargin) { (s, dir) =>
      t(s, dir)("documents")
        .select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    },

    // Stratified sampling: per-language keep-fractions decided by a
    // deterministic content hash — reproducible on any engine and any
    // partitioning, no RNG state. Downsamples the dominant language
    // (en → 20%) while keeping half of everything else — the standard
    // corpus-rebalancing move before training-data mixing.
    q("x17_stratified_sample",
      """WITH s AS (
        |  SELECT doc_id, lang,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS h
        |  FROM documents)
        |SELECT doc_id, lang FROM s
        |WHERE h < (CASE WHEN lang = 'en' THEN 20 ELSE 50 END)
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val h = conv(substring(md5(col("doc_id").cast(StringType)
          .cast(BinaryType)), 1, 8), 16, 10).cast(LongType) % 100
      t(s, dir)("documents")
        .select(col("doc_id"), col("lang"), h.as("h"))
        .filter(col("h") < when(col("lang") === "en", 20).otherwise(50))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // Corpus n-gram language-model scoring (pseudo-perplexity): fit
    // bigram/unigram counts over the WHOLE corpus (two-phase agg —
    // model fitting is itself a distributed aggregation), then score
    // each document by its mean bigram log-probability
    // ln(c(w1,w2)/c(w1)). The low scorers are the incoherent docs —
    // the standard LM-based quality gate of a training-data pipeline.
    q("x19_lm_perplexity",
      s"""WITH tok AS (SELECT doc_id, unnest($toksSql) AS w FROM documents),
         |uni AS (SELECT w, count(*) AS cu FROM tok GROUP BY w),
         |bg AS (SELECT doc_id, unnest($bigramsSql) AS b FROM documents),
         |bgc AS (SELECT b, count(*) AS cb FROM bg GROUP BY b),
         |sc AS (SELECT bg.doc_id, ln(cb * 1.0 / cu) AS lp
         |       FROM bg JOIN bgc ON bg.b = bgc.b
         |       JOIN uni ON uni.w = string_split(bg.b, ' ')[1])
         |SELECT doc_id, count(*) AS n_bigrams, round(avg(lp), 6) AS avg_logp
         |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val docs = t(s, dir)("documents")
      val tok = docs.select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      val uni = tok.groupBy("w").agg(count(lit(1)).as("cu"))
      // materialize _toks in its own projection: inlining tokens()
      // into the shingle transform re-evaluates split() per element_at
      // (the O(tokens²) pitfall the helper's doc warns about; measured
      // 5.0 s → 1.3 s at sf0.1)
      val bg = docs.select(col("doc_id"), tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          explode(bigramShinglesFromTokens(col("_toks"))).as("b"))
        .persist() // feeds model fit AND scoring probe
      val bgc = bg.groupBy("b").agg(count(lit(1)).as("cb"))
      bg.join(bgc, "b")
        .join(uni, split(col("b"), " ").getItem(0) === col("w"))
        .select(col("doc_id"), log(col("cb") * 1.0 / col("cu")).as("lp"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), round(avg(col("lp")), 6).as("avg_logp"))
        .orderBy("doc_id")
    },

    // Text normalization (the canonicalization pass before dedup /
    // fingerprinting): lowercase, strip non-alphanumerics, collapse
    // whitespace — emitted as digest + length stats so the whole
    // normalized string is checked without shipping it.
    q("x18_normalize",
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'),
        |                        ' +', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS norm_digest, length(norm) AS n_chars,
        |  len(string_split(norm, ' ')) AS n_tokens
        |FROM n ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val norm = trim(regexp_replace(
        regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "), " +", " "))
      t(s, dir)("documents")
        .select(col("doc_id"), norm.as("norm"))
        .select(col("doc_id"),
          md5(col("norm").cast(BinaryType)).as("norm_digest"),
          length(col("norm")).as("n_chars"),
          size(split(col("norm"), " ")).as("n_tokens"))
        .orderBy("doc_id")
    },

    // Per-source document cap (the per-domain cap of web-scale corpus
    // curation: no single domain may dominate the training mix). Keep
    // the k largest docs per source — rank ≤ k plans WindowGroupLimit,
    // so each partition pre-limits BEFORE the shuffle: the full corpus
    // is never globally sorted at any scale.
    q("x20_source_cap",
      """WITH r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents)
        |SELECT source, doc_id, rn FROM r WHERE rn <= 15
        |ORDER BY source, doc_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
      t(s, dir)("documents")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 15)
        .select("source", "doc_id", "rn")
        .orderBy("source", "doc_id")
    },

    // Benchmark decontamination screen (the published-LM-pipeline
    // n-gram overlap check): docs sharing any word 5-gram with the
    // held-out set (here: doc_id % 20 = 0) are flagged with their
    // shared-shingle count. Shape at scale: per-doc DISTINCT shingles
    // explode → equi-join against the (much smaller, aggregated)
    // benchmark shingle set → count per doc. One shuffle on the
    // shingle key, never doc×doc.
    q("x21_decontaminate",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(list_distinct(
        |    list_transform(generate_series(1, len(t) - 4),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' || t[i+4]))) AS s
        |  FROM toks),
        |bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0)
        |SELECT sh.doc_id, count(*) AS n_shared
        |FROM sh JOIN bench USING (s)
        |WHERE sh.doc_id % 20 <> 0
        |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin) { (s, dir) =>
      val sh = t(s, dir)("documents")
        .select(col("doc_id"), tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          explode(array_distinct(nGramShinglesFromTokens(col("_toks"), 5))).as("s"))
      val bench = sh.filter(col("doc_id") % 20 === 0).select("s").distinct()
      sh.filter(col("doc_id") % 20 =!= 0)
        .join(bench, "s")
        .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    },

    // Repetition filter (Gopher-style quality gate): fraction of
    // repeated word bigrams per document; high-repetition docs are
    // boilerplate/spam candidates. Map-only column expressions —
    // no shuffle at all until the final presentation sort.
    q("x22_repetition_filter",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |b AS (SELECT doc_id,
        |    list_transform(generate_series(1, len(t) - 1),
        |      i -> t[i] || ' ' || t[i+1]) AS bi
        |  FROM toks),
        |r AS (SELECT doc_id,
        |    round(1.0 - len(list_distinct(bi)) * 1.0 / len(bi), 6) AS dup_ratio
        |  FROM b WHERE len(bi) > 0)
        |SELECT doc_id, dup_ratio,
        |  CASE WHEN dup_ratio <= 0.05 THEN 'kept' ELSE 'filtered' END AS status
        |FROM r ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // filter on TOKEN count, not on size(_bi): a size(_bi)>0 filter
      // gets pushed below the projections and the pushdown substitutes
      // the whole bigram expression with split() re-inlined per
      // element_at — recomputing the shingle array per row just to
      // test emptiness (measured 4.8 s → 1.3 s at sf0.1). size(_toks)
      // >= 2 is the same predicate and pushes down as a cheap O(n)
      // split+size.
      val bi = bigramShinglesFromTokens(col("_toks"))
      t(s, dir)("documents")
        .select(col("doc_id"), tokens(col("text")).as("_toks"))
        .filter(size(col("_toks")) >= 2)
        .select(col("doc_id"), bi.as("_bi"))
        .select(col("doc_id"),
          round(lit(1.0) - size(array_distinct(col("_bi"))).cast(DoubleType) /
            size(col("_bi")), 6).as("dup_ratio"))
        .withColumn("status",
          when(col("dup_ratio") <= 0.05, "kept").otherwise("filtered"))
        .orderBy("doc_id")
    },

    // PII scrubbing (training-data hygiene pass): regex-redact emails
    // and phone numbers, count what was removed. The synthetic corpus
    // carries no PII, so both engines append a deterministic
    // PII-bearing suffix derived from doc_id first — the redaction
    // pipeline (chained regexp_replace + regexp counts, map-only,
    // codegen'd, zero shuffles before the presentation sort) is the
    // operator under test and is exactly what runs at 100 TB.
    q("x23_pii_redact",
      """WITH p AS (SELECT doc_id,
        |    text || ' contact user' || doc_id || '@example.com or +1-555-' ||
        |      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
        |  FROM documents)
        |SELECT doc_id,
        |  len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
        |  len(regexp_extract_all(t, '\+1-555-[0-9]{4}')) AS n_phones,
        |  regexp_replace(regexp_replace(t,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+1-555-[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM p ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phoneRe = "\\+1-555-[0-9]{4}"
      t(s, dir)("documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com or +1-555-"),
            lpad((col("doc_id") % 10000).cast("string"), 4, "0")).as("t"))
        .select(col("doc_id"),
          regexp_count(col("t"), lit(emailRe)).cast("long").as("n_emails"),
          regexp_count(col("t"), lit(phoneRe)).cast("long").as("n_phones"),
          regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("redacted"))
        .orderBy("doc_id")
    },

    // Sequence packing (GPT-style training-example assembly): docs are
    // concatenated per source shard in doc_id order and the token
    // stream is cut every 512 tokens, document boundaries crossed —
    // each doc is assigned to the sequence where it STARTS. Shape at
    // scale: one shuffle on the shard key, a running sum inside each
    // shard, one groupBy — packing 100 TB is embarrassingly parallel
    // across shards because sequences never span a shard boundary.
    q("x24_sequence_packing",
      """WITH toks AS (SELECT source, doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok
        |  FROM documents),
        |c AS (SELECT source, doc_id, n_tok,
        |    coalesce(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
        |  FROM toks)
        |SELECT source, CAST(cum_before // 512 AS BIGINT) AS seq_id,
        |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY source, seq_id
        |ORDER BY source, seq_id""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy("doc_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      t(s, dir)("documents")
        .select(col("source"), col("doc_id"),
          size(tokens(col("text"))).cast("long").as("n_tok"))
        .withColumn("cum_before", coalesce(sum("n_tok").over(w), lit(0L)))
        .groupBy(col("source"), floor(col("cum_before") / 512).as("seq_id"))
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("source", "seq_id")
    },

    // Cross-document repeated-span detection (the exact-substring
    // dedup screen of Lee et al., "Deduplicating Training Data Makes
    // Language Models Better"): every 8-token span occurrence (with
    // multiplicity — positions matter) is checked against the corpus;
    // spans appearing in ≥2 distinct docs are flagged and each doc
    // reports its duplicated-span fraction. Shape at scale: explode →
    // one shuffle on the span key (two-phase distinct-doc count
    // absorbs boilerplate hot spans) → equi-join back — never doc×doc.
    q("x25_span_dedup",
      """WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
        |  FROM documents),
        |sh AS (SELECT doc_id, unnest(
        |    list_transform(generate_series(1, len(t) - 7),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS s
        |  FROM toks),
        |g AS (SELECT s, count(DISTINCT doc_id) AS nd FROM sh GROUP BY s),
        |per AS (
        |  SELECT sh.doc_id, count(*) AS n_spans,
        |    sum(CASE WHEN g.nd >= 2 THEN 1 ELSE 0 END) AS n_dup
        |  FROM sh JOIN g USING (s) GROUP BY sh.doc_id)
        |SELECT doc_id, n_spans, CAST(n_dup AS BIGINT) AS n_dup,
        |  round(n_dup * 1.0 / n_spans, 6) AS dup_frac
        |FROM per ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // pre-aggregate to distinct (doc, span) pairs carrying the
      // within-doc multiplicity: the span⋈span-stats join then moves
      // distinct pairs instead of raw occurrences, and the docs-per-
      // span count becomes a plain two-phase count (no distinct agg)
      // — the form that absorbs boilerplate hot spans at 100 TB.
      val occ = t(s, dir)("documents")
        .select(col("doc_id"), tokens(col("text")).as("_toks"))
        .select(col("doc_id"),
          explode(nGramShinglesFromTokens(col("_toks"), 8)).as("s"))
        .groupBy("doc_id", "s").agg(count(lit(1)).as("cnt"))
      val g = occ.groupBy("s").agg(count(lit(1)).as("nd"))
      occ.join(g, "s")
        .groupBy("doc_id")
        .agg(sum("cnt").as("n_spans"),
          sum(when(col("nd") >= 2, col("cnt")).otherwise(0L)).as("n_dup"))
        .select(col("doc_id"), col("n_spans"), col("n_dup"),
          round(col("n_dup") * 1.0 / col("n_spans"), 6).as("dup_frac"))
        .orderBy("doc_id")
    },

    // Temperature-weighted mixture sampling (the multilingual-corpus
    // rebalancing step: post-sample share ∝ n^α, α=0.5): per-source
    // keep-rate = sqrt(min_n / n_src) — computed from the source's own
    // count and the global min ONLY (one division + one sqrt, no
    // cross-source summation, so the double is bit-identical in any
    // partial-agg order), materialized as an integer hash threshold.
    // Docs kept by deterministic md5(doc_id) < rate — the same
    // RNG-free sampling contract as x14/x17. Shape at 100 TB: tiny
    // per-source agg broadcast back, then a map-only filter.
    q("x26_mixture_sample",
      """WITH n AS (SELECT source, count(*) AS n_src FROM documents GROUP BY source),
        |mn AS (SELECT min(n_src) AS min_n FROM n),
        |r AS (SELECT source, n_src,
        |        CAST(floor(sqrt(CAST(min_n AS DOUBLE) / n_src) * 1000000) AS BIGINT) AS thr
        |      FROM n, mn),
        |kept AS (
        |  SELECT d.source,
        |    CASE WHEN CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
        |           % 1000000 < r.thr THEN 1 ELSE 0 END AS k
        |  FROM documents d JOIN r USING (source))
        |SELECT kept.source, count(*) AS n_total,
        |  CAST(sum(k) AS BIGINT) AS n_sampled,
        |  min(r.thr) AS thr
        |FROM kept JOIN r ON r.source = kept.source
        |GROUP BY kept.source ORDER BY kept.source""".stripMargin) { (s, dir) =>
      val d = t(s, dir)("documents")
      val n = d.groupBy("source").agg(count(lit(1)).as("n_src"))
      val mn = n.agg(min("n_src").as("min_n"))
      val r = n.crossJoin(broadcast(mn))
        .select(col("source"), col("n_src"),
          floor(sqrt(col("min_n").cast(DoubleType) / col("n_src")) * 1000000)
            .cast(LongType).as("thr"))
      val h = conv(substring(md5(col("doc_id").cast(StringType)
          .cast(BinaryType)), 1, 8), 16, 10).cast(LongType) % 1000000
      d.join(broadcast(r), "source")
        .select(col("source"), col("thr"),
          when(h < col("thr"), 1L).otherwise(0L).as("k"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"), sum("k").as("n_sampled"),
          min("thr").as("thr"))
        .orderBy("source")
    },

    // Token-budget corpus selection WITHOUT a global sort (the "take
    // the best docs until B tokens" step): per-doc integer quality bin
    // (type-token ratio ×1000 — lexical diversity, the repetitive-junk
    // signal; one FP division, deterministic),
    // 1000-bin histogram of token counts (two-phase integer agg),
    // cumulative tokens from the top bin down over the ≤1000-row
    // histogram, threshold = lowest bin that still fits the budget
    // wholly (bin granularity documented: the partially-fitting bin is
    // dropped), broadcast back as one scalar → map-only final filter.
    // The 100 TB posture is the point: a naive ORDER BY quality global
    // sort of the corpus is replaced by a histogram no bigger than
    // 1000 rows regardless of corpus size. Budget = 2/5 of total
    // tokens, exact integer arithmetic.
    q("x27_token_budget",
      """WITH q AS (
        |  SELECT doc_id,
        |    len(string_split_regex(trim(text), '\s+')) AS n_tok,
        |    CAST(floor(1000.0 *
        |      len(list_distinct(string_split_regex(trim(text), '\s+')))
        |      / greatest(len(string_split_regex(trim(text), '\s+')), 1)) AS BIGINT) AS qbin
        |  FROM documents),
        |hist AS (SELECT qbin, sum(n_tok) AS toks FROM q GROUP BY qbin),
        |cum AS (SELECT qbin, sum(toks) OVER (ORDER BY qbin DESC) AS cum_toks FROM hist),
        |budget AS (SELECT CAST(floor(sum(n_tok) * 2 / 5) AS BIGINT) AS b FROM q),
        |thr AS (SELECT min(qbin) AS tbin FROM cum, budget WHERE cum_toks <= b)
        |SELECT doc_id, qbin, n_tok FROM q, thr WHERE qbin >= tbin
        |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = t(s, dir)("documents")
        .select(col("doc_id"), tokens(col("text")).as("_toks"))
      val qd = d.select(col("doc_id"), size(col("_toks")).as("n_tok"),
        floor(lit(1000.0) * size(array_distinct(col("_toks")))
            / greatest(size(col("_toks")), lit(1)))
          .cast(LongType).as("qbin"))
      val hist = qd.groupBy("qbin").agg(sum("n_tok").as("toks"))
      val cum = hist.select(col("qbin"), sum("toks").over(
        org.apache.spark.sql.expressions.Window.orderBy(col("qbin").desc)
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
        .as("cum_toks"))
      val budget = qd.agg(floor(sum("n_tok") * 2 / 5).cast(LongType).as("b"))
      val thr = cum.crossJoin(broadcast(budget))
        .filter(col("cum_toks") <= col("b"))
        .agg(min("qbin").as("tbin"))
      qd.crossJoin(broadcast(thr))
        .filter(col("qbin") >= col("tbin"))
        .select("doc_id", "qbin", "n_tok")
        .orderBy("doc_id")
    },

    // Model-based quality filtering (the fastText/logreg quality
    // classifier every large corpus pipeline runs — e.g. the CCNet /
    // GPT-3 "quality classifier" gate): per-document features →
    // sigmoid(w·x + b) → keep above threshold. The weight vector is a
    // broadcast-scale constant (a trained model's coefficients would
    // arrive the same way); scoring is a map-only codegen'd
    // projection — zero shuffles, cost ∝ corpus scan, embarrassingly
    // parallel at any executor count.
    q("x28_classifier_filter",
      s"""SELECT doc_id, round(score, 6) AS score FROM (
         |  SELECT doc_id,
         |    1.0 / (1.0 + exp(-(
         |      2.5 * (len(list_filter($toksSql, x -> x IN ('the', 'a'))) * 1.0 / len($toksSql))
         |      - 3.0 * (length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0 / length(text))
         |      + 0.4 * ln(1.0 + length(text)) - 2.0))) AS score
         |  FROM documents) t
         |WHERE score >= 0.5 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val tk = tokens(col("text"))
      val stopRatio =
        size(filter(tk, x => x.isin("the", "a"))).cast(DoubleType) / size(tk)
      val digitRatio =
        length(regexp_replace(col("text"), "[^0-9]", "")).cast(DoubleType) /
          length(col("text"))
      val z = lit(2.5) * stopRatio - lit(3.0) * digitRatio +
        lit(0.4) * log(lit(1.0) + length(col("text"))) - lit(2.0)
      val score = lit(1.0) / (lit(1.0) + exp(-z))
      t(s, dir)("documents")
        .select(col("doc_id"), score.as("score"))
        .filter(col("score") >= 0.5)
        .select(col("doc_id"), round(col("score"), 6).as("score"))
        .orderBy("doc_id")
    },

    // Context-window chunking with overlap (long documents → training
    // sequences of C tokens, stride S < C so consecutive chunks share
    // C−S tokens — the fixed-context chunking step between tokenization
    // and batching). Chunk k covers tokens [kS, kS+C); every token
    // position starts < n begins a chunk. Map-only fan-out of ~n/S
    // rows per document — no shuffle, no state; the explode stays
    // inside the scan's partition.
    q("x29_chunk_overlap",
      s"""SELECT doc_id, k AS chunk_id,
         |  len($toksSql[k * 48 + 1 : k * 48 + 64]) AS n_tok,
         |  $toksSql[k * 48 + 1] AS first_tok
         |FROM documents,
         |  unnest(generate_series(0, (len($toksSql) - 1) // 48)) AS u(k)
         |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
      val C = 64
      val S = 48
      t(s, dir)("documents")
        .select(col("doc_id"), tokens(col("text")).as("_toks"))
        .select(col("doc_id"), col("_toks"),
          posexplode(sequence(lit(0), floor((size(col("_toks")) - 1) / S)))
            .as(Seq("k", "_drop")))
        .select(
          col("doc_id"),
          col("k").as("chunk_id"),
          size(slice(col("_toks"), col("k") * S + 1, lit(C))).as("n_tok"),
          element_at(col("_toks"), (col("k") * S + 1).cast(IntegerType))
            .as("first_tok"))
        .orderBy("doc_id", "chunk_id")
    },

    // DSIR-style importance resampling (Xie et al. 2023, "Data
    // Selection for Language Models via Importance Resampling"):
    // hashed-unigram bag-of-words models for the TARGET distribution
    // (here lang='en') and the RAW corpus, Laplace-smoothed; each
    // document's importance weight is Σ_f n_f·log(p_f/q_f) over its
    // hashed-token counts, and the top-64 by weight are kept.
    // Scale shape: one token-explode pass feeding per-doc and global
    // bucket counts (256 buckets — a BROADCAST model table), weight =
    // one doc-keyed aggregate over a broadcast join, selection =
    // TakeOrderedAndProject(64) + broadcast membership flag — no
    // global sort, no all-docs window. The per-bucket log-ratio is
    // rounded to 9dp before the exact DECIMAL accumulation so the
    // weight is partial-agg-order-independent and engine-stable.
    q("x30_dsir_importance",
      s"""WITH tb AS (
         |  SELECT doc_id, lang,
         |    CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % 256 AS f
         |  FROM (SELECT doc_id, lang, unnest($toksSql) AS t FROM documents)),
         |dfc AS (SELECT doc_id, f, count(*) AS n FROM tb GROUP BY doc_id, f),
         |tgt AS (SELECT f, count(*) AS ct FROM tb WHERE lang = 'en' GROUP BY f),
         |alle AS (SELECT f, count(*) AS ca FROM tb GROUP BY f),
         |tots AS (SELECT CAST(count(*) AS BIGINT) AS ta,
         |    CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS tt FROM tb),
         |lr AS (SELECT alle.f,
         |    round(ln((coalesce(ct, 0) + 1.0) * (ta + 256)
         |           / ((ca + 1.0) * (tt + 256))), 9) AS r
         |  FROM alle LEFT JOIN tgt ON tgt.f = alle.f CROSS JOIN tots),
         |w AS (SELECT dfc.doc_id, CAST(sum(dfc.n) AS BIGINT) AS n_tok,
         |    round(sum(CAST(dfc.n * lr.r AS DECIMAL(28, 12))), 6) AS dsir_weight
         |  FROM dfc JOIN lr ON lr.f = dfc.f GROUP BY dfc.doc_id)
         |SELECT doc_id, n_tok, dsir_weight,
         |  CAST(row_number() OVER (ORDER BY dsir_weight DESC, doc_id) <= 64
         |    AS INT) AS keep
         |FROM w ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val tb = t(s, dir)("documents")
        .select(col("doc_id"), col("lang"),
          explode(tokens(col("text"))).as("t"))
        .select(col("doc_id"), col("lang"),
          (conv(substring(md5(col("t").cast(BinaryType)), 1, 8), 16, 10)
            .cast(LongType) % 256).as("f"))
        .persist() // feeds per-doc counts, both models, and the totals
      val dfc = tb.groupBy("doc_id", "f").agg(count(lit(1)).as("n"))
      val tgt = tb.filter(col("lang") === "en")
        .groupBy("f").agg(count(lit(1)).as("ct"))
      val alle = tb.groupBy("f").agg(count(lit(1)).as("ca"))
      val tots = tb.agg(count(lit(1)).as("ta"),
        count(when(col("lang") === "en", 1)).as("tt"))
      val lr = alle.join(tgt, Seq("f"), "left")
        .crossJoin(broadcast(tots)) // 1-row scalar table
        .select(col("f"), round(log(
          (coalesce(col("ct"), lit(0L)) + 1.0) * (col("ta") + 256) /
            ((col("ca") + 1.0) * (col("tt") + 256))), 9).as("r"))
      val w = dfc.join(broadcast(lr), Seq("f"))
        .groupBy("doc_id")
        .agg(sum(col("n")).as("n_tok"),
          round(sum((col("n") * col("r")).cast(DecimalType(28, 12))), 6)
            .as("dsir_weight"))
      val top = w.orderBy(col("dsir_weight").desc, col("doc_id")).limit(64)
        .select(col("doc_id").as("_kid"))
      w.join(broadcast(top), w("doc_id") === top("_kid"), "left")
        .select(col("doc_id"), col("n_tok"), col("dsir_weight"),
          when(col("_kid").isNotNull, 1).otherwise(0).as("keep"))
        .orderBy("doc_id")
    },

    // Cross-corpus segment REMOVAL with reassembly (r10 — the
    // C4/Dolma "dedup at sub-document granularity" TRANSFORM; x25
    // only SCORES duplication): each doc splits into non-overlapping
    // 10-token segments, a segment text's single global keeper is its
    // first occurrence (min (doc_id, pos)), every other occurrence —
    // cross-doc AND within-doc — is cut, and the survivors reassemble
    // in position order into the cleaned text. Shape at 100 TB: one
    // shuffle on segment hash for the two-phase min-rank (hot
    // boilerplate segments absorb into map-side partials), the
    // keeper join reuses that key, reassembly shuffles by doc_id;
    // no corpus-wide window, no doc×doc comparison.
    q("x31_segment_dedup",
      s"""WITH toks AS (SELECT doc_id, $toksSql AS t FROM documents),
         |segs AS (
         |  SELECT doc_id, k AS pos,
         |    array_to_string(t[(k*10+1):(k*10+10)], ' ') AS seg
         |  FROM toks,
         |    unnest(generate_series(0,
         |      CAST(ceil(len(t) / 10.0) AS BIGINT) - 1)) AS u(k)),
         |g AS (SELECT seg, min(doc_id * 100000 + pos) AS first_rank
         |      FROM segs GROUP BY seg),
         |kept AS (SELECT s.doc_id, s.pos, s.seg
         |  FROM segs s JOIN g USING (seg)
         |  WHERE s.doc_id * 100000 + s.pos = g.first_rank),
         |per AS (SELECT doc_id, count(*) AS n_segs FROM segs GROUP BY doc_id)
         |SELECT per.doc_id, per.n_segs,
         |  coalesce(k.n_kept, 0) AS n_kept, k.clean_text
         |FROM per LEFT JOIN (
         |  SELECT doc_id, count(*) AS n_kept,
         |    string_agg(seg, ' ' ORDER BY pos) AS clean_text
         |  FROM kept GROUP BY doc_id) k USING (doc_id)
         |ORDER BY per.doc_id""".stripMargin) { (s, dir) =>
      val segs = t(s, dir)("documents")
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .select(col("doc_id"),
          explode(sequence(lit(0L),
            ceil(size(col("t")) / 10.0).cast(LongType) - 1)).as("pos"),
          col("t"))
        .select(col("doc_id"), col("pos"),
          array_join(slice(col("t"), (col("pos") * 10 + 1).cast("int"), lit(10)),
            " ").as("seg"))
        .persist() // feeds the keeper min, the join, and per-doc counts
      // two-phase global first-occurrence per segment text
      val g = segs.groupBy("seg")
        .agg(min(col("doc_id") * 100000 + col("pos")).as("first_rank"))
      val kept = segs.join(g, "seg")
        .filter(col("doc_id") * 100000 + col("pos") === col("first_rank"))
      val reassembled = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(
            array_sort(collect_list(struct(col("pos"), col("seg")))),
            x => x.getField("seg")), " ").as("clean_text"))
      segs.groupBy("doc_id").agg(count(lit(1)).as("n_segs"))
        .join(reassembled, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_segs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"), col("clean_text"))
        .orderBy("doc_id")
    })
}
