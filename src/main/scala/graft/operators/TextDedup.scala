package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document deduplication for training-data pipelines: exact,
  * MinHash+LSH banding, SimHash, and n-gram Jaccard verification.
  *
  * Scale design (100 TB posture):
  *  - exact dedup = hash-groupBy on a 16-byte digest, one shuffle;
  *  - MinHash-LSH: per-doc signatures are computed with map-side
  *    aggregation (groupBy doc_id over exploded shingles), candidate
  *    generation is a self-join on band buckets only (never all
  *    pairs), and verification runs per candidate pair — the textbook
  *    shingle→minhash→band→bucket-join pipeline;
  *  - SimHash: 32-bit signatures, near-dup = hamming ≤ k within
  *    blocking buckets (here: same source) — avoids O(n²) global.
  */
object TextDedup {

  /** Exact dedup: canonical doc (min id) per distinct text digest. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol).cast(BinaryType)).as("digest"))
      .agg(
        min(col(idCol)).as("canonical_id"),
        count(lit(1)).as("n_copies"))

  /** Per-doc MinHash signature columns h0..h{n-1} over bigram shingles.
    *
    * Shape: explode distinct shingles → flat projection of the k seed
    * hashes → ONE groupBy(doc) with k min() aggregates. Map-side
    * partial aggregation collapses each partition to one row per doc
    * before the shuffle — the form that survives a 100× scale-up
    * (vs. per-row nested array transforms, which also defeat reuse
    * under self-joins).
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int): DataFrame = {
    val sh = docs
      .select(col(idCol).as("_id"), tokens(col(textCol)).as("_toks"))
      .select(col("_id"),
        explode(array_distinct(bigramShinglesFromTokens(col("_toks")))).as("_sh"))
    val aggs = (0 until numHashes).map(k =>
      min(md5(concat(lit(s"$k:"), col("_sh")).cast(BinaryType))).as(s"h$k"))
    sh.groupBy("_id").agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("_id", idCol)
  }

  /** LSH band buckets: rows (id, band, bucket). bands × rowsPerBand
    * must equal the signature width. */
  def lshBuckets(sigs: DataFrame, idCol: String, bands: Int,
                 rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => col(s"h${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(hs: _*).cast(BinaryType)).as("bucket"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Candidate pairs (a < b) sharing at least one LSH bucket. */
  def candidatePairs(buckets: DataFrame, idCol: String): DataFrame = {
    val l = buckets.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val r = buckets.select(col("band").as("band_r"), col("bucket").as("bucket_r"),
      col(idCol).as("id_b"))
    l.join(r, col("band") === col("band_r") && col("bucket") === col("bucket_r") &&
        col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact bigram-shingle Jaccard for given pairs. Shingle sets are
    * persisted: they are probed three times (both pair sides + sizes)
    * and recomputing the tokenization per probe dominates otherwise. */
  def jaccard(pairs: DataFrame, docs: DataFrame, idCol: String,
              textCol: String): DataFrame = {
    val sh = docs
      .select(col(idCol).as("_id"), tokens(col(textCol)).as("_toks"))
      .select(col("_id"),
        explode(array_distinct(bigramShinglesFromTokens(col("_toks")))).as("_sh"))
      .persist()
    sh.count() // materialize before the multi-probe joins below
    val sizes = sh.groupBy("_id").agg(count(lit(1)).as("_n"))
    // Composite equi-join on (id_b, shingle) — keeps the probe linear
    // in |pairs|·|shingles per doc|; joining on id_b alone and
    // filtering afterwards would be quadratic in shingle count.
    val inter = pairs
      .join(sh.select(col("_id").as("id_a"), col("_sh")), "id_a")
      .join(sh.select(col("_id").as("id_b"), col("_sh")), Seq("id_b", "_sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("_inter"))
    pairs
      .join(inter, Seq("id_a", "id_b"), "left")
      .na.fill(0L, Seq("_inter"))
      .join(sizes.select(col("_id").as("id_a"), col("_n").as("_na")), "id_a")
      .join(sizes.select(col("_id").as("id_b"), col("_n").as("_nb")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(col("_inter").cast(DoubleType) /
          (col("_na") + col("_nb") - col("_inter")), 6).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline: candidates → verified pairs
    * with Jaccard ≥ threshold. */
  def minHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      numHashes: Int, bands: Int,
                      threshold: Double): DataFrame = {
    // persist: the bucket table is self-joined (both sides would
    // otherwise recompute the whole signature pipeline).
    val buckets = lshBuckets(minHashSignatures(docs, idCol, textCol, numHashes),
      idCol, bands, numHashes / bands).persist()
    buckets.count() // materialize once; self-join probes the cache
    val pairs = candidatePairs(buckets, idCol)
    jaccard(pairs, docs, idCol, textCol).filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash per doc over whitespace tokens (with multiplicity):
    * bit i of the signature is the sign of Σ_tokens (2·bit_i(h32)−1). */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_tok"))
      .select(col("_id"), hash32(col("_tok")).as("_h"))
      .select(col("_id"), col("_h"), explode(sequence(lit(0), lit(31))).as("_bit"))
      .groupBy("_id", "_bit")
      .agg(sum(expr("2 * ((_h >> _bit) & 1) - 1")).as("_s"))
      .select(col("_id"), col("_bit"),
        when(col("_s") > 0, 1L).otherwise(0L).as("_sgn"))
      .groupBy("_id")
      .agg(sum(expr("shiftleft(_sgn, CAST(_bit AS INT))")).as("simhash"))
      .select(col("_id").as(idCol), col("simhash"))

  /** SimHash near-dup pairs within a blocking column (hamming ≤ k). */
  def simHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      blockCol: String, maxHamming: Int): DataFrame = {
    val sigs = simHash(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(blockCol)), idCol)
    val a = sigs.select(col(blockCol).as("_blk"), col(idCol).as("id_a"),
      col("simhash").as("sh_a"))
    val b = sigs.select(col(blockCol).as("_blk_b"), col(idCol).as("id_b"),
      col("simhash").as("sh_b"))
    a.join(b, col("_blk") === col("_blk_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(expr("sh_a ^ sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
