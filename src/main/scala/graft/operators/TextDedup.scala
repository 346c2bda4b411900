package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
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

  /** Largest 32-bit prime — modulus of the per-permutation LCG mix. */
  val MinHashP = 4294967291L

  /** MinHash permutation k applied to a 32-bit base hash: the
    * classical (a·h + b) mod p universal-hash family, with (a, b)
    * derived deterministically from k so any engine reproduces them. */
  def minHashMix(h: Column, k: Int): Column =
    pmod(h * (2L * k + 1) + (k.toLong * 2654435761L) % MinHashP, lit(MinHashP))

  /** Per-doc MinHash signature columns h0..h{n-1} over bigram shingles.
    *
    * Shape: explode distinct shingles → one digest per shingle →
    * ONE groupBy(doc) with k min(mix_k) aggregates. Map-side partial
    * aggregation collapses each partition to one row per doc before
    * the shuffle — the form that survives a 100× scale-up (vs.
    * per-row nested array transforms, which also defeat reuse under
    * self-joins).
    */
  def minHashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        numHashes: Int): DataFrame =
    signaturesFromShingles(shingleTable(docs, idCol, textCol), idCol, numHashes)

  /** Signatures from an (optionally already persisted) shingle table —
    * lets one tokenize+explode pass feed both the signature and the
    * exact-verification phases of the near-dup pipeline. */
  def signaturesFromShingles(sh: DataFrame, idCol: String,
                             numHashes: Int): DataFrame = {
    // ONE digest per shingle, then numHashes cheap integer mixes — not
    // numHashes digests: md5 dominates the signature cost otherwise.
    val base = sh.select(col("_id"), hash32(col("_sh")).as("_h"))
    val aggs = (0 until numHashes).map(k =>
      min(minHashMix(col("_h"), k)).as(s"h$k"))
    base.groupBy("_id").agg(aggs.head, aggs.tail: _*)
      .withColumnRenamed("_id", idCol)
  }

  /** LSH band buckets: rows (id, band, bucket). bands × rowsPerBand
    * must equal the signature width. The bucket key is the plain
    * ':'-joined band slice — it is already a join key; hashing it
    * again would only burn cycles. */
  def lshBuckets(sigs: DataFrame, idCol: String, bands: Int,
                 rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand)
        .map(r => col(s"h${b * rowsPerBand + r}").cast(StringType))
      struct(lit(b).as("band"), concat_ws(":", hs: _*).as("bucket"))
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
    val sh = shingleTable(docs, idCol, textCol).persist()
    sh.count() // materialize before the multi-probe joins below
    jaccardOnShingles(pairs, sh)
  }

  /** (doc, distinct bigram shingle) posting table. */
  def shingleTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("_id"), tokens(col(textCol)).as("_toks"))
      .select(col("_id"),
        explode(array_distinct(bigramShinglesFromTokens(col("_toks")))).as("_sh"))

  /** [[shingleTable]] plus the per-doc set size `_n` on every posting
    * row. `size()` of the distinct array before the explode is free —
    * no shuffle, no window — and consumers that carry it through their
    * joins skip the whole "aggregate sizes, join them back onto the
    * pair table" phase (r15, guide §2.3/§2.4). `explode` drops
    * empty-set docs in both formulations, so row sets are identical. */
  def shingleSizedTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol).as("_id"), tokens(col(textCol)).as("_toks"))
      .select(col("_id"),
        array_distinct(bigramShinglesFromTokens(col("_toks"))).as("_arr"))
      .select(col("_id"), size(col("_arr")).cast(LongType).as("_n"),
        explode(col("_arr")).as("_sh"))

  /** Exact Jaccard for given pairs over an (already materialized)
    * shingle table — probed three times (both pair sides + sizes). */
  def jaccardOnShingles(pairs: DataFrame, sh: DataFrame): DataFrame = {
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
    // ONE persisted shingle table feeds both signatures and the exact
    // verification (tokenize+explode is the pipeline's widest scan —
    // doing it twice doubled the dominant cost).
    val sh = shingleSizedTable(docs, idCol, textCol).persist()
    sh.count() // materialize before the multi-consumer fan-out
    // persist: the bucket table is self-joined (both sides would
    // otherwise recompute the whole signature pipeline).
    val buckets = lshBuckets(signaturesFromShingles(sh, idCol, numHashes),
      idCol, bands, numHashes / bands).persist()
    buckets.count() // materialize once; self-join probes the cache
    val pairs = candidatePairs(buckets, idCol)
    // positive threshold → the size-carrying verify (no sizes agg, no
    // size joins, no pair-preserving left join); threshold ≤ 0 keeps
    // zero-intersection pairs and needs the general path.
    if (threshold > 0) jaccardVerify(pairs, sh).filter(col("jaccard") >= threshold)
    else jaccardOnShingles(pairs, sh.select("_id", "_sh"))
      .filter(col("jaccard") >= threshold)
  }

  /** 32-bit SimHash per doc over whitespace tokens (with multiplicity):
    * bit i of the signature is the sign of Σ_tokens (2·bit_i(h32)−1).
    *
    * r15 reshape (guide §2.3/§2.4): the previous form exploded every
    * token row 32× (one row per bit) and aggregated twice — shuffling
    * 32·|tokens| rows, then |docs|·32 rows again. All 32 bit-sums are
    * independent aggregates of the SAME token row, so ONE
    * groupBy(doc) with 32 conditional sums computes them in a single
    * shuffle of |docs| rows with 32 long buffers. Integer sums group
    * order-free, so the signature is bit-identical. */
  def simHash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val bitSums = (0 until 32).map(b =>
      sum(expr(s"2 * ((_h >> $b) & 1) - 1")).as(s"_s$b"))
    val sig = (0 until 32).map(b =>
      when(col(s"_s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)
    docs.select(col(idCol).as("_id"), explode(tokens(col(textCol))).as("_tok"))
      .select(col("_id"), hash32(col("_tok")).as("_h"))
      .groupBy("_id")
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("_id").as(idCol), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within a blocking column (hamming ≤ k).
    *
    * Hamming-LSH candidate generation: the 32-bit signature is split
    * into (k+1) chunks; by pigeonhole, two signatures within hamming k
    * agree EXACTLY on at least one chunk, so an equi-join on
    * (block, chunk_id, chunk_value) is an exact candidate generator —
    * no all-pairs join anywhere in the plan, and false positives are
    * removed by the bit_count verify. Pruning power grows with chunk
    * width: at production settings (64-bit signatures, hamming ≤ 3,
    * 16-bit chunks) each band prunes by ~2^16; here 32/(k+1)-bit
    * chunks keep the same exactness guarantee at toy scale.
    */
  def simHashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      blockCol: String, maxHamming: Int): DataFrame = {
    val sigs = simHash(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(blockCol)), idCol)
    val nChunks = maxHamming + 1
    val base = 32 / nChunks
    val extra = 32 % nChunks
    val widths = (0 until nChunks).map(i => base + (if (i < extra) 1 else 0))
    val offsets = widths.scanLeft(0)(_ + _)
    val chunkCols = (0 until nChunks).map { i =>
      struct(lit(i).as("ck"),
        expr(s"(simhash >> ${offsets(i)}) & ${(1L << widths(i)) - 1}").as("cv"))
    }
    val postings = sigs
      .select(col(idCol).as("_id"), col(blockCol).as("_blk"),
        col("simhash").as("_sig"), explode(array(chunkCols: _*)).as("_c"))
      .select(col("_id"), col("_blk"), col("_sig"),
        col("_c.ck").as("_ck"), col("_c.cv").as("_cv"))
    val a = postings.select(col("_blk"), col("_ck"), col("_cv"),
      col("_id").as("id_a"), col("_sig").as("sh_a"))
    val b = postings.select(col("_blk").as("_blk_b"), col("_ck").as("_ck_b"),
      col("_cv").as("_cv_b"), col("_id").as("id_b"), col("_sig").as("sh_b"))
    a.join(b, col("_blk") === col("_blk_b") && col("_ck") === col("_ck_b") &&
        col("_cv") === col("_cv_b") && col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(expr("sh_a ^ sh_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact Jaccard near-dup pairs within a blocking column, WITHOUT an
    * all-pairs self-join: candidate pairs come from an inverted shingle
    * index restricted to each document's AllPairs filter prefix.
    *
    * Under any global canonical shingle order, two sets with
    * J(A,B) ≥ t must share a shingle inside their length
    * (|X| − ⌈t·|X|⌉ + 1) prefixes (Bayardo et al., WWW'07) — so the
    * (block, prefix-shingle) equi-join is an exact candidate generator
    * and the verify step restores exact Jaccard semantics. Candidate
    * cost is Σ df² over prefix shingles instead of Σ block², and the
    * prefix shrinks linearly as the threshold rises (at production
    * thresholds ~0.8 only ~20% of each posting list is indexed).
    */
  def jaccardNearDups(docs: DataFrame, idCol: String, textCol: String,
                      blockCol: String, threshold: Double): DataFrame = {
    val blocks = docs.select(col(idCol).as("_id"), col(blockCol).as("_blk"))
    // `_n` on the posting rows feeds the PREFIX path's bound for free;
    // the low-threshold path deliberately does NOT thread it through
    // its Σdf² self-join: measured at 32c solo, widening those join
    // rows costs more than the sizes-attach phase it would remove
    // (2.34 s → 3.14 s carried-as-aggregate, 3.43 s carried-as-key),
    // because the self-join's shuffle+hash dominate this path and the
    // pair table the sizes attach to is comparatively small.
    val sh = shingleSizedTable(docs, idCol, textCol).join(blocks, "_id").persist()
    sh.count() // one tokenization pass shared by index and verify
    if (threshold >= 0.5) jaccardNearDupsPrefix(sh, threshold)
    else {
      // Low-threshold path: the posting-list self-join IS the verify.
      // Intersection sizes fall directly out of aggregating the
      // (block, shingle) equi-join — one shuffle with map-side partial
      // counts — so no distinct-candidates pass and no re-probe of the
      // shingle table per pair. Cost is Σ df² over postings (never
      // block²·|shingles|), the exact-similarity-join lower bound when
      // most co-shingle pairs must be scored anyway.
      val sizes = sh.groupBy("_id").agg(count(lit(1)).as("_n2"))
      val inter = sh.select(col("_blk"), col("_sh"), col("_id").as("id_a"))
        .join(sh.select(col("_blk").as("_blk_b"), col("_sh").as("_sh_b"),
            col("_id").as("id_b")),
          col("_blk") === col("_blk_b") && col("_sh") === col("_sh_b") &&
            col("id_a") < col("id_b"))
        .groupBy("id_a", "id_b").agg(count(lit(1)).as("_inter"))
      inter
        .join(sizes.select(col("_id").as("id_a"), col("_n2").as("_na")), "id_a")
        .join(sizes.select(col("_id").as("id_b"), col("_n2").as("_nb")), "id_b")
        .select(col("id_a"), col("id_b"),
          round(col("_inter").cast(DoubleType) /
            (col("_na") + col("_nb") - col("_inter")), 6).as("jaccard"))
        .filter(col("jaccard") >= threshold)
    }
  }

  /** High-threshold path: AllPairs prefix filtering. Under any global
    * canonical shingle order, J(A,B) ≥ t forces a shared shingle inside
    * the length (|X| − ⌈t·|X|⌉ + 1) prefixes (Bayardo et al., WWW'07),
    * so indexing only prefixes shrinks the self-join input by ~t per
    * doc (at t=0.8, 5× fewer postings ⇒ ~25× fewer join rows) at the
    * price of an exact re-verify of the surviving candidates. */
  private def jaccardNearDupsPrefix(sh: DataFrame, threshold: Double): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("_id").orderBy(md5(col("_sh").cast(BinaryType)))
    // `_n` rides the posting rows (shingleSizedTable), so the prefix
    // bound needs only the rank window, not a second count window.
    val prefix = sh
      .withColumn("_pos", row_number().over(w))
      .filter(col("_pos") <= col("_n") - ceil(lit(threshold) * col("_n")) + 1)
      .select("_id", "_blk", "_sh")
    val cands = prefix.select(col("_blk"), col("_sh"), col("_id").as("id_a"))
      .join(prefix.select(col("_blk").as("_blk_b"), col("_sh").as("_sh_b"),
          col("_id").as("id_b")),
        col("_blk") === col("_blk_b") && col("_sh") === col("_sh_b") &&
          col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    // threshold ≥ 0.5 > 0: empty-intersection candidates can never
    // pass the filter, so the size-carrying verify applies.
    jaccardVerify(cands, sh).filter(col("jaccard") >= threshold)
  }

  /** Exact Jaccard for candidate pairs over a size-carrying posting
    * table ([[shingleSizedTable]]). Only for consumers that then filter
    * `jaccard >= t` with `t > 0`: pairs with an empty intersection
    * produce no aggregate row here (they would score 0 and be dropped
    * anyway), which is what lets the pair-preserving left join AND the
    * sizes aggregation + two size joins of [[jaccardOnShingles]]
    * disappear (r15, guide §2.4). */
  private def jaccardVerify(pairs: DataFrame, shN: DataFrame): DataFrame =
    pairs
      .join(shN.select(col("_id").as("id_a"), col("_n").as("_na"), col("_sh")),
        "id_a")
      .join(shN.select(col("_id").as("id_b"), col("_n").as("_nb"), col("_sh")),
        Seq("id_b", "_sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("_inter"),
        max("_na").as("_na"), max("_nb").as("_nb"))
      .select(col("id_a"), col("id_b"),
        round(col("_inter").cast(DoubleType) /
          (col("_na") + col("_nb") - col("_inter")), 6).as("jaccard"))
}
