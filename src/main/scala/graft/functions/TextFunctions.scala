package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis building blocks for the large-scale training-data
  * pipeline operators (dedup, language-ID, quality scoring,
  * fingerprinting). All pure Column expressions — whole-stage codegen,
  * no UDFs — and each has an exact DuckDB-SQL equivalent so results
  * are oracle-checkable bit-for-bit.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** Word 2-gram shingles from an already-materialized token-array
    * column. IMPORTANT: pass a projected column (`.select(tokens(text)
    * as "_toks")` first) — inlining `split()` here re-evaluates the
    * split per element_at, turning shingling O(tokens²) per row.
    * (Spark's sequence(1, 0) counts DOWN, so guard the 1-token case.) */
  def bigramShinglesFromTokens(t: Column): Column =
    nGramShinglesFromTokens(t, 2)

  /** Convenience form over raw text — fine for small inputs/tests;
    * hot paths should pre-project tokens (see above). */
  def bigramShingles(text: Column): Column = bigramShinglesFromTokens(tokens(text))

  /** Word n-gram shingles from a pre-projected token array (same
    * materialization caveat as [[bigramShinglesFromTokens]]). Used by
    * the contamination screen, where published LM pipelines compare
    * held-out benchmarks against training text on word n-grams. */
  def nGramShinglesFromTokens(t: Column, n: Int): Column =
    // r14: one codegen'd pass (functions/WordNGrams) — the HOF form
    // (transform(sequence(...), i => concat_ws(...element_at...)))
    // interpreted a lambda per shingle under every shingle-based
    // dedup operator; output bit-identical (concat_ws semantics
    // preserved, < n tokens → empty array)
    call_function("word_ngrams", t, lit(n))

  /** Deterministic 32-bit token hash: first 8 hex chars of md5 as uint. */
  def hash32(token: Column): Column =
    conv(substring(md5(token.cast(BinaryType)), 1, 8), 16, 10).cast(LongType)

  /** Normalized-document fingerprint (md5 of ws-collapsed text). */
  def fingerprint(text: Column): Column =
    md5(array_join(tokens(text), " ").cast(BinaryType))

  /** BPE-ish subword tokens: letter runs, digit runs, punctuation
    * runs (whitespace dropped) — the merge-free skeleton of a GPT-2
    * style pre-tokenizer, deterministic in any regex engine. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+"), lit(0))

  /** Order-sensitive Rabin–Karp rolling fingerprint over the token
    * stream: fold (acc·31 + hash32(token)) mod 2³², so ws-equal but
    * reordered documents fingerprint differently (unlike
    * [[fingerprint]], which normalizes). One codegen'd kernel (r15;
    * was an interpreted aggregate·transform HOF pair). */
  def rollingHash(toks: Column): Column = call_function("rolling_hash", toks)

  /** Σ length(token) as one codegen'd kernel (r15; was an interpreted
    * aggregate·transform HOF pair under x3's mean token length). */
  def tokenLengthSum(toks: Column): Column = call_function("token_len_sum", toks)
}
