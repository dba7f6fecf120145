package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the training-data pipeline surface:
  * tokenization, engine-portable hashing, quality metrics, language-ID
  * scoring, document fingerprints. All pure column expressions.
  */
object TextFunctions {
  /** Whitespace tokens; leading/trailing space safe; no empty tokens. */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation marks. */
  def subtokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** 32-bit token hash derived from the first 8 hex chars of sha256 —
    * chosen over xxhash64 because any engine (the DuckDB oracle included)
    * reproduces it bit-for-bit. Use [[fastHash]] in paths that don't need
    * cross-engine parity. */
  def shaHash32(c: Column): Column =
    conv(substring(sha2(c, 256), 1, 8), 16, 10).cast("long")

  /** Cheap non-cryptographic hash for engine-internal paths (MinHash
    * permutations, LSH banding). */
  def fastHash(c: Column, seed: Int): Column = xxhash64(lit(seed), c)

  /** Word n-grams over a token array; documents shorter than n collapse
    * to a single whole-text shingle so no row ever drops out. */
  def wordNgrams(toks: Column, n: Int): Column = {
    val grams = transform(
      sequence(lit(0), size(toks) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*))
    when(size(toks) < n, array(concat_ws(" ", toks))).otherwise(grams)
  }
}
