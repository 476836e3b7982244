package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis / fingerprinting primitives for the LLM-training-data
  * pipeline extensions (dedup, language ID, quality scoring, token stats).
  *
  * Everything is built from codegen'd built-ins and higher-order functions —
  * no UDFs — so a 100 TB corpus pays one columnar scan and zero
  * serialization boundaries. All hashing is md5-based (not Spark's
  * murmur/xxhash) so an independent engine (the DuckDB oracle, or any other
  * SQL system) can recompute identical signatures.
  */
object TextFunctions {

  /** Whitespace tokens with empties dropped (split keeps trailing empties —
    * both Spark and DuckDB do — so the filter makes token counts robust to
    * trailing separators).
    */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Deterministic 60-bit token hash: first 15 hex chars of md5, parsed
    * base-16. 60 bits keeps the value positive in a signed 64-bit long on
    * every engine (a 16th hex char could set the sign bit in two's
    * complement parses).
    */
  def hash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Word n-gram shingles, space-joined; empty array when the doc is too
    * short (guarded — Spark's `sequence(a,b)` generates a DESCENDING range
    * when b < a rather than an empty one).
    */
  def shingles(toks: Column, n: Int): Column = {
    val idx = sequence(lit(0), size(toks) - n)
    val make = transform(idx, i =>
      concat_ws(" ", (0 until n).map(o => element_at(toks, (i + o + 1).cast("int"))): _*))
    when(size(toks) >= n, make).otherwise(array().cast("array<string>"))
  }

  /** One MinHash signature: lexicographic min of salted md5 over the
    * shingle set. K independent signatures come from K salts; banding b
    * signatures per band gives the standard LSH dedup candidate generator
    * (shingle -> minhash -> band -> bucket equi-join).
    */
  def minhashSig(shingleCol: Column, salt: Int): Column =
    array_min(transform(shingleCol, s => md5(concat(lit(s"$salt:"), s))))

  /** All K minhash signatures in ONE fold over the shingle array (vs K
    * separate array_min passes each re-materializing the shingles — ~K x
    * cheaper per row, the difference between one corpus scan and K of
    * them at 100 TB). Values are identical to `minhashSig(_, i)`; empty
    * shingle sets yield nulls (array_min-of-empty parity).
    */
  def minhashSigs(shingleCol: Column, k: Int): Column = {
    val sentinel = "￿" // sorts after every hex digest
    val folded = aggregate(
      shingleCol,
      array_repeat(lit(sentinel), k),
      (acc, s) => zip_with(acc,
        array((0 until k).map(i => md5(concat(lit(s"$i:"), s))): _*),
        (a, b) => least(a, b)))
    transform(folded, x => when(x === sentinel, lit(null)).otherwise(x))
  }

  /** 60-bit SimHash over the (duplicated, i.e. frequency-weighted) token
    * stream: per bit position, sum +1/-1 by the token hash's bit, emit 1
    * where the sum is positive. Single fold per row — no explode, no
    * shuffle; the 100 TB shape is scan -> simhash -> band-join.
    */
  def simhash60(toks: Column): Column = {
    val sums = aggregate(
      transform(toks, t => hash60(t)),
      array_repeat(lit(0L), 60),
      (acc, h) => zip_with(acc,
        transform(sequence(lit(0), lit(59)),
          j => when(expr_bit(h, j) === 1, 1L).otherwise(-1L)),
        (a, b) => a + b))
    aggregate(
      zip_with(sums, sequence(lit(0), lit(59)),
        (s, j) => when(s > 0, shiftleft_col(lit(1L), j)).otherwise(lit(0L))),
      lit(0L), (a, b) => a + b)
  }

  /** (h >> j) & 1 with a non-literal shift (functions.shiftright only takes
    * a literal Int count; call_function reaches the SQL ShiftRight that
    * accepts an expression count).
    */
  private def expr_bit(h: Column, j: Column): Column =
    call_function("shiftright", h, j).bitwiseAND(lit(1L))

  private def shiftleft_col(v: Column, bits: Column): Column =
    call_function("shiftleft", v, bits)

  /** Content fingerprint: md5 over the sorted distinct token set — an
    * order/frequency-insensitive document identity for near-dup grouping.
    */
  def fingerprint(toks: Column): Column =
    md5(array_join(array_sort(array_distinct(toks)), " "))

  /** |A ∩ B| / |A ∪ B| over distinct-element arrays, 0.0 for two empties. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = (size(a) + size(b)).cast("double") - inter
    when(uni === 0.0, 0.0).otherwise(inter / uni)
  }
}
