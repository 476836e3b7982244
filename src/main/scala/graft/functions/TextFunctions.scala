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
    * where the sum is positive. One codegen'd loop per row (the
    * `Simhash60FromHashes` kernel) — no explode, no shuffle, no per-token
    * array churn; the 100 TB shape is scan -> simhash -> band-join.
    */
  def simhash60(toks: Column): Column =
    SetExpressions.simhash60FromHashes(transform(toks, t => hash60(t)))

  /** Universal-hash constants for numeric minhash: k fixed (a, b) pairs,
    * sig_k = min over shingles of (h28(shingle) * a_k + b_k) mod P.
    * One md5 per shingle total (the 28-bit prefix), vs one md5 per
    * (shingle x signature) for the salted variant — 8x fewer digests at
    * K=8. P = 2^31 - 1; products stay under 2^59, exact in a long on any
    * engine, and positive%positive is truncation-identical everywhere.
    */
  val MinhashP: Long = 2147483647L
  val MinhashAB: Seq[(Long, Long)] = Seq(
    (1103515245L, 12345L), (1299709L, 7919L), (104729L, 65537L),
    (882377563L, 274177L), (15485863L, 32452843L), (49979687L, 86028121L),
    (198491317L, 982451653L), (32416190071L % MinhashP, 67867967L))

  /** 28-bit md5-prefix hash (7 hex chars) — the numeric-minhash base. */
  def hash28(t: Column): Column =
    conv(substring(md5(t), 1, 7), 16, 10).cast("long")

  /** K numeric minhash signatures in one fold: shingles -> h28 array
    * (one md5 each) -> per-signature universal-hash min. Empty shingle
    * sets yield nulls.
    */
  def minhashSigsNum(shingleCol: Column, k: Int): Column = {
    require(k <= MinhashAB.length, s"at most ${MinhashAB.length} signatures")
    val (as, bs) = MinhashAB.take(k).unzip
    SetExpressions.minhashSigs(
      transform(shingleCol, s => hash28(s)), as, bs, MinhashP)
  }

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
