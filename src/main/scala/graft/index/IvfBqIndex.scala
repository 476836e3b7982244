package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF + binary quantization — cell-pruned packed sign-bit codes (the
  * FAISS `IndexBinaryIVF` model): the md5-seeded deterministic coarse
  * quantizer (shared `ivf_centroids` relation) assigns every vector to
  * a cell, and the BQ code rides ON the inverted-list row
  * (`ivfbq_codes(centroid_id, chunk_id, codes)`), so a search scans
  * nprobe/K of the packed corpus via a LITERAL `centroid_id isin`
  * pushdown — no join anywhere on the candidate path. At 100 TB this is
  * THE binary-search architecture: the flat bq scan is already 32x
  * smaller than float32; cell pruning divides it by K/nprobe again, and
  * the layout key (`centroid_id`) turns the pushdown into row-group
  * skipping after `optimizeIndexLayout`.
  *
  * No residual encoding: binary signs are cell-independent (a sign bit
  * of a residual is a different — non-composable — scheme), so the code
  * rule is EXACTLY [[BqIndex]]'s and the two families' codes agree
  * bit-for-bit on the same vector. Determinism: md5 seeds + argmax
  * assignment + closed-form packing — the full build + search replays
  * in the DuckDB oracle, and incremental adds (frozen cells, stateless
  * encode) replay with the standard base/live predicates.
  */
object IvfBqIndex {

  val Oversample = 6

  /** Build == encode against the given centroids (the incremental add
    * uses the same function with the FROZEN build-time cells): one
    * assignment pass + the packing expressions, no aggregate, no join
    * beyond the argmax against the collected metadata-scale centroids.
    */
  def build(chunksDf: DataFrame, centroidsDf: DataFrame,
      libraryId: String, dim: Int): DataFrame = {
    val posts = IvfIndex.assignToCentroids(chunksDf, centroidsDf, libraryId)
    posts.select(col("library_id"), col("centroid_id"), col("chunk_id"),
      array(BqIndex.packExprs(dim,
        i => element_at(col("embedding_norm"), i + 1)): _*).as("codes"))
  }
}
