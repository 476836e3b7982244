package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The deterministic hashed bag-of-tokens random-projection embedder —
  * ONE implementation shared by the query suite (`t_embed`,
  * `x_engine_embed_search`, which also replays it as DuckDB CTEs from
  * [[graft.queries.TextQueries.embedCtesSql]]) and the engine's
  * text-query verb ([[graft.engine.VectorEngine.searchText]]).
  *
  * token → md5 bucket (1024); ONE md5 of "e|<bucket>" yields all
  * [[EDim]]=16 projection weights (2 hex chars per dim, minus 128 →
  * integers in [-128, 127]); embedding[j] = Σ over tokens of
  * w(bucket, j). All-integer arithmetic, so DuckDB replays it
  * bit-for-bit AND the per-doc sums stay far inside float32's 2^24
  * exact-integer range — float-cast embeddings are exact too.
  *
  * 100 TB shape: the hashing trick means there is NO weight table to
  * train, broadcast, or join — embedding is per-row expression work
  * folded into the token scan plus one per-id agg; a trained projection
  * swaps the md5 weight expression for a broadcast row lookup in the
  * same plan shape. (Reference seam: the external sentence-transformer
  * it assumes at `settings.py:29-31` but never calls.)
  */
object TextEmbed {

  val EDim = 16

  /** One md5 (32 hex chars) yields 16 two-hex-char weights, so dims
    * beyond [[EDim]] draw from BLOCK hashes "e|<bucket>|<block>" — block
    * j/16 supplies dim j at offset (j mod 16). Dim 16 keeps the original
    * suffix-free hash so every existing 16-dim fixture and oracle replay
    * is bit-identical.
    */
  val MaxDim = 4096

  private def weightHash(bucket: org.apache.spark.sql.Column, dim: Int,
      block: Int): org.apache.spark.sql.Column =
    if (dim == EDim) md5(concat(lit("e|"), bucket.cast("string")))
    else md5(concat(lit("e|"), bucket.cast("string"), lit(s"|$block")))

  /** (idCol, e0..e{dim-1}) integer embeddings for an (idCol, text) frame
    * at ANY dim (default [[EDim]] — the legacy formula, bit-identical).
    * Rows with zero tokens produce no output row (nothing to embed).
    * The reference's search endpoint only dim-checks its external
    * embedder's output (`services/search.py:23-24`) — parameterizing the
    * dim here lets engine-side text search compose with every library
    * dim instead of hard-gating on 16 (VERDICT r13 #4).
    */
  def embedded(df: DataFrame, idCol: String, dim: Int = EDim): DataFrame = {
    require(dim >= 1 && dim <= MaxDim, s"embed dim out of range: $dim")
    val bucket = conv(substring(md5(col("tok")), 1, 8), 16, 10)
      .cast("long") % 1024
    val nBlocks = (dim + EDim - 1) / EDim
    val blockCols = (0 until nBlocks).map(b =>
      weightHash(bucket, dim, b).as(s"wh$b"))
    val dims = (0 until dim).map { j =>
      sum(conv(substring(col(s"wh${j / EDim}"), 2 * (j % EDim) + 1, 2), 16, 10)
        .cast("long") - 128).as(s"e$j")
    }
    df.select(col(idCol), explode(TextFunctions.tokens(col("text"))).as("tok"))
      .select(col(idCol) +: blockCols: _*)
      .groupBy(col(idCol))
      .agg(dims.head, dims.tail: _*)
  }
}
