package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}

import graft.engine.VectorEngine

/** Streaming sink into the engine's versioned StateStore: each micro-batch
  * is one `bulkIngest` batch (snapshot write + incremental index
  * maintenance), connecting the Structured Streaming surface to the same
  * store the batch verbs mutate — a stream-ingested library is immediately
  * searchable with batch-parity results.
  *
  * Delivery semantics: foreachBatch is at-least-once under failure
  * replay, and content-hash ids (bulkIngest's id contract) make a
  * replayed micro-batch CONTENT-idempotent — the same ids re-derive and
  * replace, so no row is ever duplicated. Replay is NOT byte-idempotent:
  * a replaced chunk's version/updated_at bump again on the replayed
  * write, so version numbers after a failure+replay differ from a
  * failure-free run (CAS callers should expect that, as with any
  * at-least-once sink). The engine's single-writer batch contract
  * matches streaming's serialized micro-batch execution.
  */
object StoreSink {

  /** Start ingesting a streaming DataFrame of chunk rows (bulkIngest
    * column contract: text required; id/position/embedding/author/lang/
    * source_uri/tags optional) into `libId`/`docId`. The caller owns the
    * returned query's lifecycle.
    */
  def ingestStream(engine: VectorEngine, libId: String, docId: String,
      chunkRows: DataFrame,
      checkpointDir: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val writer = chunkRows.writeStream
      .outputMode(OutputMode.Append())
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // an empty replay batch is a no-op, not an empty snapshot version
        if (!batch.isEmpty) engine.bulkIngest(libId, docId, batch)
      }
    checkpointDir.foreach(d => writer.option("checkpointLocation", d))
    writer.start()
  }
}
