package graft

import org.apache.spark.sql.{DataFrame, GraftRddBridge}

/** Session-cache lifecycle (round-6 task): one place that knows every
  * process-lifetime `localCheckpoint` block the library can pin, so a
  * long-lived session (or the bench/verify mains at suite end) can return
  * the executors to a clean slate.
  *
  * Two kinds of pinned state exist:
  *   - keyed caches that are REUSED across queries (dedup band/pair
  *     tables, engine fixtures) — owned by their objects, released via
  *     their `releaseCaches()`;
  *   - transient per-call checkpoints whose lifetime the producer cannot
  *     see (an LSH search materializes its candidate set, then hands the
  *     caller a lazy result that still reads those blocks) — those
  *     register here via `track`.
  *
  * `releaseAll()` must only run when no previously returned DataFrame will
  * be re-executed (between suites / at main exit): released checkpoints do
  * not rebuild — the cache owners do.
  */
object Caches {
  // WEAK references: the registry must not itself pin a checkpoint a
  // caller has abandoned — those stay eligible for the GC+ContextCleaner
  // path exactly as before this registry existed; releaseAll() eagerly
  // frees whatever is still reachable.
  private val tracked =
    scala.collection.mutable.ArrayBuffer.empty[java.lang.ref.WeakReference[DataFrame]]

  /** Register a transient localCheckpoint for end-of-suite release. */
  def track(df: DataFrame): DataFrame = synchronized {
    tracked += new java.lang.ref.WeakReference(df)
    df
  }

  def releaseAll(): Unit = {
    synchronized {
      tracked.foreach { ref =>
        val df = ref.get()
        if (df != null) GraftRddBridge.unpersistLocalCheckpoint(df)
      }
      tracked.clear()
    }
    graft.queries.DedupQueries.releaseCaches()
    graft.queries.EngineQueries.releaseCaches()
  }
}
