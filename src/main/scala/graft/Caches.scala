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

  /** Keyed checkpoint-cache fill with the build OUTSIDE the lock (a
    * checkpoint job must not serialize every other cache user) and a
    * double-check on insert: the losing racer unpersists its own build
    * and adopts the winner. The ONE implementation of this subtle
    * pattern — the dedup band/pair caches and the engine self-join hits
    * cache both go through here.
    */
  def cachedCkpt[K](cache: scala.collection.mutable.Map[K, DataFrame],
      key: K)(build: => DataFrame): DataFrame =
    cache.synchronized(cache.get(key)) match {
      case Some(df) => df
      case None =>
        val built = build
        cache.synchronized {
          cache.get(key) match {
            case Some(winner) =>
              GraftRddBridge.unpersistLocalCheckpoint(built)
              winner
            case None => cache.put(key, built); built
          }
        }
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
    graft.queries.TextQueries.releaseCaches()
    graft.queries.AnnQueries.releaseCaches()
    graft.queries.SourceQueries.releaseCaches()
  }
}
