package org.apache.spark.sql.execution.streaming.state

/** Access bridge to [[StateStore]]'s package-private registry
  * controls, for the bench harness's per-query isolation (the only
  * caller is `graft.Bench`).
  *
  * Why it exists: the provider registry is JVM-GLOBAL and nothing
  * unloads a stopped streaming query's providers — across a
  * 406-query × 4-pass bench the registry accumulates thousands of
  * dead providers, and their periodic maintenance sweep
  * (snapshot/cleanup attempts against already-deleted temp
  * checkpoints) lands randomly inside later timed lines. Spark's own
  * test harnesses call `StateStore.stop()`/`unloadAll()` for exactly
  * this hygiene; the methods are `private[sql]`, so the bridge lives
  * in this package. Never called from library operators — a real
  * session WANTS providers cached across micro-batches.
  */
object GraftStateStoreHygiene {
  /** Unload every registered state-store provider (keeps the
    * maintenance thread; the next streaming query reloads lazily). */
  def unloadAllProviders(): Unit = StateStore.unloadAll()
}
