package graft.ops

/** Size-bounded, session-scoped LRU for build-once/serve-many Spark
  * artifacts (checkpointed code tables, probe-score tables, persisted
  * index frames). Fixes the unbounded-pinning failure of the earlier
  * `ConcurrentHashMap` caches: within one long-lived application every
  * distinct input plan used to pin its checkpointed RDD blocks forever.
  * Here the LRU evicts past `maxEntries` and runs `onEvict` (which
  * should unpersist the entry's storage — see
  * [[org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint]]), and
  * [[clear]] is the explicit invalidation hook for callers that rewrite
  * a source in place.
  *
  * CONTRACT — plan-hash keying assumes immutable inputs: a key of
  * (applicationId, plan semanticHash) identifies the *logical plan*,
  * not the bytes under it. A table rewritten in place under the same
  * logical plan WILL serve stale cached results until [[clear]] (or
  * LRU churn) evicts it; callers with mutable inputs must invalidate
  * explicitly. Entries from other application ids (stopped sessions)
  * are dropped on every access, as before.
  *
  * Access is synchronized; a compute running under the lock serializes
  * concurrent builders of the SAME artifact (the `computeIfAbsent`
  * semantics the callers already relied on).
  */
final class BoundedCache[K, V](maxEntries: Int, onEvict: V => Unit) {

  private val map = new java.util.LinkedHashMap[(String, K), V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[(String, K), V]): Boolean =
      if (this.size() > maxEntries) { onEvict(e.getValue); true } else false
  }

  /** The cached value for (appId, key), computing (and storing) it on
    * miss. Evicts entries from other application ids first. */
  def getOrCompute(appId: String, key: K)(compute: => V): V = synchronized {
    val it = map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey._1 != appId) { onEvict(e.getValue); it.remove() }
    }
    val k = (appId, key)
    val hit = map.get(k)
    if (hit != null || map.containsKey(k)) hit
    else { val v = compute; map.put(k, v); v }
  }

  /** Explicit invalidation: evict everything (runs `onEvict` on each
    * entry). The hook for in-place source rewrites. */
  def clear(): Unit = synchronized {
    map.values().forEach(v => onEvict(v))
    map.clear()
  }

  private[graft] def size: Int = synchronized(map.size())
}
