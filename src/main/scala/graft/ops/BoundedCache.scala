package graft.ops

/** Size-bounded, session-scoped LRU for build-once/serve-many Spark
  * artifacts (checkpointed code tables, probe-score tables, persisted
  * index frames). Fixes the unbounded-pinning failure of the earlier
  * `ConcurrentHashMap` caches: within one long-lived application every
  * distinct input plan used to pin its checkpointed RDD blocks forever.
  *
  * EVICTION IS BORROWER-SAFE — release-to-GC, not eager unpersist.
  * Evicting an entry only drops the cache's strong reference to it.
  * Spark registers every persisted RDD (including a `localCheckpoint`'s
  * MEMORY_AND_DISK blocks) with its `ContextCleaner`, which unpersists
  * the blocks once the RDD becomes unreachable — the same lifecycle
  * every non-cached `localCheckpoint` in this codebase already relies
  * on. PRECONDITION: that lifecycle requires the `ContextCleaner` to
  * exist — `spark.cleaner.referenceTracking` must stay at its default
  * `true`; with it disabled, evicted checkpoint blocks are reclaimed
  * only at context stop (the GC half of BoundedCacheSpec asserts the
  * cleaner is present). So a caller still holding an evicted frame
  * keeps its blocks
  * alive through its own reference, and use-after-evict simply WORKS:
  * there is no missing-block failure mode and no use-after-free window
  * for a dependent compute that is still reading the frame (the compute
  * holds the parent through its plan). The earlier design unpersisted
  * eagerly in `onEvict`, which was prompt but made a borrowed frame
  * fail with a raw missing-block error `maxEntries` builds later;
  * prompt reclamation is kept where it is provably safe — explicit
  * end-of-unit releases like
  * [[org.apache.spark.sql.GraftBridge.unpersistLocalCheckpoint]] in
  * StressBench, where the unit owns its frames. The cost of GC-deferred
  * cleanup is bounded: blocks are MEMORY_AND_DISK (they spill, they
  * don't OOM), Spark's unified memory manager evicts storage under
  * execution pressure, and `ContextCleaner`'s periodic GC (default
  * 30 min) bounds how long an unreachable checkpoint can linger.
  *
  * CONTRACT — plan-hash keying assumes immutable inputs: a key of
  * (applicationId, plan semanticHash) identifies the *logical plan*,
  * not the bytes under it. A table rewritten in place under the same
  * logical plan WILL serve stale cached results until [[clear]] (or
  * LRU churn) evicts it; callers with mutable inputs must invalidate
  * explicitly.
  *
  * Entries from other application ids (stopped sessions) are dropped on
  * every access; their blocks died with their context, so dropping the
  * reference is all the cleanup there is.
  *
  * Locking: the map is guarded by one monitor, but computes run OUTSIDE
  * it under a per-entry lazy cell — concurrent builders of the SAME
  * artifact serialize (the `computeIfAbsent` semantics the callers rely
  * on) while builds of different artifacts, and cache hits, proceed in
  * parallel. A cell whose compute fails is POISONED with that failure:
  * concurrent waiters blocked on the cell rethrow the original
  * exception instead of replaying the failed caller's captured closure
  * (the closure is released either way), and because the failing caller
  * removes the cell from the map, the next `getOrCompute` builds a
  * fresh cell from the new caller's own closure.
  */
final class BoundedCache[K, V](maxEntries: Int) {

  /** Per-entry memo: per-cell synchronization gives per-key compute
    * serialization. The compute closure is RELEASED (nulled) whether
    * the build succeeds or fails — a cached entry pins only its value,
    * never the first caller's captured DataFrames/plan trees, and a
    * failed build can never be replayed from the stale closure; the
    * outcome (Success or Failure) is what waiters observe. */
  private final class Cell(c0: () => V) {
    private var compute0: () => V = c0
    @volatile private var result: Option[scala.util.Try[V]] = None
    def value: V = this.synchronized {
      result match {
        case Some(r) => r.get // Failure rethrows the ORIGINAL exception to waiters
        case None =>
          try {
            val v = compute0()
            result = Some(scala.util.Success(v))
            v
          } catch {
            case t: Throwable =>
              result = Some(scala.util.Failure(t))
              throw t
          } finally compute0 = null
      }
    }
    // lock-free peek for getOrCompute's hit path: a poisoned cell must
    // not be handed to a FRESH caller (only already-blocked waiters see
    // the original failure) — without this, a caller arriving between
    // the failure and the failing thread's map.remove would rethrow a
    // stale failure instead of computing
    def poisoned: Boolean = result.exists(_.isFailure)
  }

  // accessOrder = true: iteration order is least- to most-recently-used.
  // removeEldestEntry only drops the reference — cleanup is the GC's
  // (see class doc) — so an entry evicted while its compute is still in
  // flight is also safe: the builder returns its value to its caller,
  // and the value lives exactly as long as that caller holds it.
  private val map = new java.util.LinkedHashMap[(String, K), Cell](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[(String, K), Cell]): Boolean =
      this.size() > maxEntries
  }

  /** The cached value for (appId, key), computing (and storing) it on
    * miss. Evicts entries from other application ids first. A FAILED
    * compute is never cached: its cell is removed so it neither
    * occupies an LRU slot (evicting healthy checkpoints early) nor
    * replays on retry — new callers recompute with their own closure,
    * while waiters already blocked on the failing cell get the original
    * failure. */
  def getOrCompute(appId: String, key: K)(compute: => V): V = {
    val k = (appId, key)
    val cell = synchronized {
      val it = map.entrySet().iterator()
      while (it.hasNext) {
        if (it.next().getKey._1 != appId) it.remove()
      }
      val hit = map.get(k)
      if (hit != null && !hit.poisoned) hit
      else { val c = new Cell(() => compute); map.put(k, c); c }
    }
    try cell.value // per-cell lock: same-key builders serialize, others don't
    catch {
      case t: Throwable =>
        synchronized { if (map.get(k) eq cell) map.remove(k) }
        throw t
    }
  }

  /** Explicit invalidation: drop every entry so the next access
    * recomputes. The hook for in-place source rewrites. Borrowed frames
    * keep working (release-to-GC, see class doc). */
  def clear(): Unit = synchronized(map.clear())

  /** TEST SEAM: install an already-poisoned cell for (appId, key), the
    * map state a fresh caller sees if its lookup lands between another
    * thread's compute failure and that thread's cell removal. The
    * window is a few instructions wide and cannot be paused from a
    * test, so the hit path's poisoned-skip branch is pinned through
    * this seam instead (the envelope-parameter seam discipline). */
  private[graft] def seedPoisonedForTest(appId: String, key: K,
                                         t: Throwable): Unit = synchronized {
    val c = new Cell(() => throw t)
    try c.value catch { case _: Throwable => () }
    map.put((appId, key), c)
  }

  private[graft] def size: Int = synchronized(map.size())
}
