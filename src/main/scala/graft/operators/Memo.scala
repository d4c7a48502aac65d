package graft.operators

/** Per-key single-flight LRU memo — the session-memo shape the TVF
  * paths need (round-10 advice): the round-9 memos held the enclosing
  * OBJECT's monitor while the memoized computation ran full Spark
  * training/join jobs, so concurrent SQL sessions resolving DIFFERENT
  * views serialized behind one training run. Here the map lock guards
  * only map access; the computation runs under a per-KEY cell, so
  *
  *   - two threads asking for the same key run the computation ONCE
  *     (the second blocks on that key's cell only — single-flight);
  *   - threads asking for different keys never block each other.
  *
  * The cell is a Scala `lazy val`: the first arriving thread computes
  * under the cell's own initialization monitor, later threads read the
  * initialized value without contention. A computation that THROWS
  * leaves the lazy val uninitialized, so the next request for that key
  * retries instead of caching the failure.
  *
  * LRU-capped at `capacity` (access-ordered); `onEvict` runs on the
  * evicted value so cache-holding values (persisted DataFrames) release
  * their storage on the way out. An entry evicted while its computation
  * is still in flight skips `onEvict` (the value does not exist yet) —
  * with the small capacities used here that race needs 1+capacity
  * concurrent distinct keys, and the cost is one unreleased cache entry,
  * never a wrong result. */
final class KeyedMemo[V](capacity: Int, onEvict: V => Unit = null) {

  private final class Cell(compute0: () => V) {
    // dropped after initialization: the closure captures its caller's
    // environment (a Dataset, its analyzed plan, session state) and
    // holding it for the cached entry's lifetime would pin all of that
    // beyond the memoized value itself
    private var compute = compute0
    @volatile var done = false
    lazy val value: V = {
      val v = compute()
      compute = null
      done = true
      v
    }
  }

  private val lru = new java.util.LinkedHashMap[String, Cell](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[String, Cell]): Boolean =
      if (size() > capacity) {
        val c = e.getValue
        if (onEvict != null && c.done) onEvict(c.value)
        true
      } else false
  }

  /** The memoized value for `key`, computing it (once per key, outside
    * the map lock) on a miss. */
  def getOrCompute(key: String)(compute: => V): V = {
    val cell = lru.synchronized {
      val hit = lru.get(key)
      if (hit != null) hit
      else { val c = new Cell(() => compute); lru.put(key, c); c }
    }
    try cell.value
    catch {
      case e: Throwable =>
        // a failed cell holds the FAILING caller's closure — drop it so
        // the next request installs a fresh cell (its own closure)
        // instead of replaying the dead one forever. The `!done` guard
        // covers the waiter-retry interleaving: a thread blocked on the
        // failing cell retries the initialization (lazy-val semantics),
        // and if ITS attempt succeeded between our throw and this
        // removal, the now-finished cell must stay cached.
        lru.synchronized {
          if (!cell.done && (lru.get(key) eq cell)) lru.remove(key)
        }
        throw e
    }
  }

  /** Number of FINISHED entries currently memoized (test hook). */
  def doneCount: Int = lru.synchronized {
    var n = 0
    lru.values.forEach(c => if (c.done) n += 1)
    n
  }
}
