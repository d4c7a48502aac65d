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
  * is still in flight can't run `onEvict` at eviction time (the value
  * does not exist yet); instead, the completing thread re-checks
  * membership after the lazy val initializes and runs `onEvict` itself
  * (exactly once, flag-guarded under the map lock) when its cell is no
  * longer the mapped one — so a persisted DataFrame computed after
  * eviction is still released instead of leaking (round-11 advice).
  * `onEvict` on a value a waiter just received is safe for the uses
  * here: Spark `unpersist` drops cached blocks without invalidating
  * the DataFrame. */
final class KeyedMemo[V](capacity: Int, onEvict: V => Unit = null) {

  private final class Cell(compute0: () => V) {
    // dropped after initialization: the closure captures its caller's
    // environment (a Dataset, its analyzed plan, session state) and
    // holding it for the cached entry's lifetime would pin all of that
    // beyond the memoized value itself
    private var compute = compute0
    @volatile var done = false
    // set under the map lock by whichever thread (evictor at eviction
    // time for done cells, completer post-initialization for cells
    // evicted in flight) takes responsibility for onEvict
    var evictNotified = false
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
        // in-flight cells (!done) are handled by the completing thread's
        // post-initialization membership check in getOrCompute
        if (onEvict != null && c.done && !c.evictNotified) {
          c.evictNotified = true
          onEvict(c.value)
        }
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
    try {
      val v = cell.value
      // the cell may have been LRU-evicted while the computation was
      // in flight (removeEldestEntry saw !done and could not release
      // it); now that the value exists, whichever reader gets here
      // first releases it — flag-guarded so exactly one does
      if (onEvict != null) {
        val mustEvict = lru.synchronized {
          if ((lru.get(key) ne cell) && !cell.evictNotified) {
            cell.evictNotified = true; true
          } else false
        }
        if (mustEvict) onEvict(v)
      }
      v
    } catch {
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
