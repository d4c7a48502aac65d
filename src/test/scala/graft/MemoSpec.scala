package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, KeyedMemo}
import graft.sources.Tables

/** The session-memo contract behind the TVF paths (round-10 advice):
  * single-flight per key, no cross-key blocking, LRU eviction with the
  * release hook, and — the q79-drift adjudication hook — proof that a
  * REPEAT TVF-shaped call actually hits the memo (a never-hitting plan
  * key would recompute the containment join every call). */
class MemoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("same key computes once; concurrent same-key callers single-flight") {
    val memo = new KeyedMemo[Int](8)
    val calls = new AtomicInteger(0)
    val ready = new CountDownLatch(4)
    val pool = Executors.newFixedThreadPool(4)
    val results = (1 to 4).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = {
          ready.countDown()
          ready.await(5, TimeUnit.SECONDS)
          memo.getOrCompute("k") { calls.incrementAndGet(); Thread.sleep(50); 42 }
        }
      })
    }
    assert(results.map(_.get(10, TimeUnit.SECONDS)).forall(_ == 42))
    assert(calls.get() === 1, "same-key concurrent callers must compute once")
    pool.shutdown()
  }

  test("different keys never serialize behind one computation") {
    val memo = new KeyedMemo[String](8)
    val slowStarted = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val slow = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String = memo.getOrCompute("slow") {
        slowStarted.countDown()
        release.await(10, TimeUnit.SECONDS)
        "slow-done"
      }
    })
    assert(slowStarted.await(5, TimeUnit.SECONDS))
    // while "slow" is mid-computation, a different key must complete
    val fast = pool.submit(new java.util.concurrent.Callable[String] {
      def call(): String = memo.getOrCompute("fast")("fast-done")
    })
    assert(fast.get(5, TimeUnit.SECONDS) === "fast-done",
      "a different key blocked behind an in-flight computation")
    release.countDown()
    assert(slow.get(10, TimeUnit.SECONDS) === "slow-done")
    pool.shutdown()
  }

  test("a throwing computation is retried, not cached") {
    val memo = new KeyedMemo[Int](8)
    val calls = new AtomicInteger(0)
    intercept[RuntimeException] {
      memo.getOrCompute("k") { calls.incrementAndGet(); sys.error("boom") }
    }
    assert(memo.getOrCompute("k") { calls.incrementAndGet(); 7 } === 7)
    assert(calls.get() === 2)
  }

  test("LRU eviction runs the release hook on finished entries only") {
    val evicted = Seq.newBuilder[Int]
    val memo = new KeyedMemo[Int](2, v => evicted += v)
    memo.getOrCompute("a")(1)
    memo.getOrCompute("b")(2)
    memo.getOrCompute("c")(3) // evicts a (LRU)
    assert(evicted.result() === Seq(1))
    assert(memo.doneCount === 2)
    // access order: touching b makes c the eldest
    memo.getOrCompute("b")(99)
    memo.getOrCompute("d")(4)
    assert(evicted.result() === Seq(1, 3))
  }

  test("a cell evicted mid-flight still gets the release hook on completion") {
    // round-11 advice: eviction of an in-flight cell used to skip
    // onEvict permanently — a persisted frame computed after eviction
    // leaked. Now the completing thread re-checks membership and
    // releases the value itself, exactly once.
    val evicted = Seq.newBuilder[Int]
    val memo = new KeyedMemo[Int](1, v => evicted.synchronized { evicted += v })
    val started = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    val slow = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = memo.getOrCompute("slow") {
        started.countDown()
        release.await(10, TimeUnit.SECONDS)
        11
      }
    })
    assert(started.await(5, TimeUnit.SECONDS))
    // capacity 1: inserting a second key evicts "slow" while in flight
    memo.getOrCompute("b")(22)
    assert(evicted.synchronized(evicted.result()) === Seq(),
      "in-flight value cannot be released before it exists")
    release.countDown()
    assert(slow.get(10, TimeUnit.SECONDS) === 11)
    assert(evicted.synchronized(evicted.result()) === Seq(11),
      "the completer must release a value whose cell was evicted mid-flight")
    // and never twice: a second read of the (re-computed) key installs
    // a FRESH cell; the old one's flag stays set
    assert(memo.getOrCompute("slow")(33) === 33)
    assert(evicted.synchronized(evicted.result()) === Seq(11, 22))
    pool.shutdown()
  }

  test("repeat containmentJoinMemo call on an equivalent view HITS the memo") {
    // the q79 adjudication hook: the TVF path memoizes on the view's
    // canonicalized analyzed plan — a repeat call over the same view
    // must return the SAME persisted frame, not recompute the join.
    // (eq-identity is the strongest possible hit evidence: KeyedMemo
    // returns the stored value itself on a hit.)
    val docs = Tables.documents(spark, sf)
    val first = Dedup.containmentJoinMemo(docs, 3, 0.8)
    // a fresh, structurally identical view (new Dataset object, same
    // analyzed plan) — the key must match
    val again = Dedup.containmentJoinMemo(Tables.documents(spark, sf), 3, 0.8)
    assert(again eq first,
      "repeat graft_containment-shaped call missed the memo (plan key never hits)")
    // different parameters are a different key
    val other = Dedup.containmentJoinMemo(docs, 3, 0.9)
    assert(!(other eq first))
  }
}
