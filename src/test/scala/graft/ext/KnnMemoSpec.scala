package graft.ext

import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSuite

/** Contract of the kNN-graph memo (`Similarity.knnMemoized`), which
  * s21/s28/s29/s30 and the c26/s31 serving twins all ride:
  *   1. build-once — two first callers racing on the SAME key run the
  *      build exactly once (the r13/r14 double-persist/double-build
  *      regressions);
  *   2. per-key locking — a slow build on one key must NOT serialize a
  *      different key's build behind it (the "g" entry's eager
  *      localCheckpoint runs a full Spark job; under the pre-r16 global
  *      `synchronized` every session's first build queued behind it);
  *   3. explicit eviction — `evictKnnMemo(session)` drops the session's
  *      entries so a later call rebuilds (session-level teardown under a
  *      shared context, where no context-end listener will ever fire).
  */
class KnnMemoSpec extends SparkSuite {

  test("same key: concurrent first callers build exactly once") {
    val builds = new AtomicInteger(0)
    val ready = new CountDownLatch(2)
    val results = new java.util.concurrent.ConcurrentLinkedQueue[AnyRef]()
    val threads = (1 to 2).map { _ =>
      new Thread(() => {
        ready.countDown()
        ready.await(5, TimeUnit.SECONDS)
        val df = Similarity.knnMemoized(spark, "memo-spec-ds1", "k1") {
          builds.incrementAndGet()
          Thread.sleep(50) // widen the race window
          spark.range(3).toDF("i")
        }
        results.add(df)
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join(10000))
    assert(builds.get() == 1, s"build ran ${builds.get()} times, expected 1")
    assert(results.size == 2 && results.toArray.distinct.length == 1,
      "both callers must receive the same memoized frame")
    Similarity.evictKnnMemo(spark)
  }

  test("different keys: a blocked build does not serialize other keys") {
    val slowEntered = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val slow = new Thread(() => {
      Similarity.knnMemoized(spark, "memo-spec-ds2", "slow") {
        slowEntered.countDown()
        release.await(10, TimeUnit.SECONDS)
        spark.range(1).toDF("i")
      }
    })
    slow.start()
    assert(slowEntered.await(5, TimeUnit.SECONDS), "slow build never started")
    // While the slow key's build is parked inside its cell, an unrelated
    // key must complete. Under a global build lock this deadlocks (the
    // fast caller waits on the monitor the slow build holds) and the
    // await below times out red.
    val fastDone = new CountDownLatch(1)
    val fast = new Thread(() => {
      Similarity.knnMemoized(spark, "memo-spec-ds2", "fast") {
        spark.range(2).toDF("i")
      }
      fastDone.countDown()
    })
    fast.start()
    val fastCompleted = fastDone.await(5, TimeUnit.SECONDS)
    release.countDown()
    slow.join(10000); fast.join(10000)
    assert(fastCompleted,
      "an independent key's build was serialized behind another key's")
    Similarity.evictKnnMemo(spark)
  }

  test("evictKnnMemo drops the session's entries so a rebuild happens") {
    val builds = new AtomicInteger(0)
    def get() = Similarity.knnMemoized(spark, "memo-spec-ds3", "k") {
      builds.incrementAndGet(); spark.range(1).toDF("i")
    }
    get(); get()
    assert(builds.get() == 1, "second call must hit the memo")
    Similarity.evictKnnMemo(spark)
    get()
    assert(builds.get() == 2, "post-eviction call must rebuild")
    Similarity.evictKnnMemo(spark)
  }
}
