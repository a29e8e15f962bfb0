package graft.core

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSuite

/** Contract of the per-session cleanup registry the managed catalog
  * queries (t26–t30) defer their unpersist handles through:
  *   1. drain runs every registered handle exactly once and reports the
  *      count; a second drain is a no-op (handles must not re-run — an
  *      unpersist is idempotent but a future handle might not be);
  *   2. a throwing handle is swallowed and does NOT stop later handles
  *      (cleanup must never fail a query whose result materialized);
  *   3. sessions are isolated — draining one session must not run
  *      another session's handles (two Verify-style runners sharing a
  *      context must not reclaim each other's live frames);
  *   4. a handle registered after a drain runs at the NEXT drain.
  */
class QueryCleanupSpec extends SparkSuite {

  test("drain runs handles once, reports count, second drain is empty") {
    val ran = new AtomicInteger(0)
    QueryCleanup.register(spark, () => { ran.incrementAndGet(); () })
    QueryCleanup.register(spark, () => { ran.incrementAndGet(); () })
    assert(QueryCleanup.drain(spark) == 2)
    assert(ran.get() == 2)
    assert(QueryCleanup.drain(spark) == 0, "second drain must be empty")
    assert(ran.get() == 2, "handles must not re-run")
  }

  test("a throwing handle is swallowed and later handles still run") {
    val ran = new AtomicInteger(0)
    QueryCleanup.register(spark, () => { ran.incrementAndGet(); () })
    QueryCleanup.register(spark,
      () => throw new RuntimeException("cleanup blew up"))
    QueryCleanup.register(spark, () => { ran.incrementAndGet(); () })
    assert(QueryCleanup.drain(spark) == 3,
      "the count reports registered handles, including the thrower")
    assert(ran.get() == 2, "handles after the thrower must still run")
  }

  test("sessions are isolated: draining one does not run the other's handles") {
    val other = spark.newSession()
    val mine = new AtomicInteger(0)
    val theirs = new AtomicInteger(0)
    QueryCleanup.register(spark, () => { mine.incrementAndGet(); () })
    QueryCleanup.register(other, () => { theirs.incrementAndGet(); () })
    assert(QueryCleanup.drain(spark) == 1)
    assert(mine.get() == 1 && theirs.get() == 0,
      "draining spark must not touch the sibling session's handles")
    assert(QueryCleanup.drain(other) == 1)
    assert(theirs.get() == 1)
  }

  test("a handle registered after a drain runs at the next drain") {
    QueryCleanup.register(spark, () => ())
    QueryCleanup.drain(spark)
    val late = new AtomicInteger(0)
    QueryCleanup.register(spark, () => { late.incrementAndGet(); () })
    assert(QueryCleanup.drain(spark) == 1)
    assert(late.get() == 1)
  }
}
