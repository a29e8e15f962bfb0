package graft.operators

import graft.SparkSuite
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  // Deterministic pseudo-random axis values: intervals of varied spans
  // (sub-bin, exact-bin, many-bin) incl. touching boundaries, points
  // dense enough to hit starts/ends/bin edges exactly.
  private lazy val points = (0 until 400)
    .map(i => (i.toLong, (i * 37 % 1000).toLong)).toDF("pid", "x")
  private lazy val intervals = (0 until 60)
    .map { i =>
      val lo = (i * 131 % 900).toLong
      (i.toLong, lo, lo + (i * 7 % 160).toLong) // spans 0..159, binWidth 50
    }.toDF("iid", "lo", "hi")

  test("binned join == naive BETWEEN join, with no duplicate pairs") {
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 50L)
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = points.crossJoin(intervals)
      .filter($"x" >= $"lo" && $"x" <= $"hi")
      .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "duplicate (point, interval) pairs")
    assert(got.sorted.toSeq == want.sorted.toSeq)
    assert(want.nonEmpty)
  }

  test("plans an equi-join on the bin even when broadcast is disabled") {
    val thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val p = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 50L)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(!p.contains("BroadcastNestedLoopJoin"), p)
      assert(!p.contains("CartesianProduct"), p)
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
  }

  test("empty interval side yields an empty result, not a failure") {
    val got = RangeJoin.pointInInterval(
      points, "x", intervals.filter($"iid" < 0), "lo", "hi", 50L)
    assert(got.count() == 0)
  }
}
