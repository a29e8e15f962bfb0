package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.SparkEntry

/** q20 is the one catalog entry without a DuckDB oracle (an HLL sketch is
  * engine-specific), so this spec is its correctness gate: the exact
  * column and group keys are pinned against an independent computation,
  * and the sketch must sit inside its configured error envelope. t09
  * remains the deterministic, hash-checkable approx-distinct twin. */
class Q20SketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("q20: exact column and group keys match an independent count; HLL inside its envelope") {
    val full = SparkEntry.queries("q20_approx_distinct")(spark, sf).collect()
    // the query's own verdict column: every row must self-report in-envelope,
    // and rel_err must be the recomputation of the two count columns
    full.foreach { r =>
      assert(r.getBoolean(4), s"self-assert failed: $r")
      val recomputed = math.abs(r.getLong(1) - r.getLong(2)).toDouble / r.getLong(2)
      assert(math.abs(r.getDouble(3) - recomputed) < 1e-6, s"rel_err drifted: $r")
    }
    val rows = full
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList

    val truth = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // group keys: exactly the distinct return flags, in order
    assert(rows.map(_._1) == truth.keys.toList.sorted, s"keys ${rows.map(_._1)}")
    rows.foreach { case (k, approx, exact) =>
      // the exact column IS the exact distinct count
      assert(exact == truth(k), s"$k exact $exact != ${truth(k)}")
      // approx_count_distinct(rsd = 0.02): allow 5x the configured rsd —
      // the estimate is deterministic for fixed data, this guards gross
      // breakage (wrong column, wrong key) without pinning sketch internals
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel < 0.10, s"$k approx $approx vs exact $exact (rel err $rel)")
    }
  }
}
