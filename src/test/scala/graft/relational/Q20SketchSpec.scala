package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.SparkEntry

/** q20's catalog output is oracle-expressible (exact count + boolean
  * verdict, hash-checked by the driver against DuckDB), so this spec
  * pins what the oracle cannot see: the RAW HLL++ estimate's error
  * envelope, recomputed independently of the catalog query. t09 remains
  * the deterministic, hash-checkable approx-distinct twin. */
class Q20SketchSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("q20: verdicts all true; raw HLL estimate inside its envelope") {
    val out = SparkEntry.queries("q20_approx_distinct")(spark, sf).collect()
    assert(out.nonEmpty)
    // the catalog output: every row self-reports in-envelope
    out.foreach { r => assert(r.getBoolean(2), s"self-assert failed: $r") }

    // recompute sketch + truth independently of the catalog query
    val full = graft.core.Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy(col("l_returnflag"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))

    // group keys: catalog rows and the independent recomputation agree
    assert(out.map(_.getString(0)).toList == full.map(_._1).toList)
    out.zip(full).foreach { case (r, (_, _, exact)) =>
      // the exact column IS the exact distinct count
      assert(r.getLong(1) == exact, s"exact drifted: $r vs $exact")
    }
    full.foreach { case (k, approx, exact) =>
      // approx_count_distinct(rsd = 0.02): allow 5x the configured rsd —
      // the estimate is deterministic for fixed data, this guards gross
      // breakage (wrong column, wrong key) without pinning sketch internals
      val rel = math.abs(approx - exact).toDouble / exact
      assert(rel < 0.10, s"$k approx $approx vs exact $exact (rel err $rel)")
    }
  }
}
