package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SparkPlan, QueryExecution}
import org.apache.spark.sql.functions._

/** SCALE.md's most-repeated claim — "bucket both sides on the join key
  * at scale and the join is co-partitioned: ZERO exchange" — as an
  * executable test rather than prose. The local stand-ins the queries
  * use (repartition + persist, e.g. g01/g05's `ed2`) emulate the
  * layout; this spec proves the real mechanism: two tables written
  * `bucketBy` the join key produce a SortMergeJoin whose executed plan
  * contains NO ShuffleExchange on either side, while the identical
  * join over plain parquet exchanges both — the negative control that
  * keeps the assertion honest. Bucket metadata lives in the session
  * catalog (`saveAsTable`); on a real cluster the same DDL against the
  * metastore is the one-time layout cost every nightly join then
  * amortizes. */
class BucketedJoinSpec extends SparkSuite {
  import spark.implicits._

  private def shuffles(plan: SparkPlan): Int =
    plan.collect { case e: ShuffleExchangeExec => e }.size

  private def executed(qe: QueryExecution): SparkPlan = qe.executedPlan

  test("bucketed-by-key tables join with ZERO exchanges; plain parquet shuffles both sides") {
    val sf = "/root/testdata/sf0.001"
    assume(new java.io.File(s"$sf/orders.parquet").exists())
    val orders = graft.core.Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val lineitem = graft.core.Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_suppkey", $"l_quantity")
    // force the join strategy the claim is about: no broadcast rescue,
    // same bucket count as shuffle partitions
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // AQE wraps the plan in AdaptiveSparkPlanExec before execution —
      // inspect the static plan (PlanShapeSpec's convention)
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "true") {
      orders.write.mode("overwrite")
        .bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("graft_b_orders")
      lineitem.write.mode("overwrite")
        .bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("graft_b_lineitem")
      try {
        val bucketed = spark.table("graft_b_orders")
          .join(spark.table("graft_b_lineitem"),
            $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey").agg(sum($"l_quantity").as("q"))
        // the join itself must be exchange-free: the ONLY permitted
        // shuffle is the post-join o_custkey aggregation
        val bPlan = executed(bucketed.queryExecution)
        assert(shuffles(bPlan) == 1,
          s"bucketed join should shuffle only for the final agg:\n$bPlan")
        // negative control — identical join over plain parquet pays an
        // exchange per side (proves the assertion above is not vacuous)
        val plain = orders.join(lineitem, $"o_orderkey" === $"l_orderkey")
          .groupBy($"o_custkey").agg(sum($"l_quantity").as("q"))
        val pPlan = executed(plain.queryExecution)
        assert(shuffles(pPlan) == 3,
          s"plain join should exchange both sides + the agg:\n$pPlan")
        // and the two plans agree on the answer
        val a = bucketed.orderBy($"o_custkey").collect().toSeq
        val b = plain.orderBy($"o_custkey").collect().toSeq
        assert(a == b, "bucketed and plain joins disagree")
      } finally {
        spark.sql("DROP TABLE IF EXISTS graft_b_orders")
        spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
      }
    }
  }

  /** Minimal local `withSQLConf` (the Spark test-kit one is private to
    * its source tree): set, run, restore. */
  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f
    finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
