package graft.operators

import graft.SparkSuite
import graft.core.Tables

/** Bucketed co-located join: the join on the bucket key must plan with no
  * shuffle exchange on either side. */
class BucketingSpec extends SparkSuite {

  test("bucketed tables join without exchanges") {
    val sf = "/root/testdata/sf0.001"
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  // force SMJ path
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
          .withColumnRenamed("o_orderkey", "orderkey"),
        "b_orders", "orderkey", 4)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
          .withColumnRenamed("l_orderkey", "orderkey"),
        "b_lineitem", "orderkey", 4)
      val joined = Bucketing.cocolocatedJoin(spark, "b_orders", "b_lineitem", "orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected no shuffle, got:\n$plan")
      assert(joined.count() > 0)

      // contrast: the same join over plain parquet DOES shuffle both sides
      val o = Tables.orders(spark, sf)
      val l = Tables.lineitem(spark, sf)
      val plain = o.join(l, o("o_orderkey") === l("l_orderkey"))
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
