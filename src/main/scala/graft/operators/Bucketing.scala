package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table utilities: pre-shuffle data once at write time so that
  * every subsequent equi-join or aggregation on the bucket key runs with
  * NO exchange at read time.
  *
  * This is the single biggest lever for a 100 TB star schema: `lineitem`
  * and `orders` bucketed by orderkey join with zero shuffle, forever, at
  * the cost of one write-side shuffle. Rules of thumb:
  *  - bucket count ≈ (table size / target partition size), a multiple of
  *    the cluster's parallelism; both join sides need the SAME count (or
  *    one a divisor of the other with
  *    `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  *  - `sortBy` the bucket key too: sort-merge joins then skip the sort.
  *  - high-cardinality keys only; skewed keys still need salting first.
  */
object Bucketing {

  /** Write `df` as a bucketed (+ sorted) managed table. */
  def writeBucketed(
      df: DataFrame,
      table: String,
      key: String,
      buckets: Int,
      sorted: Boolean = true): Unit = {
    val w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w).saveAsTable(table)
  }

  /** Join two tables bucketed on the same key: planner sees compatible
    * output partitioning on both sides and elides both exchanges. */
  def cocolocatedJoin(
      spark: SparkSession,
      left: String,
      right: String,
      key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
