package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation via salting: split each hot key across `buckets`
  * sub-keys, aggregate partially per (key, salt), then merge per key.
  *
  * When to reach for this at 100 TB:
  *  - A grouped aggregation with **few, huge keys** (here: 5 event types
  *    over the whole events stream). Spark's hash aggregate already does
  *    map-side partial aggregation for algebraic functions, but the final
  *    merge still lands one reducer per key — with 5 keys, 5 tasks own the
  *    entire merge. Salting fans the merge out to `keys × buckets` tasks.
  *  - Holistic aggregates (exact distinct, percentiles, collect_*) where
  *    map-side combine cannot shrink the hot key's data.
  *  - Skewed joins: salt the skewed side, explode the other side × salt
  *    (AQE's skew-join handles the sort-merge case automatically; salting
  *    is the manual fallback and works for aggregations too).
  *
  * The salt is derived from a uniform row attribute, NOT the key, so the
  * result is exactly the plain aggregation's result — only the shuffle
  * layout changes. All provided merges are algebraic (sum of partials), so
  * correctness is independent of the salt assignment.
  */
object Salted {

  /** Deterministic per-row salt in [0, buckets): hash of the given columns.
    * Use columns uncorrelated with the group key (e.g. a row id). */
  def salt(buckets: Int, cols: Column*): Column =
    pmod(hash(cols: _*), lit(buckets))

  /** Salted count + sum: two-phase `(key, salt) → key`. Result is identical
    * to `df.groupBy(key).agg(count, sum(value))`. */
  def countSumByKey(
      df: DataFrame,
      key: Column,
      value: Column,
      saltCol: Column,
      countName: String = "n",
      sumName: String = "total"): DataFrame = {
    val partial = df
      .groupBy(key.as("__key"), saltCol.as("__salt"))
      .agg(count(lit(1)).as("__pn"), sum(value).as("__psum"))
    partial
      .groupBy(col("__key"))
      .agg(sum(col("__pn")).as(countName), sum(col("__psum")).as(sumName))
  }

  /** Salted exact distinct-count: global dedup of (key, value) pairs is
    * itself a salted-safe shuffle (keyed by both), then a count per key.
    * Equivalent to `count_distinct(value)` per key, without a single
    * reducer ever seeing a hot key's full value set. */
  def distinctCountByKey(
      df: DataFrame,
      key: Column,
      value: Column,
      name: String = "n_distinct"): DataFrame =
    df.select(key.as("__key"), value.as("__val"))
      .distinct()
      .groupBy(col("__key"))
      .agg(count(lit(1)).as(name))
}
