package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join via bin bucketing.
  *
  * Spark plans a pure non-equi join (`p BETWEEN lo AND hi`) as
  * BroadcastNestedLoopJoin — fine when one side is tiny (q37's band join),
  * but O(|points| × |intervals|) work when BOTH sides are large: at 100 TB
  * with millions of intervals a nested loop never finishes. The standard
  * fix (what a range-join hint does in engines that have one) is to
  * discretize the domain into fixed-width bins: each interval is exploded
  * to the bins it overlaps, each point maps to exactly ONE bin, and the
  * join becomes an EQUI-join on the bin id with the exact `BETWEEN` kept
  * as a residual filter. Catalyst is then free to pick hash or sort-merge
  * and to co-partition both sides on the bin — no nested loop anywhere.
  *
  * Correctness: a point p in interval [lo, hi] has bin(p) ∈
  * [bin(lo), bin(hi)], so the matching (point, interval) pair meets on
  * that bin; a point meets a given interval on at most its one bin, so no
  * duplicates are produced and no dedup pass is needed.
  *
  * Cost model: interval rows replicate by ceil(span / binWidth) + 1 — pick
  * `binWidth` near the typical interval span so the blow-up is ~2×; bins
  * also bound skew (a bin's population is its time-slice's traffic, not
  * the whole table). The residual filter runs inside the join's generated
  * code — non-matching same-bin pairs die before leaving the operator.
  */
object RangeJoin {

  /** Join `points` to the `intervals` rows whose [loCol, hiCol] (both
    * inclusive) contain `pointCol`. All three columns must be numeric on
    * one shared axis (e.g. epoch minutes). Emits all columns of both
    * inputs; the internal bin column is dropped. */
  private val binSeq = new java.util.concurrent.atomic.AtomicLong()

  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // a same-named column on the intervals side would make the output's
    // pointCol ambiguous to downstream name-based resolution — reject
    // loudly rather than emit a frame with duplicate names
    require(!intervals.columns.contains(pointCol),
      s"intervals side must not carry the point column '$pointCol'")
    // uniquified temp name: withColumn REPLACES an existing column, so a
    // fixed "__bin" would silently clobber user data on either input
    val bin = s"__graft_bin_${binSeq.incrementAndGet()}"
    require(!points.columns.contains(bin) && !intervals.columns.contains(bin),
      s"internal bin column '$bin' collides with an input column")
    val ip = intervals.withColumn(bin, explode(sequence(
      floor(col(loCol) / binWidth).cast("long"),
      floor(col(hiCol) / binWidth).cast("long"))))
    val pp = points.withColumn(bin,
      floor(col(pointCol) / binWidth).cast("long"))
    pp.join(ip, pp(bin) === ip(bin)
        && pp(pointCol) >= ip(loCol) && pp(pointCol) <= ip(hiCol))
      .drop(bin)
  }
}
