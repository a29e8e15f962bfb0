package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the LATEST right row with the
  * same key whose time is <= the left time (optionally within a tolerance
  * window) — the standard "state of the dimension as of the event" join
  * (prices at trade time, user profile at event time).
  *
  * Spark has no native as-of join; per the custom-operator preference
  * ladder this is case (a): composed from built-ins — a range-condition
  * equi-join plus a per-left-row ranking window — so Catalyst still plans,
  * pushes filters, and broadcasts freely. No custom Strategy needed.
  *
  * Scale notes: the join is keyed, so it shuffles both sides by key once;
  * the tolerance bound keeps the match fan-out finite (without it a hot
  * key's entire right history joins every left row before ranking). At
  * 100 TB always pass a tolerance matched to the right side's update
  * cadence; for sorted-bucketed tables this becomes a merge within
  * buckets.
  *
  * Left rows with no match survive with null right columns (left outer).
  *
  * When two right rows share the same key AND timestamp, the winner is
  * decided by `rightTieBreak` (descending), so the result is deterministic
  * across runs and partitionings — the repo-wide total-order rule. The
  * default tie-break is every right column in name order, total as long
  * as the right side has no fully-duplicate rows; pass an explicit unique
  * right-row id when it might.
  *
  * @param leftId a column uniquely identifying left rows (needed to rank
  *               matches per left row)
  * @param rightTieBreak columns of `right` breaking equal-timestamp ties
  *                      (highest wins); default = all right columns
  */
object AsOfJoin {

  def asOf(
      left: DataFrame,
      right: DataFrame,
      leftId: Column,
      key: (Column, Column),
      time: (Column, Column),
      tolerance: Option[Column] = None,
      rightTieBreak: Seq[Column] = Nil): DataFrame = {
    val (lk, rk) = key
    val (lt, rt) = time
    val cond = lk === rk && rt <= lt &&
      tolerance.map(tol => rt >= lt - tol).getOrElse(lit(true))
    val joined = left.join(right, cond, "left_outer")
    val tieBreak =
      if (rightTieBreak.nonEmpty) rightTieBreak
      else right.columns.sorted.toSeq.map(right(_))
    val order = (rt +: tieBreak).map(_.desc_nulls_last)
    val w = Window.partitionBy(leftId).orderBy(order: _*)
    joined
      .withColumn("__asof_rn", row_number().over(w))
      .filter(col("__asof_rn") === 1)
      .drop("__asof_rn")
  }
}
