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
  * ladder this is case (a): composed from built-ins. Two implementations
  * with identical semantics:
  *
  *  - [[asOf]] — range-condition equi-join + per-left-row ranking window.
  *    Simple and broadcast-friendly, but every left row joins its key's
  *    whole in-tolerance right history before ranking: fan-out =
  *    O(left × matching-right). Use when a tight tolerance bounds the
  *    history (and at 100 TB ALWAYS pass a tolerance here).
  *  - [[asOfSorted]] — the scale path: union both sides tagged, one
  *    shuffle on the key, one sort on (time, side, tie-break), then a
  *    running `last(ignoreNulls)` picks each left row's match in a single
  *    sweep. NO fan-out — cost is O((|L|+|R|) log) per key regardless of
  *    history density, the same shape Pandas/Flink use for merge_asof.
  *
  * Left rows with no match survive with null right columns (left outer).
  *
  * When two right rows share the same key AND timestamp, the winner is
  * the highest `rightTieBreak` (default: every right column in name
  * order — total as long as the right side has no fully-duplicate rows;
  * pass an explicit unique right-row id when it might). Both
  * implementations apply the same rule, so they are result-identical.
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

  /** Fan-out-free as-of join (see object Scaladoc). Requires disjoint
    * column names between `left` and `right`. No `leftId` needed — rows
    * are never multiplied, so there is nothing to rank. */
  def asOfSorted(
      left: DataFrame,
      right: DataFrame,
      key: (Column, Column),
      time: (Column, Column),
      tolerance: Option[Column] = None,
      rightTieBreak: Seq[Column] = Nil): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq
    require(lCols.intersect(rCols).isEmpty,
      s"asOfSorted needs disjoint column names; clashes: ${lCols.intersect(rCols).mkString(",")}")
    val (lk, rk) = key
    val (lt, rt) = time
    // Tag + align both sides: left rows carry null right columns and vice
    // versa; __t is each row's own event time, __rt additionally carries
    // the right time so the picked match's time is available for the
    // tolerance check without name plumbing.
    val rtType = right.select(rt).schema.head.dataType
    val leftTagged = left.select(
      lCols.map(col) ++
        rCols.map(c => lit(null).cast(right.schema(c).dataType).as(c)) ++
        Seq(lit(1).as("__side"), lk.as("__k"), lt.as("__t"),
          lit(null).cast(rtType).as("__rt")): _*)
    val rightTagged = right.select(
      lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rCols.map(col) ++
        Seq(lit(0).as("__side"), rk.as("__k"), rt.as("__t"), rt.as("__rt")): _*)
    // tie-break columns re-resolved BY NAME against the union (the right
    // side's original attribute ids don't survive the union's output)
    val tieBreak =
      if (rightTieBreak.nonEmpty)
        rightTieBreak.map(c => col(right.select(c).schema.head.name))
      else rCols.sorted.map(col)
    // Sort: right rows precede a left row at the same time (<= semantics),
    // and among tied right rows the best tie-break sorts LAST so the
    // running last() picks it.
    val order = (col("__t").asc +: col("__side").asc +: tieBreak.map(_.asc_nulls_first))
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = leftTagged.unionByName(rightTagged)
      .select(
        (lCols.map(col) :+ col("__side") :+ col("__t")) ++
          (rCols :+ "__rt").map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__side") === 1)
    val inTol = tolerance match {
      case Some(tol) => col("__rt").isNotNull && col("__rt") >= col("__t") - tol
      case None => col("__rt").isNotNull
    }
    swept.select(
      lCols.map(col) ++ rCols.map(c => when(inTol, col(c)).as(c)): _*)
  }
}
