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
    * are never multiplied, so there is nothing to rank.
    *
    * Match semantics are identical to [[asOf]] in the corners too: the
    * whole matched right row travels as ONE struct (`last(ignoreNulls)`
    * per-column would stitch together values from different right rows
    * whenever the true match holds a null), rows with a null join key or
    * null right time never match (like `lk === rk` / `rt <= lt` under SQL
    * null semantics), and tie-break expressions are pre-projected so any
    * Column of `right` works. */
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
    val tieBreak = if (rightTieBreak.nonEmpty) rightTieBreak else rCols.sorted.map(right(_))
    // The matched right row travels as one struct (atomic pick); __rt
    // rides inside it for the tolerance check and the tie-break
    // expressions ride inside as __tbN — each value crosses the operator's
    // single shuffle exactly once. Left rows carry a NULL struct — not a
    // struct of nulls — so last(ignoreNulls) skips them, and their null
    // __r.__tbN fields order harmlessly (side already separates them).
    val tbNames = tieBreak.indices.map(i => s"__tb$i")
    val rStruct = struct(rCols.map(col) ++ Seq(rt.as("__rt")) ++
      tieBreak.zip(tbNames).map { case (c, n) => c.as(n) }: _*)
    val rStructType = right.select(rStruct.as("__r")).schema.head.dataType
    val leftTagged = left.select(
      lCols.map(col) ++
        Seq(lit(1).as("__side"), lk.as("__k"), lt.as("__t"),
          lit(null).cast(rStructType).as("__r")): _*)
    val rightTagged = right
      // a null key or null time can never match (SQL comparison semantics
      // in asOf); dropping the rows also keeps them out of the null-key
      // window partition, which would otherwise pair null with null
      .filter(rk.isNotNull && rt.isNotNull)
      .select(
        lCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          Seq(lit(0).as("__side"), rk.as("__k"), rt.as("__t"), rStruct.as("__r")): _*)
    // Sort: right rows precede a left row at the same time (<= semantics),
    // and among tied right rows the best tie-break sorts LAST so the
    // running last() picks it.
    val order = col("__t").asc +: col("__side").asc +:
      tbNames.map(n => col(s"__r.$n").asc_nulls_first)
    val w = Window.partitionBy(col("__k")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val swept = leftTagged.unionByName(rightTagged)
      .select(
        lCols.map(col) ++ Seq(col("__side"), col("__k"), col("__t"),
          last(col("__r"), ignoreNulls = true).over(w).as("__r")): _*)
      .filter(col("__side") === 1)
    // a left row with a null key or null time matches nothing (asOf's
    // join condition is null-rejecting on both)
    val matched = col("__r").isNotNull && col("__k").isNotNull && col("__t").isNotNull
    val inTol = tolerance match {
      case Some(tol) => matched && col("__r.__rt") >= col("__t") - tol
      case None => matched
    }
    swept.select(
      lCols.map(col) ++ rCols.map(c => when(inTol, col(s"__r.$c")).as(c)): _*)
  }
}
