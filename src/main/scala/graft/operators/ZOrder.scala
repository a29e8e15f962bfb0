package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) clustering keys — the data-layout operator behind
  * multi-column data skipping (Delta/Iceberg `OPTIMIZE ZORDER BY`): files
  * clustered by the bit-interleaved key are simultaneously tight in EVERY
  * interleaved dimension, so parquet min/max row-group stats prune scans
  * filtered on ANY of them. A single-column sort gives perfect pruning on
  * one column and none on the others; the Z-curve trades a little of each
  * for usable pruning on all.
  *
  * The interleave is a pure codegen'd integer expression (shifts, masks,
  * adds of disjoint bit positions) — no UDF, engine-portable arithmetic
  * (the DuckDB oracle replays it with the same shifts).
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` (even bit positions) and `y`
    * (odd positions) into a 2·bits-bit Morton code. Disjoint bit
    * positions mean plain addition assembles the code — no overflow, no
    * carries, identical in any engine with integer shifts. */
  def interleave(x: Column, y: Column, bits: Int = 8): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(x, i).bitwiseAND(lit(1)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1)), 2 * i + 1)
    }.reduceLeft(_ + _)

  /** The same interleave as DuckDB SQL text, for oracle replay. */
  def sqlInterleave(x: String, y: String, bits: Int = 8): String =
    (0 until bits).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString(" + ")
}
