package graft.relational

import graft.SparkSuite
import graft.core.Tables

/** Typed row models for the Dataset[T] API surface (README: "Dataset[T]
  * where type safety helps"). */
case class LineItem(
    l_returnflag: String, l_linestatus: String,
    l_quantity: Double, l_extendedprice: Double)

case class FlagStats(
    l_returnflag: String, l_linestatus: String, sum_qty: Double, n: Long)

/** The typed Dataset API produces the same results as the DataFrame plans —
  * compile-time field checks without semantic drift. */
class TypedApiSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  test("typed groupByKey aggregation matches the DataFrame groupBy result") {
    import spark.implicits._
    import org.apache.spark.sql.functions._

    val li = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity", $"l_extendedprice")

    // typed path: case-class Dataset, exact decimal accumulation in Scala
    val typed = li.as[LineItem]
      .groupByKey(r => (r.l_returnflag, r.l_linestatus))
      .mapGroups { (key: (String, String), rows: Iterator[LineItem]) =>
        var n = 0L
        var qty = BigDecimal(0)
        rows.foreach { r => n += 1; qty += BigDecimal(r.l_quantity).setScale(2) }
        FlagStats(key._1, key._2, qty.toDouble, n)
      }
      .collect().map(s => (s.l_returnflag, s.l_linestatus) -> (s.sum_qty, s.n)).toMap

    // DataFrame path: the engine's standard decimal-sum pattern
    val frame = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(round(sum($"l_quantity".cast("decimal(14,2)")), 2).cast("double").as("sum_qty"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getDouble(2), r.getLong(3))).toMap

    assert(typed == frame)
  }

  test("typed filter + map pipeline: compile-checked field access") {
    import spark.implicits._
    val top = Tables.lineitem(spark, sf)
      .select($"l_returnflag", $"l_linestatus", $"l_quantity", $"l_extendedprice")
      .as[LineItem]
      .filter(_.l_quantity > 45.0)
      .map(r => r.l_extendedprice * r.l_quantity)
      .collect()
    assert(top.nonEmpty && top.forall(_ > 0))
  }
}
