package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Salted two-phase aggregation must equal the plain aggregation exactly —
  * only the shuffle layout may differ. */
class SaltedSpec extends SparkSuite {

  test("countSumByKey equals plain groupBy on randomized skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map { i =>
      val key = if (rnd.nextInt(10) < 7) "hot" else s"k${rnd.nextInt(4)}"
      (i.toLong, key, rnd.nextInt(1000).toLong)
    }
    val df = rows.toDF("id", "k", "v")
    val salted = Salted.countSumByKey(df, $"k", $"v", Salted.salt(16, $"id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val plain = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("total"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }

  test("distinctCountByKey equals count_distinct per key") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (1 to 3000).map(_ => (s"k${rnd.nextInt(3)}", rnd.nextInt(40)))
      .toDF("k", "v")
    val salted = Salted.distinctCountByKey(df, $"k", $"v")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val plain = df.groupBy($"k").agg(count_distinct($"v").as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain)
  }
}
