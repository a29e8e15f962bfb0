package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The two-phase salted top-k must equal the naive single-window ranking
  * row-for-row — the whole point of the operator is changing the shuffle
  * layout without changing the answer. */
class TopKSpec extends SparkSuite {

  test("perKey equals the naive ranking window on randomized skewed data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // skewed: key 0 holds half the rows — exactly the case the salt exists for
    val rows = (1 to 4000).map { i =>
      val key = if (rnd.nextBoolean()) 0L else rnd.nextInt(7).toLong
      (i.toLong, key, rnd.nextInt(500))
    }
    val df = rows.toDF("id", "k", "score")
    val ordering = Seq($"score".desc, $"id".asc) // total order via id
    for (k <- Seq(1, 3, 10)) {
      val two = TopK.perKey(df, $"k", ordering, k, saltFrom = $"id")
        .select($"k", $"id", $"rn")
        .collect().map(_.toSeq).toSet
      val naive = df
        .withColumn("rn", row_number().over(
          Window.partitionBy($"k").orderBy(ordering: _*)))
        .filter($"rn" <= k)
        .select($"k", $"id", $"rn")
        .collect().map(_.toSeq).toSet
      assert(two == naive, s"k=$k: salted two-phase diverged from naive window")
    }
  }

  test("perKey with more buckets than rows per key still returns full top-k") {
    import spark.implicits._
    val df = Seq((1L, 1L, 5), (2L, 1L, 9), (3L, 1L, 7)).toDF("id", "k", "score")
    val got = TopK.perKey(df, $"k", Seq($"score".desc, $"id"), 3,
        saltFrom = $"id", buckets = 64)
      .select($"id", $"rn").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == Set((2L, 1), (3L, 2), (1L, 3)))
  }
}
