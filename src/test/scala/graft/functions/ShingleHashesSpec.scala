package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ShingleHashesSpec extends SparkSuite {

  /** The relational twin: per-position md5-prefix ints via HOFs — the t09
    * conv(substr(md5(...),1,15),16,10) parity trick, one per window. */
  private def relational(texts: Seq[(Long, String)], n: Int) = {
    import spark.implicits._
    val lam = (1 to n).map(k => s"element_at(w, i + ${k - 1})").mkString(", ")
    texts.toDF("id", "text")
      .withColumn("w", split(trim($"text"), graft.core.Tok.Ws))
      .select($"id", expr(
        s"""CASE WHEN size(w) >= $n THEN
           |  transform(sequence(1, size(w) - ${n - 1}),
           |    i -> cast(conv(substr(md5(concat_ws(' ', $lam)), 1, 15), 16, 10) AS BIGINT))
           |ELSE array() END""".stripMargin).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
  }

  private def viaExpr(texts: Seq[(Long, String)], n: Int) = {
    import spark.implicits._
    texts.toDF("id", "text")
      .select($"id", ShingleHashes(split(trim($"text"), graft.core.Tok.Ws), n).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
  }

  test("expression equals the relational md5-prefix form, position order included") {
    val rnd = new scala.util.Random(41)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val texts = (1L to 300L).map { i =>
      i -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (n <- Seq(3, 5))
      assert(viaExpr(texts, n) == relational(texts, n))
  }

  test("total on short/empty docs: empty array, no ANSI error — even under posexplode") {
    import spark.implicits._
    val texts = Seq(1L -> "", 2L -> "one", 3L -> "one two", 4L -> "a b c d")
    val got = viaExpr(texts, 3)
    assert(got(1L).isEmpty && got(2L).isEmpty)
    assert(got(3L).isEmpty, "2 words < n=3 must yield no windows")
    assert(got(4L).size == 2, "4 words, n=3 → windows at positions 1 and 2")
    val exploded = texts.toDF("id", "text")
      .select($"id",
        posexplode(ShingleHashes(split(trim($"text"), graft.core.Tok.Ws), 3)).as(Seq("p", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1))).toList
    assert(exploded == List((4L, 0), (4L, 1)))
  }

  test("repeated windows repeat in the output — positions are NOT collapsed") {
    // the positional contract ShingleArr cannot provide: "x y z" occurs at
    // positions 1, 4 and 7, and must hash identically at each
    val hs = viaExpr(Seq(1L -> "x y z x y z x y z"), 3)(1L)
    assert(hs.size == 7)
    assert(hs(0) == hs(3) && hs(3) == hs(6))
    assert(hs.distinct.size == 3)
  }

  test("null words skip like concat_ws: hash equals the null-free window's") {
    import spark.implicits._
    val withNull = spark.range(1).select(
      ShingleHashes(array(lit("a"), when(lit(false), "x"), lit("b")), 3).as("hs"))
      .collect().head.getSeq[Long](0)
    val dense = viaExpr(Seq(1L -> "a b"), 2)(1L)
    assert(withNull == dense, "concat_ws(' ', a, NULL, b) == 'a b' in both engines")
  }
}
