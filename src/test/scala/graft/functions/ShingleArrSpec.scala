package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class ShingleArrSpec extends SparkSuite {

  /** The relational twin the expression replaces: guarded
    * array_distinct(transform(...)) — first-occurrence distinct n-grams. */
  private def relational(texts: Seq[(Long, String)], n: Int) = {
    import spark.implicits._
    val lam = (1 to n).map(k => s"element_at(w, i + ${k - 1})").mkString(", ")
    texts.toDF("id", "text")
      .withColumn("w", split(trim($"text"), graft.core.Tok.Ws))
      .select($"id", expr(
        s"""CASE WHEN size(w) >= $n THEN
           |  array_distinct(transform(sequence(1, size(w) - ${n - 1}),
           |    i -> concat_ws(' ', $lam)))
           |ELSE array() END""".stripMargin).as("sarr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
  }

  private def viaExpr(texts: Seq[(Long, String)], n: Int) = {
    import spark.implicits._
    texts.toDF("id", "text")
      .select($"id", ShingleArr(split(trim($"text"), graft.core.Tok.Ws), n).as("sarr"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
  }

  test("expression equals the relational HOF form, order included (n=3 and n=5)") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val texts = (1L to 300L).map { i =>
      i -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for (n <- Seq(3, 5))
      assert(viaExpr(texts, n) == relational(texts, n))
  }

  test("total on short/empty docs: no ANSI error, empty array — even under explode") {
    import spark.implicits._
    val texts = Seq(1L -> "", 2L -> "one", 3L -> "one two", 4L -> "a b c")
    assert(viaExpr(texts, 3) == Map(1L -> Nil, 2L -> Nil, 3L -> Nil, 4L -> List("a b c")))
    // the crash shape that motivated the expression: generator input is
    // evaluated ahead of any filter, so totality must hold under explode
    val exploded = texts.toDF("id", "text")
      .select($"id", explode(ShingleArr(split(trim($"text"), graft.core.Tok.Ws), 3)).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(exploded == Set((4L, "a b c")))
  }

  test("duplicate shingles collapse to first occurrence") {
    val texts = Seq(1L -> "x y z x y z x y z")
    // windows: "x y z","y z x","z x y","x y z","y z x","z x y","x y z"
    assert(viaExpr(texts, 3)(1L) == List("x y z", "y z x", "z x y"))
  }
}
