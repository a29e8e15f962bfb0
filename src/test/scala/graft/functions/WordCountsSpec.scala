package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class WordCountsSpec extends SparkSuite {

  /** The relational twin the expression replaces: the per-doc
    * groupBy(id, word) wordcount — multiset equality is the contract
    * (the expression additionally pins first-occurrence order, which
    * callers never rely on). */
  private def relational(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("id", "text")
      .select($"id", explode(split(trim($"text"), graft.core.Tok.Ws)).as("t"))
      .groupBy($"id", $"t").agg(count(lit(1)).as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  private def viaExpr(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("id", "text")
      .select($"id", explode(WordCounts(split(trim($"text"), graft.core.Tok.Ws))).as("wc"))
      .select($"id", $"wc.t", $"wc.tf")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
  }

  test("expression equals the groupBy wordcount on random texts") {
    val rnd = new scala.util.Random(31)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val texts = (1L to 300L).map { i =>
      i -> Seq.fill(1 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(viaExpr(texts) == relational(texts))
  }

  test("first-occurrence order, exact counts, dl identity") {
    import spark.implicits._
    val texts = Seq(1L -> "b a b c a b")
    val rows = texts.toDF("id", "text")
      .select(WordCounts(split(trim($"text"), graft.core.Tok.Ws)).as("wc"))
      .selectExpr("transform(wc, e -> e.t) AS ts", "transform(wc, e -> e.tf) AS tfs")
      .collect()
    assert(rows(0).getSeq[String](0) == Seq("b", "a", "c"))
    assert(rows(0).getSeq[Long](1) == Seq(3L, 2L, 1L))
    // sum(tf) == size(words): dl may ride the row instead of re-aggregating
    assert(rows(0).getSeq[Long](1).sum == 6L)
  }

  test("total under explode: empty-ish docs yield no rows, no ANSI error") {
    import spark.implicits._
    // trim+split on "" yields [""], one empty-string word — same as the
    // relational explode; a genuinely empty ARRAY yields no rows
    val viaEmptyArr = Seq(1L).toDF("id")
      .select($"id", explode(WordCounts(array().cast("array<string>"))).as("wc"))
      .collect()
    assert(viaEmptyArr.isEmpty)
    assert(viaExpr(Seq(1L -> "")) == Map((1L, "") -> 1L))
  }
}
