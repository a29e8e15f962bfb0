package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimHashMd5Spec extends SparkSuite {

  /** The relational twin the oracle mirrors: explode words → 32-bit md5
    * prefix → 32 conditional sums → bit recombine. */
  private def relational(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    val vAggs = (0 until 32).map(d =>
      sum(when(shiftright($"h", d).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"v$d"))
    val sig = (0 until 32)
      .map(d => when(col(s"v$d") > 0, lit(1L << d)).otherwise(lit(0L)))
      .reduce(_ + _)
    texts.toDF("id", "text")
      .select($"id", explode(split(trim($"text"), graft.core.Tok.Ws)).as("w"))
      .withColumn("h", conv(substring(md5($"w".cast("binary")), 1, 8), 16, 10).cast("long"))
      .groupBy($"id").agg(vAggs.head, vAggs.tail: _*)
      .select($"id", sig.as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def viaExpr(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("id", "text")
      .select($"id", SimHashMd5(split(trim($"text"), graft.core.Tok.Ws)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("expression signatures equal the relational pipeline bit-for-bit") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("the", "quick", "brown", "fox", "jumps", "over",
      "lazy", "dog", "alpha", "beta", "gamma", "delta")
    val texts = (1L to 200L).map { i =>
      i -> Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(viaExpr(texts) == relational(texts))
  }

  /** d04's relational 16-bit form: explode words → first 16 HEX DIGITS of
    * md5 → per-digit high-bit (+1/-1) sums → bit recombine. */
  private def relational16(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    val vAggs = (0 until 16).map { dd =>
      val digit = substring($"hx", dd + 1, 1)
      sum(when(digit.isin("8", "9", "a", "b", "c", "d", "e", "f"), 1)
        .otherwise(-1)).as(s"v$dd")
    }
    val sig = (0 until 16)
      .map(dd => when(col(s"v$dd") > 0, lit(1L << dd)).otherwise(lit(0L)))
      .reduce(_ + _)
    texts.toDF("id", "text")
      .select($"id", explode(split(trim($"text"), graft.core.Tok.Ws)).as("w"))
      .withColumn("hx", substring(md5($"w".cast("binary")), 1, 16))
      .groupBy($"id").agg(vAggs.head, vAggs.tail: _*)
      .select($"id", sig.as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("16-bit expression equals d04's relational hex-digit pipeline bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val vocab = Vector("key", "agg", "row", "scan", "slow", "fast", "table",
      "value", "part", "hash", "merge", "batch")
    val texts = (1L to 200L).map { i =>
      i -> Seq.fill(1 + rnd.nextInt(40))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val viaExpr16 = texts.toDF("id", "text")
      .select($"id", SimHashMd516(split(trim($"text"), graft.core.Tok.Ws)).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaExpr16 == relational16(texts))
    viaExpr16.values.foreach(v => assert(v >= 0L && v <= 0xffffL))
  }

  test("signature properties: empty array is 0, identical texts collide, sign flips bits") {
    import spark.implicits._
    // empty token array → 0 (no accumulators positive)
    val z = Seq(1L -> "x").toDF("id", "text")
      .select(SimHashMd5(array().cast("array<string>")).as("sh"))
      .head().getLong(0)
    assert(z == 0L)
    val sig = viaExpr(Seq(1L -> "a b c d", 2L -> "a b c d", 3L -> "totally different words here"))
    assert(sig(1L) == sig(2L))
    assert(sig(1L) != sig(3L))
    // 32-bit range
    sig.values.foreach(v => assert(v >= 0L && v <= 0xffffffffL))
  }
}
