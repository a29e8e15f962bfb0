package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Cross-query invariants of the text-analysis family that the per-row
  * oracle hash cannot express (consistency between independent censuses
  * of the same corpus). */
class TextAnalysisSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("t10: lexical census reconciles with t07's token totals and itself") {
    val t10 = TextAnalysis.queries("t10_lexical_census")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(t10.nonEmpty)
    // per-source token totals must equal t07's independent count of the
    // same token stream
    val t07 = TextAnalysis.queries("t07_oov_rate")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    t10.foreach { case (src, nTok, vocab, hapax, ttr, hf) =>
      assert(nTok == t07(src), s"$src tokens $nTok != t07 ${t07(src)}")
      // structural sanity: hapax ⊆ vocab ⊆ token instances
      assert(hapax <= vocab && vocab <= nTok, s"$src $hapax/$vocab/$nTok")
      assert(math.abs(ttr - vocab.toDouble / nTok) < 1e-6)
      assert(math.abs(hf - hapax.toDouble / vocab) < 1e-6)
    }
    // the whole-corpus token count partitions across sources
    val docs = graft.core.Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), graft.core.Tok.Ws)).cast("long").as("n"))
      .agg(sum(col("n"))).head().getLong(0)
    assert(t10.map(_._2).sum == docs, "sources must partition the corpus tokens")
  }
}
