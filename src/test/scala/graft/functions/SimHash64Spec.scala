package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

class SimHash64Spec extends SparkSuite {

  private def sig(text: String): Long = {
    import spark.implicits._
    Seq(text).toDF("t")
      .select(SimHash64(split(trim($"t"), "\\s+")).as("s"))
      .head().getLong(0)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("deterministic across invocations and plans") {
    val t = "the quick brown fox jumps over the lazy dog"
    assert(sig(t) == sig(t))
    // batch path (codegen over many rows) agrees with single-row path
    import spark.implicits._
    val batch = Seq(t, t, "other words entirely unrelated content").toDF("t")
      .select(SimHash64(split(trim($"t"), "\\s+")).as("s"))
      .collect().map(_.getLong(0))
    assert(batch(0) == batch(1) && batch(0) == sig(t))
  }

  test("near-duplicate texts have smaller Hamming distance than unrelated texts") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    val nearDup = base.replace("delta", "delta2")       // one token changed
    val unrelated = "one two three four five six seven eight nine ten " * 3
    val (s0, s1, s2) = (sig(base), sig(nearDup), sig(unrelated))
    assert(hamming(s0, s1) < hamming(s0, s2),
      s"near=${hamming(s0, s1)} vs unrelated=${hamming(s0, s2)}")
    assert(hamming(s0, s1) <= 16)
  }

  test("SimHashMd564: golden values from an independent (Python hashlib) reference") {
    import spark.implicits._
    // int.from_bytes(md5(w).digest()[:8],'big') +1/-1 accumulation, two's
    // complement — the same construction the DuckDB oracle replays in SQL
    val got = Seq(Seq("hello", "world"), Seq("the", "quick", "brown", "fox"))
      .map(ws => Seq(Tuple1(ws)).toDF("w")
        .select(SimHashMd564($"w")).head().getLong(0))
    assert(got == Seq(6719652267731058694L, 1140660199213328064L))
  }

  test("SimHashMd564: null/empty semantics match SimHash64") {
    import spark.implicits._
    assert(Seq(Tuple1(Seq.empty[String])).toDF("w")
      .select(SimHashMd564($"w")).head().getLong(0) == 0L)
    assert(Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("w")
      .select(SimHashMd564($"w")).head().isNullAt(0))
    val withNull = Seq(Tuple1(Seq("a", null, "b"))).toDF("w")
      .select(SimHashMd564($"w")).head().getLong(0)
    val without = Seq(Tuple1(Seq("a", "b"))).toDF("w")
      .select(SimHashMd564($"w")).head().getLong(0)
    assert(withNull == without)
  }

  test("null and empty semantics") {
    import spark.implicits._
    assert(Seq(Tuple1(Seq.empty[String])).toDF("w")
      .select(SimHash64($"w")).head().getLong(0) == 0L)
    val nullRow = Seq(Tuple1(null.asInstanceOf[Seq[String]])).toDF("w")
      .select(SimHash64($"w")).head()
    assert(nullRow.isNullAt(0))
    // null tokens are skipped, not poisonous
    val withNull = Seq(Tuple1(Seq("a", null, "b"))).toDF("w")
      .select(SimHash64($"w")).head().getLong(0)
    val without = Seq(Tuple1(Seq("a", "b"))).toDF("w")
      .select(SimHash64($"w")).head().getLong(0)
    assert(withNull == without)
  }
}
