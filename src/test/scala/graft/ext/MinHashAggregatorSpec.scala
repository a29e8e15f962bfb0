package graft.ext

import graft.SparkSuite

class MinHashAggregatorSpec extends SparkSuite {

  test("aggregator signature equals the scala-computed reference") {
    import spark.implicits._
    val hashes: Seq[(Long, Long)] = Seq(
      (1L, 17L), (1L, 98234L), (1L, 555L),
      (2L, 17L), (2L, 42L))
    val got = hashes.toDS()
      .groupByKey(_._1)
      .agg(new MinHashAggregator().toColumn.name("sig"))
      .collect().toMap

    def expected(hs: Seq[Long]): Seq[Long] =
      (0 until 8).map { j =>
        hs.map(h => (Dedup.MinhashA(j) * h + Dedup.MinhashB(j)) % Dedup.MinhashP).min
      }
    assert(got(1L).toSeq == expected(Seq(17L, 98234L, 555L)))
    assert(got(2L).toSeq == expected(Seq(17L, 42L)))
  }

  test("merge semantics: partial buffers combine to the same signature") {
    val agg = new MinHashAggregator()
    val all = Seq(17L, 98234L, 555L, 42L)
    val whole = all.foldLeft(agg.zero) { (b, h) => agg.reduce(b, (1L, h)) }
    val (l, r) = all.splitAt(2)
    val merged = agg.merge(
      l.foldLeft(agg.zero) { (b, h) => agg.reduce(b, (1L, h)) },
      r.foldLeft(agg.zero) { (b, h) => agg.reduce(b, (1L, h)) })
    assert(whole.toSeq == merged.toSeq)
  }

  test("estimate: identical signatures -> 1.0, disjoint -> low") {
    val agg = new MinHashAggregator()
    val a = Array.tabulate(8)(_.toLong)
    assert(agg.estimate(a, a.clone()) == 1.0)
    assert(agg.estimate(a, Array.tabulate(8)(i => (i + 100).toLong)) == 0.0)
  }
}
