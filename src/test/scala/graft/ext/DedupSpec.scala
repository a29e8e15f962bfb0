package graft.ext

import graft.SparkSuite

/** Invariants of the dedup accounting that the per-row oracle hash cannot
  * express directly (cross-query consistency with the raw corpus). */
class DedupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  test("d10: removal counts reconcile with corpus totals and d01 groups") {
    import org.apache.spark.sql.functions._
    val rows = Dedup.queries("d10_dedup_savings")(spark, sf).collect()
    val docs = graft.core.Tables.documents(spark, sf)
    // per-source docs_total partitions the corpus
    assert(rows.map(_.getLong(1)).sum == docs.count())
    // global dup count = docs - distinct texts (d01's group count)
    val distinctTexts = docs.select(md5(col("text").cast("binary"))).distinct().count()
    assert(rows.map(_.getLong(2)).sum == docs.count() - distinctTexts)
    // fractions are consistent with their own integer columns
    rows.foreach { r =>
      val frac = r.getLong(4).toDouble / r.getLong(3).toDouble
      assert(math.abs(r.getDouble(5) - frac) < 1e-6)
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(4) <= r.getLong(3))
    }
  }
}
