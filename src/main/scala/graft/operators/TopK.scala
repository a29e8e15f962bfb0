package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable per-key top-k: two-phase ranking.
  *
  * The naive `row_number().over(partitionBy(key))` shuffles EVERY candidate
  * row to one reducer per key — with few keys (e.g. 5 ANN queries against a
  * billion-vector table) that is a catastrophic skew at 100 TB. Phase 1
  * ranks within (key, salt) sub-partitions and keeps each sub-partition's
  * top k (shrinking the data to keys × buckets × k rows); phase 2 ranks the
  * survivors per key. The global top k of the union of per-salt top k's is
  * exactly the global top k, so the result is identical to the naive
  * window — only the shuffle layout changes.
  *
  * The ordering must be total (include a unique tie-break column) for the
  * result to be deterministic.
  */
object TopK {

  def perKey(
      df: DataFrame,
      key: Column,
      ordering: Seq[Column],
      k: Int,
      saltFrom: Column,
      buckets: Int = 16,
      rankName: String = "rn"): DataFrame = {
    val salted = df.withColumn("__salt", pmod(hash(saltFrom), lit(buckets)))
    val w1 = Window.partitionBy(key, col("__salt")).orderBy(ordering: _*)
    val w2 = Window.partitionBy(key).orderBy(ordering: _*)
    salted
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
      .drop("__r1", "__salt")
      .withColumn(rankName, row_number().over(w2))
      .filter(col(rankName) <= k)
  }
}
