package graft.ext

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator: folds a stream of shingle hashes into
  * the 8-permutation signature `[min_j (A_j*h + B_j) mod P]`.
  *
  * The Dataset-API twin of the signature stage inside
  * [[Dedup]]'s `d03_dedup_minhash_lsh` (same constants → identical
  * signatures). As an [[Aggregator]] it is mergeable — Spark runs it with
  * map-side partial aggregation, so at 100 TB each executor folds its local
  * shingles and only `numPerms` longs per document cross the shuffle.
  *
  * {{{
  *   val sigs = shingleHashes                       // Dataset[(docId, h)]
  *     .groupByKey(_._1)
  *     .agg(new MinHashAggregator().toColumn.name("sig"))
  * }}}
  */
class MinHashAggregator(numPerms: Int = 8)
  extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
  require(numPerms > 0 && numPerms <= Dedup.MinhashA.size,
    s"numPerms must be in [1, ${Dedup.MinhashA.size}]")

  override def zero: Array[Long] = Array.fill(numPerms)(Long.MaxValue)

  override def reduce(buf: Array[Long], in: (Long, Long)): Array[Long] = {
    val h = in._2
    var j = 0
    while (j < numPerms) {
      val p = (Dedup.MinhashA(j) * h + Dedup.MinhashB(j)) % Dedup.MinhashP
      if (p < buf(j)) buf(j) = p
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numPerms) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  /** Estimated Jaccard similarity from two signatures. */
  def estimate(a: Array[Long], b: Array[Long]): Double =
    a.zip(b).count { case (x, y) => x == y }.toDouble / numPerms
}
