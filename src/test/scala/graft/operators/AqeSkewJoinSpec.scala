package graft.operators

import graft.SparkSuite

/** Proof that Spark's runtime skew-join splitting actually FIRES on this
  * engine's session config — the complement to q24's manual salting.
  *
  * The engine leans on two skew tools and SCALE.md tells users when to
  * reach for which:
  *   - AQE skew-join (this spec): a SHUFFLE JOIN whose hot partition is
  *     detected at runtime gets split into sub-partitions, the other
  *     side's matching partition replicated — no query rewrite, no
  *     semantic change, works when the hot key isn't known in advance.
  *   - `Salted` (q24, `SaltedSpec`): AQE only fixes JOINS — a skewed
  *     AGGREGATION (5-key groupBy landing on 5 reducers) needs the
  *     explicit two-phase salt, and a KNOWN hot key in a join feeding
  *     further keyed work can prefer pre-salting to keep layouts stable.
  *
  * This spec plants a hot key (75% of a 400k-row fact on one key),
  * disables broadcast so the join must shuffle, lowers the AQE skew
  * thresholds to harness scale (the defaults target 256 MB partitions),
  * executes, and asserts the FINAL adaptive plan marks the join skewed —
  * i.e. the runtime split genuinely occurred, rather than the config
  * merely being on.
  */
class AqeSkewJoinSpec extends SparkSuite {

  test("AQE splits a planted hot join key at runtime (skew flag in the final plan)") {
    val s = spark
    import org.apache.spark.sql.functions._
    import s.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      // force a shuffle join: a broadcastable side would sidestep the
      // skew machinery entirely (and hide the regression this proves)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // production defaults detect skew at 256 MB partitions; scale the
      // thresholds to the planted ~10 MB hot partition
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "262144")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")

      // fact: 400k rows, 300k of them on key 7 (the hot partition);
      // md5 payload keeps the shuffle blocks incompressible so on-disk
      // partition sizes reflect the row skew. Two lessons this spec
      // ENCODES (each found by running it):
      //  1. the payload must stay LIVE above the join — count(1) alone
      //     column-prunes the scan to bare 8-byte keys, which lz4 then
      //     compresses below any realistic skew threshold;
      //  2. the consumer must not require the join's key distribution —
      //     a groupBy on the SAME key pins hashpartitioning(k) and AQE
      //     (correctly) refuses to split the skewed partition rather
      //     than pay a new exchange. A global aggregate has no
      //     distribution requirement, so the split is free to fire.
      val fact = spark.range(400000)
        .select(
          when($"id" < 300000, lit(7L)).otherwise($"id" % 97).as("k"),
          md5($"id".cast("string")).as("payload"))
      // joinable side but NOT broadcastable (threshold off): 97 keys,
      // 50 rows each — replication of the matching partition is real but
      // the 300k × 50 hot join output stays unit-test-sized
      val dim = spark.range(97 * 50)
        .select(($"id" % 97).as("k"), md5($"id".cast("string")).as("d"))

      val agg = fact.join(dim, "k")
        .select((sum(length($"payload")) + sum(length($"d"))).as("bytes"))
      val total = agg.collect()(0).getLong(0)
      // semantics unchanged by the split: every fact row matches its
      // key's 50 dim rows; both md5 payloads are 32 chars
      assert(total == 400000L * 50 * 32 * 2, s"wrong byte total: $total")

      // the FINAL adaptive plan must carry the skew markers: the join
      // node's skew flag and/or the AQEShuffleRead skewed reader
      val plan = agg.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("skew"),
        s"AQE skew split did not fire — final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
