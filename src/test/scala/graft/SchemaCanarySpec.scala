package graft

import graft.core.Tables
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

/** Schema-drift canary: the harness regenerates `/root/testdata` between
  * rounds and has already changed physical encodings once (`events.ts`
  * TIMESTAMP(NANOS) → TIMESTAMP(MICROS, NTZ)), which broke 7 queries with
  * 15 scattered failures. This spec reads every harness table at sf0.001
  * and pins the Spark-inferred dtypes, so the next silent regeneration
  * produces ONE clear failure naming the drifted column.
  *
  * `events.ts` is deliberately pinned to the SET of encodings
  * [[Tables.events]] knows how to normalize — drift within that set is
  * handled; drift outside it must scream here first.
  */
class SchemaCanarySpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  /** name -> simpleString dtype, in file order (nullability not pinned —
    * the writer's nullable flags carry no signal for the harness tables). */
  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp"),
    "events" -> Seq("event_id" -> "bigint", "ts" -> "ts-encoding",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  /** Encodings [[Tables.events]] dispatches on; anything else is drift. */
  private val knownTsEncodings = Set("bigint", "timestamp", "timestamp_ntz")

  for (name <- Tables.all) test(s"canary: $name dtypes at sf0.001") {
    val actual = Tables.table(spark, sf, name).schema.fields.toSeq
      .map(f => f.name -> f.dataType.simpleString)
    val exp = expected(name)
    assert(actual.map(_._1) === exp.map(_._1),
      s"$name column set/order drifted")
    for (((col, want), (_, got)) <- exp.zip(actual)) want match {
      case "ts-encoding" =>
        assert(knownTsEncodings.contains(got),
          s"$name.$col drifted to unhandled encoding $got — teach " +
            "Tables.events the new dtype, then add it to knownTsEncodings")
      case _ =>
        // timestamp vs timestamp_ntz both normalize identically under the
        // pinned UTC session TZ for the date-valued TPC-H columns; accept
        // either so an NTZ<->TZ writer flip is not a false alarm.
        val ok = if (want == "timestamp")
          got == "timestamp" || got == "timestamp_ntz"
        else got == want
        assert(ok, s"$name.$col drifted: expected $want, read $got")
    }
  }

  test("canary: documents.text is pure ASCII (byte length == char length)") {
    // The multimodal oracles (m01, m03–m07) compute expected features
    // from CHARACTERS (`ord(substr(text, i, 1))`) while the engine
    // features BYTES of the UTF-8 blob — equal only while the corpus is
    // ASCII. A regeneration that introduces non-ASCII must fail HERE with
    // one clear message, not as a scattered oracle hash mismatch.
    import org.apache.spark.sql.functions._
    // sf0.01 is checked too: it is the scale the driver's oracle gate
    // actually runs at
    for (dir <- Seq(sf, "/root/testdata/sf0.01")
         if new java.io.File(s"$dir/documents.parquet").exists()) {
      val bad = Tables.documents(spark, dir)
        .filter(length(col("text").cast("binary")) =!= length(col("text")))
        .count()
      assert(bad === 0L,
        s"$bad document(s) in $dir contain non-ASCII text — the corpus " +
          "invariant the multimodal char-based oracles rely on has been broken")
    }
  }

  test("canary: every eval doc_id has an embedding (vec_id == doc_id convention)") {
    // t26's rerank (and its DuckDB oracle) link candidates to vectors by
    // the harness convention vec_id == doc_id, and every eval probe
    // (doc_id % 100 == 0) must be embeddable at the SFs the oracle gate
    // runs at — sf0.1 is deliberately EXCLUDED (embeddings there stop at
    // vec_id 1999; the unembedded-probe drop is pinned behavior). A
    // regeneration that breaks the id alignment must fail HERE with one
    // clear message, not as a t26 hash mismatch.
    import org.apache.spark.sql.functions._
    for (dir <- Seq(sf, "/root/testdata/sf0.01")
         if new java.io.File(s"$dir/embeddings.parquet").exists()) {
      val missing = Tables.documents(spark, dir)
        .filter(col("doc_id") % 100 === 0).select(col("doc_id"))
        .join(Tables.embeddings(spark, dir),
          col("doc_id") === col("vec_id"), "left_anti")
        .count()
      assert(missing === 0L,
        s"$missing eval doc(s) in $dir lack an embedding at vec_id == " +
          "doc_id — the alignment convention t26 relies on has been broken")
    }
  }

  test("canary: Tables.events normalizes ts to TimestampType") {
    val dt = Tables.events(spark, sf).schema("ts").dataType
    assert(dt === TimestampType || dt === TimestampNTZType,
      s"normalized events.ts is $dt")
    // Downstream (unix_micros, window, NTZ output casts) requires the
    // session-TZ-bearing type specifically:
    assert(dt === TimestampType)
  }
}
