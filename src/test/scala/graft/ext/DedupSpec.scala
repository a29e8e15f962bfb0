package graft.ext

import graft.SparkSuite

/** Invariants of the dedup accounting that the per-row oracle hash cannot
  * express directly (cross-query consistency with the raw corpus). */
class DedupSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.01"

  /** Stage a synthetic `documents` table and return its sf-dir. */
  private def stage(rows: Seq[(Long, String, String, String)]): String = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-docs").toString
    rows.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("d03/d07: docs without shingles never reach LSH banding") {
    // <3 words → sentinel signature; the banding guard must drop them,
    // or every short doc would pair with every other short doc
    val dir = stage(Seq(
      (1L, "one two", "en", "a"), (2L, "three", "en", "a"),
      (3L, "", "en", "a"), (4L, "x y", "en", "b"),
      (5L, "alpha beta gamma alpha beta gamma", "en", "a"),
      (6L, "alpha beta gamma alpha beta gamma", "en", "a")))
    val d03 = Dedup.queries("d03_dedup_minhash_lsh")(spark, dir).collect()
    assert(d03.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 6L)),
      "only the real near-dup pair may surface")
    val d07 = Dedup.queries("d07_dedup_pipeline")(spark, dir).collect()
    assert(d07.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((5L, 6L)))
  }

  test("hot fingerprint: an all-identical corpus neither explodes nor skews the census") {
    // 200 copies of one text across two sources — the d10 shape must
    // report exactly one kept representative, in the min-doc's source
    val text = "the same boilerplate text repeated everywhere verbatim"
    val dir = stage((1L to 200L).map(i =>
      (i, text, "en", if (i % 2 == 0) "even" else "odd")))
    val rows = Dedup.queries("d10_dedup_savings")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    // doc 1 is odd-source: odd keeps 99 dups of 100, even keeps 100 dups
    assert(rows == List(("even", 100L, 100L), ("odd", 100L, 99L)))
  }

  test("d13: chunk census counts short docs as one chunk and flags shared spans") {
    // A = 45 words (chunks: w1-20, w21-40, w41-45); B = exactly A's first
    // 20 words (one chunk, shared with A); C unique short (one chunk)
    val words = (1 to 45).map(i => s"w$i")
    val a = words.mkString(" ")
    val b = words.take(20).mkString(" ")
    val dir = stage(Seq(
      (1L, a, "en", "sa"), (2L, b, "en", "sb"), (3L, "lonely words", "en", "sc")))
    val rows = Dedup.queries("d13_chunk_dedup")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toList
    assert(rows == List(("sa", 3L, 1L), ("sb", 1L, 1L), ("sc", 1L, 0L)),
      s"got $rows")
  }

  test("d12: semantic dedup drops only within-cell near-dups, keeps the min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-emb").toString
    def oneHot(dim: Int): Seq[Float] =
      (0 until 64).map(j => if (j == dim) 1.0f else 0.0f)
    // centroids 0..7 = orthogonal one-hots (no cross-cell pairs possible);
    // 8 and 9 both lean on dim 0 → cell 0, cosine(8, 9) ≈ 0.98 > 0.35
    val rows = (0L to 7L).map(i => (i, oneHot(i.toInt), i.toInt)) ++ Seq(
      (8L, (0 until 64).map(j => if (j == 0) 0.9f else if (j == 1) 0.1f else 0.0f), 0),
      (9L, (0 until 64).map(j => if (j == 0) 0.8f else if (j == 1) 0.2f else 0.0f), 0))
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = Dedup.queries("d12_semantic_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toList
    // both near-dups drop in cell 0 with the MIN paired id (centroid 0
    // itself — cos(e0, v8) ≈ 0.994) as the keeper; no orthogonal pairs
    assert(out == List((0L, 8L, 0L), (0L, 9L, 0L)), s"got $out")
  }

  test("hot-block circuit breaker: capped block pairing skips the boilerplate bucket") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 100 identical boilerplate docs (every block value hot) + one
    // identical pair in its own cool blocks
    val boiler = "terms of service apply to all users of this site"
    val other = "completely different unique text body for the cool pair"
    val rows = (1L to 100L).map(i => (i, boiler)) ++ Seq((101L, other), (102L, other))
    val sh = rows.toDF("doc_id", "text")
      .select($"doc_id",
        graft.functions.SimHashMd5(split(trim($"text"), graft.core.Tok.Ws)).as("sh"))
    // uncapped: the boilerplate bucket pairs quadratically (100*99/2) + 1
    val full = Dedup.simhashBlockPairs(sh, None).count()
    assert(full == 4951L, s"got $full")
    // capped at 50: all four boilerplate blocks (100 members) are skipped;
    // only the cool pair survives — bounded work, documented recall trade
    val capped = Dedup.simhashBlockPairs(sh, Some(50L)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((101L, 102L)), s"got ${capped.toList.sorted}")
  }

  test("d16: cleaned corpus reconciles with d13's chunk census and d01's reps") {
    import org.apache.spark.sql.functions._
    val d16 = Dedup.queries("d16_cleaned_corpus")(spark, sf).collect()
    // one output row per d01 representative (at sf0.01 every doc is its
    // own rep — asserted, so the chunk-total reconciliation below is exact)
    val d01 = Dedup.queries("d01_dedup_exact")(spark, sf).collect()
    assert(d16.length == d01.length)
    assert(d01.forall(_.getLong(1) == 1L), "sf0.01 corpus grew exact dupes")
    // kept + dropped partitions each doc's chunks, and the totals match
    // d13's census over the same chunk unit
    // (a doc CAN keep zero chunks — every one of its spans first occurred
    // in an earlier doc; that full-drop is the operator's point)
    d16.foreach(r => assert(r.getLong(2) + r.getLong(3) == r.getLong(1)))
    val d13 = Dedup.queries("d13_chunk_dedup")(spark, sf).collect()
    assert(d16.map(_.getLong(1)).sum == d13.map(_.getLong(1)).sum)
    // span drops exist iff d13 saw cross-doc duplicate spans (keep-first
    // drops strictly fewer instances than d13 flags, never more)
    val dropped = d16.map(_.getLong(3)).sum
    val flagged = d13.map(_.getLong(2)).sum
    assert(dropped > 0 == flagged > 0)
    assert(dropped <= flagged, s"dropped $dropped > flagged $flagged")
    // the materialized text is exactly the kept chunks: 20 words per kept
    // chunk except possibly each doc's tail chunk
    d16.filter(_.getLong(2) > 0).foreach { r =>
      val words = r.getString(4).split(" ").length.toLong
      assert(words <= r.getLong(2) * 20 && words > (r.getLong(2) - 1) * 20)
    }
  }

  test("d16: planted duplicates — exact-dup doc vanishes, shared span drops once") {
    // 25-word docs → chunks = [w1..w20], [w21..w25]
    val first20 = (1 to 20).map(i => s"a$i").mkString(" ")
    val tailA = (1 to 5).map(i => s"t$i").mkString(" ")
    val tailC = (1 to 5).map(i => s"u$i").mkString(" ")
    val dir = stage(Seq(
      (1L, s"$first20 $tailA", "en", "web"),   // representative
      (2L, s"$first20 $tailA", "en", "web"),   // exact dup of 1 → no output row
      (3L, s"$first20 $tailC", "en", "web")))  // shares chunk 0 with doc 1
    val rows = Dedup.queries("d16_cleaned_corpus")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    assert(rows.toList == List(
      // doc 1 keeps both chunks (first occurrence of each)
      (1L, 2L, 2L, 0L, s"$first20 $tailA"),
      // doc 3 loses the shared leading chunk, keeps only its tail
      (3L, 2L, 1L, 1L, tailC)))
  }

  test("d17: incremental dedup agrees with d03's boundary-crossing pairs") {
    import org.apache.spark.sql.functions._
    val rows = Dedup.queries("d17_incremental_dedup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    // output covers exactly the increment slice, verdicts are the 3-value
    // enum, and match_id points at a BASE doc iff the doc is a dup
    assert(rows.forall(_._1 % 10 == 7))
    rows.foreach { case (id, v, m) =>
      assert(Set("exact_dup", "near_dup", "kept")(v), s"doc $id verdict $v")
      assert((v == "kept") == m.isEmpty, s"doc $id $v match=$m")
      m.foreach(mid => assert(mid % 10 != 7 && mid != id, s"doc $id match $mid"))
    }
    // any d03 pair crossing the increment/base boundary with est_sim >= 0.5
    // (d17's near threshold) must have flagged its increment member
    val verdict = rows.map(r => r._1 -> r._2).toMap
    val crossing = Dedup.queries("d03_dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .filter(_._3 >= 0.5)
      .flatMap { case (a, b, _) =>
        Seq(a, b).filter(x => x % 10 == 7 && (a % 10 == 7) != (b % 10 == 7)) }
    crossing.foreach(id =>
      assert(verdict(id) != "kept", s"doc $id crosses the boundary but kept"))
  }

  test("d17: planted increment — exact copy, near copy, unique, within-batch pair") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val other = (1 to 60).map(i => s"x$i").mkString(" ")
    val batchOnly = (1 to 60).map(i => s"z$i").mkString(" ")
    val dir = stage(Seq(
      (1L, base, "en", "web"),              // base
      (2L, other, "en", "web"),             // base
      (7L, base, "en", "web"),              // exact copy of base doc 1
      (17L, other + " tail", "en", "web"),  // near copy of base doc 2
      (27L, (1 to 60).map(i => s"q$i").mkString(" "), "en", "web"), // unique
      (37L, batchOnly, "en", "web"),        // within-increment pair —
      (47L, batchOnly, "en", "web")))       //   NOT this operator's job
    val rows = Dedup.queries("d17_incremental_dedup")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toList
    assert(rows == List(
      (7L, "exact_dup", Some(1L)),
      (17L, "near_dup", Some(2L)),
      (27L, "kept", None),
      // the increment is deduped against the BASE only; 37/47 dedupe
      // against each other in the d01/d03 pass over the ingested batch
      (37L, "kept", None),
      (47L, "kept", None)), s"got $rows")
  }

  test("d18: planted substring dups merge into maximal spans; islands split on gaps") {
    // shared = a 25-word run → 6 duplicated 20-word windows per occurrence,
    // which must merge into ONE maximal 25-word span (the Lee et al. 2022
    // exact-substring unit); doc 1 carries it twice with a 25-word unique
    // gap between (two islands), doc 2 once mid-doc, doc 3 is clean
    val shared = (1 to 25).map(i => s"c$i")
    val u = (1 to 25).map(i => s"u$i")
    val v = (1 to 5).map(i => s"v$i")
    val dir = stage(Seq(
      (1L, (shared ++ u ++ shared).mkString(" "), "en", "sa"), // 75 words
      (2L, (v ++ shared).mkString(" "), "en", "sb"),           // 30 words
      (3L, (1 to 30).map(i => s"z$i").mkString(" "), "en", "sc")))
    val rows = Dedup.queries("d18_substring_spans")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getDouble(7))).toList
    assert(rows == List(
      // doc 1: dup windows at pos 1-6 and 51-56 → spans [1,25] and [51,75]
      ("sa", 1L, 1L, 2L, 50L, 75L, 25L, 0.666667),
      // doc 2: windows 6-11 → one span [6,30]
      ("sb", 1L, 1L, 1L, 25L, 30L, 25L, 0.833333),
      // clean source keeps its row with zeroed span stats
      ("sc", 1L, 0L, 0L, 0L, 30L, 0L, 0.0)), s"got $rows")
  }

  test("d18: boundary-straddling duplicate invisible to d13's chunk grid is caught") {
    // B = words 11-30 of A: crosses A's chunk boundary at word 20, so the
    // d13/d16 chunk unit (md5 of words 1-20, 21-40) sees NO shared chunk —
    // the motivating gap between chunk dedup and every-offset span dedup
    val a = (1 to 40).map(i => s"w$i")
    val dir = stage(Seq(
      (1L, a.mkString(" "), "en", "sa"),
      (2L, a.slice(10, 30).mkString(" "), "en", "sb")))
    val d13 = Dedup.queries("d13_chunk_dedup")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2))).toList
    assert(d13 == List(("sa", 0L), ("sb", 0L)),
      "chunk dedup must NOT see the straddling duplicate (that is the point)")
    val rows = Dedup.queries("d18_substring_spans")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))).toList
    // A: dup window at pos 11 only → span [11,30]; B: its single window
    assert(rows == List(("sa", 1L, 1L, 20L), ("sb", 1L, 1L, 20L)), s"got $rows")
  }

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

  test("d20: df>=3 spans drop EVERY occurrence (incl. repeats in one doc); df=2 survive") {
    // bp chunk shared by docs 1/2/3 (boilerplate — every instance flagged,
    // doc 2 carries it TWICE so per-doc instance partials matter);
    // pair chunk shared by docs 4/5 only (df=2 — NOT boilerplate, the rule
    // d16 would still dedup but the df-threshold rule keeps both)
    val bp = (1 to 20).map(i => s"b$i").mkString(" ")
    val pair = (1 to 20).map(i => s"p$i").mkString(" ")
    val dir = stage(Seq(
      (1L, bp + " u1 u2 u3 u4 u5", "en", "sa"),
      (2L, bp + " " + bp, "en", "sb"),
      (3L, bp, "en", "sc"),
      (4L, pair, "en", "sd"),
      (5L, pair, "en", "se"),
      (6L, "only unique words here", "en", "sf")))
    val rows = Dedup.queries("d20_boilerplate_removal")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(rows == List(
      ("sa", 2L, 1L, 1L, 20L), // bp chunk + 5-word tail; only bp removed
      ("sb", 2L, 2L, 1L, 40L), // both instances of the bp chunk removed
      ("sc", 1L, 1L, 1L, 20L),
      ("sd", 1L, 0L, 0L, 0L),  // df=2: kept
      ("se", 1L, 0L, 0L, 0L),
      ("sf", 1L, 0L, 0L, 0L)), s"got $rows")
  }

  test("d21: first copy survives intact, every later copy drops at word grain") {
    // A (doc 1) and B (doc 2) are identical 25-word docs: A's windows are
    // the corpus winners, so A keeps all 25 words and B loses all 25.
    // C (doc 3) is 30 unique words; D (doc 4) shares exactly C's words
    // 11..30 behind 10 unique prefix words — ONE duplicated window, C
    // wins, D loses exactly those 20 words (the boundary-straddling case
    // a fixed chunk grid misses).
    val run = (1 to 25).map(i => s"r$i").mkString(" ")
    val c = (1 to 30).map(i => s"c$i")
    val dDoc = ((1 to 10).map(i => s"d$i") ++ c.drop(10)).mkString(" ")
    val dir = stage(Seq(
      (1L, run, "en", "sa"), (2L, run, "en", "sb"),
      (3L, c.mkString(" "), "en", "sc"), (4L, dDoc, "en", "sd")))
    val rows = Dedup.queries("d21_substring_removal")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toList
    assert(rows == List(
      ("sa", 1L, 0L, 25L, 0L),   // winner copy untouched
      ("sb", 1L, 1L, 25L, 25L),  // full duplicate vanishes
      ("sc", 1L, 0L, 30L, 0L),   // shared-run winner untouched
      ("sd", 1L, 1L, 30L, 20L)), // loses exactly the shared 20-word run
      s"got $rows")
  }

  test("d23: bloom gate has no false negatives — gated output == ungated exact join") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val gated = Dedup.queries("d23_bloom_dedup_gate")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toList
    // ungated replay: the plain exact join, no bloom anywhere
    val docs = graft.core.Tables.documents(spark, sf)
    val fps = docs.select($"doc_id", md5($"text".cast("binary")).as("fp"))
    val isNew = col("doc_id") % 10 === 7
    val exact = fps.filter(isNew).as("n")
      .join(fps.filter(!isNew).as("o"), col("n.fp") === col("o.fp"))
      .groupBy(col("n.doc_id").as("doc_id"))
      .agg(min(col("o.doc_id")).as("match_id"))
    val ungated = fps.filter(isNew).select($"doc_id")
      .join(exact, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"match_id".isNotNull, lit("exact_dup")).otherwise(lit("new")).as("v"),
        coalesce($"match_id", lit(-1L)).as("m"))
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    assert(gated == ungated, "bloom-gated verdicts diverge from the exact join")
  }

  test("d23: the plan carries the bloom gate and a broadcast verify join; the gate prunes") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val df = Dedup.queries("d23_bloom_dedup_gate")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain") || plan.contains("BloomFilterMightContain"),
      s"bloom gate missing from the physical plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), "verify join must broadcast the gated side")
    assert(!plan.contains("SortMergeJoin"), "no base-fingerprint shuffle join allowed")
    // measured pruning: bloom-positive candidates are a strict subset of
    // the increment, and a superset of the true dups
    val docs = graft.core.Tables.documents(spark, sf)
    val isNew = col("doc_id") % 10 === 7
    val nInc = docs.filter(isNew).count()
    val nDup = df.filter($"verdict" === "exact_dup").count()
    val fps = docs.select($"doc_id", md5($"text".cast("binary")).as("fp"))
    val bloomDf = fps.filter(!isNew)
      .select(org.apache.spark.sql.GraftShims.column(
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          org.apache.spark.sql.GraftShims.expression(xxhash64($"fp")), 65536L)
          .toAggregateExpression()).as("bloom"))
    val gate = org.apache.spark.sql.GraftShims.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        org.apache.spark.sql.catalyst.expressions.ScalarSubquery(
          bloomDf.queryExecution.analyzed),
        org.apache.spark.sql.GraftShims.expression(xxhash64(col("fp")))))
    val nGatePass = fps.filter(isNew).filter(gate).count()
    assert(nGatePass >= nDup, s"gate dropped true dups: $nGatePass < $nDup")
    assert(nGatePass < nInc,
      s"gate prunes nothing at sf0.001 ($nGatePass of $nInc) — FP rate broken")
  }

  test("d24 winnowing: the guarantee theorem, window-boundary counts, density bound") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // distinct token vocabularies so no accidental k-gram collisions
    def toks(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => s"$prefix$i")
    val shared = toks("shared", 11)  // exactly k+W-1 = the theorem's bound
    val docA = (toks("aa", 9) ++ shared ++ toks("az", 7)).mkString(" ")
    val docB = (toks("ba", 13) ++ shared ++ toks("bz", 5)).mkString(" ")
    val docC = toks("cc", 30).mkString(" ")           // no overlap with anyone
    val docD = shared.mkString(" ")                    // exactly 11 tokens
    val docs = Seq((1L, docA), (2L, docB), (3L, docC), (4L, docD))
      .toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(docs, k = 4, w = 8).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getSeq[Long](3).toSet))).toMap
    // exact boundary arithmetic on the 11-token doc: 8 k-grams, 1
    // window, 1 selected fingerprint
    val (kg4, win4, f4) = fps(4L)
    assert((kg4, win4, f4.size) == ((8L, 1L, 1)), s"got ${fps(4L)}")
    // THE WINNOWING GUARANTEE: an 11-token shared run forces a shared
    // fingerprint — regardless of the differing prefixes/suffixes and
    // differing positions (9 vs 13 tokens in)
    assert((fps(1L)._3 & fps(2L)._3).nonEmpty, "shared 11-token run produced no shared fingerprint")
    assert((fps(1L)._3 & fps(4L)._3).nonEmpty)
    // no spurious sharing with the disjoint doc
    assert((fps(3L)._3 & fps(1L)._3).isEmpty)
    assert((fps(3L)._3 & fps(2L)._3).isEmpty)
    // density: selections can't exceed windows, and every doc selects ≥1
    fps.values.foreach { case (kg, win, f) =>
      assert(f.size.toLong <= win && f.nonEmpty && win == kg - 7)
    }
    // and the query surfaces the partnership: docs 1, 2, 4 mutually
    // partnered, doc 3 partnerless
    val dir = java.nio.file.Files.createTempDirectory("graft-d24").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = Dedup.queries("d24_winnow_fingerprint")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(out(1L) == 2L && out(2L) == 2L && out(4L) == 2L && out(3L) == 0L,
      s"partners: $out")
  }

  test("d25: a doc embedded in a longer doc is caught by asymmetric containment") {
    // the case symmetric Jaccard misses and the harness corpus lacks
    // (its planted dups are near-exact copies → 'mutual'): doc 1 IS
    // doc 0 plus a suffix, so containment_a = 1 while Jaccard and
    // containment_b sit below their gates. Also proves the exact arm
    // rejects an LSH candidate with sub-gate overlap as 'none' rather
    // than dropping it.
    import spark.implicits._
    val a = "alpha beta gamma delta epsilon zeta"
    val b = a + " eta theta"
    val c = "alpha beta gamma omega psi chi phi"
    val docs = Seq((0L, a), (1L, b), (2L, c)).toDF("doc_id", "text")
    val rows = Dedup.containmentReport(docs, Dedup.sigsOf(docs)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getString(7))).toMap
    assert(rows.contains((0L, 1L)),
      s"the contained pair must surface as an LSH candidate, got ${rows.keys}")
    val (na, nb, common, ca, cb, verdict) = rows((0L, 1L))
    assert(na == 4 && nb == 6 && common == 4,
      s"shingle arithmetic: expected 4/6 sets with 4 common, got ($na,$nb,$common)")
    assert(ca == 1.0, s"containment_a must be exactly 1.0, got $ca")
    assert(math.abs(cb - 4.0 / 6.0) < 1e-6, s"containment_b must be 4/6, got $cb")
    assert(verdict == "a_in_b",
      s"asymmetric embedding must verdict a_in_b, got $verdict")
    // the sub-gate candidate (shares 'alpha beta gamma' only) is kept
    // and rejected, never dropped
    rows.get((0L, 2L)).foreach { case (_, _, cm, _, _, v) =>
      assert(cm == 1 && v == "none", s"sub-gate pair must be 'none', got $v ($cm)")
    }
  }
}
