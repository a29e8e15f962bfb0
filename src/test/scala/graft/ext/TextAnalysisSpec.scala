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

  test("t13: feature counts reconcile with t01 and the gate splits the corpus") {
    val t13 = TextAnalysis.queries("t13_quality_classifier")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getString(4)))
    val nTok = TextAnalysis.queries("t01_text_stats")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    t13.foreach { case (id, nFeats, sumW, logit, label) =>
      // unigrams + bigrams: n + (n-1) features for n >= 2 tokens
      val n = nTok(id)
      assert(nFeats == (if (n >= 2) 2 * n - 1 else n), s"doc $id: $nFeats feats for $n tokens")
      // per-feature weights live in [-50, 50] -> logit in [-0.5, 0.5]
      assert(math.abs(logit) <= 0.5 && math.abs(logit - sumW.toDouble / (100.0 * nFeats)) < 1e-6)
      assert(label == (if (sumW.toDouble / (100.0 * nFeats) >= 0.02) "keep" else "drop"))
    }
    // a useful gate splits the corpus, not rubber-stamps it
    val kept = t13.count(_._5 == "keep")
    assert(kept > 0 && kept < t13.length, s"gate kept $kept/${t13.length}")
  }

  test("t12: the in-string merge implements exact left-to-right BPE") {
    import spark.implicits._
    // the same replace() shape t12 uses: " a  b " -> " ab " over the
    // space-wrapped symbol encoding
    def enc(word: String): String = word.map(c => s" $c ").mkString
    def merge(seq: String, a: String, b: String): String =
      Seq((seq, a, b)).toDF("seq", "a", "b")
        .selectExpr("replace(seq, ' ' || a || '  ' || b || ' ', ' ' || a || b || ' ')")
        .head().getString(0)
    def syms(seq: String): Seq[String] = seq.trim.split("  ").toSeq
    // back-to-back occurrences BOTH merge (the shared boundary space is
    // re-supplied by the replacement's trailing space)
    assert(syms(merge(enc("abab"), "a", "b")) == Seq("ab", "ab"))
    // same-symbol runs merge left-to-right, non-overlapping: aaa -> aa|a
    assert(syms(merge(enc("aaa"), "a", "a")) == Seq("aa", "a"))
    assert(syms(merge(enc("aaaa"), "a", "a")) == Seq("aa", "aa"))
    // no false mid-symbol match: merging (a, b) must not touch symbol "ab"
    val twoRound = merge(merge(enc("xaby"), "a", "b"), "b", "y")
    assert(syms(twoRound) == Seq("x", "ab", "y"),
      "round-2 pattern must not split or re-match inside the merged symbol")
    // a merged symbol pairs with its neighbors in the next round
    assert(syms(merge(merge(enc("her"), "e", "r"), "h", "er")) == Seq("her"))
  }

  test("t25: decode(encode(x)) == x on real data, and a vocab hole breaks it") {
    import spark.implicits._
    // real-data arm: every word of every sf0.01 document survives the
    // full encode->id->decode chain (this is the property a tokenizer
    // pipeline relies on before training — t14 alone never proves it)
    val rt = TextAnalysis.queries("t25_bpe_roundtrip")(spark, sf).collect()
    assert(rt.nonEmpty)
    rt.foreach { r =>
      assert(r.getAs[Long]("n_exact") == r.getAs[Long]("n_words"),
        s"doc ${r.get(0)}: ${r.getAs[Long]("n_exact")} of " +
          s"${r.getAs[Long]("n_words")} words round-tripped")
      assert(r.getAs[Long]("n_tokens") <= r.getAs[Long]("n_words") * 64,
        "token counts must stay word-bounded")
    }
    // the merges actually fired: vocab is base symbols + 3 merged tokens,
    // and some word must encode to fewer tokens than symbols — otherwise
    // the identity held vacuously on an unmerged corpus
    val vsz = rt.head.getAs[Long]("vocab_size")
    assert(vsz > 3, s"vocab_size $vsz must include base symbols")

    // teeth: the same decode expression over a vocab map with ONE id
    // missing must NOT reproduce the word — proving n_exact == n_words
    // is a property of the lossless chain, not of array_join shrugging
    // off nulls
    val row = Seq(("her", Seq(1L, 2L))).toDF("word", "ids")
    def dec(mapExpr: String): String = row
      .selectExpr(s"array_join(transform(ids, i -> element_at($mapExpr, i)), '') AS dec")
      .head().getString(0)
    assert(dec("map(1L, 'h', 2L, 'er')") == "her")
    assert(dec("map(1L, 'h')") == "h", // id 2 missing -> null dropped
      "a vocab hole must shorten the decode (and so fail the identity)")
  }

  test("t12: round-1 census reconciles with t05 and merges are applied") {
    val t12 = TextAnalysis.queries("t12_bpe_merge_train")(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getLong(3), r.getString(4)))
    assert(t12.length == 15, "3 rounds x top-5")
    // round 1 counts characters — must agree with t05's independent
    // substr-based pair census (identical ordering: single-char symbols)
    val t05 = TextAnalysis.queries("t05_bpe_pair_counts")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val r1 = t12.filter(_._1 == 1).sortBy(_._2).map(t => (t._5, t._4)).toSeq
    assert(r1 == t05.take(5).toSeq, s"round-1 top-5 $r1 != t05 ${t05.take(5).toSeq}")
    // the winner is merged away: round r's rank-1 pair never recurs later
    for (r <- 1 to 2) {
      val winner = t12.find(t => t._1 == r && t._2 == 1).get._3
      assert(!t12.exists(t => t._1 > r && t._3 == winner),
        s"round-$r winner '$winner' still counted after its merge")
    }
  }

  test("t17: organic PII is caught alongside planted, every occurrence redacted") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-pii").toString
    // doc 12: %3==0 and %4==0 → planted email + phone; base text carries an
    // ORGANIC email, so the scrubber must catch both. doc 7: nothing.
    Seq((12L, "hello a@b.io world", "en", "sa"),
        (7L, "plain words only", "en", "sb"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.queries("t17_pii_scrub")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toList.sortBy(_._1)
    // sa: organic a@b.io + planted user12@example.com = 2 emails, 1 phone;
    // chars_redacted = (6-7) + (18-7) + (8-7) = 11
    assert(rows == List(
      ("sa", 1L, 1L, 2L, 1L, 0L, 11L),
      ("sb", 1L, 0L, 0L, 0L, 0L, 0L)), s"got $rows")
  }

  test("t18: hand-computed bit-length regression on a geometric vocabulary") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // freqs 8,4,2,1 → ranks 1..4 → x = bitlen(rank)-1 = 0,1,1,2;
    // y = 3,2,1,0. Moments: n=4 sx=4 sy=6 sxx=6 sxy=3 syy=14
    // slope = (12-24)/(24-16) = -1.5; r2 = 144/(8*(56-36)) = 0.9
    val text = (Seq.fill(8)("a") ++ Seq.fill(4)("b")
      ++ Seq.fill(2)("c") ++ Seq("d")).mkString(" ")
    val dir = java.nio.file.Files.createTempDirectory("graft-zipf").toString
    Seq((1L, text, "en", "sz")).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = TextAnalysis.queries("t18_zipf_slope")(spark, dir).collect().head
    assert(r.getString(0) == "sz" && r.getLong(1) == 4L)
    assert(r.getDouble(2) == -1.5, s"slope ${r.getDouble(2)}")
    assert(r.getDouble(3) == 0.9, s"r2 ${r.getDouble(3)}")
  }

  test("t19: hand-computed drift — the minority disjoint-vocab source pays the bits") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // A: 'a'×100; B: 'b'×10 (disjoint vocab). Corpus: n=110, v=2 →
    // bitlen(112)=7. A: ns=100,vs=1 → bitlen(101)=7; cg(a)=100 →
    // cross_b = 7-bitlen(101)=0, self_b = 7-7=0 → drift 0.
    // B: ns=10,vs=1 → bitlen(11)=4; cg(b)=10 → cross_b = 7-4=3,
    // self_b = 4-4=0 → drift_bits = 10·3 = 30, 3.0/token.
    val dir = java.nio.file.Files.createTempDirectory("graft-drift").toString
    Seq((1L, Seq.fill(100)("a").mkString(" "), "en", "sa"),
        (2L, Seq.fill(10)("b").mkString(" "), "en", "sb"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.queries("t19_source_drift")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toList
    assert(rows == List(
      ("sa", 100L, 0L, 0L, 0L, 0.0),
      ("sb", 10L, 30L, 0L, 30L, 3.0)), s"got $rows")
  }

  test("t22: hand-computed KN ladder — fluent cheap, unseen backs off, OOV pays the floor") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, length}
    // Train corpus (doc 1, split=train by md5): "a b c a b d".
    //   Trigram counts all 1: (a,b,c) (b,c,a) (c,a,b) (a,b,d).
    //   ctx(a,b)=tot 2/types 2; ctx(b,c)=ctx(c,a)=1/1.
    //   n23 each 1; n2(b)=tot 2/types 2; n2(a)=n2(c)=1/1.
    //   Bigram types {(a,b),(b,c),(c,a),(b,d)} → n1p_all=4, every n1p_3=1
    //   → pcont = 1e6/4 = 250000 fx for a,b,c,d; OOV floors at 1 fx.
    // Hand ladder (D=3/4, S=1e6, floor div):
    //   p(c|a,b) = (1e6·max(4−3,0) + 3·2·plow)/8 with
    //     plow(c|b) = (1e6 + 3·2·250000)/8 = 312500 → p = 359375 → 1 bit
    //   p(a|b,c): plow(a|c) = (1e6 + 3·1·250000)/4 = 437500
    //     → p = (1e6 + 3·1·437500)/4 = 578125 → 0 bits (≥ 2^19)
    //   p(b|c,a) symmetric → 0 bits; p(d|a,b) mirrors p(c|a,b) → 1 bit
    //   train doc: 4 trigrams, nll 2, 0.5 bits/trigram, keep
    // Scoring docs (NOT in train, so tables stay frozen):
    //   doc 3 (test) "a b c": the seen trigram → 1.0 bits, keep
    //   doc 5 (val) "d c b": unseen trigram AND unseen ctx(d,c) → falls
    //     to plow(b|c) = (0 + 3·1·250000)/4 = 187500 → 2 bits, keep
    //   doc 10 (val) "x y z": fully OOV → every rung floors to 1 fx
    //     → 20−bitlen(1) = 19 bits, drop (the gate's teeth)
    val dir = java.nio.file.Files.createTempDirectory("graft-kn").toString
    Seq((1L, "a b c a b d", "en", "sa"),
        (3L, "a b c", "en", "sa"),
        (5L, "d c b", "en", "sa"),
        (10L, "x y z", "en", "sa"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.queries("t22_kn_trigram_bits")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getString(5))).toList
    assert(rows == List(
      (1L, "train", 4L, 2L, 0.5, "keep"),
      (3L, "test", 1L, 1L, 1.0, "keep"),
      (5L, "val", 1L, 2L, 2.0, "keep"),
      (10L, "val", 1L, 19L, 19.0, "drop")), s"got $rows")
  }

  test("t20: CMS one-sided error, collisions resolved by depth, exact on a clean corpus") {
    import spark.implicits._
    val rows = TextAnalysis.queries("t20_countmin_heavyhitters")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 10)
    rows.foreach { case (w, exact, est, over) =>
      // the CMS guarantee: never undercounts, overcount column reconciles
      assert(est >= exact, s"$w undercounts: $est < $exact")
      assert(over == est - exact)
    }
    // the harness corpus at W=16 must actually exercise BOTH branches:
    // some probe saturated (collision survives all 4 rows) and some clean
    // (min over depth recovers the exact count) — otherwise the demo
    // width proves nothing about the min logic
    assert(rows.exists(_._4 > 0L), "expected at least one colliding probe")
    assert(rows.exists(_._4 == 0L), "expected at least one clean probe")
    // a corpus of distinct single-occurrence words with no collisions at
    // W=16 in ANY row would be flaky to construct from english words;
    // instead verify exactness structurally: every sketch row's counters
    // sum to the total token count (mass conservation per hash row)
    val docs = graft.core.Tables.documents(spark, sf)
      .select(explode(split(trim(col("text")), graft.core.Tok.Ws)).as("word"))
    val nTok = docs.count()
    val wc = docs.groupBy($"word").agg(count(lit(1)).as("cnt"))
    def colR(r: Int) =
      conv(substring(md5($"word".cast("binary")), 1 + 7 * r, 7), 16, 10)
        .cast("long") % 16
    val rowMass = wc
      .select($"cnt", posexplode(array((0 until 4).map(colR): _*)).as(Seq("r", "c")))
      .groupBy($"r").agg(sum($"cnt").as("mass")).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rowMass.size == 4 && rowMass.values.forall(_ == nTok),
      s"each sketch row must conserve token mass: $rowMass vs $nTok")
  }

  test("t21: sketch set-ops — full pair lattice, union monotone, exact overlap replays") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val rows = TextAnalysis.queries("t21_kmv_overlap")(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getLong(6)))
    val nSrc = graft.core.Tables.documents(spark, sf)
      .select($"source").distinct().count().toInt
    assert(rows.length == nSrc * (nSrc - 1) / 2,
      s"expected the full pair lattice, got ${rows.length} of ${nSrc * (nSrc - 1) / 2}")
    rows.foreach { case (sa, sb, ea, eb, eu, ei, _) =>
      // merged bottom-k of a superset has an equal-or-smaller k-th minimum
      assert(eu >= math.max(ea, eb) - 1e-6,
        s"($sa,$sb): union estimate $eu below a side ($ea, $eb)")
      assert(ei >= 0.0, s"($sa,$sb): negative intersection estimate $ei")
    }
    // the exact column is a plain distinct-hash intersection — replay it
    val dm = graft.core.Tables.documents(spark, sf)
      .select($"source",
        explode(graft.functions.ShingleArr(split(trim($"text"), graft.core.Tok.Ws), 3)).as("sg"))
      .select($"source",
        conv(substring(md5($"sg".cast("binary")), 1, 15), 16, 10).cast("long").as("m"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = dm.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    rows.foreach { case (sa, sb, _, _, _, _, ex) =>
      val want = (bySrc(sa) & bySrc(sb)).size.toLong
      assert(ex == want, s"($sa,$sb): exact_inter $ex != replay $want")
    }
  }

  test("t24 keywords: integer tf-idf ranks, ubiquitous words drop out of the arithmetic") {
    import spark.implicits._
    // N=4 -> bitlen 3. df=1 -> idfB 2; df=2,3 -> 1; df=4 -> 0 (drops).
    val docs = Seq((1L, "aa aa bb cc dd"), (2L, "bb cc dd"),
      (3L, "cc dd"), (4L, "dd")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-t24").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = TextAnalysis.queries("t24_keyword_extraction")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    assert(rows == List(
      (1L, 1, "aa", 2L, 1L, 4L),   // tf 2 · idfB 2
      (1L, 2, "bb", 1L, 2L, 1L),   // score tie with cc -> word tie-break
      (1L, 3, "cc", 1L, 3L, 1L),
      (2L, 1, "bb", 1L, 2L, 1L),
      (2L, 2, "cc", 1L, 3L, 1L),
      (3L, 1, "cc", 1L, 3L, 1L)),  // doc 4: only the df=4 word -> no rows
      s"got $rows")
  }

  test("t26 rerank: blend reorders the lexical slate, unembedded candidates drop, flat-slate fallback") {
    import spark.implicits._
    // Eval 0 probes {x, y}; train slate by lexical score (sqrt-idf BM25,
    // df(x)=3 via docs 1/2/5, df(y)=1 via doc 3): doc3 ("y", rare term)
    // > doc1 ("x x x") > doc5 ("x x") > doc2 ("x"); doc4 ("z") shares no
    // term and must never appear. Embeddings then INVERT the slate:
    // doc2 (slate minimum, nb=0) is parallel to the probe (cos 1) ->
    // blend exactly 1.0 and rank 1; doc3 (slate maximum, nb=1) is
    // anti-parallel (cos -1) -> blend exactly 0.0 and rank 3; doc1 is
    // orthogonal (cos 0) -> blend = its nb alone, rank 2. doc5 has NO
    // embedding, so the inner join must drop it from the rerank.
    // Eval 100 probes {w} against two lexically IDENTICAL docs (6, 7):
    // mn == mx, so the fallback nb = 0.5 applies and cosine alone ranks.
    // Eval 200 probes {x} but has NO embedding of its own: the rerank
    // requires the probe vector, so the whole probe drops — t26's
    // documented INNER-join semantics on the eval side too (at sf0.1,
    // eval doc_ids >= 2000 have no vector; a production variant that
    // wants a lexical-only fallback would LEFT-join and coalesce cos
    // to 0 — pinning the drop makes that a deliberate future change,
    // not a silent one; contrast c26, whose screen emits sentinels
    // because "never screened" and "screened clean" must not conflate).
    val docs = Seq(
      (0L, "x y"), (100L, "w"), (200L, "x"),
      (1L, "x x x"), (2L, "x"), (3L, "y"), (4L, "z"), (5L, "x x"),
      (6L, "w"), (7L, "w")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (100L, Array(0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f)), (4L, Array(1.0f, 1.0f)),
      // no row for doc 5: an unembedded candidate is not cross-encodable
      (6L, Array(0.0f, 1.0f)), (7L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-t26").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = TextAnalysis.queries("t26_hybrid_rerank")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toList
    val eval0 = rows.filter(_._1 == 0L)
    // the blend fully INVERTS the lexical order 3 > 1 > 2; the
    // unembedded candidate (5) and the no-overlap doc (4) are absent
    assert(eval0.map(x => (x._2, x._3)) == List((1, 2L), (2, 1L), (3, 3L)),
      s"eval 0 slate: $eval0")
    assert(eval0.map(_._5) == List(1.0, 0.0, -1.0), s"cosines: $eval0")
    // the slate minimum (nb = 0) with cos 1 blends to EXACTLY 1.0 and
    // the slate maximum (nb = 1) with cos -1 to EXACTLY 0.0 — pins the
    // fixed-point blend arithmetic, not just the ordering
    assert(eval0.head._6 == 1.0, s"rank-1 blend: ${eval0.head}")
    assert(eval0.last._6 == 0.0, s"rank-3 blend: ${eval0.last}")
    // the bm25 column reports stage 1, so it must still show the
    // ORIGINAL lexical order 3 > 1 > 2 (distinct scores)
    val bySlate = eval0.sortBy(x => -x._4).map(_._3)
    assert(bySlate == List(3L, 1L, 2L), s"lexical order: $eval0")
    assert(eval0.map(_._4).distinct.size == 3, s"sfx collision: $eval0")
    // flat slate: identical lexical scores -> nb = 0.5 both, cosine
    // decides, and the blend values are exactly 1.5 / 0.5
    val eval100 = rows.filter(_._1 == 100L)
    assert(eval100.map(x => (x._2, x._3, x._5, x._6)) ==
      List((1, 6L, 1.0, 1.5), (2, 7L, 0.0, 0.5)), s"eval 100: $eval100")
    assert(eval100.map(_._4).distinct.size == 1, s"sfx not flat: $eval100")
    // an UNEMBEDDED probe cannot be cross-encoded: eval 200 retrieved a
    // slate ("x" matches docs 1/2/5) but has no vector, so it emits
    // nothing at all — the pinned inner-join-on-the-eval-side decision
    assert(!rows.exists(_._1 == 200L),
      s"unembedded probe must drop entirely: ${rows.filter(_._1 == 200L)}")
  }

  test("t27 recall census: hand-computed arms, sentinel row for an unembeddable slate, unembedded probe excluded") {
    import spark.implicits._
    // Embedded train corpus {1, 2, 3, 11, 12, 13} with cosines vs eval
    // 0's (1,0): d1 = 1.0, d2 ≈ 0.994, d11 ≈ 0.970, d12 ≈ 0.919,
    // d13 ≈ 0.832, d3 = -1 — the corpus-wide exact top-5 is
    // {1, 2, 11, 12, 13}. Eval 0's lexical slate (docs containing "x")
    // is {1, 2, 3}, so corpus_hits = |{1,2,3} ∩ top5| = 2 -> recall 0.4
    // and cand_hits = 3 (a ≤5-candidate slate trivially matches its own
    // cosine top-5). Eval 100's ONLY lexical match (doc 6) has no
    // embedding: the rerank's inner join empties the slate, and the
    // census must still emit the SENTINEL row (n_slate = 0, recalls 0)
    // — c26's vanished-row lesson: "nothing measurable" and "measured
    // zero" must not conflate. Eval 200 has no embedding of its own:
    // it is outside the census universe entirely (t26 cannot serve it,
    // so there is no slate to grade — distinct from eval 100, whose
    // PROBE is servable but whose slate is empty).
    val docs = Seq(
      (0L, "x"), (100L, "q"), (200L, "x"),
      (1L, "x x"), (2L, "x"), (3L, "x x x"), (6L, "q"),
      (11L, "z"), (12L, "z"), (13L, "z")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (100L, Array(0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(-1.0f, 0.0f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.7f, 0.3f)), (13L, Array(0.6f, 0.4f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-t27").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = TextAnalysis.queries("t27_rerank_recall")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toList
    assert(rows == List(
      (0L, 3L, 2L, 0.4, 3L, 0.6),
      (100L, 0L, 0L, 0.0, 0L, 0.0)),
      s"census rows: $rows")
  }

  test("t28 RRF: hand-computed fusion — one-arm docs fuse, unembedded probe keeps its lexical arm, null-text probe keeps its vector arm, integer quotients") {
    import spark.implicits._
    // Same synthetic tables as t27's arrangement, graded by hand in
    // rank space. Eval 0 (embedded, probes "x"): lexical ranks over
    // {1, 2, 3} by sfx desc — doc 3 ("x x x") > 1 ("x x") > 2 ("x");
    // vector ranks over the embedded train corpus — 1, 2, 11, 12, 13,
    // 3. RRF with k = 60 (integer quotients of 1e9):
    //   doc 1: lex 2 + vec 1 -> 16129032 + 16393442 = 32522474 (rank 1)
    //   doc 2: lex 3 + vec 2 -> 15873015 + 16129032 = 32002047 (rank 2)
    //   doc 3: lex 1 + vec 6 -> 16393442 + 15151515 = 31544957 (rank 3)
    //   doc 11: vec 3 only   -> 15873015                       (rank 4)
    //   doc 12: vec 4 only   -> 15625000                       (rank 5)
    // — a vector-only doc (11) outranks nothing fused but still makes
    // the slate (FULL OUTER), and doc 13 (vec 5 -> 15384615) is cut at
    // rank 5. Eval 200 has NO embedding: its vector arm is empty and
    // the lexical arm alone must survive (lex ranks 3 > 1 > 2, each
    // scoring only its lexical quotient). Eval 100's only lexical
    // match (6) is unembedded: it fuses lexical-only at rank 1 while
    // the vector arm contributes the embedded corpus by cosine.
    // Eval 300 has an embedding but NULL text: it tokenizes to ZERO
    // probe terms (explode of a null shingle array drops the row), so a
    // fusion that derived its vector-arm probe universe from probe
    // TERMS would silently drop the probe — the r17 ADVICE hole. The
    // fixed definition derives the universe from probe IDS: eval 300
    // must fuse vector-only, ranking the embedded train corpus by
    // cosine vs (0,1): 13 (.5547) > 12 (.3939) > 11 (.2425) > 2
    // (.1104) > {1, 3} (cfx 0 both, train_id tie-break -> 1).
    val docs = Seq(
      (0L, "x"), (100L, "q"), (200L, "x"),
      (300L, null.asInstanceOf[String]),
      (1L, "x x"), (2L, "x"), (3L, "x x x"), (6L, "q"),
      (11L, "z"), (12L, "z"), (13L, "z")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (100L, Array(0.0f, 1.0f)),
      (300L, Array(0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(-1.0f, 0.0f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.7f, 0.3f)), (13L, Array(0.6f, 0.4f)))
      .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft-t28").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    emb.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = TextAnalysis.queries("t28_rrf_fusion")(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toList
    val eval0 = rows.filter(_._1 == 0L)
    assert(eval0 == List(
      (0L, 1, 1L, 2L, 1L, 32522474L),
      (0L, 2, 2L, 3L, 2L, 32002047L),
      (0L, 3, 3L, 1L, 6L, 31544957L),
      (0L, 4, 11L, 0L, 3L, 15873015L),
      (0L, 5, 12L, 0L, 4L, 15625000L)),
      s"eval 0 fusion: $eval0")
    // unembedded probe: lexical arm alone, ordered 3 > 1 > 2
    val eval200 = rows.filter(_._1 == 200L)
    assert(eval200.map(x => (x._2, x._3, x._4, x._5)) == List(
      (1, 3L, 1L, 0L), (2, 1L, 2L, 0L), (3, 2L, 3L, 0L)),
      s"eval 200 fusion: $eval200")
    assert(eval200.map(_._6) == List(16393442L, 16129032L, 15873015L),
      s"eval 200 quotients: $eval200")
    // unembedded CANDIDATE fuses lexical-only while embedded
    // vector-arm docs fill the rest of the slate
    val eval100 = rows.filter(_._1 == 100L)
    assert(eval100.headOption.map(x => (x._2, x._3, x._4, x._5))
      .contains((1, 6L, 1L, 0L)), s"eval 100 fusion: $eval100")
    assert(eval100.size == 5 && eval100.tail.forall(_._4 == 0L),
      s"eval 100 tail must be vector-only docs: $eval100")
    // NULL-text probe: zero lexical terms, yet the vector arm must
    // survive — the probe universe comes from probe ids, not tokens
    val eval300 = rows.filter(_._1 == 300L)
    assert(eval300 == List(
      (300L, 1, 13L, 0L, 1L, 16393442L),
      (300L, 2, 12L, 0L, 2L, 16129032L),
      (300L, 3, 11L, 0L, 3L, 15873015L),
      (300L, 4, 2L, 0L, 4L, 15625000L),
      (300L, 5, 1L, 0L, 5L, 15384615L)),
      s"null-text probe must fuse vector-only: $eval300")
  }

  test("t29 served fusion: rank-shape contract, served-arm wiring, both arms alive, recall vs the exact fusion") {
    // The composition t28's scaladoc claims ("at 100 TB this arm is the
    // served ANN index"), proven red-on-break: the fused output must
    // keep the rank-shape contract WHEN THE ARM COMES FROM THE INDEX —
    // dense per-probe ranks, integer RRF quotients recomputable from
    // the emitted arm ranks, the (rrf_fx DESC, train_id) total
    // tie-break — and its vector column must BE the saved-index serve's
    // rank list, not a lookalike.
    val rows = TextAnalysis.queries("t29_rrf_served")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty, "served fusion produced no rows")
    // integer-quotient contract: rrf_fx is exactly the sum of
    // 1e9 div (60 + rank) over the PRESENT arms (0 = absent sentinel)
    rows.foreach { case (ev, rk, tr, lr, vr, fx) =>
      val want = (if (lr > 0) 1000000000L / (60 + lr) else 0L) +
        (if (vr > 0) 1000000000L / (60 + vr) else 0L)
      assert(fx == want, s"($ev, $tr) rrf_fx $fx != recomputed $want")
      assert(lr >= 0 && lr <= 10 && vr >= 0 && vr <= 10, s"($ev, $tr) arm " +
        s"ranks out of depth: lex $lr vec $vr")
      assert(lr > 0 || vr > 0, s"($ev, $tr) fused with BOTH arms absent")
      assert(rk >= 1 && rk <= 5, s"($ev, $tr) rank $rk out of [1, 5]")
    }
    // dense per-probe ranks + the total tie-break: emitted rank order
    // must equal the (rrf_fx DESC, train_id ASC) sort of the same rows
    rows.groupBy(_._1).foreach { case (ev, g) =>
      val byRank = g.sortBy(_._2).toList
      assert(byRank.map(_._2) == (1 to g.length).toList,
        s"probe $ev ranks not dense: ${byRank.map(_._2)}")
      val resorted = g.sortBy(r => (-r._6, r._3)).toList
      assert(byRank == resorted,
        s"probe $ev emitted order violates the (rrf_fx DESC, train_id) " +
          s"total tie-break: $byRank vs $resorted")
    }
    // served-arm wiring: every emitted vec_rank is EXACTLY the saved
    // index serve's rank for that (probe, neighbor) — and fused docs
    // absent from the serve really are absent (sentinel 0)
    val servedArm = Similarity.ivfpqServedTrainRanks(spark, sf, 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    rows.foreach { case (ev, _, tr, _, vr, _) =>
      assert(servedArm.get((ev, tr)).getOrElse(0L) == vr,
        s"($ev, $tr) vec_rank $vr != served index rank " +
          s"${servedArm.get((ev, tr))}")
    }
    // teeth: the composition must exercise every full-outer case —
    // genuinely fused rows, lexical-only rows, AND served-only rows
    assert(rows.exists(r => r._4 > 0 && r._5 > 0), "no genuinely fused row")
    assert(rows.exists(r => r._4 > 0 && r._5 == 0), "no lexical-only row")
    assert(rows.exists(r => r._4 == 0 && r._5 > 0), "no served-only row")
    // recall row (t27's discipline): the served fusion must recover a
    // nontrivial share of the exact fusion's slate — measured 3/5 per
    // probe at sf0.01; assert the generous data floor 1/5 so a
    // served-arm regression to garbage (recall 0) is red while testdata
    // regeneration noise is not
    val exact = TextAnalysis.queries("t28_rrf_fusion")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val overlaps = rows.groupBy(_._1).map { case (ev, g) =>
      val o = g.map(_._3).toSet.intersect(exact.getOrElse(ev, Set.empty))
      ev -> o.size
    }
    info(s"fused-served vs fused-exact slate overlap@5 per probe: " +
      overlaps.toSeq.sortBy(_._1).mkString(", "))
    assert(overlaps.values.sum.toDouble / overlaps.size >= 1.0,
      s"served fusion lost the exact fusion entirely: $overlaps")
  }

  test("t30 census: hand-computed recalls on a constructed index swap, sentinel row for an unserved probe, non-universe probe excluded") {
    import spark.implicits._
    // t27's synthetic arrangement with a HAND-BUILT served arm standing
    // in for the IVF-PQ serve (the census grades WHATEVER arm it is
    // handed — the t29 wiring is oracle-checked; this pins the set
    // arithmetic). Eval 0 (probe "x"): lex ranks 3 > 1 > 2; exact vec
    // ranks 1, 2, 11, 12, 13, 3 (cosines vs (1,0)); exact-fusion slate
    // = {1, 2, 3, 11, 12}. The served arm is built to MISS docs 1 and 2
    // (13 -> 1, 11 -> 2, 12 -> 3): served slate fuses to {3, 13, 1, 11,
    // 2} (quotient ties broken by train_id: 3 < 13, 1 < 11, 2 < 12), so
    // fusion_hits = |{3,13,1,11,2} ∩ {1,2,3,11,12}| = 4 -> 0.8 and
    // arm_hits = |{13,11,12} ∩ exact-top10| = 3 -> 0.3. Eval 100 (probe
    // "q"): lexical arm {6} only, served arm EMPTY — the served slate
    // keeps the lexical row (n_served = 1) and recovers 1 of the exact
    // fusion's slate {6, 13, 12, 11, 2} -> 0.2, arm_recall 0. Eval 400
    // (probe "w", matching NO train doc, served arm empty): both arms
    // empty -> the SENTINEL row (0, 0, 0.0, 0, 0.0) — a vanished row
    // would read as "not measured" (c26's lesson). Eval 200 has no
    // embedding: outside the census universe entirely.
    val docs = Seq(
      (0L, "x"), (100L, "q"), (200L, "x"), (400L, "w"),
      (1L, "x x"), (2L, "x"), (3L, "x x x"), (6L, "q"),
      (11L, "z"), (12L, "z"), (13L, "z")).toDF("doc_id", "text")
    val embRaw = Seq(
      (0L, Array(1.0f, 0.0f)), (100L, Array(0.0f, 1.0f)),
      (400L, Array(0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(-1.0f, 0.0f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.7f, 0.3f)), (13L, Array(0.6f, 0.4f)))
      .toDF("vec_id", "embedding")
    val emb = embRaw
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.dot($"v", $"v"))
    val post = TextAnalysis.bm25ImpactsIdf(spark, docs, TextAnalysis.sqrtIdf)
    val served = Seq((0L, 13L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("eval_id", "train_id", "vec_rank")
    val (census, cleanup) = TextAnalysis.servedFusionRecallManaged(
      docs.filter($"doc_id" % 100 === 0), post, emb, served)
    val rows = census.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getLong(4), r.getDouble(5))).toList
    cleanup()
    assert(rows == List(
      (0L, 5L, 4L, 0.8, 3L, 0.3),
      (100L, 1L, 1L, 0.2, 0L, 0.0),
      (400L, 0L, 0L, 0.0, 0L, 0.0)),
      s"census rows: $rows")
  }

  test("t31 metrics: hand-computed NDCG@5/MRR on the constructed index swap, empty-served-slate sentinel") {
    import spark.implicits._
    // The t30 arrangement re-graded RANK-AWARE. Hand derivation:
    //  Eval 0: exact slate 1>2>3>11>12 (grades 5,4,3,2,1); served slate
    //   3>13>1>11>2 (quotient ties broken by train_id) -> rels
    //   (3,0,5,2,4); DCG = 3·W1 + 5·W3 + 2·W4 + 4·W5 = 7,908,766;
    //   IDCG = 5·W1+4·W2+3·W3+2·W4+1·W5 = 10,271,927; ndcg 0.769940;
    //   first hit at served rank 1 -> mrr 1.0.
    //  Eval 100: served arm EMPTY, lexical row 6 survives at served
    //   rank 1 with grade 5 (exact slate 6>13>12>11>2) -> DCG
    //   5,000,000, ndcg 0.486764, mrr 1.0.
    //  Eval 400: exact slate exists (vector-only: 13>12>11>2>1, IDCG
    //   10,271,927) but BOTH served arms are empty -> the served slate
    //   VANISHES; the metrics row must still appear with dcg 0 /
    //   ndcg 0.0 / first_hit 0 / mrr 0.0 against the real idcg — the
    //   NULL-dcg-under-positive-idcg edge both engines coalesce.
    //  Eval 200 (no embedding): outside the universe.
    val docs = Seq(
      (0L, "x"), (100L, "q"), (200L, "x"), (400L, "w"),
      (1L, "x x"), (2L, "x"), (3L, "x x x"), (6L, "q"),
      (11L, "z"), (12L, "z"), (13L, "z")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (100L, Array(0.0f, 1.0f)),
      (400L, Array(0.0f, 1.0f)),
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(-1.0f, 0.0f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.7f, 0.3f)), (13L, Array(0.6f, 0.4f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", $"embedding".cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.dot($"v", $"v"))
    val post = TextAnalysis.bm25ImpactsIdf(spark, docs, TextAnalysis.sqrtIdf)
    val served = Seq((0L, 13L, 1L), (0L, 11L, 2L), (0L, 12L, 3L))
      .toDF("eval_id", "train_id", "vec_rank")
    val (metrics, cleanup) = TextAnalysis.servedRankingMetricsManaged(
      docs.filter($"doc_id" % 100 === 0), post, emb, served)
    val rows = metrics.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getLong(5), r.getDouble(6))).toList
    cleanup()
    assert(rows == List(
      (0L, 5L, 7908766L, 10271927L, 0.76994, 1L, 1.0),
      (100L, 5L, 5000000L, 10271927L, 0.486764, 1L, 1.0),
      (400L, 5L, 0L, 10271927L, 0.0, 0L, 0.0)),
      s"metric rows: $rows")
    // a perfectly-preserved slate must grade 1.0 exactly: feed the
    // EXACT vector arm back in as "served" for eval 400's vector-only
    // probe and the served slate equals the exact slate
    val perfect = Seq((400L, 13L, 1L), (400L, 12L, 2L), (400L, 11L, 3L),
      (400L, 2L, 4L), (400L, 1L, 5L), (400L, 3L, 6L))
      .toDF("eval_id", "train_id", "vec_rank")
    val (m2, c2) = TextAnalysis.servedRankingMetricsManaged(
      docs.filter($"doc_id" % 100 === 0), post, emb, perfect)
    val r400 = m2.collect().map(r => (r.getLong(0), r.getDouble(4),
      r.getDouble(6))).find(_._1 == 400L)
    c2()
    assert(r400.contains((400L, 1.0, 1.0)),
      s"identical slate must grade ndcg = mrr = 1.0: $r400")
  }

  test("t30/t31 periodic ablation: recall + ranking metrics re-graded per index REBUILD through the managed handles, census flat, rounds agree") {
    // The production rhythm the managed handles exist for (r18 verdict
    // optional ask #6): a long-running ablation loop rebuilds the index
    // nightly — each rebuild at its OWN versioned path via the raw
    // ivfpqSaveTrainIndexAt, the way a nightly job writes dated
    // artifacts (the session memo is for consumers of the CURRENT
    // index) — and re-grades the served fusion's recall after each
    // rebuild, invoking the cleanup handle once the census
    // materializes. Deterministic build ⇒ every round's census is
    // identical; the persistent-RDD census must be FLAT after round 1
    // (id-set diff vs the post-round-1 baseline — immune to the async
    // ContextCleaner and to alien suite frames), which is exactly the
    // accumulation a dropped handle would break.
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val docs = graft.core.Tables.documents(spark, sf)
    val post = TextAnalysis.bm25ImpactsIdf(spark, docs, TextAnalysis.sqrtIdf)
      .persist(MEMORY_AND_DISK)
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Similarity.dot(col("v"), col("v")))
      .persist(MEMORY_AND_DISK)
    val probes = docs.filter(col("doc_id") % 100 === 0)
    val root = java.nio.file.Files.createTempDirectory("graft-t30-loop").toString
    def persisted: Set[Int] = spark.sparkContext.getPersistentRDDs.keySet.toSet
    var firstRows: List[Seq[Any]] = null
    var baseline: Set[Int] = null
    (1 to 3).foreach { i =>
      val (cbR, encR) =
        Similarity.ivfpqSaveTrainIndexAt(spark, sf, s"$root/v$i")
      val probesVec = emb.join(broadcast(probes.select(col("doc_id"))),
          col("vec_id") === col("doc_id"))
        .select(col("vec_id").as("query_id"), col("v"))
      val servedArm =
        Similarity.ivfpqServedRanksFor(cbR, encR, probesVec, 10)
      val (census, cleanup) = TextAnalysis.servedFusionRecallManaged(
        probes, post, emb, servedArm)
      // the full ablation a real swap ships: recall AND rank-aware
      // metrics, re-graded per rebuild through their managed handles
      val (metrics, mCleanup) = TextAnalysis.servedRankingMetricsManaged(
        probes, post, emb, servedArm)
      val rows = census.collect().map(_.toSeq).toList ++
        metrics.collect().map(_.toSeq).toList
      cleanup(); mCleanup()
      assert(rows.nonEmpty, s"round $i graded no probes")
      if (i == 1) { firstRows = rows; baseline = persisted }
      else {
        assert(rows == firstRows,
          s"round $i census diverged from round 1 — the rebuild is not " +
            "deterministic or a stale frame leaked across rounds")
        val extra = (persisted -- baseline).toSeq.sorted
          .map(id => spark.sparkContext.getPersistentRDDs.get(id)
            .map(r => s"$id=${r.toString}").getOrElse(s"$id=<gone>"))
        assert(extra.isEmpty,
          s"round $i left NEW persistent RDDs $extra — " +
            "a managed handle lost its cleanup in the rebuild loop")
      }
    }
    post.unpersist(); emb.unpersist()
  }

  test("t23 chunker: window/stride boundaries, tail semantics, position-weighted checksum") {
    import spark.implicits._
    // hand-constructed token counts around every boundary: 1, 63, 64
    // (one chunk, tail = n), 65 (two chunks, tail 17), 112 (two chunks,
    // tail EXACTLY 64), 113 (three chunks, tail 17), 160 (3 chunks, 64)
    def doc(id: Long, n: Int): (Long, String) =
      (id, (0 until n).map(k => s"w$k").mkString(" "))
    val docs = Seq(doc(1, 1), doc(2, 63), doc(3, 64), doc(4, 65),
      doc(5, 112), doc(6, 113), doc(7, 160))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-t23").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextAnalysis.queries("t23_chunk_windows")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((1L, 1L, 1L)), s"got ${got(1L)}")
    assert(got(2L) == ((63L, 1L, 63L)))
    assert(got(3L) == ((64L, 1L, 64L)))
    assert(got(4L) == ((65L, 2L, 17L)))   // chunk 1 = tokens [48, 65)
    assert(got(5L) == ((112L, 2L, 64L)))  // tail lands exactly full
    assert(got(6L) == ((113L, 3L, 17L)))
    assert(got(7L) == ((160L, 3L, 64L)))
    // checksum replay: recompute doc 4's two chunks by hand — chunk 0 is
    // tokens 0..63, chunk 1 is tokens 48..64 (16-token overlap), weights
    // 1 and 2 — a same-bytes order flip would change the sum
    def h40(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(md.substring(0, 10), 16)
    }
    val toks4 = (0 until 65).map(k => s"w$k")
    val want4 = 1L * h40(toks4.slice(0, 64).mkString(" ")) +
      2L * h40(toks4.slice(48, 65).mkString(" "))
    val gotSum4 = TextAnalysis.queries("t23_chunk_windows")(spark, dir)
      .filter($"doc_id" === 4).collect().head.getLong(4)
    assert(gotSum4 == want4, s"checksum $gotSum4 != hand-computed $want4")
  }
}
