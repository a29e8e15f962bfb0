package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Tables, Tok}

/** Dataset-curation operators for a training-data pipeline: deterministic
  * subsampling and train/val/test splitting over `documents`.
  *
  * Both are built on a content-stable pseudo-random unit: the first 28 bits
  * of `md5(doc_id)` as a uniform in `[0, 2^28)`. Hash-based sampling is the
  * only kind that scales AND reproduces: it needs no global state, no RNG
  * seed plumbing, assigns every row independently (narrow, no shuffle), and
  * a rerun — or a different engine, which is exactly what the DuckDB oracle
  * proves — selects the identical rows. At 100 TB both queries are
  * scan-bound single passes.
  */
object Curation {

  private def sqlU28(id: String, salt: String = ""): String =
    s"('0x' || substr(md5(CAST($id AS VARCHAR) || '$salt'), 1, 7))::BIGINT"

  /** 2^28 as a double — `u28 / Unit28` is exact (28-bit numerator fits a
    * double mantissa), so threshold compares agree bit-for-bit across
    * engines. */
  private val Unit28 = 268435456.0

  /** Content-stable uniform in [0, 1) from an id column — the single
    * source of truth for every hash gate (c01/c02 and pipeline reuse).
    *
    * `salt` decorrelates gates that stack in one pipeline: two gates on
    * the SAME hash are perfectly correlated (e.g. rows surviving a
    * `u < 0.75` sample all land in a `u < 0.8` train split, leaving
    * val/test empty). Salt every gate after the first. */
  def unitHash(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt)).cast("binary")), 1, 7), 16, 10)
      .cast("long") / Unit28

  /** The c02 80/10/10 split label, exposed so pipelines reuse the
    * oracle-checked assignment instead of re-deriving it. Pass a salt
    * when the pipeline already gated on the unsalted hash. */
  def splitCol(id: Column, salt: String = ""): Column = {
    val u = unitHash(id, salt)
    when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test")
  }

  /** The c01 sampling gate (keep 25% of the dominant language, 75% of
    * the rest) — exposed so stream/batch/pipeline callers run the exact
    * production expression. */
  def sampleGate(id: Column, lang: Column): Column =
    unitHash(id) < when(lang === "en", lit(0.25)).otherwise(lit(0.75))

  /** The stand-in benchmark/eval-set membership used by c03 — one
    * definition for the query, the pipeline's exclusion filter, and any
    * future explicit eval table swap. */
  def isEvalDoc(id: Column): Column = id % 10 === 0

  /** c09's quality + language-agreement gate stage (the same shared
    * column definitions t02/t03 audit), factored so the full build (c09)
    * and the incremental build (c11) can never drift apart. In:
    * documents-shaped rows; out: (doc_id, source, lang, quality, text)
    * for docs passing quality >= 0.5 AND predicted == lang. Narrow
    * per-row ops only. */
  private[graft] def gateStage(docs: DataFrame): DataFrame = docs
    .withColumn("w", split(trim(col("text")), Tok.Ws))
    .withColumn("n_tokens", size(col("w")))
    .withColumn("punct_cnt", TextAnalysis.punctCol(col("text")))
    .withColumn("en_hits", TextAnalysis.hitsCol(col("w"), "en"))
    .withColumn("de_hits", TextAnalysis.hitsCol(col("w"), "de"))
    .withColumn("es_hits", TextAnalysis.hitsCol(col("w"), "es"))
    .withColumn("fr_hits", TextAnalysis.hitsCol(col("w"), "fr"))
    .withColumn("quality",
      TextAnalysis.qualityCol(col("text"), col("n_tokens"),
        col("punct_cnt"), col("en_hits")))
    .withColumn("predicted",
      TextAnalysis.predictedCol(col("en_hits"), col("de_hits"),
        col("es_hits"), col("fr_hits")))
    .filter(col("quality") >= 0.5 && col("predicted") === col("lang"))
    .select(col("doc_id"), col("source"), col("lang"), col("quality"), col("text"))

  /** c12's bottom-k core, parameterized by k: the k smallest salted
    * content-stable hashes are a uniform sample, and samples of growing
    * k NEST — `CurationSpec` proves sample(k) ⊆ sample(k') for k < k'. */
  private[graft] def fixedSample(docs: DataFrame, k: Int): DataFrame = docs
    .select(col("doc_id"), col("source"), col("lang"),
      unitHash(col("doc_id"), salt = "fix").as("u"))
    .orderBy(col("u"), col("doc_id"))
    .limit(k)

  /** Global token offsets per doc — `(doc_id, tk, cum0)` where `cum0` is
    * the exclusive prefix sum of token counts in doc_id order — via the
    * TWO-LEVEL prefix sum (bucket-local windows + broadcast bucket
    * offsets; no global-window funnel — see c05's scale note). Integer
    * DIV throughout: double division + cast would round at ~2^42
    * quotients and drift from the oracle's exact `//`. This is the
    * STATEFUL half of sequence packing (c05/c14) — the "index build" a
    * streaming packer freezes, like t15's LM tables. */
  private[graft] def tokenOffsets(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col("doc_id"), size(split(trim(col("text")), Tok.Ws)).cast("long").as("tk"))
      .withColumn("bucket", expr("doc_id div 100"))
    val wLocal = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wBuckets = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = toks.groupBy(col("bucket")).agg(sum(col("tk")).as("btk"))
      .select(col("bucket").as("obucket"),
        coalesce(sum(col("btk")).over(wBuckets), lit(0L)).as("offset"))
    toks.join(broadcast(offsets), col("bucket") === col("obucket"))
      .withColumn("cum0", col("offset") + sum(col("tk")).over(wLocal) - col("tk"))
      .select(col("doc_id"), col("tk"), col("cum0"))
  }

  /** Per-sequence census from `(doc_id, tk, cum0)` rows: explode each doc
    * to the L-token sequences it touches (fan-out 1 + tk/L, bounded) and
    * aggregate exact integer fill/cut counts per seq_id. Explode + one
    * map-side-combinable agg — every op is streaming-legal, so the same
    * definition is c14's batch body AND the live packer scoring a doc
    * stream against frozen [[tokenOffsets]]. No ORDER BY (callers add
    * it; a streaming sink must not). */
  private[graft] def seqCensus(assigned: DataFrame, L: Long): DataFrame =
    assigned
      .filter(col("tk") > 0)
      .select(col("doc_id"), col("tk"), col("cum0"),
        explode(sequence(expr(s"cum0 div $L"), expr(s"(cum0 + tk - 1) div $L")))
          .as("seq_id"))
      .withColumn("toks_in",
        least((col("seq_id") + 1) * L, col("cum0") + col("tk"))
          - greatest(col("seq_id") * L, col("cum0")))
      .groupBy(col("seq_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks_in")).as("tokens"),
        sum(when(col("cum0") + col("tk") > (col("seq_id") + 1) * L, 1L)
          .otherwise(0L)).as("n_cut"),
        min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
      .select(col("seq_id"), col("n_docs"), col("tokens"), col("n_cut"),
        col("first_doc"), col("last_doc"),
        round(col("tokens").cast("double") / L.toDouble, 6).as("fill"))

  /** Width-parameterized decontamination census (c03 = 5-gram, c16 =
    * 13-gram): flag training docs sharing any word-n-gram with the eval
    * set. Codegen'd TOTAL shingle expression (short docs → empty array;
    * cheap even where Catalyst duplicates the generator input) — see
    * [[graft.functions.ShingleArr]]. Doc-local distinctness is free and
    * semantics-preserving: duplicate (id, s) hits collapse inside
    * countDistinct/min anyway, and it shrinks the join input. (eval_id, s)
    * is already distinct after the per-doc distinct arrays, so no DISTINCT
    * shuffle on either side: the training side joins its raw shingle
    * stream — the 100 TB side never shuffles. */
  private def decontaminate(s: SparkSession, d: String, n: Int): DataFrame = {
    import s.implicits._
    def sh(df: DataFrame, idAs: String) = df
      .select(col("doc_id").as(idAs),
        explode(graft.functions.ShingleArr(split(trim(col("text")), Tok.Ws), n)).as("s"))
    val docs = Tables.documents(s, d)
    val evalSh = sh(docs.filter(isEvalDoc($"doc_id")), "eval_id")
    val trainSh = sh(docs.filter(!isEvalDoc($"doc_id")), "train_id")
    trainSh.join(broadcast(evalSh), "s")
      .groupBy($"train_id")
      .agg(countDistinct($"eval_id").as("n_eval_hits"),
        min($"eval_id").as("first_eval_hit"))
      .orderBy($"train_id")
  }

  /** DuckDB twin of the [[decontaminate]] shingle stream at width `n` —
    * the same per-doc DISTINCT word n-grams (range upper bound is
    * exclusive: len(w) − n + 2). */
  private def sqlShingles(n: Int): String = {
    val cat = (0 until n).map(j => s"w[i+$j]").mkString(" || ' ' || ")
    raw"""SELECT DISTINCT doc_id,
         |    unnest(list_transform(range(1, len(w) - ${n - 2}),
         |      i -> $cat)) AS s
         |  FROM (SELECT doc_id, string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS w FROM documents)
         |  WHERE len(w) >= $n""".stripMargin
  }

  /** Width-parameterized per-eval-item contamination report (c08 = 5-gram,
    * c17 = 13-gram): which eval items share n-grams with the training
    * corpus, and what fraction of their shingles is compromised. Same
    * broadcast-eval shape as [[decontaminate]]; zero-hit eval items stay
    * in the report via the left join from the eval base. */
  private def contaminationReport(s: SparkSession, d: String, n: Int): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val evalBase = docs.filter(isEvalDoc($"doc_id"))
      .select($"doc_id".as("eval_id"),
        graft.functions.ShingleArr(split(trim($"text"), Tok.Ws), n).as("sarr"))
      .select($"eval_id", size($"sarr").cast("long").as("n_shingles"), $"sarr")
    val evalSh = evalBase.select($"eval_id", explode($"sarr").as("s"))
    val trainSh = docs.filter(!isEvalDoc($"doc_id"))
      .select($"doc_id".as("train_id"),
        explode(graft.functions.ShingleArr(split(trim($"text"), Tok.Ws), n)).as("s"))
    val hits = trainSh.join(broadcast(evalSh), "s")
      .groupBy($"eval_id")
      .agg(countDistinct($"train_id").as("h_train"),
        countDistinct($"s").as("h_sh"))
    evalBase.select($"eval_id", $"n_shingles")
      .join(hits, Seq("eval_id"), "left")
      .select($"eval_id", $"n_shingles",
        coalesce($"h_train", lit(0L)).as("n_train_hits"),
        coalesce($"h_sh", lit(0L)).as("n_hit_shingles"),
        when($"n_shingles" > 0,
          round(coalesce($"h_sh", lit(0L)).cast("double") / $"n_shingles".cast("double"), 6))
          .otherwise(lit(0.0)).as("contamination_rate"))
      .orderBy($"eval_id")
  }

  /** DuckDB twin of [[contaminationReport]] at width `n`. */
  private def sqlContamination(n: Int): String =
    raw"""WITH sh AS (
         |  ${sqlShingles(n)}),
         |ev_base AS (SELECT doc_id AS eval_id FROM documents WHERE doc_id % 10 = 0),
         |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 10 = 0),
         |ev_cnt AS (SELECT eval_id, COUNT(*) AS n_shingles FROM ev GROUP BY eval_id),
         |tr AS (SELECT doc_id AS train_id, s FROM sh WHERE doc_id % 10 <> 0),
         |hits AS (SELECT eval_id, COUNT(DISTINCT train_id) AS h_train,
         |    COUNT(DISTINCT s) AS h_sh
         |  FROM tr JOIN ev USING (s) GROUP BY eval_id)
         |SELECT b.eval_id,
         |  COALESCE(c.n_shingles, 0) AS n_shingles,
         |  COALESCE(h.h_train, 0) AS n_train_hits,
         |  COALESCE(h.h_sh, 0) AS n_hit_shingles,
         |  CASE WHEN COALESCE(c.n_shingles, 0) > 0
         |    THEN round(CAST(COALESCE(h.h_sh, 0) AS DOUBLE) / c.n_shingles, 6)
         |    ELSE 0.0 END AS contamination_rate
         |FROM ev_base b
         |LEFT JOIN ev_cnt c USING (eval_id)
         |LEFT JOIN hits h USING (eval_id)
         |ORDER BY eval_id""".stripMargin

  /** DuckDB twin of [[decontaminate]] at width `n`. */
  private def sqlDecontaminate(n: Int): String =
    raw"""WITH sh AS (
         |  ${sqlShingles(n)}),
         |ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 10 = 0),
         |tr AS (SELECT doc_id AS train_id, s FROM sh WHERE doc_id % 10 <> 0)
         |SELECT train_id, COUNT(DISTINCT eval_id) AS n_eval_hits,
         |  min(eval_id) AS first_eval_hit
         |FROM tr JOIN ev USING (s)
         |GROUP BY train_id ORDER BY train_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Stratified downsampling for data mixing: keep 25% of the dominant
    // language, 75% of the rest — per-row hash gate, no shuffle, no RNG.
    "c01_stratified_sample" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .filter(sampleGate($"doc_id", $"lang"))
        .select($"doc_id", $"lang")
        .orderBy($"doc_id")
    },

    // Benchmark decontamination: flag training documents sharing any
    // word-5-gram with the held-out eval set (doc_id % 10 = 0 stands in
    // for the benchmark corpus). The eval shingle set is small by
    // construction and broadcast, so the training side is a single scan +
    // broadcast-hash join — the shape that decontaminates 100 TB of
    // training text against megabytes of benchmarks without a shuffle.
    "c03_decontaminate" -> (decontaminate(_, _, 5)),

    // The published-practice width: eval-decontamination pipelines in the
    // literature (GPT-3 appendix C, PaLM, Llama) use 13-gram exact
    // overlap, not 5-gram — longer shingles cut false positives from
    // common phrases to near zero while still catching verbatim leakage.
    // Same single-scan + broadcast shape as c03 (only the width changes);
    // at 100 TB the wider shingle also SHRINKS the broadcast side: an
    // eval doc of L words carries L-12 distinct 13-grams vs L-4 5-grams,
    // and far fewer of them recur across documents.
    "c16_decontaminate_13g" -> (decontaminate(_, _, 13)),

    // The inverse report of c03: decontamination tells you which TRAIN
    // docs to drop; this tells you which EVAL items are compromised and
    // how badly — the per-benchmark-item contamination census a lab runs
    // before trusting an eval number. Same broadcast-eval-shingles join
    // as c03 (the 100 TB training side never shuffles); eval items with
    // zero hits stay in the report via a left join from the eval base —
    // absence of contamination must be a row, not a missing row.
    "c08_contamination_report" -> (contaminationReport(_, _, 5)),

    // c16's inverse-report twin: the same per-eval-item census at the
    // published 13-gram width — the report a lab actually reads before
    // trusting an eval number, free of the common-phrase false positives
    // the 5-gram report carries.
    "c17_contamination_13g" -> (contaminationReport(_, _, 13)),

    // Deterministic EPOCH SHUFFLE — the loader-prep reshuffle between
    // training epochs (c05 packs shards, c14 packs sequences; this is
    // the step that reorders the corpus per epoch without materializing
    // a permutation): each doc's epoch-e position is the 60-bit integer
    // of md5("c18:<e>:<doc_id>") — a content-stable pseudo-random key,
    // so the order is reproducible, epochs decorrelate (fresh salt), and
    // NO global rank/sort is ever computed: the shard is key mod 8 and
    // the within-shard order IS the key. Census per (epoch, shard):
    // docs, tokens, the lead (min-key) doc, and for epoch 1 how many
    // docs stayed in their epoch-0 shard (the stickiness a broken salt
    // would push to 100%). Scale shape: one narrow scan computes both
    // epochs' keys per doc; the census exchanges per-(epoch, shard)
    // integer partials; lead doc is a map-side min_by.
    "c18_epoch_shuffle" -> { (s, d) =>
      import s.implicits._
      def key(e: Int) = conv(substring(md5(concat(lit(s"c18:$e:"),
        $"doc_id".cast("string")).cast("binary")), 1, 15), 16, 10).cast("long")
      val keyed = Tables.documents(s, d)
        .select($"doc_id",
          size(split(trim($"text"), "[ \\t\\n\\x0B\\f\\r]+")).cast("long").as("tk"),
          key(0).as("k0"), key(1).as("k1"))
        .select($"doc_id", $"tk", ($"k0" % 8).as("s0"), ($"k1" % 8).as("s1"),
          $"k0", $"k1")
      keyed
        .select($"doc_id", $"tk", explode(array(
          struct(lit(0L).as("epoch"), $"s0".as("shard"), $"k0".as("k"),
            lit(false).as("sticky")),
          struct(lit(1L).as("epoch"), $"s1".as("shard"), $"k1".as("k"),
            ($"s0" === $"s1").as("sticky")))).as("x"))
        .select($"doc_id", $"tk", $"x.epoch".as("epoch"), $"x.shard".as("shard"),
          $"x.k".as("k"), $"x.sticky".as("sticky"))
        .groupBy($"epoch", $"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"tk").as("n_tokens"),
          min_by($"doc_id", struct($"k", $"doc_id")).as("lead_doc"),
          sum(when($"sticky", 1L).otherwise(0L)).as("n_sticky"))
        .orderBy($"epoch", $"shard")
    },

    // Data mixing with a token budget: derive per-source sampling rates
    // from corpus statistics (equal token share per source within a 50%
    // global budget, capped at 1), then apply them with a SALTED hash
    // gate. Rates come from exact integer token counts and one identical
    // double formula, so both engines gate identically. Two scans total
    // (stats, then gate) — the 100 TB mixing recipe.
    "c04_token_budget_mix" -> { (s, d) =>
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", $"source", size(split(trim($"text"), Tok.Ws)).cast("long").as("tk"))
      val stats = toks.groupBy($"source").agg(sum($"tk").as("src_toks"))
      val totals = stats.agg(sum($"src_toks").as("all_toks"),
        count(lit(1)).as("n_sources"))
      val rates = stats.crossJoin(broadcast(totals))
        .select($"source".as("rsrc"),
          least(lit(1.0),
            ($"all_toks".cast("double") * 0.5 / $"n_sources") / $"src_toks".cast("double"))
            .as("rate"))
      toks.join(broadcast(rates), $"source" === $"rsrc")
        .filter(unitHash($"doc_id", salt = "mix") < $"rate")
        .groupBy($"source")
        .agg(count(lit(1)).as("docs_kept"), sum($"tk").as("toks_kept"),
          round(max($"rate"), 6).as("rate"))
        .orderBy($"source")
    },

    // Fixed-SIZE reproducible sample — the complement of c01's rate
    // gates: "give me exactly N documents" (an eval set, a labeling
    // batch) with no rate arithmetic and full reproducibility. Bottom-k
    // by salted content-stable hash: the k smallest hashes ARE a uniform
    // sample, any engine re-derives the identical set, and two samples
    // with k < k' nest (the bigger one contains the smaller — handy for
    // growing an eval set without resampling). Plans as
    // TakeOrderedAndProject (plan-guarded): per-partition heaps of k,
    // no global sort — the same scale shape as q08's top-k.
    "c12_fixed_sample" -> { (s, d) =>
      import s.implicits._
      fixedSample(Tables.documents(s, d), 100)
        .select($"doc_id", $"source", $"lang", round($"u", 6).as("u"))
        .orderBy($"doc_id")
    },

    // Temperature-based source mixing — the p_s ∝ n_s^τ rule every
    // multilingual / multi-domain LLM mixture uses (τ = 0.5 here): low
    // temperature FLATTENS the mixture, so small sources keep relatively
    // more and dominant sources are downsampled harder than c04's
    // equal-share rule. The source weight sqrt(src_toks) is carried as a
    // FIXED-POINT integer (round(sqrt·1e6)) so the cross-source weight
    // sum is an exact integer in both engines — sqrt is IEEE
    // correctly-rounded everywhere, but a cross-source DOUBLE sum would
    // depend on add order. Per-source rate = min(1, budget·p_s/src_toks)
    // as one shared left-associative double formula; the gate is the
    // salted content-stable hash. Same two-scan 100 TB shape as c04.
    "c10_temperature_mix" -> { (s, d) =>
      import s.implicits._
      val toks = Tables.documents(s, d)
        .select($"doc_id", $"source",
          size(split(trim($"text"), Tok.Ws)).cast("long").as("tk"))
      val stats = toks.groupBy($"source").agg(sum($"tk").as("src_toks"))
        .withColumn("wfx", round(sqrt($"src_toks".cast("double")) * 1e6).cast("long"))
      val tot = stats.agg(sum($"src_toks").as("all_toks"), sum($"wfx").as("swfx"))
      val rates = stats.crossJoin(broadcast(tot))
        .select($"source".as("rsrc"), $"src_toks",
          least(lit(1.0),
            $"all_toks".cast("double") * 0.5 * $"wfx".cast("double")
              / $"swfx".cast("double") / $"src_toks".cast("double")).as("rate"))
      val kept = toks.join(broadcast(rates), $"source" === $"rsrc")
        .filter(unitHash($"doc_id", salt = "temp") < $"rate")
        .groupBy($"source")
        .agg(count(lit(1)).as("docs_kept"), sum($"tk").as("toks_kept"))
      rates
        .join(broadcast(kept), $"rsrc" === $"source", "left")
        .select($"rsrc".as("source"), $"src_toks", round($"rate", 6).as("rate"),
          coalesce($"docs_kept", lit(0L)).as("docs_kept"),
          coalesce($"toks_kept", lit(0L)).as("toks_kept"))
        .orderBy($"source")
    },

    // Token-packed training shards: deterministic doc order (doc_id),
    // exclusive running token sum, shard = prefix DIV capacity — the
    // greedy packing every sequence-packing loader runs. The prefix sum
    // is computed with the TWO-LEVEL distributed scan (a global
    // no-partition window would funnel all rows through one task):
    // contiguous doc_id buckets get local prefix sums in parallel, the
    // per-bucket totals (one tiny row each) get a cumulative offset, and
    // offsets broadcast back. Identical value to the naive global
    // window. The bucket width (100 here, so test data spans many
    // buckets) is the scale knob: the only remaining single-partition
    // window reads n/K rows of (bucket, total) — K≈10^6 at 10^10 docs
    // keeps the serial task at ~10^4 tiny rows, and the construction
    // recurses over the totals if that ever outgrows one task
    // (SCALE.md §Curation).
    "c05_token_shards" -> { (s, d) =>
      import s.implicits._
      tokenOffsets(Tables.documents(s, d))
        .withColumn("shard", expr("cum0 div 2000"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"tk").as("total_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
        .orderBy($"shard")
    },

    // Fixed-length SEQUENCE packing — the last data-prep step before a
    // pretraining run: concatenate the corpus in deterministic doc order
    // and cut every L=256 tokens (the GPT-style zero-padding loader;
    // c05/c13 pack WHOLE docs into budget shards, this SPLITS docs at
    // exact token boundaries). Output is the per-sequence census a
    // loader build verifies: docs touched, tokens filled (L everywhere
    // but the tail), docs CUT at the right boundary (continuation
    // tokens), first/last doc, fill ratio.
    //
    // Scale shape: the global token offset is c05's TWO-LEVEL prefix sum
    // (bucket-local windows + broadcast bucket offsets — no global-window
    // funnel); each doc then explodes to only the sequences it touches
    // (fan-out 1 + tk/L, bounded), and the census is a map-side-
    // combinable groupBy on seq_id. Every quantity is exact integer
    // arithmetic (div/least/greatest), so the census is bit-identical
    // in both engines with no float discipline at all.
    "c14_sequence_pack" -> { (s, d) =>
      import s.implicits._
      seqCensus(tokenOffsets(Tables.documents(s, d)), L = 256L)
        .orderBy($"seq_id")
    },

    // DSIR-style importance selection (Xie et al. 2023, "Data Selection
    // for Language Models via Importance Resampling"): train a bigram LM
    // on the TARGET domain (the `en` corpus — the in-domain proxy) and a
    // second on the RAW pool (everything else), score every pool doc
    // under both, and keep the top-100 by the exact log importance ratio
    // log p_target(x) − log p_raw(x) = nll_raw − nll_target. Both nll's
    // are t15's integer bit costs (add-one-smoothed, floor-log2), so the
    // score is an exact integer and ranking is engine-deterministic with
    // no float discipline — the published recipe's Gumbel resampling is
    // replaced by the deterministic top-k, the same trade every other
    // sampler here makes (c07/c12).
    //
    // Scale shape: both LM tables are vocab-bounded map-side-combined
    // partials, BROADCAST 4-ways onto ONE pass over the pool corpus (the
    // pool never shuffles for the lookups); the per-doc agg exchanges
    // integer partials; top-100 is TakeOrderedAndProject, never a full
    // sort. At 100 TB the target proxy is small by construction (DSIR
    // trains it on Wikipedia/books-scale data) and the pool-side raw LM
    // is the same vocab-bounded count table, pruned to top-K with an OOV
    // default exactly like t15's scale note.
    "c15_dsir_selection" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      // persisted: the two LM trainings (3 subqueries each) and the
      // scoring pass would otherwise re-scan and re-tokenize the corpus
      // seven times; the cached frame is the tokenized corpus a
      // production pipeline stages once before any LM work
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", $"lang", split(trim($"text"), Tok.Ws).as("w"))
        .filter(size($"w") >= 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (tbT, tcT, vvT) = TextAnalysis.lmTablesOf(docs.filter($"lang" === "en"))
      val pool = docs.filter($"lang" =!= "en")
      val (tbR, tcR, vvR) = TextAnalysis.lmTablesOf(pool)
      val db = pool.select($"doc_id", $"source", $"lang", explode(expr(
          """transform(sequence(1, size(w) - 1),
            |  i -> named_struct('w1', element_at(w, i),
            |    'bg', concat_ws(' ', element_at(w, i), element_at(w, i + 1))))""".stripMargin)).as("z"))
        .select($"doc_id", $"source", $"lang", $"z.w1".as("w1"), $"z.bg".as("bg"))
      def bits(c1: Column, v: Column, c12: Column): Column =
        (length(conv(coalesce(c1, lit(0L)) + v, 10, 2))
          - length(conv(coalesce(c12, lit(0L)) + 1, 10, 2))).cast("long")
      db.join(broadcast(tbT.select($"bg", $"c12".as("c12t"))), Seq("bg"), "left")
        .join(broadcast(tcT.select($"w1", $"c1".as("c1t"))), Seq("w1"), "left")
        .join(broadcast(tbR.select($"bg", $"c12".as("c12r"))), Seq("bg"), "left")
        .join(broadcast(tcR.select($"w1", $"c1".as("c1r"))), Seq("w1"), "left")
        .withColumn("one", lit(1))
        .join(broadcast(vvT.select($"one", $"v".as("vt"))), Seq("one"))
        .join(broadcast(vvR.select($"one", $"v".as("vr"))), Seq("one"))
        .select($"doc_id", $"source", $"lang",
          bits($"c1t", $"vt", $"c12t").as("bt"),
          bits($"c1r", $"vr", $"c12r").as("br"))
        .groupBy($"doc_id", $"source", $"lang")
        .agg(count(lit(1)).as("n_bigrams"),
          sum($"bt").as("nll_target"), sum($"br").as("nll_raw"))
        .withColumn("score_bits", $"nll_raw" - $"nll_target")
        .orderBy($"score_bits".desc, $"doc_id")
        .limit(100)
        .withColumn("rank",
          row_number().over(Window.orderBy($"score_bits".desc, $"doc_id")))
        .select($"rank", $"doc_id", $"source", $"lang", $"n_bigrams",
          $"nll_target", $"nll_raw", $"score_bits",
          round($"score_bits".cast("double") / $"n_bigrams".cast("double"), 6)
            .as("bits_gap"))
        .orderBy($"rank")
    },

    // Shard MATERIALIZATION — the write side c05 stops short of: a real
    // pipeline doesn't just compute shard assignments, it lays the shards
    // down as files a trainer can read independently. This writes each
    // token-budget shard as its own parquet partition
    // (`partitionBy(shard)`, one file per shard, rows in deterministic
    // doc_id order via sortWithinPartitions), then RE-READS the files and
    // reports the per-shard census — n_docs/tokens/bounds recomputed from
    // the round-tripped text plus a 40-bit md5 content checksum. The
    // DuckDB oracle replays the census directly from `documents`, so a
    // hash match proves the materialized shards carry exactly the right
    // documents with byte-intact text — the write-side twin of d16.
    //
    // Scale shape: assignment is c05's plan (bucket-local prefix sums +
    // broadcast bucket offsets — no global-window bottleneck). The write
    // adds the one exchange a shard layout genuinely requires
    // (repartition on the shard key co-locates each shard into one
    // writer → one file per shard); at 100 TB you'd RANGE-partition on
    // the cumulative-token offset instead, so each writer emits a
    // contiguous run of shards and file counts stay bounded — the same
    // plan with a different partitioner, not a different algorithm.
    "c13_shard_materialize" -> { (s, d) =>
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
        .select($"doc_id", $"source", $"text",
          size(split(trim($"text"), Tok.Ws)).cast("long").as("tk"))
        .withColumn("bucket", expr("doc_id div 100"))
      val wLocal = Window.partitionBy($"bucket").orderBy($"doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wBuckets = Window.orderBy($"bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = docs.groupBy($"bucket").agg(sum($"tk").as("btk"))
        .select($"bucket".as("obucket"),
          coalesce(sum($"btk").over(wBuckets), lit(0L)).as("offset"))
      val assigned = docs.join(broadcast(offsets), $"bucket" === $"obucket")
        .withColumn("cum0", $"offset" + sum($"tk").over(wLocal) - $"tk")
        .withColumn("shard", expr("cum0 div 2000"))
        .select($"shard", $"doc_id", $"source", $"text")
      // per-sfDir path: a census must never read another scale's shards
      val path = graft.core.ArtifactRoot.path(s, "c13_shards", d)
      assigned
        .repartition($"shard")
        .sortWithinPartitions($"doc_id")
        .write.mode("overwrite").partitionBy("shard").parquet(path)
      // census strictly from the RE-READ files (partition-column type
      // inference reads `shard` back as int — restore the long)
      s.read.parquet(path)
        .select(col("shard").cast("long").as("shard"), $"doc_id", $"text")
        .withColumn("tk", size(split(trim($"text"), Tok.Ws)).cast("long"))
        .groupBy($"shard")
        .agg(count(lit(1)).as("n_docs"), sum($"tk").as("total_tokens"),
          min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"),
          sum(conv(substring(md5($"text".cast("binary")), 1, 10), 16, 10)
            .cast("long")).as("text_checksum"))
        .orderBy($"shard")
    },

    // Incremental MATERIALIZED-VIEW maintenance — the aggregate analog
    // of the nightly family (s23 appends codes, d22 serves ledgers, s24
    // compacts deletes): a daily (day, event_type) rollup ledger holds
    // MERGEABLE partial states (counts, EXACT decimal sums, min/max,
    // an id-multiset checksum — every one combinable by sum/min/max, so
    // re-merging partials is exact by associativity); tonight's
    // increment is the newest day PLUS a late-arriving slice of the
    // prior day (event_id % 7 == 3 — the deterministic stand-in for
    // late data), so maintenance must both APPEND a new day partition
    // and RE-MERGE an existing one: the touched days' old states union
    // the increment's partials, merge by sum/min/max, stage, and swap
    // in via dynamic partition overwrite (s24's staging pattern —
    // untouched day partitions never rewritten). The oracle recomputes
    // the rollup from ALL events from scratch: a hash match IS the
    // defining MV-maintenance invariant (incremental == full
    // recompute), and any ghost, double-merge, or wiped untouched
    // partition breaks it. Scale shape: maintenance cost follows the
    // increment + touched partitions (base event rows are never
    // re-scanned); distinct-user states would ride along as mergeable
    // HLL sketches (q20's verdict pattern) — counts here stay exact.
    "c21_rollup_maintenance" -> { (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(to_date($"ts").as("day"), $"event_type", $"event_id", $"value")
      def state(df: DataFrame): DataFrame = df
        .groupBy($"day", $"event_type")
        .agg(count(lit(1)).as("n_events"),
          sum($"value".cast("decimal(14,2)")).as("value_sum"),
          min($"value").as("vmin"), max($"value").as("vmax"),
          sum(conv(substring(md5($"event_id".cast("string").cast("binary")),
            1, 10), 16, 10).cast("long")).as("id_checksum"))
      // the nightly cut — one driver-side value, like s24's partition list
      val maxDay = ev.agg(max($"day")).head().getDate(0)
      val lateDay = java.sql.Date.valueOf(maxDay.toLocalDate.minusDays(1))
      val isInc = $"day" === lit(maxDay) ||
        ($"day" === lit(lateDay) && $"event_id" % 7 === 3)
      val path = graft.core.ArtifactRoot.path(s, "c21_rollup", d)
      // last night's ledger: all non-increment events, partitioned by day
      state(ev.filter(!isInc))
        .write.mode("overwrite").partitionBy("day").parquet(path + "/roll")
      // tonight: merge old partials of the touched days with the
      // increment's partials (stage, then swap — s24's race-free pattern)
      val inc = state(ev.filter(isInc))
      s.read.parquet(path + "/roll")
        .filter($"day".isin(maxDay, lateDay))
        .unionByName(inc)
        .groupBy($"day", $"event_type")
        .agg(sum($"n_events").cast("long").as("n_events"),
          sum($"value_sum").cast("decimal(24,2)").as("value_sum"),
          min($"vmin").as("vmin"), max($"vmax").as("vmax"),
          sum($"id_checksum").cast("long").as("id_checksum"))
        .write.mode("overwrite").parquet(path + "/merge_stage")
      s.read.parquet(path + "/merge_stage")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(path + "/roll")
      s.catalog.refreshByPath(path + "/roll")
      val ledger = s.read.parquet(path + "/roll")
      val census = ledger.agg(
          countDistinct($"day").as("n_days"),
          count(lit(1)).as("n_rollup_rows"))
        .withColumn("n_days_touched", lit(2L))
        .crossJoin(broadcast(
          ev.filter(isInc).agg(count(lit(1)).as("n_increment_events"))))
      ledger
        .select($"day".cast("timestamp_ntz").as("day"), $"event_type", $"n_events",
          round($"value_sum", 2).cast("double").as("value_sum"),
          round($"vmin", 6).as("vmin"), round($"vmax", 6).as("vmax"),
          $"id_checksum")
        .crossJoin(broadcast(census))
        .orderBy($"day", $"event_type")
    },

    // Lake-format interop round-trip — the storage capability c13 proves
    // for parquet, extended to the OTHER two formats a lakehouse corpus
    // actually arrives in: columnar ORC (splittable, predicate-pushdown —
    // Spark's reader/writer ship in-box) and gzip-compressed JSON lines
    // (the interchange format crawl dumps and API exports use). The
    // corpus is WRITTEN as both, re-read — the JSON arm through an
    // explicit schema, never inference, and through gzip decompression —
    // and censused per (format, source) with a doc_id+text checksum. The
    // oracle computes the census once from raw `documents` and expects it
    // IDENTICALLY under both format labels, so any row lost, text byte
    // mangled (JSON escaping!), or id re-typed by either round-trip
    // hash-mismatches. Scale shape: both writes are one narrow pass
    // (file I/O, no exchange beyond the tiny census partials); gzip JSON
    // is NOT splittable — the documented tradeoff: each .json.gz file is
    // one read task, so shard your dumps; ORC splits like parquet.
    "c20_format_roundtrip" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d).select($"doc_id", $"source", $"text")
      val path = graft.core.ArtifactRoot.path(s, "c20_formats", d)
      docs.write.mode("overwrite").orc(path + "/orc")
      docs.write.mode("overwrite").option("compression", "gzip")
        .json(path + "/json_gz")
      def census(df: DataFrame, fmt: String): DataFrame = df
        .groupBy($"source")
        .agg(count(lit(1)).as("n_docs"),
          sum($"doc_id").as("id_sum"),
          sum(conv(substring(md5(concat_ws(",", $"doc_id", $"text")
            .cast("binary")), 1, 10), 16, 10).cast("long")).as("doc_checksum"))
        .select(lit(fmt).as("format"), $"source", $"n_docs", $"id_sum",
          $"doc_checksum")
      // third arm: XML (the datasource Spark 4 ships in-box) — element
      // content escapes &<> and round-trips exactly for a corpus free of
      // control chars / CR (XML 1.0 forbids the former and parsers
      // normalize the latter; SchemaCanarySpec's ASCII canary corpus has
      // neither — a regeneration that introduces them fails THIS hash)
      docs.write.mode("overwrite").option("rowTag", "doc")
        .format("xml").save(path + "/xml")
      val rtSchema = "doc_id LONG, source STRING, text STRING"
      census(s.read.orc(path + "/orc"), "orc")
        .unionAll(census(
          s.read.schema(rtSchema).json(path + "/json_gz")
            .select($"doc_id", $"source", $"text"), "json_gz"))
        .unionAll(census(
          s.read.schema(rtSchema).option("rowTag", "doc")
            .format("xml").load(path + "/xml")
            .select($"doc_id", $"source", $"text"), "xml"))
        .orderBy($"format", $"source")
    },

    // Per-DOCUMENT importance-weighted sampling — the gate c01/c04 can't
    // express: each doc's keep probability is its own quality weight
    // (here min(1, tokens/100) — favor longer docs), not a per-stratum
    // rate. Same content-stable hash gate (salted to decorrelate from
    // the other gates), so the 100 TB properties carry over: one narrow
    // scan, no shuffle until the tiny per-source census, reproducible
    // across engines (the oracle selects the identical rows). Weight
    // from exact integer token counts via one double division — the
    // gate compare is bit-identical in both engines.
    "c07_weighted_sample" -> { (s, d) =>
      import s.implicits._
      val kept = unitHash($"doc_id", salt = "c07") <
        least(lit(1.0), $"tk".cast("double") / 100.0)
      Tables.documents(s, d)
        .select($"doc_id", $"source",
          size(split(trim($"text"), Tok.Ws)).cast("long").as("tk"))
        .groupBy($"source")
        .agg(count(lit(1)).as("docs_seen"),
          count(when(kept, 1)).as("docs_kept"),
          coalesce(sum(when(kept, $"tk")), lit(0L)).as("toks_kept"),
          // E[docs_kept] = Σ weights; exact integer sum (Σ min(tk,100)),
          // ONE double division at the end — no float accumulation
          round(sum(least($"tk", lit(100L))).cast("double") / 100.0, 6)
            .as("expected_docs"))
        .orderBy($"source")
    },

    // Deterministic 80/10/10 train/val/test assignment; output is the
    // per-(lang, split) census plus the id-range evidence that assignment
    // is content-stable.
    "c02_hash_split" -> { (s, d) =>
      import s.implicits._
      Tables.documents(s, d)
        .withColumn("split", splitCol($"doc_id"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"),
          min($"doc_id").as("min_doc"), max($"doc_id").as("max_doc"))
        .orderBy($"lang", $"split")
    },

    // Curation funnel: per-gate survival census (docs + tokens after each
    // stacked filter). Every gate — length, token count, duplicate-bigram
    // fraction, salted hash sample — is per-row algebra, so the WHOLE
    // funnel is ONE scan + one 5-row conditional aggregation: selectivity
    // reporting over 100 TB without re-running the pipeline per stage.
    // The repetition gate's per-row `array_distinct` replaces a
    // shuffle-heavy explode+groupBy — document-local dedup needs no
    // cross-row state.
    // The end-to-end corpus BUILD — the single query a pipeline ships:
    // exact-dup representatives only (d01's convention) → t02's quality
    // gate (≥ 0.5) → t03's language gate (predicted must AGREE with the
    // declared lang — drops mislabeled docs) → span dedup over the
    // survivors (d16's first-occurrence rule) → the rebuilt cleaned text.
    // Every stage is the SAME shared definition its report query uses
    // (TextAnalysis.qualityCol/predictedCol, Dedup.repsOnly/spanCleaned),
    // so the build can never drift from the audited metrics. Scale shape
    // inherits from the parts: narrow per-row gates, hash-keyed dedup
    // aggs, one text pass (measured: 102 of 500 docs survive at sf0.01 —
    // a realistic ~20% high-quality cut).
    "c09_corpus_build" -> { (s, d) =>
      import s.implicits._
      Dedup.spanCleaned(gateStage(Dedup.repsOnly(Tables.documents(s, d))))
        .select($"doc_id", $"source", $"lang", round($"quality", 6).as("quality"),
          $"n_chunks", $"kept_chunks", $"cleaned_text")
        .orderBy($"doc_id")
    },

    // The INCREMENTAL corpus build — c09's nightly form, composing three
    // audited operators end-to-end on the arriving slice only:
    // (1) d17's batch-vs-base dedup verdicts gate the increment (exact +
    // near dups of already-ingested docs drop; the base is NEVER
    // re-processed); (2) c09's quality + language-agreement gates run on
    // the survivors; (3) span dedup ships a chunk iff the BASE chunk
    // ledger has never seen its hash AND it is the first occurrence
    // within tonight's increment (spanCleaned's external-ledger
    // anti-join). At 100 TB the nightly cost follows the increment:
    // the base contributes its fingerprint/band/chunk-hash ledgers —
    // maintained sidecars, 16-byte keys — and none of its text ever
    // moves. Output = c09's shape for the shipped increment docs
    // (kept_chunks = 0 means the doc survived dedup+gates but every
    // span was already in the corpus — a row the ingest log wants).
    "c11_incremental_build" -> { (s, d) =>
      import s.implicits._
      val docsAll = Tables.documents(s, d)
      val isNew = col("doc_id") % 10 === 7
      val kept1 = Dedup.queries("d17_incremental_dedup")(s, d)
        .filter($"verdict" === "kept").select($"doc_id")
      val inc = docsAll.join(kept1, Seq("doc_id"), "leftsemi")
      val ledger = Dedup.chunkHashesOf(docsAll.filter(!isNew))
        .select($"h").distinct()
      Dedup.spanCleaned(gateStage(inc), excludeHashes = Some(ledger))
        .select($"doc_id", $"source", $"lang", round($"quality", 6).as("quality"),
          $"n_chunks", $"kept_chunks", $"cleaned_text")
        .orderBy($"doc_id")
    },

    "c06_curation_funnel" -> { (s, d) =>
      import s.implicits._
      val dup2 = when(size($"w") >= 2,
        lit(1.0) - size(array_distinct(expr(
          "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1)))")))
          .cast("double") / (size($"w") - 1))
        .otherwise(lit(1.0))
      val base = Tables.documents(s, d)
        .withColumn("w", split(trim($"text"), Tok.Ws))
        .select($"n_chars", size($"w").as("n_tok"), dup2.as("dup2"),
          unitHash($"doc_id", salt = "gate").as("u"))
        .withColumn("tk", $"n_tok".cast("long"))
        .withColumn("g1", $"n_chars" >= 100)
        .withColumn("g2", $"g1" && $"n_tok" >= 40)
        .withColumn("g3", $"g2" && $"dup2" <= 0.02)
        .withColumn("g4", $"g3" && $"u" < 0.75)
      def kept(g: Column) = (count(when(g, 1)), sum(when(g, $"tk")))
      val (c1, t1) = kept($"g1"); val (c2, t2) = kept($"g2")
      val (c3, t3) = kept($"g3"); val (c4, t4) = kept($"g4")
      base.agg(
          count(lit(1)).as("c0"), sum($"tk").as("t0"),
          c1.as("c1"), t1.as("t1"), c2.as("c2"), t2.as("t2"),
          c3.as("c3"), t3.as("t3"), c4.as("c4"), t4.as("t4"))
        .selectExpr(
          """stack(5,
            |  0, 'total',       c0, t0,
            |  1, 'len>=100',    c1, t1,
            |  2, '+tok>=40',    c2, t2,
            |  3, '+dup2<=0.02', c3, t3,
            |  4, '+hash<0.75',  c4, t4) AS (stage, gate, docs_kept, toks_kept)""".stripMargin)
        .orderBy(col("stage"))
    },

    // Z-ORDER data layout (Delta/Iceberg `OPTIMIZE ZORDER BY` shape) —
    // the multi-column data-skipping layout a 100 TB lake lives on:
    // lineitem keys range-bucketed to 8 bits each, bit-interleaved into
    // a Morton code (`operators.ZOrder`, pure codegen'd shifts), files
    // clustered by the code's top nibble (16 cells = a 4×4 grid of
    // 64×64 (x, y) boxes). Census per cell FROM THE RE-READ FILES
    // (c13's prove-the-files pattern: a 40-bit row checksum the oracle
    // recomputes from the raw table — a lost/dup row hash-mismatches),
    // side by side with the same census under the single-column
    // `linear` layout (x DIV 16 stripes). The output states the layout
    // tradeoff as data: zorder cells bound BOTH dims (box_area 4096);
    // linear stripes bound x tightly (16) but leave y unbounded (box
    // area 16·256) — which is exactly why a y-filtered scan prunes
    // nothing on the linear layout. ZOrderSpec turns that claim into a
    // measured row-group-skipping assertion on the written files.
    // Scale shape: one narrow pass computes the code (integer shifts
    // fused into the scan); the one exchange is the repartition that
    // co-locates a cell into one writer — c13's inherent move; at
    // 100 TB swap the DIV for a range partitioner over z and the same
    // plan lays out any table.
    // SIDE EFFECT (deliberate, c13 prove-the-files precedent): the
    // layout write below runs EAGERLY at DataFrame-construction time —
    // the census must read the files actually on disk, so plan-only
    // tooling (ExplainAudit / ShuffleAudit / PlanShapeSpec) pays one
    // sf-sized parquet write to the session's ArtifactRoot
    // (c22_zorder_<sf> under the per-session tmpdir since r19). The
    // dir is overwrite-mode per (session, sf) — bounded: one copy per
    // scale factor per session, ~MBs at test SFs, reclaimed by the
    // root's JVM shutdown hook — and stays readable within the
    // session, so ZOrderSpec can re-open the same files for its
    // row-group-skipping measurements via ArtifactRoot.path.
    "c22_zorder_layout" -> { (s, d) =>
      import s.implicits._
      val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_linenumber",
        ($"l_partkey" % 256).cast("int").as("x"),
        ($"l_suppkey" % 256).cast("int").as("y"))
      val z = li
        .withColumn("z", graft.operators.ZOrder.interleave($"x", $"y"))
        .withColumn("zcell", expr("CAST(z div 4096 AS INT)"))
      val path = graft.core.ArtifactRoot.path(s, "c22_zorder", d)
      z.repartition($"zcell").sortWithinPartitions($"z")
        .write.mode("overwrite").partitionBy("zcell").parquet(path)
      def census(rows: DataFrame, cell: Column, layout: String): DataFrame =
        rows.groupBy(cell.as("cell"))
          .agg(count(lit(1)).as("n_rows"),
            min($"x").as("min_x"), max($"x").as("max_x"),
            min($"y").as("min_y"), max($"y").as("max_y"),
            sum(conv(substring(md5(concat_ws(",",
                $"l_orderkey", $"l_linenumber", $"x", $"y").cast("binary")),
              1, 10), 16, 10).cast("long")).as("row_checksum"))
          .select(lit(layout).as("layout"), $"cell", $"n_rows",
            $"min_x", $"max_x", $"min_y", $"max_y",
            (($"max_x" - $"min_x" + 1).cast("long")
              * ($"max_y" - $"min_y" + 1).cast("long")).as("box_area"),
            $"row_checksum")
      val zorder = census(
        s.read.parquet(path), col("zcell").cast("int"), "zorder")
      val linear = census(li, expr("CAST(x div 16 AS INT)"), "linear")
      zorder.unionByName(linear).orderBy($"layout", $"cell")
    },

    // SCHEMA EVOLUTION roundtrip — the lake capability every long-lived
    // corpus feed hits: writers upgrade mid-corpus, so shards on disk
    // span THREE schema generations (gen 1 original; gen 2 adds a
    // `quality` score; gen 3 adds an array `tags` column and DROPS
    // `lang`), and the reader must still see ONE table. The query
    // actually writes the three generations as parquet (c22's eager
    // prove-the-files precedent, same tmpdir convention) and reads them
    // back through `mergeSchema` + hive partition discovery; the census
    // — per-gen row counts, per-column null counts (absent columns MUST
    // surface as null, not error), exact fixed-point sums of the added
    // columns, and a 40-bit text checksum — pins that no row or value
    // was lost or misaligned by the merge. The ORACLE recomputes the
    // same census from the raw table by replaying the generation logic
    // with explicit NULLs (union-by-name semantics), so a mergeSchema
    // regression (column misalignment, silent drop, wrong null-fill)
    // hash-mismatches loudly.
    //
    // Scale shape: the generation writes are one corpus pass each over
    // a disjoint third; the merged read is ONE scan with partition
    // discovery (footer merging is metadata work, bounded by file
    // count); the census exchanges per-gen integer partials only.
    // quality is quarter-valued (exact in binary doubles) so its
    // fixed-point ×4 sum is engine-exact.
    "c23_schema_evolution" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val root = graft.core.ArtifactRoot.path(s, "c23_evo", d)
      docs.filter($"doc_id" % 3 === 0)
        .write.mode("overwrite").parquet(root + "/gen=1")
      docs.filter($"doc_id" % 3 === 1)
        .withColumn("quality", ($"doc_id" % 5).cast("double") / 4.0)
        .write.mode("overwrite").parquet(root + "/gen=2")
      docs.filter($"doc_id" % 3 === 2)
        .drop("lang")
        .withColumn("tags", array(
          concat(lit("src:"), $"source"),
          concat(lit("len:"), length($"text").cast("string"))))
        .write.mode("overwrite").parquet(root + "/gen=3")
      s.read.option("mergeSchema", "true").option("basePath", root)
        .parquet(root + "/gen=1", root + "/gen=2", root + "/gen=3")
        .groupBy($"gen".cast("int").as("gen"))
        .agg(count(lit(1)).as("n_docs"),
          count(when($"lang".isNull, 1)).as("null_lang"),
          count(when($"quality".isNull, 1)).as("null_quality"),
          count(when($"tags".isNull, 1)).as("null_tags"),
          coalesce(sum(($"quality" * 4).cast("long")), lit(0L))
            .as("sum_quality4"),
          coalesce(sum(size($"tags")), lit(0L)).cast("long").as("n_tags"),
          coalesce(sum(when($"tags".isNotNull,
            conv(substring(md5(concat_ws("|", $"tags").cast("binary")), 1, 10),
              16, 10).cast("long"))), lit(0L)).as("tags_checksum"),
          sum(conv(substring(md5($"text".cast("binary")), 1, 10), 16, 10)
            .cast("long")).as("text_checksum"))
        .orderBy($"gen")
    },

    // SCD TYPE-2 MERGE — the key-versioned upsert-history op completing
    // the lakehouse maintenance family (c21 maintains ADDITIVE rollups;
    // this maintains per-key VERSION HISTORY: every attribute change
    // opens a row, closes its predecessor). Events: each order is an
    // update to its customer's price tier (FLOOR(o_totalprice/50000));
    // consecutive equal tiers collapse; versions carry
    // [valid_from, valid_to) with the canonical far-future sentinel on
    // the current row. The QUERY runs the PRODUCTION path — build the
    // compacted base history from pre-1999 events, then MERGE the 1999+
    // increment into it by replaying only AFFECTED keys' version
    // boundaries + their new events (untouched keys' rows pass through
    // by anti-join, never re-derived) — while the ORACLE rebuilds from
    // the full event log in one pass: two independent derivations whose
    // row-for-row hash equality IS the merge-correctness proof
    // (associativity of change-collapse over the cutoff), q55's
    // two-derivations discipline.
    //
    // Scale shape: the increment exchanges by key once (its inherent
    // move); base history rows for UNTOUCHED keys move only through the
    // anti-join's key-hash (at 100 TB: bucket the history table by key
    // and broadcast the affected-key set — the anti-join and the semi-
    // join both co-locate, and with c21's partition-overwrite machinery
    // only partitions holding affected keys are rewritten). The replay
    // set is |affected keys' versions| + |increment| — increment-sized,
    // never history-sized. Window work is per-key sort of a few rows.
    "c24_scd2_merge" -> { (s, d) =>
      import s.implicits._
      val ev = tierEvents(s, d)
      val cutoff = lit("1999-01-01").cast("timestamp")
      val base = scd2Build(ev.filter($"ts" < cutoff))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      scd2Merge(base, ev.filter($"ts" >= cutoff))
        .select($"ck".as("c_custkey"), $"version", $"valid_from",
          $"valid_to", $"tier", $"is_current")
        .orderBy($"c_custkey", $"version")
    },

    // POINT-IN-TIME (temporal) DIMENSION JOIN — the canonical reason
    // SCD2 histories exist: every fact row joined to the dimension
    // VERSION that was valid when the fact happened. Facts = lineitems
    // at their ship date; dimension = c24's customer tier history;
    // match = LEFT equi-join on the key + the half-open range residual
    // `valid_from <= ts < valid_to`. Versions partition [first_event,
    // sentinel), so a fact matches AT MOST one version; facts timestamped
    // BEFORE the key's first version (the harness ship dates are
    // independent of order dates — ~half precede) land in the tier −1
    // PRE-HISTORY bucket rather than being dropped, so the census is
    // count-preserving — the spec proves Σ n_items == lineitem count
    // (no fan-out, no silent drop). Output: (tier-at-ship-time, ship
    // year) census with exact integer checksums over keys and versions.
    //
    // Scale shape: the join is an equi-join ON THE KEY (versions-per-key
    // is small and bounded by change frequency, so the residual filter
    // scans a handful of versions per fact) — at 100 TB co-partition
    // facts and history by key (bucketing) and the range residual costs
    // nothing extra; never express this as a pure interval cross —
    // q47's binned interval form is the documented fallback for
    // version-heavy keys. The census partials combine map-side; the
    // exchange carries (tier, year) groups only.
    "c25_scd2_pointintime" -> { (s, d) =>
      import s.implicits._
      val hist = scd2Build(tierEvents(s, d)).as("h")
      val facts = Tables.lineitem(s, d)
        .select($"l_orderkey", $"l_linenumber", $"l_shipdate".as("ts"))
        .join(Tables.orders(s, d)
          .select($"o_orderkey", $"o_custkey".as("fck")),
          $"l_orderkey" === $"o_orderkey")
        .as("f")
      facts.join(hist,
          $"fck" === $"h.ck" &&
            $"ts" >= $"h.valid_from" && $"ts" < $"h.valid_to", "left")
        .groupBy(coalesce($"h.tier", lit(-1)).as("tier"),
          year($"ts").as("yr"))
        .agg(count(lit(1)).as("n_items"),
          sum(coalesce($"h.version", lit(0))).cast("long")
            .as("version_checksum"),
          sum($"fck").cast("long").as("cust_checksum"),
          sum($"l_orderkey" * $"l_linenumber").cast("long").as("line_checksum"))
        .orderBy($"tier", $"yr")
    },

    // SEMANTIC decontamination — the embedding-space sibling of c03/c16's
    // lexical n-gram gates: a paraphrased or translated eval item shares
    // no 13-gram with its training leak, but its embedding sits next to
    // it (the Llama/GPT data-prep reports run exactly this second gate).
    // Eval vectors (vec_id % 100 == 0, the held-out benchmark stand-in)
    // are screened against the train corpus INSIDE their IVF cell only —
    // the d12/SemDeDup cell-bounded discipline, so the screen never goes
    // all-pairs — and the census is COUNT-PRESERVING over eval items: an
    // eval vector with zero in-cell train neighbors still reports its
    // row (n_train_cell = 0, sentinels), because a decontamination
    // report that silently drops unscreenable items is how leaks ship.
    // Output per eval item: its cell, the in-cell train population, the
    // count over the contamination threshold, and the nearest train
    // vector (similarity + id — the audit trail a leak investigation
    // starts from).
    //
    // Scale shape: rides the SAME memoized cell assignment the
    // s21/s28–s30 serving family materializes once per session
    // (`Similarity.knnAssigned` — at 100 TB this is the written IVF
    // layout, so decontamination is a read of an artifact that already
    // exists); the eval side is benchmark-sized and broadcast, the
    // in-cell join is corpus × (tiny eval) co-located by cell, and the
    // census partials are per-eval integers. The threshold (0.25 on
    // this synthetic corpus) is a parameter, not a claim.
    // SNAPSHOT DIFF — the data-versioning report every nightly corpus
    // build logs (Delta/DVC diff semantics over plain parquet): two
    // corpus versions compared by key via ONE full-outer join on
    // fingerprints, classifying every doc as added / removed / changed /
    // unchanged, with per-source counts and id-sum checksums per class
    // (the audit numbers a regression investigation starts from — "the
    // de table lost 412 docs" is actionable; a diff that only says
    // "something changed" is not). The two versions are derived
    // deterministically from the harness table (old = id % 11 ≠ 0,
    // new = id % 13 ≠ 0 with id % 7 == 0 docs edited), so both engines
    // replay identical snapshots — the operator under test is the diff,
    // not the versions.
    //
    // Scale shape: the join carries (id, source, 16-byte md5) — never
    // text — and both sides prune to key+fingerprint at the scan; the
    // census partials are (source, class) integers, map-side combined.
    // At 100 TB both snapshots are bucketed by doc_id and the diff
    // co-locates; this is c13's checksum idea applied across versions.
    "c27_snapshot_diff" -> { (s, d) =>
      import s.implicits._
      val docs = Tables.documents(s, d)
      val vOld = docs.filter($"doc_id" % 11 =!= 0)
        .select($"doc_id", $"source".as("src_old"),
          md5($"text".cast("binary")).as("h_old"))
      val vNew = docs.filter($"doc_id" % 13 =!= 0)
        .select($"doc_id", $"source".as("src_new"),
          when($"doc_id" % 7 === 0,
            md5(concat($"text", lit(" v2")).cast("binary")))
            .otherwise(md5($"text".cast("binary"))).as("h_new"))
      vOld.join(vNew, Seq("doc_id"), "full_outer")
        .select($"doc_id", coalesce($"src_new", $"src_old").as("source"),
          when($"h_old".isNull, lit("added"))
            .when($"h_new".isNull, lit("removed"))
            .when($"h_old" =!= $"h_new", lit("changed"))
            .otherwise(lit("unchanged")).as("cls"))
        .groupBy($"source")
        .agg(
          sum(when($"cls" === "added", 1L).otherwise(0L)).as("n_added"),
          sum(when($"cls" === "removed", 1L).otherwise(0L)).as("n_removed"),
          sum(when($"cls" === "changed", 1L).otherwise(0L)).as("n_changed"),
          sum(when($"cls" === "unchanged", 1L).otherwise(0L))
            .as("n_unchanged"),
          sum(when($"cls" === "added", $"doc_id").otherwise(0L))
            .cast("long").as("added_ids"),
          sum(when($"cls" === "removed", $"doc_id").otherwise(0L))
            .cast("long").as("removed_ids"),
          sum(when($"cls" === "changed", $"doc_id").otherwise(0L))
            .cast("long").as("changed_ids"))
        .orderBy($"source")
    },

    "c26_semantic_decontamination" -> { (s, d) =>
      import s.implicits._
      val assigned = Similarity.knnAssigned(s, d)
      val ev = assigned.filter($"vec_id" % 100 === 0)
        .select($"vec_id".as("eval_id"), $"v".as("ev"), $"nrm".as("enrm"),
          $"cell")
      val tr = assigned.filter($"vec_id" % 100 =!= 0)
        .select($"vec_id".as("train_id"), $"v".as("tv"), $"nrm".as("tnrm"),
          $"cell")
      semanticScreen(ev, tr)
    }
  )

  /** c26's screen on arbitrary pre-shaped frames — `ev` as
    * `(eval_id, ev, enrm, cell)`, `tr` as `(train_id, tv, tnrm, cell)` —
    * factored so the adversarial streaming-parity arms can drive it on
    * constructed layouts (e.g. an eval vector whose cell is EMPTY in
    * the corpus). Each eval vector compares only within its own IVF
    * cell (the SemDeDup discipline); the left join back to `ev`
    * guarantees a census row for EVERY eval vector — an eval landing in
    * an empty cell reports `n_train_cell = 0, max_cos = -1,
    * nearest_train_id = -1`, never silently vanishes (a vanished row
    * would read as "screened clean" when it was never screened at
    * all). */
  private[graft] def semanticScreen(ev: DataFrame, tr: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    val cos = Similarity.cosineWithNorms($"ev", $"tv", $"enrm", $"tnrm")
    val hits = tr.join(broadcast(ev), Seq("cell"))
      .select($"eval_id", $"cell", $"train_id", cos.as("cos"))
      .groupBy($"eval_id")
      .agg(count(lit(1)).as("n_train_cell"),
        sum(when($"cos" > 0.25, 1L).otherwise(0L)).as("n_contaminated"),
        round(max($"cos"), 6).as("max_cos"),
        max_by($"train_id", struct($"cos", (-$"train_id").as("tb")))
          .as("nearest_train_id"))
    ev.select($"eval_id", $"cell")
      .join(hits, Seq("eval_id"), "left")
      .select($"eval_id", $"cell",
        coalesce($"n_train_cell", lit(0L)).as("n_train_cell"),
        coalesce($"n_contaminated", lit(0L)).as("n_contaminated"),
        coalesce($"max_cos", lit(-1.0)).as("max_cos"),
        coalesce($"nearest_train_id", lit(-1L)).as("nearest_train_id"))
      .orderBy($"eval_id")
  }

  /** The order-as-CDC-event derivation shared by c24 (history build +
    * merge) and c25 (point-in-time join): each order updates its
    * customer's price tier. */
  private[graft] def tierEvents(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d).select(
      $"o_custkey".as("ck"), $"o_orderdate".as("ts"),
      $"o_orderkey".as("okey"),
      floor($"o_totalprice" / 50000).cast("int").as("tier"))
  }

  /** c24's SCD2 history builder over any `(ck, ts, okey, tier)` event
    * frame: keep change events (first per key, or tier ≠ previous tier
    * in (ts, okey) order), version them, and close each version with the
    * next change's timestamp — the canonical 2099-12-31 sentinel marks
    * the current row (a real NULL valid_to would also be invisible to
    * range predicates like `valid_from <= t AND t < valid_to`, which is
    * why production SCD2 tables use a sentinel too). okey0 (the change
    * row's event id) is retained so a MERGE can replay version
    * boundaries through this same builder with the original tie-break.
    * Both windows share one (ck, (ts, okey)) partitioning+sort — the
    * filter between them preserves order, so Catalyst plans ONE exchange
    * and one sort. Factored so CurationSpec drives it on hand-computed
    * fixtures. */
  /** c24's MERGE: apply new `(ck, ts, okey, tier)` events to an existing
    * history (scd2Build's schema). Affected keys' VERSION BOUNDARIES are
    * replayed through the builder together with their new events;
    * untouched keys pass through an anti-join untouched. Exact iff every
    * new event is at-or-after its key's last applied event (the CDC
    * in-order-per-key contract — Kafka's per-key ordering guarantee, and
    * c24's cutoff by construction): re-collapsing boundaries + in-order
    * appends equals a full-log rebuild because consecutive versions
    * differ by construction; a MID-history insert could need an absorbed
    * (non-boundary) event to resolve and is NOT supported — replay the
    * key from the raw log instead. Shared by the c24 batch query and the
    * streaming CDC-apply twin (per-micro-batch foreachBatch merge). */
  private[graft] def scd2Merge(base: DataFrame, inc: DataFrame): DataFrame = {
    val s = base.sparkSession
    import s.implicits._
    val affected = inc.select($"ck").distinct()
    val untouched = base.join(affected, Seq("ck"), "left_anti")
    val replay = base.join(affected, Seq("ck"), "leftsemi")
      .select($"ck", $"valid_from".as("ts"), $"okey0".as("okey"), $"tier")
      .unionByName(inc.select($"ck", $"ts", $"okey", $"tier"))
    untouched.unionByName(scd2Build(replay))
  }

  private[graft] def scd2Build(ev: DataFrame): DataFrame = {
    val s = ev.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"ck").orderBy($"ts", $"okey")
    ev.withColumn("prev", lag($"tier", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"tier")
      .withColumn("version", row_number().over(w).cast("int"))
      .withColumn("valid_to",
        coalesce(lead($"ts", 1).over(w), lit("2099-12-31").cast("timestamp")))
      .select($"ck", $"version", $"ts".as("valid_from"), $"okey".as("okey0"),
        $"tier", $"valid_to",
        ($"valid_to" === lit("2099-12-31").cast("timestamp")).as("is_current"))
  }

  val oracle: Map[String, String] = Map(
    // same md5 epoch keys; lead doc via rank over (k, doc_id)
    "c18_epoch_shuffle" ->
      raw"""WITH k AS (SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tk,
           |    ('0x' || substr(md5('c18:0:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k0,
           |    ('0x' || substr(md5('c18:1:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS k1
           |  FROM documents),
           |x AS (SELECT doc_id, tk, 0 AS epoch, k0 % 8 AS shard, k0 AS kk, false AS sticky FROM k
           |  UNION ALL
           |  SELECT doc_id, tk, 1 AS epoch, k1 % 8 AS shard, k1 AS kk,
           |    (k0 % 8 = k1 % 8) AS sticky FROM k),
           |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY epoch, shard
           |    ORDER BY kk, doc_id) AS rn FROM x)
           |SELECT CAST(epoch AS BIGINT) AS epoch, CAST(shard AS BIGINT) AS shard,
           |  COUNT(*) AS n_docs, CAST(SUM(tk) AS BIGINT) AS n_tokens,
           |  CAST(MIN(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS lead_doc,
           |  CAST(SUM(CASE WHEN sticky THEN 1 ELSE 0 END) AS BIGINT) AS n_sticky
           |FROM r GROUP BY epoch, shard ORDER BY epoch, shard""".stripMargin,

    "c09_corpus_build" -> {
      val hits = Seq("en", "de", "es", "fr").map(l =>
        s"CAST(len(list_filter(w, x -> x IN (${TextAnalysis.sqlList(TextAnalysis.Stop(l))}))) AS INTEGER) AS ${l}_hits")
        .mkString(",\n    ")
      raw"""WITH reps AS (SELECT md5(text) AS fp, min(doc_id) AS rep_id
           |  FROM documents GROUP BY md5(text)),
           |t AS (SELECT d.doc_id, d.source, d.lang, d.text,
           |    string_split_regex(trim(d.text), '[ \t\n\x0B\f\r]+') AS w
           |  FROM documents d JOIN reps r ON d.doc_id = r.rep_id),
           |c AS (SELECT doc_id, source, lang, text,
           |    CAST(len(w) AS INTEGER) AS n_tokens,
           |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INTEGER) AS punct_cnt,
           |    $hits
           |  FROM t),
           |g AS (SELECT doc_id, source, lang, text,
           |    (CAST(en_hits AS DOUBLE) / n_tokens) * 0.4
           |      + (1.0 - CAST(punct_cnt AS DOUBLE) / length(text)) * 0.3
           |      + least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.3 AS quality,
           |    CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
           |         WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
           |         WHEN es_hits >= fr_hits THEN 'es'
           |         ELSE 'fr' END AS predicted
           |  FROM c),
           |gd AS (SELECT doc_id, source, lang, quality, text FROM g
           |  WHERE quality >= 0.5 AND predicted = lang),
           |k2 AS (SELECT doc_id, source, lang, quality,
           |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ws
           |  FROM gd
           |  WHERE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) > 0),
           |ch AS (SELECT doc_id, source, lang, quality,
           |    unnest(list_transform(range(0, CAST(ceil(len(ws)/20.0) AS BIGINT)),
           |      i -> struct_pack(idx := i,
           |        ctext := array_to_string(list_slice(ws, (i*20 + 1)::INT, (i*20 + 20)::INT), ' ')))) AS c
           |  FROM k2),
           |ci AS (SELECT doc_id, source, lang, quality, CAST(c.idx AS INTEGER) AS idx,
           |    c.ctext AS ctext, md5(c.ctext) AS h FROM ch),
           |rn AS (SELECT doc_id, source, lang, quality, idx, ctext,
           |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM ci)
           |SELECT doc_id, source, lang, round(quality, 6) AS quality,
           |  COUNT(*) AS n_chunks,
           |  COUNT(*) FILTER (rn = 1) AS kept_chunks,
           |  coalesce(string_agg(ctext, ' ' ORDER BY idx) FILTER (rn = 1), '') AS cleaned_text
           |FROM rn GROUP BY doc_id, source, lang, quality
           |ORDER BY doc_id""".stripMargin
    },

    // d17's dedup verdicts (exact fp + LSH/sig-agreement near) gate the
    // increment, then c09's gate CTEs, then the span winners computed
    // over instances NOT present in the base chunk ledger
    "c11_incremental_build" -> {
      val hits = Seq("en", "de", "es", "fr").map(l =>
        s"CAST(len(list_filter(w, x -> x IN (${TextAnalysis.sqlList(TextAnalysis.Stop(l))}))) AS INTEGER) AS ${l}_hits")
        .mkString(",\n    ")
      val agree = (0 until 8).map(j =>
        s"(CASE WHEN x.s$j = y.s$j THEN 1 ELSE 0 END)").mkString(" + ")
      raw"""WITH ${Dedup.sqlMinhashCtes},
           |fp AS (SELECT doc_id, md5(text) AS fp FROM documents),
           |ex AS (SELECT n.doc_id FROM fp n JOIN fp o ON n.fp = o.fp
           |  WHERE n.doc_id % 10 = 7 AND o.doc_id % 10 <> 7 GROUP BY n.doc_id),
           |cio AS (SELECT DISTINCT a.doc_id AS nid, b.doc_id AS oid
           |  FROM bands a JOIN bands b ON a.band_idx = b.band_idx
           |    AND a.band_key = b.band_key
           |  WHERE a.doc_id % 10 = 7 AND b.doc_id % 10 <> 7),
           |nr AS (SELECT nid AS doc_id FROM cio
           |  JOIN sigs x ON nid = x.doc_id JOIN sigs y ON oid = y.doc_id
           |  WHERE ($agree) >= 4 GROUP BY nid),
           |keptids AS (SELECT d.doc_id FROM documents d
           |  LEFT JOIN ex ON d.doc_id = ex.doc_id
           |  LEFT JOIN nr ON d.doc_id = nr.doc_id
           |  WHERE d.doc_id % 10 = 7 AND ex.doc_id IS NULL AND nr.doc_id IS NULL),
           |t AS (SELECT d.doc_id, d.source, d.lang, d.text,
           |    string_split_regex(trim(d.text), '[ \t\n\x0B\f\r]+') AS w
           |  FROM documents d JOIN keptids k ON d.doc_id = k.doc_id),
           |gc AS (SELECT doc_id, source, lang, text,
           |    CAST(len(w) AS INTEGER) AS n_tokens,
           |    CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS INTEGER) AS punct_cnt,
           |    $hits
           |  FROM t),
           |g AS (SELECT doc_id, source, lang, text,
           |    (CAST(en_hits AS DOUBLE) / n_tokens) * 0.4
           |      + (1.0 - CAST(punct_cnt AS DOUBLE) / length(text)) * 0.3
           |      + least(1.0, CAST(n_tokens AS DOUBLE) / 100.0) * 0.3 AS quality,
           |    CASE WHEN en_hits >= de_hits AND en_hits >= es_hits AND en_hits >= fr_hits THEN 'en'
           |         WHEN de_hits >= es_hits AND de_hits >= fr_hits THEN 'de'
           |         WHEN es_hits >= fr_hits THEN 'es'
           |         ELSE 'fr' END AS predicted
           |  FROM gc),
           |gd AS (SELECT doc_id, source, lang, quality, text FROM g
           |  WHERE quality >= 0.5 AND predicted = lang),
           |k2 AS (SELECT doc_id, source, lang, quality,
           |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ws
           |  FROM gd
           |  WHERE len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) > 0),
           |ch AS (SELECT doc_id, source, lang, quality,
           |    unnest(list_transform(range(0, CAST(ceil(len(ws)/20.0) AS BIGINT)),
           |      i -> struct_pack(idx := i,
           |        ctext := array_to_string(list_slice(ws, (i*20 + 1)::INT, (i*20 + 20)::INT), ' ')))) AS c
           |  FROM k2),
           |ci AS (SELECT doc_id, source, lang, quality, CAST(c.idx AS INTEGER) AS idx,
           |    c.ctext AS ctext, md5(c.ctext) AS h FROM ch),
           |bw AS (SELECT string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS ws
           |  FROM documents WHERE doc_id % 10 <> 7),
           |bh AS (SELECT DISTINCT
           |    unnest(list_transform(range(0, CAST(ceil(len(ws)/20.0) AS BIGINT)),
           |      i -> md5(array_to_string(list_slice(ws, (i*20 + 1)::INT, (i*20 + 20)::INT), ' ')))) AS h
           |  FROM bw WHERE len(ws) > 0),
           |fi AS (SELECT ci.doc_id, ci.idx, ci.h FROM ci
           |  LEFT JOIN bh ON ci.h = bh.h WHERE bh.h IS NULL),
           |wnr AS (SELECT doc_id, idx,
           |    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, idx) AS rn FROM fi),
           |winners AS (SELECT doc_id, idx FROM wnr WHERE rn = 1)
           |SELECT ci.doc_id, ci.source, ci.lang, round(ci.quality, 6) AS quality,
           |  COUNT(*) AS n_chunks,
           |  COUNT(winners.idx) AS kept_chunks,
           |  coalesce(string_agg(ci.ctext, ' ' ORDER BY ci.idx)
           |    FILTER (winners.idx IS NOT NULL), '') AS cleaned_text
           |FROM ci LEFT JOIN winners
           |  ON ci.doc_id = winners.doc_id AND ci.idx = winners.idx
           |GROUP BY ci.doc_id, ci.source, ci.lang, ci.quality
           |ORDER BY ci.doc_id""".stripMargin
    },

    "c01_stratified_sample" ->
      s"""SELECT doc_id, lang FROM documents
         |WHERE (${sqlU28("doc_id")} / 268435456.0) <
         |  (CASE WHEN lang = 'en' THEN 0.25 ELSE 0.75 END)
         |ORDER BY doc_id""".stripMargin,

    "c07_weighted_sample" ->
      raw"""WITH t AS (SELECT doc_id, source,
           |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tk
           |  FROM documents),
           |k AS (SELECT *,
           |    (${sqlU28("doc_id", "c07")} / 268435456.0) < least(1.0, CAST(tk AS DOUBLE) / 100.0) AS kept
           |  FROM t)
           |SELECT source, COUNT(*) AS docs_seen,
           |  COUNT(*) FILTER (kept) AS docs_kept,
           |  CAST(COALESCE(SUM(tk) FILTER (kept), 0) AS BIGINT) AS toks_kept,
           |  round(CAST(SUM(least(tk, 100)) AS DOUBLE) / 100.0, 6) AS expected_docs
           |FROM k GROUP BY source ORDER BY source""".stripMargin,

    "c03_decontaminate" -> sqlDecontaminate(5),

    "c16_decontaminate_13g" -> sqlDecontaminate(13),

    "c08_contamination_report" -> sqlContamination(5),

    "c17_contamination_13g" -> sqlContamination(13),

    "c04_token_budget_mix" ->
      raw"""WITH toks AS (SELECT doc_id, source,
           |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tk
           |  FROM documents),
           |stats AS (SELECT source, CAST(SUM(tk) AS BIGINT) AS src_toks FROM toks GROUP BY source),
           |tot AS (SELECT CAST(SUM(src_toks) AS BIGINT) AS all_toks, COUNT(*) AS n_sources FROM stats),
           |rates AS (SELECT source AS rsrc,
           |    least(1.0, (CAST(all_toks AS DOUBLE) * 0.5 / n_sources) / CAST(src_toks AS DOUBLE)) AS rate
           |  FROM stats CROSS JOIN tot)
           |SELECT source, COUNT(*) AS docs_kept, CAST(SUM(tk) AS BIGINT) AS toks_kept,
           |  round(max(rate), 6) AS rate
           |FROM toks JOIN rates ON source = rsrc
           |WHERE (${sqlU28("doc_id", "mix")} / 268435456.0) < rate
           |GROUP BY source ORDER BY source""".stripMargin,

    "c12_fixed_sample" ->
      raw"""SELECT doc_id, source, lang, round(u, 6) AS u FROM (
           |  SELECT doc_id, source, lang,
           |    ${sqlU28("doc_id", "fix")} / 268435456.0 AS u
           |  FROM documents ORDER BY u, doc_id LIMIT 100)
           |ORDER BY doc_id""".stripMargin,

    "c10_temperature_mix" ->
      raw"""WITH toks AS (SELECT doc_id, source,
           |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tk
           |  FROM documents),
           |stats AS (SELECT source, CAST(SUM(tk) AS BIGINT) AS src_toks,
           |    CAST(round(sqrt(CAST(SUM(tk) AS DOUBLE)) * 1000000.0) AS BIGINT) AS wfx
           |  FROM toks GROUP BY source),
           |tot AS (SELECT CAST(SUM(src_toks) AS BIGINT) AS all_toks,
           |    CAST(SUM(wfx) AS BIGINT) AS swfx FROM stats),
           |rates AS (SELECT source AS rsrc, src_toks,
           |    least(1.0, CAST(all_toks AS DOUBLE) * 0.5 * CAST(wfx AS DOUBLE)
           |      / CAST(swfx AS DOUBLE) / CAST(src_toks AS DOUBLE)) AS rate
           |  FROM stats CROSS JOIN tot),
           |kept AS (SELECT source, COUNT(*) AS docs_kept,
           |    CAST(SUM(tk) AS BIGINT) AS toks_kept
           |  FROM toks JOIN rates ON source = rsrc
           |  WHERE (${sqlU28("doc_id", "temp")} / 268435456.0) < rate
           |  GROUP BY source)
           |SELECT r.rsrc AS source, r.src_toks, round(r.rate, 6) AS rate,
           |  COALESCE(k.docs_kept, 0) AS docs_kept,
           |  COALESCE(k.toks_kept, 0) AS toks_kept
           |FROM rates r LEFT JOIN kept k ON r.rsrc = k.source
           |ORDER BY source""".stripMargin,

    "c05_token_shards" ->
      raw"""WITH t AS (SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tk
           |  FROM documents),
           |c AS (SELECT doc_id, tk,
           |    SUM(tk) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk AS cum0
           |  FROM t)
           |SELECT CAST(cum0 // 2000 AS BIGINT) AS shard, COUNT(*) AS n_docs,
           |  CAST(SUM(tk) AS BIGINT) AS total_tokens,
           |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
           |FROM c GROUP BY 1 ORDER BY shard""".stripMargin,

    // the same concatenate-and-cut arithmetic over the naive global
    // window (value-identical to the two-level scan); every column is
    // exact integer math except the one rounded fill division
    "c14_sequence_pack" ->
      raw"""WITH t AS (SELECT doc_id,
           |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tk
           |  FROM documents),
           |c AS (SELECT doc_id, tk,
           |    CAST(SUM(tk) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk AS BIGINT) AS cum0
           |  FROM t),
           |spans AS (SELECT doc_id, tk, cum0,
           |    unnest(range(cum0 // 256, (cum0 + tk - 1) // 256 + 1)) AS seq_id
           |  FROM c WHERE tk > 0),
           |agg AS (SELECT seq_id, COUNT(*) AS n_docs,
           |    CAST(SUM(least((seq_id + 1) * 256, cum0 + tk) - greatest(seq_id * 256, cum0)) AS BIGINT) AS tokens,
           |    CAST(SUM(CASE WHEN cum0 + tk > (seq_id + 1) * 256 THEN 1 ELSE 0 END) AS BIGINT) AS n_cut,
           |    min(doc_id) AS first_doc, max(doc_id) AS last_doc
           |  FROM spans GROUP BY seq_id)
           |SELECT seq_id, n_docs, tokens, n_cut, first_doc, last_doc,
           |  round(CAST(tokens AS DOUBLE) / 256.0, 6) AS fill
           |FROM agg ORDER BY seq_id""".stripMargin,

    // two t15-shape LM CTE sets (target = en, raw = the pool itself);
    // every score is an integer bit-length sum, so ranking and the
    // top-100 cut are exact in both engines — only bits_gap rounds
    "c15_dsir_selection" ->
      raw"""WITH dv AS (SELECT doc_id, source, lang,
           |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS w
           |  FROM documents),
           |dvf AS (SELECT * FROM dv WHERE len(w) >= 2),
           |tgt AS (SELECT w FROM dvf WHERE lang = 'en'),
           |pool AS (SELECT doc_id, source, lang, w FROM dvf WHERE lang <> 'en'),
           |tbt AS (SELECT bg, COUNT(*) AS c12t FROM (
           |    SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg FROM tgt) GROUP BY bg),
           |tct AS (SELECT w1, COUNT(*) AS c1t FROM (
           |    SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1 FROM tgt) GROUP BY w1),
           |vvt AS (SELECT COUNT(DISTINCT wd) AS vt FROM (SELECT unnest(w) AS wd FROM tgt)),
           |tbr AS (SELECT bg, COUNT(*) AS c12r FROM (
           |    SELECT unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) AS bg FROM pool) GROUP BY bg),
           |tcr AS (SELECT w1, COUNT(*) AS c1r FROM (
           |    SELECT unnest(list_transform(range(1, len(w)), i -> w[i])) AS w1 FROM pool) GROUP BY w1),
           |vvr AS (SELECT COUNT(DISTINCT wd) AS vr FROM (SELECT unnest(w) AS wd FROM pool)),
           |db AS (SELECT doc_id, source, lang, unnest(list_transform(range(1, len(w)),
           |    i -> {'w1': w[i], 'bg': w[i] || ' ' || w[i+1]})) AS z FROM pool),
           |sc AS (SELECT doc_id, source, lang,
           |    CAST(length(bin(coalesce(c1t, 0) + vt)) - length(bin(coalesce(c12t, 0) + 1)) AS BIGINT) AS bt,
           |    CAST(length(bin(coalesce(c1r, 0) + vr)) - length(bin(coalesce(c12r, 0) + 1)) AS BIGINT) AS br
           |  FROM db LEFT JOIN tbt ON db.z.bg = tbt.bg LEFT JOIN tct ON db.z.w1 = tct.w1
           |    LEFT JOIN tbr ON db.z.bg = tbr.bg LEFT JOIN tcr ON db.z.w1 = tcr.w1
           |    CROSS JOIN vvt CROSS JOIN vvr),
           |agg AS (SELECT doc_id, source, lang, COUNT(*) AS n_bigrams,
           |    CAST(SUM(bt) AS BIGINT) AS nll_target, CAST(SUM(br) AS BIGINT) AS nll_raw
           |  FROM sc GROUP BY 1, 2, 3),
           |r AS (SELECT *, nll_raw - nll_target AS score_bits,
           |    CAST(ROW_NUMBER() OVER (ORDER BY nll_raw - nll_target DESC, doc_id) AS INTEGER) AS rank
           |  FROM agg)
           |SELECT rank, doc_id, source, lang, n_bigrams, nll_target, nll_raw, score_bits,
           |  round(CAST(score_bits AS DOUBLE) / n_bigrams, 6) AS bits_gap
           |FROM r WHERE rank <= 100 ORDER BY rank""".stripMargin,

    // one census from raw documents, expected identically under both
    // format labels — a match proves both round-trips byte-intact
    "c20_format_roundtrip" ->
      raw"""WITH c AS (SELECT source, COUNT(*) AS n_docs,
           |    CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           |    CAST(SUM(('0x' || substr(md5(doc_id::VARCHAR || ',' || text), 1, 10))::BIGINT) AS BIGINT) AS doc_checksum
           |  FROM documents GROUP BY source)
           |SELECT f.format, c.source, c.n_docs, c.id_sum, c.doc_checksum
           |FROM c CROSS JOIN (VALUES ('orc'), ('json_gz'), ('xml')) f(format)
           |ORDER BY format, source""".stripMargin,

    // same census as c05's oracle, computed directly from `documents` —
    // matching the Spark side's re-read census proves the files round-trip
    // full recompute from scratch — equality with the incrementally
    // maintained ledger IS the MV-maintenance invariant; the increment
    // definition (newest day + the prior day's event_id % 7 = 3 slice)
    // only shapes the census, never the rollup values
    "c21_rollup_maintenance" ->
      raw"""WITH ev AS (SELECT CAST(ts AS DATE) AS day, event_type, event_id, value
           |  FROM events),
           |mx AS (SELECT MAX(day) AS maxd FROM ev),
           |roll AS (SELECT day, event_type,
           |    COUNT(*) AS n_events,
           |    CAST(ROUND(SUM(CAST(value AS DECIMAL(14,2))), 2) AS DOUBLE) AS value_sum,
           |    round(MIN(value), 6) AS vmin, round(MAX(value), 6) AS vmax,
           |    CAST(SUM(('0x' || substr(md5(event_id::VARCHAR), 1, 10))::BIGINT)
           |      AS BIGINT) AS id_checksum
           |  FROM ev GROUP BY 1, 2),
           |census AS (SELECT
           |    CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
           |    CAST(COUNT(*) AS BIGINT) AS n_rollup_rows,
           |    CAST(2 AS BIGINT) AS n_days_touched,
           |    (SELECT CAST(COUNT(*) AS BIGINT) FROM ev CROSS JOIN mx
           |      WHERE day = maxd OR (day = maxd - 1 AND event_id % 7 = 3))
           |      AS n_increment_events
           |  FROM roll)
           |SELECT CAST(day AS TIMESTAMP) AS day, event_type, n_events, value_sum,
           |  vmin, vmax, id_checksum,
           |  n_days, n_rollup_rows, n_days_touched, n_increment_events
           |FROM roll CROSS JOIN census ORDER BY day, event_type""".stripMargin,

    "c13_shard_materialize" ->
      raw"""WITH t AS (SELECT doc_id, text,
           |    CAST(len(string_split_regex(trim(text), '[ \t\n\x0B\f\r]+')) AS BIGINT) AS tk
           |  FROM documents),
           |c AS (SELECT doc_id, text, tk,
           |    SUM(tk) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tk AS cum0
           |  FROM t)
           |SELECT CAST(cum0 // 2000 AS BIGINT) AS shard, COUNT(*) AS n_docs,
           |  CAST(SUM(tk) AS BIGINT) AS total_tokens,
           |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
           |  CAST(SUM(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT) AS text_checksum
           |FROM c GROUP BY 1 ORDER BY shard""".stripMargin,

    "c02_hash_split" ->
      s"""WITH t AS (SELECT doc_id, lang,
         |    ${sqlU28("doc_id")} / 268435456.0 AS u FROM documents)
         |SELECT lang,
         |  CASE WHEN u < 0.8 THEN 'train' WHEN u < 0.9 THEN 'val' ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM t GROUP BY 1, 2 ORDER BY lang, split""".stripMargin,

    "c06_curation_funnel" ->
      raw"""WITH t AS (SELECT doc_id, n_chars,
           |    string_split_regex(trim(text), '[ \t\n\x0B\f\r]+') AS w FROM documents),
           |g AS (SELECT n_chars, len(w) AS n_tok,
           |    CASE WHEN len(w) >= 2
           |         THEN 1.0 - CAST(len(list_distinct(list_transform(range(1, len(w)),
           |              i -> w[i] || ' ' || w[i+1]))) AS DOUBLE) / (len(w) - 1)
           |         ELSE 1.0 END AS dup2,
           |    ${sqlU28("doc_id", "gate")} / 268435456.0 AS u,
           |    CAST(len(w) AS BIGINT) AS tk
           |  FROM t),
           |f AS (SELECT *,
           |    (n_chars >= 100) AS g1,
           |    (n_chars >= 100 AND n_tok >= 40) AS g2,
           |    (n_chars >= 100 AND n_tok >= 40 AND dup2 <= 0.02) AS g3,
           |    (n_chars >= 100 AND n_tok >= 40 AND dup2 <= 0.02 AND u < 0.75) AS g4
           |  FROM g)
           |SELECT 0 AS stage, 'total' AS gate, COUNT(*) AS docs_kept,
           |  CAST(SUM(tk) AS BIGINT) AS toks_kept FROM f
           |UNION ALL SELECT 1, 'len>=100', COUNT(*) FILTER (g1), CAST(SUM(tk) FILTER (g1) AS BIGINT) FROM f
           |UNION ALL SELECT 2, '+tok>=40', COUNT(*) FILTER (g2), CAST(SUM(tk) FILTER (g2) AS BIGINT) FROM f
           |UNION ALL SELECT 3, '+dup2<=0.02', COUNT(*) FILTER (g3), CAST(SUM(tk) FILTER (g3) AS BIGINT) FROM f
           |UNION ALL SELECT 4, '+hash<0.75', COUNT(*) FILTER (g4), CAST(SUM(tk) FILTER (g4) AS BIGINT) FROM f
           |ORDER BY stage""".stripMargin,

    // replays BOTH layouts' censuses from the raw table with the same
    // shift arithmetic — equality proves the written z-files carry
    // exactly the right rows (the checksum is the file-roundtrip gate)
    "c22_zorder_layout" -> {
      val zed = graft.operators.ZOrder.sqlInterleave("x", "y")
      raw"""WITH li AS (SELECT l_orderkey, l_linenumber,
           |    CAST(l_partkey % 256 AS INTEGER) AS x,
           |    CAST(l_suppkey % 256 AS INTEGER) AS y
           |  FROM lineitem),
           |z AS (SELECT *, $zed AS z FROM li),
           |u AS (SELECT 'zorder' AS layout, CAST(z // 4096 AS INTEGER) AS cell,
           |        l_orderkey, l_linenumber, x, y FROM z
           |      UNION ALL
           |      SELECT 'linear', CAST(x // 16 AS INTEGER),
           |        l_orderkey, l_linenumber, x, y FROM li)
           |SELECT layout, cell, COUNT(*) AS n_rows,
           |  MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
           |  CAST((MAX(x) - MIN(x) + 1) AS BIGINT) * (MAX(y) - MIN(y) + 1) AS box_area,
           |  CAST(SUM(('0x' || substr(md5(concat_ws(',', l_orderkey, l_linenumber, x, y)), 1, 10))::BIGINT) AS BIGINT) AS row_checksum
           |FROM u GROUP BY layout, cell ORDER BY layout, cell""".stripMargin
    },

    // the oracle replays the three writer generations with explicit
    // NULLs — DuckDB's union-by-name view of what the merged read MUST
    // contain; any mergeSchema misalignment/drop/null-fill bug on the
    // Spark side hash-mismatches
    "c23_schema_evolution" ->
      raw"""WITH g1 AS (SELECT doc_id, text, lang,
           |    NULL::DOUBLE AS quality, NULL::VARCHAR[] AS tags, 1 AS gen
           |  FROM documents WHERE doc_id % 3 = 0),
           |g2 AS (SELECT doc_id, text, lang,
           |    CAST(doc_id % 5 AS DOUBLE) / 4.0 AS quality,
           |    NULL::VARCHAR[] AS tags, 2 AS gen
           |  FROM documents WHERE doc_id % 3 = 1),
           |g3 AS (SELECT doc_id, text, NULL::VARCHAR AS lang,
           |    NULL::DOUBLE AS quality,
           |    ['src:' || source, 'len:' || CAST(length(text) AS VARCHAR)] AS tags,
           |    3 AS gen
           |  FROM documents WHERE doc_id % 3 = 2),
           |u AS (SELECT * FROM g1 UNION ALL SELECT * FROM g2
           |  UNION ALL SELECT * FROM g3)
           |SELECT CAST(gen AS INTEGER) AS gen, COUNT(*) AS n_docs,
           |  COUNT(*) FILTER (lang IS NULL) AS null_lang,
           |  COUNT(*) FILTER (quality IS NULL) AS null_quality,
           |  COUNT(*) FILTER (tags IS NULL) AS null_tags,
           |  CAST(COALESCE(SUM(CAST(quality * 4 AS BIGINT)), 0) AS BIGINT) AS sum_quality4,
           |  CAST(COALESCE(SUM(len(tags)), 0) AS BIGINT) AS n_tags,
           |  CAST(COALESCE(SUM(CASE WHEN tags IS NOT NULL THEN
           |      ('0x' || substr(md5(array_to_string(tags, '|')), 1, 10))::BIGINT
           |    END), 0) AS BIGINT) AS tags_checksum,
           |  CAST(SUM(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT) AS text_checksum
           |FROM u GROUP BY gen ORDER BY gen""".stripMargin,

    // deliberately NOT the query's merge path: one-pass rebuild from the
    // full event log — the two derivations agreeing row-for-row is the
    // merge-correctness proof (q55's discipline)
    "c24_scd2_merge" ->
      raw"""WITH ev AS (SELECT o_custkey AS ck, o_orderdate AS ts,
           |    o_orderkey AS okey,
           |    CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS tier FROM orders),
           |ch AS (SELECT ck, ts, okey, tier,
           |    LAG(tier) OVER (PARTITION BY ck ORDER BY ts, okey) AS prev FROM ev),
           |chg AS (SELECT ck, ts, okey, tier FROM ch
           |  WHERE prev IS NULL OR prev <> tier),
           |v AS (SELECT ck, CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
           |    ts AS valid_from,
           |    COALESCE(LEAD(ts) OVER w, TIMESTAMP '2099-12-31') AS valid_to, tier
           |  FROM chg WINDOW w AS (PARTITION BY ck ORDER BY ts, okey))
           |SELECT ck AS c_custkey, version, valid_from, valid_to, tier,
           |  (valid_to = TIMESTAMP '2099-12-31') AS is_current
           |FROM v ORDER BY c_custkey, version""".stripMargin,

    "c25_scd2_pointintime" ->
      raw"""WITH ev AS (SELECT o_custkey AS ck, o_orderdate AS ts,
           |    o_orderkey AS okey,
           |    CAST(FLOOR(o_totalprice / 50000) AS INTEGER) AS tier FROM orders),
           |ch AS (SELECT ck, ts, okey, tier,
           |    LAG(tier) OVER (PARTITION BY ck ORDER BY ts, okey) AS prev FROM ev),
           |chg AS (SELECT ck, ts, okey, tier FROM ch
           |  WHERE prev IS NULL OR prev <> tier),
           |v AS (SELECT ck, CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
           |    ts AS valid_from,
           |    COALESCE(LEAD(ts) OVER w, TIMESTAMP '2099-12-31') AS valid_to, tier
           |  FROM chg WINDOW w AS (PARTITION BY ck ORDER BY ts, okey)),
           |f AS (SELECT l.l_orderkey, l.l_linenumber, l.l_shipdate AS ts,
           |    o.o_custkey AS ck
           |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
           |m AS (SELECT COALESCE(v.tier, -1) AS tier, year(f.ts) AS yr,
           |    f.ck, COALESCE(v.version, 0) AS version,
           |    f.l_orderkey, f.l_linenumber
           |  FROM f LEFT JOIN v ON f.ck = v.ck
           |    AND f.ts >= v.valid_from AND f.ts < v.valid_to)
           |SELECT tier, CAST(yr AS INTEGER) AS yr, COUNT(*) AS n_items,
           |  CAST(SUM(version) AS BIGINT) AS version_checksum,
           |  CAST(SUM(ck) AS BIGINT) AS cust_checksum,
           |  CAST(SUM(l_orderkey * l_linenumber) AS BIGINT) AS line_checksum
           |FROM m GROUP BY tier, yr ORDER BY tier, yr""".stripMargin,

    // identical snapshot derivations, identical md5 classification; the
    // FULL OUTER join's null arms map to added/removed exactly as in
    // the query
    "c27_snapshot_diff" ->
      raw"""WITH vold AS (SELECT doc_id, source AS src_old, md5(text) AS h_old
           |  FROM documents WHERE doc_id % 11 <> 0),
           |vnew AS (SELECT doc_id, source AS src_new,
           |    CASE WHEN doc_id % 7 = 0 THEN md5(text || ' v2')
           |         ELSE md5(text) END AS h_new
           |  FROM documents WHERE doc_id % 13 <> 0),
           |j AS (SELECT COALESCE(vnew.doc_id, vold.doc_id) AS doc_id,
           |    COALESCE(src_new, src_old) AS source,
           |    CASE WHEN h_old IS NULL THEN 'added'
           |         WHEN h_new IS NULL THEN 'removed'
           |         WHEN h_old <> h_new THEN 'changed'
           |         ELSE 'unchanged' END AS cls
           |  FROM vold FULL OUTER JOIN vnew ON vold.doc_id = vnew.doc_id)
           |SELECT source,
           |  CAST(SUM(CASE WHEN cls = 'added' THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
           |  CAST(SUM(CASE WHEN cls = 'removed' THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
           |  CAST(SUM(CASE WHEN cls = 'changed' THEN 1 ELSE 0 END) AS BIGINT) AS n_changed,
           |  CAST(SUM(CASE WHEN cls = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT) AS n_unchanged,
           |  CAST(SUM(CASE WHEN cls = 'added' THEN doc_id ELSE 0 END) AS BIGINT) AS added_ids,
           |  CAST(SUM(CASE WHEN cls = 'removed' THEN doc_id ELSE 0 END) AS BIGINT) AS removed_ids,
           |  CAST(SUM(CASE WHEN cls = 'changed' THEN doc_id ELSE 0 END) AS BIGINT) AS changed_ids
           |FROM j GROUP BY source ORDER BY source""".stripMargin,

    // d12's cell assignment replayed exactly (argmax cosine over the 8
    // seed centroids, tie to the lower id), then the eval×train in-cell
    // screen; identical in-order dot products keep every cosine double
    // bit-equal, so the 0.25 threshold and the (cos DESC, id) ranking
    // agree cross-engine; the LEFT join keeps zero-neighbor eval rows
    "c26_semantic_decontamination" ->
      raw"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
           |cents AS (SELECT vec_id AS cent_id, v AS cv FROM e WHERE vec_id < 8),
           |ac AS (SELECT vec_id, v, cent_id, ${Similarity.sqlCosine("v", "cv")} AS ccos
           |  FROM e CROSS JOIN cents),
           |assigned AS (SELECT vec_id, v, cent_id AS cell FROM (
           |  SELECT vec_id, v, cent_id, ccos,
           |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY ccos DESC, cent_id) AS crn
           |  FROM ac) t WHERE crn = 1),
           |ev AS (SELECT vec_id AS eval_id, v, cell FROM assigned WHERE vec_id % 100 = 0),
           |tr AS (SELECT vec_id AS train_id, v, cell FROM assigned WHERE vec_id % 100 <> 0),
           |pairs AS (SELECT a.eval_id, a.cell, b.train_id,
           |    ${Similarity.sqlCosine("a.v", "b.v")} AS cos
           |  FROM ev a JOIN tr b ON a.cell = b.cell),
           |rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY eval_id
           |    ORDER BY cos DESC, train_id) AS rn FROM pairs),
           |per AS (SELECT eval_id, CAST(COUNT(*) AS BIGINT) AS n_train_cell,
           |    CAST(SUM(CASE WHEN cos > 0.25 THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           |    round(MAX(cos), 6) AS max_cos,
           |    CAST(MAX(CASE WHEN rn = 1 THEN train_id END) AS BIGINT) AS nearest_train_id
           |  FROM rk GROUP BY eval_id)
           |SELECT e2.eval_id, CAST(e2.cell AS BIGINT) AS cell,
           |  COALESCE(n_train_cell, 0) AS n_train_cell,
           |  COALESCE(n_contaminated, 0) AS n_contaminated,
           |  COALESCE(max_cos, -1.0) AS max_cos,
           |  COALESCE(nearest_train_id, -1) AS nearest_train_id
           |FROM ev e2 LEFT JOIN per ON e2.eval_id = per.eval_id
           |ORDER BY e2.eval_id""".stripMargin
  )
}
