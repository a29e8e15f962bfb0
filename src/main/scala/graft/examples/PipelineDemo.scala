package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** The full training-data curation pipeline, composed end-to-end from the
  * engine's operators — the 100 TB shape in one runnable job:
  *
  *   documents → exact dedup → MinHash+LSH near-dup drop → quality filter
  *   → benchmark decontamination → stratified sampling → train/val/test
  *   split → tokenize/fingerprint → curated parquet
  *
  * `sbt "runMain graft.examples.PipelineDemo [sfDir] [outDir]"`.
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.drop(1).headOption.getOrElse("/tmp/graft-curated")
    val spark = SparkSession.builder().master("local[8]")
      .appName("graft-pipeline-demo")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val docs = graft.core.Tables.documents(spark, sfDir)
    val total = docs.count()

    // 1. exact dedup: keep the representative doc per distinct text
    val reps = SparkEntry.queries("d01_dedup_exact")(spark, sfDir)
      .select($"rep_id".as("doc_id"))
    val exact = docs.join(reps, "doc_id")

    // 2. near-dup drop: cluster the verified pairs into connected
    //    components and keep only each component's representative —
    //    transitively consistent (A~B, B~C keeps exactly one of {A,B,C}
    //    even when A!~C, which per-pair dropping can't guarantee)
    val nearDupLosers = SparkEntry.queries("d09_dedup_clusters")(spark, sfDir)
      .filter($"doc_id" =!= $"cluster_rep").select($"doc_id")
    val deduped = exact.join(nearDupLosers, Seq("doc_id"), "left_anti")

    // 3. quality floor
    val quality = SparkEntry.queries("t02_text_quality")(spark, sfDir)
      .select($"doc_id", $"quality")
    val curated = deduped.join(quality, "doc_id").filter($"quality" >= 0.5)

    // 4. benchmark decontamination: the eval subset itself (doc_id % 10
    //    = 0) must never reach the training output, and neither may any
    //    train doc sharing a 5-gram with it
    val contaminated = SparkEntry.queries("c03_decontaminate")(spark, sfDir)
      .select($"train_id".as("doc_id"))
    val clean = curated
      .filter(!graft.ext.Curation.isEvalDoc($"doc_id"))
      .join(contaminated, Seq("doc_id"), "left_anti")

    // 5. stratified downsampling (tame the dominant language), then the
    //    deterministic train/val/test assignment — SALTED, because the
    //    sampling stage already consumed the unsalted hash (survivors all
    //    have u < 0.75, which an unsalted 0.8/0.9 split would map 100%
    //    to 'train')
    val sampled = clean.join(
      SparkEntry.queries("c01_stratified_sample")(spark, sfDir).select($"doc_id"),
      "doc_id")
    val withSplit = sampled.withColumn("split",
      graft.ext.Curation.splitCol($"doc_id", salt = "split"))

    // 6. enrich with token stats + fingerprints, write curated set
    val stats = SparkEntry.queries("t01_text_stats")(spark, sfDir)
      .select($"doc_id", $"n_tokens", $"n_subtokens")
    val fps = SparkEntry.queries("t04_doc_fingerprint")(spark, sfDir)
      .select($"doc_id", $"fp")
    val out = withSplit.join(stats, "doc_id").join(fps, "doc_id")
      .select($"doc_id", $"lang", $"source", $"split", $"quality",
        $"n_tokens", $"n_subtokens", $"fp", $"text")
    out.write.mode("overwrite").partitionBy("split").parquet(outDir)

    val outDf = spark.read.parquet(outDir)
    val kept = outDf.count()
    val bySplit = outDf.groupBy("split").count().collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").sorted.mkString(", ")
    println(f"[pipeline] $total%d docs -> $kept%d curated " +
      f"(${100.0 * kept / total}%.1f%% kept; $bySplit) at $outDir")
    spark.stop()
  }
}
