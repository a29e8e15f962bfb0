package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // 1-minute load average sampled BEFORE this JVM ramps up: residual
    // machine load inflates bench numbers ~1.5x (see CLAUDE.md), so the
    // artifact must carry the evidence needed to judge its own validity
    val loadAvg =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.split("\\s+")(0).toDouble
      catch { case _: Throwable => -1.0 }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warmup: pay scheduler/codegen/IO init before the first timed
    // query instead of inside it; touch every input table so no timed query
    // pays first-footer/metadata reads (events via Tables for its NANOS cast)
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
        "region", "documents", "embeddings").foreach { t =>
      // best-effort: a missing table must not abort the whole bench —
      // queries over it will individually report -1 below
      try spark.read.parquet(s"$sfDir/$t.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    try graft.core.Tables.events(spark, sfDir).limit(1).count()
    catch { case _: Throwable => () }
    // warm the heavyweight exec paths (window, shuffle agg, broadcast join)
    // so their one-time codegen/exchange init doesn't land on whichever
    // query happens to run first
    {
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val t = spark.range(10000).select(col("id"), pmod(col("id"), lit(7)).as("k"))
      t.withColumn("rn", row_number().over(Window.partitionBy(col("k")).orderBy(col("id"))))
        .groupBy(col("k")).agg(sum(col("rn")))
        .join(broadcast(t.limit(5).withColumnRenamed("k", "k2")), col("k") === col("k2"))
        .count()
    }
    // default action is count() — comparable with every prior round's
    // recorded bench. SPARK_GRAFT_SINK=noop instead writes to the noop
    // sink, which keeps each query's final sort and output-only
    // projections in the measured plan (count() lets Catalyst drop them)
    // — the honest absolute total, at the cost of round comparability.
    val noop = sys.env.get("SPARK_GRAFT_SINK").contains("noop")
    // sorted name order: deterministic execution order keeps per-query
    // numbers comparable across rounds (Map order shifts as keys are added)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      // a failed query records -1, NOT its time-to-failure: a breakage
      // must stand out in the JSON, never read as a speedup
      val ok =
        try {
          val df = fn(spark, sfDir)
          if (noop) df.write.format("noop").mode("overwrite").save() else df.count()
          true
        } catch { case _: Throwable => false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // per-query seconds rounded to 1 ms: full-precision doubles made the
    // line ~4.5 KB and the driver's 4 KB tail capture truncated it every
    // round ("parsed": null in BENCH_r01..r04) — 3 dp keeps it ~2.4 KB
    def r3(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    // a breakage must never read as a speedup: "failed" is explicit, and the
    // headline total is -1 whenever any query failed
    val total = if (failed > 0) -1.0 else results.map(_._2).sum
    val json = s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$failed,"load_avg":$loadAvg,"queries":$qs,"sf":"$sfDir"}"""
    // durable full copy: the printed line competes with sbt noise for the
    // driver's tail capture; the file never does
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/bench.json")
    try {
      val w = new java.io.PrintWriter(outPath); try w.println(json) finally w.close()
    } catch { case _: Throwable => () }
    spark.stop()
    // printed after spark.stop(), so shutdown logging can't land between
    // the JSON and end-of-output and eat the tail budget
    println(json)
    // The driver's tail capture keeps only the END of output and has
    // truncated the ~2.4 KB full line's head in every round so far
    // ("parsed": null in BENCH_r01..r06). A second, ~100-byte summary —
    // headline fields only, no per-query map — printed LAST survives any
    // tail budget; the durable file above still carries the full detail.
    // "tainted" marks a pre-run 1-min load average high enough (> 1.5 on
    // this 32-cpu box) that residual load inflates the total ~1.5x, so
    // polluted driver snapshots are machine-detectable.
    val tainted = loadAvg > 1.5
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","failed":$failed,"load_avg":$loadAvg,"tainted":$tainted,"sf":"$sfDir"}""")
  }
}
