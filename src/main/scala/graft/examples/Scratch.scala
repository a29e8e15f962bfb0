package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = "/root/testdata/sf0.1"
    val tr = """transform(sequence(1, size(w) - 2),
      |  i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))""".stripMargin
    def base = graft.core.Tables.documents(spark, d)
      .withColumn("w", split(trim($"text"), graft.core.Tok.Ws))
      .filter(size($"w") >= 3)
    def timeIt(label: String)(f: => Long): Unit = {
      (0 until 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = f
        println(f"$label rep$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    timeIt("inline-explode") {
      base.select($"doc_id", explode(array_distinct(expr(tr))).as("s")).count()
    }
    timeIt("split-explode") {
      base.select($"doc_id", $"source", array_distinct(expr(tr)).as("sarr"))
        .select($"doc_id", explode($"sarr").as("s")).count()
    }
    timeIt("cnt-groupBy") {
      base.select($"doc_id", explode(array_distinct(expr(tr))).as("s"))
        .groupBy($"doc_id").agg(count(lit(1))).count()
    }
    timeIt("cnt-inline-size") {
      base.select($"doc_id", size(array_distinct(expr(tr))).cast("long").as("n")).count()
    }
    spark.stop()
  }
}
