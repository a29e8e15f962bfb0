package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.core.EngineConfig
import graft.testkit.TestHarness

/** Source coverage (SURVEY.md §2.2 "Scans/sources"): file formats normalize
  * to the router envelope shape and flow through the same route plan. */
class SourcesSpec extends SparkSuite {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("json batch file source routes through the same plan") {
    import spark.implicits._
    val dir = tmp("graft-json")
    Seq("""{"code":"Click","n":1}""", """{"code":"View","n":2}""")
      .toDF("value").write.mode("overwrite").text(dir)
    val env = EventSource.batchFiles(spark, "text", dir, "clicks", valueCol = Some("value"))
    val h = new TestHarness(spark, EngineConfig())
    var clicks = 0L
    h.consumer.add("clicks", "click", (df, _) => { clicks += df.count() })
    h.consumer.process(env)
    assert(clicks == 1)
  }

  test("csv batch source with schema round-trips to envelopes") {
    import spark.implicits._
    val dir = tmp("graft-csv")
    Seq((1L, "click", 9.5), (2L, "view", 1.0)).toDF("event_id", "event_type", "value")
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val env = EventSource.batchFiles(spark, "csv", s"$dir", "ev",
      schema = Some(schema))
      .where("value IS NOT NULL")  // header row guard when schema given
    // full-row JSON serialization path (valueCol = None)
    val vals = env.select("value").collect().map(_.getString(0)).sorted
    assert(vals.exists(_.contains(""""event_type":"click"""")))
    assert(env.columns.toSeq == Seq("topic", "value"))
  }

  test("parquet sink + batch parquet source round-trip") {
    import spark.implicits._
    val dir = tmp("graft-parquet") + "/out"
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    df.write.mode("overwrite").parquet(dir)
    val back = EventSource.batchFiles(spark, "parquet", dir, "t")
    assert(back.count() == 2)
    assert(spark.read.parquet(dir).orderBy("id").collect().map(_.getString(1)).toSeq
      == Seq("a", "b"))
  }

  test("orc sink + batch orc source round-trip (columnar alternative)") {
    import spark.implicits._
    val dir = tmp("graft-orc") + "/out"
    val df = Seq((1L, """{"k":1}"""), (2L, """{"k":2}""")).toDF("id", "value")
    df.write.mode("overwrite").orc(dir)
    val env = EventSource.batchFiles(spark, "orc", dir, "t", valueCol = Some("value"))
    assert(env.columns.toSeq == Seq("topic", "value"))
    assert(env.count() == 2)
    assert(spark.read.orc(dir).count() == 2)
  }

  test("streaming file source tails a directory into the router") {
    import spark.implicits._
    val dir = tmp("graft-stream-src")
    val schema = StructType(Seq(StructField("value", StringType)))
    Seq("""{"code":"Click","n":1}""").toDF("value").write.mode("append").text(dir)
    val env = EventSource.streamFiles(spark, "text", dir, "clicks", schema,
      valueCol = Some("value"))
    val h = new TestHarness(spark, EngineConfig(groupId = Some("g")))
    val seen = new java.util.concurrent.atomic.AtomicLong
    h.consumer.add("clicks", "click", (df, _) => { seen.addAndGet(df.count()); () })
    val q = h.consumer.start(env,
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    q.awaitTermination(60000)
    assert(seen.get() == 1)
  }
}
