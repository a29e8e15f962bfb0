package graft.route

import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.core.{EngineConfig, EventSchemaRegistry}
import graft.testkit.TestHarness

/** Hostile-input robustness: unicode, nesting, big values, odd-but-legal
  * JSON — the shapes a 100 TB event firehose actually contains. */
class EdgeCaseSpec extends SparkSuite {

  test("unicode payloads and codes route and round-trip intact") {
    val h = new TestHarness(spark, EngineConfig(appName = Some("u")))
    var seen: Option[String] = None
    val schemas = h.schemas.register("Emoji",
      StructType(Seq(StructField("msg", StringType))))
    h.consumer.add("t", "emoji", (df, _) => {
      val r = df.select("msg").collect()
      if (r.nonEmpty) seen = Some(r.head.getString(0))
    })
    h.input("t", """{"msg":"héllo 世界 🚀 \"quoted\""}""", Some("emoji"))
    assert(seen.contains("héllo 世界 🚀 \"quoted\""))
  }

  test("deeply nested registered schema parses through the router") {
    val nested = StructType(Seq(
      StructField("user", StructType(Seq(
        StructField("id", LongType),
        StructField("tags", ArrayType(StringType)),
        StructField("geo", StructType(Seq(
          StructField("lat", DoubleType), StructField("lon", DoubleType)))))))))
    val schemas = new EventSchemaRegistry().register("Deep", nested)
    val h = new TestHarness(spark, EngineConfig(), schemas = schemas)
    var lat: Option[Double] = None
    h.consumer.add("t", "deep", (df, _) => {
      val r = df.select("user.geo.lat").collect()
      if (r.nonEmpty) lat = Some(r.head.getDouble(0))
    })
    h.input("t",
      """{"user":{"id":9,"tags":["a","b"],"geo":{"lat":12.5,"lon":-7.25}}}""",
      Some("deep"))
    assert(lat.contains(12.5))
  }

  test("large payload values survive the envelope round trip") {
    val big = "x" * 200000
    val h = new TestHarness(spark, EngineConfig(appName = Some("big")))
    h.emitter.emitJson("t", Seq(s"""{"blob":"$big"}"""))
    val parsed = h.emitter.getParsedEmittedEvents.head._2
    assert(parsed("blob").asInstanceOf[String].length == 200000)
  }

  test("odd-but-legal JSON: null fields, empty object, numeric strings") {
    val h = new TestHarness(spark, EngineConfig(groupId = Some("g")))
    var global = 0L
    h.consumer.add("t", (df, _) => { global += df.count() })
    h.input("t", """{}""")                          // empty payload object
    h.input("t", """{"a":null}""")                  // explicit null
    h.input("t", """{"n":"00123"}""")               // numeric-looking string
    assert(global == 3)
  }

  test("JSON scalars and arrays (valid JSON, not objects) do not crash routing") {
    val (gBefore, h) = {
      val h = new TestHarness(spark, EngineConfig(dlqTopic = Some("dlq")))
      (0L, h)
    }
    var global = gBefore
    h.consumer.add("t", (df, _) => { global += df.count() })
    h.inputRaw("t", "42")
    h.inputRaw("t", "[1,2,3]")
    h.inputRaw("t", "\"just a string\"")
    // non-object JSON cannot carry an envelope; it must not fire handlers
    // and must not kill the stream (DLQ'd for inspection)
    assert(global == 0)
    assert(h.emitter.getEmittedEvents.count(_.topic == "dlq") > 0)
  }

  test("null values (Kafka tombstones) and empty values reach the DLQ, not handlers") {
    val h = new TestHarness(spark, EngineConfig(dlqTopic = Some("dlq")))
    var global = 0L
    h.consumer.add("t", (df, _) => { global += df.count() })
    h.inputRaw("t", null)   // tombstone
    h.inputRaw("t", "")     // empty value
    h.inputRaw("t", "   ")  // whitespace-only value
    assert(global == 0)
    // the DLQ contract: every unparseable value is emitted for replay —
    // including tombstones, which must not be silently skipped
    assert(h.emitter.getEmittedEvents.count(_.topic == "dlq") == 3)
  }
}
