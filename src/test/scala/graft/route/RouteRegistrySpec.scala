package graft.route

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSuite
import graft.core.{EngineConfig, ErrorPolicy, EventSchemaRegistry}
import graft.produce.Emitter
import graft.testkit.TestHarness

/** Routing semantics, mirroring the reference's consumer suite and the
  * README golden I/O table (README.md:287-345). */
class RouteRegistrySpec extends SparkSuite {

  /** Build the README's six routes; returns (harness, firedLog). A route
    * "fires" when its branch contains rows — message-level parity with the
    * reference's per-message handler invocation. */
  private def goldenHarness(): (TestHarness, mutable.Buffer[Int]) = {
    val h = new TestHarness(spark, EngineConfig(groupId = Some("g")))
    val fired = mutable.Buffer.empty[Int]
    def handler(id: Int): (DataFrame, Emitter) => Unit =
      (df, _) => { val n = df.count(); (1L to n).foreach(_ => fired += id) }
    h.consumer
      .add("topic-a", handler(1))
      .add("topic-b", "event-name-b", handler(2))
      .add("topic-c", Seq("event-name-c-1", "event-name-c-2"), handler(3))
      .add(Seq("topic-d", "topic-e"), handler(4))
      .add(Seq("topic-e", "topic-f"), "my-event-name", handler(5))
      .add(Seq("topic-g", "topic-h"), Seq("my-event-name-1", "my-event-name-2"), handler(6))
    (h, fired)
  }

  test("golden routing table from the reference README") {
    val (h, fired) = goldenHarness()
    // (topic, raw code or null) -> expected handler ids
    val table: Seq[(String, Option[String], Set[Int])] = Seq(
      ("topic-a", None, Set(1)),
      ("topic-a", Some("TopicA"), Set(1)),
      ("topic-a", Some("MyEventName"), Set(1)),
      ("topic-b", Some("EventNameA"), Set()),
      ("topic-b", Some("EventNameB"), Set(2)),
      ("topic-b", Some("TopicB"), Set()),
      ("topic-c", Some("EventNameC1"), Set(3)),
      ("topic-c", Some("EventNameC2"), Set(3)),
      ("topic-c", Some("EventNameC3"), Set()),
      ("topic-d", None, Set(4)),
      ("topic-d", Some("TopicD"), Set(4)),
      ("topic-e", None, Set(4)),
      ("topic-e", Some("TopicE"), Set(4)),
      ("topic-e", Some("MyEventName"), Set(4, 5)),
      ("topic-f", None, Set()),
      ("topic-f", Some("TopicF"), Set()),
      ("topic-f", Some("MyEventName"), Set(5)),
      ("topic-g", None, Set()),
      ("topic-g", Some("MyEventName1"), Set(6)),
      ("topic-g", Some("MyEventName2"), Set(6)),
      ("topic-h", Some("MyEventName1"), Set(6)),
      ("topic-h", Some("MyEventName2"), Set(6)))
    table.foreach { case (topic, code, want) =>
      fired.clear()
      code match {
        case Some(c) => h.inputRaw(topic, s"""{"code":"$c"}""")
        case None => h.inputRaw(topic, """{"prop":"a"}""")
      }
      assert(fired.toSet == want, s"input ($topic, ${code.getOrElse("<none>")})")
    }
  }

  test("overload expansion: cross-product yields the expected route rows") {
    val h = new TestHarness(spark)
    val noop: (DataFrame, Emitter) => Unit = (_, _) => ()
    h.consumer
      .add("t1", noop)                                      // 1
      .add("t2", "e1", noop)                                // 1
      .add("t3", Seq("e1", "e2", "e3"), noop)               // 3
      .add(Seq("t4", "t5"), noop)                           // 2
      .add(Seq("t6", "t7"), "e1", noop)                     // 2
      .add(Seq("t8", "t9"), Seq("e1", "e2"), noop)          // 4
      .add(Route("t10", Some("e9"), noop))                  // 1
    assert(h.consumer.routeCount == 14)
    assert(h.consumer.topics == Seq("t1", "t2", "t3", "t4", "t5", "t6", "t7", "t8", "t9", "t10"))
  }

  test("event names are UpperCamelCase-normalized at registration") {
    val (h, fired) = goldenHarness()
    // registered as 'event-name-b' but matches code 'EventNameB' — already
    // covered above; also verify the raw form does NOT match
    fired.clear()
    h.inputRaw("topic-b", """{"code":"event-name-b"}""")
    assert(fired.isEmpty)
  }

  test("malformed JSON and null values are skipped, not fatal") {
    val (h, fired) = goldenHarness()
    fired.clear()
    h.inputRaw("topic-a", "invalid JSON")
    h.inputRaw("topic-a", null)
    assert(fired.isEmpty)
  }

  test("input() computes code from eventName ?? topic like the reference") {
    val (h, fired) = goldenHarness()
    fired.clear()
    h.input("topic-b", """{"prop":"a"}""", Some("event-name-b"))
    assert(fired.toSet == Set(2))
    fired.clear()
    h.input("topic-e", """{"prop":"a"}""", Some("my-event-name"))
    assert(fired.toSet == Set(4, 5))
  }

  test("handler receives parsed payload columns via the schema registry") {
    val schemas = new EventSchemaRegistry()
      .register("UserSignup", StructType(Seq(
        StructField("userId", LongType), StructField("name", StringType))))
    val h = new TestHarness(spark, EngineConfig(), schemas = schemas)
    var seen: Seq[(Long, String)] = Nil
    h.consumer.add("users", "user-signup", (df, _) => {
      seen = df.select("userId", "name").collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    })
    h.input("users", """{"userId": 7, "name": "ada"}""", Some("user-signup"))
    assert(seen == Seq((7L, "ada")))
  }

  test("consume-transform-produce: handler re-emits through the emitter (O14)") {
    val h = new TestHarness(spark, EngineConfig(appName = Some("pipeline")),
      clock = fixedClock("2022-12-08T00:00:00Z"))
    h.consumer.add("in-topic", "ev", (df, emit) => {
      if (!df.isEmpty) {
        val out = df.selectExpr("upper(code) AS shout")
        emit.emit(out, "out-topic", Some("shouted"))
      }
    })
    graft.functions.GraftFunctions.register(spark)
    h.input("in-topic", """{"x":1}""", Some("ev"))
    val got = h.emitter.getParsedEmittedEvents
    assert(got.size == 1)
    assert(got.head._1 == "out-topic")
    assert(got.head._2("shout") == "EV")
    assert(got.head._2("code") == "Shouted")
  }

  test("error policy: LogAndContinue swallows handler errors, FailFast rethrows") {
    val h = new TestHarness(spark, EngineConfig(errorPolicy = ErrorPolicy.LogAndContinue))
    var after = false
    h.consumer.add("t", (_, _) => throw new RuntimeException("boom"))
    h.consumer.add("t", (_, _) => { after = true })
    h.inputRaw("t", """{"a":1}""")
    assert(after, "second handler still ran")

    val hf = new TestHarness(spark, EngineConfig(errorPolicy = ErrorPolicy.FailFast))
    hf.consumer.add("t", (_, _) => throw new RuntimeException("boom"))
    intercept[RuntimeException] { hf.inputRaw("t", """{"a":1}""") }
  }

  test("start validation: routes and groupId required") {
    import spark.implicits._
    val em = new Emitter(EngineConfig())
    val r = new RouteRegistry(EngineConfig(), em)
    val dummy = Seq(("t", "{}")).toDF("topic", "value")
    intercept[IllegalArgumentException] {
      r.start(dummy)  // no routes
    }
    r.add("t", (_: DataFrame, _: Emitter) => ())
    intercept[IllegalArgumentException] {
      r.start(dummy)  // no groupId, not onlyTesting
    }
  }

  test("DLQ extension: malformed values are emitted raw to the dead-letter topic") {
    val h = new TestHarness(spark, EngineConfig(dlqTopic = Some("dlq")))
    var good = 0L
    h.consumer.add("t", (df, _) => { good += df.count() })
    h.inputRaw("t", """{"a":1}""")
    h.inputRaw("t", "garbage {{{")
    assert(good == 1)
    val dlq = h.emitter.getEmittedEvents.filter(_.topic == "dlq")
    assert(dlq.flatMap(_.values) == Seq("garbage {{{"))
  }

  test("DLQ extension: tombstones (null values) and empty values reach the DLQ") {
    val h = new TestHarness(spark, EngineConfig(dlqTopic = Some("dlq")))
    var good = 0L
    h.consumer.add("t", (df, _) => { good += df.count() })
    h.inputRaw("t", null)          // Kafka tombstone
    h.inputRaw("t", "")            // empty value: from_json yields null struct
    h.inputRaw("t", """{"a":1}""")
    assert(good == 1, "unparseable values must not reach handlers")
    val dlq = h.emitter.getEmittedEvents.filter(_.topic == "dlq").flatMap(_.values)
    assert(dlq.size == 2, s"tombstone + empty value both DLQ'd, got $dlq")
    assert(dlq.contains(null) && dlq.contains(""),
      "tombstone replays as a null-valued record, empty value as-is")
  }

  test("schema-conflict messages still route by code (two-tier parse fallback)") {
    // code A registers k as Long; a message for code B carries k as a string.
    // The merged-schema parse rejects it, but the minimal-envelope fallback
    // must still route it — the reference parses each message independently.
    val schemas = new EventSchemaRegistry()
      .register("A", StructType(Seq(StructField("k", LongType))))
    val h = new TestHarness(spark, EngineConfig(dlqTopic = Some("dlq")), schemas = schemas)
    var bFired = 0L
    var aSawK: Option[Long] = None
    h.consumer.add("t", "b", (df, _) => { bFired += df.count() })
    h.consumer.add("t", "a", (df, _) => {
      val rows = df.select("k").collect()
      if (rows.nonEmpty) aSawK = Some(rows.head.getLong(0))
    })
    h.inputRaw("t", """{"k":"not-a-number","code":"B"}""")
    h.inputRaw("t", """{"k":7,"code":"A"}""")
    assert(bFired == 1, "type-conflicting message must still reach its route")
    assert(aSawK.contains(7L), "well-typed message keeps its parsed payload")
    assert(h.emitter.getEmittedEvents.forall(_.topic != "dlq"),
      "schema conflicts are not DLQ material - only unparseable JSON is")
  }
}
