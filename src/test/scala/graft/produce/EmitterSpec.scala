package graft.produce

import graft.SparkSuite
import graft.core.EngineConfig

/** Produce-path semantics, mirroring the reference's producer suite
  * (src/producer/__tests__/index.test.ts): byte-exact envelope incl. field
  * order, createdAt format, appName resolution chain, HOSTNAME trim,
  * fan-out, validation errors, capture accessors. */
class EmitterSpec extends SparkSuite {

  private val clock = fixedClock("2022-12-08T00:00:00Z")

  private def testingEmitter(cfg: EngineConfig = EngineConfig(appName = Some("my-app"))) =
    new Emitter(cfg.copy(onlyTesting = true), clock)

  test("envelope JSON is byte-exact: payload fields, then createdAt, appName, code") {
    import spark.implicits._
    val em = testingEmitter()
    val df = Seq(("John", "Doe")).toDF("firstName", "lastName")
    em.emit(df, "my-topic", Some("event-name-a"))
    val got = em.getEmittedEvents
    assert(got.size == 1 && got.head.topic == "my-topic")
    assert(got.head.values == Seq(
      """{"firstName":"John","lastName":"Doe","createdAt":"2022-12-08 00:00:00Z","appName":"my-app","code":"EventNameA"}"""))
  }

  test("code falls back to UpperCamelCase(topic) when eventName absent") {
    import spark.implicits._
    val em = testingEmitter()
    em.emit(Seq(Tuple1("x")).toDF("p"), "some-topic")
    assert(em.getParsedEmittedEvents.head._2("code") == "SomeTopic")
  }

  test("user-supplied createdAt passes through unchanged") {
    import spark.implicits._
    val em = testingEmitter()
    val df = Seq(("a", "1999-01-01 00:00:00Z")).toDF("p", "createdAt")
    em.emit(df, "t")
    assert(em.getParsedEmittedEvents.head._2("createdAt") == "1999-01-01 00:00:00Z")
  }

  test("appName resolution chain: message > config.appName > groupId > hostname > unknown") {
    val base = EngineConfig()
    assert(base.copy(appName = Some("app")).resolveAppName(Some("msg")) == "msg")
    assert(base.copy(appName = Some("app"), groupId = Some("g")).resolveAppName() == "app")
    assert(base.copy(groupId = Some("g")).resolveAppName() == "g")
    assert(base.resolveAppName(hostnameEnv = Some("my-service-name-abcd-1234"))
      == "my-service-name")
    assert(base.resolveAppName(hostnameEnv = None) == "unknown")
  }

  test("HOSTNAME trim: drop last two dash-segments iff more than two segments") {
    assert(EngineConfig.parseHostname("my-service-name-abcd-1234") == "my-service-name")
    assert(EngineConfig.parseHostname("svc-abcd-1234") == "svc")
    assert(EngineConfig.parseHostname("ab-cd") == "ab-cd")     // exactly 2: keep
    assert(EngineConfig.parseHostname("plainhost") == "plainhost")
    // seeded property sweep
    val rnd = new scala.util.Random(7)
    (1 to 100).foreach { _ =>
      val n = 1 + rnd.nextInt(6)
      val segs = (1 to n).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(4)).mkString)
      val h = segs.mkString("-")
      val want = if (n > 2) segs.dropRight(2).mkString("-") else h
      assert(EngineConfig.parseHostname(h) == want, s"hostname $h")
    }
  }

  test("fan-out: array payload becomes one message per element") {
    import spark.implicits._
    val em = testingEmitter()
    val df = Seq(Tuple1(Seq((1L, "a"), (2L, "b")))).toDF("data")
      .selectExpr("transform(data, x -> named_struct('id', x._1, 'name', x._2)) AS data")
    val flat = em.fanOut(df)
    assert(flat.columns.toSeq == Seq("id", "name"))
    em.emit(flat, "t", Some("e"))
    val vals = em.getEmittedEvents.head.values
    assert(vals.size == 2)
    assert(vals.head.startsWith("""{"id":1,"name":"a","createdAt":"""))
  }

  test("validation: reserved code column, blank eventName, blank topic, empty docs") {
    import spark.implicits._
    val em = testingEmitter()
    val ok = Seq(Tuple1("x")).toDF("p")
    intercept[IllegalArgumentException] {
      em.emit(Seq(("x", "y")).toDF("p", "code"), "t")
    }
    intercept[IllegalArgumentException] { em.emit(ok, "t", Some("  ")) }
    intercept[IllegalArgumentException] { em.emit(ok, "   ") }
    intercept[IllegalArgumentException] { em.emitJson("t", Seq.empty) }
    intercept[IllegalArgumentException] { em.emitJson("t", Seq("""{"code":1}""")) }
    intercept[IllegalArgumentException] { em.emitJson("t", Seq("""[1,2]""")) }
  }

  test("getParsedEmittedEvents: reverse-compat flag replicates the reference quirk") {
    val cfgOn = EngineConfig(appName = Some("a"), parsedEventsReverseCompat = true)
    val emOn = testingEmitter(cfgOn)
    emOn.emitJson("t", Seq("""{"i":1}""", """{"i":2}"""))
    assert(emOn.getParsedEmittedEvents.map(_._2("i")) == Seq(2L, 1L))
    val emOff = testingEmitter()
    emOff.emitJson("t", Seq("""{"i":1}""", """{"i":2}"""))
    assert(emOff.getParsedEmittedEvents.map(_._2("i")) == Seq(1L, 2L))
  }

  test("clearEmittedEvents resets capture") {
    val em = testingEmitter()
    em.emitJson("t", Seq("""{"a":1}"""))
    assert(em.getEmittedEvents.nonEmpty)
    em.clearEmittedEvents()
    assert(em.getEmittedEvents.isEmpty)
  }

  test("emitJson preserves payload key order and appends meta") {
    val em = testingEmitter()
    em.emitJson("t", Seq("""{"z":1,"a":2}"""), Some("my-event"))
    assert(em.getEmittedEvents.head.values.head ==
      """{"z":1,"a":2,"createdAt":"2022-12-08 00:00:00Z","appName":"my-app","code":"MyEvent"}""")
  }

  test("dataflow emit and driver emitJson produce identical envelopes") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    (1 to 20).foreach { _ =>
      val em = testingEmitter()
      val name = "n" + rnd.alphanumeric.take(4).mkString
      val strVal = rnd.alphanumeric.take(6).mkString
      val num = rnd.nextInt(1000)
      val eventName = if (rnd.nextBoolean()) Some("some-event_x") else None
      // dataflow path: DataFrame -> enrich -> capture
      em.emit(Seq((strVal, num)).toDF(name, "num"), "t", eventName)
      // driver path: JSON doc -> emitJson -> capture
      em.emitJson("t", Seq(s"""{"$name":"$strVal","num":$num}"""), eventName)
      val Seq(a, b) = em.getEmittedEvents.map(_.values.head)
      assert(a == b, s"dataflow vs driver envelope for ($name, $strVal, $num, $eventName)")
    }
  }

  test("GraftConfig singleton shim: set/get/throw-before-set parity") {
    import graft.core.GraftConfig
    GraftConfig.reset()
    intercept[IllegalStateException] { GraftConfig.getConfig }
    GraftConfig.setConfig(EngineConfig(appName = Some("x")))
    assert(GraftConfig.getConfig.appName.contains("x"))
    GraftConfig.reset()
    assert(!GraftConfig.isSet)
  }
}
