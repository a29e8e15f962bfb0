package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantics per /root/reference/src/helpers/index.ts:8-10: uppercase the
  * first char, uppercase after each of `- _ ` (delimiter dropped), leave
  * everything else untouched. */
class ToUpperCamelCaseSpec extends SparkSuite {

  /** Independent test oracle: literal re-statement of the reference rule. */
  private def oracle(s: String): String = {
    val out = new StringBuilder
    var up = true
    s.foreach {
      case c if c == '-' || c == '_' || c == ' ' => up = true
      case c if up => out += c.toUpper; up = false
      case c => out += c
    }
    out.toString
  }

  private def run(s: String): String = {
    import spark.implicits._
    Seq(s).toDF("v").select(GraftFunctions.upper_camel($"v")).head().getString(0)
  }

  test("golden cases from the reference docs and tests") {
    val cases = Map(
      "event-name-b" -> "EventNameB",
      "my-event-name" -> "MyEventName",
      "topic-a" -> "TopicA",
      "some_event name-x" -> "SomeEventNameX",
      "EventNameA" -> "EventNameA",   // already camel: unchanged
      "purchase" -> "Purchase",
      "ALL_CAPS" -> "ALLCAPS",        // non-first chars NOT lowercased
      "" -> "",
      "a" -> "A",
      "--x" -> "X")
    cases.foreach { case (in, want) => assert(run(in) == want, s"input '$in'") }
  }

  test("null propagates") {
    import spark.implicits._
    val got = Seq[Option[String]](None).toDF("v")
      .select(GraftFunctions.upper_camel($"v")).head()
    assert(got.isNullAt(0))
  }

  test("SQL registration works") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT upper_camel('my-event-name') AS c").head().getString(0)
      == "MyEventName")
  }

  test("codegen and interpreted paths agree with the oracle (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ09-_ -_ \u00e9\u20ac\u4e2d"
    val samples = (1 to 300).map { _ =>
      val n = rnd.nextInt(12)
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val got = samples.toDF("v")
      .select(GraftFunctions.upper_camel($"v").as("c")).collect().map(_.getString(0))
    (samples zip got).foreach { case (in, g) => assert(g == oracle(in), s"input '$in'") }
    // vectorized batch through one plan (exercises wholestage codegen)
    val inputs = (1 to 100).map(i => s"ev-${i}_name $i").toDF("v")
    val got2 = inputs.select(GraftFunctions.upper_camel($"v").as("c")).collect().map(_.getString(0))
    val want = (1 to 100).map(i => oracle(s"ev-${i}_name $i"))
    assert(got2.toSeq == want)
  }
}
