package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Semantics per /root/reference/src/helpers/index.ts:8-10:
  * `charAt(0).toUpperCase() + slice(1).replace(/[-_ ]./g, x =>
  * x[1].toUpperCase())` — char 0 kept (even a delimiter), then
  * non-overlapping delimiter+char pairs collapse to the upper-cased
  * follower; lone/trailing delimiters and delimiter+line-terminator pairs
  * pass through. */
class ToUpperCamelCaseSpec extends SparkSuite {

  /** Independent test oracle: literal transliteration of the reference's
    * regex replace (Java Matcher = JS global replace, left-to-right
    * non-overlapping; `[^\n\r\\u2028\\u2029]` is what JS's dotall-less `.`
    * matches). */
  private def oracle(s: String): String = {
    if (s.isEmpty) return s
    val up = (x: String) => x.toUpperCase(java.util.Locale.ROOT)
    val m = java.util.regex.Pattern
      .compile("[-_ ][^\n\r\\u2028\\u2029]")
      .matcher(s.substring(1))
    val sb = new StringBuffer
    while (m.find()) m.appendReplacement(sb,
      java.util.regex.Matcher.quoteReplacement(up(m.group.substring(1))))
    m.appendTail(sb)
    up(s.substring(0, 1)) + sb.toString
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
      // reference regex edge cases: pairs consume left-to-right from
      // index 1; unpaired delimiters survive; char 0 always kept
      "--x" -> "-X",
      "a--b" -> "A-b",
      "-ab" -> "-ab",
      "a-" -> "A-",
      "__x" -> "_X",
      "a- -b" -> "A B",
      "a-\nb" -> "A-\nb",             // JS `.` does not match \n
      "ß-ß" -> "SSSS")      // JS toUpperCase expands sharp-s
    cases.foreach { case (in, want) => assert(run(in) == want, s"input '$in'") }
  }

  test("generated code actually compiles (no silent interpreted fallback)") {
    // With fallback disabled a Janino resolution failure (e.g. calling a
    // companion method the case class shadows, so no static forwarder
    // exists) becomes a hard error instead of a quiet 10x slowdown.
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val got = (1 to 64).map(i => s"ev-${i}_x").toDF("v")
        .filter(GraftFunctions.upper_camel($"v").startsWith("Ev"))
        .select(GraftFunctions.upper_camel($"v").as("c"))
        .collect()
      assert(got.length == 64)
      val sh = Seq(Seq("a", "b"), Seq("c")).toDF("t")
        .select(SimHash64($"t").as("h")).collect()
      assert(sh.map(_.getLong(0)).distinct.length == 2)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
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
