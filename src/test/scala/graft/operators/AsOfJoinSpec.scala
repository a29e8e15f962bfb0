package graft.operators

import graft.SparkSuite

class AsOfJoinSpec extends SparkSuite {

  private def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")

  test("each event gets the latest price at-or-before its time") {
    import spark.implicits._
    val trades = Seq(
      (1L, "AAA", t("10:00:00")),
      (2L, "AAA", t("10:05:00")),
      (3L, "BBB", t("10:02:00")),
      (4L, "CCC", t("10:01:00"))).toDF("trade_id", "sym", "ts")
    val prices = Seq(
      ("AAA", t("09:59:00"), 10.0),
      ("AAA", t("10:03:00"), 11.0),
      ("AAA", t("10:30:00"), 15.0),   // in the future for all trades
      ("BBB", t("09:00:00"), 7.0)).toDF("psym", "pts", "price")

    val joined = AsOfJoin.asOf(trades, prices,
      leftId = trades("trade_id"),
      key = (trades("sym"), prices("psym")),
      time = (trades("ts"), prices("pts")))
      .select("trade_id", "price")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap

    assert(joined(1L).contains(10.0))   // 09:59 quote
    assert(joined(2L).contains(11.0))   // 10:03 quote supersedes
    assert(joined(3L).contains(7.0))    // older quote still valid
    assert(joined(4L).isEmpty)          // CCC has no quote → null survives
  }

  test("equal-timestamp ties break deterministically (highest tie-break wins)") {
    import spark.implicits._
    val ev = Seq((1L, "K", t("12:00:00"))).toDF("id", "k", "ts")
    // two right rows with identical key + timestamp
    val dim = Seq(
      ("K", t("11:00:00"), "alpha", 1L),
      ("K", t("11:00:00"), "beta", 2L)).toDF("dk", "dts", "v", "rid")
    // explicit tie-break: highest rid wins, on every run
    (1 to 5).foreach { _ =>
      val got = AsOfJoin.asOf(ev, dim, ev("id"),
        (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
        rightTieBreak = Seq(dim("rid")))
        .select("v").head().getString(0)
      assert(got == "beta")
    }
    // default tie-break (all right columns, name-ordered, desc): rid 2 wins
    val gotDefault = AsOfJoin.asOf(ev, dim, ev("id"),
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")))
      .select("v").head().getString(0)
    assert(gotDefault == "beta")
  }

  test("asOfSorted agrees with asOf on the harness attribution workload") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    val ev = graft.core.Tables.events(spark, "/root/testdata/sf0.001")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("purchase_id"), $"user_id", $"ts")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id".as("click_id"), $"user_id".as("c_user"), $"ts".as("click_ts"))
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.select($"purchase_id", $"click_id").orderBy($"purchase_id")
        .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    for (tol <- Seq(None, Some(expr("INTERVAL 7 DAYS")), Some(expr("INTERVAL 1 HOUR")))) {
      val a = run(AsOfJoin.asOf(purchases, clicks, purchases("purchase_id"),
        (purchases("user_id"), clicks("c_user")), (purchases("ts"), clicks("click_ts")),
        tolerance = tol, rightTieBreak = Seq(clicks("click_id"))))
      val b = run(AsOfJoin.asOfSorted(purchases, clicks,
        (purchases("user_id"), clicks("c_user")), (purchases("ts"), clicks("click_ts")),
        tolerance = tol, rightTieBreak = Seq(clicks("click_id"))))
      assert(a == b, s"tol=$tol: fan-out and sweep implementations must agree")
      assert(a.nonEmpty)
    }
  }

  test("asOfSorted handles no-match, ties, and exact-time matches") {
    import spark.implicits._
    val ev = Seq((1L, "K", t("12:00:00")), (2L, "Z", t("12:00:00"))).toDF("id", "k", "ts")
    val dim = Seq(
      ("K", t("11:00:00"), "alpha", 1L),
      ("K", t("11:00:00"), "beta", 2L),     // tie on (key, time)
      ("K", t("12:00:00"), "exact", 3L))    // exact-time match: rt <= lt includes it
      .toDF("dk", "dts", "v", "rid")
    val got = AsOfJoin.asOfSorted(ev, dim,
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      rightTieBreak = Seq(dim("rid")))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).contains("exact"), "rt == lt must match (inclusive)")
    assert(got(2L).isEmpty, "key with no right rows keeps nulls")
    // drop the exact row: the tie resolves to the higher rid
    val tied = AsOfJoin.asOfSorted(ev, dim.filter(dim("rid") =!= 3L),
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      rightTieBreak = Seq(dim("rid")))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(tied(1L).contains("beta"))
  }

  test("asOfSorted picks whole rows: a null in the matched row stays null") {
    import spark.implicits._
    // latest match has price=null — per-column sweeping would backfill
    // 5.0 from the older row, fabricating a row that never existed
    val ev = Seq((1L, "K", t("12:00:00"))).toDF("id", "k", "ts")
    val dim = Seq(
      ("K", t("10:00:00"), Some(5.0), None: Option[String]),
      ("K", t("11:00:00"), None: Option[Double], Some("y")))
      .toDF("dk", "dts", "price", "note")
    val got = AsOfJoin.asOfSorted(ev, dim,
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      rightTieBreak = Seq(dim("dts")))
      .select("price", "note").head()
    assert(got.isNullAt(0), "matched row's own null must survive")
    assert(got.getString(1) == "y")
    // same shape through asOf agrees
    val viaAsOf = AsOfJoin.asOf(ev, dim, ev("id"),
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      rightTieBreak = Seq(dim("dts")))
      .select("price", "note").head()
    assert(viaAsOf.isNullAt(0) && viaAsOf.getString(1) == "y")
  }

  test("asOfSorted: null join keys and null times never match (SQL semantics)") {
    import spark.implicits._
    val ev = Seq((1L, Option.empty[String], Option(t("12:00:00"))),
      (2L, Option("K"), Option.empty[java.sql.Timestamp]))
      .toDF("id", "k", "ts")
    val dim = Seq(
      (Option.empty[String], Option(t("11:00:00")), "nullkey"),
      (Option("K"), Option.empty[java.sql.Timestamp], "nullts"),
      (Option("K"), Option(t("11:00:00")), "real"))
      .toDF("dk", "dts", "v")
    val got = AsOfJoin.asOfSorted(ev, dim,
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      rightTieBreak = Seq(dim("v")))
      .select("id", "v").collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got(1L).isEmpty, "null left key matches nothing, row survives")
    assert(got(2L).isEmpty, "null left time matches nothing, row survives")
  }

  test("asOfSorted accepts computed tie-break expressions like asOf") {
    import spark.implicits._
    val ev = Seq((1L, "K", t("12:00:00"))).toDF("id", "k", "ts")
    val dim = Seq(
      ("K", t("11:00:00"), "alpha", 1L),
      ("K", t("11:00:00"), "beta", 2L)).toDF("dk", "dts", "v", "rid")
    // negated rid: LOWEST rid should win now, in both implementations
    val a = AsOfJoin.asOf(ev, dim, ev("id"),
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      rightTieBreak = Seq(dim("rid") * -1)).select("v").head().getString(0)
    val b = AsOfJoin.asOfSorted(ev, dim,
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      rightTieBreak = Seq(dim("rid") * -1)).select("v").head().getString(0)
    assert(a == "alpha" && b == "alpha")
  }

  test("randomized equivalence: asOf == asOfSorted over adversarial data") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(20260812L)
    def maybe[A](a: => A): Option[A] = if (rnd.nextInt(10) == 0) None else Some(a)
    for (round <- 1 to 6) {
      val nL = 30 + rnd.nextInt(40)
      val nR = 30 + rnd.nextInt(40)
      // small key/time domains force collisions, ties, and empty keys;
      // 10% nulls everywhere
      val left = (1 to nL).map { i =>
        (i.toLong, maybe(s"k${rnd.nextInt(5)}"), maybe(t(f"10:${rnd.nextInt(50)}%02d:00")))
      }.toDF("lid", "lk", "lt")
      val right = (1 to nR).map { i =>
        (i.toLong, maybe(s"k${rnd.nextInt(5)}"), maybe(t(f"10:${rnd.nextInt(50)}%02d:00")),
          maybe(rnd.nextInt(100)))
      }.toDF("rid", "rk", "rt", "rv")
      val tol = rnd.nextInt(3) match {
        case 0 => None
        case 1 => Some(expr("INTERVAL 10 MINUTES"))
        case _ => Some(expr("INTERVAL 25 MINUTES"))
      }
      def norm(df: org.apache.spark.sql.DataFrame) = df
        .select("lid", "rid", "rt", "rv")
        .collect().map(_.toSeq).sortBy(_.toString).toSeq
      val a = norm(AsOfJoin.asOf(left, right, left("lid"),
        (left("lk"), right("rk")), (left("lt"), right("rt")),
        tolerance = tol, rightTieBreak = Seq(right("rid"))))
      val b = norm(AsOfJoin.asOfSorted(left, right,
        (left("lk"), right("rk")), (left("lt"), right("rt")),
        tolerance = tol, rightTieBreak = Seq(right("rid"))))
      assert(a == b, s"round $round (nL=$nL nR=$nR tol=$tol) diverged")
    }
  }

  test("tolerance bounds how stale the matched row may be") {
    import spark.implicits._
    val ev = Seq((1L, "K", t("12:00:00"))).toDF("id", "k", "ts")
    val dim = Seq(("K", t("09:00:00"), "old")).toDF("dk", "dts", "v")
    val within = AsOfJoin.asOf(ev, dim, ev("id"),
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL 5 HOURS")))
      .select("v").collect()
    assert(within.head.getString(0) == "old")
    val tooOld = AsOfJoin.asOf(ev, dim, ev("id"),
      (ev("k"), dim("dk")), (ev("ts"), dim("dts")),
      tolerance = Some(org.apache.spark.sql.functions.expr("INTERVAL 1 HOUR")))
      .select("v").collect()
    assert(tooOld.head.isNullAt(0), "match outside tolerance is dropped")
  }
}
