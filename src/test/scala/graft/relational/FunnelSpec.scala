package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.SparkEntry

/** q45's ordering semantics on planted sequences — the oracle proves
  * cross-engine agreement, this proves the INTENT: a stage only counts
  * when it happens strictly after the previous stage's first-qualifying
  * event. */
class FunnelSpec extends SparkSuite {

  test("q45: stage ordering on planted sequences") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    def t(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    // user 1: view(1) -> click(2) -> purchase(3)          full funnel
    // user 2: click(1) -> view(2)                         viewed, click too early
    // user 3: view(1) -> purchase(2)                      viewed, no click
    // user 4: signup(1)                                   never viewed
    // user 5: view(1) -> purchase(2) -> click(3)          click qualifies
    //         (after view), but the only purchase precedes it -> stage 2
    val rows = Seq(
      (1L, t(1), 1L, "view"), (2L, t(2), 1L, "click"), (3L, t(3), 1L, "purchase"),
      (4L, t(1), 2L, "click"), (5L, t(2), 2L, "view"),
      (6L, t(1), 3L, "view"), (7L, t(2), 3L, "purchase"),
      (8L, t(1), 4L, "signup"),
      (9L, t(1), 5L, "view"), (10L, t(2), 5L, "purchase"), (11L, t(3), 5L, "click"))
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q45_funnel_conversion")(spark, dir).collect().head
    assert(r.getLong(0) == 5L, s"n_users: $r")
    assert(r.getLong(1) == 4L, s"viewed (users 1,2,3,5): $r")
    assert(r.getLong(2) == 2L, s"clicked_after_view (users 1, 5): $r")
    assert(r.getLong(3) == 1L, s"purchased_after_click (user 1 only): $r")
    // user 1's view->purchase span: 2 minutes in microseconds
    assert(r.getLong(6) == 2L * 60 * 1000000, s"total span: $r")
  }

  test("q44: cohort lattice invariants on real events") {
    val sf = "/root/testdata/sf0.01"
    // NTZ timestamps collect as LocalDateTime — keep the key generic
    val rows = SparkEntry.queries("q44_cohort_retention")(spark, sf).collect()
      .map(r => (r.get(0), r.getInt(1), r.getLong(2)))
    // every cohort member is active in their own first week, so offset 0
    // is the cohort size and no later offset can exceed it
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val size0 = rs.find(_._2 == 0)
        .getOrElse(fail(s"cohort $c has no offset-0 row"))._3
      rs.foreach { case (_, off, n) =>
        assert(n <= size0, s"cohort $c offset $off: $n > cohort size $size0")
      }
    }
    // cohort sizes partition the user population
    val totalUsers = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val sumSize0 = byCohort.values.map(_.find(_._2 == 0).get._3).sum
    assert(sumSize0 == totalUsers, s"cohort sizes $sumSize0 != users $totalUsers")
  }
}
