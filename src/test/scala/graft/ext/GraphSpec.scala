package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Stage a minimal orders/lineitem pair encoding a path graph:
    * customers 1 and 2 each order from supplier 1. */
  private def stagePath(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-graph").toString
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (20L, 1L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    dir
  }

  test("g01: hand-computed 3-round fixed-point PageRank on the path graph") {
    // nodes: c1=2 (deg 1), c2=4 (deg 1), s1=3 (deg 2); SCALE=1e6
    // r1: s(3)=150000+85*2000000/100=1850000; s(2)=s(4)=150000+85*500000/100=575000
    // r2: s(3)=150000+85*1150000/100=1127500; s(2)=s(4)=150000+85*925000/100=936250
    // r3: s(3)=150000+85*(936250*2)/100=1741625
    val rows = Graph.queries("g01_pagerank")(spark, stagePath()).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((1, 1L, 2L, 1741625L)), s"got $r")
  }

  test("g03: hand-computed co-occurrence — shared counts and independence lift") {
    // customers 1,2 buy {A,B}; customer 3 buys {A,C}. Pairs: (A,B)
    // shared=2, (A,C) shared=1; nc=3, cnt A=3 B=2 C=1.
    // lift(A,B) = 2*3/(3*2) = 1.0; lift(A,C) = 1*3/(3*1) = 1.0
    val dir = java.nio.file.Files.createTempDirectory("graft-g03").toString
    Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L), (30L, 1L), (30L, 3L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Graph.queries("g03_cooccurrence")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toList
    assert(rows == List((1, 1L, 2L, 2L, 1.0), (2, 1L, 3L, 1L, 1.0)),
      s"got $rows")
  }

  test("g02: degree census partitions nodes; sum_deg doubles the edge count") {
    val sf = "/root/testdata/sf0.001"
    val rows = Graph.queries("g02_degree_census")(spark, sf).collect()
    val byKind = rows.groupBy(_.getString(0))
    assert(byKind.keySet == Set("customer", "supplier"))
    // every edge contributes 1 to a customer's degree and 1 to a supplier's
    val custDeg = byKind("customer").map(_.getLong(3)).sum
    val suppDeg = byKind("supplier").map(_.getLong(3)).sum
    assert(custDeg == suppDeg, s"$custDeg != $suppDeg")
    // buckets are consistent with their own min/max
    rows.foreach { r =>
      val (b, mn, mx) = (r.getInt(1), r.getLong(4), r.getLong(5))
      assert(64 - java.lang.Long.numberOfLeadingZeros(mn) - 1 == b)
      assert(64 - java.lang.Long.numberOfLeadingZeros(mx) - 1 == b)
    }
  }

  test("g04 bitmap-segment intersection is row-identical to g03's sorted-set form") {
    // the two forms are the SAME projection at different set-representation
    // scale points: collect_set arrays (g03, faster while sets fit) vs
    // 64-wide segment bitmaps (g04, row-bounded when sets outgrow arrays).
    // Equality on real data at both harness SFs proves the bitmap
    // arithmetic — segment keying, shift placement, bit_or partials,
    // bit_count(a & b) summation — exactly reproduces set intersection.
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val a = Graph.queries("g03_cooccurrence")(spark, sf).collect().toSeq
      val b = Graph.queries("g04_cooccurrence_bitmap")(spark, sf).collect().toSeq
      assert(a.nonEmpty, s"g03 returned no rows at $sf")
      assert(a == b, s"g03 vs g04 mismatch at $sf")
    }
  }

  test("g06 triangle core: K4 has 4 triangles, C5 has none, K4+pendant keeps 4") {
    import spark.implicits._
    def tri(edges: Seq[(Long, Long)]): (Map[Long, Long], Seq[(Long, Long, Long)]) = {
      val (deg, tr) = Graph.triangleCore(spark, edges.toDF("u", "v"))
      (deg.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
        tr.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    }
    // K4 on {1,2,3,4}: C(4,3)=4 triangles, each enumerated once as a<b<c
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val (dK4, tK4) = tri(k4)
    assert(dK4 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    assert(tK4.sorted == Seq((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // C5 (5-cycle): triangle-free
    val (_, tC5) = tri(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 5L)))
    assert(tC5.isEmpty)
    // a pendant edge joins the count of its component, adds no triangle
    val (dP, tP) = tri(k4 :+ (4L, 9L))
    assert(tP.sorted == tK4.sorted && dP(9L) == 1L && dP(4L) == 4L)
  }

  test("g06: census identities hold on real data (3·Δ node-sum, cc bounds)") {
    val rows = Graph.queries("g06_triangle_census")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty, "empty triangle census at sf0.001")
    val nTri = rows.head.getLong(7)
    // census columns are constant across rows
    assert(rows.forall(r => r.getLong(7) == nTri))
    // each listed node's triangle count is at most C(deg,2) wedges
    rows.foreach { r =>
      val (deg, tri, lcc) = (r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(tri <= deg * (deg - 1) / 2, s"tri $tri exceeds wedges at deg $deg")
      assert(lcc >= 0.0 && lcc <= 1.0, s"lcc out of range: $lcc")
    }
    // mutual top-6 construction bounds every degree by 6
    assert(rows.forall(_.getLong(2) <= 6))
    val ranks = rows.map(_.getInt(0)).toSeq
    assert(ranks == (1 to rows.length), s"rank gap: $ranks")
    // when the top-20 cut is not binding the listing covers every node
    // that CAN close a triangle (deg<2 ⇒ no wedge), so per-node counts
    // must sum to 3·Δ — each triangle counted once at each corner
    if (rows.length < 20)
      assert(rows.map(_.getLong(3)).sum == 3 * nTri)
  }

  test("g01: score mass stays within the damping fixed-point envelope on real data") {
    val sf = "/root/testdata/sf0.001"
    val rows = Graph.queries("g01_pagerank")(spark, sf).collect()
    // sf0.001 has 10 suppliers — top-20 returns min(20, #suppliers) rows
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getInt(0)).toSeq == (1 to rows.length))
    val scores = rows.map(_.getLong(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // every score at least the damping floor and below the total mass
    assert(scores.forall(s => s >= 150000L))
  }

  test("g07 peel core: K4+pendant path sheds the tail and keeps the 3-core; a path peels to nothing") {
    import spark.implicits._
    def peel(edges: Seq[(Long, Long)], k: Int): Seq[(Int, Long, Long, Long)] =
      Graph.kcorePeel(edges.toDF("u", "v"), k, 3).collect()
        .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // K4 on {1,2,3,4} + pendant path 4-5-6, k=3: round 0 drops {5,6}
    // (degrees 2 and 1), then the K4 — a true 3-core — is stable forever
    val k4p = peel(Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)), k = 3)
    assert(k4p == Seq((0, 6L, 8L, 2L), (1, 4L, 6L, 0L),
      (2, 4L, 6L, 0L), (3, 4L, 6L, 0L)), s"got $k4p")
    // path 1-2-3-4-5, k=2: endpoints peel inward until nothing is left —
    // exercises the empty-graph census branch (coalesced zero edges)
    val path = peel(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), k = 2)
    assert(path == Seq((0, 5L, 4L, 2L), (1, 3L, 2L, 2L),
      (2, 0L, 0L, 0L), (3, 0L, 0L, 0L)), s"got $path")
  }

  test("g08 BFS core: path distances exact, depth cap strands the tail, disconnected -> -1") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // path 1-2-3-4-5-6-7 + disconnected edge 8-9, source {1}, 4 rounds:
    // hops 1:0, 2:1, 3:2, 4:3, 5:4; {6,7} are REACHABLE but beyond the
    // depth cap and {8,9} unreachable — both report -1, which is the
    // documented cap semantics (a production BFS bounds its radius)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (6L, 7L), (8L, 9L)).toDF("u", "v")
    val got = Graph.bfsHops(edges, col("n") === 1, rounds = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4,
      6L -> -1, 7L -> -1, 8L -> -1, 9L -> -1), s"got $got")
    // multi-source: {1, 7} meet in the middle within 3 rounds
    val got2 = Graph.bfsHops(edges, col("n") === 1 || col("n") === 7, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(got2 == Map(1L -> 0, 7L -> 0, 2L -> 1, 6L -> 1, 3L -> 2,
      5L -> 2, 4L -> 3, 8L -> -1, 9L -> -1), s"got $got2")
  }

  test("g10: hand-computed 3-round personalized PageRank — teleport mass returns to the seed only") {
    // customers 1,2 each order from supplier 3: nodes c1=2, c2=4, s3=7
    // (deg 2). Seed set = suppliers sp % 7 = 3 -> {s3}. N=3, |S|=1 ->
    // seed restart = 150000*3 = 450000; non-seeds restart 0.
    //   init: sc(7)=1e6, sc(2)=sc(4)=0
    //   r1: c's get 85*(1e6 DIV 2) DIV 100 = 425000; s3 = 450000+0
    //   r2: c's = 85*(450000 DIV 2) DIV 100 = 191250;
    //       s3 = 450000 + 85*850000 DIV 100 = 1172500
    //   r3: s3 = 450000 + 85*(191250+191250) DIV 100 = 775125
    val dir = java.nio.file.Files.createTempDirectory("graft-g10").toString
    Seq((10L, 1L), (20L, 2L)).toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    Seq((10L, 3L), (20L, 3L)).toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val rows = Graph.queries("g10_personalized_pagerank")(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((1, 3L, 2L, 775125L)), s"got $r")
    // a graph with NO seed suppliers drains to zero everywhere — the
    // walk has nowhere to restart (g01's global floor does NOT apply)
    val rows2 = Graph.queries("g10_personalized_pagerank")(spark, stagePath())
      .collect()
    assert(rows2.length == 1 && rows2.head.getLong(3) == 0L,
      s"seedless graph should score 0, got ${rows2.toList}")
  }

  test("g09 SSSP core: longer-but-cheaper path wins, rounds tighten monotonically") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // triangle 1-2 (w 5), 2-3 (w 1), 1-3 (w 10): round 1 reaches 3 at 10
    // (the direct weak tie), round 2 TIGHTENS it to 6 via the two-hop
    // strong-tie route — the exact behavior hop-count BFS cannot express
    val edges = Seq((1L, 2L, 5L), (2L, 3L, 1L), (1L, 3L, 10L))
      .toDF("u", "v", "w")
    def state(rounds: Int): Map[Int, Map[Long, Long]] =
      Graph.ssspRounds(edges, col("n") === 1, rounds).collect()
        .groupBy(_.getInt(0))
        .map { case (r, rows) =>
          r -> rows.map(x => x.getLong(1) -> x.getLong(2)).toMap }
    val st = state(2)
    assert(st(0) == Map(1L -> 0L), s"round 0: ${st(0)}")
    assert(st(1) == Map(1L -> 0L, 2L -> 5L, 3L -> 10L), s"round 1: ${st(1)}")
    assert(st(2) == Map(1L -> 0L, 2L -> 5L, 3L -> 6L), s"round 2: ${st(2)}")
    // multi-source on a weighted path 4-(1)-5-(1)-6 + the triangle:
    // disconnected component never appears in the distance map
    val ed2 = Seq((1L, 2L, 5L), (2L, 3L, 1L), (4L, 5L, 1L), (5L, 6L, 1L))
      .toDF("u", "v", "w")
    val st2 = Graph.ssspRounds(ed2, col("n") === 1 || col("n") === 4, 2)
      .collect().groupBy(_.getInt(0))
      .map { case (r, rows) =>
        r -> rows.map(x => x.getLong(1) -> x.getLong(2)).toMap }
    assert(st2(2) == Map(1L -> 0L, 2L -> 5L, 3L -> 6L,
      4L -> 0L, 5L -> 1L, 6L -> 2L), s"got ${st2(2)}")
  }
}
