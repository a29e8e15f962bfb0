package graft.operators

import scala.collection.mutable
import scala.util.Random

import graft.SparkSuite

class ConnectedComponentsSpec extends SparkSuite {

  /** Brute-force oracle: BFS min-reachable-id per node. */
  private def bfsLabels(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    def link(a: Long, b: Long): Unit =
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
    edges.foreach { case (a, b) => link(a, b); link(b, a) }
    val label = mutable.Map.empty[Long, Long]
    adj.keys.toSeq.sorted.foreach { start =>
      if (!label.contains(start)) {
        // `start` is the min id of its (unvisited) component
        val q = mutable.Queue(start)
        label(start) = start
        while (q.nonEmpty) {
          val n = q.dequeue()
          adj(n).foreach(m => if (!label.contains(m)) { label(m) = start; q += m })
        }
      }
    }
    label.toMap
  }

  private def run(edges: Seq[(Long, Long)], threshold: Long = 50000000L): Map[Long, Long] = {
    import spark.implicits._
    val df = edges.toDF("a", "b")
    ConnectedComponents.labels(df, "a", "b", singleTaskThreshold = threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain, triangle, isolated pair, self-loop") {
    val edges = Seq(
      (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), // chain 1-5
      (10L, 11L), (11L, 12L), (12L, 10L),     // triangle
      (20L, 21L),                             // pair
      (30L, 30L))                             // self-loop → singleton
    assert(run(edges) === bfsLabels(edges))
  }

  test("empty edge set yields empty labels") {
    assert(run(Seq.empty).isEmpty)
  }

  test("random graphs match the BFS oracle (fixed seeds)") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val n = 200
      val edges = Seq.fill(400)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      assert(run(edges) === bfsLabels(edges), s"seed=$seed")
    }
  }

  test("multi-level path: threshold forces repeated contraction") {
    // threshold=1 can never finish in one task via the threshold branch,
    // so the loop must contract down to a single partition and still be
    // exact
    val rnd = new Random(99)
    val edges = Seq.fill(500)((rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
    assert(run(edges, threshold = 1L) === bfsLabels(edges))
  }

  test("labels are min-reachable-id and one row per node") {
    val edges = Seq((7L, 3L), (3L, 9L), (9L, 7L), (1L, 2L))
    val out = run(edges)
    assert(out === Map(7L -> 3L, 3L -> 3L, 9L -> 3L, 1L -> 1L, 2L -> 1L))
  }
}
