package graft

import org.apache.spark.sql.functions._

import graft.operators.Graph

/** Quantized PageRank: exactness against a driver-side integer replica,
  * determinism under repartitioning, mass accounting. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  // 1→2, 2→3, 3→1, 1→3, 3→4; node 4 is dangling.
  private val edgeSeq = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (3L, 4L))
  private def edges = edgeSeq.toDF("src", "dst")

  /** The operator's integer formula, replayed with plain Scala maps. */
  private def replica(iters: Int): Map[Long, Long] = {
    val scale = 1000000L
    val nodes = edgeSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val odeg = edgeSeq.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val n = nodes.size.toLong
    var r = nodes.map(_ -> scale).toMap
    for (_ <- 0 until iters) {
      val dangling = nodes.filterNot(odeg.contains).map(r).sum
      val contrib = edgeSeq
        .groupBy(_._2)
        .map { case (d, es) => d -> es.map(e => r(e._1) / odeg(e._1)).sum }
      r = nodes.map(v =>
        v -> (150000L + 85L * (contrib.getOrElse(v, 0L) + dangling / n) / 100L)).toMap
    }
    r
  }

  test("matches the driver-side integer replica exactly") {
    for (iters <- Seq(0, 1, 3)) {
      val got = Graph.pagerankQuantized(edges, "src", "dst", iters)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == replica(iters), s"iters=$iters")
    }
  }

  test("bit-identical under repartitioning") {
    val a = Graph.pagerankQuantized(edges, "src", "dst", 2)
      .orderBy("node").collect().toSeq
    val b = Graph.pagerankQuantized(edges.repartition(7), "src", "dst", 2)
      .orderBy("node").collect().toSeq
    assert(a == b)
  }

  test("personalized pagerank matches its replica; unreachable nodes stay at zero") {
    // extend the graph with 5→6, disconnected from the 1-4 component
    val ext = (edgeSeq :+ (5L, 6L)).toDF("src", "dst")
    val extSeq = edgeSeq :+ (5L, 6L)
    def replica2(seeds: Set[Long], iters: Int): Map[Long, Long] = {
      val scale = 1000000L
      val nodes = extSeq.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val odeg = extSeq.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
      val ns = seeds.size.toLong
      var r = nodes.map(v => v -> (if (seeds(v)) scale else 0L)).toMap
      for (_ <- 0 until iters) {
        val dangling = nodes.filterNot(odeg.contains).map(r).sum
        val contrib = extSeq
          .groupBy(_._2)
          .map { case (d, es) => d -> es.map(e => r(e._1) / odeg(e._1)).sum }
        r = nodes.map { v =>
          val s = if (seeds(v)) 1L else 0L
          v -> (s * 150000L + 85L * (contrib.getOrElse(v, 0L) + s * (dangling / ns)) / 100L)
        }.toMap
      }
      r
    }
    for (iters <- Seq(0, 1, 3)) {
      val seeds = Seq(1L).toDF("node")
      val got = Graph
        .personalizedPagerankQuantized(ext, "src", "dst", seeds, "node", iters)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == replica2(Set(1L), iters), s"iters=$iters")
      // 5 and 6 are unreachable from the seed: exactly zero, every round
      assert(got(5L) == 0L && got(6L) == 0L, s"iters=$iters: $got")
    }
    // seed ∉ edge nodes: appears in the output with its teleport mass
    val isolated = Graph
      .personalizedPagerankQuantized(ext, "src", "dst",
        Seq(99L).toDF("node"), "node", iters = 1)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(isolated(99L) > 0L && isolated.removed(99L).values.forall(_ == 0L),
      isolated.toString)
  }

  test("duplicate edges collapse; totals stay in the expected band") {
    val dup = edges.union(edges)
    val got = Graph.pagerankQuantized(dup, "src", "dst", 2)
      .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
    assert(got == replica(2))
    // Mass ≈ N×scale, reduced only by integer truncation.
    val total = got.values.sum
    assert(total <= 4L * 1000000L && total > 4L * 1000000L - 100L)
  }
}
