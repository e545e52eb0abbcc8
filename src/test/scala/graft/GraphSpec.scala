package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** PageRank and degree stats over link graphs — exact-integer semantics
  * verified against an independent plain-Scala reimplementation of the
  * published recurrence, plus partition invariance and the dangling /
  * damping edge cases. */
class GraphSpec extends SparkSpec {

  import spark.implicits._

  /** independent reference: the same integer recurrence in plain Scala
    * maps/loops — no Spark, no shared code with the operator */
  private def refPageRank(
      edges: Seq[(Long, Long)],
      iters: Int,
      unit: Long,
      num: Long = 85L,
      den: Long = 100L): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.length
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.length.toLong }
    val base = unit * (den - num) / den
    var rank = nodes.map(_ -> unit).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.HashMap.empty[Long, BigInt].withDefaultValue(BigInt(0))
      edges.foreach { case (s, d) => in(d) += rank(s) / outdeg(s) }
      val dang = nodes.filterNot(outdeg.contains).map(x => BigInt(rank(x))).sum / n
      rank = nodes.map(v => v -> (base + ((num * (in(v) + dang)) / den).toLong)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Long, Long)], iters: Int, unit: Long): Map[Long, Long] =
    Graph.pageRank(edges.toDF("s", "d"), "s", "d", iters, unit = unit)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pageRank matches the independent integer recurrence (incl. dangling)") {
    // 1→2, 2→1, 1→3, 3 dangling, 4→1 (4 never linked to: in=0 path)
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 1L))
    for (iters <- Seq(1, 3, 7)) {
      assert(run(edges, iters, 1000000L) === refPageRank(edges, iters, 1000000L))
    }
  }

  test("pageRank is partition-invariant and rerun-stable") {
    val edges = (0L until 400L).map(i => (i % 37, (i * 31 + 5) % 53))
    val df1 = edges.toDF("s", "d").repartition(1)
    val df7 = edges.toDF("s", "d").repartition(7, col("d"))
    val a = Graph.pageRank(df1, "s", "d", 4, unit = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.pageRank(df7, "s", "d", 4, unit = 1000000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a === b)
    assert(a === refPageRank(edges, 4, 1000000L).toSeq.sortBy(_._1))
  }

  test("rank mass concentrates on the sink hub and total mass is conserved-ish") {
    // star: everyone links to 0; 0 links back to 1. 25 rounds: the
    // hub↔node-1 2-cycle converges geometrically (factor 0.7225) and
    // the hub's ~9.3×-uniform stationary rank dominates clearly
    val edges = (1L to 20L).map(i => (i, 0L)) :+ ((0L, 1L))
    val r = run(edges, 25, 1000000L)
    assert(r(0L) === r.values.max)
    assert(r(2L) === r(3L)) // symmetric leaves tie exactly
    // floor-division residues only ever LOSE mass, a few units per round
    val total = r.values.map(BigInt(_)).sum
    assert(total <= BigInt(21L) * 1000000L)
    assert(total > BigInt(21L) * 1000000L * 99 / 100)
  }

  test("damping 1/1 is a pure random walk; 0/1 is uniform base") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L)) // 3-cycle, outdeg 1
    val walk = Graph.pageRank(edges.toDF("s", "d"), "s", "d", 5,
      dampingNum = 1L, dampingDen = 1L, unit = 1000000L)
      .collect().map(r => r.getLong(1)).distinct
    assert(walk === Array(1000000L)) // cycle preserves the uniform mass exactly
    val frozen = Graph.pageRank(edges.toDF("s", "d"), "s", "d", 5,
      dampingNum = 0L, dampingDen = 1L, unit = 1000000L)
      .collect().map(r => r.getLong(1)).distinct
    assert(frozen === Array(1000000L)) // base term only
  }

  test("auto unit scales to node count and tiny graphs get a big unit") {
    val r = Graph.pageRank(Seq((1L, 2L)).toDF("s", "d"), "s", "d", 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // n=2 → unit=1e18; node 2 is dangling, node 1 unlinked:
    // in(1)=0, in(2)=unit/1 ; dang = unit(node2) / 2
    val unit = 1000000000000000000L
    val dang = unit / 2
    val base = unit * 15 / 100
    assert(r(1L) === base + (BigInt(85) * BigInt(dang) / 100).toLong)
    assert(r(2L) === base + (BigInt(85) * (BigInt(unit) + BigInt(dang)) / 100).toLong)
  }

  /** exact harmonic centrality by plain-Scala BFS along reverse edges */
  private def refHarmonic(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val inN = edges.groupBy(_._2).map { case (d, es) => d -> es.map(_._1).distinct }
    nodes.map { v =>
      // multi-source backward BFS from v over reverse edges = d(u→v)
      var frontier = Set(v); val dist = scala.collection.mutable.HashMap(v -> 0)
      var d = 0
      while (frontier.nonEmpty) {
        d += 1
        frontier = frontier.flatMap(x => inN.getOrElse(x, Nil))
          .filterNot(dist.contains)
        frontier.foreach(u => dist(u) = d)
      }
      v -> dist.collect { case (u, du) if u != v => 1.0 / du }.sum
    }.toMap
  }

  test("HyperBall harmonic centrality matches exact BFS on small graphs") {
    // small cardinalities: HLL sparse mode is lossless → estimates exact
    val graphs = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), // 4-cycle
      Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (5L, 1L)), // diamond + tail
      (1L to 12L).map(i => (i, (i % 12) + 1)) ++ Seq((1L, 7L))) // cycle + chord
    graphs.foreach { edges =>
      val got = Graph.harmonicCentrality(edges.toDF("s", "d"), "s", "d", maxIters = 20)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ref = refHarmonic(edges)
      assert(got.keySet === ref.keySet)
      got.foreach { case (v, h) =>
        assert(math.abs(h - ref(v)) < 1e-9, s"node $v: $h vs ${ref(v)}")
      }
    }
  }

  test("harmonic centrality converges before maxIters (diameter-bounded)") {
    // path graph 1→2→3: diameter 2, so iterations stop early and the
    // sink (node 3, reachable from both) scores highest
    val got = Graph.harmonicCentrality(
      Seq((1L, 2L), (2L, 3L)).toDF("s", "d"), "s", "d", maxIters = 50)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(3L) === 1.0 + 0.5) // d(2→3)=1, d(1→3)=2
    assert(got(2L) === 1.0)
    assert(got(1L) === 0.0)
  }

  /** exact triangle reference: brute force over all id triples */
  private def refTriangles(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.flatMap { case (a, b) => if (a == b) Nil else Seq((a min b, a max b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val counts = scala.collection.mutable.HashMap.empty[Long, Long].withDefaultValue(0L)
    for {
      i <- nodes.indices; j <- (i + 1) until nodes.length; k <- (j + 1) until nodes.length
      (a, b, c) = (nodes(i), nodes(j), nodes(k))
      if und((a, b)) && und((b, c)) && und((a, c))
    } { counts(a) += 1; counts(b) += 1; counts(c) += 1 }
    nodes.map(v => v -> counts(v)).toMap
  }

  test("triangleCount matches brute force; directions, dups and loops collapse") {
    val graphs = Seq(
      Seq((1L, 2L), (2L, 3L), (3L, 1L)), // one triangle
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (2L, 3L)), // noisy same
      // K5 minus one edge + a pendant
      (for (a <- 1L to 5L; b <- (a + 1) to 5L if (a, b) != ((1L, 5L))) yield (a, b)) :+ ((6L, 1L)),
      // skewed hub: star + one rim edge → exactly 1 triangle through the hub
      (1L to 30L).map(i => (0L, i)) :+ ((1L, 2L)))
    graphs.foreach { edges =>
      val got = Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === refTriangles(edges), s"edges=$edges")
    }
  }

  test("degrees counts multi-edges and both directions") {
    val d = Graph.degrees(Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("s", "d"), "s", "d")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(d === Array((1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("attachRank keys docs to ranks; missing nodes get 0") {
    val ranks = Seq((1L, 500L)).toDF("node", "rank")
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val out = Graph.attachRank(docs, "doc_id", ranks)
      .select("doc_id", "rank").collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(out === Array((1L, 500L), (2L, 0L)))
  }
}
