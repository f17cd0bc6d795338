package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("pageRank: distribution preserved, star center dominates, dangling stays uniform") {
    // star: 1..4 <-> 0 (symmetrized), plus isolated dangling nodes 5, 6
    val edges = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
      .flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val nodes = (0L to 6L).toDF("id")
    val r = Graph.pageRank(edges, "src", "dst", nodes, "id", iters = 10)
      .as[(Long, Double)].collect().toMap
    // rank is a probability distribution at every round
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    // the hub out-ranks every leaf; leaves tie by symmetry
    assert(r(0L) > r(1L))
    assert((1L to 4L).map(r).distinct.size === 1)
    // isolated nodes tie with each other and rank below the leaves
    assert(r(5L) === r(6L))
    assert(r(5L) < r(1L))
  }

  test("pageRank: pure-dangling graph stays exactly uniform") {
    val edges = Seq.empty[(Long, Long)].toDF("src", "dst")
    val nodes = (0L until 5L).toDF("id")
    val r = Graph.pageRank(edges, "src", "dst", nodes, "id", iters = 4)
      .as[(Long, Double)].collect().toMap
    // every round: (1-d)/n + d*(0 + 1/n) = 1/n — the uniform fixpoint
    r.values.foreach(v => assert(math.abs(v - 0.2) < 1e-12))
  }

  test("triangleCount: K4 has 4, chain has 0, duplicates/direction/self-loops ignored") {
    // K4 = 6 edges, C(4,3) = 4 triangles, 3 wedges per low vertex: 3+2+1... wedges = C(3,2)+C(2,2)... count directly
    val k4 = (for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong))
      .toDF("src", "dst")
    val r = Graph.triangleCount(k4, "src", "dst")
      .as[(Long, Long, Long)].head()
    assert(r === ((6L, 4L, 4L))) // K4: every wedge at lowest vertex closes
    val chain = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.triangleCount(chain, "src", "dst")
      .as[(Long, Long, Long)].head()._3 === 0L)
    // reversed duplicates and self-loops collapse to the same canonical set
    val messy = Seq((1L, 0L), (0L, 1L), (2L, 1L), (0L, 2L), (2L, 2L))
      .toDF("src", "dst")
    val m = Graph.triangleCount(messy, "src", "dst")
      .as[(Long, Long, Long)].head()
    assert(m === ((3L, 1L, 1L)))
    // degree orientation tames hubs: a star's leaves all point AT the
    // center (higher degree), so the hub generates ZERO wedges — id
    // orientation with a low hub id would generate C(deg, 2)
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)).toDF("src", "dst")
    val s2 = Graph.triangleCount(star, "src", "dst")
      .as[(Long, Long, Long)].head()
    assert(s2 === ((4L, 0L, 0L)))
  }

  test("kCore: cascading peel, tail chains drop, core degrees are in-core") {
    // triangle {0,1,2} with a pendant chain 2-3-4-5: the chain peels
    // CASCADING (5 first, then 4, then 3) — multi-round by construction
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    val core = Graph.kCore(g, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap
    assert(core === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // node 2 reports degree 2 (in-core), not its original 3
    // k=3: the triangle itself dissolves -> empty
    assert(Graph.kCore(g, "src", "dst", k = 3).count() === 0L)
    // k=1 keeps every non-isolated node (degree >= 1 by existence)
    assert(Graph.kCore(g, "src", "dst", k = 1).count() === 6L)
    // maxRounds caps the peel: 1 round only strips node 5's edge
    val partial = Graph.kCore(g, "src", "dst", k = 2, maxRounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(partial.keySet === Set(0L, 1L, 2L, 3L, 4L))
    // duplicates/direction/self-loops canonicalize before peeling
    val messy = Seq((1L, 0L), (0L, 1L), (2L, 1L), (0L, 2L), (1L, 1L))
      .toDF("src", "dst")
    assert(Graph.kCore(messy, "src", "dst", k = 2)
      .as[(Long, Long)].collect().toMap === Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
  }

  test("kCoreWithStatus: converged flag separates fixpoint from truncated peel") {
    // a 50-node path at k=2 peels two endpoints per round (~25 rounds
    // to empty): 20 rounds truncate — the result is a SUPERGRAPH of
    // the true (empty) 2-core and the flag says so
    val chain = (0L until 49L).map(i => (i, i + 1)).toDF("src", "dst")
    val (partial, convPartial) =
      Graph.kCoreWithStatus(chain, "src", "dst", k = 2, maxRounds = 20)
    assert(!convPartial, "20 rounds cannot finish a 50-node chain peel")
    assert(partial.count() > 0L)
    // a generous budget reaches the fixpoint: empty core, converged
    val (full, convFull) =
      Graph.kCoreWithStatus(chain, "src", "dst", k = 2, maxRounds = 40)
    assert(convFull && full.count() === 0L)
    // a graph that converges non-empty also reports converged
    val tri = Seq((0L, 1L), (1L, 2L), (0L, 2L)).toDF("src", "dst")
    val (core, conv) = Graph.kCoreWithStatus(tri, "src", "dst", k = 2)
    assert(conv && core.count() === 3L)
  }

  test("labelPropagation: cliques converge to min label, bridge keeps communities apart") {
    // two triangles {0,1,2} and {10,11,12} joined by one bridge 2-10
    val g = Seq((0L, 1L), (1L, 2L), (0L, 2L),
      (10L, 11L), (11L, 12L), (10L, 12L), (2L, 10L)).toDF("src", "dst")
    val lab = Graph.labelPropagation(g, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    // each triangle agrees internally (the single bridge edge is
    // outvoted by the two in-triangle neighbors) and the two stay
    // DISTINCT — components would merge all 6. Label VALUES are just
    // identifiers: they may travel across the bridge (community 2
    // converges to label 2 here), only the partition is the contract.
    assert(lab(0L) === lab(1L) && lab(1L) === lab(2L))
    assert(lab(10L) === lab(11L) && lab(11L) === lab(12L))
    assert(lab(0L) !== lab(10L))
    assert(lab.values.toSet.size === 2)
    // synchronous LPA's known oscillation on a lone edge (each node's
    // only neighbor label is the other's, so labels swap every round)
    // is exactly why the contract fixes the round count — pin it
    val pair = Seq((5L, 6L)).toDF("src", "dst")
    val p1 = Graph.labelPropagation(pair, "src", "dst", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(p1 === Map(5L -> 6L, 6L -> 5L)) // one swap after 1 round
    val p2 = Graph.labelPropagation(pair, "src", "dst", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(p2 === Map(5L -> 5L, 6L -> 6L)) // swapped back after 2
  }
}
