package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: uniform on a symmetric cycle, mass conserved") {
    // directed 4-cycle: every node has in/out degree 1 -> rank = 1/4 each
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iterations = 10)
      .as[(String, Double)].collect().toMap
    assert(r.size == 4)
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12, r))
    assert(math.abs(r.values.sum - 1.0) < 1e-9, "no dangling -> mass 1")
  }

  test("pageRank: hub outranks leaves on a symmetrized star") {
    // star a--{b,c,d,e}, both directions so nothing dangles
    val out = Seq("b", "c", "d", "e").map(("a", _))
    val e = (out ++ out.map(_.swap)).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iterations = 8)
      .as[(String, Double)].collect().toMap
    assert(r("a") > r("b") * 2, s"hub must dominate: $r")
    Seq("c", "d", "e").foreach(n =>
      assert(math.abs(r(n) - r("b")) < 1e-12, "leaves symmetric"))
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
  }

  test("pageRank: duplicate edges collapse (no multigraph double-count)") {
    val once = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"))
      .toDF("src", "dst")
    val dup = Seq(("a", "b"), ("a", "b"), ("b", "a"), ("a", "c"),
      ("c", "a"), ("c", "a")).toDF("src", "dst")
    val r1 = Graph.pageRank(once, "src", "dst", iterations = 5)
      .as[(String, Double)].collect().toMap
    val r2 = Graph.pageRank(dup, "src", "dst", iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(r1 == r2)
  }

  test("pageRank: dangling node keeps teleport floor, leaks the rest") {
    // b has no out-edges: its mass (beyond teleport) leaves the system
    val e = Seq(("a", "b")).toDF("src", "dst")
    val r = Graph.pageRank(e, "src", "dst", iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(r("b") > r("a"), "b receives, a only teleports")
    assert(r.values.sum < 1.0, "documented dangling leak")
    assert(r("a") > 0.0)
  }

  test("personalizedPageRank: mass concentrates around the seed and " +
      "decays with walk distance; unreached nodes rank exactly 0") {
    // symmetrized path a-b-c-d-e-f, seed {a}. Near convergence the
    // stationary distribution decays monotonically with distance from
    // the seed (at LOW iteration counts the walk's parity oscillation
    // can locally invert adjacent nodes — e.g. b < c at 2 rounds — so
    // the decay claim needs the converged walk).
    val p = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("e", "f"))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a").toDF("node")
    val r = Graph.personalizedPageRank(e, "src", "dst", seeds, "node",
      iterations = 20)
      .as[(String, Double)].collect().toMap
    // decay holds along the walk b > c > d > e > f; the seed itself
    // ranks below its own neighbor (a is degree-1, so every restart
    // pushes ALL of a's mass through b — b accumulates the corridor)
    val walk = Seq("b", "c", "d", "e", "f").map(r)
    assert(walk == walk.sorted.reverse && walk.distinct == walk,
      s"rank must decay with distance from the seed: $r")
    assert(r("a") > r("c"), s"seed outranks everything past its corridor: $r")
    // finite walk radius: at 2 iterations mass has reached c at most
    val r2 = Graph.personalizedPageRank(e, "src", "dst", seeds, "node",
      iterations = 2)
      .as[(String, Double)].collect().toMap
    Seq("d", "e", "f").foreach(n =>
      assert(r2(n) == 0.0, s"node $n is beyond the 2-hop walk radius: $r2"))
  }

  test("personalizedPageRank: seeding every node reproduces pageRank " +
      "bit-for-bit; an off-graph seed set fails fast") {
    val p = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"))
    val e = (p ++ p.map(_.swap)).toDF("src", "dst")
    val all = Seq("a", "b", "c", "d").toDF("node")
    val ppr = Graph.personalizedPageRank(e, "src", "dst", all, "node",
      iterations = 5).as[(String, Double)].collect().toMap
    val pr = Graph.pageRank(e, "src", "dst", iterations = 5)
      .as[(String, Double)].collect().toMap
    assert(ppr == pr, "uniform teleport == global PageRank, same bits")
    // seeds not present in the graph contribute nothing -> undefined
    intercept[IllegalArgumentException] {
      Graph.personalizedPageRank(e, "src", "dst",
        Seq("zz").toDF("node"), "node", iterations = 2)
    }
  }

  test("triangleCount: known graphs exact — triangle, K4, square, star; " +
      "duplicates/reversals/self-loops normalize away") {
    def count(edges: Seq[(Long, Long)]): (Long, Long, Long) =
      Graph.triangleCount(edges.toDF("s", "d"), "s", "d")
        .as[(Long, Long, Long)].head()
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L))) == ((3L, 3L, 1L)))
    // K4: every 3-subset closes
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(count(k4) == ((4L, 6L, 4L)))
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))) ==
      ((4L, 4L, 0L)), "square has no triangle")
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) ==
      ((5L, 4L, 0L)), "star has no triangle")
    // messy input: duplicate edges, reversed copies, a self-loop —
    // canonicalization must make it the plain triangle
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L),
      (2L, 2L))
    assert(count(messy) == ((3L, 3L, 1L)))
  }

  test("kCore: path graph cascades one layer per round, cycle survives, " +
      "extra rounds are no-ops, messy input canonicalized") {
    // path 1-2-...-8 at k=2: each round peels both current endpoints
    val path = (1L to 7L).map(i => (i, i + 1)).toDF("src", "dst")
    val after2 = Graph.kCore(path, "src", "dst", k = 2, rounds = 2)
      .as[(Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(after2 == Map(3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 1L),
      s"two peel rounds leave the middle segment: $after2")
    val after4 = Graph.kCore(path, "src", "dst", k = 2, rounds = 4)
      .collect()
    assert(after4.isEmpty, "a path has no 2-core")
    // cycle 1-2-3-4-1 with tail 4-5-6: the tail peels over two rounds,
    // the cycle IS the 2-core; more rounds must not change it
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (4L, 5L),
      (5L, 6L)).toDF("src", "dst")
    val core3 = Graph.kCore(cyc, "src", "dst", k = 2, rounds = 3)
      .as[(Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(core3 == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L))
    val core6 = Graph.kCore(cyc, "src", "dst", k = 2, rounds = 6)
      .as[(Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(core6 == core3, "converged core is a fixpoint")
    // messy input: duplicates, reversed copies, self-loop
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (2L, 3L), (3L, 1L),
      (2L, 2L)).toDF("src", "dst")
    val tri = Graph.kCore(messy, "src", "dst", k = 2, rounds = 2)
      .as[(Long, Long)].collect().map(t => t._1 -> t._2).toMap
    assert(tri == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("degreeProfile: out/in split with zero-fill") {
    val e = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("a", "x"))
      .toDF("src", "dst")
    val d = Graph.degreeProfile(e, "src", "dst")
      .as[(String, Long, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(d("a") == ((2L, 0L)), "duplicate edge collapsed")
    assert(d("b") == ((1L, 0L)))
    assert(d("x") == ((0L, 2L)))
    assert(d("y") == ((0L, 1L)))
  }

  test("labelPropagation: two cliques with a bridge resolve to two " +
      "communities; labels flow to the minimum; no bipartite oscillation") {
    import org.apache.spark.sql.functions.col
    def edges(ps: (Long, Long)*) = ps.toDF("s", "d")
    // two 4-cliques {1..4} and {11..14} joined by one bridge 4-11
    def clique(ids: Seq[Long]) =
      for { a <- ids; b <- ids if a < b } yield (a, b)
    val g = edges(clique(Seq(1L, 2L, 3L, 4L)) ++
      clique(Seq(11L, 12L, 13L, 14L)) :+ ((4L, 11L)): _*)
    val out = Graph.labelPropagation(g, "s", "d", rounds = 4)
      .as[(Long, Long)].collect().toMap
    // hand-traced: round 1 pulls each clique to its min (bridge node 11
    // briefly adopts 4), round 2 the clique majority pulls 11 back to
    // 11 — the single bridge edge can never outvote 3 clique neighbors,
    // so the two communities are STABLE, not absorbed into one
    assert(out == Map(1L -> 4L, 11L -> 4L),
      s"bridged cliques must stay two communities: $out")
    // fewer rounds on a long path: label 1 travels one hop per round,
    // so round 2 leaves the far end of a 6-path in its own community
    val path = edges((1L to 5L).map(i => (i, i + 1)): _*)
    val partial = Graph.labelPropagation(path, "s", "d", rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(partial.values.sum == 6L, "every node in exactly one community")
    assert(partial.keySet.min == 1L && partial.size > 1,
      s"2 rounds cannot absorb a 6-path: $partial")
    // the classic sync-LPA pathology: a single edge (bipartite K1,1)
    // oscillates under pure synchronous updates; the self-vote pins it
    val pair = edges((7L, 9L))
    val p = Graph.labelPropagation(pair, "s", "d", rounds = 3)
      .as[(Long, Long)].collect().toMap
    assert(p == Map(7L -> 2L), s"self-vote must stop the flip-flop: $p")
    // duplicate + self edges collapse; isolated direction irrelevant
    val messy = edges((1L, 2L), (2L, 1L), (1L, 1L), (2L, 2L), (1L, 2L))
    assert(Graph.labelPropagation(messy, "s", "d", rounds = 2)
      .as[(Long, Long)].collect().toMap == Map(1L -> 2L))
    intercept[IllegalArgumentException] {
      Graph.labelPropagation(g, "s", "d", rounds = 0)
    }
  }
}
