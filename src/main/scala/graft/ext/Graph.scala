package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over plain edge-list DataFrames.
  *
  * PageRank is the canonical "importance over a web/link graph" signal a
  * training-data pipeline uses for source weighting (e.g. harmonic-
  * centrality / PR-based seed lists in Common Crawl curation). No graph
  * library involved: the iteration is two hash joins + one aggregation
  * per round, which is exactly the Pregel message-passing shape and lets
  * Catalyst/AQE handle partitioning.
  *
  * Scale shape (100 TB / 10^9-node discipline):
  *  - the edge list is the big, immutable side: it is deduped,
  *    degree-annotated, and materialized ONCE with its join layout, so
  *    the per-iteration shuffle moves only the (node, rank) table —
  *    O(V) per round, never O(E);
  *  - out-degrees are computed once and folded INTO the partitioned edge
  *    frame (so the per-iteration join is a single equi-join);
  *  - contributions aggregate with partial (map-side) combine on dst;
  *  - rank lineage is cut every `checkpointEvery` rounds — bounded plan
  *    depth on long convergence runs, while short fixed-round runs plan
  *    as one lazy chain (one job, no per-round fixed cost);
  *  - no driver-side loops over data: the only collected values are the
  *    node count (one scalar).
  *
  * Determinism for the oracle: per-edge contributions `rank/deg` are
  * IEEE-identical in both engines (same divide on same doubles), and
  * they are summed as DECIMAL(28,14) — exact, order-free — so ranks are
  * bit-stable across partitionings and engines (the ADC decimal-sum
  * discipline, SimSearch.scala).
  *
  * Dangling nodes (out-degree 0) leak their mass by design — callers
  * that need the strict Markov-chain invariant should add self-loops or
  * symmetrize the graph (an undirected graph has none). Keeping the
  * dangling redistribution out keeps the iteration one-join cheap and
  * the oracle expressible.
  */
object Graph {

  /** PageRank over the directed edge list `(srcCol, dstCol)`, fixed
    * `iterations` rounds, teleport `1 - damping`. Duplicate edges are
    * collapsed first (a multigraph would double-count contributions).
    * Returns `(node, rank DOUBLE)` with `node` keeping the input key
    * type (use narrow integral keys where possible — graph shuffles are
    * key-dominated, and a long key shuffles ~2-3x faster than a short
    * string); ranks sum to ~1 on graphs with no dangling nodes.
    *
    * `checkpointEvery`: rank lineage is cut every this-many rounds.
    * Round-6 re-measurement at sf0.1 REVERSED the earlier lazy-chain
    * preference: without cuts, each round's aggregate re-evaluates the
    * shared subtrees of every earlier round (Spark reuses exchanges
    * only opportunistically), so the lazy 5-iteration PageRank chain
    * ran 12.0s vs 9.8s with cuts every 2 rounds — and the effect is
    * combinatorial for kCore's nested semi-join chains (11.3s lazy vs
    * 2.2s per-round, 5.2x). Defaults now ship the measured winners:
    * kCore/LPA cut every round, PageRank every 2. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      checkpointEvery: Int = 2, edgesDistinct: Boolean = false): DataFrame = {
    // materialize the deduped edge list ONCE — nodes, degrees, and the
    // per-round joins all derive from it (without this cut the distinct
    // and the upstream scan re-run for each derivation).
    // `edgesDistinct = true`: the caller guarantees the edge list is
    // already duplicate-free, so the dedup shuffle (O(E) rows) is
    // skipped outright — guide §2.4's "a distinct on data that is
    // already unique" accidental exchange. A symmetrized bipartite
    // graph is the canonical case: distinct each direction before the
    // union (half the rows) and the union of the two parity-disjoint
    // halves is distinct by construction.
    val eRaw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (edgesDistinct) eRaw else eRaw.distinct())
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint() // reused every round + for the scalar count
    val n = nodes.count()
    require(n > 0, "pageRank on an empty graph")
    // one-time: fold out-degree into the src-partitioned edge frame; every
    // iteration equi-joins this single frame on src and reuses its layout.
    // The repartition is EXPLICIT (session shuffle-partition count, so the
    // degree of parallelism stays conf-driven): without it, AQE coalesces
    // the small deg-join exchange to ~1 partition before the checkpoint
    // freezes the layout, and every iteration's map-side work — the
    // per-edge divide + double->decimal cast + partial decimal sums, the
    // dominant per-round CPU — then runs single-threaded (r15 probe:
    // 1.1-1.8s/iter single-partition vs ~0.1s at 32; the r6 note that an
    // explicit repartition "costs one extra shuffle" predates AQE
    // coalescing freezing 1-partition layouts into checkpoints).
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val eDeg = e.join(deg, "src")
      .repartition(parts, col("src"))
      // freeze the SORT too: localCheckpoint preserves outputOrdering,
      // so the per-iteration sort-merge join against the (stats-less,
      // hence never-broadcast) rank frame re-sorts only the O(V) rank
      // side, not the O(E) edge frame — the r15 probe measured the
      // per-round eDeg re-sort at ~2s of the ~2.5s iteration
      .sortWithinPartitions("src")
      .localCheckpoint()
    // mirror the oracle's arithmetic shape exactly: base and damping are
    // applied as (1.0 - damping)/n + damping * sum — same op order
    val base = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iterations) {
      val contribs = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("ct"))
      ranks = nodes
        .join(contribs.groupBy("node").agg(sum(col("ct")).as("sm")), Seq("node"),
          "left")
        .select(col("node"),
          (lit(base) + lit(damping) *
            coalesce(col("sm").cast("double"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** PERSONALIZED PageRank (Page et al. 1999 §6 "personalized" E
    * vector; the random-walk-with-restart form of Haveliwala 2002
    * "Topic-Sensitive PageRank"): teleport lands uniformly on the SEED
    * set instead of all nodes —
    *
    *   r(v) = (1 - d)/|S| * [v ∈ S]  +  d * Σ_{u→v} r(u)/deg(u)
    *
    * so rank mass concentrates around the seeds and decays with walk
    * distance. This is the seed-expansion primitive of crawl curation:
    * hand a list of known-good domains, get back the link
    * neighborhood ranked by proximity-weighted importance (the same
    * shape as the public Common Crawl seed-list expansion pipelines).
    * Seeds are intersected with the graph's nodes first (a seed absent
    * from the edge list carries no walk mass); ranks start at 1/|S| on
    * seeds, 0 elsewhere.
    *
    * Scale shape: determinism and the dangling-mass caveat are
    * [[pageRank]]'s (one edge materialization, DECIMAL(28,14)
    * contribution sums, lineage cut every `checkpointEvery` rounds),
    * but the iteration carries a SPARSE rank frame — seeds ∪ nodes the
    * walk has reached — instead of the full vertex set: unreached
    * nodes hold exactly 0 mass, contribute exact-zero decimals, and
    * need not shuffle. At 100 TB with a hand-curated seed list this is
    * the difference between O(frontier) and O(V) per round (the full
    * vertex frame joins in exactly once, at the end, to emit the
    * 0-rank rows the report contract includes). Results are
    * bit-identical to the dense form: omitted rows are exact decimal
    * zeros under the sum and the base term is seed-gated either way. */
  def personalizedPageRank(edges: DataFrame, srcCol: String,
      dstCol: String, seeds: DataFrame, seedCol: String,
      iterations: Int = 5, damping: Double = 0.85,
      checkpointEvery: Int = 2, edgesDistinct: Boolean = false): DataFrame = {
    // `edgesDistinct`: see [[pageRank]] — skip the dedup shuffle when
    // the caller guarantees a duplicate-free edge list
    val eRaw = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    val e = (if (edgesDistinct) eRaw else eRaw.distinct())
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
    // the in-graph seed frame (tiny, checkpointed): drives the sparse
    // iteration and the per-round base term
    val seedIds = nodes.join(
      seeds.select(col(seedCol).as("node")).distinct(),
      Seq("node"), "left_semi")
      .localCheckpoint()
    val nS = seedIds.count()
    require(nS > 0,
      "personalizedPageRank: no seed appears in the graph — teleport " +
        "distribution is undefined")
    // explicit src repartition before the checkpoint: see [[pageRank]]
    // (AQE otherwise freezes a ~1-partition layout and the per-round
    // map-side decimal work serializes)
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val parts = edges.sparkSession.sessionState.conf.numShufflePartitions
    val eDeg = e.join(deg, "src")
      .repartition(parts, col("src"))
      .sortWithinPartitions("src") // see pageRank: frozen ordering
      .localCheckpoint()
    val base = (1.0 - damping) / nS
    // SPARSE rank frame: only nodes the walk has touched carry rows
    var ranks = seedIds.withColumn("rank", lit(1.0 / nS))
    for (i <- 1 to iterations) {
      val sm = eDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("ct"))
        .groupBy("node").agg(sum(col("ct")).as("sm"))
      ranks = seedIds.withColumn("__b", lit(base))
        .join(sm, Seq("node"), "full")
        .select(col("node"),
          (coalesce(col("__b"), lit(0.0)) + lit(damping) *
            coalesce(col("sm").cast("double"), lit(0.0))).as("rank"))
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    // the report contract includes unreached nodes at exactly 0 — the
    // full vertex frame enters ONCE here, not once per round
    nodes.join(ranks, Seq("node"), "left")
      .select(col("node"), coalesce(col("rank"), lit(0.0)).as("rank"))
  }

  /** Degree profile of an edge list: per-node out/in degree plus the
    * graph-wide rank of each (ties broken by node id) — the cheap
    * structural screen run before anything iterative. One aggregation
    * per direction, one join, no iteration. */
  def degreeProfile(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct()
    val outDeg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("out_deg"))
    val inDeg = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).as("in_deg"))
    outDeg.join(inDeg, Seq("node"), "full")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Triangle counting via DEGREE-ORDERED ORIENTATION (the standard
    * distributed algorithm — Suri & Vassilvitskii 2011 "Counting
    * Triangles and the Curse of the Last Reducer"): canonicalize the
    * edge list (undirected, dedup'd, no self-loops), orient every edge
    * from its lower (degree, id) endpoint to the higher, build wedges
    * by self-joining oriented edges on their source, and close each
    * wedge against the oriented edge list. Orientation is the whole
    * trick: a vertex's ORIENTED out-degree is O(sqrt(m)) even when its
    * raw degree is huge, so the wedge join never explodes on hub
    * vertices — the "last reducer" a naive neighbor self-join dies on
    * at 100 TB.
    *
    * Every triangle is counted exactly once (its vertices have a unique
    * (degree, id) order). Returns one row:
    * (n_vertices, n_edges, n_triangles) — all exact integers, so the
    * result is trivially bit-portable. */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String)
      : DataFrame = {
    // canonical edges / degrees / oriented edges are each referenced by
    // SEVERAL downstream branches (degree joins, the wedge self-join,
    // the closing join, and the n_edges/n_vertices report aggregates).
    // Without lineage cuts the whole build subtree replicates per
    // branch — the r15 plan audit measured 575 operators / 264
    // Exchanges in the static plan, i.e. the edge build planned ~7x
    // (the same defect [[pageRank]] fixed in r6). One materialization
    // each, the [[kCore]] discipline.
    val und = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = withDeg.select(
      when(aLower, col("a")).otherwise(col("b")).as("u"),
      when(aLower, col("b")).otherwise(col("a")).as("v"),
      when(aLower, col("db")).otherwise(col("da")).as("dv"))
      .localCheckpoint()
    val e1 = oriented.select(col("u"), col("v").as("x"), col("dv").as("dx"))
    val e2 = oriented.select(col("u"), col("v").as("y"), col("dv").as("dy"))
    // wedge (x, y) ordered by the same (degree, id) key, so the closing
    // edge — if present — is oriented exactly x -> y
    val wedges = e1.join(e2, Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tris = wedges.join(
      oriented.select(col("u").as("x"), col("v").as("y")), Seq("x", "y"))
    tris.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(und.agg(count(lit(1)).as("n_edges"))))
      .crossJoin(broadcast(deg.agg(count(lit(1)).as("n_vertices"))))
      .select(col("n_vertices"), col("n_edges"), col("n_triangles"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007, "Near linear
    * time algorithm to detect community structures" — public): every
    * node starts labeled with its own id; each round it adopts the most
    * frequent label among its neighbors PLUS one self-vote, ties broken
    * by the smallest label. The self-vote is the determinism/stability
    * device: plain synchronous LPA oscillates on bipartite structures
    * (two nodes swapping labels forever), while a self-vote makes the
    * tie land on min(own, neighbor) and the labels flow monotonically
    * downward — every step is a pure function of the previous frame, so
    * the fixed-round unrolled oracle mirrors it exactly.
    *
    * Returns one row per community: `(community, n_members)` with
    * `community` the minimum surviving label.
    *
    * Scale shape: the undirected message list is materialized ONCE
    * (localCheckpoint) with duplicate edges collapsed; each round is
    * one labels-keyed join (O(V) frame moves, the edge frame reuses its
    * layout), one map-side-combined (v, label) count, and one struct-max
    * argmax — the same per-round O(V)-shuffle discipline as [[pageRank]].
    * Label lineage cuts every `checkpointEvery` rounds. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      rounds: Int, checkpointEvery: Int = 1): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
    val und = e.select(col("a").as("v"), col("b").as("nb"))
      .unionAll(e.select(col("b").as("v"), col("a").as("nb")))
      .localCheckpoint()
    var labels = und.select(col("v")).distinct()
      .withColumn("lbl", col("v"))
    for (i <- 1 to rounds) {
      val nbLabels = und.join(
        labels.select(col("v").as("nb"), col("lbl").as("nl")), Seq("nb"))
        .select(col("v"), col("nl"))
      val votes = nbLabels
        .unionAll(labels.select(col("v"), col("lbl").as("nl")))
        .groupBy(col("v"), col("nl")).agg(count(lit(1)).as("c"))
      labels = votes
        .groupBy(col("v"))
        .agg(max(struct(col("c"), (-col("nl")).as("mn"))).as("s"))
        .select(col("v"), (-col("s.mn")).as("lbl"))
      if (i % checkpointEvery == 0 && i < rounds)
        labels = labels.localCheckpoint()
    }
    labels.groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("n_members"))
  }

  /** k-core peeling (Seidman 1983, public): repeatedly delete vertices
    * of degree < k (with their edges) until only the k-core — the
    * maximal subgraph where every vertex keeps >= k neighbors —
    * remains. The graph-density screen of link-spam filtering and the
    * seed-selection step of crawl curation (a page cluster that
    * survives a high k is structurally dense, not accidentally
    * linked). Runs a FIXED `rounds` of synchronous peels (every
    * sub-threshold vertex in a round is removed together) so the
    * computation unrolls for the oracle; when a round removes nothing
    * the remaining rounds are structural no-ops, which is also the
    * convergence check — a k-core face should pick `rounds` past the
    * fixture's fixpoint (the spec drives a long path-graph cascade).
    *
    * Returns (node, core_deg): the surviving vertices with their
    * degree inside the surviving subgraph (all >= k iff converged).
    *
    * Scale shape: per round one map-side-combined degree aggregation
    * (explode to 2E (v) rows) + two semi-joins of the edge list
    * against the keep set — O(E) per round on a monotonically
    * SHRINKING edge list, the standard synchronous-peel trade (exact
    * coreness needs O(max-degeneracy) rounds; fixed `rounds` bounds
    * the job count, same contract as [[pageRank]]'s fixed
    * iterations). The canonical edge list is materialized once;
    * lineage is cut every `checkpointEvery` rounds, lazy in between
    * (the pageRank measurement: eager per-round checkpoints pay a
    * full job of fixed overhead each). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String, k: Int,
      rounds: Int, checkpointEvery: Int = 1): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    var e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    for (i <- 1 to rounds) {
      val keep = e.select(explode(array(col("a"), col("b"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("v"))
      e = e.join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
      if (i % checkpointEvery == 0 && i < rounds) e = e.localCheckpoint()
    }
    e.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("core_deg"))
  }
}
