package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus, all arithmetic in codegen'd higher-order
  * functions on doubles (cast once, up front).
  *
  * Scale path: LSH random-hyperplane bucketing — per-vector sign
  * signature (narrow map), candidates = bucket collisions, exact rerank
  * only inside buckets. At 100 TB the corpus never self-joins; shuffle
  * volume is one small signature row per vector.
  */
object SimSearch {

  /** Cast to double once; all downstream arithmetic is double (float
    * accumulation drifts and is not portable across engines). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right dot product — a native expression (tight JVM loop),
    * numerically identical to zip_with + aggregate but ~100x cheaper on
    * pairwise joins (see VectorExprs scaladoc). */
  def dot(a: Column, b: Column): Column =
    // DotProductD reads raw 8-byte slots — float arrays MUST be cast up
    // (no-op when already array<double>)
    graft.functions.VectorExprs.dot_product(
      a.cast("array<double>"), b.cast("array<double>"))

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** L2-normalize (zero vectors stay zero) — native single pass; the HOF
    * form re-evaluates the norm per element. */
  def normalize(v: Column): Column =
    graft.functions.VectorExprs.normalize_d(v.cast("array<double>"))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k: queries (small) are broadcast against the
    * corpus; per-query ranking is one window over the joined frame.
    * Deterministic tie-break on neighbor id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), normalize(toDouble(col(vecCol))).as("v"))
    val q = queries.select(col(idCol).as("query_id"), normalize(toDouble(col(vecCol))).as("qv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  /** Hard-negative mining for contrastive training: for each query
    * vector, the top-`k` most-similar corpus vectors carrying a
    * DIFFERENT label — the near-misses a contrastive/triplet loss
    * learns most from (same role as the in-batch-negatives upgrade in
    * dense-retrieval training). Plan shape matches [[bruteTopK]]: the
    * labeled probe set is broadcast (small by construction — you mine
    * negatives for a training batch, not the whole corpus), the corpus
    * scan stays narrow with a codegen'd dot per pair, and the only
    * shuffle is the per-query top-k window. Deterministic tie-break on
    * neighbor id. At 100 TB swap the corpus side for [[ivfTopK]]'s
    * probed lists; the contract (different-label filter + exact rerank)
    * is unchanged. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      col(labelCol).as("neighbor_label"),
      normalize(toDouble(col(vecCol))).as("v"))
    val q = queries.select(col(idCol).as("query_id"),
      col(labelCol).as("query_label"),
      normalize(toDouble(col(vecCol))).as("qv"))
    // the label inequality rides the broadcast join condition, so
    // same-label pairs are dropped before the dot product is evaluated
    val joined = c.join(broadcast(q),
        col("neighbor_label") =!= col("query_label"))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("query_label"),
        col("id").as("neighbor_id"), col("neighbor_label"),
        col("rank"), col("cosine"))
  }

  // ---- production parameter derivation (VERDICT r10 Next #1) ----

  /** FAISS's `max_points_per_centroid` convention: Lloyd training sees
    * at most this many vectors per centroid. Centroids are means —
    * their estimation error shrinks as 1/sqrt(sample) — so past a few
    * hundred points per centroid more training data buys cost, not
    * quality (the public FAISS default is exactly 256). */
  private[graft] val TrainPointsPerCentroid = 256

  /** Auto `nlist` = max(floor, round(sqrt(n))) — the standard IVF
    * production sizing (the FAISS guideline family nlist ∈ [sqrt(n),
    * 16·sqrt(n)]; SPANN sizes partitions the same way). sqrt balances
    * the two per-query scan terms — nlist centroid dots at assignment
    * vs n/nlist candidates per probed list, whose product is fixed at
    * n — and a FIXED nlist is wrong in both directions at scale: too
    * small and the within-cluster joins go quadratic (sum cluster² =
    * n²/nlist), too large and every vector pays an oversized
    * assignment scan. Floor 16 keeps tiny corpora on the historical
    * fixture parameterization. */
  private[graft] def autoNlist(n: Long, floor: Int = 16): Int =
    math.max(floor,
      math.round(math.sqrt(math.max(0L, n).toDouble)).toInt)

  /** Auto mega-cluster cap = 8× the expected cluster size, floor 1000
    * (the historical fixed default). The cap EXCLUDES an over-cap
    * cluster from within-cluster joins (the SemDeDup frequency-guard
    * contract) — correct for pathological skew, but a fixed 1000 at
    * 100× corpus scale sits below E[cluster] = n/nlist ≈ sqrt(n)
    * itself and would silently exclude EVERY cluster, degrading the
    * result toward empty. Scaling the cap with the expectation keeps
    * it a skew guard, never a corpus guard. */
  private[graft] def autoMaxCluster(n: Long, nlist: Int): Int = {
    val expect = math.max(1L, n / math.max(1, nlist))
    math.min(math.max(1000L, 8L * expect), Int.MaxValue.toLong).toInt
  }

  /** IVF-Flat ANN: partition the corpus into `nlist` inverted lists by
    * nearest centroid; queries scan only the `nprobe` closest lists and
    * rerank exactly. Centroids here are a deterministic id-sample of the
    * corpus itself, optionally refined with `lloydRounds` spherical
    * k-means iterations (each round: map-side assignment + one tiny
    * groupBy(nlist) — see [[lloydRefine]]). On isotropic data IVF recall
    * beats hyperplane LSH because candidate selection follows actual data
    * geometry instead of fixed random cuts: expected scan fraction =
    * nprobe/nlist.
    *
    * `nlist <= 0` (the default) auto-derives sqrt-sizing from one cheap
    * corpus count ([[autoNlist]]) and training runs on a bounded
    * deterministic sample ([[trainedCentroids]]), so the DEFAULTS
    * survive a 100× corpus without manual tuning — SCALE.md's 100×
    * measurement named the O(n·nlist) training assignment as the one
    * superlinear term under hand-scaled nlist.
    *
    * Plan shape at 100 TB: the centroid set is tiny (nlist rows),
    * collapsed to ONE broadcast row holding a sorted array of
    * (cent_id, cv) structs. List assignment is a pure narrow map — score
    * all centroids inside a single projection, sort the (dot, cent_id)
    * structs, keep the top slice — so there is NO Exchange between the
    * corpus scan and the probe join (round 1 used a row_number window
    * that shuffled corpus x nlist rows just to take an argmax). The probe
    * join is a broadcast hash join on list id; the only shuffle in the
    * whole plan is the final per-query top-k window, whose input Spark
    * caps map-side via WindowGroupLimit. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 0, nprobe: Int = 4,
      lloydRounds: Int = 0, meanRound: Int = -1): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    // count ONLY when auto-sizing needs it (ADVICE r11 #2: an explicit
    // nlist must not pay an eager full-count job); the training-sample
    // cut inside trainedCentroids probes with a bounded limit instead
    val n = if (nlist > 0) -1L else c.count()
    val nl = if (nlist > 0) nlist else autoNlist(n)
    val cents = trainedCentroids(c, nl, lloydRounds, meanRound, n)
    val assigned = assignLists(c, cents, 1)
      .select(col("id"), col("v"), col("list_id"))
    val q = queries.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val probes = assignLists(q, cents, nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("list_id"))
    val joined = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  /** IVF-PQ with RESIDUAL encoding — FAISS's `by_residual = true`
    * DEFAULT (Jégou et al. 2011 §IV.B "coarse quantizer and locally
    * defined product quantizer"): instead of PQ-encoding the vector
    * itself, encode its residual r = x - centroid(list(x)). Residuals
    * concentrate near the origin with most between-list variance
    * already explained by the coarse step, so the same m-byte budget
    * spends its codebook resolution on LOCAL detail — measurably
    * higher recall than the non-residual [[ivfPqTopK]] at identical
    * index bytes when the coarse quantizer is representative
    * (tools/ResidProbe: 0.45 vs 0.28 at m=4; the edge shrinks as the
    * byte budget grows and vanishes under a degenerate coarse sample —
    * both per Jégou et al. §IV.B, and the reason FAISS defaults to
    * residual). Search mirrors the encoding: for each probed list the query
    * forms its own residual q - c_list, and ADC runs between query
    * residual and code residual (valid because ||q - x||^2 =
    * ||(q - c) - r||^2 exactly).
    *
    * Scale shape identical to [[ivfPqTopK]]: centroids and the
    * (residual-trained) codebook are each ONE broadcast row; residual
    * formation is a codegen'd zip_with on the scan; the per-(query,
    * probed-list) residual table is queries x nprobe rows and
    * broadcasts. The only Exchange is the final top-k window.
    *
    * Determinism: residual subtraction is exact IEEE on
    * meanRound-free normalized inputs; codebook = residuals of the
    * `ksub` smallest ids; every argmax ties on ids; ADC terms sum as
    * DECIMAL(18,6). */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nlist: Int = 16,
      nprobe: Int = 4, m: Int = 8, ksub: Int = 16): DataFrame = {
    val dims = vecDims(corpus, vecCol, "ivfPqResidualTopK corpus")
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val c = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val cents = c.orderBy(col("id").asc).limit(nlist)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    // residual frame: every corpus vector minus its list's centroid
    val assigned = assignLists(c, cents, 1)
      .join(broadcast(cents.withColumnRenamed("cent_id", "list_id")),
        Seq("list_id"))
      .select(col("id"), col("list_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("r"))
    // codebook trained on a PSEUDO-RANDOM residual sample (the Knuth
    // permutation the LSH planes already mirror in SQL): FAISS trains
    // its residual codebook on residuals drawn across the whole
    // corpus, and the naive "ksub smallest ids" donor set degenerates
    // whenever ids correlate with content — on the clustered fixture
    // every smallest-id donor sits in ONE cluster, so the codebook
    // never sees the other clusters' residual geometry and residual
    // coding LOSES to direct coding. The permuted order is a
    // deterministic uniform sample; (permute(id), id) is total.
    val donors = assigned
      .orderBy(graft.functions.Hashing.permute(col("id"), 0).asc,
        col("id").asc)
      .limit(ksub)
      .select(col("id"), col("r").as("v"))
    val centArr = pqCentArr(donors, m, dsub, ksub)
    var coded = assigned.join(broadcast(centArr), lit(true))
    for (j <- 0 until m) {
      coded = coded
        .withColumn(s"__x$j", slice(col("r"), j * dsub + 1, dsub))
        .withColumn(s"__code$j", element_at(array_sort(
          transform(col(s"__carr$j"), cst => struct(
            (dot(col(s"__x$j"), cst.getField("cv")) -
              lit(0.5) * dot(cst.getField("cv"), cst.getField("cv"))).as("d"),
            cst.getField("code").as("cid"))),
          (l, r) =>
            when(l.getField("d") > r.getField("d"), -1)
              .when(l.getField("d") < r.getField("d"), 1)
              .when(l.getField("cid") < r.getField("cid"), -1)
              .when(l.getField("cid") > r.getField("cid"), 1)
              .otherwise(0)), 1).getField("cid"))
    }
    val codes = coded.select(col("id"), col("list_id"),
      array((0 until m).map(j => col(s"__code$j")): _*).as("codes"))
    // probe side: per probed list, the query's OWN residual vs that list
    val q = queries.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val probes = assignLists(q, cents, nprobe)
      .join(broadcast(cents.withColumnRenamed("cent_id", "list_id")),
        Seq("list_id"))
      .select(col("id").as("query_id"), col("list_id"),
        zip_with(col("v"), col("cv"), (a, b) => a - b).as("qr"))
    var out = codes.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(centArr), lit(true))
    for (j <- 0 until m) {
      val qx = col(s"__qx$j")
      val cv = col(s"__cv$j")
      out = out
        .withColumn(s"__qx$j", slice(col("qr"), j * dsub + 1, dsub))
        .withColumn(s"__cv$j", element_at(col(s"__carr$j"),
          element_at(col("codes"), j + 1).cast("int") + 1).getField("cv"))
        .withColumn(s"__t$j",
          (dot(qx, qx) - lit(2.0) * dot(qx, cv) + dot(cv, cv))
            .cast("decimal(18,6)"))
    }
    val adc = (0 until m).map(j => col(s"__t$j")).reduce(_ + _).cast("double")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("id").asc)
    out.withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("adc"))
  }

  /** Incremental IVF APPEND — the crawl-step form of inverted-list
    * indexing (FAISS's `add` against a TRAINED index; the quantizer is
    * frozen, exactly like [[graft.ext.Dedup]]'s incremental tiers
    * freeze the indexed corpus): centroids train on the INDEX side
    * only, the new `batch` is assigned map-side against the broadcast
    * centroid row, and the result is the per-list occupancy report —
    * (list_id, n_index, n_batch, n_total) — the index-health signal a
    * production system monitors after every add (list imbalance is
    * what degrades IVF probe cost).
    *
    * Scale shape: the batch NEVER joins the index — two narrow scans
    * (each: broadcast 1-row centroid array -> project -> argmax) and
    * two nlist-key aggregations; per-crawl-step cost is O(index scan +
    * batch scan), no pairwise work, and at a frozen quantizer the
    * index-side counts are incrementally maintainable (shipped here as
    * a recount for oracle-gateability). Empty lists report 0/0/0 —
    * they stay visible, since vanishing lists are exactly the
    * imbalance signal. Deterministic: [[trainedCentroids]]' id-sample
    * + the [[assignLists]] (dot desc, cent_id) argmax. */
  def ivfAppend(index: DataFrame, batch: DataFrame, idCol: String,
      vecCol: String, nlist: Int = 0, lloydRounds: Int = 0,
      meanRound: Int = -1): DataFrame = {
    val ci = index.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val n = if (nlist > 0) -1L else ci.count()
    val nl = if (nlist > 0) nlist else autoNlist(n)
    val cents = trainedCentroids(ci, nl, lloydRounds, meanRound, n)
    val cb = batch.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val ni = assignLists(ci, cents, 1)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n_index"))
    val nb = assignLists(cb, cents, 1)
      .groupBy(col("list_id")).agg(count(lit(1)).as("n_batch"))
    cents.select(col("cent_id").as("list_id"))
      .join(ni, Seq("list_id"), "left")
      .join(nb, Seq("list_id"), "left")
      .select(col("list_id"),
        coalesce(col("n_index"), lit(0L)).as("n_index"),
        coalesce(col("n_batch"), lit(0L)).as("n_batch"),
        (coalesce(col("n_index"), lit(0L))
          + coalesce(col("n_batch"), lit(0L))).as("n_total"))
  }

  /** Map-side list assignment: broadcast the centroid table as ONE row
    * holding a cent_id-sorted array of structs, score every centroid in a
    * projection, sort by (dot desc, cent_id asc), keep the top `keep`
    * list ids. Ranking semantics are identical to
    * `row_number over (order by dot desc, cent_id asc) <= keep`, but the
    * plan is scan -> broadcast NL join (1 row) -> project -> explode:
    * zero Exchange on the input side. */
  private[graft] def assignLists(df: DataFrame, cents: DataFrame,
      keep: Int): DataFrame = {
    val centArr = cents.agg(
      sort_array(collect_list(struct(col("cent_id"), col("cv")))).as("__carr"))
    val scored = df.join(broadcast(centArr), lit(true))
      .withColumn("__scored", transform(col("__carr"), cst =>
        struct(dot(col("v"), cst.getField("cv")).as("d"),
          cst.getField("cent_id").as("cid"))))
      // sort by (d desc, cid asc): comparator returns -1/1/0 as ints
      .withColumn("__top", slice(array_sort(col("__scored"), (l, r) =>
        when(l.getField("d") > r.getField("d"), -1)
          .when(l.getField("d") < r.getField("d"), 1)
          .when(l.getField("cid") < r.getField("cid"), -1)
          .when(l.getField("cid") > r.getField("cid"), 1)
          .otherwise(0)), 1, keep))
      .drop("__carr", "__scored")
    scored.select(df.columns.map(col) :+
      explode(col("__top")).as("__t"): _*)
      .withColumn("list_id", col("__t.cid"))
      .drop("__t")
  }

  /** Spherical k-means refinement: `rounds` Lloyd iterations over the
    * sampled centroids. Each round is (a) map-side assignment (no
    * shuffle), (b) one groupBy on nlist keys computing the per-dimension
    * mean as nlist x dims scalar aggregates (map-side combine; NO
    * posexplode of the corpus), (c) L2-renormalization of the means.
    * Empty lists keep their previous centroid. Centroid ids stay stable
    * across rounds so tie-breaks remain deterministic.
    *
    * `meanRound >= 0` rounds each mean component to that many decimals
    * BEFORE renormalization. This exists for cross-engine mirrorability:
    * a double mean is summation-order-dependent in its last ulps, and an
    * oracle re-deriving the same centroids in another engine could flip
    * an argmax assignment on that drift. Rounding to a grid ~1e9x
    * coarser than the drift makes both engines compute identical IEEE
    * centroid arrays (same trick as the oracle-mirrored hyperplanes);
    * centroid precision at 6-7 decimals is far beyond what recall
    * needs. */
  private[graft] def lloydRefine(c: DataFrame, cents0: DataFrame,
      rounds: Int, meanRound: Int = -1): DataFrame = {
    if (rounds <= 0) return cents0
    val dims = c.select(size(col("v"))).head().getInt(0)
    def meanCol(i: Int): Column = {
      // explicit sum/count (not avg) so the oracle can mirror the exact
      // arithmetic; identical result, and round() agrees across engines
      val m = sum(col("v")(i)) / count(lit(1))
      if (meanRound >= 0) round(m, meanRound) else m
    }
    var cents = cents0
    for (_ <- 1 to rounds) {
      val assigned = assignLists(c, cents, 1)
      val means = assigned.groupBy(col("list_id"))
        .agg(count(lit(1)).as("__n"),
          array((0 until dims).map(meanCol): _*).as("__mean"))
      cents = cents.join(means,
          cents("cent_id") === means("list_id"), "left")
        .select(col("cent_id"),
          when(col("__n").isNotNull, normalize(col("__mean")))
            .otherwise(col("cv")).as("cv"))
        // k-row frame, but the CHAIN behind it is one corpus scan per
        // round and every downstream reference (final assignment, the
        // broadcast stats join, the report join) re-plans the whole
        // chain without this cut — q_kmeans_fit's r15 static plan
        // carried 92 Exchanges, the training subtree planned 3x. One
        // tiny eager job per round caps plan depth at one round
        // (values frozen bit-identically; the [[Graph.pageRank]]
        // checkpointEvery discipline).
        .localCheckpoint(true)
    }
    cents
  }

  /** Full spherical k-means TRAINING over an embedding corpus — the
    * clustering step a curation pipeline runs before SemDeDup-style
    * semantic dedup, per-cluster sampling, or IVF index builds (the
    * single-round refinement inside [[ivfTopK]] is this operator with
    * `rounds = 1`). Deterministic end to end: centroids seed from the
    * `k` smallest-id vectors, each Lloyd round is [[lloydRefine]]'s
    * map-side argmax assignment + one k-key mean aggregation, and the
    * final report is per cluster: (cluster_id, n_vecs, inertia_r) where
    * inertia is the summed spherical distance 1 - cos(v, centroid) of
    * the cluster's members (the quantity Lloyd descends). Clusters that
    * end a round empty keep their previous centroid and report
    * n_vecs = 0 with NULL inertia.
    *
    * Scale shape: per round, the corpus is scanned once with a
    * broadcast 1-row centroid array (zero Exchange — [[assignLists]]),
    * and the only aggregation is k x dims scalar means (map-side
    * combined). Rounds are a driver-side loop over plan construction,
    * not data: nothing iterates per row, nothing is collected. At
    * 100 TB cost is rounds x (one corpus scan + one k-key shuffle) —
    * the FAISS training recipe, minus its sampling (add `.sample` on
    * the input if even that is too much).
    *
    * Determinism for the oracle: `meanRound >= 0` makes both engines
    * derive bit-identical centroids (see [[lloydRefine]]); each
    * member's distance term is rounded at 8 before the exact
    * DECIMAL(28,14) per-cluster sum, so inertia is order-free. */
  /** Deterministic training entry shared by [[ivfTopK]], [[kmeansFit]],
    * [[clusterSample]] and [[cappedClusterFrame]]: smallest-id seed
    * sample + `rounds` Lloyd iterations, trained on a BOUNDED
    * deterministic sample (VERDICT r10 Next #1 — the FAISS training
    * recipe WITH its sampling). Lloyd refinement sees at most
    * `trainPerCentroid`·k vectors — the smallest-id prefix, the same
    * convention as the seeds and the PQ codebooks, so any engine
    * re-derives the identical sample with one ORDER BY — which makes
    * training cost O(rounds·trainPerCentroid·k²) independent of corpus
    * size; only the caller's single final assignment pass remains
    * O(n·k). Below the cap the corpus frame is passed through UNTOUCHED
    * (not re-limited), so small-corpus results are bit-identical to the
    * pre-sampling rounds and the fixture oracles need no mirror change.
    * `n < 0` means "not yet counted": the cap check then probes with a
    * bounded `limit(cap+1).count()` — a CollectLimit that stops scanning
    * once cap+1 rows are seen — instead of a full corpus count, so
    * explicit-parameter callers never pay an O(n) job just to learn
    * whether sampling would bind (ADVICE r11 #2). */
  private[graft] def trainedCentroids(c: DataFrame, k: Int, rounds: Int,
      meanRound: Int, n: Long = -1L,
      trainPerCentroid: Int = TrainPointsPerCentroid): DataFrame = {
    val cap = trainPerCentroid.toLong * k
    val capI = math.min(cap, Int.MaxValue.toLong - 1).toInt
    val nn = if (n >= 0L) n else c.limit(capI + 1).count()
    val cents0 = c.orderBy(col("id").asc).limit(k)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    val train =
      if (nn > cap) c.orderBy(col("id").asc).limit(capI)
      else c
    lloydRefine(train, cents0, rounds, meanRound)
  }

  def kmeansFit(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, rounds: Int = 3, meanRound: Int = -1,
      trainPerCentroid: Int = TrainPointsPerCentroid): DataFrame = {
    val c = emb.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val cents = trainedCentroids(c, k, rounds, meanRound,
      trainPerCentroid = trainPerCentroid)
    val assigned = assignLists(c, cents, 1)
      .select(col("id"), col("v"), col("list_id"))
    // re-derive the member->centroid cosine via a broadcast join (the
    // identical IEEE dot the assignment argmax computed)
    val stats = assigned
      .join(broadcast(cents), assigned("list_id") === cents("cent_id"))
      .withColumn("term", round(lit(1.0) - dot(col("v"), col("cv")), 8))
      .groupBy(col("list_id"))
      .agg(count(lit(1)).as("n_vecs"),
        sum(col("term").cast("decimal(28,14)")).as("isum"))
    cents.join(stats, cents("cent_id") === stats("list_id"), "left")
      .select(col("cent_id").as("cluster_id"),
        coalesce(col("n_vecs"), lit(0L)).as("n_vecs"),
        round(col("isum").cast("double"), 6).as("inertia_r"))
  }

  /** Cluster-balanced ("diversity") selection — the DataComp-style draw
    * that samples the embedding space EVENLY instead of letting dense
    * regions dominate: train spherical k-means ([[trainedCentroids]],
    * same determinism contract as [[kmeansFit]]), then keep the
    * `perCluster` most-central members of every cluster (cosine to the
    * cluster centroid, ties on id). Most-central-first makes the draw a
    * prototype set; pair it with an outer id-ordered slice if you want
    * uniform-within-cluster instead.
    *
    * Scale shape: training as [[kmeansFit]]; selection is one broadcast
    * join (k centroid rows) + one per-cluster top-k window whose input
    * Spark bounds map-side via WindowGroupLimit — the same
    * plan-asserted shape as the stratified-quota sampler. Output is
    * k x perCluster rows regardless of corpus size. */
  def clusterSample(emb: DataFrame, idCol: String, vecCol: String,
      perCluster: Int = 8, k: Int = 16, rounds: Int = 3,
      meanRound: Int = -1): DataFrame = {
    require(perCluster > 0, s"perCluster must be positive: $perCluster")
    val c = emb.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val cents = trainedCentroids(c, k, rounds, meanRound)
    val scored = assignLists(c, cents, 1)
      .join(broadcast(cents), col("list_id") === col("cent_id"))
      .withColumn("cosine", dot(col("v"), col("cv")))
    val w = Window.partitionBy(col("list_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= perCluster)
      .select(col("list_id").as("cluster_id"), col("id"), col("rank"),
        col("cosine"))
  }

  /** k-NN graph over the embedding corpus — the adjacency structure
    * semantic-dedup clustering, label propagation over embeddings, and
    * graph-based coreset selection all start from. Exact all-pairs kNN
    * is O(n^2); the scalable approximation here is the IVF family's:
    * train spherical k-means ([[trainedCentroids]], same determinism
    * contract as [[kmeansFit]]), then rank neighbors only WITHIN each
    * vector's cluster (nprobe=1) — for each vector, its `kNbrs`
    * most-cosine-similar cluster-mates. Boundary vectors may miss a
    * cross-cluster true neighbor (the standard IVF recall trade; raise
    * `k` and sharpen clusters to tighten it — the spec measures recall
    * against brute-force).
    *
    * Scale shape: training as [[kmeansFit]]; the pair stage is a
    * self-join keyed on cluster id, so its volume is sum(cluster^2),
    * bounded by `maxCluster` (the same mega-cluster frequency guard as
    * SemDeDup — an over-cap cluster is EXCLUDED, never joined); at
    * 100 TB, nlist scales with the corpus so E[cluster] stays small
    * and the stage is linear. Per-vector top-k is a WindowGroupLimit-
    * bounded window — map-side truncated before the final rank.
    *
    * Determinism: ranking on the raw IEEE cosine (a single dot of
    * meanRound-stabilized unit vectors — same bits in any engine) with
    * id tiebreak; reported cosine rounded at 6. */
  /** The trained, capped (id, v, list_id) cluster frame shared by
    * [[knnGraph]] and [[graphBeamSearch]] — one source of truth for the
    * training chain and the mega-cluster cap so the two faces cannot
    * silently fork. `k <= 0` / `maxCluster <= 0` auto-derive from one
    * cheap corpus count ([[autoNlist]] / [[autoMaxCluster]]); training
    * runs on [[trainedCentroids]]' bounded sample either way. */
  private[graft] def cappedClusterFrame(emb: DataFrame, idCol: String,
      vecCol: String, k: Int, rounds: Int, meanRound: Int,
      maxCluster: Int): DataFrame = {
    val c = emb.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    // count ONLY when auto-sizing is requested (ADVICE r11 #2):
    // explicit k + maxCluster must not pay an eager full-count job
    val n = if (k > 0 && maxCluster > 0) -1L else c.count()
    val nl = if (k > 0) k else autoNlist(n)
    val mc = if (maxCluster > 0) maxCluster else autoMaxCluster(n, nl)
    val cents = trainedCentroids(c, nl, rounds, meanRound, n)
    assignLists(c, cents, 1)
      .select(col("id"), col("v"), col("list_id"))
      .withColumn("__cs",
        count(lit(1)).over(Window.partitionBy(col("list_id"))))
      .filter(col("__cs") <= mc).drop("__cs")
      // both consumers ([[withinClusterKnn]]'s a/b self-join sides,
      // [[graphBeamSearch]]'s edges + entry points) reference this
      // frame more than once — materialize the assignment pass once
      // (guide §8: write the fingerprint table, don't re-derive it
      // per consumer). The r15 static plan for q_knn_graph carried 96
      // Exchanges from exactly this duplication.
      .localCheckpoint(true)
  }

  /** Within-cluster kNN edges over a [[cappedClusterFrame]]. */
  private[graft] def withinClusterKnn(capped: DataFrame, kNbrs: Int)
      : DataFrame = {
    val a = capped.select(col("list_id"), col("id").as("src_id"),
      col("v").as("v_a"))
    val b = capped.select(col("list_id"), col("id").as("nbr_id"),
      col("v").as("v_b"))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("cosine").desc, col("nbr_id").asc)
    a.join(b, Seq("list_id"))
      .filter(col("src_id") =!= col("nbr_id"))
      .withColumn("cosine", dot(col("v_a"), col("v_b")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= kNbrs)
  }

  def knnGraph(emb: DataFrame, idCol: String, vecCol: String,
      kNbrs: Int = 5, k: Int = 0, rounds: Int = 3, meanRound: Int = -1,
      maxCluster: Int = 0): DataFrame = {
    require(kNbrs > 0, s"kNbrs must be positive: $kNbrs")
    val capped = cappedClusterFrame(emb, idCol, vecCol, k, rounds,
      meanRound, maxCluster)
    withinClusterKnn(capped, kNbrs)
      .select(col("src_id"), col("nbr_id"), col("rank"),
        round(col("cosine"), 6).as("cosine_r"))
  }

  /** Graph ANN: greedy BEAM SEARCH over the [[knnGraph]] neighborhood
    * graph (the navigable-small-world search core of HNSW /
    * Malkov-Yashunin NSW, public literature; VERDICT r9 Next #7) —
    * completes the modern ANN taxonomy beside the bucketed families
    * (LSH / IVF / PQ / IVF-PQ). The within-cluster kNN graph is 16
    * disconnected components by construction, so entry points are PER
    * CLUSTER (the min-id member of each capped cluster — the SPANN-style
    * partition-entry design): hop 0 ranks one doorway into every
    * component, the beam keeps the most promising, and navigation
    * proceeds within them. Deterministic by construction: fixed entry
    * points, a FIXED `hops` expansion count (the distributed-friendly,
    * oracle-mirrorable variant of HNSW's "stop when no improvement"),
    * and every ranking breaks ties (cosine DESC, id ASC).
    * `adaptiveStop = true` adds the latency-optimal HNSW termination —
    * stop as soon as a hop improves no query's top-k (one cheap
    * aggregate per hop; `hops` becomes the hard cap) — still
    * deterministic but data-dependent, so fixed mode remains the
    * oracle face. `nlist <= 0` / `maxCluster <= 0` auto-derive from
    * the corpus count ([[autoNlist]] / [[autoMaxCluster]]) so the
    * defaults survive corpus growth without manual tuning.
    *
    * Per hop: take the top-`beam` scored-but-NOT-YET-EXPANDED nodes per
    * query (best-first, HNSW's ef-search discipline), push them through
    * the graph edges, drop already-visited nodes (left_anti), score the
    * new candidates once, re-rank. After `hops` rounds the answer is
    * the top-k of everything visited, self excluded.
    *
    * Scale shape: the graph build is [[knnGraph]]'s capped
    * within-cluster join (never all-pairs); the search itself touches
    * per query at most nlist + hops*beam*kNbrs candidates — the beam
    * frame (queries x beam rows) BROADCASTS into the edge join, so the
    * big edge table never shuffles for the search, and each hop's
    * visited set is checkpointed (bounded: queries x visited-cap rows).
    * Graph + corpus frames are pinned for the loop and released after. */
  def graphBeamSearch(emb: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, beam: Int = 8, hops: Int = 3,
      kNbrs: Int = 5, nlist: Int = 0,
      rounds: Int = 3, meanRound: Int = -1, maxCluster: Int = 0,
      adaptiveStop: Boolean = false)
      : DataFrame =
    graphBeamSearchImpl(emb, queries, idCol, vecCol, k, beam, hops,
      kNbrs, nlist, rounds, meanRound, maxCluster, adaptiveStop)._1

  /** [[graphBeamSearch]] plus the hop count actually walked — the
    * probe/spec face for the adaptive-stop evidence (a DataFrame can't
    * carry "how many hops the loop ran"). */
  private[graft] def graphBeamSearchImpl(emb: DataFrame,
      queries: DataFrame, idCol: String,
      vecCol: String, k: Int, beam: Int, hops: Int,
      kNbrs: Int, nlist: Int,
      rounds: Int, meanRound: Int, maxCluster: Int,
      adaptiveStop: Boolean)
      : (DataFrame, Int) = {
    require(k >= 1, s"k must be >= 1: $k")
    require(beam >= k, s"beam must be >= k: $beam < $k")
    require(hops >= 0, s"hops must be >= 0: $hops")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // cappedClusterFrame is already materialized (localCheckpoint) —
    // no extra persist layer needed here
    val capped = cappedClusterFrame(emb, idCol, vecCol, nlist, rounds,
      meanRound, maxCluster)
    // SYMMETRIZED edges (undirected, like real NSW/HNSW graphs): a
    // directed kNN graph stalls greedy expansion in high dimensions —
    // nearby nodes' out-neighborhoods overlap on the same hubs, so the
    // frontier exhausts after ~2 hops (measured on the isotropic
    // fixture: recall plateaued at 0.12 regardless of beam/hops; the
    // reverse edges let the walk escape through high-in-degree hubs)
    val eDir = withinClusterKnn(capped, kNbrs)
      .select(col("src_id"), col("nbr_id"))
    val edges = eDir.union(
      eDir.select(col("nbr_id").as("src_id"), col("src_id").as("nbr_id")))
      .distinct()
      .persist(lvl)
    val v = emb.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v")).persist(lvl)
    val q = queries.select(col(idCol).as("query_id"),
      normalize(toDouble(col(vecCol))).as("qv"))
    // one doorway per graph component: the min-id member of each capped
    // cluster (nlist-bounded — broadcastable by construction). The
    // query itself, when it is a corpus member, stays IN the walk — it
    // is the perfect navigation node (cos 1.0; its edges lead straight
    // to true neighbors) and for min-id queries it IS its cluster's
    // doorway, so excluding it here would wall off the query's own
    // cluster entirely (measured: recall 0.14 -> 0.90 on the fixture).
    // Self is excluded only from the final answer.
    val eps = capped.groupBy(col("list_id"))
      .agg(min(col("id")).as("cand_id")).select(col("cand_id"))
    // (query_id, cand_id) -> + cos; candidate frames are beam-bounded,
    // so they broadcast into the corpus-vector lookup. The cosine is
    // rounded@8 BEFORE ranking (the kmeansFit discipline): the walk's
    // frontier cut amplifies a single last-ulp cross-engine divergence
    // into a different visited set (observed at sf0.001), and rounded
    // cosines re-enter every later hop's decisions
    def scored(cands: DataFrame): DataFrame =
      v.withColumnsRenamed(Map("id" -> "cand_id", "v" -> "cv"))
        .join(broadcast(cands), Seq("cand_id"))
        .join(broadcast(q), Seq("query_id"))
        .withColumn("cos", round(dot(col("qv"), col("cv")), 8))
        .select(col("query_id"), col("cand_id"), col("cos"))
    val W = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id").asc)
    def topB(vis: DataFrame): DataFrame =
      vis.withColumn("__rn", row_number().over(W))
        .filter(col("__rn") <= beam)
        .select(col("query_id"), col("cand_id"))
    // hop 0: every query scores the shared entry points
    var visited = scored(
      q.select(col("query_id")).crossJoin(broadcast(eps)))
      .localCheckpoint(true)
    // BEST-FIRST frontier (HNSW's ef-search discipline): each hop
    // expands the top-`beam` nodes NOT YET EXPANDED — re-expanding the
    // global top-beam stalls after ~2 hops because those are already
    // expanded and the anti-join yields nothing new (measured: the
    // frontier froze at ~30% coverage and recall plateaued regardless
    // of beam/hops until this was tracked)
    var expanded = visited.select(col("query_id"), col("cand_id"))
      .limit(0).localCheckpoint(true)
    // ADAPTIVE STOP (VERDICT r10 Next #4): terminate when a hop
    // improves no query's top-k — HNSW's "stop when the frontier can't
    // better the result list" termination, distributed-friendly because
    // the test is ONE global aggregate per hop over beam-bounded
    // frames: a hop's fresh candidates improve iff some query still
    // holds < k non-self answers or some fresh cos strictly beats that
    // query's current kth-best. Strict > is the improvement test in
    // cosine — an equal-cos candidate can still swap membership on the
    // id tie-break but cannot improve any distance, which is the
    // quantity the termination heuristic optimizes (standard HNSW
    // behavior; the walk stays deterministic either way). `hops` stays
    // the HARD cap; fixed mode (default) walks exactly `hops` and
    // remains the oracle-mirrored deterministic variant.
    var hopsWalked = 0
    var goOn = true
    while (hopsWalked < hops && goOn) {
      val frontier = topB(
        visited.join(expanded, Seq("query_id", "cand_id"), "left_anti"))
      val expand = broadcast(frontier)
        .join(edges, frontier("cand_id") === edges("src_id"))
        .select(col("query_id"), col("nbr_id").as("cand_id"))
        .distinct()
        .join(visited.select("query_id", "cand_id"),
          Seq("query_id", "cand_id"), "left_anti")
      expanded = expanded.union(frontier).localCheckpoint(true)
      if (adaptiveStop) {
        val fresh = scored(expand).localCheckpoint(true)
        val kth = visited.filter(col("cand_id") =!= col("query_id"))
          .withColumn("__rn", row_number().over(W))
          .filter(col("__rn") <= k)
          .groupBy(col("query_id"))
          .agg(min(col("cos")).as("__kth"), count(lit(1)).as("__cnt"))
        val improved = fresh.join(kth, Seq("query_id"), "left")
          .filter(col("__kth").isNull || col("__cnt") < k ||
            col("cos") > col("__kth"))
          .limit(1).count() > 0
        visited = visited.union(fresh).localCheckpoint(true)
        goOn = improved
      } else {
        visited = visited.union(scored(expand)).localCheckpoint(true)
      }
      hopsWalked += 1
    }
    edges.unpersist(false)
    v.unpersist(false)
    (visited.filter(col("cand_id") =!= col("query_id"))
      .withColumn("rank", row_number().over(W))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id").as("neighbor_id"),
        col("rank"), round(col("cos"), 6).as("cosine_r")),
      hopsWalked)
  }

  /** Greedy k-center selection (Gonzalez 1985 farthest-point traversal,
    * public; the 2-approximation for max-min coverage): start from the
    * smallest-id vector, then repeatedly pick the point FARTHEST (in
    * cosine distance) from every center chosen so far. Where
    * [[clusterSample]] draws evenly from density, k-center maximizes
    * COVERAGE — the outlier-inclusive prototype set used for data
    * pruning and eval-set seeding. Returns one row per selection
    * round: (rank, id, radius_r) where radius is the max over the
    * corpus of the min-distance to the first `rank` centers — the
    * coverage guarantee the selection has achieved so far
    * (non-increasing by construction; the spec asserts it).
    *
    * Scale shape: the corpus frame is pinned once; every round adds
    * one LITERAL center vector (a handful of doubles — no join, no
    * shuffle) to a running `least` column, and fetches exactly two
    * bounded scalars: the 1-row argmax (TakeOrderedAndProject) and the
    * max radius. k driver-fetches of one row each is the canonical
    * greedy loop; each round costs one scan. Runs k <= corpus rounds.
    *
    * Determinism: distances are IEEE dots of normalized vectors
    * (cross-engine-stable like every ANN face); argmax ties break on
    * id; radius rounded at 6 for the report. */
  def kCenterSelect(emb: DataFrame, idCol: String, vecCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val s = emb.sparkSession
    // the id is only carried, ordered, and collected — keep its native
    // type (a string doc id must not silently become a null long)
    val v = emb.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val idField = v.schema("id")
    val n = v.count()
    require(n > 0, "kCenterSelect on an empty corpus")
    val rounds = math.min(k.toLong, n).toInt
    val first = v.orderBy(col("id").asc).limit(1)
      .select(col("id"), col("v")).head()
    var picked = List((1, first.get(0)))
    var cur = v.withColumn("md",
      lit(1.0) - dot(col("v"), typedLit(first.getAs[Seq[Double]]("v"))))
    var radii = List.empty[Double]
    for (t <- 2 to rounds + 1) {
      radii = cur.agg(max(col("md"))).head().getDouble(0) :: radii
      if (t <= rounds) {
        val next = cur.orderBy(col("md").desc, col("id").asc).limit(1)
          .select(col("id"), col("v")).head()
        picked = (t, next.get(0)) :: picked
        cur = cur.withColumn("md", least(col("md"),
          lit(1.0) - dot(col("v"), typedLit(next.getAs[Seq[Double]]("v")))))
      }
    }
    v.unpersist(false)
    val out = picked.reverse.zip(radii.reverse).map { case ((rank, id), r) =>
      org.apache.spark.sql.Row(rank, id,
        BigDecimal(r).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    s.createDataFrame(s.sparkContext.parallelize(out, 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("rank",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        idField.copy(name = "id"),
        org.apache.spark.sql.types.StructField("radius_r",
          org.apache.spark.sql.types.DoubleType, nullable = true))))
  }

  /** Embedding drift report across corpus slices — the monitoring face
    * a pipeline runs when crawls/encoder versions land: per group, the
    * centroid of the NORMALIZED vectors, reported as
    * (n_vecs, centroid_norm, cos_global):
    *  - `centroid_norm` is the mean resultant length ||mean(unit
    *    vectors)|| in [0,1] — a standard directional-dispersion
    *    statistic (1 = all vectors aligned, ~0 = isotropic);
    *  - `cos_global` is the cosine between the group centroid and the
    *    whole-corpus centroid — a group drifting away from the corpus
    *    (new encoder, new domain, broken crawl) drops toward 0.
    *
    * Scale shape: one narrow explode to (grp, dim) keyed decimal sums
    * (map-side combined — the shuffle carries groups x d rows, not the
    * corpus), then joins over those tiny per-dim mean frames. Nothing
    * is collected; at 100 TB the cost is the scan.
    *
    * Determinism: per-dim means rounded at 8 re-enter the dot/norm
    * products; cross-dim sums are exact decimals; final cosine is one
    * IEEE divide, rounded at 6. */
  def embeddingDrift(emb: DataFrame, idCol: String, vecCol: String,
      groupCol: String): DataFrame =
    driftFromStats(driftStats(emb, vecCol, groupCol))

  /** The SUFFICIENT STATISTICS of [[embeddingDrift]]: per (group, dim),
    * the exact decimal component sum and the vector count. Split out so
    * a STREAMING monitor can maintain exactly these (one streaming
    * aggregation in complete mode — decimal sums are associative and
    * exact, so incremental maintenance is lossless) and hand them to
    * [[driftFromStats]] per trigger; the batch operator is the same two
    * steps fused. */
  def driftStats(emb: DataFrame, vecCol: String,
      groupCol: String): DataFrame =
    emb.select(col(groupCol).as("grp"),
        posexplode(normalize(toDouble(col(vecCol)))).as(Seq("p", "e")))
      .select(col("grp"), (col("p") + 1).as("j"), col("e"))
      .groupBy(col("grp"), col("j"))
      .agg(sum(col("e").cast("decimal(28,14)")).as("sm"),
        count(lit(1)).as("n"))

  /** Finisher over [[driftStats]] output: derives per-group means, the
    * global mean (sum-of-sums — exact, so identical to a direct global
    * aggregation), and the (n_vecs, centroid_norm_r, cos_global_r)
    * report. */
  def driftFromStats(stats: DataFrame): DataFrame = {
    val gm = stats.select(col("grp"), col("j"),
      round(col("sm").cast("double") / col("n"), 8).as("m"))
    // rename the key on the aggregate side: when `stats` is a sink/view
    // re-read, both sides would otherwise carry the SAME attribute ids
    // and the self-join fails resolution
    val glob = stats.groupBy(col("j"))
      .agg(round(sum(col("sm")).cast("double") / sum(col("n")), 8).as("g"))
      .select(col("j").as("__gj"), col("g"))
    val sums = gm.join(broadcast(glob), col("j") === col("__gj"))
      .drop("__gj")
      .groupBy(col("grp"))
      .agg(sum((col("m") * col("m")).cast("decimal(28,14)"))
          .cast("double").as("s_gg"),
        sum((col("m") * col("g")).cast("decimal(28,14)"))
          .cast("double").as("s_gl"),
        sum((col("g") * col("g")).cast("decimal(28,14)"))
          .cast("double").as("s_ll"))
    // every vector contributes one row per dim, so any dim's count is
    // the group's vector count
    val counts = stats.groupBy(col("grp")).agg(max(col("n")).as("n_vecs"))
    counts.join(sums, Seq("grp"))
      .select(col("grp"), col("n_vecs"),
        round(sqrt(col("s_gg")), 6).as("centroid_norm_r"),
        round(when(col("s_gg") > 0 && col("s_ll") > 0,
          col("s_gl") / (sqrt(col("s_gg")) * sqrt(col("s_ll"))))
          , 6).as("cos_global_r"))
  }

  /** Int8 scalar quantization (the compression step of a vector index —
    * the FAISS SQ8 scheme, public): per-dimension [min, max] over the
    * corpus; code = floor((x - min) / (max - min) * 255) clamped to
    * [0, 255]; constant dimensions code to 0. Codes are 4x smaller than
    * float32 and decode to the cell midpoint with error <= range/510
    * per dimension.
    *
    * Cross-engine bit-parity: inputs are float32 (exact in double),
    * per-dim min/max are exact order-free aggregates, and the code is a
    * single IEEE (sub, div, mul, floor) chain on those exact operands —
    * no summation order anywhere, so both engines produce identical
    * integer codes (same discipline as the mirrored LSH hyperplanes).
    *
    * Scale shape: the stats pass is ONE aggregate emitting 2 x dims
    * scalars (map-side combined, no explode — same pattern as
    * [[lloydRefine]]'s means); coding is a broadcast of that single
    * stats row + a narrow per-row transform. The corpus is never
    * shuffled. Adds `codes` (array<long>) and `recon_err2` (the summed
    * squared midpoint-decode error — diagnostic, float-fold). */
  def scalarQuantize(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val dims = vecDims(emb, vecCol, "scalarQuantize corpus")
    val stats = emb.agg(
      array((0 until dims).map(i =>
        min(element_at(col(vecCol), i + 1).cast("double"))): _*).as("__mns"),
      array((0 until dims).map(i =>
        max(element_at(col(vecCol), i + 1).cast("double"))): _*).as("__mxs"))
    def mn(i: Column) = get(col("__mns"), i)
    def mx(i: Column) = get(col("__mxs"), i)
    val err2 = aggregate(sequence(lit(0), lit(dims - 1)), lit(0.0),
      (acc, i) => {
        val x = get(col(vecCol), i).cast("double")
        val c = get(col("codes"), i).cast("double")
        val recon = when(mx(i) > mn(i),
          mn(i) + (c + 0.5) * (mx(i) - mn(i)) / 255.0).otherwise(mn(i))
        acc + (x - recon) * (x - recon)
      })
    emb.join(broadcast(stats), lit(true))
      .withColumn("codes", transform(col(vecCol), (x, i) =>
        when(mx(i) > mn(i),
          least(lit(255L), greatest(lit(0L),
            floor((x.cast("double") - mn(i)) / (mx(i) - mn(i)) * 255))))
          .otherwise(lit(0L))))
      .withColumn("recon_err2", err2)
      .drop("__mns", "__mxs")
  }

  /** BINARY (sign) quantization — the 1-bit compression face of the
    * quantization taxonomy (SQ8 / PQ / IVF-PQ / binary; the FAISS
    * binary-index family and the "binary embeddings" mode every vector
    * store ships): each dimension of the NORMALIZED vector collapses to
    * its sign bit, packed 32 bits per long word. 64 float dims become
    * 8 bytes — a 32x storage/scan reduction — and the angle between two
    * vectors is estimated by the Hamming distance of their codes
    * (E[hamming] = dims·θ/π, the Goemans-Williamson identity that also
    * powers SimHash).
    *
    * 32 bits per word, NOT 64: bit 63 of a signed long flips the sign,
    * and the oracle must rebuild identical codes in DuckDB where
    * `2^63` promotes to HUGEINT and `<<` wraps engine-specifically.
    * Packing 32 bits keeps every word in [0, 2^32) — representable,
    * portable, and xor/bit_count behave identically in both engines.
    * Sign convention: `>= 0` sets the bit (zero is a sign boundary —
    * any convention works as long as both engines share it). */
  def binaryQuantize(emb: DataFrame, idCol: String, vecCol: String)
      : DataFrame =
    binaryQuantizeWithDims(emb, idCol, vecCol,
      vecDims(emb, vecCol, "binaryQuantize corpus"))

  /** One-row dims probe with the require(...) discipline of the other
    * ANN entry points (ADVICE r11 #4): an empty frame fails with a
    * named message instead of head()'s NoSuchElementException, and
    * callers that need several quantize passes probe ONCE. */
  private[graft] def vecDims(df: DataFrame, vecCol: String,
      what: String): Int = {
    val probe = df.select(size(toDouble(col(vecCol)))).head(1)
    require(probe.nonEmpty, s"$what is empty: cannot derive dims")
    probe(0).getInt(0)
  }

  private[graft] def binaryQuantizeWithDims(emb: DataFrame, idCol: String,
      vecCol: String, dims: Int): DataFrame = {
    val v = normalize(toDouble(col(vecCol)))
    val words = (dims + 31) / 32
    val code = array((0 until words).map { w =>
      (0 until math.min(32, dims - w * 32)).map { i =>
        when(element_at(v, w * 32 + i + 1) >= 0, lit(1L << i))
          .otherwise(lit(0L))
      }.reduce(_ + _)
    }: _*)
    emb.select(col(idCol).as("id"), code.as("code"))
  }

  /** Hamming distance between two packed code arrays (same length). */
  private[graft] def hammingDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => bit_count(x.bitwiseXOR(y))),
      lit(0), (acc, d) => acc + d)

  /** ASYMMETRIC binary score: the query stays FLOAT, only the corpus
    * is 1-bit — est_cos(q, c) = dot(q, decode(code)) where decode maps
    * bit i to ±1/sqrt(d). Computable from the code words alone:
    * sum over dims of (bit set ? +q[i] : -q[i]) / sqrt(d) — same 8-byte
    * corpus scan as Hamming, but the candidate ordering uses the full
    * float precision of the query side (the FAISS asymmetric-distance
    * idea, PQ's ADC applied to 1-bit codes). Strictly more informative
    * than symmetric Hamming at identical storage. */
  private[graft] def asymBinaryScore(code: Column, qv: Column,
      dims: Int): Column = {
    val signed = aggregate(sequence(lit(0), lit(dims - 1)), lit(0.0),
      (acc, i) => {
        val word = element_at(code, (i / 32 + 1).cast("int"))
        // functions.shiftright only takes a LITERAL shift count; the
        // SQL builtin accepts a column, so go through call_function
        val bit = call_function("shiftright", word,
          (i % 32).cast("int")).bitwiseAND(lit(1L))
        acc + when(bit === 1L, element_at(qv, (i + 1).cast("int")))
          .otherwise(-element_at(qv, (i + 1).cast("int")))
      })
    signed / math.sqrt(dims.toDouble)
  }

  /** Binary-quantized ANN: Hamming scan over the packed codes selects
    * `rerank` candidates per query (hamming ASC, id ASC — fully
    * deterministic), then ONLY those candidates pay an exact cosine,
    * ranked (cosine DESC, id ASC) for the top `k`.
    *
    * `asymmetric = true` swaps the candidate score for
    * [[asymBinaryScore]] (float query x binary corpus, rounded@8
    * before ranking, DESC) — same 8-byte scan and storage, better
    * candidate ordering, so the same `rerank` budget buys more recall
    * (the spec measures the lift). The exact rerank is identical in
    * both modes.
    *
    * Scale shape — this face's win is COMPRESSION, not sub-linearity:
    * the candidate scan is still O(n) per query but touches
    * (id, dims/8 bytes) instead of (id, dims floats) — 32x less data,
    * xor+popcount per word in codegen — which is exactly how production
    * binary indexes are deployed (RAM-resident codes, float vectors
    * only for the rerank fetch). The plan broadcasts the (small) query
    * codes into the corpus code scan, caps the per-query candidate set
    * map-side via WindowGroupLimit, and broadcasts the
    * queries x rerank candidate frame into the float-vector lookup —
    * the corpus float table never shuffles and is only probed for
    * candidate ids. Compose with [[ivfTopK]]'s lists for a sub-linear
    * candidate scan when n demands it.
    *
    * Determinism for the oracle: codes are integer-exact
    * ([[binaryQuantize]]), Hamming is integer, and the exact rerank is
    * the same IEEE dot every ANN face ships. */
  def binaryTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, rerank: Int = 0,
      excludeSelf: Boolean = true, asymmetric: Boolean = false)
      : DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val rr = if (rerank > 0) rerank else 8 * k
    require(rr >= k, s"rerank must be >= k: $rr < $k")
    // ONE dims probe per side, with non-empty + matching-dims requires
    // (ADVICE r11 #4): previously corpus dims were probed here AND
    // inside each quantize call (2-3 eager jobs), an empty corpus threw
    // a bare NoSuchElementException, and a shorter asymmetric query
    // vector would have silently read nulls via element_at.
    val dims = vecDims(corpus, vecCol, "binaryTopK corpus")
    val qDims = vecDims(queries, vecCol, "binaryTopK queries")
    require(qDims == dims,
      s"query dims $qDims != corpus dims $dims")
    val cCodes = binaryQuantizeWithDims(corpus, idCol, vecCol, dims)
    val qSide =
      if (asymmetric)
        queries.select(col(idCol).as("query_id"),
          normalize(toDouble(col(vecCol))).as("__qv"))
      else binaryQuantizeWithDims(queries, idCol, vecCol, dims)
        .withColumnsRenamed(Map("id" -> "query_id", "code" -> "qcode"))
    val wH =
      if (asymmetric) Window.partitionBy(col("query_id"))
        .orderBy(col("est").desc, col("id").asc)
      else Window.partitionBy(col("query_id"))
        .orderBy(col("hamming").asc, col("id").asc)
    val scored = cCodes.join(broadcast(qSide),
      if (excludeSelf) col("id") =!= col("query_id") else lit(true))
    val cands = (if (asymmetric)
        // rounded@8 before the cut: the candidate frontier is the
        // decision that cascades (the graphBeamSearch discipline)
        scored.withColumn("est",
          round(asymBinaryScore(col("code"), col("__qv"), dims), 8))
          .withColumn("hamming", lit(null).cast("int"))
      else scored.withColumn("hamming",
        hammingDist(col("code"), col("qcode"))))
      .withColumn("__rh", row_number().over(wH))
      .filter(col("__rh") <= rr)
      .select(col("query_id"), col("id"), col("hamming"))
    val cv = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val qv = queries.select(col(idCol).as("query_id"),
      normalize(toDouble(col(vecCol))).as("qv"))
    val wC = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    cv.join(broadcast(cands), Seq("id"))
      .join(broadcast(qv), Seq("query_id"))
      .withColumn("cosine", dot(col("v"), col("qv")))
      .withColumn("rank", row_number().over(wC))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"),
        col("rank"), col("hamming"), round(col("cosine"), 6).as("cosine_r"))
  }

  /** Product quantization (the FAISS IVF-PQ compression scheme, public:
    * Jégou et al., "Product Quantization for Nearest Neighbor Search",
    * TPAMI 2011): split each vector into `m` contiguous subvectors and
    * code each against its own `ksub`-entry codebook — m bytes per
    * vector at ksub<=256 (32x smaller than float32 at dims=64/m=8).
    *
    * Codebooks here are the deterministic smallest-id corpus sample
    * (the [[ivfTopK]] convention), entries ranked 0..ksub-1 by id.
    * Assignment uses argmin ||x-c||^2 = argmax (x·c - ||c||^2/2) so the
    * only floating-point primitive is the left-to-right dot product both
    * engines already mirror bit-for-bit — no engine-internal distance
    * kernel whose summation order we can't see. Ties break to the
    * smallest code.
    *
    * Scale shape: identical to [[assignLists]] — the codebook collapses
    * to ONE broadcast row (m sorted struct arrays), coding is a pure
    * narrow map scoring ksub entries per subspace inside a projection;
    * the corpus is never shuffled. */
  /** One-row PQ codebook frame: for each subspace j, `__carr{j}` holds a
    * code-ascending array of (code, cv) structs — codebook entries are
    * the `ksub` smallest-id corpus vectors, ranked 0..ksub-1 by id. */
  private[graft] def pqCentArr(v: DataFrame, m: Int, dsub: Int,
      ksub: Int): DataFrame = {
    // ksub rows; the single-partition window is on 16 rows, not the corpus
    val w = Window.orderBy(col("id").asc)
    val cents = v.orderBy(col("id").asc).limit(ksub)
      .select((row_number().over(w) - 1).cast("long").as("code"), col("v"))
    val centAggs = (0 until m).map(j =>
      sort_array(collect_list(struct(col("code"),
        slice(col("v"), j * dsub + 1, dsub).as("cv")))).as(s"__carr$j"))
    cents.agg(centAggs.head, centAggs.tail: _*)
  }

  def productQuantize(emb: DataFrame, idCol: String, vecCol: String,
      m: Int = 8, ksub: Int = 16): DataFrame = {
    val dims = vecDims(emb, vecCol, "productQuantize corpus")
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val v = emb.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val centArr = pqCentArr(v, m, dsub, ksub)
    var out = v.join(broadcast(centArr), lit(true))
    for (j <- 0 until m) {
      out = out
        .withColumn(s"__x$j", slice(col("v"), j * dsub + 1, dsub))
        .withColumn(s"__code$j", element_at(array_sort(
          transform(col(s"__carr$j"), cst => struct(
            (dot(col(s"__x$j"), cst.getField("cv")) -
              lit(0.5) * dot(cst.getField("cv"), cst.getField("cv"))).as("d"),
            cst.getField("code").as("cid"))),
          (l, r) =>
            when(l.getField("d") > r.getField("d"), -1)
              .when(l.getField("d") < r.getField("d"), 1)
              .when(l.getField("cid") < r.getField("cid"), -1)
              .when(l.getField("cid") > r.getField("cid"), 1)
              .otherwise(0)), 1).getField("cid"))
    }
    out
      .withColumn("codes", array((0 until m).map(j => col(s"__code$j")): _*))
      .select(col("id"), col("codes"))
  }

  /** ADC (asymmetric distance computation) top-k over PQ codes — the
    * search half of [[productQuantize]]: the corpus is represented ONLY
    * by its m-byte codes; each query computes exact per-subspace
    * distances to the ksub codebook entries and a corpus row's distance
    * is the sum of its codes' table entries. Classic PQ trade: memory
    * and bandwidth drop 32x, distances become quantized approximations.
    *
    * Per-subspace terms are ||q_j - c||^2 expanded to dot products
    * (engine-mirrorable) and summed as DECIMAL(18,6) — exact and
    * order-free, so the reported distance is bit-stable across engines
    * and partitionings. Plan shape: codes scan x broadcast(queries) x
    * broadcast(codebook row), all narrow; the only shuffle is the final
    * per-query top-k window (WindowGroupLimit-capped). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 8, ksub: Int = 16): DataFrame = {
    val dims = vecDims(corpus, vecCol, "pqTopK corpus")
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val v = corpus.select(col(idCol).as("id"), toDouble(col(vecCol)).as("v"))
    val centArr = pqCentArr(v, m, dsub, ksub)
    val codes = productQuantize(corpus, idCol, vecCol, m, ksub)
    val q = queries.select(col(idCol).as("query_id"),
      toDouble(col(vecCol)).as("qv"))
    var out = codes
      .join(broadcast(q), col("id") =!= col("query_id"))
      .join(broadcast(centArr), lit(true))
    for (j <- 0 until m) {
      val qx = col(s"__qx$j")
      val cv = col(s"__cv$j")
      out = out
        .withColumn(s"__qx$j", slice(col("qv"), j * dsub + 1, dsub))
        .withColumn(s"__cv$j", element_at(col(s"__carr$j"),
          element_at(col("codes"), j + 1).cast("int") + 1).getField("cv"))
        .withColumn(s"__t$j",
          (dot(qx, qx) - lit(2.0) * dot(qx, cv) + dot(cv, cv))
            .cast("decimal(18,6)"))
    }
    val adc = (0 until m).map(j => col(s"__t$j")).reduce(_ + _).cast("double")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("id").asc)
    out.withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("adc"))
  }

  /** IVF-PQ ANN — the production index composition (the FAISS `IVFx,PQy`
    * scheme, public: Jégou et al. 2011 "Product Quantization for Nearest
    * Neighbor Search" §IV): a coarse IVF partition bounds the scan to
    * `nprobe/nlist` of the corpus, and inside the probed lists the
    * corpus is represented ONLY by its m-byte PQ codes, scored by ADC.
    * Vectors are L2-normalized first, so ADC's ||q-x||^2 ordering equals
    * the cosine ordering the flat faces use (codes are trained on the
    * normalized vectors, non-residual — FAISS `by_residual=false`).
    *
    * This composes [[ivfTopK]]'s coarse half with [[pqTopK]]'s scoring
    * half and keeps both scale invariants: centroids AND codebook are
    * each ONE broadcast row; coarse assignment and PQ encoding are
    * narrow maps on the corpus scan (the encoding runs inline on the
    * assigned frame — no self-join); the probe side broadcasts; the
    * only Exchange in the plan is the final per-query top-k window.
    * At 100 TB the scan carries m bytes + a list id per vector instead
    * of 4*dims bytes — the memory/bandwidth shape that makes
    * billion-vector ANN feasible on a cluster.
    *
    * Determinism for the oracle: coarse centroids = `nlist` smallest
    * ids, codebook = `ksub` smallest ids (both deterministic samples of
    * the normalized corpus), every argmax tie-breaks on the id, and ADC
    * terms sum as DECIMAL(18,6) — bit-stable across engines and
    * partitionings. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4,
      m: Int = 8, ksub: Int = 16): DataFrame = {
    val dims = vecDims(corpus, vecCol, "ivfPqTopK corpus")
    require(dims % m == 0, s"m=$m must divide dims=$dims")
    val dsub = dims / m
    val c = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val cents = c.orderBy(col("id").asc).limit(nlist)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    val assigned = assignLists(c, cents, 1)
      .select(col("id"), col("v"), col("list_id"))
    val centArr = pqCentArr(c, m, dsub, ksub)
    // PQ-encode inline on the assigned frame (argmax over dot(x,c) -
    // 0.5*||c||^2, the ||x||^2-free form of min ||x-c||^2 — identical
    // comparator to productQuantize)
    var coded = assigned.join(broadcast(centArr), lit(true))
    for (j <- 0 until m) {
      coded = coded
        .withColumn(s"__x$j", slice(col("v"), j * dsub + 1, dsub))
        .withColumn(s"__code$j", element_at(array_sort(
          transform(col(s"__carr$j"), cst => struct(
            (dot(col(s"__x$j"), cst.getField("cv")) -
              lit(0.5) * dot(cst.getField("cv"), cst.getField("cv"))).as("d"),
            cst.getField("code").as("cid"))),
          (l, r) =>
            when(l.getField("d") > r.getField("d"), -1)
              .when(l.getField("d") < r.getField("d"), 1)
              .when(l.getField("cid") < r.getField("cid"), -1)
              .when(l.getField("cid") > r.getField("cid"), 1)
              .otherwise(0)), 1).getField("cid"))
    }
    // the index frame: vectors DROPPED, m codes + a list id per row
    val codes = coded.select(col("id"), col("list_id"),
      array((0 until m).map(j => col(s"__code$j")): _*).as("codes"))
    val q = queries.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val probes = assignLists(q, cents, nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"), col("list_id"))
    var out = codes.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(centArr), lit(true))
    for (j <- 0 until m) {
      val qx = col(s"__qx$j")
      val cv = col(s"__cv$j")
      out = out
        .withColumn(s"__qx$j", slice(col("qv"), j * dsub + 1, dsub))
        .withColumn(s"__cv$j", element_at(col(s"__carr$j"),
          element_at(col("codes"), j + 1).cast("int") + 1).getField("cv"))
        .withColumn(s"__t$j",
          (dot(qx, qx) - lit(2.0) * dot(qx, cv) + dot(cv, cv))
            .cast("decimal(18,6)"))
    }
    val adc = (0 until m).map(j => col(s"__t$j")).reduce(_ + _).cast("double")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("id").asc)
    out.withColumn("adc", adc)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("adc"))
  }

  /** IVF-PQ search with an EXACT RE-RANK refine stage — the production
    * two-stage retrieval composition (FAISS's `IndexRefineFlat` over an
    * `IVFx,PQy` base; Jégou et al. 2011 §V evaluate exactly this
    * "re-ranking with source vectors" scheme): the compressed index
    * nominates a `shortlist`-deep ADC candidate set per query, then
    * only those candidates are re-scored against the FULL-precision
    * vectors and the final top-k ranks on exact cosine. The refine
    * stage repairs most of the PQ quantization error for the price of
    * `shortlist` exact dots per query instead of a corpus scan.
    *
    * Scale shape: the base search keeps [[ivfPqTopK]]'s invariants (one
    * broadcast codebook row, narrow encode, probe-side broadcast); the
    * refine stage joins the (queries × shortlist)-bounded candidate
    * frame INTO the corpus scan as a broadcast, so full-precision
    * vectors are read exactly once and never shuffle — at 100 TB the
    * refine reads are the random-access page the inverted index was
    * built to bound, and the only Exchange added is the final top-k
    * window over queries × shortlist rows.
    *
    * Determinism: the shortlist inherits the ADC decimal-sum + id
    * tie-break contract; the exact stage ranks on the raw IEEE cosine
    * of normalize()d vectors with id tie-break (the [[bruteTopK]]
    * convention, already oracle-hash-stable). */
  def ivfPqRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, shortlist: Int = 20, nlist: Int = 16,
      nprobe: Int = 4, m: Int = 8, ksub: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(shortlist >= k,
      s"shortlist must be >= k: $shortlist < $k (a shallower shortlist " +
        "than the answer depth makes the refine stage a no-op rename)")
    val cand = ivfPqTopK(corpus, queries, idCol, vecCol, shortlist,
      nlist, nprobe, m, ksub)
      .select(col("query_id"), col("neighbor_id"))
    val v = corpus.select(col(idCol).as("neighbor_id"),
      normalize(toDouble(col(vecCol))).as("cv"))
    val q = queries.select(col(idCol).as("query_id"),
      normalize(toDouble(col(vecCol))).as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    v.join(broadcast(cand), Seq("neighbor_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cosine", dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component for (plane p,
    * dimension d): a [-0.5, 0.5) grid value derived from the Knuth
    * permutation constants — reproducible with zero egress, no stored
    * model, and exactly mirrorable in oracle SQL as
    * `(<permuteA(p*dims+d) % 1000>/1000.0 - 0.5)` (identical IEEE
    * division in both engines). */
  private[graft] def planeComponent(p: Int, d: Int, dims: Int): Double =
    ((Hashing.permuteA(p * dims + d) % 1000L) / 1000.0) - 0.5

  /** DuckDB rendering of [[planeComponent]]: the SAME arithmetic emitted
    * as SQL (integer constant over the identical division), so both
    * engines compute the identical IEEE double. Kept adjacent to
    * planeComponent so the two formulas cannot drift apart. */
  private[graft] def planeComponentSql(p: Int, d: Int, dims: Int): String =
    s"(${Hashing.permuteA(p * dims + d) % 1000L}/1000.0 - 0.5)"

  private[graft] def planeArray(p: Int, dims: Int): Column =
    array((0 until dims).map(d => lit(planeComponent(p, d, dims))): _*)

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a
    * long. */
  def hyperplaneSignature(v: Column, dims: Int, planes: Int = 16): Column = {
    // one codegen'd dot per plane, summed flat — no HOF loop
    (0 until planes).map { p =>
      when(dot(planeArray(p, dims), v) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** Johnson-Lindenstrauss random projection to `outDims` dimensions
    * (Johnson & Lindenstrauss 1984; Achlioptas 2003 showed coarse
    * discrete projections suffice): each output component is the dot
    * of the input with one deterministic [[planeComponent]] grid plane
    * — zero stored model, zero egress, and exactly oracle-mirrorable
    * because both engines evaluate the identical IEEE arithmetic.
    * Pairwise distances are preserved up to the JL distortion bound in
    * expectation; the conventional sqrt(dims/outDims) calibration
    * factor is deliberately NOT applied (irrational — it would break
    * bit-mirroring; rankings and relative comparisons are
    * scale-invariant, callers needing calibrated distances multiply
    * externally).
    *
    * Scale shape: pure narrow map — outDims codegen'd dot products per
    * row, no shuffle, no model broadcast (planes are literals folded
    * into the generated code). The 4x-16x narrower output is what the
    * downstream ANN / clustering / dedup stages then shuffle instead
    * of the full vectors. */
  def randomProject(emb: DataFrame, idCol: String, vecCol: String,
      dims: Int, outDims: Int): DataFrame =
    emb.select(col(idCol).as("id"),
      array((0 until outDims).map(p =>
        dot(planeArray(p, dims), toDouble(col(vecCol)))): _*).as("proj"))

  /** ANN top-k: candidates share the hyperplane bucket or differ in at
    * most 2 bits (multi-probe), exact cosine rerank inside candidates.
    * Recall < 1 by construction: strong when true neighbors are close
    * (cos > 0.8, the near-dup regime), weak on isotropic random vectors
    * where the "nearest" neighbor sits at ~60-70 degrees — benchmark
    * against bruteTopK on a sample before trusting it on a new corpus.
    * Candidate fraction ~ (1 + p + p(p-1)/2) / 2^p of the corpus. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dims: Int, k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), dims, planes))
    val q = queries.select(col(idCol).as("query_id"),
      normalize(toDouble(col(vecCol))).as("qv"))
      .withColumn("qsig", hyperplaneSignature(col("qv"), dims, planes))
    // multi-probe: own bucket + all 1-bit and 2-bit flips
    val flips: Seq[Long] = flipMasks(planes)
    val probes = q.select(col("query_id"), col("qv"),
      explode(array_union(array(col("qsig")),
        array(flips.map(f => col("qsig").bitwiseXOR(lit(f))): _*))).as("sig"))
    val joined = c.join(broadcast(probes), Seq("sig"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  /** The 1-bit and 2-bit flip masks [[lshTopK]] probes exhaustively and
    * [[lshMultiProbeTopK]] ranks query-adaptively — shared so the
    * T=all case of the latter is the former's probe set by
    * construction. */
  private[graft] def flipMasks(planes: Int): Seq[Long] =
    (0 until planes).map(p => 1L << p) ++
      (for (p1 <- 0 until planes; p2 <- (p1 + 1) until planes)
        yield (1L << p1) | (1L << p2))

  /** Query-aware multi-probe LSH (Lv, Josephson, Wang, Charikar, Li —
    * VLDB 2007): instead of probing ALL 1+2-bit neighboring buckets
    * ([[lshTopK]] probes 1 + p + p(p-1)/2 of them — 79 at p=12), rank
    * each query's candidate perturbations by how likely they are to
    * hold true neighbors and probe only the best `tProbes`. The
    * likelihood proxy is the paper's score: flipping plane p costs the
    * squared margin m_p² where m_p = ⟨plane_p, q̂⟩ is the query's signed
    * distance to that boundary (a near-boundary bit is cheap to flip —
    * its other side holds points almost identical to the query); a
    * 2-bit flip costs m_p1² + m_p2². Lower score = more promising, so
    * the probe sequence is the T cheapest masks (score ASC, mask ASC —
    * the explicit tie-break makes the sequence total and
    * oracle-mirrorable).
    *
    * Exactness anchor: with tProbes >= flipMasks(planes).size the probe
    * set equals [[lshTopK]]'s and the output is bit-identical
    * (SimSearchSpec pins this); with tProbes = 0 only the query's own
    * bucket is probed. Recall is monotone in tProbes because the
    * candidate set only grows.
    *
    * Scale shape: the probe frame is |queries| × (tProbes + 1) rows of
    * (query vector, 8-byte signature) — BOUNDED BY T, not by p², which
    * is what makes high-plane codes (p = 20-32, sparser buckets) usable
    * at 100 TB: lshTopK's exhaustive set grows quadratically in p while
    * this stays at T + 1 probes per query. Margins are computed on the
    * query side only (p codegen'd dots per QUERY, never per corpus
    * row); the perturbation ranking is a window over |queries| × p(p+1)/2
    * tiny rows; the probe frame broadcasts into the corpus-side hash
    * join, so corpus vectors never shuffle — the corpus scan stays
    * partition-local exactly as in [[lshTopK]].
    *
    * Determinism: grid-literal hyperplanes ([[planeComponent]]), total
    * perturbation order (score ASC, mask ASC), total rerank order
    * (cosine DESC, id ASC) — the whole algorithm is oracle-checkable. */
  def lshMultiProbeTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, dims: Int, k: Int, planes: Int = 8,
      tProbes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), dims, planes))
    val q = queries.select(col(idCol).as("query_id"),
      normalize(toDouble(col(vecCol))).as("qv"))
      .withColumn("qsig", hyperplaneSignature(col("qv"), dims, planes))
    // score each candidate perturbation: m² per flipped plane, summed
    def margin(p: Int): Column = dot(planeArray(p, dims), col("qv"))
    val scored: Seq[Column] = flipMasks(planes).map { mask =>
      val score = (0 until planes).filter(p => (mask & (1L << p)) != 0L)
        .map(p => margin(p) * margin(p)).reduce(_ + _)
      struct(lit(mask).as("mask"), score.as("score"))
    }
    val pert = q.select(col("query_id"), col("qv"), col("qsig"),
      explode(array(scored: _*)).as("u"))
      .select(col("query_id"), col("qv"), col("qsig"),
        col("u.mask").as("mask"), col("u.score").as("score"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("score").asc, col("mask").asc)
    val topPerts = pert.withColumn("rn", row_number().over(wp))
      .filter(col("rn") <= tProbes)
      .select(col("query_id"), col("qv"),
        col("qsig").bitwiseXOR(col("mask")).as("sig"))
    // the query's own bucket is always probe 0
    val probes = topPerts.unionByName(
      q.select(col("query_id"), col("qv"), col("qsig").as("sig")))
    val joined = c.join(broadcast(probes), Seq("sig"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  /** Reciprocal-rank fusion of per-query rankings — the standard hybrid
    * retrieval combiner (Cormack/Clarke/Buettcher 2009): each input
    * frame is a (query_id, doc_id, rank) ranked list; a doc's fused
    * score is sum over the lists containing it of 1/(k + rank), and the
    * output keeps the top `topK` per query with an (rrf desc, doc_id
    * asc) tie-break — two docs ranked r by DIFFERENT single lists tie
    * exactly, so the break must be explicit. Contributions are summed as
    * DECIMAL(18,6), making the fused ranking order-insensitive and
    * engine-exact regardless of list count.
    *
    * Scale shape: inputs are already top-k'd per query, so the union is
    * |queries| * k * lists rows — tiny relative to the corpora the
    * rankers scanned; one groupBy + one per-query window, both keyed on
    * query_id. */
  /** Matryoshka truncation agreement (Kusupati et al. 2022, public —
    * MRL embeddings): how much of the FULL-dimension top-k survives
    * when vectors are truncated to their prefix `dPrimes` dims and
    * renormalized — the measurement that decides whether adaptive
    * retrieval (coarse search at d', exact rerank at d) is safe for a
    * given embedding column, and at which d'. One row per
    * (d_prime, query): the overlap count and ratio vs the full top-k.
    *
    * Plan shape: one [[bruteTopK]] per dimension point over the SAME
    * broadcast-queries/narrow-scan plan (the truncation is a `slice`
    * in the projection — column pruning keeps the scan identical), and
    * the agreement join is (queries x k)-bounded. At 100 TB swap the
    * brute stages for an ANN face; the agreement contract is unchanged.
    * Deterministic: every ranking is the shared (cosine DESC, id ASC)
    * and the overlap is an integer. */
  def matryoshkaAgreement(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int = 5,
      dPrimes: Seq[Int] = Seq(8, 16, 32)): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    require(dPrimes.nonEmpty, "need at least one truncation point")
    val full = bruteTopK(corpus, queries, idCol, vecCol, k)
      .select(col("query_id"), col("neighbor_id"))
      .localCheckpoint(true)
    val qids = queries.select(col(idCol).as("query_id"))
    val parts = dPrimes.map { d =>
      def trunc(df: DataFrame): DataFrame =
        df.select(col(idCol),
          slice(toDouble(col(vecCol)), 1, d).as("__tv"))
      val t = bruteTopK(trunc(corpus), trunc(queries), idCol, "__tv", k)
        .select(col("query_id"), col("neighbor_id"))
      val counts = t.join(full, Seq("query_id", "neighbor_id"))
        .groupBy(col("query_id"))
        .agg(count(lit(1)).cast("int").as("__n"))
      qids.join(counts, Seq("query_id"), "left")
        .select(lit(d).as("d_prime"), col("query_id"),
          coalesce(col("__n"), lit(0)).as("n_overlap"))
    }
    parts.reduce(_ unionByName _)
      .withColumn("agreement_r",
        round(col("n_overlap").cast("double") / k, 4))
  }

  /** MMR diversity rerank (Carbonell & Goldstein 1998, public — the
    * standard redundancy-aware selection a retrieval or curation stack
    * runs AFTER an ANN/top-k stage): greedily pick, per query, the
    * candidate maximizing `lambda·rel(q,c) − (1−lambda)·max sim(c, p)`
    * over already-picked p. Pure relevance re-surfaces near-duplicates;
    * MMR trades a controllable slice of relevance for coverage — the
    * same reason a training-data sampler diversifies before it
    * saturates a cluster.
    *
    * Plan shape: ONE corpus pass builds the per-query candidate pool
    * (exact top-`poolSize` cosine — [[bruteTopK]]'s broadcast shape;
    * swap in any ANN face's candidates upstream at scale), then the
    * greedy loop runs over BOUNDED frames only: pool-pair sims are
    * queries × poolSize² rows computed once and pinned, and each of
    * the `k` rounds is (anti-join picked) → (max-sim agg against the
    * picked set) → (per-query argmax). Rounds are driver-side plan
    * construction over localCheckpoint-bounded frames, never a corpus
    * scan — the kCenterSelect/graphBeamSearch loop discipline.
    *
    * Determinism: rel and sims are the IEEE dots every ANN face ships,
    * the MMR score is rounded@8 BEFORE ranking (the frontier-cut
    * discipline — a last-ulp divergence would fork the greedy pick and
    * every later round), and all ranks tie-break on id ASC. */
  def mmrRerank(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5, poolSize: Int = 20,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && poolSize >= k,
      s"need poolSize >= k >= 1: k=$k pool=$poolSize")
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]: $lambda")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    // exact top-pool candidates with relevance (excludes self)
    val pool = bruteTopK(corpus, queries, idCol, vecCol, poolSize)
      .select(col("query_id"), col("neighbor_id").as("id"),
        col("cosine").as("rel"))
      .localCheckpoint(true)
    // pool-pair sims, computed once: queries x poolSize^2 bounded rows
    val v = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    val pv = v.join(broadcast(pool.select(col("query_id"), col("id"))),
      Seq("id")).persist(lvl)
    val sims = pv.withColumnsRenamed(Map("id" -> "id_a", "v" -> "v_a"))
      .join(pv.withColumnsRenamed(Map("id" -> "id_b", "v" -> "v_b")),
        Seq("query_id"))
      .filter(col("id_a") =!= col("id_b"))
      .select(col("query_id"), col("id_a"), col("id_b"),
        dot(col("v_a"), col("v_b")).as("sim"))
      .localCheckpoint(true)
    pv.unpersist(false)
    val W = Window.partitionBy(col("query_id"))
      .orderBy(col("mmr").desc, col("id").asc)
    // round 1: no picked set, the argmax is pure relevance
    var picked = pool
      .withColumn("mmr", round(lit(lambda) * col("rel"), 8))
      .withColumn("__rn", row_number().over(W))
      .filter(col("__rn") === 1)
      .select(col("query_id"), col("id"), lit(1).as("rank"))
      .localCheckpoint(true)
    for (t <- 2 to k) {
      val maxSim = sims
        .join(picked.select(col("query_id"), col("id").as("id_b")),
          Seq("query_id", "id_b"))
        .groupBy(col("query_id"), col("id_a").as("id"))
        .agg(max(col("sim")).as("max_sim"))
      val cand = pool
        .join(picked.select(col("query_id"), col("id")),
          Seq("query_id", "id"), "left_anti")
        .join(maxSim, Seq("query_id", "id"), "left")
        .withColumn("mmr", round(
          lit(lambda) * col("rel") -
            lit(1.0 - lambda) * coalesce(col("max_sim"), lit(0.0)), 8))
      val best = cand.withColumn("__rn", row_number().over(W))
        .filter(col("__rn") === 1)
        .select(col("query_id"), col("id"), lit(t).as("rank"))
      picked = picked.union(best).localCheckpoint(true)
    }
    picked
      .join(pool, Seq("query_id", "id"))
      .select(col("query_id"), col("id").as("doc_id"), col("rank"),
        round(col("rel"), 6).as("rel_r"))
  }

  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60, topK: Int = 10)
      : DataFrame = {
    require(rankings.nonEmpty, "rrfFuse needs at least one ranking")
    val u = rankings
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = u.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_lists"),
        sum((lit(1.0) / (lit(k) + col("rank")))
          .cast("decimal(18,6)")).as("__r"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__r").desc, col("doc_id").asc)
    fused.withColumn("rrf_rank", row_number().over(w))
      .filter(col("rrf_rank") <= topK)
      .select(col("query_id"), col("doc_id"), col("n_lists"),
        col("__r").cast("double").as("rrf"),
        col("rrf_rank").cast("int").as("rrf_rank"))
  }
}
