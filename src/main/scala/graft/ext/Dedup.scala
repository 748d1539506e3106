package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Near-duplicate detection for training-data pipelines.
  *
  * Scale shape (the part that matters at 100 TB):
  *  - exact dedup: one hash-shuffle on the fingerprint, min-id winner —
  *    never groupBy full text; group keys are 16-byte digests.
  *  - MinHash+LSH: per-doc signature (narrow map) -> explode to b band
  *    keys -> self-join per band bucket. Shuffle volume is b rows/doc of
  *    ~24 bytes, not the corpus. Hot buckets are frequency-capped so one
  *    boilerplate cluster cannot produce an O(n^2) bucket.
  *  - candidate verification: exact Jaccard only on LSH candidates (tiny
  *    fraction), via shingle-set intersection on hashes, not strings.
  */
object Dedup {

  /** Character shingles (k-grams) of the normalized text. Pass a
    * MATERIALIZED column to [[charShinglesOfNormalized]] in pipelines —
    * this convenience form inlines the normalization, which higher-order
    * lambdas would otherwise re-evaluate per element. */
  def charShingles(text: Column, k: Int = 5): Column =
    charShinglesOfNormalized(TextStats.normalized(text), k)

  def charShinglesOfNormalized(norm: Column, k: Int): Column =
    when(length(norm) >= k,
      array_distinct(transform(sequence(lit(1), length(norm) - k + 1),
        i => norm.substr(i, lit(k)))))
      .otherwise(array(norm))

  /** Word n-gram shingles of the normalized text. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val toks = TextStats.tokens(TextStats.normalized(text))
    when(size(toks) >= n,
      array_distinct(transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** 60-bit hashes of the shingle set (dedup works on hashes from here
    * on — strings never shuffle). */
  def shingleHashes(text: Column, n: Int = 3): Column =
    transform(wordShingles(text, n), s => Hashing.hash64(s))

  /** (id, h) frame with each pipeline stage materialized as its own
    * column. CRITICAL for performance: nested higher-order-function
    * lambdas re-evaluate argument subtrees per element when inlined into
    * one expression (tokenization would run once per shingle, making the
    * pipeline quadratic); staged columns make each an attribute read. */
  private[graft] def hashedShingleFrame(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs.select(col(idCol).as("id"),
        TextStats.tokens(TextStats.normalized(col(textCol))).as("__toks"))
      .withColumn("__shingles",
        when(size(col("__toks")) >= n,
          array_distinct(transform(sequence(lit(0), size(col("__toks")) - n),
            i => concat_ws(" ", slice(col("__toks"), i + 1, lit(n))))))
          .otherwise(array(concat_ws(" ", col("__toks")))))
      .select(col("id"), transform(col("__shingles"),
        s => Hashing.hash64(s)).as("h"))

  /** MinHash signature: k permutation-mins over ONE base hash per shingle
    * (universal hashing — k linear transforms, not k digests). */
  def minhashSignature(shingleHashes: Column, k: Int = 16): Column = {
    val perms = array((0 until k).map(i => struct(
      lit(Hashing.permuteA(i)).as("a"), lit(Hashing.permuteB(i)).as("b"))): _*)
    transform(perms, p =>
      array_min(transform(shingleHashes, h =>
        (p.getField("a") * (h % Hashing.P) + p.getField("b")) % Hashing.P)))
  }

  /** LSH band keys: signature split into `bands` groups of `rowsPerBand`,
    * each group digested to one band key. Docs sharing any band key are
    * candidates. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(b.as("band"),
        Hashing.hash64(concat_ws(",",
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)))).as("key")))

  /** Candidate pairs from LSH banding over a corpus.
    * @param maxBucket drop buckets larger than this (boilerplate guard —
    *   a 10k-doc bucket is 50M pairs; cap keeps the join linear). */
  def lshCandidates(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      maxBucket: Int = 64): DataFrame =
    lshCandidatesFromHashes(
      hashedShingleFrame(docs, idCol, textCol, shingleN), k, bands, maxBucket)

  /** ONE source of truth for the hot-bucket guard + in-bucket pairing:
    * from an (id, band, key) frame, drop buckets larger than `maxBucket`
    * (window count on (band, key) — boilerplate clusters must not
    * produce an O(bucket^2) join) and return the distinct candidate
    * pairs (id_a < id_b). Every banded dedup path (MinHash word/char,
    * SimHash, embedding LSH) routes through here, and every caller's
    * oracle SQL mirrors exactly this capped-CTE shape — a hand-edited
    * copy of the cap semantics would silently split operator behavior. */
  private[graft] def cappedBandCandidates(banded: DataFrame,
      maxBucket: Int): DataFrame = {
    val capped = banded.withColumn("bucket_size",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("band"), col("key"))))
      .filter(col("bucket_size") <= maxBucket)
    val a = capped.select(col("band"), col("key"), col("id").as("id_a"))
    val b = capped.select(col("band"), col("key"), col("id").as("id_b"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
  }

  private[graft] def lshCandidatesFromHashes(hashed: DataFrame, k: Int,
      bands: Int, maxBucket: Int): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be a multiple of bands=$bands " +
        "(trailing signature values would be silently ignored, weakening recall)")
    val rowsPerBand = k / bands
    val sig = hashed.select(col("id"),
      graft.functions.VectorExprs.minhash_sig(col("h"), k).as("sig"))
    // index-explode with sig as a PASS-THROUGH attribute (round 8, the
    // explodedShingleHashes pattern): explode(bandKeys(sig-expr)) lets
    // the optimizer fold the minhash_sig tree into the banding lambda,
    // re-evaluating the whole signature per band. Exploding the band
    // index instead keeps sig an attribute computed once per row below
    // the Generate; the key is assembled per exploded row from it.
    val exploded = sig
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1), lit(1))).as("band"))
      .select(col("id"), col("band"),
        Hashing.hash64(concat_ws(",",
          slice(col("sig"), col("band") * rowsPerBand + 1,
            lit(rowsPerBand)))).as("key"))
    cappedBandCandidates(exploded, maxBucket)
  }

  /** Exact Jaccard over shingle-hash sets for a pair frame that carries
    * `h_a` and `h_b` (arrays of hashes). */
  def jaccard(hA: Column, hB: Column): Column = {
    val inter = size(array_intersect(hA, hB))
    val uni = size(array_union(hA, hB))
    when(uni > 0, inter.cast("double") / uni).otherwise(lit(0.0))
  }

  /** LSH candidates verified with exact Jaccard >= threshold. */
  def nearDuplicates(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleN: Int = 3, k: Int = 16,
      bands: Int = 4, maxBucket: Int = 64): DataFrame =
    nearDuplicatesFromHashes(
      hashedShingleFrame(docs, idCol, textCol, shingleN),
      threshold, k, bands, maxBucket)

  /** Duplicate-flow attribution: the near-dup pair stream rolled up to
    * a (group_a, group_b, n_pairs) matrix over a grouping column
    * (source, domain, crawl snapshot) — "which sources copy from
    * which". The diagonal is within-source duplication (template spam);
    * off-diagonal mass is cross-source syndication, the thing a
    * source-level dedup priority list is built from.
    *
    * Scale shape: the pair stream is already banding-capped
    * ([[nearDuplicates]]); the two labeling joins are id-keyed against
    * the (id, group) projection — text never rides along — and the
    * final agg is map-side combined on a groups² -bounded key. */
  def dupAttribution(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String, threshold: Double = 0.5, shingleN: Int = 3,
      k: Int = 16, bands: Int = 4, maxBucket: Int = 64): DataFrame = {
    val pairs = nearDuplicates(docs, idCol, textCol, threshold, shingleN,
      k, bands, maxBucket)
    val g = docs.select(col(idCol), col(groupCol))
    pairs
      .join(g.select(col(idCol).as("id_a"), col(groupCol).as("__ga")),
        Seq("id_a"))
      .join(g.select(col(idCol).as("id_b"), col(groupCol).as("__gb")),
        Seq("id_b"))
      .groupBy(least(col("__ga"), col("__gb")).as("source_a"),
        greatest(col("__ga"), col("__gb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Character-shingle variant (robust to tokenization differences in
    * Latin-script text: punctuation, concatenation, casing).
    *
    * CAUTION: [[TextStats.normalized]] keeps only `[a-z0-9 ]`, so
    * non-Latin (CJK etc.) text normalizes to "" — such documents are
    * EXCLUDED here rather than allowed to collapse onto the
    * empty-string shingle and report every CJK pair as a duplicate.
    * A non-Latin corpus needs a script-appropriate normalizer. */
  def nearDuplicatesChar(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleK: Int = 5, k: Int = 16,
      bands: Int = 4, maxBucket: Int = 64): DataFrame = {
    val hashed = docs
      .select(col(idCol).as("id"),
        TextStats.normalized(col(textCol)).as("__norm"))
      .filter(length(col("__norm")) > 0)
      // native one-pass windowing+hashing (spec-checked equal to
      // transform+array_distinct+hash64)
      .select(col("id"), graft.functions.VectorExprs
        .char_shingle_hashes(col("__norm"), shingleK).as("h"))
    nearDuplicatesFromHashes(hashed, threshold, k, bands, maxBucket)
  }

  /** NOTE on caching: each dedup path pins its hashed/fingerprint frame
    * because it is consumed three times (banding + both verify joins) and
    * costs ~MBs per million docs. Round 2 left that pin alive until
    * `clearCache()`/session end — every call leaked a catalog cache entry
    * (ADVICE r2). Now the (small: verified pairs only) RESULT is eagerly
    * materialized via `localCheckpoint` — cutting its lineage off the
    * pinned input — and the input pin is released before returning. The
    * checkpoint blocks themselves are freed by Spark's ContextCleaner
    * once the returned frame is unreferenced, so repeated calls no longer
    * accumulate pinned state. The result stays composable (the corpus
    * pipeline chains it) — it is just no longer lazy, which these
    * whole-corpus operators never usefully were. */
  private def materializeAndRelease(pinned: DataFrame, out: DataFrame)
      : DataFrame = {
    val result = out.localCheckpoint(true)
    pinned.unpersist(false)
    result
  }

  /** ONE source of truth for exact-Jaccard verification of an
    * (id_a, id_b) candidate frame against the pinned (id, h) shingle
    * frame — shared by the LSH and prefix-filter paths so the pair
    * semantics (null/empty handling, threshold inclusivity, release
    * protocol) cannot fork. */
  private def verifyCandidates(hashed: DataFrame, cands: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(hashed.withColumnsRenamed(Map("id" -> "id_a", "h" -> "h_a")), Seq("id_a"))
      .join(hashed.withColumnsRenamed(Map("id" -> "id_b", "h" -> "h_b")), Seq("id_b"))
      .withColumn("jaccard", jaccard(col("h_a"), col("h_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))

  /** Per-shingle document frequency via groupBy + join back: the
    * aggregate side is map-side combined (tiny), and the join back is
    * AQE-skew-splittable — a boilerplate shingle in millions of docs
    * does not funnel into one window task. MEASURED trade (10x neardup
    * fixture, sf0.1 base): this formulation cut jaccardPairsPrefix
    * 91s -> 57s, but REGRESSED the capped jaccardPairs 17s -> 128s —
    * there the `count().over(partitionBy(hash))` window's output feeds
    * both sides of the pair self-join, so Catalyst reuses ONE exchange
    * three times, which the agg+join shape breaks up. Each path keeps
    * the shape that measured faster; if a real corpus ever shows the
    * capped path's window straggling on a mega-shingle, swap it to
    * this helper and re-measure. */
  private def withDocFreq(postings: DataFrame): DataFrame =
    postings.join(
      postings.groupBy(col("hash")).agg(count(lit(1)).as("df")), Seq("hash"))

  private def nearDuplicatesFromHashes(hashedIn: DataFrame, threshold: Double,
      k: Int, bands: Int, maxBucket: Int): DataFrame = {
    val hashed = hashedIn.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidatesFromHashes(hashed, k, bands, maxBucket)
    materializeAndRelease(hashed, verifyCandidates(hashed, cands, threshold))
  }

  /** MinHash calibration report — the run that TUNES a dedup config
    * before committing a full corpus to it: for every LSH candidate
    * pair (same banding + hot-bucket cap as [[nearDuplicates]]), the
    * signature-agreement ESTIMATE of Jaccard (matching minhash slots
    * out of k — the quantity banding actually thresholds on) next to
    * the EXACT shingle Jaccard, with the absolute error. Reading the
    * error distribution by estimate bucket tells you whether k is big
    * enough and where to put the verify threshold; pairs with high
    * estimate but low exact Jaccard are the false-candidate load the
    * verify join must absorb.
    *
    * Scale shape: identical to [[nearDuplicates]] (this IS that
    * pipeline minus the threshold filter, plus one signature join) —
    * banded, capped, pair volume bounded by the bucket cap; signatures
    * are k longs per doc. Run it on a sample; the estimate error is
    * distribution-free, so a sample calibrates the full corpus.
    *
    * Determinism: both ratios are single IEEE divides of exact small
    * integers; rounded at 6 for the report. */
  def minhashCalibration(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      maxBucket: Int = 64): DataFrame = {
    require(k % bands == 0, s"k=$k must be a multiple of bands=$bands")
    val hashed = hashedShingleFrame(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = hashed.select(col("id"),
      graft.functions.VectorExprs.minhash_sig(col("h"), k).as("sig"))
    val cands = lshCandidatesFromHashes(hashed, k, bands, maxBucket)
    val est = aggregate(
      zip_with(col("sig_a"), col("sig_b"),
        (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k
    val out = cands
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
      .withColumn("est", est)
      .join(hashed.withColumnsRenamed(Map("id" -> "id_a", "h" -> "h_a")), Seq("id_a"))
      .join(hashed.withColumnsRenamed(Map("id" -> "id_b", "h" -> "h_b")), Seq("id_b"))
      .withColumn("jac", jaccard(col("h_a"), col("h_b")))
      .select(col("id_a"), col("id_b"),
        round(col("est"), 6).as("est_r"),
        round(col("jac"), 6).as("jac_r"),
        round(abs(col("est") - col("jac")), 6).as("err_r"))
    materializeAndRelease(hashed, out)
  }

  /** Edit-distance verification of LSH candidate pairs — the
    * character-level confirm stage a near-dup pipeline runs when
    * shingle Jaccard is too coarse (token reorderings and boilerplate
    * templates can score high Jaccard while being different documents;
    * bounded Levenshtein on the normalized text is the classic
    * second-opinion statistic). For every MinHash candidate pair (same
    * banding + hot-bucket cap as [[nearDuplicates]]): the Levenshtein
    * distance between the two normalized-text PREFIXES (capped at
    * `prefixLen` chars), the normalized similarity
    * 1 - dist/max(len), and a `dup` verdict at `simThreshold`.
    *
    * Cost bounds, because unbounded Levenshtein is the classic scale
    * trap: (a) pair volume is the capped LSH candidate set, never the
    * corpus square; (b) each compare is O(prefixLen^2) worst-case on a
    * fixed prefix, so the per-pair cost is a CONSTANT, not O(doc^2);
    * (c) the distance is threshold-banded (Spark's 3-arg levenshtein
    * stops at the bound and returns -1) — the bound
    * floor(prefixLen * (1 - simThreshold)) is the largest distance any
    * pair with max(len) <= prefixLen could have and still clear
    * `simThreshold`, so banding can never flip a verdict. Text travels
    * into the pair join capped at prefixLen chars per side.
    *
    * Determinism: integer edit distance, one IEEE divide for the
    * similarity (rounded at 6 for the report; the verdict compares the
    * unrounded single divide — same bits in any engine). Two empty
    * prefixes (non-Latin text normalizing to "") are identical:
    * sim 1, dup true. */
  def editVerify(docs: DataFrame, idCol: String, textCol: String,
      simThreshold: Double = 0.7, prefixLen: Int = 256,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      maxBucket: Int = 64): DataFrame = {
    require(simThreshold > 0.0 && simThreshold <= 1.0,
      s"simThreshold must be in (0, 1]: $simThreshold")
    require(prefixLen > 0, s"prefixLen must be positive: $prefixLen")
    val bound = math.floor(prefixLen * (1.0 - simThreshold)).toInt
    val hashed = hashedShingleFrame(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = lshCandidatesFromHashes(hashed, k, bands, maxBucket)
    val prefixes = docs.select(col(idCol).as("id"),
      substring(TextStats.normalized(col(textCol)), 1, prefixLen).as("p"))
    val d = levenshtein(col("p_a"), col("p_b"), bound)
    val maxLen = greatest(length(col("p_a")), length(col("p_b")))
    val sim = when(maxLen === 0, lit(1.0))
      .when(col("edit_dist") >= 0,
        lit(1.0) - col("edit_dist").cast("double") / maxLen.cast("double"))
    val out = cands
      .join(prefixes.withColumnsRenamed(Map("id" -> "id_a", "p" -> "p_a")), Seq("id_a"))
      .join(prefixes.withColumnsRenamed(Map("id" -> "id_b", "p" -> "p_b")), Seq("id_b"))
      .withColumn("edit_dist", d)
      .withColumn("sim", sim)
      .select(col("id_a"), col("id_b"), col("edit_dist"),
        round(col("sim"), 6).as("edit_sim"),
        coalesce(col("sim") >= simThreshold, lit(false)).as("dup"))
    materializeAndRelease(hashed, out)
  }

  /** Exact n-gram Jaccard over ALL qualifying pairs via an inverted
    * index: explode shingle hashes, self-join on hash, count shared
    * shingles per pair, derive |A u B| = |A| + |B| - shared. The
    * scalable exact path when LSH recall is not acceptable: shuffle is
    * the posting list (one row per (doc, shingle)), and `maxDocFreq`
    * drops stop-shingles whose posting lists would explode the pair
    * count (a shingle in f docs contributes f^2/2 pairs). */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleN: Int = 3,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val hashed = hashedShingleFrame(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = hashed.select(col("id"), size(col("h")).as("n"))
    val postings0 = hashed.select(col("id"), explode(col("h")).as("hash"))
    // window (not withDocFreq) on purpose: its output is BOTH sides of
    // the pair self-join below, and exchange reuse makes it 7x faster
    // than the agg+join shape here — see withDocFreq's scaladoc
    val postings =
      if (maxDocFreq == Int.MaxValue) postings0
      else postings0.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("hash"))))
        .filter(col("df") <= maxDocFreq).drop("df")
    val shared = postings.select(col("id").as("id_a"), col("hash"))
      .join(postings.select(col("id").as("id_b"), col("hash")), Seq("hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    val pairs = shared
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n" -> "n_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n" -> "n_b")), Seq("id_b"))
      .withColumn("jaccard",
        col("shared").cast("double") / (col("n_a") + col("n_b") - col("shared")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    materializeAndRelease(hashed, pairs)
  }

  /** Directed containment pairs (quote/subset detection): for each
    * unordered pair, the fraction of EACH side's distinct shingles
    * found in the other — containment_ab = |A&B|/|A| (how much of A is
    * inside B) and the mirror. Near-dup Jaccard misses the short doc
    * fully quoted by a long one (the union dilutes J below any useful
    * threshold); containment is the right statistic for "this doc is a
    * subset/quote of that one" — boilerplate extraction, license-text
    * detection, prompt-in-corpus leakage. A pair is emitted when EITHER
    * direction clears `threshold`.
    *
    * Scale shape: identical to [[jaccardPairs]] (shared posting-list
    * machinery: df-capped inverted index, posting self-join, per-pair
    * count) — the two statistics differ only in the final denominator,
    * so the candidate bound and the cap caveat (df-capped containment
    * is a lower bound on pairs dominated by ultra-common shingles)
    * carry over unchanged. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.9, shingleN: Int = 3,
      maxDocFreq: Int = Int.MaxValue): DataFrame = {
    val hashed = hashedShingleFrame(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = hashed.select(col("id"), size(col("h")).as("n"))
    val postings0 = hashed.select(col("id"), explode(col("h")).as("hash"))
    val postings =
      if (maxDocFreq == Int.MaxValue) postings0
      else postings0.withColumn("df",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("hash"))))
        .filter(col("df") <= maxDocFreq).drop("df")
    val shared = postings.select(col("id").as("id_a"), col("hash"))
      .join(postings.select(col("id").as("id_b"), col("hash")), Seq("hash"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared"))
    val pairs = shared
      .join(sizes.withColumnsRenamed(Map("id" -> "id_a", "n" -> "n_a")), Seq("id_a"))
      .join(sizes.withColumnsRenamed(Map("id" -> "id_b", "n" -> "n_b")), Seq("id_b"))
      .withColumn("containment_ab",
        col("shared").cast("double") / col("n_a").cast("double"))
      .withColumn("containment_ba",
        col("shared").cast("double") / col("n_b").cast("double"))
      .filter(col("containment_ab") >= threshold ||
        col("containment_ba") >= threshold)
      .select(col("id_a"), col("id_b"), col("n_a"), col("n_b"),
        col("containment_ab"), col("containment_ba"))
    materializeAndRelease(hashed, pairs)
  }

  /** Exact n-gram Jaccard via PREFIX FILTERING (AllPairs/PPJoin family,
    * Bayardo et al., WWW'07; Xiao et al., WWW'08) — the exact-semantics
    * scale path. [[jaccardPairs]]' doc-frequency cap bounds the posting
    * join but makes reported similarity a lower bound on boilerplate
    * pairs; prefix filtering needs no cap and loses nothing:
    *
    * Order all shingles by a global total order (ascending doc
    * frequency, hash as tie-break — rarest first). For a doc with n
    * shingles, index only its first `n - ceil(t*n) + 1` shingles (its
    * "prefix"). If J(A,B) >= t, then |A&B| >= t*|A u B| >= ceil(t*|A|),
    * so A's LAST ceil(t*|A|)-1 shingles cannot contain all of A&B; the
    * globally-smallest common shingle therefore sits in A's prefix, and
    * by the same argument in B's — every qualifying pair collides on
    * some prefix shingle. Candidates = prefix-postings self-join (rare
    * shingles -> short posting lists), verified with the full exact
    * intersection. Work is linear in corpus size for natural df
    * distributions; k byte-identical docs still cost C(k,2) — that is
    * the size of the ANSWER, not an index defect. */
  def jaccardPairsPrefix(docs: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, shingleN: Int = 3): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    val hashed = hashedShingleFrame(docs, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val postings = hashed
      .select(col("id"), size(col("h")).as("n"), explode(col("h")).as("hash"))
    // prefix length: n - ceil(t*n) + 1 in REAL arithmetic; the float
    // ceil can land one too high (ceil(0.8*35) = ceil(28.000000000000004)
    // = 29, real answer 28), which would shorten the prefix and DROP an
    // exactly-at-threshold pair. One extra position absorbs the at-most-
    // one-ulp error — over-inclusion is admissible (a candidate more,
    // never a qualifying pair less). The oracle mirrors the same +2.
    val prefix = withDocFreq(postings)
      .withColumn("rn", row_number().over(
        w.partitionBy(col("id")).orderBy(col("df").asc, col("hash").asc)))
      .filter(col("rn") <= col("n") - ceil(lit(threshold) * col("n")) + 2)
      .select(col("id"), col("n"), col("rn"), col("hash"))
    // PPJoin admissible pruning (results unchanged — the final exact
    // verification defines the output; these only shrink its input).
    // Both predicates are stated as the DIVISION the verifier itself
    // computes (correctly-rounded division is monotone, so an upper
    // bound on the real Jaccard upper-bounds the verifier's double too
    // — no ceil()-on-a-double-product, which over-prunes at-threshold
    // pairs; see scaladoc note above):
    //  - LENGTH: max possible J = min(n_a,n_b)/max(n_a,n_b);
    //  - POSITIONAL: the globally-smallest common shingle (the min-rn_a
    //    collision — rarest-first order is shared by both docs) bounds
    //    the overlap o <= ub = min(n_a-rn_a, n_b-rn_b)+1, so
    //    J <= ub/(n_a+n_b-ub). Bounds from LATER collisions are not
    //    valid overlap bounds, hence the min-struct pick rather than an
    //    aggregate over all collisions.
    val cands = prefix
      .select(col("id").as("id_a"), col("n").as("n_a"),
        col("rn").as("rn_a"), col("hash"))
      .join(prefix.select(col("id").as("id_b"), col("n").as("n_b"),
        col("rn").as("rn_b"), col("hash")), Seq("hash"))
      .filter(col("id_a") < col("id_b") &&
        least(col("n_a"), col("n_b")).cast("double") /
          greatest(col("n_a"), col("n_b")).cast("double") >= threshold)
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(struct(col("rn_a"), col("rn_b"),
        col("n_a"), col("n_b"))).as("m"))
      .filter {
        val ub = least(col("m.n_a") - col("m.rn_a"),
          col("m.n_b") - col("m.rn_b")) + 1
        ub.cast("double") /
          (col("m.n_a") + col("m.n_b") - ub).cast("double") >= threshold
      }
      .select(col("id_a"), col("id_b"))
    materializeAndRelease(hashed,
      verifyCandidates(hashed, cands, threshold))
  }

  /** Connected components over a near-duplicate PAIR frame — the step
    * every dedup pipeline needs between pair generation and survivor
    * selection (near-dup is not transitive: A~B, B~C puts A,C in one
    * cluster with one survivor, even though A~C may be below
    * threshold).
    *
    * Min-label propagation: every node starts labeled with its own id;
    * each round replaces a node's label with the min over itself and
    * its neighbors; fixpoint label = min id reachable = component id.
    * Converges in O(graph diameter) rounds — near-dup clusters are
    * shallow (stars/cliques around a template), so a handful of rounds;
    * each round is one co-partitioned join + min-agg, lineage cut with
    * localCheckpoint so plans don't grow with iterations. Throws after
    * `maxIter` instead of returning a half-converged labeling.
    *
    * Returns (id, comp) for every node that appears in `edges`. */
  def connectedComponents(edges: DataFrame, srcCol: String = "id_a",
      dstCol: String = "id_b", maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("src").as("id"), col("src").as("comp"))
      .distinct().localCheckpoint(true)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val viaNbr = sym
        .join(labels.select(col("id").as("src"), col("comp")), Seq("src"))
        .select(col("dst").as("id"), col("comp"))
      val next = labels.union(viaNbr)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint(true)
      // labels only ever decrease; unchanged total order = fixpoint
      converged = next.join(labels.withColumnRenamed("comp", "prev"), Seq("id"))
        .filter(col("comp") =!= col("prev")).isEmpty
      labels = next
      it += 1
    }
    sym.unpersist(false)
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    labels
  }

  /** Corpus snapshot diff by content fingerprint — the dataset-
    * versioning primitive (what changed between crawl N and crawl N+1):
    * full-outer join of the two snapshots' (id, fingerprint) frames,
    * status per id ∈ {added, removed, changed}; ids with identical
    * normalized content are omitted (the overwhelming majority — the
    * output scales with the CHANGE, not the corpus). Fingerprints are
    * 16-byte digests, so the join never shuffles document text. */
  def corpusDiff(before: DataFrame, after: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // null text coalesces to '' BEFORE fingerprinting: a null
    // fingerprint would be indistinguishable from an absent id, turning
    // a present-but-bodyless doc into a spurious 'added'/'removed'
    val a = before.select(col(idCol).as("id"),
      TextStats.fingerprintMd5(coalesce(col(textCol), lit(""))).as("fp_a"))
    val b = after.select(col(idCol).as("id"),
      TextStats.fingerprintMd5(coalesce(col(textCol), lit(""))).as("fp_b"))
    a.join(b, Seq("id"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed"))
      .filter(col("status").isNotNull)
      .select(col("id"), col("status"))
  }

  /** Erasure propagation audit — the right-to-be-forgotten primitive
    * for a training corpus: a delete request must remove not only the
    * requested ids but every CONTENT COPY of their documents (crawl
    * mirrors, injected duplicates), or the erased text survives
    * training. Returns per-doc erasure verdicts: `requested` (in the
    * delete set), `content_copy` (same normalized fingerprint as a
    * requested doc, not itself requested), or null (retained).
    *
    * Scale shape: the delete set is tiny relative to the corpus — its
    * distinct fingerprints broadcast into one semi-join probe over the
    * corpus fingerprint frame (16-byte digests; document text never
    * shuffles). One narrow fingerprint pass + one join. */
  def erasureAudit(docs: DataFrame, idCol: String, textCol: String,
      deleteIds: DataFrame): DataFrame = {
    val fps = docs.select(col(idCol).as("id"),
      TextStats.fingerprintMd5(coalesce(col(textCol), lit(""))).as("fp"))
    val del = deleteIds.select(col(deleteIds.columns.head).as("id"))
      .withColumn("__req", lit(true))
    val withReq = fps.join(broadcast(del), Seq("id"), "left")
    val delFps = withReq.filter(col("__req")).select(col("fp")).distinct()
    withReq
      .join(broadcast(delFps.withColumn("__hit", lit(true))), Seq("fp"), "left")
      .select(col("id"),
        when(col("__req"), "requested")
          .when(col("__hit"), "content_copy").as("erasure"))
  }

  /** Benchmark decontamination (the GPT-3/PaLM training-prep step,
    * public papers): flag training documents that share any word
    * `n`-gram with a benchmark/eval set, so eval questions don't leak
    * into training data. 13-grams are the published convention; the
    * default here follows it.
    *
    * Scale shape: the benchmark side is tiny relative to the corpus —
    * its distinct shingle hashes are aggregated (map-side combined)
    * and the corpus side explodes its shingles once and inner-joins on
    * the hash (AQE broadcasts the benchmark hashes when they fit; at
    * worst it's a shuffle keyed on an 8-byte digest). Per-doc match
    * counts come back from one groupBy on doc id.
    *
    * All explode-side consumers route through
    * [[explodedShingleHashes]] (round 8): exploding the gram ARRAY —
    * `explode(shingleHashes(...))`, in one step or via an intermediate
    * column — measured 4.9s at sf0.1 where building and fully
    * consuming the same arrays WITHOUT a Generate costs 0.68s
    * (tools/ShingleProbe): once the optimizer folds the projection
    * into the Generate, the tokenize/normalize tree lands inside the
    * per-element path and is re-evaluated per emitted gram. Returns
    * (id, n_contaminated_grams) for CONTAMINATED docs only — callers
    * anti-join to drop them. */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13)
      : DataFrame = {
    val benchHashes = explodedShingleHashes(
      benchmark.select(lit(0L).as("__bid"), col(benchTextCol)),
      "__bid", benchTextCol, n)
      .select(col("h"))
      .distinct()
    explodedShingleHashes(corpus, idCol, textCol, n)
      .join(benchHashes, Seq("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_contaminated_grams"))
  }

  /** The (id, h) per-doc DISTINCT shingle-hash STREAM — the
    * explode-side sibling of [[shingleHashes]], and the only sanctioned
    * way to explode grams (round-8 finding, tools/ShingleProbe):
    * `explode(<gram-array expression>)` costs 4.9s at sf0.1 against
    * 0.2s for this shape, because the optimizer folds the array-build
    * projection into the Generate and the tokenize tree gets
    * re-evaluated per emitted element. Here the GENERATE only explodes
    * a cheap index sequence; the gram is then assembled per exploded
    * row from the token array — a plain post-generate attribute, which
    * nothing can fold into a lambda. The trailing distinct matches
    * [[wordShingles]]' array_distinct (duplicates of a doc's grams sit
    * on the doc's own partition, so the partial aggregate collapses
    * them map-side — the exchange carries the already-distinct (id,
    * 8-byte hash) stream). Sub-n-token docs emit their single
    * whole-text gram, [[wordShingles]]' convention.
    *
    * GRAM IDENTITY IS HASH IDENTITY, by convention, in BOTH engines:
    * this distinct runs over the 60-bit hash while the DuckDB oracles
    * distinct the gram STRINGS — a within-doc collision between two
    * distinct grams (probability ~2^-60 per pair) would undercount by
    * one vs a string-distinct count. Every consumer (decontaminate,
    * contamination, novelty) compares hashes downstream anyway, so a
    * colliding pair is one gram to the whole pipeline, not just to
    * this operator; the divergence is accepted and documented rather
    * than papered over with a wider hash. */
  private[graft] def explodedShingleHashes(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      TextStats.tokens(TextStats.normalized(col(textCol))).as("__t"))
    toks
      .select(col("id"), col("__t"),
        explode(when(size(col("__t")) >= n,
          sequence(lit(0), size(col("__t")) - n, lit(1)))
          .otherwise(array(lit(-1)))).as("__i"))
      .select(col("id"),
        graft.functions.Hashing.hash64(when(col("__i") >= 0,
          concat_ws(" ", slice(col("__t"), col("__i") + 1, lit(n))))
          .otherwise(concat_ws(" ", col("__t")))).as("h"))
      .distinct()
  }

  /** Bloom-prefiltered decontamination — the 100 TB shape of
    * [[decontaminate]]. The exact path explodes every corpus 13-gram
    * and ships ALL of them into the hash join, but almost none of them
    * are contaminated: the join's output is a vanishing fraction of its
    * input. A Bloom filter over the benchmark's distinct gram hashes
    * (built once, a few MB even for a large eval suite) is applied to
    * the corpus gram stream BEFORE the exchange, so only probable hits
    * ever shuffle; the exact hash join then confirms each survivor, so
    * Bloom false positives cannot leak into the result. Output is
    * therefore IDENTICAL to [[decontaminate]] — same rows, same counts
    * — which is exactly what lets one oracle gate both paths.
    *
    * Scale shape: benchmark side = one bounded-driver-fetch Bloom build
    * ([[Relational.bloomSemiJoin]] — xxhash64 keys, auto-sized from the
    * build-side count); corpus side = narrow explode + codegen'd
    * might_contain filter riding the scan; the exchange carries only
    * candidate grams (at the default 3% fpp: ~3% of clean grams + all
    * real hits), then the same join/groupBy as the exact path. */
  def decontaminateBloom(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13)
      : DataFrame = {
    // pinned: the bench hash set has three consumers inside
    // bloomSemiJoin (count, Bloom build, semi target) — without the pin
    // each re-runs the bench tokenize->shingle->distinct
    val benchHashes = explodedShingleHashes(
      benchmark.select(lit(0L).as("__bid"), col(benchTextCol)),
      "__bid", benchTextCol, n)
      .select(col("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val corpusGrams = explodedShingleHashes(corpus, idCol, textCol, n)
    materializeAndRelease(benchHashes,
      Relational.bloomSemiJoin(corpusGrams, benchHashes, "h")
        .groupBy(col("id"))
        .agg(count(lit(1)).as("n_contaminated_grams")))
  }

  /** Exact long-substring intra-corpus dedup — the missing dedup mode
    * between exact-fingerprint (whole doc) and MinHash (set overlap):
    * find document PAIRS sharing a verbatim run of >= `minRun` tokens,
    * the signal Lee et al. 2021 ("Deduplicating Training Data Makes
    * Language Models Better") target with a corpus suffix array.
    *
    * A suffix array is a single-machine construction; the Spark-shaped
    * equivalent is positional shingles on the banded-join discipline
    * this module already uses everywhere:
    *
    *  1. every doc emits its `minRun`-token windows at stride 1 as
    *     (id, pos, hash64) — one posting per token, the same linear
    *     stream [[explodedShingleHashes]] ships for decontamination
    *     (positions kept, no distinct: runs need extent, not presence);
    *  2. hot shingles (> `maxBucket` postings — boilerplate, license
    *     headers) are dropped by the standard frequency guard, keeping
    *     the posting self-join linear: <= maxBucket^2/2 pairs per
    *     bucket, never O(corpus^2);
    *  3. matched postings land on DIAGONALS (posA - posB constant for
    *     a contiguous shared run); gaps-and-islands per (a, b,
    *     diagonal) — island = pos - row_number(), a pure window over
    *     the pair partition — merges consecutive window matches, so a
    *     shared span of T tokens reports run_tokens = T exactly
    *     (count + minRun - 1).
    *
    * Conservative under the guard: a capped shingle inside a long run
    * splits it into two shorter reported runs (underestimate, never
    * overestimate). Gram identity is hash identity, the module-wide
    * convention (see [[explodedShingleHashes]]). Docs under `minRun`
    * tokens emit nothing — they cannot contain an L-token run.
    *
    * Returns one row per overlapping pair: (doc_a, doc_b,
    * max_run_tokens, n_runs, n_shared_grams). 100 TB shape: shuffle
    * carries (id, pos, 8-byte hash) per token — the decontaminate
    * stream plus 4 bytes — and the only joins are the capped posting
    * self-join and none after (islands/rollup are windows over the
    * already-matched pair stream, partitioned by pair). */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      minRun: Int = 50, maxBucket: Int = 64): DataFrame =
    substringRunFrame(docs, idCol, textCol, minRun, maxBucket)
      .groupBy("da", "db")
      .agg(max(col("run_tokens")).as("max_run_tokens"),
        count(lit(1)).as("n_runs"),
        (sum(col("run_tokens")) - count(lit(1)) * (minRun - 1))
          .as("n_shared_grams"))
      .select(col("da").as("doc_a"), col("db").as("doc_b"),
        col("max_run_tokens"), col("n_runs"), col("n_shared_grams"))

  /** Positional L-gram postings (id, pos, h), frequency-capped: the
    * shared front end of every run-extent operator. Explodes the index
    * sequence, never the gram array (ShingleProbe: a folded gram-array
    * Generate re-runs tokenization per emitted element). */
  private def cappedPositionalPostings(docs: DataFrame, idCol: String,
      textCol: String, L: Int, maxBucket: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(L >= 2, s"minRun must be >= 2: $L")
    val toks = docs.select(col(idCol).as("id"),
      TextStats.tokens(TextStats.normalized(col(textCol))).as("__t"))
    toks
      .filter(size(col("__t")) >= L)
      .select(col("id"), col("__t"),
        explode(sequence(lit(0), size(col("__t")) - L, lit(1))).as("pos"))
      .select(col("id"), col("pos"),
        Hashing.hash64(concat_ws(" ", slice(col("__t"), col("pos") + 1,
          lit(L)))).as("h"))
      .withColumn("__bs", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("__bs") <= maxBucket)
      .drop("__bs")
  }

  /** Diagonal gaps-and-islands merge of a matched posting-pair stream
    * (da, db, pa, pb) -> one row per (pair, diagonal, island) with each
    * side's run START and the exact extent in tokens. */
  private def mergedRuns(pairs: DataFrame, L: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    pairs.withColumn("diag", col("pa") - col("pb"))
      .withColumn("isl",
        col("pa") - row_number().over(
          Window.partitionBy("da", "db", "diag").orderBy("pa")))
      .groupBy("da", "db", "diag", "isl")
      .agg(min(col("pa")).as("pa0"), min(col("pb")).as("pb0"),
        (count(lit(1)) + (L - 1)).as("run_tokens"))
  }

  /** The merged-run stream both intra-corpus substring operators
    * consume: one row per (pair, diagonal, island). */
  private[graft] def substringRunFrame(docs: DataFrame, idCol: String,
      textCol: String, minRun: Int, maxBucket: Int): DataFrame = {
    val capped =
      cappedPositionalPostings(docs, idCol, textCol, minRun, maxBucket)
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.h") === col("b.h") && col("a.id") < col("b.id"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    mergedRuns(pairs, minRun)
  }

  /** Run-EXTENT decontamination — [[decontaminate]] upgraded from gram
    * COUNTS to verbatim-quote extents: for every (corpus doc, benchmark
    * doc) pair sharing a >= `minRun`-token verbatim run, the merged run
    * extents — "this training doc quotes 37 consecutive tokens of eval
    * item 12", the evidence an n-gram hit count only hints at. Same
    * positional-posting + diagonal-island machinery as
    * [[substringDedup]], with the self-join replaced by a
    * corpus x benchmark join; each side's hot shingles are capped at
    * `maxBucket` independently (boilerplate on either side is the
    * f^2/2 regime). Returns one row per (id, bench_id, diagonal
    * island): (id, bench_id, pos, bench_pos, run_tokens) — callers
    * aggregate per doc or per pair.
    *
    * 100 TB shape: the benchmark side is tiny (eval suites); its capped
    * postings broadcast-or-shuffle against the corpus posting stream
    * (one row per corpus token, the decontaminate bill), and the
    * islands are windows over MATCHED pairs only. */
  def decontaminateRuns(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      minRun: Int = 13, maxBucket: Int = 64): DataFrame = {
    val c = cappedPositionalPostings(corpus, idCol, textCol,
      minRun, maxBucket)
    val b = cappedPositionalPostings(benchmark, benchIdCol, benchTextCol,
      minRun, maxBucket)
    val pairs = c.as("a")
      .join(b.as("b"), col("a.h") === col("b.h"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    mergedRuns(pairs, minRun)
      .select(col("da").as("id"), col("db").as("bench_id"),
        col("pa0").as("pos"), col("pb0").as("bench_pos"),
        col("run_tokens"))
  }

  /** Per-id union of inclusive token intervals (id, s, e) -> disjoint
    * merged intervals, the classic gaps-and-islands interval merge: an
    * interval starts a new island iff its start exceeds the running max
    * end of every interval sorted before it. Shared by the coverage
    * statistic and the span-removal transform so only run ENDPOINTS
    * ever shuffle — never one row per covered token (VERDICT r13 Next
    * #5: the explode(sequence)+distinct form was linear in covered
    * tokens, and on a boilerplate-heavy corpus that distinct was the
    * dominant exchange). */
  private[graft] def mergedIntervals(iv: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy(col("s"), col("e"))
    val prevMax = max(col("e"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("__new",
        when(prevMax.isNull || col("s") > prevMax, lit(1)).otherwise(lit(0)))
      .withColumn("__isl", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      .select(col("id"), col("s"), col("e"))
  }

  /** Per-document duplicated-span COVERAGE — the decision input Lee et
    * al. 2021 act on: they remove the duplicated SPANS themselves; the
    * per-doc fraction of tokens sitting inside any cross-document
    * >= `minRun`-token verbatim run is the policy statistic for both
    * span removal and doc dropping (a doc that is 80% verbatim-shared
    * boilerplate is not salvageable; one quoting a single paragraph
    * is). Every island from [[substringRunFrame]] covers
    * [start, start + run_tokens) on EACH side; overlapping runs
    * collapse via [[mergedIntervals]] and the merged lengths join back
    * to every doc's token length — clean docs report coverage 0, not
    * absence. Verdicts at `flagAt`/`dropAt` follow the
    * contaminationReport convention.
    *
    * 100 TB shape: one (id, start, end) row per run ENDPOINT pair — a
    * window + partial-agg over rows proportional to the number of
    * runs, never the number of covered tokens (r13 shipped an
    * explode-per-covered-token + distinct here; on a boilerplate-heavy
    * corpus that distinct was the dominant exchange) — and the only
    * joins are the run-frame's capped self-join plus one
    * broadcast-or-shuffle join of (id, n_dup) onto per-doc lengths. */
  def substringDupCoverage(docs: DataFrame, idCol: String,
      textCol: String, minRun: Int = 50, maxBucket: Int = 64,
      flagAt: Double = 0.2, dropAt: Double = 0.8): DataFrame = {
    require(flagAt <= dropAt, s"flagAt $flagAt must be <= dropAt $dropAt")
    val runs = substringRunFrame(docs, idCol, textCol, minRun, maxBucket)
    val ivs = runs.select(col("da").as("id"), col("pa0").as("s"),
        (col("pa0") + col("run_tokens") - 1).as("e"))
      .union(runs.select(col("db").as("id"), col("pb0").as("s"),
        (col("pb0") + col("run_tokens") - 1).as("e")))
    val covered = mergedIntervals(ivs)
      .groupBy(col("id"))
      .agg(sum(col("e") - col("s") + 1).as("n_dup_tokens"))
    val lens = docs.select(col(idCol).as("id"),
      size(TextStats.tokens(TextStats.normalized(col(textCol))))
        .cast("long").as("n_tokens"))
    lens.join(covered, Seq("id"), "left")
      .select(col("id").as(idCol), col("n_tokens"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"))
      .withColumn("dup_fraction",
        round(when(col("n_tokens") === 0, lit(0.0))
          .otherwise(col("n_dup_tokens").cast("double") /
            col("n_tokens").cast("double")), 6))
      .withColumn("verdict",
        when(col("dup_fraction") >= dropAt, lit("drop"))
          .when(col("dup_fraction") >= flagAt, lit("flag"))
          .otherwise(lit("keep")))
  }

  /** Cross-document duplicated-SPAN removal — the remediation Lee et
    * al. 2021 actually apply (their §4 "deduplicate by removing the
    * duplicated substrings themselves"): for every cross-doc verbatim
    * run of >= `minRun` tokens found by [[substringRunFrame]], the
    * LOWER-id side of each pair keeps its copy and the higher-id side
    * has the covered token range excised, so each run family retains
    * exactly one canonical copy (the family's min id — every other
    * member is the `db` side of at least one pair covering that span).
    * [[substringDupCoverage]] is the measurement; this is the
    * transform.
    *
    * Rebuild shape: covered db-side intervals merge per doc via
    * [[mergedIntervals]] (endpoints only — never one row per covered
    * token), the tiny disjoint interval list joins back onto the doc,
    * and the excision is a codegen'd higher-order `filter` over the
    * token array testing each position against the interval list — the
    * text itself never shuffles beyond the one doc-id join. Removing a
    * span joins its flanking tokens with a single space (the Lee et
    * al. convention); docs with nothing excised round-trip their
    * normalized token stream unchanged.
    *
    * Returns (id, n_tokens, n_removed_tokens, text_deduped) over the
    * NORMALIZED token stream (the module-wide gram alphabet — byte
    * fidelity of untouched docs is not a goal of this operator; the
    * run alphabet and the rebuild alphabet must agree or excision
    * offsets would be wrong). */
  def removeDuplicatedSpans(docs: DataFrame, idCol: String,
      textCol: String, minRun: Int = 50, maxBucket: Int = 64): DataFrame = {
    val runs = substringRunFrame(docs, idCol, textCol, minRun, maxBucket)
    val excised = mergedIntervals(
        runs.select(col("db").as("id"), col("pb0").as("s"),
          (col("pb0") + col("run_tokens") - 1).as("e")))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("s"), col("e"))))
        .as("__ivs"))
    val toks = docs.select(col(idCol).as("id"),
      TextStats.tokens(TextStats.normalized(col(textCol))).as("__t"))
    toks.join(excised, Seq("id"), "left")
      .withColumn("__kept",
        when(col("__ivs").isNull, col("__t"))
          .otherwise(filter(col("__t"), (t, i) =>
            !exists(col("__ivs"), iv =>
              i >= iv.getField("s") && i <= iv.getField("e")))))
      .select(col("id").as(idCol),
        size(col("__t")).cast("long").as("n_tokens"),
        (size(col("__t")) - size(col("__kept"))).cast("long")
          .as("n_removed_tokens"),
        concat_ws(" ", col("__kept")).as("text_deduped"))
  }

  /** Incremental token-run dedup — the crawl-step form of
    * [[substringDedup]], completing the substring tier's symmetry with
    * the minhash tier's [[incrementalNearDups]]: a new `batch` of docs
    * is checked for >= `minRun`-token verbatim runs against an already
    * `index`ed corpus WITHOUT re-joining the index against itself. Each
    * side's postings are frequency-capped independently (boilerplate on
    * either side is the f^2 regime), the only join is
    * batch-postings x index-postings on the gram hash — O(batch
    * postings) probes per crawl step, the index side is never
    * self-paired — and the diagonal island merge is the shared
    * [[substringDedup]] machinery. Returns one row per overlapping
    * (batch doc, index doc) pair with the same extent statistics as
    * [[substringDedup]]. */
  def incrementalSubstringRuns(index: DataFrame, batch: DataFrame,
      idCol: String, textCol: String, minRun: Int = 50,
      maxBucket: Int = 64): DataFrame = {
    val ix = cappedPositionalPostings(index, idCol, textCol,
      minRun, maxBucket)
    val b = cappedPositionalPostings(batch, idCol, textCol,
      minRun, maxBucket)
    val pairs = b.as("a")
      .join(ix.as("b"), col("a.h") === col("b.h"))
      .select(col("a.id").as("da"), col("b.id").as("db"),
        col("a.pos").as("pa"), col("b.pos").as("pb"))
    mergedRuns(pairs, minRun)
      .groupBy("da", "db")
      .agg(max(col("run_tokens")).as("max_run_tokens"),
        count(lit(1)).as("n_runs"),
        (sum(col("run_tokens")) - count(lit(1)) * (minRun - 1))
          .as("n_shared_grams"))
      .select(col("da").as("batch_id"), col("db").as("index_id"),
        col("max_run_tokens"), col("n_runs"), col("n_shared_grams"))
  }

  /** Graded decontamination: [[decontaminate]] reports only the hit
    * count over contaminated docs; real pipelines threshold on the
    * contaminated FRACTION of a document's n-grams (a 10k-gram doc
    * quoting one benchmark sentence is salvageable; a 20-gram doc that
    * is 80% benchmark is not). Emits every corpus doc with its total
    * distinct gram count, contaminated gram count, fraction, and a
    * keep/flag/drop verdict at the given thresholds.
    *
    * Scale shape: same as [[decontaminate]] — distinct benchmark hashes
    * build once, one hash-join on the exploded corpus grams, one
    * partial-agg groupBy on doc id — plus one extra shuffle joining the
    * per-doc totals (computed narrow, before the explode) to the hit
    * counts. Linear in corpus grams; never quadratic. */
  def contaminationReport(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13,
      flagFrac: Double = 0.05, dropFrac: Double = 0.5): DataFrame = {
    require(flagFrac <= dropFrac, "flag threshold must not exceed drop")
    val benchHashes = explodedShingleHashes(
      benchmark.select(lit(0L).as("__bid"), col(benchTextCol)),
      "__bid", benchTextCol, n)
      .select(col("h"))
      .distinct()
    // the (id, h) distinct gram STREAM pinned: totals and hits are two
    // consumers of the same frame (round 8: the pin moved from the
    // gram-ARRAY frame to the exploded stream — same bytes exchanged,
    // and the stream shape dodges the Generate-inlining trap that made
    // the array form 7x slower, see explodedShingleHashes)
    val grams = explodedShingleHashes(corpus, idCol, textCol, n)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // int, matching the original size(array) dtype of this field
    val totals = grams.groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_grams"))
    val hits = grams
      .join(benchHashes, Seq("h"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_contaminated"))
    val frac = col("n_contaminated").cast("double") /
      col("n_grams").cast("double")
    val out = totals.join(hits, Seq("id"), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .withColumn("contaminated_frac", frac)
      .withColumn("verdict",
        when(col("contaminated_frac") >= dropFrac, lit("drop"))
          .when(col("contaminated_frac") >= flagFrac, lit("flag"))
          .otherwise(lit("keep")))
    materializeAndRelease(grams, out)
  }

  /** End-to-end near-dup removal: pair generation → connected
    * components → keep one survivor per cluster (the component's min
    * id) plus every unpaired document. The composition a real corpus
    * pipeline runs; `pairs` can come from any generator (minhash,
    * simhash, embedding-LSH). One anti-join-shaped left join against
    * the (small) non-survivor label set. */
  def dedupSurvivors(docs: DataFrame, idCol: String, pairs: DataFrame)
      : DataFrame = {
    val losers = connectedComponents(pairs)
      .filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Survivor selection with an explicit POLICY: within each near-dup
    * component, keep the member maximizing `priority` (any orderable
    * column — typically a struct of (source rank, length)), ties to
    * the smallest id. [[dedupSurvivors]]' min-id pick is arbitrary-but-
    * deterministic; real curation keeps the canonical source's copy or
    * the longest fetch — the policy IS a knob, so it's a parameter.
    *
    * Scale shape: components from the pair frame (O(diameter) rounds),
    * one id-keyed join to fetch the policy attributes (text never
    * rides), one per-component top-1 window (row_number <= 1 plans a
    * WindowGroupLimit, so each map partition pre-reduces to one
    * candidate row per component before the exchange — the map-side-
    * combine equivalent for windows), one anti-join. Works for ANY
    * orderable id and priority type (including struct priorities);
    * null priorities sort last (desc null-last default), so a doc
    * with no policy attributes can only survive alone. */
  def dedupSurvivorsByPolicy(docs: DataFrame, idCol: String,
      pairs: DataFrame, priority: Column): DataFrame = {
    val comps = connectedComponents(pairs)
    val labeled = comps.join(
      docs.select(col(idCol).as("id"), priority.as("__prio")), Seq("id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("comp"))
      .orderBy(col("__prio").desc, col("id").asc)
    val keep = labeled
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("id"))
    val losers = comps.select(col("id"))
      .join(keep, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Exact duplicate groups by content fingerprint: one shuffle on a
    * 16-byte digest; survivor = min id (deterministic). */
  def exactByFingerprint(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    docs.select(col(idCol).as("id"),
      TextStats.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(min(col("id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** CCNet-style corpus-wide LINE dedup (Wenzek et al. 2020, public
    * paper): every distinct trimmed non-empty line is kept only at its
    * FIRST occurrence — (doc_id, line_index) lexicographic minimum —
    * and removed everywhere else (including later repeats inside the
    * same document). Kills boilerplate (nav bars, cookie banners,
    * license headers) that per-document dedup can't see.
    *
    * Scale shape: keep-first is `groupBy(line).agg(min(struct(id,pos)))`
    * — NOT a window over the line partition — so partial (map-side)
    * aggregation absorbs hot lines (an empty-ish boilerplate line
    * repeated in millions of docs lands on one reducer as pre-combined
    * partials, not as raw rows). Then one doc-id shuffle to reassemble.
    *
    * Returns (id, n_lines, n_kept, cleaned) — cleaned is the document
    * text rebuilt from its surviving lines in original order ('' when
    * every line was claimed by an earlier document). */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val exploded = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "raw")))
      .select(col("id"), col("pos"), trim(col("raw")).as("line"))
      .filter(length(col("line")) > 0)
    val keepers = exploded
      .groupBy(col("line"))
      .agg(min(struct(col("id"), col("pos"))).as("k"))
      .select(col("k.id").as("id"), col("k.pos").as("pos"), col("line"))
    val reassembled = keepers
      .groupBy(col("id"))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          x => x.getField("line")), "\n").as("cleaned"))
    docs
      .select(col(idCol).as("id"),
        size(Repetition.lines(col(textCol))).as("n_lines"))
      .join(reassembled, Seq("id"), "left")
      .select(col("id"), col("n_lines"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("cleaned"), lit("")).as("cleaned"))
  }

  /** Train/test SPLIT-LEAKAGE audit: content fingerprints that appear
    * in more than one split. Splits are assigned by ID (the right
    * primitive — membership must be stable under re-runs), but
    * duplicated CONTENT carries different ids, so exact copies land on
    * both sides of the train/eval fence and the benchmark leaks into
    * training. This face quantifies that: one row per observed split
    * COMBINATION (e.g. "test+train") with how many distinct
    * fingerprints and documents straddle it. Zero rows = clean split.
    *
    * Scale shape: one shuffle on the 16-byte fingerprint (partial aggs
    * absorb hot content), then a combo-keyed agg over the LEAKED
    * slice only (output scales with the leak, not the corpus). The
    * remedy pipeline is [[exactByFingerprint]] dedup BEFORE splitting
    * — this is the detector that proves you needed it. */
  def crossSplitLeakage(docs: DataFrame, textCol: String,
      splitCol: String): DataFrame =
    docs.select(col(splitCol).as("split"),
      TextStats.fingerprintMd5(col(textCol)).as("fp"))
      .groupBy(col("fp"))
      .agg(array_sort(collect_set(col("split"))).as("splits"),
        count(lit(1)).as("n"))
      .filter(size(col("splits")) >= 2)
      .groupBy(array_join(col("splits"), "+").as("split_combo"))
      .agg(count(lit(1)).as("n_fingerprints"), sum(col("n")).as("n_docs"))

  /** Cross-document EXACT-SUBSTRING duplication via winnowing
    * fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03) — the
    * Spark-first re-expression of suffix-array substring dedup (Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models
    * Better"): a global suffix sort is inherently sequential, so
    * instead every document emits window-minimum k-gram hashes at
    * expected density 2/(w+1)
    * ([[graft.functions.ExprKernels.winnowFingerprints]], one fused
    * codegen pass per row) and shared substrings become a posting-list
    * join. Detection guarantee: any shared NORMALIZED substring of
    * length >= w + k - 1 contributes at least one shared fingerprint
    * to both documents, regardless of where it sits in either.
    *
    * Scale shape: one shuffle on the 8-byte fingerprint. The document-
    * frequency band [2, maxDocFreq] prunes BOTH singleton fingerprints
    * (no duplication evidence — the overwhelming majority of the
    * stream) and boilerplate fingerprints (the n^2 posting-list bomb,
    * same cap discipline as [[jaccardPairs]]), so each surviving
    * posting list yields <= C(maxDocFreq, 2) pairs. The cap caveat
    * carries over: spans shared by more than maxDocFreq documents are
    * deliberately not reported as pairs (route those through
    * [[lineDedup]]-style keep-first instead).
    *
    * Returns (id_a, id_b, n_shared): pairs sharing >= minShared
    * fingerprints, strongest evidence first only by n_shared value. */
  def substringDupPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 8, maxDocFreq: Int = 64, minShared: Int = 2)
      : DataFrame = {
    val fps = docs.select(col(idCol).as("id"),
      explode(graft.functions.VectorExprs.winnow_fingerprints(
        TextStats.normalized(col(textCol)), k, w)).as("fp"))
    // agg+join rather than a count-window (contrast jaccardPairs's
    // measured choice): the df>=2 filter keeps only the tiny duplicated
    // slice, so the partial agg collapses the stream map-side and there
    // is no big both-sides exchange worth reusing
    val dupFps = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDocFreq)
      .select(col("fp"))
    val kept = fps.join(dupFps, Seq("fp"))
    kept.select(col("id").as("id_a"), col("fp"))
      .join(kept.select(col("id").as("id_b"), col("fp")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Per-doc fingerprint novelty: the share of a document's winnowing
    * fingerprints (same k-gram/window scheme as [[substringDupPairs]])
    * that appear in NO other document. Low novelty = the doc is mostly
    * phrases the corpus already has (boilerplate, templates, near-copies
    * below the pair-detection threshold) — a per-document curation
    * score where the pair detectors give a per-PAIR verdict.
    *
    * Scale shape: the same posting-list machinery as the substring
    * detectors — explode is narrow, the document-frequency agg is
    * map-side combined on the fingerprint, and the join back is
    * fp-keyed; no pair enumeration at all, so this stays linear even
    * where the pair detectors need caps. `winnow_fingerprints` emits at
    * least one fingerprint per doc (empty docs hash to a sentinel), so
    * the ratio is total. */
  def fingerprintNovelty(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 16, w: Int = 8): DataFrame = {
    val fps = docs.select(col(idCol).as("id"),
      explode(graft.functions.VectorExprs.winnow_fingerprints(
        TextStats.normalized(col(textCol)), k, w)).as("fp"))
    val dfc = fps.groupBy(col("fp")).agg(count(lit(1)).as("df"))
    fps.join(dfc, Seq("fp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_fp"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_novel"))
      .select(col("id").as("doc_id"), col("n_fp"), col("n_novel"),
        round(col("n_novel").cast("double") / col("n_fp").cast("double"), 6)
          .as("novelty"))
  }

  /** 32-bit SimHash from token hashes: bit j of the fingerprint is the
    * sign of the sum of (+1/-1) votes of each token's j-th hash bit. */
  def simhash32(text: Column): Column = {
    val tokHashes = transform(TextStats.tokens(TextStats.normalized(text)),
      t => Hashing.hash64(t))
    aggregate(
      sequence(lit(0), lit(31)),
      lit(0L),
      (acc, j) => acc + when(
        aggregate(tokHashes, lit(0L),
          (vote, h) => vote + when(call_function("shiftright", h, j.cast("int")) % 2 === 1, 1L).otherwise(-1L))
          > 0, call_function("shiftleft", lit(1L), j.cast("int"))).otherwise(0L))
  }

  /** Hamming distance between two simhashes (bit_count of xor). */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: byte-banding (4 bands of 8 bits) — any
    * shared band -> candidate; verify with hamming <= maxDist. */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, maxBucket: Int = 256): DataFrame = {
    // token hashes materialized as a column (one digest per token), then
    // one native SimHash32 pass — not 32 x T interpreted lambdas
    // pinned: consumed three times (banding + both fingerprint
    // join-backs) and costs one digest per token to rebuild; same
    // caching note as nearDuplicatesFromHashes
    val sh = docs
      .select(col(idCol).as("id"),
        transform(TextStats.tokens(TextStats.normalized(col(textCol))),
          t => Hashing.hash64(t)).as("__th"))
      .select(col("id"),
        graft.functions.VectorExprs.simhash32(col("__th")).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sh.select(col("id"),
      explode(transform(sequence(lit(0), lit(3)), b =>
        struct(b.as("band"),
          (call_function("shiftright", col("sh"), (b * 8).cast("int")) % 256).as("key")))).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    // shared cap + pair helper, then join the fingerprints back onto the
    // (already distinct) pairs — carrying sh through the band join would
    // duplicate it once per shared band instead
    val pairs = cappedBandCandidates(banded, maxBucket)
      .join(sh.select(col("id").as("id_a"), col("sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("sh").as("sh_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming(col("sh_a"), col("sh_b")).as("hamming"))
      .filter(col("hamming") <= maxDist)
    materializeAndRelease(sh, pairs)
  }

  /** Embedding-cosine near-duplicates above a similarity threshold, via
    * random-hyperplane LSH banding — the scale path (round 1 shipped an
    * all-pairs crossJoin here; at 10M embeddings that is 5*10^13 pairs).
    *
    * Shape: per-vector sign signature over `planes` deterministic
    * hyperplanes (narrow map — the plane matrix folds to literals),
    * split into `bands` keys of planes/bands bits; vectors sharing any
    * band key are candidates; exact cosine verifies. Shuffle volume is
    * `bands` ~24-byte rows per vector plus the candidate joins — never
    * the corpus squared. `maxBucket` caps degenerate buckets (e.g. a
    * zero-vector pileup) exactly like the MinHash path.
    *
    * Recall: a pair at cosine >= 0.99 (angle <= 8.1 deg) flips each
    * plane's sign with p ~ 0.045; with 4 bands of 8 bits the miss rate is
    * (1-(1-p)^8)^4 < 1%; exact duplicates always collide. Both the
    * banding and the cap are deterministic, so the whole operator is
    * oracle-mirrorable (QueriesExt writes the identical planes into the
    * DuckDB SQL). */
  def embeddingNearDups(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, dims: Int, planes: Int = 32, bands: Int = 4,
      maxBucket: Int = 1000): DataFrame = {
    require(planes % bands == 0, s"planes ($planes) must divide into bands ($bands)")
    require(planes / bands <= 62, "band keys must fit a long")
    val r = planes / bands
    val e = emb.select(col(idCol).as("id"),
      col(vecCol).cast("array<double>").as("e"))
    // sign bits on the RAW vector (scale-invariant, so normalization is
    // unnecessary — and the oracle's list_dot_product sees the same input)
    def bandKey(b: Int): Column =
      (0 until r).map { j =>
        val p = b * r + j
        when(SimSearch.dot(SimSearch.planeArray(p, dims), col("e")) >= 0,
          lit(1L << j)).otherwise(lit(0L))
      }.reduce(_ + _)
    val banded = e.select(col("id"),
      explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"), bandKey(b).as("key"))): _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = cappedBandCandidates(banded, maxBucket)
    val nv = emb.select(col(idCol).as("id"),
      SimSearch.normalize(col(vecCol)).as("v"))
    cands
      .join(nv.withColumnsRenamed(Map("id" -> "id_a", "v" -> "v_a")), Seq("id_a"))
      .join(nv.withColumnsRenamed(Map("id" -> "id_b", "v" -> "v_b")), Seq("id_b"))
      .withColumn("cosine", SimSearch.dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** INCREMENTAL near-dup detection: a new batch (today's crawl) checked
    * against an existing indexed corpus — the production shape of
    * dedup, where re-pairing the whole corpus per crawl would be
    * O(corpus) daily. Returns (batch_id, index_id, jaccard >= threshold)
    * pairs; callers anti-join the batch against it to admit only novel
    * documents, and append the survivors' signatures to the index.
    *
    * Same MinHash/LSH machinery as [[nearDuplicates]], but the band join
    * is batch -> index (never a self-join of either side). The
    * hot-bucket cap applies to the INDEX side: a boilerplate band key
    * with a huge index posting list is dropped, so each batch row joins
    * at most bands x maxBucket index rows — work per crawl is
    * O(|batch|), independent of corpus size. (An uncapped boilerplate
    * batch key meets only capped index buckets, so fanout stays
    * bounded without capping the batch.) */
  def incrementalNearDups(index: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, threshold: Double = 0.8, shingleN: Int = 3,
      k: Int = 16, bands: Int = 4, maxBucket: Int = 64): DataFrame = {
    require(k % bands == 0,
      s"signature length k=$k must be a multiple of bands=$bands")
    val rowsPerBand = k / bands
    val hi = hashedShingleFrame(index, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val hb = hashedShingleFrame(batch, idCol, textCol, shingleN)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // index-explode with sig as a pass-through attribute — see
    // lshCandidatesFromHashes (avoids per-band minhash_sig re-eval)
    def banded(h: DataFrame): DataFrame = h
      .select(col("id"),
        graft.functions.VectorExprs.minhash_sig(col("h"), k).as("sig"))
      .select(col("id"), col("sig"),
        explode(sequence(lit(0), lit(bands - 1), lit(1))).as("band"))
      .select(col("id"), col("band"),
        Hashing.hash64(concat_ws(",",
          slice(col("sig"), col("band") * rowsPerBand + 1,
            lit(rowsPerBand)))).as("key"))
    val indexCapped = banded(hi)
      .withColumn("bucket_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("band"), col("key"))))
      .filter(col("bucket_size") <= maxBucket)
    val cands = banded(hb)
      .select(col("id").as("batch_id"), col("band"), col("key"))
      .join(indexCapped.select(col("id").as("index_id"), col("band"),
        col("key")), Seq("band", "key"))
      .select(col("batch_id"), col("index_id")).distinct()
    val pairs = cands
      .join(hb.withColumnsRenamed(Map("id" -> "batch_id", "h" -> "h_b")),
        Seq("batch_id"))
      .join(hi.withColumnsRenamed(Map("id" -> "index_id", "h" -> "h_i")),
        Seq("index_id"))
      .withColumn("jaccard", jaccard(col("h_b"), col("h_i")))
      .filter(col("jaccard") >= threshold)
      .select(col("batch_id"), col("index_id"), col("jaccard"))
    val result = pairs.localCheckpoint(true)
    hi.unpersist(false)
    hb.unpersist(false)
    result
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public): semantic
    * deduplication — cluster the embedding space with k-means, then
    * compare pairs only WITHIN each cluster and drop documents whose
    * embedding cosine to a kept cluster-mate exceeds `threshold`.
    * Catches paraphrases and re-renderings that share no n-grams (so
    * MinHash/SimHash can't see them) without ever comparing across
    * clusters.
    *
    * Spark shape: centroids are the deterministic smallest-id corpus
    * sample, optionally Lloyd-refined ([[SimSearch.lloydRefine]];
    * `meanRound` makes the refined centroids bit-identical across
    * engines). Assignment is [[SimSearch.assignLists]]' zero-Exchange
    * map-side argmax; within-cluster pairing routes through the SAME
    * [[cappedBandCandidates]] helper as every banded dedup path (band 0,
    * key = cluster id), so a degenerate mega-cluster is frequency-capped
    * instead of producing an O(c^2) join. At 100 TB, `nlist` scales with
    * corpus size (the paper uses ~100k clusters for LAION-scale) so
    * E[cluster] stays small and the pair stage is linear — and as of
    * r11 the DEFAULT does this: `nlist <= 0` auto-derives sqrt sizing
    * and `maxCluster <= 0` scales the cap with E[cluster]
    * ([[SimSearch.autoNlist]] / [[SimSearch.autoMaxCluster]], the same
    * contract as the ANN faces), with Lloyd training on
    * [[SimSearch.trainedCentroids]]' bounded smallest-id sample. The
    * only shuffles are the cluster-id candidate join and the two
    * (16-byte id, vector) verify join-backs.
    *
    * Returns verified pairs (id_a, id_b, cosine >= threshold); compose
    * with [[dedupSurvivors]] for end-to-end removal (cluster-internal
    * transitivity handled there, same as the lexical paths). */
  def semanticDedupPairs(emb: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 0, lloydRounds: Int = 0,
      meanRound: Int = -1, maxCluster: Int = 0): DataFrame = {
    val v = emb.select(col(idCol).as("id"),
      SimSearch.normalize(SimSearch.toDouble(col(vecCol))).as("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // count ONLY when auto-sizing is requested (ADVICE r11 #2):
    // explicit nlist + maxCluster must not pay an eager full-count job
    val n = if (nlist > 0 && maxCluster > 0) -1L else v.count()
    val nl = if (nlist > 0) nlist else SimSearch.autoNlist(n)
    val mc = if (maxCluster > 0) maxCluster
      else SimSearch.autoMaxCluster(n, nl)
    val cents = SimSearch.trainedCentroids(v, nl, lloydRounds, meanRound, n)
    val banded = SimSearch.assignLists(v, cents, 1)
      .select(col("id"), lit(0).as("band"), col("list_id").as("key"))
    val cands = cappedBandCandidates(banded, mc)
    val pairs = cands
      .join(v.withColumnsRenamed(Map("id" -> "id_a", "v" -> "v_a")), Seq("id_a"))
      .join(v.withColumnsRenamed(Map("id" -> "id_b", "v" -> "v_b")), Seq("id_b"))
      .withColumn("cosine", SimSearch.dot(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
    materializeAndRelease(v, pairs)
  }

}
