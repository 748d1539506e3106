package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Statistical language-model scoring for corpus curation — the CCNet /
  * DSIR tier: score every document against distributions ESTIMATED FROM
  * THE CORPUS ITSELF (or a target slice of it), no shipped model weights.
  *
  *  - [[unigramLogProb]] is the CCNet-style quality signal (Wenzek et
  *    al. 2020 use a pretrained KenLM; the self-trained unigram variant
  *    keeps the identical pipeline shape — train counts, score docs by
  *    average log-probability, filter by percentile).
  *  - [[importanceWeights]] is DSIR (Xie et al. 2023 "Data Selection
  *    for Language Models via Importance Resampling"): hashed n-gram
  *    features, per-bucket log-ratio of target vs corpus unigram
  *    distributions, per-doc summed importance weight.
  *
  * Scale shape: both are "small model, huge corpus" operators — the
  * learned table (vocab counts / 2^k hash buckets) is tiny relative to
  * the corpus, so training is ONE shuffle (token count aggregation,
  * map-side combined) and scoring is a BROADCAST join over the exploded
  * token stream followed by one per-doc aggregation. Nothing iterates;
  * nothing is collected to the driver except two scalar totals. At
  * 100 TB the hashed-bucket variant is the safe default (bounded table
  * regardless of vocab growth), which is exactly why DSIR hashes.
  *
  * Determinism for the oracle: per-entry log-probabilities are rounded
  * at 8 decimals BEFORE the per-doc sum (ln() may differ in the last
  * ulp across libm implementations; at 1e-8 granularity both engines
  * agree), then summed as DECIMAL(28,14) — exact and order-free — so
  * per-doc scores are bit-stable across engines and partitionings. */
object LangModel {

  /** Per-document average log-probability under an add-one-smoothed
    * unigram LM trained on `docs` itself: p(w) = (c(w)+1) / (N+V).
    * Returns (id, n_tok, avg_logp); higher = more "in-distribution".
    * Empty docs are kept with n_tok = 0 and NULL avg_logp. */
  def unigramLogProb(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      explode(TextStats.tokens(TextStats.normalized(col(textCol))))
        .as("tok"))
    val counts = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = counts.agg(sum(col("c")), count(lit(1))).head()
    // sum() over an empty vocab frame is NULL — fail with a clear
    // message instead of an NPE (mirrors logisticFit's require(n > 0))
    val nBoxed = tot.getAs[java.lang.Long](0)
    require(nBoxed != null,
      "unigramLogProb: corpus has zero tokens (all documents empty or " +
        "whitespace) — cannot train a unigram LM")
    val n = nBoxed.longValue(); val v = tot.getLong(1)
    // one ln per VOCAB ENTRY (not per token instance), rounded at 8
    // places so libm last-ulp differences cannot reach the sum
    val lp = counts.withColumn("lp",
      round(log((col("c") + 1).cast("double") / lit((n + v).toDouble)), 8))
    val scored = toks.join(broadcast(lp.select(col("tok"), col("lp"))), "tok")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"),
        sum(col("lp").cast("decimal(28,14)")).as("lpsum"))
      .select(col("id"), col("n_tok"),
        (col("lpsum").cast("double") / col("n_tok")).as("avg_logp"))
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        col("avg_logp"))
  }

  /** DoReMi-style domain weights (Xie et al. 2023 "DoReMi: Optimizing
    * data mixtures speeds up language model pretraining" — public):
    * the published pipeline's FINAL step, exponential reweighting of
    * domain shares by excess loss, smoothed with uniform:
    *
    *   w_d  ∝  exp(eta * (loss_d - global_loss)),
    *   weight_d = (1 - s) * softmax_d + s / D.
    *
    * Harder-than-average domains get upweighted — the mixture a proxy
    * run hands to the main run. Loss here is the self-trained unigram
    * NLL ([[unigramLogProb]]) — the same honest-proxy tier as
    * q_lm_score (the full method re-trains the proxy per round; with a
    * FIXED loss the iteration collapses algebraically to one step, so
    * one step is what ships — no fake unrolling).
    *
    * Scale shape: one corpus scoring pass (the unigram machinery);
    * everything after lives on the DOMAIN frame. Float discipline:
    * per-doc NLL rounded at 8 and decimal-summed per domain; the
    * global sums are WINDOW sums of the decimals (exact, order-free —
    * a double window sum would depend on partition order); exp output
    * rounded at 8 before the softmax's decimal normalizer. */
  def doremiWeights(docs: DataFrame, idCol: String, textCol: String,
      domainCol: String, eta: Double = 5.0, smoothing: Double = 0.1)
      : DataFrame = {
    require(eta > 0.0, s"eta must be positive: $eta")
    require(smoothing >= 0.0 && smoothing < 1.0,
      s"smoothing must lie in [0, 1): $smoothing")
    val W = org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(docs, idCol, textCol)
      .filter(col("n_tok") > 0)
      .join(docs.select(col(idCol).as("id"), col(domainCol).as("domain")),
        Seq("id"))
    val byDom = scored.groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(round(-col("avg_logp"), 8).cast("decimal(28,14)")).as("sdec"))
    val withG = byDom
      .withColumn("gs", sum(col("sdec")).over(W.partitionBy(lit(1))))
      .withColumn("gn", sum(col("n_docs")).over(W.partitionBy(lit(1))))
      .withColumn("d", count(lit(1)).over(W.partitionBy(lit(1))))
      .withColumn("mean_nll",
        col("sdec").cast("double") / col("n_docs").cast("double"))
      .withColumn("excess", round(col("mean_nll") -
        col("gs").cast("double") / col("gn").cast("double"), 8))
      .withColumn("e", round(exp(lit(eta) * col("excess")), 8))
    withG
      .withColumn("z",
        sum(col("e").cast("decimal(28,14)")).over(W.partitionBy(lit(1)))
          .cast("double"))
      .select(col("domain"), col("n_docs"),
        round(col("mean_nll"), 6).as("mean_nll"),
        round(col("excess"), 6).as("excess"),
        round(lit(1.0 - smoothing) * col("e") / col("z") +
          lit(smoothing) / col("d").cast("double"), 6).as("weight"))
  }

  /** Per-document average log-probability under an INTERPOLATED BIGRAM
    * LM trained on `docs` itself — one order up from [[unigramLogProb]],
    * a step toward the 5-gram KenLM the published CCNet pipeline scores
    * with (Wenzek et al. 2020). Per bigram position i (i >= 1):
    *
    *   p(w_i | w_{i-1}) = lambda * c(w_{i-1} w_i) / c(w_{i-1})
    *                    + (1 - lambda) * (c(w_i) + 1) / (N + V)
    *
    * i.e. Jelinek-Mercer interpolation of the bigram MLE with the
    * add-one unigram (the MLE's conditioning count c(w_{i-1}) is always
    * >= 1 because the model is trained on the scored corpus itself).
    * Returns (id, n_bigrams, avg_logp); docs with fewer than 2 tokens
    * keep n_bigrams = 0 and NULL avg_logp. A doc of globally common
    * WORDS in an unusual ORDER now scores below the same words in their
    * common order — the context signal the unigram scorer cannot see.
    *
    * Scale shape: same "small model, huge corpus" contract as the
    * unigram scorer — training is count aggregation (map-side combined,
    * one shuffle per order), and the learned table is vocabulary-scale
    * (bigram TYPES grow sublinearly in corpus size by Heaps' law), not
    * corpus-scale. Scoring joins the exploded bigram stream to that
    * table; the join is left unhinted so AQE broadcasts it while it
    * fits and degrades to a shuffle hash join when a 100 TB corpus's
    * bigram vocabulary outgrows the broadcast threshold — unlike the
    * unigram path, that fallback is the expected regime at full scale.
    *
    * Determinism for the oracle: `lambda` must be binary-exact (the
    * 0.75 default is) so both engines form bit-identical interpolation
    * terms from exact integer counts; the single ln per bigram TYPE is
    * rounded at 8 decimals before the exact DECIMAL(28,14) per-doc sum
    * (the [[unigramLogProb]] libm discipline). */
  def bigramLogProb(docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    require(lambda > 0 && lambda < 1, s"lambda must be in (0,1): $lambda")
    val base = docs.select(col(idCol).as("id"),
      TextStats.tokens(TextStats.normalized(col(textCol))).as("t"))
    val toks = base.select(col("id"), explode(col("t")).as("tok"))
    val uni = toks.groupBy("tok").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")), count(lit(1))).head()
    val nBoxed = tot.getAs[java.lang.Long](0)
    require(nBoxed != null,
      "bigramLogProb: corpus has zero tokens (all documents empty or " +
        "whitespace) — cannot train a bigram LM")
    val n = nBoxed.longValue(); val v = tot.getLong(1)
    // adjacent pairs via a narrow per-row transform (no self-join, no
    // window): slice off the last token and pair each with its successor
    val bg = base.filter(size(col("t")) >= 2)
      .select(col("id"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(w, i) -> struct(w as w1, element_at(t, i + 2) as w2))")).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bic = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val lp = bic
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), "w2")
      .withColumn("lp", round(log(
        lit(lambda) * (col("c12").cast("double") / col("c1").cast("double"))
          + lit(1.0 - lambda)
            * ((col("c2") + 1).cast("double") / lit((n + v).toDouble))), 8))
    val scored = bg.join(lp.select("w1", "w2", "lp"), Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(28,14)")).as("lpsum"))
      .select(col("id"), col("n_bigrams"),
        (col("lpsum").cast("double") / col("n_bigrams")).as("avg_logp"))
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp"))
  }

  /** Per-document average log-probability under an INTERPOLATED
    * KNESER-NEY bigram LM trained on `docs` itself (Kneser & Ney 1995;
    * Chen & Goodman 1998 "An Empirical Study of Smoothing Techniques
    * for Language Modeling" — the smoothing KenLM implements, hence
    * what the published CCNet scorer actually runs). Per scored bigram:
    *
    *   p(w2 | w1) = (c(w1 w2) - D) / c(w1 ·)
    *              + (D · N1+(w1 ·) / c(w1 ·)) · (N1+(· w2) / N1+(· ·))
    *
    * with D = 0.75 (binary-exact; Chen & Goodman's n1/(n1+2·n2)
    * estimate is corpus-dependent and not an IEEE-exact literal),
    * c(w1 ·) the left-context bigram total, N1+(w1 ·) the count of
    * DISTINCT continuations of w1, N1+(· w2) the count of DISTINCT
    * left contexts of w2, and N1+(· ·) the total bigram-type count.
    * The lower-order distribution is the KN insight: it is the
    * CONTINUATION distribution, not the unigram — "francisco" may be
    * frequent, but if it only ever follows "san" its continuation
    * probability stays tiny, exactly the novelty signal a
    * boilerplate-heavy crawl corpus needs and the Jelinek-Mercer mix
    * ([[bigramLogProb]]) cannot see. The discounted term is always > 0
    * here (the model is trained on the scored corpus itself, so every
    * scored bigram has c >= 1 > D). Returns (id, n_bigrams, avg_logp);
    * docs with fewer than 2 tokens keep n_bigrams = 0 and NULL score.
    *
    * Scale shape: identical to [[bigramLogProb]] — training is one
    * count aggregation over the exploded bigram stream (map-side
    * combined); the context totals, continuation counts, and type
    * total all derive from the TYPE table (vocabulary-scale by Heaps'
    * law, not corpus-scale); scoring joins the bigram stream to the
    * scored type table, unhinted so AQE broadcasts while it fits. The
    * only driver-collected value is the type-count scalar.
    *
    * Determinism for the oracle: D is binary-exact, every ratio is an
    * IEEE divide of exact integer counts in a parenthesized op order
    * mirrored verbatim in the SQL, and the single ln per bigram TYPE is
    * rounded at 8 decimals before the DECIMAL(28,14) per-doc sum. */
  def kneserNeyLogProb(docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must lie in (0, 1): $discount")
    val base = docs.select(col(idCol).as("id"),
      TextStats.tokens(TextStats.normalized(col(textCol))).as("t"))
    val bg = base.filter(size(col("t")) >= 2)
      .select(col("id"), explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(w, i) -> struct(w as w1, element_at(t, i + 2) as w2))")).as("b"))
      .select(col("id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val bic = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    // context totals + distinct-continuation counts: one pass each over
    // the TYPE table, never the token stream
    val lft = bic.groupBy("w1")
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("nf"))
    val rgt = bic.groupBy("w2").agg(count(lit(1)).as("nb"))
    val tBoxed = bic.agg(count(lit(1))).head().getLong(0)
    require(tBoxed > 0,
      "kneserNeyLogProb: corpus has no bigrams (every document shorter " +
        "than 2 tokens) — cannot train a bigram LM")
    val tD = tBoxed.toDouble
    val lp = bic.join(lft, "w1").join(rgt, "w2")
      .withColumn("lp", round(log(
        ((col("c12").cast("double") - lit(discount))
          / col("c1").cast("double"))
          + (((lit(discount) * col("nf").cast("double"))
            / col("c1").cast("double"))
            * (col("nb").cast("double") / lit(tD)))), 8))
    val scored = bg.join(lp.select("w1", "w2", "lp"), Seq("w1", "w2"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lp").cast("decimal(28,14)")).as("lpsum"))
      .select(col("id"), col("n_bigrams"),
        (col("lpsum").cast("double") / col("n_bigrams")).as("avg_logp"))
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        col("avg_logp"))
  }

  /** Trigram STUPID BACKOFF scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the scheme invented
    * precisely for MapReduce-scale LMs: no normalization, no
    * discounting state, just counts and a constant backoff factor):
    *
    *   S(w3 | w1 w2) = c(w1 w2 w3) / c(w1 w2)           if seen
    *                 | lambda  * c(w2 w3) / c(w2)        else if seen
    *                 | lambda^2 * (c(w3)+1) / (N+V)      otherwise
    *
    * trained on the `isTrain` slice and scored over ALL docs — the
    * held-out-scoring shape (scoring the training slice itself never
    * exercises backoff; a cross-slice score exercises all three tiers).
    * The final unigram tier is add-one smoothed (the [[unigramLogProb]]
    * convention) so unseen words score finite. Backoff factor is 0.5
    * (binary-exact for the oracle; Brants' 0.4 is not an IEEE-exact
    * literal — at the diagnostic level the constant is arbitrary).
    * Returns (id, n_trigrams, avg_logp); docs with < 3 tokens keep
    * n_trigrams = 0 and NULL score.
    *
    * Scale shape: training = three count aggregations over the exploded
    * train stream (map-side combined); the score table is built over
    * the DISTINCT trigram types of the scored stream (Heaps-law
    * sublinear) via LEFT joins to the three count tables; scoring joins
    * the per-doc trigram stream to that table. Unhinted joins — AQE
    * broadcasts while tables fit, shuffles when they outgrow it (the
    * expected regime at 100 TB, exactly why Brants et al. shard counts).
    *
    * Determinism: one ln per trigram TYPE rounded at 8 before the
    * DECIMAL(28,14) per-doc sum; every ratio is an IEEE divide of
    * exact counts scaled by binary-exact constants. */
  def stupidBackoff(docs: DataFrame, idCol: String, textCol: String,
      isTrain: Column): DataFrame = {
    val base = docs.select(col(idCol).as("id"), isTrain.as("trn"),
      TextStats.tokens(TextStats.normalized(col(textCol))).as("t"))
    def grams(df: DataFrame, n: Int): DataFrame = {
      val cols = (1 to n).map(k => s"element_at(t, i + $k) as w$k")
        .mkString(", ")
      df.filter(size(col("t")) >= n)
        .select(col("id"), explode(expr(
          s"transform(sequence(0, size(t) - $n), i -> struct($cols))"))
          .as("g"))
        .select(col("id") +: (1 to n).map(k => col(s"g.w$k").as(s"w$k")): _*)
    }
    val train = base.filter(col("trn"))
    val uni = grams(train, 1).groupBy("w1").agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c")), count(lit(1))).head()
    val nBoxed = tot.getAs[java.lang.Long](0)
    require(nBoxed != null,
      "stupidBackoff: training slice has zero tokens — cannot train")
    val nv = (nBoxed.longValue() + tot.getLong(1)).toDouble
    val bi = grams(train, 2).groupBy("w1", "w2").agg(count(lit(1)).as("c"))
    val tri = grams(train, 3).groupBy("w1", "w2", "w3")
      .agg(count(lit(1)).as("c"))
    // score one row per trigram TYPE of the scored stream
    val stream = grams(base, 3)
    val types = stream.select(col("w1"), col("w2"), col("w3")).distinct()
      .join(tri.withColumnRenamed("c", "c3"), Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("w1"), col("w2"), col("c").as("ctx2")),
        Seq("w1", "w2"), "left")
      .join(bi.select(col("w1").as("w2"), col("w2").as("w3"),
        col("c").as("c2")), Seq("w2", "w3"), "left")
      .join(uni.select(col("w1").as("w2"), col("c").as("c1ctx")),
        Seq("w2"), "left")
      .join(uni.select(col("w1").as("w3"), col("c").as("c1")),
        Seq("w3"), "left")
    val s = when(coalesce(col("c3"), lit(0L)) > 0,
        col("c3").cast("double") / col("ctx2").cast("double"))
      .when(coalesce(col("c2"), lit(0L)) > 0,
        lit(0.5) * (col("c2").cast("double") / col("c1ctx").cast("double")))
      .otherwise(lit(0.25)
        * ((coalesce(col("c1"), lit(0L)) + 1).cast("double") / lit(nv)))
    val lp = types.withColumn("lp", round(log(s), 8))
      .select(col("w1"), col("w2"), col("w3"), col("lp"))
    val scored = stream.join(lp, Seq("w1", "w2", "w3"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_trigrams"),
        sum(col("lp").cast("decimal(28,14)")).as("lpsum"))
      .select(col("id"), col("n_trigrams"),
        (col("lpsum").cast("double") / col("n_trigrams")).as("avg_logp"))
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        col("avg_logp"))
  }

  /** CCNet's selection step (Wenzek et al. 2020): split the corpus into
    * head / middle / tail TERCILES of LM score per language — the
    * published pipeline keeps "head" (most in-distribution) for
    * training and drops or down-weights the tail. Consumes
    * [[unigramLogProb]]'s score; returns one row per scored doc:
    * (id, group, n_tok, score_r, bucket). Docs with zero tokens are
    * excluded (they have no score).
    *
    * Scale shape — deliberately NOT a per-language global sort
    * (`ntile` would funnel every doc of a language through one
    * partition): bucket cutoffs derive from a HISTOGRAM of the
    * @6-rounded score. The histogram's cardinality is bounded by the
    * score GRID (score range x 1e6 buckets), not the corpus, so the
    * per-language cumulative window runs over histogram rows only;
    * assignment back to docs is a broadcast join + comparison (narrow
    * map). Ties AT a cutoff all take the better bucket, so tercile
    * sizes are approximate by design — the honest histogram semantics,
    * and deterministic without any per-doc tiebreak.
    *
    * Determinism for the oracle: the score is rounded at 6 BEFORE the
    * histogram in both engines (the [[unigramLogProb]] discipline), and
    * cutoffs are exact integer-arithmetic picks over exact counts. */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
      groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = unigramLogProb(docs, idCol, textCol)
      .filter(col("n_tok") > 0)
      .join(docs.select(col(idCol).as("id"), col(groupCol).as("grp")), "id")
      .withColumn("s", round(col("avg_logp"), 6))
    val hist = scored.groupBy(col("grp"), col("s"))
      .agg(count(lit(1)).as("c"))
    val cum = hist
      .withColumn("cum", sum(col("c"))
        .over(Window.partitionBy(col("grp")).orderBy(col("s").desc)))
      .withColumn("n", sum(col("c")).over(Window.partitionBy(col("grp"))))
    // head cutoff = highest score whose best-first cumulative count
    // reaches ceil(n/3); middle cutoff likewise at ceil(2n/3)
    val cuts = cum.groupBy(col("grp")).agg(
      max(when(expr("cum >= (n + 2) div 3"), col("s"))).as("c1"),
      max(when(expr("cum >= (2 * n + 2) div 3"), col("s"))).as("c2"))
    scored.join(broadcast(cuts), "grp")
      .select(col("id"), col("grp"), col("n_tok"), col("s").as("score_r"),
        when(col("s") >= col("c1"), "head")
          .when(col("s") >= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DSIR importance weight per document: unigram tokens hashed into
    * `buckets` features; per-bucket log-ratio
    * ln((ct+1)/(Nt+B)) - ln((cc+1)/(Nc+B)) between the target slice
    * (`isTarget`) and the whole corpus; per-doc weight = sum of its
    * token instances' bucket ratios. Positive = target-like. Returns
    * (id, n_tok, weight); empty docs keep n_tok = 0, NULL weight. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 4096): DataFrame = {
    val toks = docs.select(col(idCol).as("id"), isTarget.as("tgt"),
      explode(TextStats.tokens(TextStats.normalized(col(textCol))))
        .as("tok"))
      .withColumn("b", Hashing.hash64(col("tok")) % buckets)
    // one aggregation computes both distributions (conditional count)
    val counts = toks.groupBy("b").agg(
      count(lit(1)).as("cc"),
      count(when(col("tgt"), 1)).as("ct"))
    val tot = counts.agg(sum(col("cc")), sum(col("ct"))).head()
    // both sums are NULL on a zero-token corpus — fail descriptively
    val ncBoxed = tot.getAs[java.lang.Long](0)
    require(ncBoxed != null,
      "importanceWeights: corpus has zero tokens (all documents empty " +
        "or whitespace) — cannot estimate unigram distributions")
    val nc = ncBoxed.longValue(); val nt = tot.getLong(1)
    val ratio = counts.withColumn("lr",
      round(log((col("ct") + 1).cast("double") / lit((nt + buckets).toDouble))
        - log((col("cc") + 1).cast("double") / lit((nc + buckets).toDouble)),
        8))
    val scored = toks.join(broadcast(ratio.select(col("b"), col("lr"))), "b")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tok"),
        sum(col("lr").cast("decimal(28,14)")).as("wsum"))
      .select(col("id"), col("n_tok"),
        col("wsum").cast("double").as("weight"))
    docs.select(col(idCol).as("id")).join(scored, Seq("id"), "left")
      .select(col("id"), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        col("weight"))
  }
}
