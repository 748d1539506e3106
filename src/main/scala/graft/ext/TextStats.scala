package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text analysis for training-data pipelines (BASELINE.json north star):
  * tokenization, quality scoring, language ID, fingerprinting. Everything
  * is built-in-function Columns (whole-stage codegen, no UDFs), so each
  * operator is a narrow map over the scan — embarrassingly parallel at
  * 100 TB, no shuffle anywhere except caller-requested aggregations.
  */
object TextStats {

  /** Whitespace tokenization (split on runs of whitespace, no empties). */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** BPE-ish subword proxy: letter runs, digit runs, single punctuation.
    * A real BPE vocab is environment data we don't ship; this regex gives
    * a deterministic, portable token count with the same shape. */
  val bpeishPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(bpeishPattern), lit(0)))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Quality features (length / punctuation / stopword ratios — the
    * C4/Gopher-style heuristics). All exact-integer derived. */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for",
    "with", "at", "by", "from", "as", "that", "this", "it", "be")

  def withQualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    // tokens materialized once as a column — inlining it into every
    // consumer would re-tokenize per higher-order element (see
    // Dedup.hashedShingleFrame)
    val staged = df.withColumn("__toks", tokens(t))
    val toks = col("__toks")
    val nTok = size(toks)
    val nStop = size(filter(toks, tk => lower(tk).isInCollection(stopwords)))
    val nPunct = size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val nChar = length(t)
    val tokChars = aggregate(toks, lit(0), (acc, tk) => acc + length(tk))
    staged.withColumn("n_chars_m", nChar)
      .withColumn("n_tokens", nTok)
      .withColumn("n_stopwords", nStop)
      .withColumn("n_punct", nPunct)
      .withColumn("avg_token_len",
        when(nTok > 0, tokChars.cast("double") / nTok).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nTok > 0, nStop.cast("double") / nTok).otherwise(0.0))
      .withColumn("punct_ratio",
        when(nChar > 0, nPunct.cast("double") / nChar).otherwise(0.0))
      .drop("__toks")
  }

  /** FUSED quality + language-ID pass (r11): column-for-column,
    * bit-for-bit identical to
    * `withLangId(qualityScore(df, textCol), textCol)` — pinned by
    * TextStatsSpec — but tokenizes ONCE. The composed form splits the
    * text twice (qualityScore stages raw tokens, withLangId stages
    * lowered tokens of the lowered text); since [[tokens]] splits on
    * whitespace and lowercasing never changes whitespace,
    * `tokens(lower(t)) == transform(tokens(t), lower)`, so one split
    * feeds both the quality features (raw + per-token-lowered stopword
    * check) and the per-language hit counts. This is the filter stage
    * of the curation funnel — the composed 100x rehearsal measured it
    * as the top wall consumer (53.3 s of 104.8 s, SCALE.md r11) — so
    * the single-pass form is what [[graft.ext.CorpusPipeline.clean]]
    * ships; the two-op composition stays for a-la-carte use. */
  def qualityLangScore(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val staged = df.withColumn("__toks", tokens(t))
      .withColumn("__ltoks", transform(col("__toks"), tk => lower(tk)))
    val toks = col("__toks")
    val ltoks = col("__ltoks")
    val nTok = size(toks)
    val nStop = size(filter(ltoks, tk => tk.isInCollection(stopwords)))
    val nPunct = size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]"), lit(0)))
    val nChar = length(t)
    val tokChars = aggregate(toks, lit(0), (acc, tk) => acc + length(tk))
    val feats = staged.withColumn("n_chars_m", nChar)
      .withColumn("n_tokens", nTok)
      .withColumn("n_stopwords", nStop)
      .withColumn("n_punct", nPunct)
      .withColumn("avg_token_len",
        when(nTok > 0, tokChars.cast("double") / nTok).otherwise(0.0))
      .withColumn("stopword_ratio",
        when(nTok > 0, nStop.cast("double") / nTok).otherwise(0.0))
      .withColumn("punct_ratio",
        when(nChar > 0, nPunct.cast("double") / nChar).otherwise(0.0))
      .withColumn("quality_score",
        round(
          when(col("n_tokens") >= 10 && col("n_tokens") <= 100000, 0.4)
            .otherwise(0.0)
            + when(col("stopword_ratio") >= 0.05, 0.3).otherwise(0.0)
            + when(col("punct_ratio") <= 0.2, 0.3).otherwise(0.0), 2))
    val langs = langStopwords.toSeq.sortBy(_._1)
    val withHits = langs.foldLeft(feats) { case (d, (lang, words)) =>
      d.withColumn(s"__h_$lang",
        size(array_intersect(ltoks, array(words.map(lit): _*))))
    }
    val hits = langs.map { case (l, _) => col(s"__h_$l") }
    val g = greatest(hits: _*)
    val pick = langs.foldRight(lit("und"): Column) { case ((l, _), rest) =>
      when(col(s"__h_$l") === g, lit(l)).otherwise(rest)
    }
    withHits
      .withColumn("predicted", when(g === 0, lit("und")).otherwise(pick))
      .drop("__toks" +: "__ltoks" +: langs.map(l => s"__h_${l._1}"): _*)
  }

  /** Gopher-style keep/drop quality score in [0,1]: rewards mid-length
    * docs with some stopwords and low punctuation noise. Deterministic
    * integer/ratio arithmetic only. */
  def qualityScore(df: DataFrame, textCol: String): DataFrame =
    withQualityFeatures(df, textCol).withColumn("quality_score",
      round(
        when(col("n_tokens") >= 10 && col("n_tokens") <= 100000, 0.4).otherwise(0.0)
          + when(col("stopword_ratio") >= 0.05, 0.3).otherwise(0.0)
          + when(col("punct_ratio") <= 0.2, 0.3).otherwise(0.0), 2))

  /** Fasttext-style model-based quality filter, INFERENCE side: a
    * linear classifier over the deterministic quality features of
    * [[withQualityFeatures]] plus a mid-length indicator. Production
    * pipelines (CCNet, DCLM — public papers) run a trained
    * fasttext/logreg model here; this container has no training libs,
    * so the weight vector is a compile-time literal standing in for an
    * offline-trained model — swapping in real weights changes only the
    * five constants, not the plan. Scale shape: a pure narrow
    * projection (feature extraction + dot product fuse into one
    * codegen'd pass over the scan; no shuffle, no UDF). The score is
    * left-to-right associated so the oracle reproduces it bit-for-bit;
    * `keep` thresholds the raw score at 0 (sigmoid is monotone, so the
    * decision is identical without evaluating exp). */
  val qualityClassifierWeights: (Double, Double, Double, Double, Double) =
    // (bias, w_stopword_ratio, w_punct_ratio, w_avg_token_len, w_len_ok)
    (-0.45, 1.6, -2.4, 0.09, 0.55)

  /** The classifier's expressions over an ALREADY-FEATURED frame
    * ([[withQualityFeatures]] columns present) — shared verbatim by
    * [[classifyQuality]], [[calibrationReport]] and the fused
    * agreement faces (CorpusPipeline), so the single-pass forms cannot
    * fork from the joined originals. */
  private[ext] def classifierLenOk: Column =
    when(col("n_tokens") >= 10 && col("n_tokens") <= 100000,
      1.0).otherwise(0.0)
  private[ext] def classifierLogit: Column = {
    val (b, wStop, wPunct, wAvg, wLen) = qualityClassifierWeights
    // association is load-bearing: ((((b + a) + c) + d) + e) mirrors the
    // oracle's parenthesization, so both engines round identically
    lit(b) + (lit(wStop) * col("stopword_ratio")) +
      (lit(wPunct) * col("punct_ratio")) +
      (lit(wAvg) * col("avg_token_len")) + (lit(wLen) * classifierLenOk)
  }

  def classifyQuality(df: DataFrame, textCol: String): DataFrame = {
    val feats = withQualityFeatures(df, textCol)
    feats.withColumn("len_ok", classifierLenOk)
      .withColumn("quality_logit", classifierLogit)
      .withColumn("keep", classifierLogit > 0.0)
  }

  /** Reliability report for the quality classifier against a reference
    * labeler (the Gopher rules as pseudo-ground-truth): p =
    * sigmoid(quality_logit) is binned into `bins` fixed-width
    * probability bins, and each populated bin reports its mean
    * confidence, observed keep rate, calibration gap (conf - acc), and
    * Brier contribution — the reliability-diagram table a
    * classifier-filtered 100 TB pipeline needs before trusting a keep
    * threshold. FIXED-width bins, deliberately not ntile: a decile
    * ntile is a global total sort (one-partition window), while this
    * is a pure narrow map + one aggregate keyed on 10 bins.
    *
    * Determinism: the sigmoid is the one transcendental — rounded to
    * 12 decimals at birth (the charEntropy ln discipline), after which
    * every statistic is a DECIMAL sum or integer count; divisions are
    * mirrored associations. */
  def calibrationReport(docs: DataFrame, idCol: String, textCol: String,
      bins: Int = 10): DataFrame = {
    require(bins > 0, s"bins must be positive: $bins")
    // fused single pass (r15): the classifier logit and the Gopher
    // pseudo-label are both per-doc narrow columns over the same
    // featured frame — the former two-scan + id-join shape shuffled
    // the corpus twice for nothing. Expressions are the shared
    // [[classifierLogit]] / Repetition.gopherReasons columns, so
    // values are bit-identical to the joined form.
    val feats = withQualityFeatures(
      Repetition.withRepetitionStats(docs, textCol), textCol)
    val j = feats
      .select(col(idCol).as("id"), classifierLogit.as("logit"),
        (Repetition.gopherReasons === "").cast("int").as("y"))
      .withColumn("pr",
        round(lit(1.0) / (lit(1.0) + exp(-col("logit"))), 12))
      .withColumn("bin",
        least(floor(col("pr") * bins), lit(bins - 1).cast("long"))
          .cast("int"))
    val n = count(lit(1))
    j.groupBy(col("bin")).agg(
      n.as("n_docs"),
      round(sum(col("pr").cast("decimal(28,14)")).cast("double") / n, 6)
        .as("conf_r"),
      round(sum(col("y")).cast("double") / n, 6).as("acc_r"),
      round(sum(col("pr").cast("decimal(28,14)")).cast("double") / n
        - sum(col("y")).cast("double") / n, 6).as("gap_r"),
      round(sum(round((col("pr") - col("y")) * (col("pr") - col("y")), 12)
        .cast("decimal(28,14)")).cast("double") / n, 6).as("brier_r"))
  }

  /** Language ID via stopword-hit voting: tiny per-language function-word
    * lists (public knowledge), argmax with deterministic (count desc,
    * lang asc) tie-break. N-gram-free but the same shape as a production
    * n-gram scorer: one codegen'd expression per language, no shuffle. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a", "that", "for", "with"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que", "pour", "dans", "avec"),
    "zh" -> Seq("的", "是", "在", "了", "有", "和", "不", "人", "我", "他"))

  def langScores(text: Column): Seq[(String, Column)] =
    langScoresFromTokens(tokens(lower(text)))

  /** Score = number of DISTINCT function words present (array_intersect
    * is one native set op per doc vs a boxed lambda per token). */
  def langScoresFromTokens(toks: Column): Seq[(String, Column)] =
    langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }

  /** Predicted language: highest hit count, ties to lexicographically
    * smallest language, "und" (undetermined) when zero hits. Prefer
    * [[langIdFromTokens]] over a materialized token column — this
    * convenience form re-tokenizes once per language. */
  def langId(text: Column): Column = langIdFromTokens(tokens(lower(text)))

  /** DataFrame-level language ID with each per-language hit count staged
    * as its own column: the single-Column fold compiles to one huge
    * Janino method (seconds of cold codegen), while staged attributes
    * keep codegen units small and evaluate each intersect once. Adds
    * `predicted`. */
  def withLangId(df: DataFrame, textCol: String): DataFrame = {
    val staged = df.withColumn("__toks", tokens(lower(col(textCol))))
    val langs = langStopwords.toSeq.sortBy(_._1)
    val withHits = langs.foldLeft(staged) { case (d, (lang, words)) =>
      d.withColumn(s"__h_$lang",
        size(array_intersect(col("__toks"), array(words.map(lit): _*))))
    }
    val hits = langs.map { case (l, _) => col(s"__h_$l") }
    val g = greatest(hits: _*)
    val pick = langs.foldRight(lit("und"): Column) { case ((l, _), rest) =>
      when(col(s"__h_$l") === g, lit(l)).otherwise(rest)
    }
    withHits
      .withColumn("predicted", when(g === 0, lit("und")).otherwise(pick))
      .drop("__toks" +: langs.map(l => s"__h_${l._1}"): _*)
  }

  /** Pluggable language-ID seam (VERDICT r8 Next #7): same verdict
    * semantics as [[withLangId]] — score = number of DISTINCT profile
    * words present, argmax with (count desc, lang asc) tie-break, zero
    * hits -> "und" — but the profile is DATA (a (lang, word)
    * DataFrame), not compiled-in literals: a user drops in a real
    * model's exported word/keyword profile (a fastText-style list, a
    * CLD export — anything expressible as per-language word lists)
    * without touching engine code. [[defaultLangProfile]] exposes the
    * shipped [[langStopwords]] as the default; ModelSeamSpec pins (a)
    * default-profile parity with [[withLangId]] on fixture docs and
    * (b) that a custom profile CHANGES verdicts. Adds `predicted`.
    *
    * Scale shape: the profile broadcasts (vocab-bounded; measured at a
    * 50k-word production-size profile the broadcast is ~1 MB and the
    * plan is unchanged — ModelSeamSpec + SCALE.md r11); the doc side
    * explodes DISTINCT tokens and the (id, lang) hit counts aggregate
    * map-side; the per-doc argmax is a WindowGroupLimit top-1. The
    * SCORING path moves only (id, word) rows; document text moves
    * exactly once, in the final enrich join-back that co-partitions
    * the corpus with its verdict table — the inherent cost of
    * attaching a computed column to an unbucketed corpus (bucket the
    * corpus by `idCol` and the join-back goes exchange-free too). */
  def withLangIdProfile(df: DataFrame, idCol: String, textCol: String,
      profile: DataFrame): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__lid")).orderBy(col("__n").desc, col("lang").asc)
    val hits = df.select(col(idCol).as("__lid"),
        explode(array_distinct(tokens(lower(col(textCol))))).as("word"))
      .join(broadcast(profile.select(col("lang"), col("word")).distinct()),
        Seq("word"))
      .groupBy(col("__lid"), col("lang")).agg(count(lit(1)).as("__n"))
    val best = hits.withColumn("__rn", row_number().over(W))
      .filter(col("__rn") === 1)
      .select(col("__lid"), col("lang").as("__pred"))
    df.join(best, df(idCol) === best("__lid"), "left")
      .withColumn("predicted", coalesce(col("__pred"), lit("und")))
      .drop("__lid", "__pred")
  }

  /** The shipped stopword lists as a (lang, word) frame — the default
    * profile for [[withLangIdProfile]]. */
  def defaultLangProfile(spark: org.apache.spark.sql.SparkSession)
      : DataFrame = {
    import spark.implicits._
    langStopwords.toSeq.flatMap { case (l, ws) => ws.map(w => (l, w)) }
      .toDF("lang", "word")
  }

  def langIdFromTokens(toks: Column): Column = {
    val scores = langScoresFromTokens(toks)
    val best = scores.tail.foldLeft(struct(scores.head._2.as("n"), lit(scores.head._1).as("l"))) {
      case (acc, (lang, n)) =>
        when(n > acc.getField("n"), struct(n.as("n"), lit(lang).as("l"))).otherwise(acc)
    }
    when(best.getField("n") > 0, best.getField("l")).otherwise("und")
  }

  /** Top-k keywords per document by tf-idf with LINEAR inverse document
    * frequency: score = tf · N / df. Log-free by design — `ln` is the
    * one place engines' libm may differ by an ulp and break bit-parity;
    * tf·N/df is a single IEEE division of exact integers, identical
    * everywhere, and yields the same per-document ranking family as
    * classic tf-idf (monotone in tf, anti-monotone in df). Ties break
    * (score DESC, token ASC), so top-k is fully deterministic.
    *
    * Scale shape: explode → groupBy(doc, token) [one shuffle, map-side
    * combined] → groupBy(token) for df [second shuffle, tiny output] →
    * join back on token [vocab-keyed, no hot keys after the tf combine]
    * → per-doc top-k via row_number, which Spark rewrites to
    * WindowGroupLimit (map-side k-row heaps, not a full per-doc sort). */
  /** Per-source corpus hygiene stats + keep/drop verdict — the
    * domain-reputation step of a web-scale pipeline (RefinedWeb-style:
    * judge SOURCES, not just documents; a mirror site or template farm
    * shows up as a high within-source duplicate rate long before
    * per-document filters notice).
    *
    * Per source: doc count, within-source exact-dup rate (by content
    * fingerprint), mean tokens/doc, and the corpus-level stopword share
    * (ratio of integer sums — order-free, unlike a mean of per-doc
    * ratios). `keep` = enough docs AND dup rate under the cap.
    *
    * Scale shape: ONE two-level aggregate keyed by source. The distinct
    * fingerprint count partially aggregates on (source, fp) first, so a
    * mega-source's rows spread across the cluster by fingerprint and no
    * single reducer sees a whole source. No text ever shuffles (16-byte
    * digests + integer token counts). */
  /** Zipf rank-frequency diagnostic: OLS fit of ln(count) against
    * ln(rank) over the top `topR` token types — natural text tracks
    * slope ~ -1 with high R^2 (Zipf's law); template/boilerplate spam
    * flattens the head (slope toward 0) and machine-generated noise
    * breaks the linearity (R^2 drops). The screen a curation pipeline
    * runs per source/crawl before trusting its token statistics.
    *
    * Scale shape: one token-count aggregation (map-side combined), a
    * TakeOrderedAndProject top-R (bounded heaps, q_vocab's discipline —
    * rank is assigned AFTER the limit, over R rows), then
    * [[MLFit.simpleLinearFit]]'s one-pass decimal moment sums over R
    * points. Corpus size only affects the count pass.
    *
    * Determinism: ln(rank)/ln(count) rounded at 8 before the decimal
    * moment sums (the libm discipline); ties in the ranking break on
    * token. Returns simpleLinearFit's (n, b0, b1, r2) row. */
  def zipfFit(docs: DataFrame, textCol: String, topR: Int = 500)
      : DataFrame = {
    require(topR >= 2, s"need at least 2 ranks to fit: $topR")
    val counts = docs
      .select(explode(tokens(normalized(col(textCol)))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val top = counts.orderBy(col("c").desc, col("tok").asc).limit(topR)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("c").desc, col("tok").asc)
    val pts = top.withColumn("rank", row_number().over(w))
      .select(round(log(col("rank").cast("double")), 8).as("lx"),
        round(log(col("c").cast("double")), 8).as("ly"))
    MLFit.simpleLinearFit(pts, "lx", "ly")
  }

  /** PMI collocation mining (Church & Hanks 1990): the corpus's top
    * adjacent word pairs by pointwise mutual information
    * ln(p(w1 w2) / (p(w1) p(w2))) — the multi-word-expression /
    * boilerplate-phrase surfacing pass ("los angeles", "click here")
    * run before tokenizer training or phrase-aware dedup. `minCount`
    * suppresses the low-frequency noise PMI is notorious for; the
    * ranking orders by ROUNDED pmi with (w1, w2) tie-breaks so the
    * top-k is deterministic across engines.
    *
    * Scale shape: two count aggregations (unigram + adjacent-bigram,
    * both map-side combined) + a TakeOrderedAndProject top-k. The pair
    * stream is a narrow per-row transform — no self-join anywhere.
    *
    * Determinism: pmi is one ln of a product/quotient chain over exact
    * counts (left-associated identically in the SQL mirror), rounded
    * at 6 BEFORE ranking. */
  def collocations(docs: DataFrame, textCol: String, minCount: Int = 5,
      k: Int = 50): DataFrame = {
    val base = docs.select(tokens(normalized(col(textCol))).as("t"))
    val toks = base.select(explode(col("t")).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val tot = uni.agg(sum(col("c"))).head()
    val nuBoxed = tot.getAs[java.lang.Long](0)
    require(nuBoxed != null, "collocations: corpus has zero tokens")
    val nu = nuBoxed.longValue().toDouble
    val bg = base.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(w, i) -> struct(w as w1, element_at(t, i + 2) as w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val nb = bg.count().toDouble
    val bic = bg.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
    bic
      .join(uni.select(col("tok").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("tok").as("w2"), col("c").as("c2")), Seq("w2"))
      .withColumn("pmi_r", round(log(
        (col("c12").cast("double") * lit(nu) * lit(nu))
          / (lit(nb) * col("c1").cast("double")
            * col("c2").cast("double"))), 6))
      .orderBy(col("pmi_r").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .select(col("w1"), col("w2"), col("c12"), col("pmi_r"))
  }

  /** Per-document character-level Shannon entropy — the gibberish /
    * encoding-noise screen (mojibake, base64 blobs, and key-mash text
    * sit at abnormally HIGH char entropy for their length; run-on
    * repeated characters sit abnormally LOW; natural language
    * occupies a narrow band). Computed over the normalized alphabet
    * ([a-z0-9], spaces dropped), so the distribution has at most 36
    * outcomes and the statistic is comparable across docs.
    *
    * Scale shape: explode to (doc, char) -> one map-side-combined
    * count agg (keys = docs x <=36 chars) -> per-doc decimal sum of
    * rounded -p·ln(p) terms. Linear in corpus chars; the alternative
    * per-row fold avoids the shuffle but cannot be mirrored order-free
    * in SQL — the agg shape is the (doc, gram) discipline used by the
    * oracle-gated repetition stats.
    *
    * Returns (id, n_alnum_chars, n_distinct_chars, entropy_r); docs
    * with no alphanumeric content report zeros. */
  def charEntropy(df: DataFrame, idCol: String, textCol: String)
      : DataFrame =
    withCharEntropy(df.select(col(idCol).as("id"), col(textCol)), textCol)
      .select(col("id"), col("n_alnum_chars"), col("n_distinct_chars"),
        col("entropy_r"))

  /** The per-doc char-entropy statistics as STAGED NARROW columns — no
    * explode, no shuffle, no joins (r15 rewrite; the pre-r15 form
    * exploded one row per character, shuffled (id, ch) counts, and
    * joined the stats back on the id — three exchanges for a per-row
    * statistic). Per doc: the normalized alphabet is <= 36 symbols
    * ([a-z0-9] after space removal), so counting each distinct char
    * with a higher-order filter is O(36 * len) inside one codegen'd
    * projection. Values are BIT-IDENTICAL to the aggregated form: the
    * same round(-p*ln p, 12) terms enter an exact decimal fold (a
    * decimal sum is order-free), then the same cast + round@6. Adds
    * (n_alnum_chars, n_distinct_chars, entropy_r); empty/null text
    * yields (0, 0, 0.0) exactly as the old left-join + fill did.
    * Intermediates are staged columns (the repo-wide HOF discipline:
    * inlining the char array into the per-distinct-char count lambda
    * would re-derive it per element). */
  private[graft] def withCharEntropy(df: DataFrame, textCol: String)
      : DataFrame = {
    val staged = df
      .withColumn("__ces",
        regexp_replace(normalized(coalesce(col(textCol), lit(""))), " ", ""))
      .withColumn("__cec",
        when(length(col("__ces")) > 0,
          transform(sequence(lit(0), length(col("__ces")) - 1),
            i => col("__ces").substr(i + 1, lit(1))))
          .otherwise(array().cast("array<string>")))
      .withColumn("__ced", array_distinct(col("__cec")))
    val nD = size(col("__cec")).cast("double")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 14)
    val dec28 = org.apache.spark.sql.types.DecimalType(28, 14)
    // one term per RUN of the sorted char array (= per distinct char):
    // the module's run-length fold idiom — O(len) lambda steps per doc
    // with one decimal op per distinct char, not a per-distinct-char
    // re-filter of the whole array. The decimal fold is EXACT for
    // these values: terms are rounded at scale 12, so the
    // capped-precision (38,13) intermediate of the add never discards
    // a digit, and the cast back to the (38,14) accumulator type
    // (aggregate requires the merge to return the zero's exact type)
    // is widening-only.
    def term(run: Column): Column = {
      val p = run.cast("double") / nD
      round(-p * log(p), 12).cast(dec28)
    }
    def flush(acc: Column, run: Column): Column =
      (acc + term(run)).cast(dec38)
    val entropy = round(
      aggregate(array_sort(col("__cec")),
        struct(lit("").as("prev"), lit(0L).as("run"),
          lit(java.math.BigDecimal.ZERO).cast(dec38).as("acc")),
        (st, c) => {
          val same = c === st.getField("prev")
          struct(c.as("prev"),
            when(same, st.getField("run") + 1).otherwise(lit(1L)).as("run"),
            when(same, st.getField("acc"))
              .otherwise(when(st.getField("run") > 0,
                flush(st.getField("acc"), st.getField("run")))
                .otherwise(st.getField("acc"))).as("acc"))
        },
        st => when(st.getField("run") > 0,
          flush(st.getField("acc"), st.getField("run")))
          .otherwise(st.getField("acc")))
        .cast("double"), 6)
    staged
      .withColumn("n_alnum_chars", length(col("__ces")).cast("long"))
      .withColumn("n_distinct_chars", size(col("__ced")).cast("long"))
      .withColumn("entropy_r", entropy)
      .drop("__ces", "__cec", "__ced")
  }

  /** Jensen-Shannon divergence of each corpus SLICE's token
    * distribution against its complement — the text-native drift
    * statistic (bounded [0, ln 2], symmetric, defined even where KL
    * blows up on zero counts) a pipeline reads per source/crawl/
    * encoder-version before mixing: a slice whose JS jumps is writing
    * a different language than the rest of the corpus. Distributions
    * live on the global top-`vocabSize` tokens plus one `<oov>`
    * bucket, so they are complete (sum to 1) and comparable across
    * slices.
    *
    * Scale shape: one token scan -> map-side-combined (slice, token)
    * counts; everything after runs on the (slices x vocab) grid — a
    * few hundred rows regardless of corpus size (the grid cross-join
    * is slices x vocab, both knobs). Returns (slice, n_tokens, js_r).
    *
    * Determinism: p, q, m are single IEEE divides of exact counts;
    * each p·ln(p/m) term is rounded at 12 before the exact decimal
    * sum (order-free); JS rounded at 6. Slices with an empty
    * complement (single-slice corpus) report null. */
  def tokenJsDivergence(docs: DataFrame, textCol: String, sliceCol: String,
      vocabSize: Int = 200): DataFrame = {
    require(vocabSize > 0, s"vocabSize must be positive: $vocabSize")
    val toks = docs.select(col(sliceCol).as("slice"),
      explode(tokens(normalized(col(textCol)))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok")).withColumn("__v", lit(true))
    val mapped = toks.join(broadcast(vocab), Seq("tok"), "left")
      .select(col("slice"),
        when(col("__v"), col("tok")).otherwise(lit("<oov>")).as("tok"))
    val sc = mapped.groupBy(col("slice"), col("tok"))
      .agg(count(lit(1)).as("cs"))
    val stot = sc.groupBy(col("slice")).agg(sum(col("cs")).as("ns"))
    val ttot = sc.groupBy(col("tok")).agg(sum(col("cs")).as("ct"))
    val n = stot.agg(sum(col("ns")).as("n"))
    val grid = stot.crossJoin(broadcast(ttot)).crossJoin(broadcast(n))
      .join(sc, Seq("slice", "tok"), "left")
      .na.fill(0L, Seq("cs"))
      .withColumn("cq", col("ct") - col("cs"))
      .withColumn("nq", col("n") - col("ns"))
    val p = col("cs").cast("double") / col("ns").cast("double")
    val q = col("cq").cast("double") / col("nq").cast("double")
    val m = (p + q) / lit(2.0)
    val terms = grid
      .withColumn("tp", when(col("cs") > 0 && col("nq") > 0,
        round(p * log(p / m), 12)).otherwise(lit(0.0)))
      .withColumn("tq", when(col("cq") > 0 && col("nq") > 0,
        round(q * log(q / m), 12)).otherwise(lit(0.0)))
    terms.groupBy(col("slice"))
      .agg(max(col("ns")).as("n_tokens"),
        sum(col("tp").cast("decimal(28,14)")).as("sp"),
        sum(col("tq").cast("decimal(28,14)")).as("sq"),
        max(col("nq")).as("nq"))
      .select(col("slice"), col("n_tokens"),
        when(col("nq") > 0, round(lit(0.5) *
          (col("sp") + col("sq")).cast("double"), 6)).as("js_r"))
  }

  /** Static word vectors from PPMI + deterministic random-sign
    * projection (Levy & Goldberg 2014 showed PPMI factorization ~
    * skip-gram embeddings — public; the projection is the
    * count-sketch/JL trick): symmetric window-1 co-occurrence over the
    * top-`vocabSize` tokens, positive PMI per pair, then each context
    * dimension is folded into `dims` buckets with a ±1 hash sign —
    * v[w][d] = Σ_c ppmi(w,c) · sign(hash(c:d)). Cheap corpus-intrinsic
    * embeddings for drift checks and nearest-word analysis when no
    * encoder is available.
    *
    * Scale shape: token/co-occurrence aggs are map-side combined; the
    * PPMI frame is at most vocab² rows (vocab is a knob, not the
    * corpus); the projection explodes it by `dims` and re-aggregates —
    * all narrow keys. The corpus-size term is the one token scan.
    *
    * Determinism: the single ln is rounded at 8 (libm discipline),
    * ppmi·(±1) products are exact at 8 decimals, summed as
    * DECIMAL(28,14), rounded at 6 for the report. Returns
    * (token, dim, v_r). */
  def ppmiVectors(docs: DataFrame, textCol: String, vocabSize: Int = 200,
      dims: Int = 16): DataFrame = {
    require(vocabSize > 0 && dims > 0, "vocabSize and dims must be positive")
    val base = docs.select(tokens(normalized(col(textCol))).as("t"))
    val uni = base.select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val vocab = uni.orderBy(col("c").desc, col("tok").asc).limit(vocabSize)
      .select(col("tok"))
    val bg = base.filter(size(col("t")) >= 2)
      .select(explode(expr(
        "transform(slice(t, 1, size(t) - 1), " +
          "(w, i) -> struct(w as w1, element_at(t, i + 2) as w2))")).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
    val sym = bg.union(bg.select(col("w2").as("w1"), col("w1").as("w2")))
    val co = sym
      .join(broadcast(vocab.select(col("tok").as("w1"))), Seq("w1"))
      .join(broadcast(vocab.select(col("tok").as("w2"))), Seq("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    val marg = co.groupBy(col("w1")).agg(sum(col("n")).as("m"))
    val tot = co.agg(sum(col("n")).cast("double").as("nt"))
    val ppmi = co
      .join(marg.select(col("w1"), col("m").as("m1")), Seq("w1"))
      .join(marg.select(col("w1").as("w2"), col("m").as("m2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .withColumn("ppmi_r", round(log(
        (col("n").cast("double") * col("nt")) /
          (col("m1").cast("double") * col("m2").cast("double"))), 8))
      .filter(col("ppmi_r") > 0.0)
    ppmi
      .withColumn("d", explode(sequence(lit(0), lit(dims - 1))))
      .withColumn("sgn",
        (graft.functions.Hashing.hash64(
          concat(col("w2"), lit(":"), col("d").cast("string"))) % 2) * 2 - 1)
      .groupBy(col("w1").as("token"), col("d").as("dim"))
      .agg(sum((col("ppmi_r") * col("sgn")).cast("decimal(28,14)")).as("s"))
      .select(col("token"), col("dim"),
        round(col("s").cast("double"), 6).as("v_r"))
  }

  def sourceStats(docs: DataFrame, textCol: String, sourceCol: String,
      minDocs: Long = 10, maxDupRate: Double = 0.25): DataFrame = {
    val staged = docs
      .select(col(sourceCol).as("source"),
        fingerprintMd5(coalesce(col(textCol), lit(""))).as("fp"),
        tokens(normalized(col(textCol))).as("__toks"))
      .select(col("source"), col("fp"), size(col("__toks")).as("n_tok"),
        size(filter(col("__toks"), tk => tk.isInCollection(stopwords)))
          .as("n_stop"))
    staged.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("fp")).as("n_distinct"),
        sum(col("n_tok")).as("sum_tokens"),
        sum(col("n_stop")).as("sum_stop"))
      .withColumn("dup_rate",
        (col("n_docs") - col("n_distinct")).cast("double") /
          col("n_docs").cast("double"))
      .withColumn("avg_tokens",
        col("sum_tokens").cast("double") / col("n_docs").cast("double"))
      .withColumn("stop_share",
        when(col("sum_tokens") > 0,
          col("sum_stop").cast("double") / col("sum_tokens").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("keep",
        col("n_docs") >= minDocs && col("dup_rate") <= maxDupRate)
  }

  /** BM25 document ranking for a (small) bag of query terms — the
    * retrieval scorer a corpus pipeline uses to mine topical documents
    * (and the core of quality-classifier seed selection).
    *
    * Two deliberate portability choices, same discipline as
    * [[topKeywords]]:
    *  - LINEAR idf (n_docs/df) instead of the classical
    *    ln((N-df+.5)/(df+.5)): `ln` is where libm implementations may
    *    diverge an ulp, and idf is a per-term constant so ranking within
    *    a term set is order-preserved for df-monotone transforms.
    *  - the per-term partial scores are summed as DECIMAL(18,6) — exact
    *    and order-free — so the per-document total does not depend on
    *    aggregation order (a raw double sum would differ run-to-run
    *    across partitionings, let alone engines).
    * Callers should pass k1/b values exactly representable in binary
    * (e.g. 1.25/0.75, the defaults) so the oracle's literals are the
    * identical doubles.
    *
    * Scale shape: the term list is a broadcast `isin` pushed into the
    * scan; tf is one map-side-combined groupBy on (doc, term); df and
    * the corpus stats are tiny broadcast sides; the per-doc fold is one
    * narrow agg. No shuffle carries text. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k1: Double = 1.25, b: Double = 0.75)
      : DataFrame = {
    val staged = docs
      .select(col(idCol).as("id"), tokens(normalized(col(textCol))).as("__toks"))
      .select(col("id"), size(col("__toks")).as("dl"),
        col("__toks"))
    val stats = staged.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = staged
      .select(col("id"), col("dl"), explode(col("__toks")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
      .groupBy(col("id"), col("dl"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), Seq("tok"))
      .crossJoin(broadcast(stats))
      // written in EXACTLY the association the oracle SQL uses:
      // idf * (tf*(k1+1)) / (tf + k1*(1 - b + b*dl/avgdl))
      .withColumn("tscore",
        (col("n_docs").cast("double") / col("df").cast("double")) *
          (col("tf").cast("double") * lit(k1 + 1)) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1 - b) + lit(b) * (col("dl").cast("double") /
              (col("sum_dl").cast("double") / col("n_docs").cast("double"))))))
    scored.groupBy(col("id"))
      .agg(count(lit(1)).as("n_terms"),
        sum(col("tscore").cast("decimal(18,6)")).cast("double").as("score"))
  }

  /** IDF-weighted token-overlap retrieval (the per-query lexical ranker
    * [[bm25]]'s fixed-term signature can't express): score(q, d) = sum
    * over DISTINCT shared tokens t of n_docs/df_t, ranked per query with
    * an (score desc, id asc) tie-break, top `k` rows per query. Tokens
    * with df > floor(n_docs * maxDfShare) are dropped BEFORE the posting
    * join — a stopword's posting list is O(corpus) and its IDF weight is
    * noise, so the cap is both the relevance fix and the scale bound:
    * the join fans out as sum over query tokens of df_t, now bounded by
    * |query tokens| * n_docs * maxDfShare. Queries are a small frame by
    * construction (a probe set, not the corpus) and broadcast; per-term
    * scores are summed as DECIMAL(18,6) so the ranking is
    * order-insensitive and engine-exact. Self-matches (id = query_id)
    * are excluded. */
  def lexicalTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      textCol: String, k: Int, maxDfShare: Double = 0.1): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ct = corpus.select(col(idCol).as("id"),
        explode(tokens(normalized(col(textCol)))).as("tok")).distinct()
    val stats = corpus.agg(count(lit(1)).as("n_docs"))
    val qt = queries.select(col(idCol).as("query_id"),
        explode(tokens(normalized(col(textCol)))).as("tok")).distinct()
    // df only for the query vocabulary: the corpus-wide token groupBy is
    // the one honest full pass; its result is then cut to |query vocab|
    // rows BEFORE any broadcast, so nothing vocabulary-sized ships.
    val dfreq = ct.join(broadcast(qt.select(col("tok")).distinct()), Seq("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats))
      .filter(col("df") <= floor(col("n_docs") * lit(maxDfShare)))
    val scored = ct.join(broadcast(qt), Seq("tok"))
      .filter(col("id") =!= col("query_id"))
      .join(broadcast(dfreq), Seq("tok"))
      .groupBy(col("query_id"), col("id"))
      .agg(sum((col("n_docs").cast("double") / col("df").cast("double"))
        .cast("decimal(18,6)")).as("__s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id"),
        col("__s").cast("double").as("score"), col("rank"))
  }

  def topKeywords(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(idCol).as("id"),
      explode(tokens(normalized(col(textCol)))).as("tok"))
    val tf = toks.groupBy(col("id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val total = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "tok").crossJoin(broadcast(total))
      .withColumn("score",
        (col("tf") * col("n_docs")).cast("double") / col("df").cast("double"))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("tok").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("tok"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /** Frequency-ranked vocabulary (the tokenizer-training step of an LLM
    * data pipeline): tokens with count >= minCount, ranked
    * (count DESC, token ASC), capped at maxSize, ids offset past 4
    * reserved specials (<pad>=0 <unk>=1 <bos>=2 <eos>=3, count 0).
    *
    * Scale shape: explode → one map-side-combined groupBy(token); the
    * global top-maxSize rank is row_number over an empty partition —
    * Spark's WindowGroupLimit caps every map partition at maxSize rows
    * first, so the single final task sees at most
    * maxSize × shuffle-partitions pre-ranked rows, not the vocabulary. */
  def buildVocab(docs: DataFrame, textCol: String, maxSize: Int = 1000,
      minCount: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val specials = Seq("<pad>", "<unk>", "<bos>", "<eos>")
    val counts = docs
      .select(explode(tokens(normalized(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
    // top-maxSize via orderBy+limit -> TakeOrderedAndProject: each scan
    // partition keeps a maxSize-row heap and the merge sees only
    // k-per-partition, so the distinct-token count (billions at corpus
    // scale) never funnels through one window task. A global row_number
    // window + rank filter does NOT get Spark's WindowGroupLimit rewrite
    // (InferWindowGroupLimit skips empty partition specs — verified on
    // bare Spark 4.1.2); rank ids are assigned after the limit, over
    // maxSize rows. (n desc, token asc) is total, so ids are stable.
    val w = Window.orderBy(col("n").desc, col("token").asc)
    val ranked = counts
      .orderBy(col("n").desc, col("token").asc).limit(maxSize)
      .withColumn("rn", row_number().over(w))
      .select(col("token"),
        (col("rn") + specials.size - 1).cast("long").as("token_id"),
        col("n"))
    val specialRows = docs.sparkSession
      .createDataFrame(specials.zipWithIndex.map { case (t, i) =>
        (t, i.toLong, 0L) })
      .toDF("token", "token_id", "n")
    specialRows.unionByName(ranked)
  }

  /** Encode documents into token-id sequences against a vocab from
    * [[buildVocab]] — the step that turns a cleaned corpus into model
    * input, completing the vocab → encode → chunk/pack chain.
    * Out-of-vocabulary tokens map to `unkId` (buildVocab's `<unk>` =
    * 1; the normalizer strips `<>` so no real token can collide with a
    * special). Documents with zero tokens encode to an EMPTY array,
    * not `[unk]`.
    *
    * Scale shape: tokenize+posexplode is narrow; the vocab (maxSize+4
    * rows) enters as a broadcast hash join; the only shuffle is the
    * per-document reassembly groupBy. Order is restored by sorting the
    * (pos, id) structs inside each group — positions are unique per
    * doc, so the result is deterministic under any partitioning. */
  def encodeWithVocab(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, unkId: Long = 1L): DataFrame = {
    val toks = docs.select(col(idCol).as("id"),
      posexplode_outer(tokens(normalized(col(textCol))))
        .as(Seq("pos", "token")))
    toks
      .join(broadcast(vocab.select(col("token"), col("token_id"))),
        Seq("token"), "left")
      .groupBy(col("id"))
      // null struct for the posexplode_outer placeholder row of an
      // empty doc: collect_list drops nulls -> empty ids array
      .agg(sort_array(collect_list(
        when(col("token").isNotNull,
          struct(col("pos"),
            coalesce(col("token_id"), lit(unkId)).as("tid"))))).as("__s"))
      .select(col("id"),
        transform(col("__s"), s => s.getField("tid")).as("token_ids"))
  }

  /** HTML -> text extraction for web-crawl corpora (the step before
    * every quality/dedup stage when the source is raw crawl):
    * script/style blocks drop entirely (their content is code, not
    * prose), remaining tags become spaces, the six core character
    * entities decode (&amp; deliberately LAST, so source text that
    * spells "&amp;lt;" decodes exactly once to "&lt;" and never
    * double-decodes to "<"), whitespace collapses to single spaces.
    *
    * Patterns are restricted to the java.util.regex ∩ RE2 common
    * subset (same discipline as [[piiRedact]]): inline (?is) flags,
    * lazy .*?, no lookaround — so the DuckDB oracle applies the
    * IDENTICAL chain. Pure narrow map; at crawl scale this is one
    * codegen'd projection, no shuffle. */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)[^>]*>.*?</(script|style)>", " ")
    val noTags = regexp_replace(noScript, "(?s)<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** One greedy left-to-right BPE contraction of adjacent (l, r) symbol
    * pairs in an array column — the fold keeps an accumulator whose
    * last element either absorbs the incoming symbol (last == l and
    * x == r → replace last with l+r) or is appended to. Merging
    * consumes both symbols, so overlapping runs contract
    * non-overlapping left-to-right ("aaa" + merge(a,a) → ["aa","a"]),
    * exactly the reference BPE semantics (Sennrich et al. 2016). */
  private def bpeContract(syms: Column, l: String, r: String): Column =
    when(size(syms) < 2, syms).otherwise(
      aggregate(
        slice(syms, lit(2), size(syms) - 1),
        slice(syms, 1, 1),
        (acc, x) =>
          when(element_at(acc, -1) === lit(l) && x === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
            .otherwise(concat(acc, array(x)))))

  /** The Viterbi segmentation fold shared by the train and fertility
    * faces: per-word DP, state grows one position per step, argmin
    * tie-breaks on (cost@8, piece). Returns (w, cnt, fin(c, seg)). */
  private def viterbiSeg(words: DataFrame, costMap: Column,
      maxPieceLen: Int): DataFrame =
    words
      .withColumn("cm", costMap)
      .withColumn("st", expr(
        s"""aggregate(
           |  sequence(1, length(w)),
           |  array(struct(cast(0.0 as double) as c, cast(array() as array<string>) as seg)),
           |  (st, i) -> st || array(
           |    aggregate(
           |      filter(
           |        transform(sequence(greatest(0, i - $maxPieceLen), i - 1), j ->
           |          struct(
           |            round(element_at(st, j + 1).c +
           |              coalesce(element_at(cm, substr(w, j + 1, i - j)), cast(1.0e15 as double)), 8) as c,
           |            substr(w, j + 1, i - j) as piece,
           |            j as j)),
           |        x -> x.c < cast(1.0e14 as double)),
           |      struct(cast(1.0e18 as double) as c, '' as piece, -1 as j),
           |      (best, x) -> if(x.c < best.c or (x.c = best.c and x.piece < best.piece), x, best),
           |      best -> struct(best.c as c,
           |        element_at(st, best.j + 1).seg || array(best.piece) as seg))))""".stripMargin))
      .select(col("w"), col("cnt"),
        element_at(col("st"), length(col("w")) + 1).as("fin"))

  private def round8(x: Double): Double =
    BigDecimal(x).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble

  private def costMapOf(costs: Seq[(String, Double)]): Column =
    map(costs.sortBy(_._1).flatMap { case (k, c) =>
      Seq(lit(k), lit(c)) }: _*)

  /** Round 1 of the unigram EM: word counts, vocab (top-V + alphabet),
    * frequency-initialized Viterbi, usage counts. Returns the word
    * frame, vocab pieces, vocab size, and the collected usage rows —
    * shared by [[unigramTokenizerTrain]] and [[unigramFertility]]. */
  private def unigramTrainCore(docs: DataFrame, textCol: String,
      vocabSize: Int, maxWordLen: Int, maxPieceLen: Int)
      : (DataFrame, Seq[String], Int, DataFrame) = {
    val words = docs
      .select(explode(tokens(normalized(col(textCol)))).as("w0"))
      .select(substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    // candidate substrings, weighted by word frequency
    val cands = words.select(col("cnt"), explode(expr(
      s"""flatten(transform(sequence(0, length(w) - 1), i ->
         |  transform(sequence(1, least($maxPieceLen, length(w) - i)), l ->
         |    substr(w, i + 1, l))))""".stripMargin)).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("pc"))
      .localCheckpoint(true)
    val top = cands
      .orderBy(col("pc").desc, col("piece").asc).limit(vocabSize)
    val chars = cands.filter(length(col("piece")) === 1)
    val vocab0 = top.unionByName(chars).groupBy(col("piece"))
      .agg(max(col("pc")).as("pc"))
    val rows = vocab0.collect()
    require(rows.nonEmpty, "unigram tokenizer: corpus has zero tokens")
    val totalPc = rows.map(_.getLong(1)).sum
    val v = rows.length
    // frequency-initialized costs, ln rounded at 8 (libm discipline)
    val cost0 = rows.map { r =>
      r.getString(0) -> round8(-round8(
        math.log((r.getLong(1) + 1).toDouble / (totalPc + v).toDouble)))
    }.toSeq
    val dp = viterbiSeg(words, costMapOf(cost0), maxPieceLen)
    val use = dp.select(col("cnt"), explode(col("fin.seg")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("n_use"))
    (words, rows.map(_.getString(0)).toSeq, v, use)
  }

  /** Unigram-LM tokenizer training (the SentencePiece-unigram scheme,
    * Kudo 2018 "Subword regularization" — public), simplified to one
    * deterministic EM round: (1) candidate pieces = all substrings up
    * to `maxPieceLen` of the (truncated) word list, vocab = top
    * `vocabSize` by weighted frequency UNION every single character
    * (full coverage, so Viterbi never dead-ends); (2) E-step = exact
    * Viterbi segmentation of every distinct word under the
    * frequency-initialized piece log-probs; (3) M-step = re-estimate
    * piece probabilities from the Viterbi usage counts. Returns the
    * top `topK` pieces by usage: (piece, n_use, logp).
    *
    * With FIXED segmentations further EM rounds only re-normalize, so
    * one round is the honest unit here (the full method re-runs E
    * under the new probs; that second round is the natural next
    * extension and changes none of the machinery).
    *
    * Determinism (the oracle contract): costs are -logp rounded at 8,
    * the DP accumulates with a round@8 per step, and the per-position
    * argmin tie-breaks on (cost, piece) — a total order since the
    * piece fixes the back-pointer. The vocab is collected to the
    * driver (bounded: vocabSize + alphabet, the IVF-centroid idiom)
    * and re-enters both engines as a literal map.
    *
    * Scale shape: the E-step DP is a per-DISTINCT-WORD narrow
    * expression (codegen'd HOF fold, no shuffle) weighted by word
    * count — corpus volume moves only the word-count agg; vocab
    * candidate explode is bounded by maxWordLen * maxPieceLen per
    * distinct word; the M-step is one map-side-combined piece agg. */
  def unigramTokenizerTrain(docs: DataFrame, textCol: String,
      vocabSize: Int = 200, maxWordLen: Int = 20, maxPieceLen: Int = 5,
      topK: Int = 50): DataFrame = {
    require(vocabSize > 0 && maxWordLen > 0 && maxPieceLen > 0 && topK > 0,
      "unigramTokenizerTrain: all knobs must be positive")
    val (_, _, v, use) =
      unigramTrainCore(docs, textCol, vocabSize, maxWordLen, maxPieceLen)
    val W = org.apache.spark.sql.expressions.Window
    use
      .withColumn("tot", sum(col("n_use")).over(W.partitionBy(lit(1))))
      .select(col("piece"), col("n_use"),
        round(log((col("n_use") + 1).cast("double") /
          (col("tot") + v).cast("double")), 8).as("logp"))
      .orderBy(col("n_use").desc, col("piece").asc)
      .limit(topK)
  }

  /** Tokenizer FERTILITY per corpus slice: average pieces-per-word
    * under the EM round-2 Viterbi (segmentation re-run under the
    * M-step re-estimated probabilities — unused vocab pieces keep the
    * smoothed floor, so coverage survives). Fertility is the standard
    * "how well does this tokenizer fit this language" readout: a slice
    * whose words shatter into characters is paying 2-3x the sequence
    * length for the same text. Returns per slice: distinct words,
    * token occurrences, weighted pieces, fertility.
    *
    * Scale shape: round 1 = [[unigramTrainCore]]; round 2 is the same
    * per-distinct-word narrow fold; the slice rollup joins the (slice,
    * word) counts to the word segmentation by word — text beyond the
    * truncated word never shuffles. */
  def unigramFertility(docs: DataFrame, textCol: String, sliceCol: String,
      vocabSize: Int = 200, maxWordLen: Int = 20, maxPieceLen: Int = 5)
      : DataFrame = {
    require(vocabSize > 0 && maxWordLen > 0 && maxPieceLen > 0,
      "unigramFertility: all knobs must be positive")
    val (words, vocabPieces, v, use) =
      unigramTrainCore(docs, textCol, vocabSize, maxWordLen, maxPieceLen)
    val useRows = use.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = useRows.values.sum
    // round-2 costs over the FULL vocab (unused pieces get the
    // smoothed floor — a rare character must stay reachable)
    val cost1 = vocabPieces.map { p =>
      p -> round8(-round8(math.log(
        (useRows.getOrElse(p, 0L) + 1).toDouble / (tot + v).toDouble)))
    }
    val seg2 = viterbiSeg(words, costMapOf(cost1), maxPieceLen)
      .select(col("w"), size(col("fin.seg")).as("np"))
    val wl = docs.select(col(sliceCol).as("slice"),
        explode(tokens(normalized(col(textCol)))).as("w0"))
      .select(col("slice"), substring(col("w0"), 1, maxWordLen).as("w"))
      .groupBy(col("slice"), col("w")).agg(count(lit(1)).as("cnt"))
    wl.join(seg2, Seq("w"))
      .groupBy(col("slice"))
      .agg(countDistinct(col("w")).as("n_words"),
        sum(col("cnt")).as("n_tokens"),
        sum(col("cnt") * col("np")).as("n_pieces"))
      .select(col("slice"), col("n_words"), col("n_tokens"),
        col("n_pieces"),
        round(col("n_pieces").cast("double") /
          col("n_tokens").cast("double"), 6).as("fertility"))
  }

  /** Distributed BPE merge learning (Sennrich/Haddow/Birch 2016, public
    * paper): learn `numMerges` byte-pair merges from the corpus by
    * repeatedly merging the globally most frequent adjacent symbol
    * pair. Classic BPE trains on the WORD-FREQUENCY dictionary, not the
    * raw corpus — so the iteration runs over `distinct words × counts`
    * (bounded by vocabulary size, millions of rows at 100 TB corpus
    * scale, never the corpus itself), which is what makes the
    * driver-coordinated loop legitimate: per round, one
    * map-side-combined pair-count aggregation over the dictionary, one
    * TakeOrderedAndProject argmax (a single-row driver fetch, the Lloyd-
    * rounds pattern), one narrow contraction map, one localCheckpoint
    * to cut the per-round lineage (the [[Dedup.connectedComponents]]
    * discipline).
    *
    * Ties break (pair_count DESC, left ASC, right ASC) — a total order,
    * so the learned merge table is deterministic. Stops early when no
    * pair reaches `minPairCount`.
    *
    * Returns (rank, left, right, pair_count), rank = merge order. */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int = 30,
      minPairCount: Long = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(tokens(normalized(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(0, length(w) - 1), i -> substr(w, i + 1, 1))"))
      .select(col("cnt"), col("syms"))
      .localCheckpoint(true)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] as l, syms[i + 1] as r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("rt"))
        .agg(sum(col("cnt")).as("pc"))
        .orderBy(col("pc").desc, col("l").asc, col("rt").asc)
        .limit(1).collect()
      if (best.isEmpty || best(0).getLong(2) < minPairCount) done = true
      else {
        val (l, rt, pc) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += ((r, l, rt, pc))
        val prev = words
        words = words
          .withColumn("syms", bpeContract(col("syms"), l, rt))
          .localCheckpoint(true)
        prev.unpersist(false)
        r += 1
      }
    }
    words.unpersist(false)
    merges.toSeq.toDF("rank", "left", "right", "pair_count")
  }

  /** Distributed WordPiece merge learning (Schuster & Nakajima 2012
    * "Japanese and Korean voice search"; the BERT tokenizer's training
    * rule, public): identical loop shape to [[bpeTrain]] but the merge
    * criterion is LIKELIHOOD GAIN, not raw frequency — per round the
    * pair maximizing
    *
    *   score(l, r) = count(l r) / (count(l) * count(r))
    *
    * merges (the pair whose fusion most increases a unigram-LM corpus
    * likelihood). The denominators re-derive each round from the
    * CURRENT symbol inventory, so early merges of rare-but-exclusive
    * symbol pairs beat frequent-but-promiscuous ones — the
    * morpheme-over-boilerplate bias that distinguishes WordPiece
    * vocabularies from BPE's.
    *
    * Scale shape = [[bpeTrain]]'s: the loop runs over the distinct-word
    * dictionary (vocabulary-bounded, never the corpus); per round one
    * pair-count aggregation + one symbol-count aggregation (both
    * map-side combined), a single-row argmax fetch, one narrow
    * contraction, lineage cut per round.
    *
    * Determinism: counts are exact longs; the score is ONE IEEE divide
    * of pc by the exact product cl*cr (products stay far below 2^53 at
    * dictionary scale), so both engines rank identical doubles;
    * ties break (score DESC, left ASC, right ASC). Stops when no pair
    * reaches `minPairCount`.
    *
    * Returns (rank, left, right, pair_count, score_r@8). */
  def wordPieceTrain(docs: DataFrame, textCol: String, numMerges: Int = 24,
      minPairCount: Long = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var words = docs
      .select(explode(tokens(normalized(col(textCol)))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .withColumn("syms",
        expr("transform(sequence(0, length(w) - 1), i -> substr(w, i + 1, 1))"))
      .select(col("cnt"), col("syms"))
      .localCheckpoint(true)
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long, Double)]
    var r = 0
    var done = false
    while (r < numMerges && !done) {
      val symc = words
        .select(col("cnt"), explode(col("syms")).as("s"))
        .groupBy(col("s")).agg(sum(col("cnt")).as("sc"))
      val best = words
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(0, size(syms) - 2), i -> struct(syms[i] as l, syms[i + 1] as r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("rt"))
        .agg(sum(col("cnt")).as("pc"))
        .filter(col("pc") >= minPairCount)
        .join(symc.select(col("s").as("l"), col("sc").as("cl")), Seq("l"))
        .join(symc.select(col("s").as("rt"), col("sc").as("cr")), Seq("rt"))
        // each factor casts to double BEFORE the multiply (ADVICE r14):
        // symbol counts are token-frequency scale, so the int64 product
        // cl*cr can overflow Long at web-corpus scale — one extra IEEE
        // multiply, identical in the DuckDB mirror, no overflow
        .withColumn("score",
          col("pc").cast("double") /
            (col("cl").cast("double") * col("cr").cast("double")))
        .orderBy(col("score").desc, col("l").asc, col("rt").asc)
        .limit(1)
        .select(col("l"), col("rt"), col("pc"), col("score"))
        .collect()
      if (best.isEmpty) done = true
      else {
        val (l, rt, pc, sc) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2), best(0).getDouble(3))
        merges += ((r, l, rt, pc, sc))
        val prev = words
        words = words
          .withColumn("syms", bpeContract(col("syms"), l, rt))
          .localCheckpoint(true)
        prev.unpersist(false)
        r += 1
      }
    }
    words.unpersist(false)
    merges.toSeq.toDF("rank", "left", "right", "pair_count", "score")
      .withColumn("score_r", round(col("score"), 8)).drop("score")
  }

  /** Apply a learned merge table ([[bpeTrain]] order) to segment
    * documents into BPE pieces. Applying the merges in rank order, each
    * once over the whole symbol sequence, IS the BPE encode algorithm.
    *
    * Scale shape: the merge fold runs on the DISTINCT-word frame only
    * (vocabulary-sized); documents then re-enter through one word join
    * and one per-doc aggregation — corpus text never carries the fold
    * chain. The fold is checkpointed every 10 merges so the nested
    * higher-order expressions never grow past analyzer comfort.
    *
    * Returns (id, n_words, n_pieces). */
  def bpeEncode(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val words = docs
      .select(explode(tokens(normalized(col(textCol)))).as("w"))
      .distinct()
      .withColumn("syms",
        expr("transform(sequence(0, length(w) - 1), i -> substr(w, i + 1, 1))"))
    val encoded = merges.zipWithIndex.foldLeft(words) {
      case (df, ((l, rt), i)) =>
        val next = df.withColumn("syms", bpeContract(col("syms"), l, rt))
        if ((i + 1) % 10 == 0) next.localCheckpoint(true) else next
    }
    docs.select(col(idCol).as("id"),
      explode(tokens(normalized(col(textCol)))).as("w"))
      .join(encoded.select(col("w"), size(col("syms")).as("np")), Seq("w"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_words"), sum(col("np")).as("n_pieces"))
  }

  /** Pluggable tokenizer-count seam (VERDICT r8 Next #7): per-doc
    * subword piece counts under an EXTERNAL merge table — a real
    * tokenizer's merges file loaded as a (rank, left, right) DataFrame
    * — instead of the shipped whitespace/[[bpeishTokenCount]]
    * heuristics. The merge table is vocabulary-bounded by
    * construction, so the driver collect is the centroids/vocab
    * bounded-collect regime (guarded at `maxMerges`, fail-fast beyond
    * it); the encode itself runs distributed through [[bpeEncode]]'s
    * distinct-word fold — corpus text never leaves the executors.
    * Returns (id, n_words, n_pieces). ModelSeamSpec pins that a merge
    * table changes counts and that merging everything converges to
    * whitespace [[tokenCount]]. */
  def tokenCountWithMerges(docs: DataFrame, idCol: String,
      textCol: String, merges: DataFrame,
      maxMerges: Int = 65536): DataFrame = {
    val m = merges.orderBy(col("rank"))
      .select(col("left"), col("right")).limit(maxMerges + 1).collect()
    require(m.length <= maxMerges,
      s"merge table exceeds $maxMerges entries — not a vocab-bounded frame")
    bpeEncode(docs, idCol, textCol,
      m.toSeq.map(r => (r.getString(0), r.getString(1))))
  }

  /** Canonical normalization for fingerprinting: lowercase, strip
    * non-alphanumerics to single spaces, trim. */
  def normalized(text: Column): Column =
    trim(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Content-defined document fingerprint: md5 of normalized text
    * (portable to the oracle) — two docs differing only in case /
    * punctuation / whitespace collide. */
  def fingerprintMd5(text: Column): Column = md5(normalized(text).cast("binary"))

  /** Fast path: codegen'd Karp-Rabin rolling hash of the normalization. */
  def fingerprintRolling(text: Column): Column =
    Hashing.rolling_hash(normalized(text))

  /** PII scrubbing (training-data release hygiene). Patterns restricted
    * to syntax with identical semantics in java.util.regex and RE2
    * (DuckDB) — no backreferences, no lookaround, no possessive
    * quantifiers — so the oracle applies the SAME pattern strings:
    *
    *  - email: local@domain.tld (letters/digits/._%+- local part)
    *  - phone: international-ish +/digit groups with -, space, (), .
    *    separators, 7-15 digits total (E.164 envelope), matched only at
    *    token-ish boundaries to keep plain long numbers out
    *  - IPv4: four 1-3 digit octets (no value-range check — scrubbing
    *    favors recall; 999.1.1.1 redacts harmlessly)
    *
    * Pure narrow projections — no shuffle; each redaction is one
    * codegen'd regexp_replace over the scan. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val phonePattern =
    "\\+[0-9]{1,3}[ .-]?\\(?[0-9]{1,4}\\)?([ .-]?[0-9]{2,4}){2,4}"

  def countPii(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, emailPattern, "<EMAIL>")
    val p = regexp_replace(e, phonePattern, "<PHONE>")
    regexp_replace(p, ipv4Pattern, "<IP>")
  }

  /** Per-row PII counts + redacted text (counts BEFORE redaction, on
    * the original text, in the same pass). */
  def withPiiRedaction(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", countPii(t, emailPattern))
      .withColumn("n_phones", countPii(t, phonePattern))
      .withColumn("n_ipv4", countPii(t, ipv4Pattern))
      .withColumn("redacted", redactPii(t))
  }

  /** Payment-card candidate: 13-19 digits, optionally space/dash
    * separated. RE2-portable (no lookaround/backrefs) like the other
    * PII patterns, so Spark's java.util.regex and the oracle's RE2
    * find identical leftmost-greedy matches. */
  val ccPattern: String = "(?:[0-9][ -]?){12,18}[0-9]"

  /** Luhn mod-10 checksum over a digits-only string, as pure Columns
    * (HOF fold over character positions — one codegen'd expression, no
    * UDF). Position i (1-based from the left) of an L-digit string is
    * doubled when its 0-based-from-the-right index L-i is odd. */
  def luhnChecksum(digits: Column): Column = {
    val L = length(digits)
    aggregate(
      transform(sequence(lit(1), L), i => {
        val d = ascii(digits.substr(i, lit(1))) - lit(48)
        when(((L - i) % 2) === 1,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
  }

  /** True iff a candidate (separators allowed) is a plausible payment
    * card: 13-19 digits AND Luhn-valid. */
  def luhnValid(cand: Column): Column = {
    val ds = regexp_replace(cand, "[^0-9]", "")
    val L = length(ds)
    L >= 13 && L <= 19 && luhnChecksum(ds) % 10 === 0
  }

  /** Checksum-validated payment-card detection — the precision upgrade
    * over regex-only scrubbing: a 16-digit order number matches the
    * shape but fails Luhn, so `n_cc_valid` separates real card leaks
    * from numeric noise while `cc_redacted` still scrubs every
    * candidate (conservative: shape alone is enough to redact; the
    * valid count is the alerting signal). Counts are taken BEFORE
    * redaction on the original text, the [[withPiiRedaction]]
    * discipline. Whole pass is narrow codegen'd HOFs over the scan —
    * no explode, no shuffle, no UDF. */
  def withCcDetection(df: DataFrame, textCol: String): DataFrame = {
    // null-safe: size(regexp_extract_all(NULL)) is -1, not 0 — treat
    // null text as empty (null-text corpora exist; see Dedup.corpusDiff)
    val t = coalesce(col(textCol), lit(""))
    val cands = regexp_extract_all(t, lit(ccPattern), lit(0))
    df.withColumn("n_cc_candidates", size(cands))
      .withColumn("n_cc_valid", size(filter(cands, c => luhnValid(c))))
      .withColumn("cc_redacted",
        regexp_replace(t, lit(ccPattern), lit("<CC>")))
  }

  // ------------------------------------------------------------------
  // C4-style line-level cleaning (Raffel et al. 2020, "Exploring the
  // Limits of Transfer Learning with a Unified Text-to-Text
  // Transformer", §2.2 — public paper). Unlike the Gopher verdict
  // (whole-document keep/drop), C4 EDITS documents: individual lines
  // are dropped and the page verdict is taken on what survives.
  // ------------------------------------------------------------------

  /** Line keep rules (C4 §2.2): terminal punctuation, >= 5 words, no
    * boilerplate phrase. Page drop rules: < 3 surviving lines, "lorem
    * ipsum", or a curly brace (code markers). Phrase list follows the
    * published heuristics restricted to case-insensitive substrings so
    * the oracle applies the identical predicate. */
  val c4MinWordsPerLine = 5
  val c4MinKeptLines = 3
  val c4TerminalPunct: Seq[String] = Seq(".", "!", "?", "\"")
  val c4LineBlocklist: Seq[String] = Seq("javascript", "cookie", "privacy policy")

  /** Per-line predicate — usable inside a higher-order `filter` lambda,
    * so the whole line pass is one codegen'd projection (no explode, no
    * shuffle; the O(lines) work rides the scan). */
  def c4KeepLine(l: Column): Column = {
    val lastChar = l.substr(length(l), lit(1))
    val words = size(filter(split(l, "\\s+"), t => length(t) > 0))
    val lowered = lower(l)
    val blocked = c4LineBlocklist.map(b => lowered.contains(b)).reduce(_ || _)
    lastChar.isInCollection(c4TerminalPunct) &&
      words >= c4MinWordsPerLine && !blocked
  }

  /** Adds `n_lines, n_kept_lines, clean_text, has_lorem, has_brace,
    * keep_page`. Null text is treated as empty (null-text corpora exist;
    * see Dedup.corpusDiff). Narrow map over the scan — embarrassingly
    * parallel at 100 TB. */
  def withC4Filter(df: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val staged = df.withColumn("__c4l", Repetition.lines(t))
    val kept = filter(col("__c4l"), l => c4KeepLine(l))
    staged.withColumn("__c4k", kept)
      .withColumn("n_lines", size(col("__c4l")))
      .withColumn("n_kept_lines", size(col("__c4k")))
      .withColumn("clean_text", array_join(col("__c4k"), "\n"))
      .withColumn("has_lorem", lower(t).contains("lorem ipsum"))
      .withColumn("has_brace", t.contains("{"))
      .withColumn("keep_page",
        col("n_kept_lines") >= c4MinKeptLines &&
          !col("has_lorem") && !col("has_brace"))
      .drop("__c4l", "__c4k")
  }
}
