package graft.ext

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** One corpus document (the typed face's row type). */
final case class CorpusDoc(doc_id: Long, text: String)

/** Knobs for [[CorpusPipeline.clean]] — defaults match the oracle-checked
  * q_corpus_pipeline funnel. */
final case class CorpusConfig(
    nearDupThreshold: Double = 0.5,
    shingleN: Int = 3,
    minhashK: Int = 16,
    bands: Int = 4,
    maxBucket: Int = 64,
    minQuality: Double = 0.6,
    lang: Option[String] = Some("en"))

/** Typed `Dataset[CorpusDoc]` face of the training-data cleaning funnel:
  * exact dedup (min-id survivor) -> MinHash near-dup removal (drop the
  * larger id of each verified pair) -> quality-score filter -> optional
  * language filter. Composes the same library operators the untyped
  * queries use, so the DuckDB oracle on q_corpus_pipeline locks this
  * exact code path; the case-class boundary buys compile-time column
  * safety at the API edge while every stage inside stays Catalyst
  * columns (no Encoder round-trips mid-pipeline). */
object CorpusPipeline {

  def clean(docs: Dataset[CorpusDoc],
      cfg: CorpusConfig = CorpusConfig()): Dataset[CorpusDoc] = {
    import docs.sparkSession.implicits._
    val df = docs.toDF()
    val keep1 = Dedup.exactByFingerprint(df, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val s1 = df.join(keep1, Seq("doc_id"), "left_semi")
    val dropNear = Dedup.nearDuplicates(s1, "doc_id", "text",
      threshold = cfg.nearDupThreshold, shingleN = cfg.shingleN,
      k = cfg.minhashK, bands = cfg.bands, maxBucket = cfg.maxBucket)
      .select(col("id_b").as("doc_id")).distinct()
    val s2 = s1.join(dropNear, Seq("doc_id"), "left_anti")
    // fused single-tokenization pass — bit-identical columns to
    // withLangId(qualityScore(...)), so the q_corpus_pipeline oracle
    // verifies this plan change value-for-value (TextStatsSpec pins
    // the equality; SCALE.md r11 records the filter-stage win)
    val scored = TextStats.qualityLangScore(s2, "text")
    val kept = scored.filter(col("quality_score") >= cfg.minQuality)
    cfg.lang.fold(kept)(l => kept.filter(col("predicted") === l))
      .select(col("doc_id"), col("text")).as[CorpusDoc]
  }

  /** Quality-filter agreement census: every doc gets an independent
    * keep verdict from three orthogonal screens — the Gopher
    * repetition/length rules, the feature-weight quality classifier,
    * and the char-entropy gibberish screen — and the census counts
    * docs per verdict TRIPLE. The off-diagonal cells are the
    * interesting ones: classifier-keep/gopher-drop is usually
    * repetitive-but-fluent boilerplate, gopher-keep/entropy-drop is
    * structured gibberish — the disagreement census is how a curation
    * team decides which screen to trust where (and which thresholds to
    * move) BEFORE committing to a filter stack.
    *
    * Scale shape: the three screens are each one corpus pass (their
    * own documented shapes); the verdict join is id-keyed (text never
    * rides into the join); the census is an 8-row frame, share via a
    * window over it. */
  /** The three per-doc keep verdicts as ONE fused narrow pass (r15):
    * every screen is a pure per-doc function of the text (repetition
    * stats, quality features, char entropy are all staged narrow
    * columns), so the pre-r15 shape — three separate corpus scans
    * joined twice on the id — paid two shuffles and two extra
    * tokenizations for nothing. Verdict expressions are the EXACT
    * shared columns the standalone faces use
    * (Repetition.gopherReasons, TextStats.classifierLogit,
    * TextStats.withCharEntropy), so values are bit-identical to the
    * joined form (same row, same expressions; the qualityLangScore
    * r11 fusion discipline). One scan, zero joins. */
  private def withVerdicts(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, minEntropy: Double)
      : org.apache.spark.sql.DataFrame = {
    val feats = TextStats.withQualityFeatures(
      Repetition.withRepetitionStats(docs, textCol), textCol)
    TextStats.withCharEntropy(feats, textCol)
      .withColumn("gopher_keep", Repetition.gopherReasons === "")
      .withColumn("clf_keep", TextStats.classifierLogit > 0.0)
      .withColumn("entropy_keep", col("entropy_r") >= minEntropy)
      .select(col(idCol).as("id"), col("gopher_keep"), col("clf_keep"),
        col("entropy_keep"))
  }

  def qualityAgreement(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minEntropy: Double = 2.5)
      : org.apache.spark.sql.DataFrame = {
    val census = withVerdicts(docs, idCol, textCol, minEntropy)
      .groupBy(col("gopher_keep"), col("clf_keep"), col("entropy_keep"))
      .agg(count(lit(1)).as("n_docs"))
    census
      .withColumn("__t", sum(col("n_docs")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
      .select(col("gopher_keep"), col("clf_keep"), col("entropy_keep"),
        (col("gopher_keep") && col("clf_keep") && col("entropy_keep"))
          .as("unanimous"),
        col("n_docs"),
        round(col("n_docs").cast("double") / col("__t").cast("double"), 6)
          .as("share"))
  }

  /** Chance-corrected agreement between the three quality filters —
    * the label-QA statistic a filter ensemble needs beyond
    * [[qualityAgreement]]'s raw census: high raw agreement is
    * meaningless when the base rate is extreme (two filters that keep
    * 95% of docs agree 90%+ by chance alone). Emits one row per filter
    * pair with Cohen's kappa (po = observed agreement, pe = chance
    * agreement from the marginals) plus a `fleiss:all` row with Fleiss'
    * kappa over all three raters (n = 3, two categories). Degenerate
    * marginals (pe = 1, all verdicts unanimous) yield a null kappa
    * rather than a 0/0.
    *
    * Scale shape: the three verdict frames join on the id, then ONE
    * map-side-combined aggregate reduces the corpus to a single row of
    * integer counts; the 4-row report is a literal frame crossJoined
    * with that broadcast 1-row aggregate (the scalar re-entry pattern),
    * so the corpus is scanned once per filter and never again. All
    * statistics are exact-integer-derived; divisions are the only
    * floating point, in an association the oracle mirrors verbatim. */
  def raterAgreement(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, minEntropy: Double = 2.5)
      : org.apache.spark.sql.DataFrame = {
    // same fused single-pass verdict frame as [[qualityAgreement]]
    // (r15) — the three screens are per-doc, so the former three-scan
    // + two-join shape carried no information the fused pass lacks
    val v = withVerdicts(docs, idCol, textCol, minEntropy)
      .select(col("id"), col("gopher_keep").cast("int").as("g"),
        col("clf_keep").cast("int").as("c"),
        col("entropy_keep").cast("int").as("e"))
      .withColumn("nk", col("g") + col("c") + col("e"))
    val agg = v.agg(
      count(lit(1)).as("n"),
      sum(col("g")).as("ka"), sum(col("c")).as("kb"), sum(col("e")).as("kc"),
      sum(col("g") * col("c")).as("kab"),
      sum(col("g") * col("e")).as("kac"),
      sum(col("c") * col("e")).as("kbc"),
      sum(col("nk") * (col("nk") - 1)
        + (lit(3) - col("nk")) * (lit(2) - col("nk"))).as("fl"))
    val pairs = docs.sparkSession
      .createDataFrame(Seq(Tuple1("gopher:clf"), Tuple1("gopher:entropy"),
        Tuple1("clf:entropy"), Tuple1("fleiss:all")))
      .toDF("pair")
    val j = pairs.crossJoin(broadcast(agg))
    val nD = col("n").cast("double")
    val kx = when(col("pair") === "clf:entropy", col("kb"))
      .otherwise(col("ka")).cast("double")
    val ky = when(col("pair") === "gopher:clf", col("kb"))
      .otherwise(col("kc")).cast("double")
    val nxy = when(col("pair") === "gopher:clf", col("kab"))
      .when(col("pair") === "gopher:entropy", col("kac"))
      .otherwise(col("kbc")).cast("double")
    val cohenPo = (nD - kx - ky + lit(2.0) * nxy) / nD
    val cohenPe = (kx / nD) * (ky / nD) +
      (lit(1.0) - kx / nD) * (lit(1.0) - ky / nD)
    val pk = (col("ka") + col("kb") + col("kc")).cast("double") / (nD * 3.0)
    val fleissPo = col("fl").cast("double") / (nD * 6.0)
    val fleissPe = pk * pk + (lit(1.0) - pk) * (lit(1.0) - pk)
    val po = when(col("pair") === "fleiss:all", fleissPo).otherwise(cohenPo)
    val pe = when(col("pair") === "fleiss:all", fleissPe).otherwise(cohenPe)
    val kappa = when(lit(1.0) - pe =!= 0.0, (po - pe) / (lit(1.0) - pe))
    j.select(col("pair"), col("n").as("n_docs"),
      round(po, 6).as("po_r"), round(pe, 6).as("pe_r"),
      round(kappa, 6).as("kappa_r"))
  }

  /** End-to-end TRAINING-DATA PREP: exact dedup (min-id survivor) ->
    * benchmark decontamination (drop docs sharing any 13-gram with the
    * eval set) -> sliding-window chunking -> per-source accounting.
    * The composition a pretraining data pipeline actually ships:
    * [[clean]] curates documents; this turns the curated corpus into
    * training sequences with an auditable per-source yield report
    * (how many docs/chunks/tokens each source contributed — the number
    * data governance asks for).
    *
    * Every stage is an already-oracle-checked operator; the stages
    * compose as semi/anti joins on the id (16-byte shuffles, never
    * text), the chunker is a pure narrow map, and the final report is
    * one map-side-combined aggregate keyed by source. */
  def prepare(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      benchmark: org.apache.spark.sql.DataFrame, benchTextCol: String,
      window: Int = 64, stride: Int = 48, n: Int = 13)
      : org.apache.spark.sql.DataFrame = {
    val keep = Dedup.exactByFingerprint(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    // NOT checkpointed (unlike curate below): s1/s2 here are cheap
    // scan+semi-join chains re-derived at most twice each, and a
    // measured attempt at materializing them came out ~4% SLOWER at
    // sf0.1 (the corpus write costs more than the saved recompute)
    val s1 = docs.join(keep, Seq(idCol), "left_semi")
    val contaminated = Dedup.decontaminate(s1, idCol, textCol,
      benchmark, benchTextCol, n)
      .select(col("id").as(idCol))
    val s2 = s1.join(contaminated, Seq(idCol), "left_anti")
    val chunks = Packing.chunkDocs(s2, idCol, textCol, window, stride)
    chunks
      .join(s2.select(col(idCol).as("id"), col(sourceCol).as("source")),
        Seq("id"))
      .groupBy(col("source"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("sum_chunk_tokens"))
  }

  /** Full curation funnel, v2 of [[prepare]] with the model-based and
    * budgeted stages: quality-classifier filter -> exact dedup (min-id
    * survivor) -> benchmark decontamination -> per-source token-budget
    * selection, reported as a per-source FUNNEL (docs surviving each
    * stage + tokens finally kept) — the drop accounting a
    * data-governance review asks for, and the quickest way to see which
    * stage is eating a source.
    *
    * Composition discipline matches [[prepare]]: every stage is an
    * already-oracle-checked operator, stages connect by semi/anti joins
    * on the id (never text), and each funnel counter is one
    * map-side-combined aggregate keyed by source. */
  def curate(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      benchmark: org.apache.spark.sql.DataFrame, benchTextCol: String,
      budgetTokens: Long, n: Int = 13, bucketWidth: Long = 4096)
      : org.apache.spark.sql.DataFrame = {
    // the funnel is a multi-OUTPUT dag: every stage feeds both the next
    // stage and its own per-source counter below, so without a
    // materialization the classifier chain re-tokenizes the corpus once
    // per consumer (~8 evaluations end-to-end; measured 8.5s -> see
    // STATUS r6). One eager localCheckpoint per stage = one tokenize
    // pass + narrow cached joins; at cluster scale this is the standard
    // cache/checkpoint of each funnel stage, each strictly smaller than
    // the last
    val s1 = TextStats.classifyQuality(docs, textCol)
      .filter(col("keep"))
      .select(docs.columns.map(col): _*)
      .localCheckpoint(true)
    val keep = Dedup.exactByFingerprint(s1, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val s2 = s1.join(keep, Seq(idCol), "left_semi").localCheckpoint(true)
    val contaminated = Dedup.decontaminate(s2, idCol, textCol,
      benchmark, benchTextCol, n)
      .select(col("id").as(idCol))
    val s3 = s2.join(contaminated, Seq(idCol), "left_anti")
      .localCheckpoint(true)
    val kept = Sampling.tokenBudget(s3, idCol, textCol, sourceCol,
      budgetTokens, bucketWidth)
    def cnt(df: org.apache.spark.sql.DataFrame, name: String) =
      df.groupBy(col(sourceCol).as("source")).agg(count(lit(1)).as(name))
    cnt(docs, "n_in")
      .join(cnt(s1, "n_quality"), Seq("source"), "left")
      .join(cnt(s2, "n_unique"), Seq("source"), "left")
      .join(cnt(s3, "n_clean"), Seq("source"), "left")
      .join(kept.groupBy(col("source")).agg(count(lit(1)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_kept")), Seq("source"), "left")
      .na.fill(0L, Seq("n_quality", "n_unique", "n_clean", "n_kept",
        "tokens_kept"))
  }
}
