package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Gopher-style repetition statistics (Rae et al. 2021, "Scaling Language
  * Models: ...Gopher", appendix A1.1 — public paper) for training-corpus
  * quality filtering: documents dominated by repeated lines or n-grams
  * are low-quality (boilerplate, scraped nav bars, keyword stuffing).
  *
  * Every statistic is a per-row higher-order-function computation over
  * the scan — NO shuffle, NO explode, embarrassingly parallel at 100 TB.
  * The per-doc n-gram counts use an array_sort + run-length fold
  * (O(G log G) per doc) instead of explode + groupBy(doc, gram) (a
  * corpus-wide shuffle whose key count is ~tokens-per-doc × docs).
  *
  * Cross-engine float discipline: all fractions are a single IEEE
  * division of two exactly-computed integers, so DuckDB reproduces them
  * bit-for-bit (see Queries.scala scaladoc).
  *
  * Semantics (deterministic, documented here as the spec):
  *  - lines = trimmed split on '\n', empties dropped;
  *  - dup_line_frac       = (n_lines - n_distinct_lines) / n_lines;
  *  - dup_line_char_frac  = chars in every occurrence of a line that
  *                          appears >1 time / total line chars;
  *  - topN_char_frac      = occurrences(most frequent word N-gram) ×
  *                          len(that gram) / len(normalized text), ties
  *                          to the lexicographically smallest gram;
  *  - dupN_char_frac      = Σ count·len over grams with count>1 /
  *                          Σ count·len over all grams.
  */
object Repetition {

  /** Trimmed, non-empty lines of a text column. */
  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => length(l) > 0)

  /** Overlapping word n-grams (space-joined) from a token array; empty
    * array when the doc has fewer than n tokens. */
  def wordGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Run-length scan of a SORTED string array: returns a struct with the
    * longest run (`best_run`, int) and its value (`best_gram`) — strict
    * `>` keeps the FIRST maximal run, i.e. the lexicographically
    * smallest gram among ties (ascending sort). */
  def topRun(sortedGrams: Column): Column =
    aggregate(
      sortedGrams,
      struct(lit("").as("prev"), lit(0).as("run"),
        lit(0).as("best_run"), lit("").as("best_gram")),
      (acc, g) => {
        val run = when(g === acc.getField("prev"),
          acc.getField("run") + 1).otherwise(lit(1))
        val better = run > acc.getField("best_run")
        struct(g.as("prev"), run.as("run"),
          when(better, run).otherwise(acc.getField("best_run")).as("best_run"),
          when(better, g).otherwise(acc.getField("best_gram")).as("best_gram"))
      })

  /** Σ count·len over values occurring >1 time in a SORTED string array
    * (long). Folds runs left-to-right, flushing a run's chars when the
    * value changes; the finish lambda flushes the final run. */
  def dupRunChars(sortedGrams: Column): Column =
    aggregate(
      sortedGrams,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("dup")),
      (acc, g) => {
        val same = g === acc.getField("prev")
        val flushed = when(acc.getField("run") > 1 && !same,
          acc.getField("dup") +
            acc.getField("run") * length(acc.getField("prev")))
          .otherwise(acc.getField("dup"))
        struct(g.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          flushed.as("dup"))
      },
      st => when(st.getField("run") > 1,
        st.getField("dup") + st.getField("run") * length(st.getField("prev")))
        .otherwise(st.getField("dup")))

  /** Σ len over all elements of a string array (long). */
  def totalChars(arr: Column): Column =
    aggregate(arr, lit(0L), (acc, x) => acc + length(x))

  private def frac(num: Column, denom: Column): Column =
    when(denom > 0, num.cast("double") / denom.cast("double")).otherwise(0.0)

  /** Adds the five repetition statistics for `textCol`:
    * n_lines, dup_line_frac, dup_line_char_frac, top2_char_frac,
    * top3_char_frac, dup5_char_frac. Staged intermediate columns (the
    * repo-wide HOF discipline: inlining an array expression into every
    * consumer re-evaluates it per element). */
  def withRepetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val staged = df
      .withColumn("__lines", lines(col(textCol)))
      .withColumn("__toks", TextStats.tokens(TextStats.normalized(col(textCol))))
    val withGrams = staged
      .withColumn("__g2s", array_sort(wordGrams(col("__toks"), 2)))
      .withColumn("__g3s", array_sort(wordGrams(col("__toks"), 3)))
      .withColumn("__g5s", array_sort(wordGrams(col("__toks"), 5)))
      .withColumn("__top2", topRun(col("__g2s")))
      .withColumn("__top3", topRun(col("__g3s")))
      .withColumn("__norm_len", length(concat_ws(" ", col("__toks"))).cast("long"))

    val ls = col("__lines")
    val nLines = size(ls)
    // same Σ count·len over duplicated values as the n-gram stat — the
    // sorted run-length fold, O(L log L), not a per-distinct-line
    // re-filter of the whole array (O(L²) on exactly the boilerplate
    // docs this filter targets)
    val dupLineChars = dupRunChars(array_sort(ls))

    def topFrac(top: Column): Column =
      frac(top.getField("best_run").cast("long") * length(top.getField("best_gram")),
        col("__norm_len"))

    withGrams
      .withColumn("n_lines", nLines)
      .withColumn("dup_line_frac",
        frac(nLines - size(array_distinct(ls)), nLines))
      .withColumn("dup_line_char_frac", frac(dupLineChars, totalChars(ls)))
      .withColumn("top2_char_frac", topFrac(col("__top2")))
      .withColumn("top3_char_frac", topFrac(col("__top3")))
      .withColumn("dup5_char_frac",
        frac(dupRunChars(col("__g5s")), totalChars(col("__g5s"))))
      .drop("__lines", "__toks", "__g2s", "__g3s", "__g5s",
        "__top2", "__top3", "__norm_len")
  }

  /** Lexical diversity, log-free (entropy would hit the one libm call
    * engines may disagree on by an ulp — see TextStats.topKeywords):
    *  - type_token_ratio = distinct tokens / tokens;
    *  - gini_diversity   = 1 - Σ count² / n²  (Gini impurity of the
    *    token distribution: 0 = one token repeated, →1 = all distinct).
    * Both are single IEEE divisions of exactly-computed integers (the
    * 1.0 subtraction is exact-operand IEEE too). Σ count² rides the
    * same sorted run-length fold as the dup-gram stats — per-row, no
    * shuffle. */
  def withLexicalDiversity(df: DataFrame, textCol: String): DataFrame = {
    val staged = df.withColumn("__lt",
      array_sort(TextStats.tokens(TextStats.normalized(col(textCol)))))
    val sumSq = aggregate(
      col("__lt"),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("acc")),
      (acc, t) => {
        val same = t === acc.getField("prev")
        val flushed = when(!same,
          acc.getField("acc") + acc.getField("run") * acc.getField("run"))
          .otherwise(acc.getField("acc"))
        struct(t.as("prev"),
          when(same, acc.getField("run") + 1).otherwise(lit(1L)).as("run"),
          flushed.as("acc"))
      },
      st => st.getField("acc") + st.getField("run") * st.getField("run"))
    val n = size(col("__lt")).cast("long")
    staged
      .withColumn("n_tokens_lex", n)
      .withColumn("n_types", size(array_distinct(col("__lt"))).cast("long"))
      .withColumn("type_token_ratio",
        frac(size(array_distinct(col("__lt"))).cast("long"), n))
      .withColumn("gini_diversity",
        when(n > 0, lit(1.0) - sumSq.cast("double") / (n * n).cast("double"))
          .otherwise(0.0))
      .drop("__lt")
  }

  /** Gopher-style keep/drop verdict combining repetition stats with the
    * TextStats quality features. Thresholds follow the published Gopher
    * rules where the statistic matches; reasons is a deterministic
    * comma-joined list (alphabetical by flag name) for downstream
    * funnel accounting. */
  val maxDupLineFrac = 0.30
  val maxDupLineCharFrac = 0.20
  val maxTop2CharFrac = 0.20
  val maxTop3CharFrac = 0.18
  val maxDup5CharFrac = 0.15
  val minTokens = 10
  val maxTokens = 100000
  val minStopwordRatio = 0.05

  /** The Gopher reasons expression over an ALREADY-FEATURED frame
    * ([[withRepetitionStats]] + TextStats.withQualityFeatures columns
    * present) — shared verbatim by [[withGopherFilter]] and the fused
    * single-pass agreement/calibration faces (CorpusPipeline,
    * TextStats.calibrationReport), so they cannot fork. */
  private[ext] def gopherReasons: Column = {
    val flags: Seq[(String, Column)] = Seq(
      "dup5_chars" -> (col("dup5_char_frac") > maxDup5CharFrac),
      "dup_line_chars" -> (col("dup_line_char_frac") > maxDupLineCharFrac),
      "dup_lines" -> (col("dup_line_frac") > maxDupLineFrac),
      "few_stopwords" -> (col("stopword_ratio") < minStopwordRatio),
      "length" -> (col("n_tokens") < minTokens || col("n_tokens") > maxTokens),
      "top2_chars" -> (col("top2_char_frac") > maxTop2CharFrac),
      "top3_chars" -> (col("top3_char_frac") > maxTop3CharFrac))
    array_join(
      filter(array(flags.map { case (n, c) =>
        when(c, lit(n)).otherwise(lit(null)) }: _*), x => x.isNotNull), ",")
  }

  def withGopherFilter(df: DataFrame, textCol: String): DataFrame = {
    val feats = TextStats.withQualityFeatures(
      withRepetitionStats(df, textCol), textCol)
    feats
      .withColumn("reasons", gopherReasons)
      .withColumn("keep", col("reasons") === "")
  }

  /** Intra-document repeated-span REMOVAL (the ExactSubstr-remove
    * convention of Lee et al. 2022, "Deduplicating Training Data Makes
    * Language Models Better", arXiv:2107.06499 — public): inside each
    * document, every LATER occurrence of a token `n`-gram that already
    * appeared earlier in the same document marks its n token positions
    * for removal; the first occurrence survives. Catches the
    * within-page duplication (doubled article bodies, repeated nav
    * blocks) that corpus-level dedup never sees because the DOCUMENT
    * is unique. Returns the input ids plus
    * (n_tokens, n_dup_spans, n_removed, clean_text) where clean_text
    * is the surviving tokens rejoined — a token-space transform, like
    * every operator in this module (original punctuation/casing do not
    * survive; run it before tokenized packing, not as a display edit).
    *
    * Scale shape: ALL per-row — grams, duplicate detection (array_sort
    * + adjacent-equal scan, the module's run-length idiom: O(G log G)
    * per doc, never explode + groupBy(doc, gram) whose shuffle key
    * count is tokens x docs), covered-position union, and the
    * filter-rebuild. Zero shuffle; embarrassingly parallel at 100 TB.
    * Worst case per doc is O(dups x tokens) for the coverage filter —
    * bounded by the doc's own length, the usual HOF budget here.
    *
    * Determinism: duplicate-start selection sorts (gram, pos) structs
    * — ties order by pos ascending in any engine, so the SMALLEST
    * position survives, in both this code and the SQL mirror. */
  def removeRepeatedSpans(df: DataFrame, textCol: String, n: Int = 10)
      : DataFrame = {
    require(n >= 2, s"span length n must be >= 2: $n")
    val staged = df
      .withColumn("__t", TextStats.tokens(coalesce(col(textCol), lit(""))))
      .withColumn("__g", wordGrams(col("__t"), n))
      .withColumn("__gp", transform(col("__g"),
        (g, i) => struct(g.as("g"), i.as("p"))))
      .withColumn("__srt", array_sort(col("__gp")))
      // a gram equal to its sorted predecessor is a repeat; its start
      // position is marked (the predecessor — smallest pos — survives)
      .withColumn("__dups", filter(
        transform(col("__srt"), (e, i) =>
          when(i > lit(0) &&
            element_at(col("__srt"), i).getField("g") === e.getField("g"),
            e.getField("p")).otherwise(lit(-1))),
        x => x >= 0))
      .withColumn("__cov", array_distinct(flatten(
        transform(col("__dups"), s => sequence(s, s + lit(n - 1))))))
      .withColumn("__kept", filter(
        transform(col("__t"), (tok, i) => struct(tok.as("tok"), i.as("p"))),
        e => !array_contains(col("__cov"), e.getField("p"))))
    staged
      .withColumn("n_tokens", size(col("__t")))
      .withColumn("n_dup_spans", size(col("__dups")))
      .withColumn("n_removed", size(col("__t")) - size(col("__kept")))
      .withColumn("clean_text", array_join(
        transform(col("__kept"), e => e.getField("tok")), " "))
      .drop("__t", "__g", "__gp", "__srt", "__dups", "__cov", "__kept")
  }
}
