package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * Everything here is HASH-derived, never RNG-derived: a sample must be
  * reproducible across runs, cluster layouts, partition counts, and
  * engines (the portable md5-based [[Hashing.hash64]] is bit-identical
  * in the DuckDB oracle), and membership must be decidable per-row with
  * no coordination — `rand()`-based sampling is none of these (Spark's
  * `sample()` is seed-stable only for a fixed partitioning). The salt
  * decorrelates independent samples drawn from the same keys: two
  * pipelines sampling 10% with different salts each get 10%, not the
  * same rows.
  *
  * Scale shape: [[hashSample]] and [[assignSplit]] are pure narrow
  * projections/filters (no shuffle, pushdown-composable — the filter
  * reaches the scan); [[stratifiedQuota]] is one shuffle on the strata
  * key with the rank<=k predicate pushed map-side by WindowGroupLimit.
  */
object Sampling {

  /** Salted per-row draw in [0, 1000): the basis for all operators
    * here. Rows keep their draw across engines and runs. */
  private def draw(idCol: String, salt: String) =
    Hashing.hash64(concat(col(idCol).cast("string"), lit(":" + salt))) % 1000

  /** DuckDB mirror of [[draw]] (for oracle SQL). */
  def drawSql(idExpr: String, salt: String): String =
    Hashing.hash64Sql(s"CAST($idExpr AS VARCHAR) || ':$salt'") + " % 1000"

  /** Reproducible Bernoulli-by-hash sample: keeps ~`permille`/1000 of
    * rows, exactly the same rows every run. */
  def hashSample(df: DataFrame, idCol: String, permille: Int,
      salt: String = "sample"): DataFrame =
    df.filter(draw(idCol, salt) < permille)

  /** Deterministic dataset split: appends a `split` column assigned by
    * cumulative per-mille ranges over the salted draw — e.g.
    * `Seq("train" -> 800, "val" -> 100, "test" -> 100)`. Rows beyond
    * the cumulative total (if it is < 1000) get null (excluded). */
  def assignSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Int)], salt: String = "split"): DataFrame = {
    require(fractions.map(_._2).sum <= 1000, "fractions exceed 1000 permille")
    val d = draw(idCol, salt)
    val bounds = fractions.scanLeft(0)(_ + _._2).tail
    // when-chain over ascending bounds: built back-to-front so the
    // outermost test is the smallest bound — the first [0, hi) range
    // containing the draw wins
    val chain = fractions.zip(bounds).reverse
      .foldLeft(lit(null).cast("string")) { case (els, ((name, _), hi)) =>
        when(d < hi, lit(name)).otherwise(els)
      }
    df.withColumn("split", chain)
  }

  /** Leakage-proof split assignment: the draw key is the normalized
    * CONTENT fingerprint (md5 of the fold used by the dedup tier), not
    * the row id — every exact copy of a text therefore lands in the
    * SAME split by construction (equal fingerprint => equal draw), so
    * exact-duplicate cross-split leakage is structurally zero rather
    * than something to audit after the fact. This is the standard fix
    * once [[graft.ext.Dedup.crossSplitLeakage]] flags an id-keyed
    * split; near-duplicates still need the near-dup pass first. Same
    * narrow, shuffle-free shape as [[assignSplit]]. */
  def assignSplitByContent(df: DataFrame, textCol: String,
      fractions: Seq[(String, Int)], salt: String = "csplit"): DataFrame = {
    val withFp = df.withColumn("__fp",
      TextStats.fingerprintMd5(col(textCol)))
    assignSplit(withFp, "__fp", fractions, salt).drop("__fp")
  }

  /** Data-mixture downsampling (the "data mixing" step of LLM corpus
    * assembly, e.g. The Pile / LLaMA mixture tables — public papers):
    * each group keeps its own permille of rows via the hash-Bernoulli
    * draw, re-weighting source proportions toward a target mixture.
    * Groups absent from `rates` fall to `defaultPermille` (0 = drop).
    *
    * Same determinism contract as [[hashSample]], and the same scale
    * shape: a pure narrow filter — the rate lookup is a when-chain on
    * the group column, so the whole operator is one codegen'd predicate
    * at the scan with NO join against a rates table (broadcast-joining
    * a tiny dim would also work but leaves an Exchange in streaming
    * plans; a literal chain is free). */
  def mixtureSample(df: DataFrame, idCol: String, groupCol: String,
      rates: Seq[(String, Int)], defaultPermille: Int = 0,
      salt: String = "mixture"): DataFrame = {
    require(rates.forall(r => r._2 >= 0 && r._2 <= 1000) &&
      defaultPermille >= 0 && defaultPermille <= 1000,
      "permille rates must be in [0, 1000]")
    val rate = rates.foldRight(lit(defaultPermille): org.apache.spark.sql.Column) {
      case ((g, p), els) => when(col(groupCol) === g, lit(p)).otherwise(els)
    }
    df.filter(draw(idCol, salt) < rate)
  }

  /** Temperature-based mixture weights (the multilingual/multi-source
    * rebalancing rule of mBERT/XLM-R and LLM data mixing — public
    * papers): source s gets sampling weight proportional to n_s^alpha,
    * alpha < 1 flattening the head so small sources are not drowned.
    * Returns one row per source: count, weight share, and a doc quota
    * out of `budgetDocs`.
    *
    * Portability discipline: alpha is restricted to quarters
    * {0.25, 0.5, 0.75, 1.0} so n^alpha evaluates as sqrt compositions
    * (each sqrt is IEEE-correctly-rounded in both engines; pow() is
    * not) — the oracle mirrors the same composition. Each weight is
    * then quantized to decimal(28,10) BEFORE the total: a double sum's
    * value depends on accumulation order (and Spark's partial-agg order
    * is not even run-stable), while the decimal sum is exact and
    * order-free. Quotas derive from the 6-dp-rounded share so the
    * integer never sits on an engine-dependent boundary.
    *
    * Scale shape: one partial-agg count shuffle over the source column
    * (rows = #sources), one broadcast single-row total re-entry. */
  def temperatureWeights(docs: DataFrame, sourceCol: String,
      alpha: Double = 0.5, budgetDocs: Long = 1000000L): DataFrame = {
    def pows(n: Column): Column = alpha match {
      case 1.0  => n.cast("double")
      case 0.5  => sqrt(n.cast("double"))
      case 0.25 => sqrt(sqrt(n.cast("double")))
      case 0.75 => sqrt(n.cast("double")) * sqrt(sqrt(n.cast("double")))
      case _ => throw new IllegalArgumentException(
        s"alpha must be one of 0.25/0.5/0.75/1.0 (sqrt-composable), got $alpha")
    }
    val counts = docs.groupBy(col(sourceCol).as("source"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("w", pows(col("n_docs")).cast("decimal(28,10)"))
    val total = counts.agg(sum(col("w")).as("w_total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("w").cast("double") / col("w_total").cast("double"), 6))
      .withColumn("quota",
        floor(col("share") * budgetDocs + lit(0.5)).cast("long"))
      .select(col("source"), col("n_docs"), col("share"), col("quota"))
  }

  /** Per-source token-budget selection (the "N billion tokens from each
    * source" step of corpus assembly): within each source, take docs in
    * ascending id order while the running token total stays within
    * `budgetTokens`; emit the kept docs with their running totals.
    *
    * An ordered prefix sum is inherently sequential, so a single
    * per-source window would serialize each source through one task. We
    * use the two-level distributed prefix sum instead (same scheme as
    * [[Packing.packSequences]], but with ORDER-PRESERVING range buckets
    * `id div bucketWidth` rather than hashed streams, because a budget
    * prefix must respect the global doc order): (1) per-(source,bucket)
    * token sums — one partial-agg shuffle; (2) per-source running
    * offsets across buckets — a window over |docs|/bucketWidth rows
    * (raise `bucketWidth` to shrink it); (3) within-bucket prefix sums
    * + offset — windows bounded by bucketWidth docs each, fully
    * parallel. The budget filter cannot be pushed below the prefix sum
    * (whether a doc survives depends on every earlier doc), but buckets
    * whose offset already exceeds the budget are eliminated by the
    * filter without their inner window ever producing survivors. */
  def tokenBudget(docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, budgetTokens: Long,
      bucketWidth: Long = 4096): DataFrame = {
    require(budgetTokens >= 0 && bucketWidth > 0)
    val staged = docs.select(col(idCol).cast("long").as("id"),
      col(sourceCol).as("source"),
      TextStats.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      // integer div, not double `/`: exact for the full bigint id range
      expr(s"CAST(`$idCol` AS BIGINT) div $bucketWidth").as("bkt"))
    val perBucket = staged.groupBy(col("source"), col("bkt"))
      .agg(sum(col("n_tokens")).as("bkt_tokens"))
    val wAcross = Window.partitionBy(col("source")).orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offsets = perBucket
      .withColumn("offset", sum(col("bkt_tokens")).over(wAcross)
        - col("bkt_tokens"))
      .select(col("source"), col("bkt"), col("offset"))
    val wIn = Window.partitionBy(col("source"), col("bkt"))
      .orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged.join(offsets, Seq("source", "bkt"))
      .withColumn("cum_tokens", col("offset") + sum(col("n_tokens")).over(wIn))
      .filter(col("cum_tokens") <= budgetTokens)
      .select(col("id"), col("source"), col("n_tokens"), col("cum_tokens"))
  }

  /** Stratified exact-quota sample: per stratum, the `quota` rows with
    * the smallest (salted draw, id) — a deterministic "random" top-k
    * per group. One shuffle on the strata columns; WindowGroupLimit
    * caps each map partition at `quota` rows per stratum before the
    * exchange. */
  def stratifiedQuota(df: DataFrame, strataCols: Seq[String], idCol: String,
      quota: Int, salt: String = "strata"): DataFrame = {
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(draw(idCol, salt).asc, col(idCol).asc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= quota)
      .drop("__rn")
  }

  /** Weighted sample WITHOUT replacement, k per group — Efraimidis-
    * Spirakis A-ES (public algorithm): each row draws a deterministic
    * hash-uniform u and competes on key `ln(u)/w`; the k largest keys
    * per group are a proper weighted sample, heavier rows
    * proportionally likelier, no row twice. The exponential-key form
    * avoids `pow` (ln composes with the repo's hash-uniform in one
    * codegen'd expression).
    *
    * Deterministic: u is a pure function of (id, salt) — membership is
    * reproducible across runs, engines, and partitionings (the same
    * contract as [[hashSample]]/[[assignSplit]]). Rows with
    * non-positive weight are excluded (ln(u)/w flips sign).
    *
    * Scale: one shuffle on the group columns; the per-group top-k is a
    * rank<=k window, so WindowGroupLimit caps each map partition at k
    * rows per group BEFORE the exchange. */
  /** The A-ES competition key as a shared expression: rounded@12
    * BEFORE ranking — ln() can differ from another libm in the last
    * ulp, and an unrounded key at rank k could flip sample membership
    * across platforms/engines (the repo rounds every other log output
    * at 8 decimals for the same reason; 12 keeps far more weight
    * resolution than the gate needs while still absorbing 1-ulp
    * drift). Shared by the batch window form and the streaming keyed
    * state ([[graft.streaming.StreamProfile.streamWeightedSample]]) so
    * both deployments compete on ONE key definition. */
  private[graft] def aesKey(id: Column, weight: Column,
      salt: String = "wsample"): Column = {
    val h = Hashing.hash64(
      concat(id.cast("string"), lit(":" + salt))) % 1000000L
    round(log((h.cast("double") + lit(1.0)) / lit(1000001.0)) /
      weight.cast("double"), 12)
  }

  def weightedSample(df: DataFrame, groupCols: Seq[String], idCol: String,
      weightCol: String, k: Int, salt: String = "wsample"): DataFrame = {
    // Ties after rounding fall to the deterministic (key, id) order.
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__k").desc, col(idCol).asc)
    df.filter(col(weightCol) > 0)
      .withColumn("__k", aesKey(col(idCol), col(weightCol), salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__k", "__rn")
  }
}
