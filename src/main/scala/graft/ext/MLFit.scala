package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed model FITTING on Spark — the training side of the
  * quality-classifier story ([[TextStats.classifyQuality]] is the
  * inference side with literal weights; this learns such weights from
  * labels, entirely in-engine, no ML library).
  *
  * Full-batch gradient descent for logistic regression is the textbook
  * data-parallel shape (public: e.g. the original Spark/MLlib papers):
  * broadcast the (d+1)-vector of weights into the plan as literals,
  * compute per-row sigmoid residuals in one codegen'd projection, reduce
  * d+1 gradient sums with map-side partial aggregation, update weights
  * on the driver (d+1 scalars — a bounded collect by contract). Each
  * iteration is therefore ONE aggregation job over the feature frame;
  * at 100 TB the only data movement per step is one partial-agg row per
  * partition. Callers should cache/checkpoint the feature frame —
  * every iteration re-scans it.
  *
  * Determinism (the oracle discipline): the logit is LEFT-ASSOCIATED
  * (((b + w1*x1) + w2*x2) + ...), per-row gradient terms are rounded at
  * 8 decimals BEFORE the exact DECIMAL(28,14) sums (libm `exp` may
  * differ in the last ulp across engines; at 1e-8 granularity both
  * agree), and the driver update mirrors the SQL op order
  * `w - (lr * (g / n))`. Weights are bit-stable across engines and
  * partitionings.
  */
object MLFit {

  /** Fit logistic-regression weights by `iterations` full-batch GD steps
    * from a zero start. `featureCols` must be DOUBLE columns; `labelCol`
    * is 0/1 (any numeric). Returns `bias +: featureCols`-ordered
    * weights. */
  def logisticFit(df: DataFrame, featureCols: Seq[String], labelCol: String,
      iterations: Int = 3, lr: Double = 0.5): Array[Double] = {
    val n = df.count().toDouble
    require(n > 0, "logisticFit on an empty frame")
    var w = Array.fill(featureCols.size + 1)(0.0)
    for (_ <- 1 to iterations) {
      val z = featureCols.zipWithIndex.foldLeft(lit(w(0)): Column) {
        case (acc, (f, j)) => acc + (lit(w(j + 1)) * col(f))
      }
      val p = lit(1.0) / (lit(1.0) + exp(-z))
      val r = p - col(labelCol).cast("double")
      val terms = round(r, 8).cast("decimal(28,14)") +:
        featureCols.map(f => round(r * col(f), 8).cast("decimal(28,14)"))
      val sums = df.agg(sum(terms.head), terms.tail.map(sum): _*).head()
      w = w.indices.map { j =>
        val g = sums.getDecimal(j).doubleValue
        w(j) - (lr * (g / n))
      }.toArray
    }
    w
  }

  /** Closed-form simple linear regression (one feature) — the exact
    * counterpart to [[logisticFit]]'s iterative fitting: slope,
    * intercept, and R^2 derive from five moment sums in ONE aggregation
    * pass (map-side combined; the reduce sees one 6-column row per
    * partition), with no driver collect at all — the result is a
    * 1-row DataFrame computed in-plan.
    *
    * Determinism: each moment term (x, y, xy, x^2, y^2) is cast to
    * DECIMAL(38,12) per row and summed exactly (order-free), then the
    * closed-form arithmetic runs on the summed doubles in a fixed op
    * order — bit-stable across engines and partitionings, same
    * discipline as [[graft.profile.NumericProfile.corrMatrix]].
    * Multi-feature fits: use [[logisticFit]]'s GD shape with an
    * identity link, or normal equations over [[graft.profile
    * .NumericProfile.corrMatrix]]'s co-moments. */
  def simpleLinearFit(df: DataFrame, xCol: String, yCol: String)
      : DataFrame = {
    val x = col(xCol).cast("double")
    val y = col(yCol).cast("double")
    def dsum(c: Column) = sum(c.cast("decimal(38,12)")).cast("double")
    val nD = col("n").cast("double")
    df.agg(count(lit(1)).as("n"),
        dsum(x).as("sx"), dsum(y).as("sy"), dsum(x * y).as("sxy"),
        dsum(x * x).as("sxx"), dsum(y * y).as("syy"))
      .withColumn("num", nD * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", nD * col("sxx") - col("sx") * col("sx"))
      // Degenerate-variance guard (corrMatrix's CASE WHEN sqrt(...) > 0
      // convention): constant x (den = 0) or constant y (deny = 0)
      // yields NULL slope/intercept/R^2 instead of NaN/Infinity.
      .withColumn("deny", nD * col("syy") - col("sy") * col("sy"))
      .withColumn("b1", when(col("den") > 0, col("num") / col("den")))
      .withColumn("b0",
        when(col("den") > 0, (col("sy") - (col("b1") * col("sx"))) / nD))
      .withColumn("r2", when(col("den") > 0 && col("deny") > 0,
        (col("num") * col("num")) / (col("den") * col("deny"))))
      .select(col("n"), col("b0"), col("b1"), col("r2"))
  }

  /** [[logisticFit]] as a (feature, weight) frame — "bias" first, then
    * the feature columns in call order. */
  def logisticFitDF(df: DataFrame, featureCols: Seq[String],
      labelCol: String, iterations: Int = 3, lr: Double = 0.5): DataFrame = {
    val w = logisticFit(df, featureCols, labelCol, iterations, lr)
    val spark = df.sparkSession
    import spark.implicits._
    ("bias" +: featureCols).zip(w).toSeq.toDF("feature", "weight")
  }

  /** Bayesian-smoothed target (mean) encoding per category (the
    * Micci-Barreca 2001 empirical-Bayes form, public): encoded =
    * (sum_y + m * global_mean) / (n + m). The m pseudo-observations of
    * the global mean keep a 3-row category from memorizing its labels
    * — the standard high-cardinality-categorical feature prep.
    *
    * Scale shape: one map-side-combined groupBy on the category; the
    * global mean comes from a window over the CATEGORY frame
    * (cardinality-bound). Float discipline: targets rounded at 6 and
    * decimal-summed (order-free), so the encoding is bit-stable across
    * partitionings and engines. */
  def targetEncode(df: DataFrame, catCol: String, targetCol: String,
      m: Double = 50.0): DataFrame = {
    require(m > 0.0, s"smoothing m must be positive: $m")
    val W = org.apache.spark.sql.expressions.Window
    val agg = df.filter(col(targetCol).isNotNull)
      .groupBy(col(catCol).as("category"))
      .agg(count(lit(1)).as("n"),
        sum(round(col(targetCol).cast("double"), 6).cast("decimal(28,6)"))
          .as("sdec"))
    agg
      .withColumn("gs",
        sum(col("sdec")).over(W.partitionBy(lit(1))).cast("double"))
      .withColumn("gn", sum(col("n")).over(W.partitionBy(lit(1))))
      .withColumn("s", col("sdec").cast("double"))
      .withColumn("gmean", col("gs") / col("gn").cast("double"))
      .select(col("category"), col("n"),
        round(col("s") / col("n").cast("double"), 6).as("raw_mean"),
        round((col("s") + lit(m) * col("gmean")) /
          (col("n").cast("double") + lit(m)), 6).as("encoded"))
  }

  /** fastText/CCNet-shaped quality-classifier TRAINING (the public
    * in-pipeline practice: Joulin et al. 2016 hash word n-grams into a
    * fixed bucket table and fit a linear model; CCNet and the LLaMA
    * data pipeline train exactly this shape as the quality/language
    * filter). Features are hashed word uni+bigram bag-of-grams —
    * `hash64(gram) pmod d` buckets, count-normalized per document —
    * feeding [[logisticFit]]'s full-batch GD unchanged. Documents with
    * zero grams (empty normalized text) are excluded — they have no
    * features and would divide by zero in BOTH engines.
    *
    * Scale shape: the feature build is one narrow codegen'd projection
    * — grams never explode (bucket counts come from a higher-order
    * filter over the per-doc gram array), so nothing shuffles; the fit
    * is `iterations` map-side-combined aggregations and the only
    * driver state is the (d+1)-double weight vector. At fastText's
    * production d (2M buckets) the same plan holds with a sparse
    * (bucket, count) explode + groupBy instead of d projected columns.
    *
    * Determinism: gram order is positional, bucket counts are exact
    * integers, and the GD follows [[logisticFit]]'s round@8 decimal-
    * sum discipline — bit-stable across partitionings and engines. */
  def hashedGramTrain(df: DataFrame, textCol: String, labelCol: String,
      d: Int = 8, iterations: Int = 3, lr: Double = 0.5): DataFrame = {
    require(d >= 2 && d <= 64, s"bucket count out of range: $d")
    val toks = TextStats.tokens(TextStats.normalized(col(textCol)))
    val grams = {
      val t = col("__t")
      concat(t,
        when(size(t) >= 2,
          transform(sequence(lit(0), size(t) - 2), i =>
            concat(element_at(t, i + 1), lit(" "),
              element_at(t, i + 2))))
          .otherwise(array().cast("array<string>")))
    }
    // The zero-gram guard filters AFTER the eager checkpoint, never
    // before it: a `filter(size(__g) > 0)` above these projections gets
    // pushed below them, and the pushed predicate inlines the FULL
    // tokenize+gram chain — whose bigram lambda re-reads the token
    // array per element — into an interpreted per-row predicate. That
    // re-tokenizes per gram element (quadratic in doc length) and
    // measured 17.6s vs 0.6s for the projection alone at sf0.1
    // (OPTIMIZATION_r15.md). Post-checkpoint the predicate runs on the
    // materialized count column. Excluded rows carry NaN features in
    // the checkpoint and are dropped before the fit — same rows, same
    // count, same weights.
    val feats = df
      .withColumn("__t", toks)
      .withColumn("__g", grams)
      .withColumn("__b", transform(col("__g"),
        g => pmod(graft.functions.Hashing.hash64(g), lit(d))))
      .select((0 until d).map(j =>
        when(size(col("__b")) > 0,
          size(filter(col("__b"), b => b === j)).cast("double") /
            size(col("__b")).cast("double"))
          .otherwise(0.0).as(s"x$j")) :+
        col(labelCol).cast("double").as("__y") :+
        size(col("__b")).as("__n"): _*)
      .localCheckpoint() // every GD step re-scans; hash once
      .filter(col("__n") > 0)
    logisticFitDF(feats, (0 until d).map(j => s"x$j"), "__y",
      iterations, lr)
  }
}
