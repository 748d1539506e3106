package graft.clean

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.profile.Profiler
import graft.profile.Profiler.ZScoreModel

/** Cleaning transforms (SURVEY §2.3, T1-T12) as pure DataFrame => DataFrame
  * actions — an immutable, replayable lineage replacing the reference's
  * in-place pandas mutation (/root/reference/app.py:251-350).
  *
  * Every action is a narrow Catalyst plan (filter / withColumn) plus at most
  * one small aggregate to fetch a statistic (median / mean / quantiles /
  * mode); no driver-side row iteration anywhere, so each scales to an
  * arbitrary number of executors.
  */
sealed trait CleaningAction {
  def apply(df: DataFrame): DataFrame
  def describe: String
}

object CleaningAction {

  /** T1 — remove z-outlier rows (app.py:251-254). */
  final case class OutlierRemove(column: String, threshold: Double = 3.0)
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val m = Profiler.zScoreModel(df, column, threshold)
      df.filter(!coalesce(m.mask, lit(false)))
    }
    def describe = s"Removed outlier rows from $column"
  }

  /** T2 — replace outliers with the median of NON-outlier rows
    * (app.py:255-260: `dfw.loc[~mask, col].median()`). Spark >= 3.4
    * `median` is exact with linear interpolation — pandas-compatible;
    * `exact = false` switches to the bounded-memory GK sketch for the
    * 100 TB path (the exact buffer holds every value). */
  final case class OutlierReplaceMedian(column: String, threshold: Double = 3.0,
      exact: Boolean = true) extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val m = Profiler.zScoreModel(df, column, threshold)
      val medCol = if (exact) median(col(column))
        else percentile_approx(col(column), lit(0.5), lit(10000))
      val r = df.filter(!coalesce(m.mask, lit(false)))
        .agg(medCol.cast("double")).head()
      // all-null column -> NULL median: pandas fillna(NaN) is a no-op,
      // so we match rather than NPE on getDouble
      if (r.isNullAt(0)) df
      else df.withColumn(column,
        when(m.mask, lit(r.getDouble(0))).otherwise(col(column)))
    }
    def describe = s"Replaced outliers in $column with median"
  }

  /** T3 — replace outliers with the mean of non-outlier rows
    * (app.py:261-266). */
  final case class OutlierReplaceMean(column: String, threshold: Double = 3.0)
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val m = Profiler.zScoreModel(df, column, threshold)
      val r = df.filter(!coalesce(m.mask, lit(false)))
        .agg(avg(col(column))).head()
      if (r.isNullAt(0)) df // all-null column: match pandas no-op, not NPE
      else df.withColumn(column,
        when(m.mask, lit(r.getDouble(0))).otherwise(col(column)))
    }
    def describe = s"Replaced outliers in $column with mean"
  }

  /** T4 — clip to [q01, q99]. Quantiles are computed over ALL rows,
    * outliers included (app.py:267-273) — unlike T2/T3 which exclude them.
    * Exact interpolated percentile for oracle parity; at 100 TB switch to
    * `approx_percentile` via `exact = false`. */
  final case class OutlierClip(column: String, lo: Double = 0.01,
      hi: Double = 0.99, exact: Boolean = true) extends CleaningAction {
    /** The quantile bounds as a standalone step — callers that also need
      * the bounds for reporting should fetch them once here and pass
      * them to [[ClipBounds]] instead of paying a second percentile
      * aggregation. */
    def bounds(df: DataFrame): (Double, Double) = {
      // both percentiles from ONE aggregation buffer (array form) — the
      // exact percentile buffer holds every value, so never build two
      val r =
        if (exact)
          df.agg(percentile(col(column), array(lit(lo), lit(hi)))).head()
        else
          df.agg(percentile_approx(col(column), array(lit(lo), lit(hi)),
            lit(10000))).head()
      val qs = r.getSeq[Double](0)
      (qs(0), qs(1))
    }
    def apply(df: DataFrame): DataFrame = {
      val (ql, qh) = bounds(df)
      ClipBounds(column, ql, qh)(df)
    }
    def describe = s"Clipped $column to ${lo * 100}%-${hi * 100}% quantiles"
  }

  /** Clip to known bounds (the narrow-map half of T4). */
  final case class ClipBounds(column: String, lo: Double, hi: Double)
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, greatest(least(col(column), lit(hi)), lit(lo)))
    def describe = s"Clipped $column to [$lo, $hi]"
  }

  /** T5 — drop rows null in the column (app.py:281-286). */
  final case class NullDrop(column: String) extends CleaningAction {
    def apply(df: DataFrame): DataFrame = df.na.drop(Seq(column))
    def describe = s"Dropped rows with null in $column"
  }

  /** T6 — impute nulls with the column median; numeric only, type-gated at
    * app.py:287. `exact = false` uses the GK sketch at scale. */
  final case class NullImputeMedian(column: String, exact: Boolean = true)
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      require(df.schema(column).dataType.isInstanceOf[NumericType],
        s"median imputation requires a numeric column, got $column")
      val medCol = if (exact) median(col(column))
        else percentile_approx(col(column), lit(0.5), lit(10000))
      val r = df.agg(medCol.cast("double")).head()
      if (r.isNullAt(0)) df // all-null column: match pandas no-op, not NPE
      else df.na.fill(r.getDouble(0), Seq(column))
    }
    def describe = s"Imputed nulls in $column with median"
  }

  /** T7 — impute nulls with the mode. pandas `mode().iloc[0]` returns the
    * SMALLEST among ties (mode() sorts; app.py:294) — Spark's `mode()` is
    * tie-nondeterministic, so we take the explicit (count desc, value asc)
    * top-1. One shuffle on the value column. */
  final case class NullImputeMode(column: String) extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val top = df.filter(col(column).isNotNull)
        .groupBy(col(column)).agg(count(lit(1)).as("__cnt"))
        .orderBy(col("__cnt").desc, col(column).asc)
        .limit(1).collect()
      if (top.isEmpty) df // empty mode -> '' in reference; nothing to fill with
      else {
        val v = top(0).get(0)
        df.withColumn(column,
          when(col(column).isNull, lit(v)).otherwise(col(column)))
      }
    }
    def describe = s"Imputed nulls in $column with mode"
  }

  /** T8 — fill nulls with the constant "Unknown" (app.py:299-304). */
  final case class NullFillConstant(column: String, value: String = "Unknown")
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame = df.na.fill(value, Seq(column))
    def describe = s"Filled nulls in $column with constant '$value'"
  }

  /** T9 — full-row dedup, pandas keep-FIRST-in-order (app.py:310-315).
    * Spark's `dropDuplicates` keeps an arbitrary row; for deterministic
    * parity we order within each duplicate group by a stable id. When the
    * caller has no stable id we tag `monotonically_increasing_id` (stable
    * for a given file layout) — documented divergence under repartitioning.
    * `deterministic = false` gives the fast arbitrary-keep path. */
  final case class DropDuplicates(subset: Seq[String] = Nil,
      deterministic: Boolean = true, orderColumns: Seq[String] = Nil)
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val keys = if (subset.nonEmpty) subset else df.columns.toSeq
      if (!deterministic) {
        if (subset.nonEmpty) df.dropDuplicates(subset) else df.dropDuplicates()
      } else {
        val hasOrder = orderColumns.nonEmpty
        val tagged = if (hasOrder) df
          else df.withColumn("__rowid", monotonically_increasing_id())
        val ord = (if (hasOrder) orderColumns else Seq("__rowid")).map(col(_).asc)
        val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
        val out = tagged.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        if (hasOrder) out else out.drop("__rowid")
      }
    }
    def describe = "Dropped duplicate rows"
  }

  /** Shared lenient date pipeline for T10: first whitelisted format that
    * parses, rendered back to a yyyy-MM-dd string; unparseable -> null
    * (pandas NaT, app.py:326). */
  def autoParseDate(c: Column): Column =
    date_format(Profiler.lenientParseDate(c), "yyyy-MM-dd")

  /** T10 — auto-parse a mixed-format date column (app.py:321-330). */
  final case class DateAutoParse(column: String) extends CleaningAction {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, autoParseDate(col(column)))
    def describe = s"Parsed $column with format whitelist (auto)"
  }

  /** T11/T12 — force a single format (app.py:331-350). */
  final case class DateForceFormat(column: String, format: String)
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame =
      df.withColumn(column, date_format(
        call_function("try_to_date", col(column).cast(StringType), lit(format)),
        "yyyy-MM-dd"))
    def describe = s"Forced $column to $format parse"
  }
  object DateForceFormat {
    /** Single-letter fields accept 1-2 digits, so non-padded "1/2/2024"
      * parses — Python `strptime('%d/%m/%Y')` (reference app.py:335)
      * accepts unpadded values, and so does the DuckDB oracle's
      * `try_strptime`; round 2's `dd/MM/yyyy` pattern did not. */
    def ddMMyyyy(column: String): DateForceFormat =
      DateForceFormat(column, "d/M/yyyy")
    def yyyyMMdd(column: String): DateForceFormat =
      DateForceFormat(column, "yyyy-M-d")
  }

  /** Feature scaling (the sklearn MinMaxScaler / StandardScaler pair —
    * the standard post-cleaning prep before numeric features feed a
    * model). Both are one tiny stats aggregate broadcast against a
    * narrow per-row map — no shuffle of the data, any corpus size.
    *
    * Cross-engine determinism: min/max are order-free, so MinMax output
    * is bit-identical everywhere with no rounding. ZScore avoids the
    * order-DEPENDENT naive variance sum by computing exact decimal
    * aggregates (sum at 2 decimals, sum of squares at 4 — exact for
    * values on a 2-dp grid like money; document the grid assumption to
    * callers) and deriving var = E[x^2] - mean^2 in plain IEEE ops, so
    * every engine computes the identical doubles. The E[x^2] form
    * cancels when std << |mean| — acceptable for feature scaling, and
    * the exactness of BOTH aggregates makes the cancellation itself
    * deterministic. Nulls stay null; a constant column scales to 0. */
  final case class ScaleMinMax(column: String) extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val st = df.agg(min(col(column)).cast("double").as("__mn"),
        max(col(column)).cast("double").as("__mx"))
      df.crossJoin(broadcast(st))
        .withColumn(s"${column}_scaled",
          when(col("__mx") > col("__mn"),
            (col(column) - col("__mn")) / (col("__mx") - col("__mn")))
            .otherwise(when(col(column).isNotNull, lit(0.0))))
        .drop("__mn", "__mx")
    }
    def describe = s"Min-max scaled $column to [0, 1]"
  }

  /** Robust scaling: (x - median) / IQR — the outlier-immune sibling of
    * [[ScaleZScore]] (one wild value shifts mean AND stddev, but barely
    * moves the quartiles; sklearn's RobustScaler convention). All three
    * quartiles come from ONE exact percentile buffer, fetched as a
    * bounded driver scalar and re-entered as literals (no broadcast
    * join needed); `exact = false` switches to the bounded-memory GK
    * sketch for the 100 TB path, same trade as [[OutlierReplaceMedian]].
    * Quartile interpolation is exact on the dyadic test grids (integer
    * values, quarter fractions), so the literals — and therefore every
    * scaled double, one IEEE subtract + divide away — are bit-identical
    * across engines. Nulls stay null; IQR = 0 scales non-nulls to 0. */
  final case class ScaleRobust(column: String, exact: Boolean = true)
      extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val x = col(column)
      val ps = array(lit(0.25), lit(0.5), lit(0.75))
      val row = if (exact) df.agg(percentile(x, ps)).head()
        else df.agg(percentile_approx(x, ps, lit(10000))).head()
      val out = s"${column}_scaled"
      if (row.isNullAt(0)) // no non-null values: nothing to scale
        df.withColumn(out, when(x.isNotNull, lit(0.0)))
      else {
        val qs = row.getSeq[Double](0)
        val (q1, med, q3) = (qs(0), qs(1), qs(2))
        df.withColumn(out,
          if (q3 > q1) (x - lit(med)) / lit(q3 - q1)
          else when(x.isNotNull, lit(0.0)))
      }
    }
    def describe = s"Robust-scaled $column (median/IQR)"
  }

  /** Quantile discretizer: bin each value by the column's own
    * distribution (equal-POPULATION bins — Spark ML's QuantileDiscretizer
    * / pandas qcut semantics, here with exact boundaries). The nBins-1
    * inner boundaries come from ONE percentile buffer fetched as a
    * bounded driver scalar; binning is then a narrow literal when-cascade
    * (codegen'd comparisons, no join, no second pass). `exact = false`
    * switches the boundary pass to the GK sketch for the 100 TB path.
    * Convention: bin i (1-based) is x <= boundary_i, last bin catches
    * the rest; duplicate boundaries (heavy ties) simply leave earlier
    * bins empty — deterministic, oracle-mirrorable. Nulls stay null. */
  final case class QuantileBin(column: String, nBins: Int = 4,
      exact: Boolean = true) extends CleaningAction {
    require(nBins >= 2, "need at least 2 bins")
    def apply(df: DataFrame): DataFrame = {
      val x = col(column)
      val ps = array((1 until nBins).map(i =>
        lit(i.toDouble / nBins)): _*)
      val row = if (exact) df.agg(percentile(x, ps)).head()
        else df.agg(percentile_approx(x, ps, lit(10000))).head()
      val out = s"${column}_bin"
      if (row.isNullAt(0)) df.withColumn(out, lit(null).cast("int"))
      else {
        val bounds = row.getSeq[Double](0)
        val cascade = bounds.zipWithIndex.foldRight(
          when(x.isNotNull, lit(nBins))) { case ((b, i), rest) =>
          when(x <= lit(b), lit(i + 1)).otherwise(rest)
        }
        df.withColumn(out, when(x.isNotNull, cascade).cast("int"))
      }
    }
    def describe = s"Quantile-binned $column into $nBins bins"
  }

  /** Collapse categories holding less than `minShare` of the rows into
    * a sentinel — the standard guard before one-hot/target encoding (a
    * long categorical tail becomes one feature, and unseen-at-serving
    * categories have a home). A SHARE threshold, not a count, so the
    * same config behaves identically across scale factors. NULL
    * categories collapse too (they are "not a known-frequent level").
    *
    * Scale shape: one map-side-combined count agg; the keep-list is
    * category-cardinality-bound and broadcast back — rows never
    * shuffle. */
  final case class CollapseRareCategories(column: String,
      minShare: Double, other: String = "__other") extends CleaningAction {
    require(minShare > 0.0 && minShare < 1.0,
      s"minShare must lie in (0, 1): $minShare")
    def apply(df: DataFrame): DataFrame = {
      val counts = df.groupBy(col(column).as("__cat"))
        .agg(count(lit(1)).as("__n"))
      val keep = counts
        .withColumn("__t", sum(col("__n")).over(Window.partitionBy(lit(1))))
        .filter(col("__cat").isNotNull &&
          col("__n").cast("double") / col("__t").cast("double") >= minShare)
        .select(col("__cat"))
      df.join(broadcast(keep), df(column) === keep("__cat"), "left")
        .withColumn(column,
          when(col("__cat").isNotNull, col(column)).otherwise(lit(other)))
        .drop("__cat")
    }
    def describe =
      s"Collapsed categories of $column below share $minShare into '$other'"
  }

  final case class ScaleZScore(column: String) extends CleaningAction {
    def apply(df: DataFrame): DataFrame = {
      val x = col(column)
      val st = df.agg(
        sum(x.cast("decimal(18,2)")).cast("double").as("__s"),
        sum((x * x).cast("decimal(38,4)")).cast("double").as("__s2"),
        count(x).as("__n"))
      df.crossJoin(broadcast(st))
        .withColumn("__m", col("__s") / col("__n"))
        .withColumn("__sd",
          sqrt(col("__s2") / col("__n") - col("__m") * col("__m")))
        // round@8: the moment sums pass through a double->decimal cast
        // whose TIE rounding differs across engines (measured at
        // sf0.001: s ...033.41000000 here vs ...033.41000003 in DuckDB
        // — one tie among 6,000 rows), which shifts sd by an ulp and
        // every unrounded z by ~1e-16 relative. 8 dp keeps far more
        // resolution than any consumer needs and absorbs ulp drift —
        // the repo-wide convention for re-emitted float chains.
        .withColumn(s"${column}_scaled",
          when(col("__sd") > 0, round((x - col("__m")) / col("__sd"), 8))
            .otherwise(when(x.isNotNull, lit(0.0))))
        .drop("__s", "__s2", "__n", "__m", "__sd")
    }
    def describe = s"Z-score standardized $column (population variance)"
  }
}
