package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model._

/** Profiling / detection operators (SURVEY §2.2, P1-P6).
  *
  * The reference recomputes every detector with per-cell Python loops twice
  * per UI cycle (/root/reference/app.py:190-240). Here each detector is one
  * fused aggregate over a single scan, so profiling a 100 TB table costs one
  * pass, and distinct counts degrade gracefully to HyperLogLog sketches via
  * `exact = false` (the scale default; exact mode exists for oracle parity).
  */
object Profiler {

  /** Null test with pandas parity: pandas `isnull()` counts both NaN and
    * None (app.py:55), Spark distinguishes them — count both for floating
    * columns. */
  def isNullLike(name: String, dt: DataType): Column = dt match {
    case DoubleType | FloatType => col(name).isNull || isnan(col(name))
    case _                      => col(name).isNull
  }

  def numericColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect {
      case f if f.dataType.isInstanceOf[NumericType] => f.name
    }.toSeq

  /** P1 — per-column dtype / null count / distinct count in ONE aggregate
    * job (single scan; app.py:43-60 loops per column instead). Sample
    * values come from one bounded `take`, not per-column jobs. */
  def profile(df: DataFrame, exact: Boolean = true, sampleRows: Int = 64)
      : Seq[ColumnProfile] = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.flatMap { f =>
      val distinct =
        if (exact) countDistinct(col(f.name))
        else approx_count_distinct(col(f.name))
      Seq(
        count(when(isNullLike(f.name, f.dataType), lit(1))).as(s"${f.name}__nnull"),
        distinct.as(s"${f.name}__ndist"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // sampleRows <= 0 skips the sample job entirely (callers that only
    // need counts shouldn't pay a second action)
    val sample = if (sampleRows > 0) df.limit(sampleRows).collect()
      else Array.empty[org.apache.spark.sql.Row]
    fields.zipWithIndex.map { case (f, i) =>
      val samples =
        if (sample.isEmpty) Seq.empty[String]
        else sample.iterator
          .map(_.get(sample.head.fieldIndex(f.name)))
          .filter(_ != null).map(_.toString).take(3).toSeq
      ColumnProfile(f.name, f.dataType.simpleString,
        row.getLong(2 * i), row.getLong(2 * i + 1), samples)
    }
  }

  /** P2 — full-row duplicate count, keep-first convention: total - distinct
    * (pandas `duplicated().sum()`, app.py:86-87,198,230). Single shuffle
    * (groupBy all columns), no second scan. */
  def duplicateCount(df: DataFrame): Long = duplicateCount(df, df.columns.toSeq)

  /** Duplicate count over a key subset. */
  def duplicateCount(df: DataFrame, cols: Seq[String]): Long =
    df.groupBy(cols.map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
      .agg(coalesce(sum(col("__cnt") - 1), lit(0L)))
      .head().getLong(0)

  /** P2 at 100 TB — approximate duplicate count: total minus an HLL
    * estimate of distinct rows. The exact path shuffles every row's full
    * column tuple; this is ONE narrow pass whose only exchange carries a
    * fixed-size HLL sketch per partition. `rsd` is the HLL relative
    * standard deviation (error bound on the DISTINCT estimate, so the
    * absolute error on the duplicate count is ~rsd * n_distinct). */
  def duplicateCountApprox(df: DataFrame, rsd: Double = 0.02): Long =
    duplicateCountApprox(df, df.columns.toSeq, rsd)

  def duplicateCountApprox(df: DataFrame, cols: Seq[String], rsd: Double): Long = {
    val r = df.agg(count(lit(1)).as("__n"),
      approx_count_distinct(struct(cols.map(col): _*), rsd).as("__d")).head()
    math.max(0L, r.getLong(0) - r.getLong(1))
  }

  /** P4 — z-score model. pandas uses `std(ddof=0)` (app.py:67) which is the
    * POPULATION stddev — Spark's default `stddev` is sample stddev, so we
    * must use `stddev_pop`. All-false when std is 0 or undefined
    * (app.py:68-69). */
  final case class ZScoreModel(column: String, mean: Double, stdPop: Double,
      threshold: Double) {
    def degenerate: Boolean = stdPop == 0.0 || stdPop.isNaN
    /** Boolean outlier mask; never true on null/NaN or degenerate stats. */
    def mask: Column =
      if (degenerate) lit(false)
      else abs((col(column) - mean) / stdPop) > threshold
  }

  def zScoreModel(df: DataFrame, column: String, threshold: Double = 3.0)
      : ZScoreModel = {
    val r = df.agg(
      avg(col(column)).as("m"),
      stddev_pop(col(column)).as("s")).head()
    val m = if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
    val s = if (r.isNullAt(1)) Double.NaN else r.getDouble(1)
    ZScoreModel(column, m, s, threshold)
  }

  /** IQR (Tukey-fence) outlier model — the robust detector the reference
    * names as its own next step ("Migliorare detection outlier con IQR",
    * app.py:397). Fences at [q1 - k*IQR, q3 + k*IQR], k = 1.5. Both
    * quartiles come from ONE percentile buffer; `exact=false` switches to
    * the GK sketch at scale. */
  final case class IqrModel(column: String, q1: Double, q3: Double, k: Double) {
    def lo: Double = q1 - k * (q3 - q1)
    def hi: Double = q3 + k * (q3 - q1)
    def mask: Column = col(column) < lo || col(column) > hi
  }

  def iqrModel(df: DataFrame, column: String, k: Double = 1.5,
      exact: Boolean = true): IqrModel = {
    val r =
      if (exact) df.agg(percentile(col(column), array(lit(0.25), lit(0.75)))).head()
      else df.agg(percentile_approx(col(column), array(lit(0.25), lit(0.75)),
        lit(10000))).head()
    val qs = r.getSeq[Double](0)
    IqrModel(column, qs(0), qs(1), k)
  }

  /** Whitelisted date formats replacing dateutil's leniency (app.py:73-81).
    * Deliberate divergence (SURVEY P5): dateutil parses bare integers like
    * "50" as day-of-month, flagging numeric columns as date-like — a
    * reference bug we do not reproduce. */
  val dateFormats: Seq[String] = Seq(
    "yyyy-MM-dd", "dd/MM/yyyy", "MM/dd/yyyy", "yyyy/MM/dd",
    "dd-MM-yyyy", "yyyyMMdd", "yyyy-MM-dd HH:mm:ss")

  /** Lenient parse to DateType: first whitelisted format that succeeds,
    * null otherwise (ANSI-safe: `try_to_date` never throws).
    *
    * The length/leading-digit gate never changes the outcome — every
    * whitelisted format requires length 8/10/19 and a digit first — but
    * skips the (expensive) 7-parser chain for the common garbage case,
    * ~2x on mission detection over wide string columns.
    *
    * ZERO-PADDED assumption: Spark's `dd/MM/yyyy` (and this gate's
    * length check) rejects non-padded dates like "1/02/2024" (length 9),
    * while DuckDB's try_strptime %d/%m/%Y accepts them — any parse-ratio
    * oracle over data containing non-padded dates must mirror the gate
    * (`length(c) IN (8,10,19)`) in the SQL, as q_date_like's oracle
    * does implicitly via the fixture's padded formats. */
  def lenientParseDate(c: Column): Column = {
    val s = c.cast(StringType)
    when(length(s).isin(8, 10, 19) && s.rlike("^[0-9]"),
      coalesce(dateFormats.map(f =>
        call_function("try_to_date", s, lit(f))): _*))
      .otherwise(lit(null).cast(DateType))
  }

  /** P5 — fraction of values (nulls included in the denominator, matching
    * `parsed.sum() / len(dfw)` app.py:205) that parse as dates. */
  def dateLikeRatio(df: DataFrame, column: String): Double = {
    val r = df.agg(avg(
      when(lenientParseDate(col(column)).isNotNull, 1.0).otherwise(0.0))).head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }

  /** P3+P5 helper — string columns worth date-detection. */
  private def stringColumns(df: DataFrame): Seq[String] =
    df.schema.fields.collect { case f if f.dataType == StringType => f.name }.toSeq

  /** P6 — mission generator (app.py:216-237): re-derives the full issue
    * list. Fused: one profile agg (nulls), one dup-count job, one stats agg
    * for all numeric columns, one parse-ratio agg for all string columns —
    * four jobs total regardless of column count. */
  def detectMissions(df: DataFrame, zThreshold: Double = 3.0,
      exact: Boolean = true): Seq[Mission] = {
    val numCols = numericColumns(df)
    val strCols = stringColumns(df)

    // one agg: mean+stddev_pop for every numeric column
    val statAggs = numCols.flatMap(c =>
      Seq(avg(col(c)).as(s"${c}__m"), stddev_pop(col(c)).as(s"${c}__s")))
    val statRow = if (statAggs.nonEmpty) Some(df.agg(statAggs.head, statAggs.tail: _*).head()) else None
    val models = numCols.zipWithIndex.map { case (c, i) =>
      val r = statRow.get
      val m = if (r.isNullAt(2 * i)) Double.NaN else r.getDouble(2 * i)
      val s = if (r.isNullAt(2 * i + 1)) Double.NaN else r.getDouble(2 * i + 1)
      c -> ZScoreModel(c, m, s, zThreshold)
    }.toMap

    // one agg: outlier counts (via the masks) + null counts + parse counts
    val fields = df.schema.fields.toSeq
    val countAggs =
      numCols.map(c => count(when(models(c).mask, 1)).as(s"${c}__out")) ++
      fields.map(f => count(when(isNullLike(f.name, f.dataType), 1)).as(s"${f.name}__null")) ++
      strCols.flatMap(c => Seq(
        count(when(lenientParseDate(col(c)).isNotNull, 1)).as(s"${c}__parsed"),
        // denominator includes nulls: reference iterates all cells and
        // str(nan) fails to parse (app.py:73-81, ratio at app.py:205,236)
        count(lit(1)).as(s"${c}__tot")))
    val r = df.agg(countAggs.head, countAggs.tail: _*).head()
    var i = 0
    val outliers = numCols.flatMap { c =>
      val n = r.getLong(i); i += 1
      if (n > 0) Some(Mission.Outlier(c, n)) else None
    }
    val nulls = fields.flatMap { f =>
      val n = r.getLong(i); i += 1
      if (n > 0) Some(Mission.Nulls(f.name, n)) else None
    }
    val dates = strCols.flatMap { c =>
      val parsed = r.getLong(i); val tot = r.getLong(i + 1); i += 2
      if (parsed > 0 && parsed < tot) Some(Mission.DateMixed(c, tot - parsed)) else None
    }
    val nDup = duplicateCount(df)
    val dups = if (nDup > 0) Seq(Mission.Duplicates(nDup)) else Nil

    outliers ++ nulls.toSeq ++ dups ++ dates
  }
}
