package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sources and sinks (SURVEY §2.1).
  *
  * S1 CSV scan mirrors `pd.read_csv` (/root/reference/app.py:148-149):
  * header + schema inference. At scale prefer an explicit schema —
  * `inferSchema` costs an extra pass — so both entry points exist.
  * S2 Excel scan mirrors `pd.read_excel` (app.py:150-151) via [[Xlsx]] —
  * a dependency-free SpreadsheetML parser (zip + StAX), driver-side like
  * the reference's interactive upload path.
  */
object Sources {
  /** S1 — CSV with inferred schema (reference parity). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S2 — Excel (.xlsx), first sheet, header row, inferred types. */
  def xlsx(spark: SparkSession, path: String): DataFrame =
    Xlsx.read(spark, path)

  /** S1 at scale — explicit schema, single pass. */
  def csv(spark: SparkSession, path: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Fixture loader: `/root/testdata/<sf>/<table>.parquet`. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** The `events` fixture has shipped with two `ts` physical types across
    * fixture generations: parquet TIMESTAMP(NANOS) (which Spark 4 refuses
    * by default and must read as long nanos under the legacy conf) and
    * plain TIMESTAMP(MICROS) (which Spark reads as TIMESTAMP_NTZ). Both
    * normalize to a session-zone micro-precision TimestampType — the same
    * value DuckDB sees for either encoding (it truncates nanos to its
    * micro-precision timestamps), so engine and oracle always agree. */
  def eventsRaw(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    try {
      val raw = spark.read.parquet(path)
      raw.schema // force resolution — nano-timestamp fixtures throw here
      raw
    } catch {
      case _: Exception =>
        // legacy nanos fixture: scope the conf (set -> read -> resolve ->
        // restore) so other parquet reads keep fail-fast behavior
        // (verified: executing the returned plan does not re-read it)
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "true")
        try {
          val raw = spark.read.parquet(path)
          raw.schema
          raw
        } finally {
          prev match {
            case Some(v) => spark.conf.set(key, v)
            case None => spark.conf.unset(key)
          }
        }
    }
  }

  /** Normalizes the `ts` column of an events frame (batch or streaming)
    * to TimestampType, whatever the fixture generation produced. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types._
    df.schema("ts").dataType match {
      // integral division: `/` on longs is DOUBLE division in Spark and
      // loses exactness above 2^53 (2024-era nanos are ~1.7e18) — `div`
      // truncates in the long domain, matching DuckDB's truncation
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      // NTZ -> session-zone timestamp: bit-identical micros under the
      // UTC session zone every entry point pins
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  def eventsTable(spark: SparkSession, sfDir: String): DataFrame =
    normalizeEventsTs(eventsRaw(spark, sfDir))

  /** Fixed-width text source — the mainframe/COBOL-export layout classic
    * ETL tools read natively and Spark does not: each line is a
    * concatenation of fixed-byte fields, numbers right-aligned (left
    * space padding), strings left-aligned (right padding). `specs` =
    * (name, width, type) in line order; fields are sliced by 1-based
    * offsets, trimmed, then `try_cast` (a cast failure yields null in
    * EVERY ANSI mode — this repo runs Spark 4's ANSI-on default, where a
    * plain `.cast` would throw on the first malformed field and fail the
    * whole job; the permissive classic-ETL convention is null + pair
    * with Profiler/Constraints to quarantine bad lines). An all-blank
    * field
    * reads as NULL for every type — the COBOL "spaces = missing"
    * convention (fixed-width has no other null encoding), and the
    * inverse of the sink writing null as padding.
    *
    * Scale shape: `spark.read.text` is a splittable line scan; the
    * slice+trim+cast chain is one codegen'd narrow projection — no
    * shuffle, no UDF, parallel over line ranges exactly like CSV. */
  def fixedWidth(spark: SparkSession, path: String,
      specs: Seq[(String, Int, org.apache.spark.sql.types.DataType)])
      : DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, substring, trim, when}
    require(specs.nonEmpty, "fixedWidth needs at least one field spec")
    specs.foreach { case (n, w, _) =>
      require(w > 0, s"field $n must have positive width: $w") }
    val offsets = specs.scanLeft(1) { case (off, (_, w, _)) => off + w }
    val cols = specs.zip(offsets).map { case ((n, w, t), off) =>
      val raw = trim(substring(col("value"), off, w))
      when(raw === "", lit(null)).otherwise(raw).try_cast(t).as(n)
    }
    spark.read.text(path).select(cols: _*)
  }
}

object Sinks {
  /** K1 — CSV export (app.py:127-133). `singleFile = true` coalesces to one
    * part for small interactive exports; leave false for cluster-scale
    * writes. */
  def csv(df: DataFrame, dir: String, singleFile: Boolean = false): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write.mode("overwrite").option("header", "true").csv(dir)
  }

  def parquet(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** Fixed-width text sink (the writer half of [[Sources.fixedWidth]]):
    * numeric fields left-pad, everything else right-pads. A value WIDER
    * than its field would silently corrupt every later offset on the
    * line — the classic fixed-width failure — so overflow fails the
    * write loudly (raise_error inside the projection) instead of
    * truncating. One narrow projection + text write; no shuffle. */
  def fixedWidth(df: DataFrame, dir: String,
      specs: Seq[(String, Int)], singleFile: Boolean = false): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.NumericType
    val numeric = df.schema.fields
      .map(f => f.name -> f.dataType.isInstanceOf[NumericType]).toMap
    val fields = specs.map { case (n, w) =>
      val s = coalesce(col(n).cast("string"), lit(""))
      val guarded = when(length(s) > w, raise_error(concat(
          lit(s"fixed-width overflow: field $n wider than $w chars: "), s)))
        .otherwise(s)
      if (numeric.getOrElse(n, false)) lpad(guarded, w, " ")
      else rpad(guarded, w, " ")
    }
    val out = df.select(concat(fields: _*).as("value"))
    (if (singleFile) out.coalesce(1) else out)
      .write.mode("overwrite").text(dir)
  }
}
