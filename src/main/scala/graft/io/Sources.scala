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

  /** The `events` fixture stores `ts` as parquet TIMESTAMP(NANOS), which
    * Spark 4 refuses by default. Read nanos as long (legacy conf), then
    * floor-convert to a microsecond TimestampType — the same truncation
    * DuckDB applies when it reads nanos into its micro-precision
    * timestamps, so both engines see identical values. */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    // scope the legacy conf: set -> read -> force schema resolution ->
    // restore, so other parquet reads in the session keep the default
    // fail-fast behavior on nano timestamps (verified: execution of the
    // returned plan does not re-read the conf)
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      raw.schema // resolve under the conf
      // integral division: `/` on longs is DOUBLE division in Spark and
      // loses exactness above 2^53 (2024-era nanos are ~1.7e18) — `div`
      // truncates in the long domain, matching DuckDB's truncation
      raw.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
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
}
