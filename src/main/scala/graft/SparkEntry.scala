package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: mission detection (profile + z-outliers + nulls + dups +
    * mixed dates, SURVEY P6) over deterministically-dirtied sf0.001
    * lineitem; always yields rows (null + date_mixed missions exist by
    * construction). */
  def entry(spark: SparkSession): DataFrame =
    Queries.qMissions(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ extensions). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesExt.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle ++ QueriesExt.oracle
}
