package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.{Insights, QualityStats}
import graft.profile.Profiler

/** Scoring / summary operators (SURVEY §2.4, Q1-Q3). */
object Quality {

  /** Total nulls across ALL columns (pandas `isnull().sum().sum()`,
    * app.py:84-85) + full-row duplicate count, in two jobs. */
  def stats(df: DataFrame): QualityStats = {
    val fields = df.schema.fields.toSeq
    val aggs = fields.map(f =>
      count(when(Profiler.isNullLike(f.name, f.dataType), lit(1))).as(f.name))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    val totalNulls = fields.indices.map(r.getLong).sum
    QualityStats(totalNulls, Profiler.duplicateCount(df))
  }

  /** Q1 — quality score (app.py:83-92):
    * clamp(50 + 0.5*max(0, nullsB - nullsA) + 1.0*max(0, dupsB - dupsA),
    * 0, 100), rounded to 2 decimals. */
  def score(before: QualityStats, after: QualityStats): Double = {
    val s = 50.0 +
      math.max(0L, before.totalNulls - after.totalNulls) * 0.5 +
      math.max(0L, before.duplicateRows - after.duplicateRows) * 1.0
    math.round(math.max(0.0, math.min(100.0, s)) * 100.0) / 100.0
  }

  def score(before: DataFrame, after: DataFrame): Double =
    score(stats(before), stats(after))

  /** Q2 — insights (app.py:372-376). */
  def insights(before: DataFrame, after: DataFrame): Insights =
    Insights(before.count(), after.count(), after.columns.toSeq,
      stats(after).totalNulls)
}
