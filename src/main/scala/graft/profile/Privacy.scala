package graft.profile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Re-identification risk reporting for dataset release (Sweeney 2002,
  * "k-Anonymity: a model for protecting privacy" — public framework).
  * A table is k-anonymous w.r.t. a quasi-identifier (QID) column set
  * when every QID combination is shared by at least k rows; rows in
  * smaller equivalence classes are linkable against outside data and
  * must be suppressed or generalized before release. This is the
  * release-hygiene sibling of PII redaction: redaction strips direct
  * identifiers, k-anonymity measures the indirect ones.
  */
object Privacy {

  /** Equivalence-class size histogram + at-risk marking: one row per
    * distinct class SIZE with how many classes/rows sit at that size
    * and whether that size violates k.
    *
    * Scale shape: groupBy(QIDs) is one map-side-combined shuffle on
    * the QID tuple (class counts absorb hot combos as partials); the
    * second groupBy runs over one row per CLASS, and its own output is
    * bounded by the number of distinct class sizes (<= sqrt(2 * rows)
    * by a partition argument, in practice a few dozen) — so the
    * report itself never concentrates data anywhere. */
  def kAnonymityHistogram(df: DataFrame, qidCols: Seq[String], k: Int)
      : DataFrame = {
    require(qidCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .groupBy(col("class_size"))
      .agg(count(lit(1)).as("n_classes"))
      .select(col("class_size"), col("n_classes"),
        (col("class_size") * col("n_classes")).as("n_rows"),
        (col("class_size") < k).as("at_risk"))
  }

  /** The concrete worst QID combinations — what to generalize first.
    * Bounded global top-k: orderBy().limit() plans
    * TakeOrderedAndProject (per-partition heaps, k-row merge), so the
    * class list never funnels through one task. Ties broken by the QID
    * values themselves (total order -> deterministic). */
  def riskiestClasses(df: DataFrame, qidCols: Seq[String], topK: Int = 20)
      : DataFrame = {
    require(qidCols.nonEmpty, "need at least one quasi-identifier column")
    df.groupBy(qidCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .orderBy(col("class_size").asc +: qidCols.map(c => col(c).asc): _*)
      .limit(topK)
  }
}
