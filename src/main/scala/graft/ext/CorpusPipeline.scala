package graft.ext

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** One corpus document (the typed face's row type). */
final case class CorpusDoc(doc_id: Long, text: String)

/** Knobs for [[CorpusPipeline.clean]] — defaults match the oracle-checked
  * q_corpus_pipeline funnel. */
final case class CorpusConfig(
    nearDupThreshold: Double = 0.5,
    shingleN: Int = 3,
    minhashK: Int = 16,
    bands: Int = 4,
    maxBucket: Int = 64,
    minQuality: Double = 0.6,
    lang: Option[String] = Some("en"))

/** Typed `Dataset[CorpusDoc]` face of the training-data cleaning funnel:
  * exact dedup (min-id survivor) -> MinHash near-dup removal (drop the
  * larger id of each verified pair) -> quality-score filter -> optional
  * language filter. Composes the same library operators the untyped
  * queries use, so the DuckDB oracle on q_corpus_pipeline locks this
  * exact code path; the case-class boundary buys compile-time column
  * safety at the API edge while every stage inside stays Catalyst
  * columns (no Encoder round-trips mid-pipeline). */
object CorpusPipeline {

  def clean(docs: Dataset[CorpusDoc],
      cfg: CorpusConfig = CorpusConfig()): Dataset[CorpusDoc] = {
    import docs.sparkSession.implicits._
    val df = docs.toDF()
    val keep1 = Dedup.exactByFingerprint(df, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val s1 = df.join(keep1, Seq("doc_id"), "left_semi")
    val dropNear = Dedup.nearDuplicates(s1, "doc_id", "text",
      threshold = cfg.nearDupThreshold, shingleN = cfg.shingleN,
      k = cfg.minhashK, bands = cfg.bands, maxBucket = cfg.maxBucket)
      .select(col("id_b").as("doc_id")).distinct()
    val s2 = s1.join(dropNear, Seq("doc_id"), "left_anti")
    val scored = TextStats.withLangId(
      TextStats.qualityScore(s2, "text"), "text")
    val kept = scored.filter(col("quality_score") >= cfg.minQuality)
    cfg.lang.fold(kept)(l => kept.filter(col("predicted") === l))
      .select(col("doc_id"), col("text")).as[CorpusDoc]
  }
}
