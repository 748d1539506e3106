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

  /** End-to-end TRAINING-DATA PREP: exact dedup (min-id survivor) ->
    * benchmark decontamination (drop docs sharing any 13-gram with the
    * eval set) -> sliding-window chunking -> per-source accounting.
    * The composition a pretraining data pipeline actually ships:
    * [[clean]] curates documents; this turns the curated corpus into
    * training sequences with an auditable per-source yield report
    * (how many docs/chunks/tokens each source contributed — the number
    * data governance asks for).
    *
    * Every stage is an already-oracle-checked operator; the stages
    * compose as semi/anti joins on the id (16-byte shuffles, never
    * text), the chunker is a pure narrow map, and the final report is
    * one map-side-combined aggregate keyed by source. */
  def prepare(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, sourceCol: String,
      benchmark: org.apache.spark.sql.DataFrame, benchTextCol: String,
      window: Int = 64, stride: Int = 48, n: Int = 13)
      : org.apache.spark.sql.DataFrame = {
    val keep = Dedup.exactByFingerprint(docs, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val s1 = docs.join(keep, Seq(idCol), "left_semi")
    val contaminated = Dedup.decontaminate(s1, idCol, textCol,
      benchmark, benchTextCol, n)
      .select(col("id").as(idCol))
    val s2 = s1.join(contaminated, Seq(idCol), "left_anti")
    val chunks = Packing.chunkDocs(s2, idCol, textCol, window, stride)
    chunks
      .join(s2.select(col(idCol).as("id"), col(sourceCol).as("source")),
        Seq("id"))
      .groupBy(col("source"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        sum(col("n_chunk_tokens")).as("sum_chunk_tokens"))
  }
}
