package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Sequence packing for LLM training (the concat-then-chunk scheme:
  * documents are concatenated in a fixed order and the stream is cut
  * into fixed-length context windows; each document is tagged with the
  * chunk its last token lands in).
  *
  * A single global concat order would serialize the prefix sum through
  * one task, so documents are first salted into `buckets` independent
  * streams by portable hash (deterministic — NOT round-robin by
  * partition, which would change with parallelism): each bucket is
  * packed independently with a window prefix-sum ordered by doc id.
  * One shuffle (bucket, doc_id) total; each bucket's running sum is a
  * linear scan. At 100 TB, buckets ≈ executor count × a few, so every
  * prefix sum is cluster-parallel while chunk utilization stays the
  * same (chunking loses at most one partial window per bucket).
  *
  * Documents longer than `contextLen` contribute `contextLen` tokens
  * (truncation, the common training-prep choice); empty docs contribute
  * 0 and land in the chunk of the running position. */
object Packing {

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
      contextLen: Int = 2048, buckets: Int = 64): DataFrame = {
    require(contextLen > 0 && buckets > 0)
    val nTok = least(size(TextStats.tokens(TextStats.normalized(col(textCol)))),
      lit(contextLen)).cast("long")
    val staged = docs.select(col(idCol).as("id"), nTok.as("n_tok"),
      pmod(Hashing.hash64(col(idCol)), lit(buckets)).cast("int").as("bucket"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged
      .withColumn("cum_tok", sum(col("n_tok")).over(w))
      // chunk of the doc's LAST token; empty docs take the running chunk
      .withColumn("chunk_id",
        when(col("n_tok") > 0, floor((col("cum_tok") - 1) / contextLen))
          .otherwise(floor(col("cum_tok") / contextLen)))
      .select(col("id"), col("bucket"), col("n_tok"), col("cum_tok"),
        col("chunk_id"))
  }
}
