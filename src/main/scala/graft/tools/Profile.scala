package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.io.Sources

/** Dev profiling entry point (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Sources.table(spark, dir, "documents").select("doc_id", "text")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }

    time("warmup count")(docs.count())
    time("shingleHashes")(docs.select(
      Dedup.shingleHashes(col("text"), 3).as("h")).agg(sum(size(col("h")))).head().getLong(0))
    time("minhashSignature")(docs.select(
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 3), 16).as("s"))
      .agg(sum(size(col("s")))).head().getLong(0))
    time("lshCandidates")(Dedup.lshCandidates(docs, "doc_id", "text").count())
    time("nearDuplicates")(Dedup.nearDuplicates(docs, "doc_id", "text", 0.5).count())
    time("nearDuplicates again")(Dedup.nearDuplicates(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
