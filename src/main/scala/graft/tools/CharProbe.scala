package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextStats}
import graft.io.Sources

object CharProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cp] $n%-26s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$r")
    }
    val docs = Sources.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    val hashed = docs.select(col("doc_id").as("id"),
      TextStats.normalized(col("text")).as("__norm"))
      .select(col("id"), graft.functions.VectorExprs
        .char_shingle_hashes(col("__norm"), 5).as("h"))
    time("hashed only")(hashed.agg(sum(size(col("h")))).head().getLong(0))
    time("candidates")(Dedup.lshCandidatesFromHashes(hashed, 16, 4, 1000000).count())
    spark.stop()
  }
}
