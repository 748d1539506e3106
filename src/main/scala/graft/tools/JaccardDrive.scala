package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ext.Dedup
import graft.io.Sources

object JaccardDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5).count()
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, maxDocFreq = 3).count()
    val tight = Dedup.jaccardPairs(docs, "doc_id", "text", 0.5, maxDocFreq = 1).count()
    println(s"[jd] uncapped=$uncapped cappedDF3=$capped cappedDF1=$tight")
    spark.stop()
  }
}
