package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Dev probe for the hot-bucket guard: a web-scrape corpus where every
  * document carries the same license boilerplate (the classic LSH
  * degenerate case — shared shingles dominate the MinHash signature, so
  * band keys collide across most of the corpus and the candidate join
  * goes quadratic). Times nearDuplicates with the cap ON vs OFF and
  * prints candidate counts, demonstrating why shipped queries run with
  * maxBucket enabled. */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val boiler = "this document is provided as is under the standard " +
      "license agreement all rights reserved redistribution and use in " +
      "source and binary forms with or without modification are permitted " +
      "provided that the following conditions are met see the accompanying " +
      "file for the full terms and conditions of use"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        concat(col("text"), lit(" "), lit(boiler)).as("text"))
      .persist()
    val n = docs.count()

    def run(label: String, maxBucket: Int): Unit = {
      val t0 = System.nanoTime()
      val cands = Dedup.lshCandidates(docs, "doc_id", "text",
        shingleN = 3, k = 16, bands = 4, maxBucket = maxBucket).count()
      val t1 = System.nanoTime()
      val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
        threshold = 0.8, maxBucket = maxBucket).count()
      val t2 = System.nanoTime()
      spark.catalog.clearCache()
      docs.persist() // keep the corpus pinned between runs
      println(f"[scale] $label%-14s n=$n cands=$cands%9d verified=$pairs%7d " +
        f"cand_time=${(t1 - t0) / 1e9}%6.1fs verify_time=${(t2 - t1) / 1e9}%6.1fs")
    }
    run("cap=64", 64)
    run("uncapped", Int.MaxValue)
    spark.stop()
  }
}
