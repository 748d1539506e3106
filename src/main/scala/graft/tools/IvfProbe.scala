package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, SimSearch}
import graft.io.Sources

object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ip] $n%-30s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$r")
    }
    val dir = "/root/testdata/sf0.1"
    val e = Sources.table(spark, dir, "embeddings")
    time("warmup")(e.count())
    val c = e.select(col("vec_id").as("id"),
      SimSearch.normalize(SimSearch.toDouble(col("embedding"))).as("v"))
    time("normalize only")(c.count())
    time("normalize + dot self")(c.select(SimSearch.dot(col("v"), col("v")).as("d")).filter(col("d") > 0).count())
    val cents = c.orderBy(col("id").asc).limit(16)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    time("cents")(cents.count())
    val joined = c.join(broadcast(cents), lit(true))
    time("cross 2000x16")(joined.count())
    time("cross + dot")(joined.select(SimSearch.dot(col("v"), col("cv")).as("d")).filter(col("d") > -2).count())
    time("full ivfTopK")(SimSearch.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id", "embedding", 5).count())
    // minhash char probe
    val docs = Sources.table(spark, dir, "documents")
    time("char lsh candidates only")(
      Dedup.nearDuplicatesChar(docs, "doc_id", "text", 0.6, maxBucket = 1000000).count())
    spark.stop()
  }
}
