package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.SimSearch

/** Dev probe: IVF recall AND scanned-candidate fraction vs Lloyd rounds —
  * recall at fixed nprobe is meaningless if the unrefined lists are so
  * unbalanced that 4 probes scan half the corpus. */
object LloydProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter($"vec_id" < 10)
    val nq = q.count()
    val corpusN = e.count()
    val brute = SimSearch.bruteTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    for (rounds <- Seq(0, 1, 2, 3); nprobe <- Seq(2, 4)) {
      val c = e.select($"vec_id".as("id"),
        SimSearch.normalize(SimSearch.toDouble($"embedding")).as("v"))
      val cents0 = c.orderBy($"id".asc).limit(16)
        .select($"id".as("cent_id"), $"v".as("cv"))
      val cents = SimSearch.lloydRefine(c, cents0, rounds)
      val assigned = SimSearch.assignLists(c, cents, 1)
      val listSizes = assigned.groupBy("list_id").count()
        .select("count").as[Long].collect().sorted.reverse
      val qa = SimSearch.assignLists(
        q.select($"vec_id".as("id"),
          SimSearch.normalize(SimSearch.toDouble($"embedding")).as("v")),
        cents, nprobe)
        .select($"id".as("query_id"), $"list_id")
      val scanned = qa.join(assigned.select($"list_id", $"id"), Seq("list_id"))
        .count()
      val ivf = SimSearch.ivfTopK(e, q, "vec_id", "embedding", 5,
        nprobe = nprobe, lloydRounds = rounds)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val recall = brute.intersect(ivf).size.toDouble / brute.size
      val frac = scanned.toDouble / (corpusN * nq)
      println(f"[lloyd] rounds=$rounds nprobe=$nprobe recall=$recall%.3f scanned_frac=$frac%.3f top_lists=${listSizes.take(4).mkString(",")}")
    }
    spark.stop()
  }
}
