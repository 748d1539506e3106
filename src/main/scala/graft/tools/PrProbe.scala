package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the q_pagerank iteration (r15
  * optimization round) to locate its wall-time sink. */
object PrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[pr] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val l = spark.read.parquet(s"$dir/lineitem.parquet").select(
        (col("l_partkey") * 2).as("src"),
        (col("l_suppkey") * 2 + 1).as("dst")).distinct()
      val und = l.union(l.select(col("dst").as("src"), col("src").as("dst")))
      val e = t("e checkpoint") { und.localCheckpoint() }
      val nodes = t("nodes ckpt") {
        e.select(col("src").as("node"))
          .union(e.select(col("dst").as("node"))).distinct().localCheckpoint()
      }
      val n = t("nodes count") { nodes.count() }
      val eDeg = t("eDeg ckpt") {
        e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
          .repartition(32, col("src"))
          .localCheckpoint()
      }
      println(s"[pr] edges=${e.count()} nodes=$n")
      val base = (1.0 - 0.85) / n
      var ranks = nodes.withColumn("rank", lit(1.0 / n))
      for (i <- 1 to 5) {
        t(s"iter $i" + (if (i % 2 == 0) " (ckpt)" else "")) {
          val contribs = eDeg
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .select(col("dst").as("node"),
              (col("rank") / col("deg")).cast("decimal(28,14)").as("ct"))
          ranks = nodes
            .join(contribs.groupBy("node").agg(sum(col("ct")).as("sm")),
              Seq("node"), "left")
            .select(col("node"),
              (lit(base) + lit(0.85) *
                coalesce(col("sm").cast("double"), lit(0.0))).as("rank"))
          if (i % 2 == 0 && i < 5) ranks = ranks.localCheckpoint()
        }
      }
      // diagnostic sub-shapes on the FINAL ranks frame
      t("diag contribs+agg only") {
        eDeg.join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            (col("rank") / col("deg")).cast("decimal(28,14)").as("ct"))
          .groupBy("node").agg(sum(col("ct")).as("sm"))
          .write.format("noop").mode("overwrite").save()
      }
      t("diag contribs dbl-sum") {
        eDeg.join(ranks.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"),
            (col("rank") / col("deg")).as("ct"))
          .groupBy("node").agg(sum(col("ct")).as("sm"))
          .write.format("noop").mode("overwrite").save()
      }
      t("diag join only") {
        eDeg.join(ranks.withColumnRenamed("node", "src"), "src")
          .write.format("noop").mode("overwrite").save()
      }
      t("final noop") {
        ranks.select(col("node"), round(col("rank"), 9).as("rank_r"))
          .write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
