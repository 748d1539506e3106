package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PrExplain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](l: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[t] $l ${(System.nanoTime()-t0)/1e9}%.2fs"); r
    }
    val l = spark.read.parquet(s"$dir/lineitem.parquet").select(
      (col("l_partkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    val und = l.union(l.select(col("dst").as("src"), col("src").as("dst")))
    val e = t("e distinct+ckpt")(und.distinct().localCheckpoint())
    println("e rows=" + e.count())
    val nodes = t("nodes ckpt")(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().localCheckpoint())
    val n = t("n count")(nodes.count())
    val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
    val eDeg = t("eDeg ckpt")(e.join(deg, "src").localCheckpoint())
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to 5) {
      val contribs = eDeg.join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          (col("rank") / col("deg")).cast("decimal(28,14)").as("ct"))
      ranks = nodes.join(contribs.groupBy("node").agg(sum(col("ct")).as("sm")),
          Seq("node"), "left")
        .select(col("node"), (lit(0.15/n) + lit(0.85) *
          coalesce(col("sm").cast("double"), lit(0.0))).as("rank"))
    }
    t("5-iter chain")(println(ranks.count()))
    t("again")(println(ranks.count()))
    spark.stop()
  }
}
