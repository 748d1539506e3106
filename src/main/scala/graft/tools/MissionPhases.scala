package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.profile.Profiler

/** Phase timing for the q_missions plan: where do the seconds go? */
object MissionPhases {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[phase] $name ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    def dirty = spark.read.parquet(s"$dir/lineitem.parquet").select(
      col("l_orderkey"), col("l_linenumber"),
      when(col("l_orderkey") % 7 === 0, lit(null)).otherwise(col("l_quantity")).as("qty"),
      when(col("l_orderkey") % 997 === 0, col("l_extendedprice") * 50).otherwise(col("l_extendedprice")).as("price"),
      when(col("l_orderkey") % 7 === 0, lit(null)).otherwise(col("l_returnflag")).as("flag"),
      when(col("l_orderkey") % 3 === 0, date_format(col("l_shipdate"), "yyyy-MM-dd"))
        .when(col("l_orderkey") % 3 === 1, date_format(col("l_shipdate"), "dd/MM/yyyy"))
        .otherwise(concat(lit("bad-"), date_format(col("l_shipdate"), "yyyy-MM-dd"))).as("ship_str"))
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep")
      val d = dirty
      d.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("jobA: stats+nulls+parse (builds cache)") {
        d.agg(
          avg(col("l_orderkey")), stddev_pop(col("l_orderkey")),
          avg(col("l_linenumber")), stddev_pop(col("l_linenumber")),
          avg(col("qty")), stddev_pop(col("qty")),
          avg(col("price")), stddev_pop(col("price")),
          count(when(col("qty").isNull, 1)),
          count(when(col("flag").isNull, 1)),
          count(when(Profiler.lenientParseDate(col("flag")).isNotNull, 1)),
          count(when(Profiler.lenientParseDate(col("ship_str")).isNotNull, 1)),
          count(lit(1))).head()
      }
      t("jobB: outlier counts") {
        d.agg(count(when(abs((col("price") - 1e5) / 1e4) > 3, 1)),
          count(when(abs((col("qty") - 25) / 10) > 3, 1))).head()
      }
      t("jobC: digest dup") { Profiler.duplicateCountHashed(d) }
      t("jobC': wide dup") { Profiler.duplicateCount(d) }
      t("unpersist") { d.unpersist(false) }
      t("scan-only (no cache): count") { dirty.write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
