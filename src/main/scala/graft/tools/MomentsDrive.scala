package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Moments
import graft.io.Sources
import graft.profile.Profiler

object MomentsDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val li = Sources.table(spark, "/root/testdata/sf0.01", "lineitem")
    val m = li.select(Moments.momentsCol($"l_extendedprice").as("m")).select("m.*").head()
    val b = li.agg(count(lit(1)), avg($"l_extendedprice"), stddev_pop($"l_extendedprice")).head()
    println(f"[md] udaf  n=${m.getAs[Long]("n")} mean=${m.getAs[Double]("mean")}%.6f sd=${m.getAs[Double]("stddevPop")}%.6f")
    println(f"[md] bltin n=${b.getLong(0)} mean=${b.getDouble(1)}%.6f sd=${b.getDouble(2)}%.6f")
    val exact = Profiler.iqrModel(li, "l_extendedprice")
    val approx = Profiler.iqrModel(li, "l_extendedprice", exact = false)
    println(f"[md] iqr exact  lo=${exact.lo}%.2f hi=${exact.hi}%.2f flagged=${li.filter(exact.mask).count()}")
    println(f"[md] iqr approx lo=${approx.lo}%.2f hi=${approx.hi}%.2f flagged=${li.filter(approx.mask).count()}")
    spark.stop()
  }
}
