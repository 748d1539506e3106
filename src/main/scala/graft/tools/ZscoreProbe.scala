package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the q_scale_zscore sf0.001 strict divergence:
  * prints the two moment sums at full precision for engine compare. */
object ZscoreProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"${args(0)}/lineitem.parquet")
    val price = when(col("l_orderkey") % 997 === 0,
      col("l_extendedprice") * 50).otherwise(col("l_extendedprice"))
    val r = li.select(price.as("price"))
      .agg(sum(col("price").cast("decimal(18,2)")).cast("double").as("s"),
        sum((col("price") * col("price")).cast("decimal(38,4)"))
          .cast("double").as("s2"),
        count(col("price")).as("n")).head()
    println(f"[zp] s=${r.getDouble(0)}%.17g s2=${r.getDouble(1)}%.17g n=${r.getLong(2)}")
    spark.stop()
  }
}
