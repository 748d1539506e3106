package graft.tools
import org.apache.spark.sql.SparkSession
object ConfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.schema // force resolution
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val n = df.count()
      println(s"[cf] restore-then-execute works: rows=$n")
    } catch { case e: Throwable => println(s"[cf] restore breaks execution: ${e.getMessage.take(120)}") }
    spark.stop()
  }
}
