package graft.tools
import org.apache.spark.sql.SparkSession
object QuickProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, args(0))
      println(s"[qp] $n rows=${df.count()} in ${(System.nanoTime()-t0)/1e9}s")
      df.show(5, false)
    }
    spark.stop()
  }
}
