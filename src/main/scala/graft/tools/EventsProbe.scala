package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object EventsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ep] $n%-26s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$r")
    }
    val dir = "/root/testdata/sf0.1"
    val ev = graft.io.Sources.eventsTable(spark, dir)
    time("warm count")(ev.count())
    time("count again")(ev.count())
    time("hourly profile")(graft.ext.EventsOps.hourlyProfile(ev).count())
    time("hourly no-distinct")(ev.groupBy(date_trunc("hour", col("ts")), col("event_type")).count().count())
    val evRaw = spark.read.parquet(s"$dir/events.parquet")
    time("raw scan count")(evRaw.count())
    graft.ext.EventsOps.hourlyProfile(ev).explain("formatted")
    spark.stop()
  }
}
