package graft.tools
import org.apache.spark.sql.SparkSession
/** Measures the streaming tier's state-store fixed cost vs
  * spark.sql.shuffle.partitions (state store instances per micro-batch
  * scale with it). Usage: StreamPartProbe <sfDir> <parts> <q>... */
object StreamPartProbe {
  def main(args: Array[String]): Unit = {
    val parts = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(2).foreach { n =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, args(0))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[spp] $n parts=$parts all=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
