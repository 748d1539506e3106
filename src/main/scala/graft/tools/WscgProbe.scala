package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.metrics.source.CodegenMetrics
object WscgProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.drop(1).foreach { n =>
      (1 to 2).foreach { rep =>
        val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val t0c = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
        val g0 = CodegenMetrics.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot.getValues.sum
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(n)(spark, args(0))
        df.write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        val c1 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
        val t1c = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
        val g1 = CodegenMetrics.METRIC_GENERATED_METHOD_BYTECODE_SIZE.getSnapshot.getValues.sum
        println(f"[wscg] $n rep=$rep total=$dt%.2fs compiles=${c1-c0} compileMs=${t1c-t0c} bytecode=${g1-g0}")
        try spark.catalog.clearCache() catch { case _: Throwable => () }
      }
    }
    spark.stop()
  }
}
