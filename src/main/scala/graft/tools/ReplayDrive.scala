package graft.tools
import org.apache.spark.sql.SparkSession
import graft.clean.CleaningAction._
import graft.io.SampleData
import graft.pipeline.CleaningPipeline
object ReplayDrive {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val p = CleaningPipeline(SampleData.load(spark))
      .apply(DropDuplicates())
      .apply(OutlierReplaceMedian("price"))
      .apply(NullFillConstant("category"))
    println(s"[rd] lineage: ${p.missionsLog.mkString(" | ")}")
    val fresh = SampleData.load(spark, seed = 2024L)
    val out = p.replay(fresh)
    println(s"[rd] replay rows=${out.count()} nullCats=${out.filter(out("category").isNull).count()} " +
      s"maxPrice=${out.agg(org.apache.spark.sql.functions.max("price")).head.getDouble(0)}")
    spark.stop()
  }
}
