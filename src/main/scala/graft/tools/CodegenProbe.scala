package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forces codegen (no interpreted fallback) to prove DotProductD's
  * doGenCode compiles and computes correctly. */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      .config("spark.sql.codegen.fallback", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
    val out = df.select(graft.ext.SimSearch.dot($"a", $"b").as("d"))
      .as[Double].collect().toSeq
    println(s"[cg] dot codegen-only results: $out (expect List(32.0, 0.0))")
    // and through a real fixture pipeline
    val e = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    val n = graft.ext.SimSearch.bruteTopK(e, e.filter($"vec_id" < 3), "vec_id", "embedding", 3).count()
    println(s"[cg] bruteTopK under CODEGEN_ONLY: rows=$n")
    spark.stop()
  }
}
