package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.TextStats
import graft.io.Sources

object LangProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lp] $n%-24s ${(System.nanoTime()-t0)/1e9}%6.2fs rows=$r")
    }
    val docs = Sources.table(spark, "/root/testdata/sf0.1", "documents")
    docs.count()
    (1 to 4).foreach { i =>
      time(s"lang_id run $i")(
        docs.withColumn("__toks", TextStats.tokens(lower(col("text"))))
          .withColumn("predicted", TextStats.langIdFromTokens(col("__toks")))
          .groupBy(col("lang"), col("predicted")).agg(count(lit(1))).count())
    }
    time("tokens only")(
      docs.select(size(TextStats.tokens(lower(col("text")))).as("n")).agg(sum(col("n"))).head().getLong(0))
    // PROFILE SIZE sweep (r11, VERDICT r10 Next #6): the pluggable-seam
    // path at the committed 125-entry head profile vs a generated
    // production-size 50k-word profile — the broadcast is vocab-bounded
    // so the wall should barely move while the vocabulary grows 400x
    sys.env.get("PROFILE_SCALE").foreach { _ =>
      val head = graft.ext.ModelFixtures.langProfileDf(spark)
      val big = graft.ext.ModelFixtures.syntheticLangProfile(spark, 10000)
      def run(p: org.apache.spark.sql.DataFrame): Long =
        TextStats.withLangIdProfile(docs, "doc_id", "text", p)
          .groupBy(col("predicted")).agg(count(lit(1))).count()
      (1 to 3).foreach { i =>
        time(s"profile 125w run $i")(run(head))
        time(s"profile 50kw run $i")(run(big))
      }
    }
    spark.stop()
  }
}
