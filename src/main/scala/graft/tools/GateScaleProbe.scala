package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adversarial-scale rehearsal of the bounded approx-quantile gates
  * (VERDICT r9 Next #5). The three *_approx verification faces pay an
  * exact (group x value) grid + per-group cumulative window to referee
  * the sketch; the worst case for that grid is a SKEWED grouping where
  * one hot group owns ~all rows AND the value domain grows with the
  * corpus, because the hot group's cumulative window is one partition
  * task sized by the group's DISTINCT-value count. This probe times
  * quantilePanelBounded on a 90%-hot grouping over sf0.1 documents vs a
  * 100x id-shifted value-perturbed replica union (ScaleBench's fixture
  * discipline, built in-memory) and prints the slope for SCALE.md —
  * backing the scaladoc's "production at 100 TB calls the approx
  * operators alone; the gate is a verification face" with a measured
  * number for the gate's own worst case.
  *
  * The +r n_chars perturbation makes each replica's values distinct, so
  * the hot group's distinct-value count — the window partition size —
  * really grows ~100x; an unperturbed union would hand the grid a free
  * 100x pre-aggregation. */
object GateScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val factor = sys.env.getOrElse("SCALE_FACTOR", "100").toInt
    val scaled = base
      .withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
      .select((col("doc_id") + col("r") * 10000000000L).as("doc_id"),
        col("lang"),
        // n_chars is a bounded length range, so +r only widens it by
        // factor-1 values; *factor+r really multiplies the distinct
        // domain (and thus the hot window partition) by ~factor
        (col("n_chars") * factor + col("r")).as("n_chars"))

    def run(label: String, d0: DataFrame): (Long, Long, Double) = {
      val d = d0.withColumn("g",
          when(col("doc_id") % 10 === 0, col("lang"))
            .otherwise(lit("hot")))
        .persist()
      val rows = d.count()
      val hotDistinct = d.filter(col("g") === "hot")
        .select(countDistinct(col("n_chars"))).head().getLong(0)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.profile.NumericProfile.quantilePanelBounded(d, "n_chars", "g")
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      d.unpersist(false)
      spark.catalog.clearCache()
      (rows, hotDistinct, ts(1))
    }

    val (r1, d1, t1) = run("base", base)
    val (r2, d2, t2) = run("scaled", scaled)
    println(f"""{"probe":"gate_skew_${factor}x","rows_base":$r1,"rows_scaled":$r2,""" +
      f""""hot_distinct_base":$d1,"hot_distinct_scaled":$d2,""" +
      f""""sec_base":$t1%.3f,"sec_scaled":$t2%.3f,"slope":${t2 / t1}%.2f}""")
    spark.stop()
  }
}
