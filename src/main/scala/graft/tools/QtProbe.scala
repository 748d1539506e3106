package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of MLFit.hashedGramTrain (the
  * q_quality_train face) to locate its wall-time sink. */
object QtProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[qt] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = docs.select(col("text"),
      when(col("lang") === "en", 1.0).otherwise(0.0).as("y"))
    val d = 8
    for (rep <- 1 to 2) {
      println(s"--- rep $rep")
      val toks = graft.ext.TextStats.tokens(
        graft.ext.TextStats.normalized(col("text")))
      val grams = {
        val tc = col("__t")
        concat(tc,
          when(size(tc) >= 2,
            transform(sequence(lit(0), size(tc) - 2), i =>
              concat(element_at(tc, i + 1), lit(" "),
                element_at(tc, i + 2))))
            .otherwise(array().cast("array<string>")))
      }
      val staged = df
        .withColumn("__t", toks)
        .withColumn("__g", grams)
        .filter(size(col("__g")) > 0)
        .withColumn("__b", transform(col("__g"),
          g => pmod(graft.functions.Hashing.hash64(g), lit(d))))
      val stagedM = t("staged (toks+grams+hash)") {
        staged.write.format("noop").mode("overwrite").save(); staged
      }
      val feats0 = stagedM.select((0 until d).map(j =>
        (size(filter(col("__b"), b => b === j)).cast("double") /
          size(col("__b")).cast("double")).as(s"x$j")) :+
        col("y").cast("double").as("__y"): _*)
      t("feats noop (no ckpt)") {
        feats0.write.format("noop").mode("overwrite").save()
      }
      val feats = t("feats localCheckpoint") { feats0.localCheckpoint() }
      t("count") { feats.count() }
      t("fit 3 iters") {
        graft.ext.MLFit.logisticFitDF(feats,
          (0 until d).map(j => s"x$j"), "__y", 3, 0.5).collect()
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
