package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.SimSearch

/** Dev probe: recall-vs-cost sweep for graphBeamSearch on the fixture
  * corpus (isotropic 64-dim — the hard navigability regime), to pick
  * the shipped (beam, hops, kNbrs) operating point and the spec's
  * recall floor from measurements instead of guesses. */
object GraphAnnProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = e.filter(col("vec_id") < 10)
    val brute = SimSearch.bruteTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet

    for (kn <- Seq(5, 8); beam <- Seq(8, 16, 32); hops <- Seq(3, 5)) {
      val t0 = System.nanoTime()
      val got = SimSearch.graphBeamSearch(e, q, "vec_id", "embedding",
        k = 5, beam = beam, hops = hops, kNbrs = kn)
        .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
      val dt = (System.nanoTime() - t0) / 1e9
      val rec = brute.intersect(got).size.toDouble / brute.size
      println(f"[probe] kNbrs=$kn beam=$beam%2d hops=$hops recall=$rec%.2f " +
        f"visited<=${16 + hops * beam * kn}%4d/500 t=$dt%5.1fs")
    }

    // SCALE MODE (SCALE_FACTOR set): time the walk on a FACTORx
    // id-shifted replica corpus with nlist scaled so the per-cluster
    // size — and therefore the within-cluster kNN join and the cap —
    // stays constant (the production parameterization: nlist ~ n /
    // target_cluster_size; a fixed nlist=16 at 100x would blow every
    // cluster past maxCluster and cap the whole graph away). Entry
    // points grow with nlist, so hop-0 fan-out scales as the number of
    // partitions, exactly like IVF's nprobe story.
    sys.env.get("SCALE_FACTOR").map(_.toInt).foreach { factor =>
      val big = e
        .withColumn("r", explode(sequence(lit(0), lit(factor - 1))))
        .select((col("vec_id") + col("r") * 10000000000L).as("vec_id"),
          col("embedding"))
      val nlist = 16 * factor
      val qb = big.filter(col("vec_id") < 10)
      def time(d: org.apache.spark.sql.DataFrame, nl: Int): Double = {
        val t0 = System.nanoTime()
        SimSearch.graphBeamSearch(d, qb.limit(10), "vec_id", "embedding",
          k = 5, beam = 8, hops = 3, kNbrs = 5, nlist = nl)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      // AUTO_ONLY skips the (slow) hand-scaled linear-nlist baseline,
      // already recorded in SCALE.md round-10 — re-running it buys
      // nothing once the auto rows exist
      if (!sys.env.contains("AUTO_ONLY")) {
        val t1 = (1 to 3).map(_ => time(e, 16)).sorted.apply(1)
        val t2 = (1 to 3).map(_ => time(big, nlist)).sorted.apply(1)
        println(f"""{"probe":"graph_ann_${factor}x","rows_base":500,""" +
          f""""rows_scaled":${500 * factor},"nlist_base":16,""" +
          f""""nlist_scaled":$nlist,"sec_base":$t1%.3f,""" +
          f""""sec_scaled":$t2%.3f,"slope":${t2 / t1}%.2f}""")
      }
      // AUTO mode (r11): same replica corpus on the API DEFAULTS —
      // nlist<=0 auto-derives sqrt sizing and maxCluster scales with
      // E[cluster] inside cappedClusterFrame, so this measures what a
      // user who tunes NOTHING actually pays at FACTORx (the r10
      // verdict's "defaults must survive 100x" criterion).
      val a1 = (1 to 3).map(_ => time(e, 0)).sorted.apply(1)
      val a2 = (1 to 3).map(_ => time(big, 0)).sorted.apply(1)
      println(f"""{"probe":"graph_ann_auto_${factor}x","rows_base":500,""" +
        f""""rows_scaled":${500 * factor},"nlist_base":${
          SimSearch.autoNlist(500)},"nlist_scaled":${
          SimSearch.autoNlist(500L * factor)},"sec_base":$a1%.3f,""" +
        f""""sec_scaled":$a2%.3f,"slope":${a2 / a1}%.2f}""")
    }

    // ADAPTIVE-STOP evidence (r11, VERDICT r10 Next #4): at the shipped
    // operating point, the adaptive walk must reach the fixed walk's
    // recall at no more hops — and show WHERE improvement actually dies
    // out when given a generous cap.
    sys.env.get("ADAPTIVE").foreach { _ =>
      def run(hops: Int, adaptive: Boolean) = {
        val t0 = System.nanoTime()
        val (df, walked) = SimSearch.graphBeamSearchImpl(e, q, "vec_id",
          "embedding", 5, 8, hops, 5, 16, 3, -1, 1000, adaptive)
        val got = df.select("query_id", "neighbor_id")
          .as[(Long, Long)].collect().toSet
        val dt = (System.nanoTime() - t0) / 1e9
        val rec = brute.intersect(got).size.toDouble / brute.size
        (rec, walked, dt)
      }
      val (rf, hf, tf) = run(3, adaptive = false)
      val (ra, ha, ta) = run(12, adaptive = true)
      println(f"""{"probe":"graph_ann_adaptive","fixed":{"recall":$rf%.2f,""" +
        f""""hops":$hf,"sec":$tf%.1f},"adaptive_cap12":{"recall":$ra%.2f,""" +
        f""""hops":$ha,"sec":$ta%.1f}}""")
    }
    spark.stop()
  }
}
