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
    spark.stop()
  }
}
