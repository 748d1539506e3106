package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement behind the residual-IVFPQ recall claim (SimSearchSpec):
  * on the interleaved clustered fixture, residual coding vs direct
  * coding at equal index bytes, at nprobe 4 and full probe (full probe
  * isolates coding quality from routing). Measured: nprobe=4
  * plain=0.28 residual=0.45; nprobe=8 plain=0.30 residual=0.45; at
  * m=8 plain=0.55 residual=0.57 — the residual edge shrinks as the
  * byte budget grows, exactly the Jégou et al. §IV.B prediction. */
object ResidProbe {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = { val n = math.sqrt(v.map(x=>x*x).sum); v.map(x=>(x/n).toFloat).toSeq }
    val centers = Array.fill(8)(unit(Array.fill(16)(rnd.nextGaussian())).map(_.toDouble).toArray)
    val rows = for (c <- 0 until 8; m <- 0 until 25) yield {
      val v = unit(centers(c).map(x => x + 0.3*rnd.nextGaussian()))
      ((m*8+c).toLong, v)
    }
    val corpus = rows.toDF("vec_id","embedding")
    val q = corpus.filter($"vec_id" >= 56 && $"vec_id" < 68)
    val brute = graft.ext.SimSearch.bruteTopK(corpus,q,"vec_id","embedding",5)
      .select("query_id","neighbor_id").as[(Long,Long)].collect().toSet
    def rec(s: Set[(Long,Long)]) = brute.intersect(s).size.toDouble/brute.size
    for (np <- Seq(4, 8)) {
      val p = rec(graft.ext.SimSearch.ivfPqTopK(corpus,q,"vec_id","embedding",5,8,np,4,16)
        .select("query_id","neighbor_id").as[(Long,Long)].collect().toSet)
      val r = rec(graft.ext.SimSearch.ivfPqResidualTopK(corpus,q,"vec_id","embedding",5,8,np,4,16)
        .select("query_id","neighbor_id").as[(Long,Long)].collect().toSet)
      println(s"nprobe=$np plain=$p residual=$r")
    }
    for (m <- Seq(8)) { // more subspaces (dsub=2)
      val p = rec(graft.ext.SimSearch.ivfPqTopK(corpus,q,"vec_id","embedding",5,8,4,m,16)
        .select("query_id","neighbor_id").as[(Long,Long)].collect().toSet)
      val r = rec(graft.ext.SimSearch.ivfPqResidualTopK(corpus,q,"vec_id","embedding",5,8,4,m,16)
        .select("query_id","neighbor_id").as[(Long,Long)].collect().toSet)
      println(s"m=$m plain=$p residual=$r")
    }
    spark.stop()
  }
}
