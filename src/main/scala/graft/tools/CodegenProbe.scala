package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextStats}
import graft.functions.{Hashing, VectorExprs}

/** Forces codegen (no interpreted fallback) to prove every custom
  * expression's doGenCode compiles and computes the same values as the
  * portable column formulas. Run with CODEGEN_ONLY + fallback=false so a
  * Janino failure is an error, not a silent deopt. */
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
    println(s"[cg] dot: $out (expect List(32.0, 0.0))")
    require(out == Seq(32.0, 0.0), "DotProductD codegen mismatch")

    // StringHash64 vs the conv/md5 column formula
    val strs = Seq("", "a", "hello world", "ünïcode ok").toDF("s")
    val nh = strs.select(Hashing.hash64($"s")).as[Long].collect().toSeq
    val fh = strs.select(conv(substring(md5($"s".cast("string")), 1, 15), 16, 10)
      .cast("long")).as[Long].collect().toSeq
    require(nh == fh, s"StringHash64 codegen mismatch: $nh vs $fh")
    println(s"[cg] hash64: $nh")

    // MinHashSig vs hand-rolled permutation mins
    val hs = Seq(42L, 7L, 999999L)
    val expSig = (0 until 16).map { i =>
      hs.map(x => (Hashing.permuteA(i) * (x % Hashing.P) + Hashing.permuteB(i)) % Hashing.P).min
    }
    val gotSig = Seq(Tuple1(hs)).toDF("h")
      .select(VectorExprs.minhash_sig($"h", 16)).as[Seq[Long]].head()
    require(gotSig == expSig, "MinHashSig codegen mismatch")
    println(s"[cg] minhash_sig head: ${gotSig.take(4)}...")

    // SimHash32 vs bit-vote reference
    def refSim(tok: Seq[Long]): Long =
      (0 until 32).map { j =>
        val v = tok.map(h => if (((h >> j) & 1L) == 1L) 1 else -1).sum
        if (v > 0) 1L << j else 0L
      }.sum
    val toks = Seq(3L, 5L, 12345678901L)
    val gotSim = Seq(Tuple1(toks)).toDF("t")
      .select(VectorExprs.simhash32($"t")).as[Long].head()
    require(gotSim == refSim(toks), "SimHash32 codegen mismatch")
    println(s"[cg] simhash32: $gotSim")

    // NormalizeD
    val gotN = Seq(Tuple1(Seq(3.0, 4.0))).toDF("v")
      .select(VectorExprs.normalize_d($"v")).as[Seq[Double]].head()
    require(gotN == Seq(0.6, 0.8), "NormalizeD codegen mismatch")
    println(s"[cg] normalize_d: $gotN")

    // CharShingleHashes vs composed formula
    val cdf = Seq("hello world example", "ab").toDF("t")
      .select(TextStats.normalized($"t").as("n"))
    val gotC = cdf.select(VectorExprs.char_shingle_hashes($"n", 5))
      .as[Seq[Long]].collect().toSeq
    val expC = cdf.select(transform(Dedup.charShinglesOfNormalized($"n", 5),
      s => Hashing.hash64(s))).as[Seq[Long]].collect().toSeq
    require(gotC == expC, "CharShingleHashes codegen mismatch")
    println(s"[cg] char_shingle_hashes sizes: ${gotC.map(_.size)}")

    // and through a real fixture pipeline
    val e = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "embeddings")
    val n = graft.ext.SimSearch.bruteTopK(e, e.filter($"vec_id" < 3), "vec_id", "embedding", 3).count()
    println(s"[cg] bruteTopK under CODEGEN_ONLY: rows=$n")
    val d = graft.io.Sources.table(spark, "/root/testdata/sf0.001", "documents")
    val nd = Dedup.nearDuplicatesChar(d, "doc_id", "text", threshold = 0.6).count()
    println(s"[cg] nearDuplicatesChar under CODEGEN_ONLY: rows=$nd")
    println("[cg] ALL CODEGEN CHECKS PASSED")
    spark.stop()
  }
}
