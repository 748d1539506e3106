package graft

import graft.ext.Pca

class PcaSpec extends SparkSpec {
  import spark.implicits._

  /** Anisotropic corpus with a KNOWN dominant axis: x = t * u + noise,
    * t swept over a grid, u = (1,1,0,...)/sqrt(2), noise deterministic
    * (no RNG — reruns are bit-identical). Dominant-axis variance ~0.34
    * vs ~1e-3 per noise dimension. */
  private def anisotropic(dims: Int = 8, n: Int = 60) = {
    val s = 1.0 / math.sqrt(2.0)
    (0 until n).map { i =>
      val t = (i % 21 - 10) / 10.0
      val v = (0 until dims).map { j =>
        val noise = ((i * 7 + j * 13) % 11 - 5) / 100.0
        val u = if (j < 2) s else 0.0
        (t * u + noise).toFloat
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("topComponent aligns with the dominant axis of an anisotropic corpus") {
    val v = Pca.topComponent(anisotropic(), "vec_id", "embedding")
      .as[(Int, Option[Double])].collect().sortBy(_._1).map(_._2.get)
    assert(v.length == 8)
    val norm = math.sqrt(v.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-6, s"unit loading vector, norm=$norm")
    val s = 1.0 / math.sqrt(2.0)
    val cosTrue = math.abs(v(0) * s + v(1) * s)
    assert(cosTrue > 0.99,
      s"component must align with the planted axis: |cos|=$cosTrue " +
        s"loadings=${v.toSeq}")
  }

  test("projectTop: projection variance dominates any single raw axis") {
    val corpus = anisotropic()
    val proj = Pca.projectTop(corpus, "vec_id", "embedding")
      .as[(Long, Double)].collect().map(_._2)
    def variance(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val vProj = variance(proj.toSeq)
    // per-axis variances of the raw corpus
    val rows = corpus.as[(Long, Seq[Float])].collect().map(_._2)
    val axisVars = (0 until 8).map(j => variance(rows.map(_(j).toDouble).toSeq))
    assert(vProj >= axisVars.max - 1e-9,
      s"PCA variance $vProj must dominate axis variances $axisVars")
  }

  test("deterministic: partitioning-invariant and rerun-stable") {
    val corpus = anisotropic(dims = 6, n = 40)
    def run(parts: Int) = Pca.projectTop(corpus.repartition(parts),
      "vec_id", "embedding").as[(Long, Double)].collect().sortBy(_._1).toSeq
    val a = run(3); val b = run(13); val c = run(3)
    assert(a == b, "decimal sums + rounded re-entry: partitioning-invariant")
    assert(a == c, "rerun-stable (fixed start vector, no RNG)")
  }

  test("degenerate corpora: empty input rejected, constant corpus yields null loadings") {
    val empty = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pca.topComponent(empty, "vec_id", "embedding")
    }
    assert(e.getMessage.contains("empty corpus"))
    val const = (0 until 5).map(i => (i.toLong, Seq(1.0f, 2.0f, 3.0f)))
      .toDF("vec_id", "embedding")
    val v = Pca.topComponent(const, "vec_id", "embedding")
      .as[(Int, Option[Double])].collect()
    assert(v.forall(_._2.isEmpty),
      "zero covariance: loadings degrade to NULL, not NaN")
  }
}
