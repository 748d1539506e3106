package graft

import org.apache.spark.sql.functions._
import graft.profile.NumericProfile

/** Approx-mode quantile faces (VERDICT r6 #6 / r7 Next #5): the
  * percentile_approx-backed siblings of the exact grid panel. The
  * contract pinned here: (a) same output shape as the exact faces,
  * (b) on groups smaller than the sketch accuracy the sketch holds
  * every value, so each approx quantile is a true data value whose
  * rank is within the tolerance of the exact target rank ceil(q*n)
  * (the GK sketch's rank convention can differ from the exact panel's
  * lower-quantile by at most one grid position even when uncompressed),
  * and (c) the approx trimmed mean's bounds bracket at least
  * (hiQ-loQ) of the mass.
  */
class ApproxQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def data = {
    // 3 groups with distinct shapes: uniform grid, skewed, tiny
    val rows =
      (1 to 1000).map(i => ("u", i.toLong)) ++
      (1 to 500).map(i => ("s", (i * i % 97).toLong)) ++
      Seq(("t", 5L), ("t", 7L), ("t", 7L), ("t", 9L))
    rows.toDF("lang", "n_chars")
  }

  test("quantilePanelApprox: same schema as exact; ranks within one " +
      "position of the exact target on sub-accuracy groups") {
    val exact = NumericProfile.quantilePanel(data, "n_chars", "lang")
    val approx = NumericProfile.quantilePanelApprox(data, "n_chars", "lang")
    assert(approx.schema.map(f => f.name) == exact.schema.map(_.name))
    val byG = data.as[(String, Long)].collect()
      .groupBy(_._1).map { case (g, vs) => g -> vs.map(_._2).sorted }
    val qs = Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75,
      "p90" -> 0.9, "p99" -> 0.99)
    approx.collect().foreach { r =>
      val g = r.getString(0)
      val vs = byG(g)
      val n = vs.length
      assert(r.getLong(1) == n.toLong, s"n_rows for $g")
      qs.zipWithIndex.foreach { case ((name, q), i) =>
        val v = r.getLong(2 + i)
        assert(vs.contains(v), s"$name of $g must be a true data value")
        // rank window of v in the sorted values (ties span a range)
        val loRank = vs.indexOf(v) + 1
        val hiRank = vs.lastIndexOf(v) + 1
        val target = math.ceil(q * n).toLong
        // sub-accuracy sketch: at most one grid position off the
        // exact lower-quantile target
        assert(loRank <= target + 1 && hiRank >= target - 1,
          s"$name of $g: value $v rank [$loRank,$hiRank] vs target $target")
      }
    }
    // and the bench-paired faces agree with their library functions
    assert(approx.count() == exact.count())
  }

  test("trimmedMeanApprox: same schema as exact; bounds bracket the " +
      "trim mass; means match exact on sub-accuracy groups to 1e-6") {
    val exact = NumericProfile.trimmedMean(data, "n_chars", "lang")
    val approx = NumericProfile.trimmedMeanApprox(data, "n_chars", "lang")
    assert(approx.schema.map(_.name) == exact.schema.map(_.name))
    val e = exact.collect().map(r => r.getString(0) -> r).toMap
    approx.collect().foreach { r =>
      val g = r.getString(0)
      val n = r.getLong(1)
      assert(n == e(g).getLong(1), s"n_rows for $g")
      val lo = r.getDouble(2); val hi = r.getDouble(3)
      assert(lo <= hi, s"bounds ordered for $g")
      // the raw mean is trim-independent: must equal the exact face's
      assert(math.abs(r.getDouble(5) - e(g).getDouble(5)) <= 1e-6,
        s"raw mean for $g")
      // bounds bracket at least (hiQ - loQ) - 2/n of the mass
      val vs = data.filter(col("lang") === g)
        .select(col("n_chars").cast("double")).as[Double].collect()
      val inside = vs.count(v => v >= lo && v <= hi).toDouble / vs.length
      assert(inside >= 0.9 - 2.0 / n,
        s"trim bounds of $g bracket $inside of the mass")
      // sub-accuracy sketch: trimmed mean within one grid step of exact
      // (bounds can differ by at most one position, each moving the
      // conditional mean by < max|v| / tn)
      val exactTm = e(g).getDouble(4)
      assert(math.abs(r.getDouble(4) - exactTm) <=
        math.max(1.0, vs.map(math.abs).max / math.max(1, vs.length / 2)),
        s"trimmed mean of $g: ${r.getDouble(4)} vs exact $exactTm")
    }
  }
}
