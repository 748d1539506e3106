package graft

import org.apache.spark.sql.functions._

import graft.profile.NumericProfile

class NumericProfileSpec extends SparkSpec {
  import spark.implicits._

  test("corr: perfect linear, anti-linear, constant-null") {
    val df = Seq.tabulate(50)(i =>
      (i.toDouble, 2.0 * i + 3.0, 100.0 - i, 7.0))
      .toDF("x", "y2x", "yneg", "const")
    val out = NumericProfile.corrMatrix(df, Seq("x", "y2x", "yneg", "const"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(math.abs(out(("x", "y2x")).get - 1.0) < 1e-12)
    assert(math.abs(out(("x", "yneg")).get + 1.0) < 1e-12)
    // constant column -> zero variance -> null, not NaN/Infinity
    assert(out(("x", "const")).isEmpty)
    assert(out(("y2x", "const")).isEmpty)
  }

  test("corr matches Spark's built-in corr within profiling tolerance") {
    val df = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val ours = NumericProfile.corrMatrix(df, Seq("l_quantity", "l_extendedprice"))
      .select("corr").as[Double].head()
    val builtin = df.agg(corr($"l_quantity", $"l_extendedprice"))
      .as[Double].head()
    assert(math.abs(ours - builtin) < 1e-9, s"ours=$ours builtin=$builtin")
  }

  test("MAD outliers: robust to the extreme value that defines them") {
    // group a: values 10,11,12,13,14 + wild 1000 -> med 12.5, deviations
    // [2.5,1.5,0.5,0.5,1.5,987.5] -> MAD 1.5; only 1000 exceeds 3.5*1.5
    // (z-score would pull mean to ~176 and flag NOTHING at 3 sigma:
    //  stddev ~368, all |x-mean| < 3*stddev — the robustness point)
    val a = Seq(10.0, 11.0, 12.0, 13.0, 14.0, 1000.0).map(("a", _))
    // group b: constant -> MAD 0, no outliers
    val b = Seq(5.0, 5.0, 5.0).map(("b", _))
    // group c: constant except one -> MAD 0 degeneracy: deviator flags
    val c = Seq(7.0, 7.0, 7.0, 8.0).map(("c", _))
    val df = (a ++ b ++ c).toDF("g", "value")
    val out = NumericProfile.madOutliers(df, "value", "g")
      .orderBy("g").select("g", "n_rows", "med", "mad", "n_outliers")
      .as[(String, Long, Double, Double, Long)].collect().toSeq
    assert(out(0) == (("a", 6L, 12.5, 1.5, 1L)))
    assert(out(1) == (("b", 3L, 5.0, 0.0, 0L)))
    assert(out(2) == (("c", 4L, 7.0, 0.0, 1L)))
  }

  test("histogram: exact integer bucketing, edges land deterministically") {
    // cents 100..139 (values 1.00..1.39), 4 bins over width 40 -> 10 each
    val df = (0 until 40).map(i => (100 + i) / 100.0).toDF("v")
    val out = NumericProfile.histogram(df, "v", nBins = 4)
      .orderBy("bucket")
      .select("bucket", "n_rows", "min_val", "max_val")
      .as[(Int, Long, Double, Double)].collect()
    assert(out.toSeq == Seq(
      (0, 10L, 1.0, 1.39), (1, 10L, 1.0, 1.39),
      (2, 10L, 1.0, 1.39), (3, 10L, 1.0, 1.39)))
    // single distinct value -> one bucket holding everything
    val one = NumericProfile.histogram(Seq(5.0, 5.0, 5.0).toDF("v"), "v", 8)
      .select("bucket", "n_rows").as[(Int, Long)].collect()
    assert(one.toSeq == Seq((0, 3L)))
  }

  test("histogram drift: identical snapshots show zero gap, shifts clamp to edges") {
    val ref = (0 until 40).map(i => (100 + i) / 100.0).toDF("v")
    val same = NumericProfile.histogramDrift(ref, ref, "v", nBins = 4)
      .select("bucket", "n_ref", "n_cur", "share_gap")
      .as[(Int, Long, Long, Double)].collect().toSeq.sorted
    assert(same == Seq((0, 10L, 10L, 0.0), (1, 10L, 10L, 0.0),
      (2, 10L, 10L, 0.0), (3, 10L, 10L, 0.0)))
    // current snapshot entirely above the reference range: all its mass
    // clamps into the LAST reference bucket (drift out of range is
    // visible as edge-bucket pileup, not silently dropped rows)
    val cur = (0 until 10).map(i => (900 + i) / 100.0).toDF("v")
    val shifted = NumericProfile.histogramDrift(ref, cur, "v", nBins = 4)
      .select("bucket", "n_ref", "n_cur", "share_ref", "share_cur")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq.sorted
    assert(shifted == Seq(
      (0, 10L, 0L, 0.25, 0.0), (1, 10L, 0L, 0.25, 0.0),
      (2, 10L, 0L, 0.25, 0.0), (3, 10L, 10L, 0.25, 1.0)))
    // total variation distance via the gap column: 0.5 * (0.25*3 + 0.75)
    val tvd = NumericProfile.histogramDrift(ref, cur, "v", nBins = 4)
      .agg(sum($"share_gap") * 0.5).as[Double].head()
    assert(math.abs(tvd - 0.75) < 1e-12)
  }

  test("ks drift: zero for identical snapshots, exact for a known shift, ties break low") {
    val ref = (0 until 40).map(i => (100 + i) / 100.0).toDF("v")
    val same = NumericProfile.ksDrift(ref, ref, "v", nBins = 4)
      .select("at_bucket", "ks_stat").as[(Int, Double)].head()
    // all gaps are exactly 0 -> argmax tie-break lands on bucket 0
    assert(same == ((0, 0.0)))
    // cur entirely above ref: its CDF is 0 until the last bucket, so the
    // max gap is ref's CDF through bucket 2 = 0.75
    val cur = (0 until 10).map(i => (900 + i) / 100.0).toDF("v")
    val shifted = NumericProfile.ksDrift(ref, cur, "v", nBins = 4)
      .select("at_bucket", "ks_stat").as[(Int, Double)].head()
    assert(shifted == ((2, 0.75)))
    // shift by exactly one bucket width (0.10): cur occupies buckets
    // 1,2,3 (top clamps), each CDF step lags ref by 0.25
    val oneOver = (0 until 40).map(i => (110 + i) / 100.0).toDF("v")
    val ks = NumericProfile.ksDrift(ref, oneOver, "v", nBins = 4)
      .select("ks_stat").as[Double].head()
    assert(math.abs(ks - 0.25) < 1e-12)
  }

  test("chiSquareDrift: zero on identical, grows with shift, counts unseen") {
    val ref = (Seq.fill(60)("a") ++ Seq.fill(30)("b") ++ Seq.fill(10)("c"))
      .toDF("cat")
    val same = NumericProfile.chiSquareDrift(ref, ref, "cat")
      .as[(Long, Long, Double, Long)].head()
    assert(same == ((3L, 0L, 0.0, 2L)), s"identical halves -> chi2 0: $same")
    // hand-computed: cur (20a, 60b, 20c), expected (60, 30, 10) scaled
    // to 100 -> chi2 = 40^2/60 + 30^2/30 + 10^2/10 = 26.666667 + 30 + 10
    val cur = (Seq.fill(20)("a") ++ Seq.fill(60)("b") ++ Seq.fill(20)("c"))
      .toDF("cat")
    val drift = NumericProfile.chiSquareDrift(ref, cur, "cat")
      .as[(Long, Long, Double, Long)].head()
    assert(drift._1 == 3L && drift._4 == 2L)
    assert(math.abs(drift._3 - (1600.0 / 60 + 30 + 10)) < 1e-6, drift)
    // a category unseen in ref is excluded from the statistic, reported
    val withNew = cur.union(Seq.fill(5)("zzz").toDF("cat"))
    val u = NumericProfile.chiSquareDrift(ref, withNew, "cat")
      .as[(Long, Long, Double, Long)].head()
    assert(u._2 == 1L, "new category counted as unseen")
  }

  test("percentileNormalize: hand-computed midranks with ties, group " +
      "mean (n+1)/2n, nulls dropped, partitioning-invariant") {
    val df = Seq(
      ("a", 1L, Some(10)), ("a", 2L, Some(20)), ("a", 3L, Some(20)),
      ("a", 4L, Some(30)), ("b", 5L, Some(7)), ("b", 6L, None)
    ).toDF("grp", "id", "v")
    val r = NumericProfile.percentileNormalize(df, "v", "grp")
      .select($"id", $"pct").as[(Long, Double)].collect().toMap
    // group a of 4: 10 -> (2*0+1+1)/8, 20 ties -> (2*1+2+1)/8, 30 -> 8/8
    assert(r(1L) == 0.25 && r(2L) == 0.625 && r(3L) == 0.625 &&
      r(4L) == 1.0, s"midranks: $r")
    assert(r(5L) == 1.0, "singleton group: its one value is the top")
    assert(!r.contains(6L), "null value has no rank")
    val meanA = Seq(r(1L), r(2L), r(3L), r(4L)).sum / 4
    assert(meanA == 0.625, s"group mean must be (n+1)/2n: $meanA")
    val again = NumericProfile.percentileNormalize(df.repartition(5),
      "v", "grp").select($"id", $"pct").as[(Long, Double)].collect().toMap
    assert(again == r, "partitioning-invariant")
  }

  test("benford: exact leading digits on the cents grid; zero/negative/null out of scope") {
    val df = Seq(Some(1.23), Some(19.99), Some(250.0), Some(2.0),
      Some(0.0), Some(-5.0), None, Some(0.09)).toDF("v")
    val got = NumericProfile.benford(df, "v")
      .select("digit", "n", "obs_share").as[(Int, Long, Double)]
      .collect().toSeq.sorted
    // cents: 123, 1999, 25000, 200, 9 -> digits 1,1,2,2,9 (0/-5/null skipped)
    assert(got == Seq((1, 2L, 0.4), (2, 2L, 0.4), (9, 1L, 0.2)))
    // expectations are the baked literals and gaps derive from them
    val row = NumericProfile.benford(df, "v").filter($"digit" === 1)
      .select("expected", "gap").as[(Double, Double)].head()
    assert(row._1 == math.log10(2.0))
    assert(math.abs(row._2 - math.abs(0.4 - math.log10(2.0))) < 1e-15)
  }

  test("bootstrapMeanCI: brackets the mean, scatters with the data, " +
      "degenerates to a point for constants, deterministic") {
    val df = (1L to 200L).map(i => (i, (i % 50) + 10.0)).toDF("id", "v")
    val r = NumericProfile.bootstrapMeanCI(df, "id", "v", b = 40)
      .as[(Long, Int, Double, Double, Double)].head()
    val (n, b, mean, lo, hi) = r
    assert(n == 200L && b == 40)
    assert(math.abs(mean - 34.5) < 1e-9) // true mean of (i%50)+10
    assert(lo < mean && mean < hi, s"CI must bracket the mean: $r")
    assert(hi - lo > 0.1 && hi - lo < 10.0,
      s"CI width must reflect sampling noise, not blow up: $r")
    val again = NumericProfile.bootstrapMeanCI(df.repartition(7), "id", "v",
      b = 40).as[(Long, Int, Double, Double, Double)].head()
    assert(again == r, "partitioning-invariant")
    val fresh = NumericProfile.bootstrapMeanCI(df, "id", "v", b = 40,
      salt = "other").as[(Long, Int, Double, Double, Double)].head()
    assert(fresh._4 != lo || fresh._5 != hi, "fresh salt -> fresh draw")
    // constant column: every resample mean is the constant
    val const = (1L to 50L).map(i => (i, 7.0)).toDF("id", "v")
    val c = NumericProfile.bootstrapMeanCI(const, "id", "v", b = 40)
      .as[(Long, Int, Double, Double, Double)].head()
    assert(c._3 == 7.0 && c._4 == 7.0 && c._5 == 7.0)
    intercept[IllegalArgumentException] {
      NumericProfile.bootstrapMeanCI(df, "id", "v", b = 1)
    }
  }

  test("mutualInformation: zero for independent, equals entropy for " +
      "identical, hand-computed asymmetric case, constant-column guard") {
    // balanced independent pair: every cell p_xy = p_x * p_y -> MI 0
    val ind = (0 until 100).map(i => (s"x${i % 2}", s"y${(i / 2) % 2}"))
      .toDF("a", "b")
    val r0 = NumericProfile.mutualInformation(ind, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])].head()
    assert(r0._1 == 100L && r0._2 == 2L && r0._3 == 2L)
    assert(r0._4 == 0.0, s"independent -> MI 0: $r0")
    assert(math.abs(r0._5 - math.log(2.0)) < 1e-6, s"H_x = ln 2: $r0")
    assert(r0._7.contains(0.0), s"NMI 0: $r0")
    // y == x: MI = H_x = H_y, NMI = 1
    val dup = (0 until 90).map(i => (s"c${i % 3}", s"c${i % 3}"))
      .toDF("a", "b")
    val r1 = NumericProfile.mutualInformation(dup, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])].head()
    assert(math.abs(r1._4 - math.log(3.0)) < 1e-6, s"MI = ln 3: $r1")
    assert(r1._4 == r1._5 && r1._5 == r1._6, s"MI = H_x = H_y: $r1")
    assert(r1._7.contains(1.0), s"NMI 1: $r1")
    // hand case: cells (a,p) (a,q) (b,p), each once ->
    // MI = (ln .75 + 2 ln 1.5) / 3 = 0.174416 at the 8/12/6 rounding
    val hand = Seq(("a", "p"), ("a", "q"), ("b", "p")).toDF("a", "b")
    val r2 = NumericProfile.mutualInformation(hand, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])].head()
    assert(r2._4 == 0.174416, s"hand MI: $r2")
    // constant y: H_y = 0 -> MI 0 and NMI must be null, not Infinity
    val const = (0 until 10).map(i => (s"x$i", "only")).toDF("a", "b")
    val r3 = NumericProfile.mutualInformation(const, "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])].head()
    assert(r3._4 == 0.0 && r3._6 == 0.0 && r3._7.isEmpty, s"guard: $r3")
    // partitioning-invariant (decimal-summed terms)
    val again = NumericProfile.mutualInformation(ind.repartition(7), "a", "b")
      .as[(Long, Long, Long, Double, Double, Double, Option[Double])].head()
    assert(again == r0)
  }

  test("concentrationReport: uniform vs monopoly endpoints, weighted " +
      "shares, top-k accounting") {
    // 4 equal groups: H = ln 4, effective 4, HHI 1/4, Gini 0, top1 1/4
    val uniform = (0 until 80).map(i => (s"g${i % 4}", 10L)).toDF("g", "w")
    val u = NumericProfile.concentrationReport(uniform, "g")
      .as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(u._1 == 4L)
    assert(math.abs(u._2 - math.log(4.0)) < 1e-6)
    assert(math.abs(u._3 - 4.0) < 1e-5, s"effective groups: $u")
    assert(u._4 == 0.25 && u._5 == 0.0 && u._6 == 0.25 && u._7 == 1.0)
    // near-monopoly: 97 docs in one group, 1 in each of 3 others
    val mono = ((0 until 97).map(_ => "big") ++ Seq("a", "b", "c"))
      .toDF("g")
    val m = NumericProfile.concentrationReport(mono, "g").as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(m._6 == 0.97 && m._1 == 4L)
    assert(m._4 > 0.9, s"HHI near 1: $m")
    assert(m._5 > 0.7, s"Gini high: $m")
    assert(m._3 < 1.3, s"effective groups collapse toward 1: $m")
    // weighting flips the story: equal doc counts, skewed chars
    val wdf = Seq(("x", 970L), ("y", 10L), ("z", 20L)).toDF("g", "w")
    val byDocs = NumericProfile.concentrationReport(wdf, "g").as[(Long, Double, Double, Double, Double, Double, Double)].head()
    val byChars = NumericProfile.concentrationReport(wdf, "g",
      weightCol = Some("w")).as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(byDocs._6 < 0.34 && byChars._6 == 0.97,
      s"doc-count vs char-weighted top1: $byDocs vs $byChars")
    // single group: entropy 0, gini 0, all shares 1
    val one = Seq("only", "only").toDF("g")
    val o = NumericProfile.concentrationReport(one, "g").as[(Long, Double, Double, Double, Double, Double, Double)].head()
    assert(o == ((1L, 0.0, 1.0, 1.0, 0.0, 1.0, 1.0)), s"single group: $o")
  }

  test("quantilePanel: hand-checked lower quantiles on a known grid, " +
      "ties and nulls handled, degenerate single value") {
    // group a: values 1..100 once each -> p25=25, p50=50, p75=75,
    // p90=90, p99=99 (lower quantile: min v with cum >= ceil(q*n))
    val a = (1 to 100).map(v => ("a", Some(v.toLong)))
    // group b: heavy ties — 10 at value 5, 10 at value 9
    //   n=20: p25 -> ceil(5)=5 -> v=5; p50 -> cum>=10 -> 5;
    //   p75 -> cum>=15 -> 9; p90/p99 -> 9
    val b = (1 to 10).map(_ => ("b", Some(5L))) ++
      (1 to 10).map(_ => ("b", Some(9L)))
    // group c: single value + a null (ignored)
    val c = Seq(("c", Some(7L)), ("c", Option.empty[Long]))
    val out = NumericProfile.quantilePanel(
      (a ++ b ++ c).toDF("g", "v"), "v", "g")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 100L, 25L, 50L, 75L, 90L, 99L)), out("a"))
    assert(out("b") == (("b", 20L, 5L, 5L, 9L, 9L, 9L)), out("b"))
    assert(out("c") == (("c", 1L, 7L, 7L, 7L, 7L, 7L)), out("c"))
    // partitioning-invariant (grid windows, not row order)
    val again = NumericProfile.quantilePanel(
      (a ++ b ++ c).toDF("g", "v").repartition(7), "v", "g")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == out)
    intercept[IllegalArgumentException] {
      NumericProfile.quantilePanel(a.toDF("g", "v"), "v", "g", Seq(1.5))
    }
  }

  test("spearman: monotone nonlinear reads 1, classic hand case -0.5, " +
      "tie midranks, constant guard, scale-free") {
    // y = x^2 is nonlinear but perfectly monotone -> rho exactly 1
    val mono = (1L to 30L).map(i => (i, i * i)).toDF("x", "y")
    val m = NumericProfile.spearman(mono, "x", "y")
      .as[(Long, Option[Double])].head()
    assert(m == ((30L, Some(1.0))), s"monotone: $m")
    // textbook: ranks x=(1,2,3) vs y=(3,1,2) -> rho = -0.5
    val hand = Seq((1L, 30L), (2L, 10L), (3L, 20L)).toDF("x", "y")
    assert(NumericProfile.spearman(hand, "x", "y")
      .as[(Long, Option[Double])].head() == ((3L, Some(-0.5))))
    // identical tie structure on both sides -> midranks equal -> 1
    val ties = Seq((1L, 10L), (2L, 20L), (2L, 20L), (3L, 40L))
      .toDF("x", "y")
    assert(NumericProfile.spearman(ties, "x", "y")
      .as[(Long, Option[Double])].head() == ((4L, Some(1.0))))
    // constant column: zero rank variance -> null, not NaN
    val const = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    assert(NumericProfile.spearman(const, "x", "y")
      .as[(Long, Option[Double])].head()._2.isEmpty)
    // rank stats ignore scale: multiplying y by 1000 changes nothing
    val scaled = (1L to 30L).map(i => (i, i * i * 1000L)).toDF("x", "y")
    assert(NumericProfile.spearman(scaled, "x", "y")
      .as[(Long, Option[Double])].head()._2.contains(1.0))
  }

  test("trimmedMean: 5-95 bounds on a known grid, outlier immunity, " +
      "nulls dropped") {
    val a = (1 to 100).map(v => ("a", Some(v.toLong)))
    // group b: 19 x 10 + one 1000 -> hi bound lands on 10, the
    // outlier is trimmed; raw mean is dragged to 59.5
    val b = (1 to 19).map(_ => ("b", Some(10L))) :+ (("b", Some(1000L)))
    val c = Seq(("c", Some(5L)), ("c", Option.empty[Long]))
    val out = NumericProfile.trimmedMean(
      (a ++ b ++ c).toDF("g", "v"), "v", "g")
      .as[(String, Long, Double, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("a") == (("a", 100L, 5.0, 95.0, 50.0, 50.5)), out("a"))
    assert(out("b") == (("b", 20L, 10.0, 10.0, 10.0, 59.5)), out("b"))
    assert(out("c") == (("c", 1L, 5.0, 5.0, 5.0, 5.0)), out("c"))
    intercept[IllegalArgumentException] {
      NumericProfile.trimmedMean(a.toDF("g", "v"), "v", "g", 0.9, 0.1)
    }
  }

  test("skewKurtosis: symmetric reads 0, hand-computed right skew, " +
      "constant degenerates to null, partitioning-invariant") {
    val df = (Seq(1.0, 2.0, 3.0).map(("sym", _)) ++
      Seq(0.0, 0.0, 0.0, 4.0).map(("rskew", _)) ++
      Seq(7.0, 7.0).map(("const", _))).toDF("g", "v")
    val out = NumericProfile.skewKurtosis(df, "v", "g")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])].collect().map(r => r._1 -> r).toMap
    val sym = out("sym")
    assert(sym._2 == 3L && sym._3 == 2.0 && sym._5.contains(0.0), sym)
    assert(sym._6.contains(-1.5), s"[1,2,3] excess kurtosis -1.5: $sym")
    // [0,0,0,4]: m2=3, m3=6 -> skew 6/3^1.5 = 1.154701; m4=21 ->
    // kurtosis 21/9 - 3 = -0.666667
    val rs = out("rskew")
    assert(rs._5.contains(1.154701) && rs._6.contains(-0.666667), rs)
    val c = out("const")
    assert(c._4.isEmpty && c._5.isEmpty && c._6.isEmpty,
      s"zero variance -> nulls, not NaN: $c")
    val again = NumericProfile.skewKurtosis(df.repartition(5), "v", "g")
      .as[(String, Long, Double, Option[Double], Option[Double], Option[Double])].collect().map(r => r._1 -> r).toMap
    assert(again == out)
  }

  test("psiDrift: hand-computed index, add-one smoothing keeps unseen " +
      "categories defined, verdict bands") {
    import graft.profile.NumericProfile
    val ref = (Seq.fill(90)("a") ++ Seq.fill(10)("b")).toDF("c")
    val curStable = (Seq.fill(89)("a") ++ Seq.fill(11)("b")).toDF("c")
    // category "z" is unseen in ref: only defined because of smoothing
    val curShift = (Seq.fill(30)("a") ++ Seq.fill(40)("b") ++
      Seq.fill(30)("z")).toDF("c")
    def handPsi(rc: Map[String, Long], cc: Map[String, Long]): Double = {
      val cats = (rc.keySet ++ cc.keySet).toSeq.sorted
      val r1 = cats.map(c => c -> (rc.getOrElse(c, 0L) + 1)).toMap
      val c1 = cats.map(c => c -> (cc.getOrElse(c, 0L) + 1)).toMap
      val (tr, tc) = (r1.values.sum.toDouble, c1.values.sum.toDouble)
      val s = cats.map { c =>
        val (q, p) = (r1(c) / tr, c1(c) / tc)
        BigDecimal((p - q) * math.log(p / q))
          .setScale(8, BigDecimal.RoundingMode.HALF_UP)
      }.sum
      s.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val stable = NumericProfile.psiDrift(ref, curStable, "c")
      .as[(Long, Double, String)].head()
    assert(stable._1 == 2 &&
      stable._2 == handPsi(Map("a" -> 90, "b" -> 10), Map("a" -> 89, "b" -> 11))
      && stable._3 == "stable", stable)
    val shift = NumericProfile.psiDrift(ref, curShift, "c")
      .as[(Long, Double, String)].head()
    assert(shift._1 == 3 &&
      shift._2 == handPsi(Map("a" -> 90, "b" -> 10),
        Map("a" -> 30, "b" -> 40, "z" -> 30)) &&
      shift._3 == "shifted", shift)
  }

  test("quantilePanelBounded: window brackets hand-checked, sketch " +
      "verdicts true at spec scale, window shrinks legally with accuracy") {
    // values 1..100 once: target rank for p50 = 50; d = ceil(100/10000)
    // + 1 = 2 -> window ranks [48, 52] -> values [48, 52]
    val a = (1 to 100).map(v => ("a", v.toLong)).toDF("g", "v")
    val out = NumericProfile.quantilePanelBounded(a, "v", "g",
      qs = Seq(0.5)).collect().head
    assert(out.getAs[Long]("n_rows") == 100L)
    assert(out.getAs[Long]("lo50") == 48L && out.getAs[Long]("hi50") == 52L)
    assert(out.getAs[Boolean]("ok_p50"),
      "sub-accuracy group: sketch is exact, must sit inside the window")
    // a coarse sketch (accuracy 10 -> d = ceil(100/10)+1 = 11) widens
    // the window to ranks [39, 61]; the verdict must still hold
    val coarse = NumericProfile.quantilePanelBounded(a, "v", "g",
      qs = Seq(0.5), accuracy = 10).collect().head
    assert(coarse.getAs[Long]("lo50") == 39L &&
      coarse.getAs[Long]("hi50") == 61L && coarse.getAs[Boolean]("ok_p50"))
  }

  test("trimmedMeanBounded: extreme means really bracket, verdicts true, " +
      "exact raw mean") {
    val a = (1 to 100).map(v => ("a", v.toDouble)).toDF("g", "v")
    val r = NumericProfile.trimmedMeanBounded(a, "v", "g").collect().head
    assert(r.getAs[Long]("n_rows") == 100L)
    assert(r.getAs[Double]("raw_mean") == 50.5)
    val tmin = r.getAs[Double]("trim_min"); val tmax = r.getAs[Double]("trim_max")
    assert(tmin <= tmax, s"extreme means ordered: $tmin, $tmax")
    // the exact trimmed mean (5..95 inclusive) must also sit in the band
    val exact = NumericProfile.trimmedMean(a, "v", "g")
      .collect().head.getAs[Double]("trimmed_mean")
    assert(exact >= tmin - 1e-6 && exact <= tmax + 1e-6)
    assert(r.getAs[Boolean]("ok_lo") && r.getAs[Boolean]("ok_hi") &&
      r.getAs[Boolean]("ok_trim"))
  }
}
