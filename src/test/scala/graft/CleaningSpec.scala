package graft

import org.apache.spark.sql.functions._

import graft.clean.CleaningAction._

class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private def outlierFrame = (Seq.fill(60)(10.0) ++ Seq.fill(60)(20.0) ++
    Seq(100000.0)).toDF("x") // 100000 is the lone z>3 outlier

  test("T1 outlier remove drops exactly the outlier rows") {
    val out = OutlierRemove("x")(outlierFrame)
    assert(out.count() == 120)
    assert(out.agg(max($"x")).head().getDouble(0) == 20.0)
  }

  test("T2 outlier->median: median computed over NON-outlier rows only") {
    // non-outlier median of 60x10 + 60x20 = 15.0 (pandas interpolation)
    val out = OutlierReplaceMedian("x")(outlierFrame)
    assert(out.filter($"x" === 15.0).count() == 1)
    assert(out.count() == 121)
  }

  test("T3 outlier->mean over non-outlier rows") {
    val out = OutlierReplaceMean("x")(outlierFrame)
    assert(out.filter($"x" === 15.0).count() == 1) // mean(60x10,60x20)=15
  }

  test("T4 clip computes quantiles over ALL rows including outliers") {
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val out = OutlierClip("x")(df).agg(min($"x"), max($"x")).head()
    // pandas quantile(0.01) of 1..100 = 1.99, quantile(0.99) = 99.01
    assert(math.abs(out.getDouble(0) - 1.99) < 1e-9)
    assert(math.abs(out.getDouble(1) - 99.01) < 1e-9)
  }

  test("T5 null drop") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    assert(NullDrop("x")(df).count() == 2)
  }

  test("T6 impute median: pandas linear interpolation (even count -> mean of middle two)") {
    val df = Seq(Some(1.0), Some(2.0), Some(4.0), Some(5.0), None).toDF("x")
    val out = NullImputeMedian("x")(df)
    assert(out.filter($"x" === 3.0).count() == 1) // median([1,2,4,5]) = 3.0
    assert(out.filter($"x".isNull).count() == 0)
  }

  test("T6 rejects non-numeric columns (type gate, app.py:287)") {
    val df = Seq(Some("a"), None).toDF("s")
    intercept[IllegalArgumentException](NullImputeMedian("s")(df))
  }

  test("T7 impute mode: tie broken by SMALLEST value (pandas mode().iloc[0])") {
    val df = Seq(Some("b"), Some("b"), Some("a"), Some("a"), None).toDF("s")
    val out = NullImputeMode("s")(df)
    assert(out.filter($"s" === "a").count() == 3) // tie a/b -> 'a' wins
  }

  test("T7 all-null column: nothing to fill with, frame unchanged") {
    val df = Seq[Option[String]](None, None).toDF("s")
    assert(NullImputeMode("s")(df).filter($"s".isNull).count() == 2)
  }

  test("T8 fill constant 'Unknown'") {
    val df = Seq(Some("x"), None).toDF("s")
    assert(NullFillConstant("s")(df).filter($"s" === "Unknown").count() == 1)
  }

  test("T9 keep-first dedup preserves the first occurrence in row order") {
    val df = Seq(("k1", "first"), ("k1", "second"), ("k2", "only"))
      .toDF("k", "v").coalesce(1)
    val out = DropDuplicates(subset = Seq("k"))(df).orderBy("k")
      .as[(String, String)].collect()
    assert(out.toSeq == Seq(("k1", "first"), ("k2", "only")))
  }

  test("T9 full-row dedup output has no duplicates and is a subset") {
    val df = Seq(1, 1, 2, 2, 3).toDF("x")
    val out = DropDuplicates()(df)
    assert(out.count() == 3)
    assert(out.except(df).count() == 0)
  }

  test("T10 auto-parse: whitelist formats -> yyyy-MM-dd string, else null (NaT)") {
    val df = Seq("2024-01-02", "31/12/2024", "2024/13/01", "garbage")
      .toDF("d")
    val out = DateAutoParse("d")(df).as[Option[String]].collect().toSeq
    assert(out == Seq(Some("2024-01-02"), Some("2024-12-31"), None, None))
  }

  test("T11 force dd/MM/yyyy") {
    val df = Seq("31/12/2024", "2024-01-02").toDF("d")
    val out = DateForceFormat.ddMMyyyy("d")(df).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("2024-12-31"), None))
  }

  test("T12 force yyyy-MM-dd validates and nulls failures") {
    val df = Seq("2024-01-02", "2024-13-02").toDF("d")
    val out = DateForceFormat.yyyyMMdd("d")(df).as[Option[String]].collect()
    assert(out.toSeq == Seq(Some("2024-01-02"), None))
  }

  test("approx (GK sketch) median paths agree with exact on a dense grid") {
    val df = (1 to 1001).map(_.toDouble).toDF("x")
      .union(Seq[Option[Double]](None).toDF("x"))
    val exact = NullImputeMedian("x")(df)
      .filter($"x" === 501.0).count()
    val approx = NullImputeMedian("x", exact = false)(df)
      .filter($"x" === 501.0).count()
    assert(exact == 2 && approx == 2) // 1001 filled rows + the imputed one
  }

  test("median/mean actions on an all-null column are no-ops (pandas fillna(NaN))") {
    val df = Seq[Option[Double]](None, None).toDF("x")
    assert(NullImputeMedian("x")(df).filter($"x".isNull).count() == 2)
    assert(OutlierReplaceMedian("x")(df).filter($"x".isNull).count() == 2)
    assert(OutlierReplaceMean("x")(df).filter($"x".isNull).count() == 2)
  }

  test("ScaleMinMax: [0,1] range, nulls stay null, constant column -> 0") {
    val df = Seq(Some(2.0), None, Some(4.0), Some(8.0)).toDF("x")
    val r = ScaleMinMax("x")(df).select($"x_scaled").as[Option[Double]]
      .collect().toSet
    assert(r == Set(Some(0.0), None, Some((4.0 - 2.0) / 6.0), Some(1.0)))
    val const = ScaleMinMax("x")(Seq(Some(5.0), Some(5.0), None).toDF("x"))
      .select($"x_scaled").as[Option[Double]].collect().toSet
    assert(const == Set(Some(0.0), None))
  }

  test("ScaleZScore: exact decimal moments, population variance, nulls kept") {
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("x")
    val r = ScaleZScore("x")(df)
      .select($"x", $"x_scaled").collect()
      .map(x => Option(x.get(0)) -> Option(x.get(1))).toMap
    // mean 2, var_pop = 14/3 - 4 = 2/3 — same IEEE derivation as the
    // op, rounded@8 like the op (ulp-absorbing output convention)
    val sd = math.sqrt(14.0 / 3 - 4.0)
    def r8(v: Double): Double =
      BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(Some(1.0)) == Some(r8((1.0 - 2.0) / sd)))
    assert(r(Some(2.0)) == Some(0.0))
    assert(r(Some(3.0)) == Some(r8((3.0 - 2.0) / sd)))
    assert(r(None).isEmpty)
    // degenerate: constant column standardizes to 0, not NaN
    val const = ScaleZScore("x")(Seq(Some(7.0), Some(7.0)).toDF("x"))
      .select($"x_scaled").as[Option[Double]].collect().toSet
    assert(const == Set(Some(0.0)))
  }

  test("ScaleRobust: median/IQR, outlier-immune, nulls kept, IQR=0 -> 0") {
    // 1..5: q1=2, med=3, q3=4, IQR=2 — exact on the integer grid
    val df = Seq(Some(1.0), Some(2.0), Some(3.0), Some(4.0), Some(5.0), None)
      .toDF("x")
    val r = ScaleRobust("x")(df).select($"x_scaled").as[Option[Double]]
      .collect().toSet
    assert(r == Set(Some(-1.0), Some(-0.5), Some(0.0), Some(0.5), Some(1.0),
      None))
    // a wild outlier replacing the max barely moves the quartiles
    // (q1=2, med=3, q3=4 unchanged) where a z-score would collapse
    val wild = ScaleRobust("x")(
      Seq(1.0, 2.0, 3.0, 4.0, 1e9).toDF("x"))
      .select($"x_scaled").as[Double].collect().sorted.take(4).toSeq
    assert(wild == Seq(-1.0, -0.5, 0.0, 0.5))
    // constant column: IQR = 0 -> non-nulls scale to 0
    val const = ScaleRobust("x")(Seq(Some(7.0), Some(7.0), None).toDF("x"))
      .select($"x_scaled").as[Option[Double]].collect().toSet
    assert(const == Set(Some(0.0), None))
  }

  test("QuantileBin: equal-population bins, boundary inclusivity, nulls") {
    // 1..8: quartile boundaries 2.75, 4.5, 6.25 -> bins of exactly 2
    val df = (1 to 8).map(i => Some(i.toDouble)).toDF("x")
    val bins = QuantileBin("x", nBins = 4)(df)
      .select($"x", $"x_bin").as[(Double, Int)].collect().toMap
    assert(bins == Map(1.0 -> 1, 2.0 -> 1, 3.0 -> 2, 4.0 -> 2,
      5.0 -> 3, 6.0 -> 3, 7.0 -> 4, 8.0 -> 4))
    // nulls stay null; values AT a boundary take the lower bin
    val edge = QuantileBin("x", nBins = 2)(
      Seq(Some(1.0), Some(2.0), Some(3.0), None).toDF("x"))
      .select($"x_bin").as[Option[Int]].collect().toSet
    assert(edge == Set(Some(1), Some(2), None)) // median 2.0 -> bin 1
  }

  test("CollapseRareCategories: share threshold, nulls collapse, " +
      "frequent categories untouched, rows preserved") {
    // 20 rows: a x10 (0.50), b x6 (0.30), c x3 (0.15), null x1 (0.05)
    val df = (Seq.fill(10)(Some("a")) ++ Seq.fill(6)(Some("b")) ++
      Seq.fill(3)(Some("c")) ++ Seq(None)).zipWithIndex
      .map { case (c, i) => (i.toLong, c) }.toDF("id", "cat")
    val out = CollapseRareCategories("cat", minShare = 0.2)
      .apply(df)
    val census = out.groupBy("cat").count().as[(String, Long)]
      .collect().toMap
    assert(census == Map("a" -> 10L, "b" -> 6L, "__other" -> 4L),
      s"c (0.15) and null fold into __other: $census")
    assert(out.count() == 20L, "row count preserved")
    assert(out.columns.toSeq == df.columns.toSeq, "schema preserved")
    // boundary: share EXACTLY at the threshold survives (>=)
    val at = CollapseRareCategories("cat", minShare = 0.15)
      .apply(df).groupBy("cat").count().as[(String, Long)].collect().toMap
    assert(at("c") == 3L, s"0.15 >= 0.15 keeps c: $at")
    intercept[IllegalArgumentException] {
      CollapseRareCategories("cat", minShare = 0.0)
    }
    intercept[IllegalArgumentException] {
      CollapseRareCategories("cat", minShare = 1.0)
    }
  }
}
