package graft

import org.apache.spark.sql.functions._

import graft.io.SampleData
import graft.model.Mission
import graft.profile.Profiler

class ProfilerSpec extends SparkSpec {
  import spark.implicits._

  test("P1 profile: nulls, distinct, dtype in one pass") {
    val df = Seq(
      (Some(1.0), Some("a")), (None, Some("a")), (Some(2.0), None),
      (Some(2.0), Some("b"))).toDF("x", "s")
    val p = Profiler.profile(df).map(c => c.column -> c).toMap
    assert(p("x").nNull == 1 && p("x").nDistinct == 2)
    assert(p("s").nNull == 1 && p("s").nDistinct == 2)
    assert(p("x").dtype == "double")
  }

  test("P1 profile counts NaN as null for double columns (pandas parity)") {
    val df = Seq(1.0, Double.NaN, 2.0).toDF("x")
    assert(Profiler.profile(df).head.nNull == 1)
  }

  test("P1 profileAuto flips to HLL above the row threshold and flags it") {
    val df = Seq(
      (Some(1.0), Some("a")), (None, Some("a")), (Some(2.0), None),
      (Some(2.0), Some("b"))).toDF("x", "s")
    // under the threshold: exact counts, exact = true on every row
    val small = Profiler.profileAuto(df)
    assert(small.forall(_.exact))
    assert(small.map(c => c.column -> c.nDistinct).toMap ==
      Map("x" -> 2L, "s" -> 2L))
    // over the (forced tiny) threshold: HLL path, flagged not-exact;
    // at this cardinality HLL is exact-valued, so counts still agree
    val approx = Profiler.profileAuto(df, exactMaxRows = 2L)
    assert(approx.forall(!_.exact))
    assert(approx.map(c => c.column -> c.nDistinct).toMap ==
      Map("x" -> 2L, "s" -> 2L))
    // the forced-exact oracle path stays flagged exact
    assert(Profiler.profile(df, exact = true).forall(_.exact))
  }

  test("P2 duplicate count = total - distinct, single shuffle") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    assert(Profiler.duplicateCount(df) == 2)
    assert(Profiler.duplicateCount(df.limit(0)) == 0)
  }

  test("P2 approx (HLL) duplicate count tracks exact within the rsd bound") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("k", "v")
    assert(Profiler.duplicateCountApprox(df) == 2) // tiny cardinality: exact
    assert(Profiler.duplicateCountApprox(df.limit(0)) == 0)
    // fixture-scale check: exact vs HLL on real lineitem rows
    val l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
    val exact = Profiler.duplicateCount(l, Seq("l_orderkey", "l_partkey"))
    val approx = Profiler.duplicateCountApprox(l, Seq("l_orderkey", "l_partkey"), 0.02)
    val nDistinct = l.distinct().count()
    assert(math.abs(approx - exact) <= math.max(5L, (0.06 * nDistinct).toLong),
      s"approx=$approx exact=$exact distinct=$nDistinct")
  }

  test("P4 z-score uses POPULATION stddev (ddof=0) like pandas std(ddof=0)") {
    // values 2,4,4,4,5,5,7,9: mean 5, stddev_pop 2 (stddev_samp ~2.138)
    val df = Seq(2, 4, 4, 4, 5, 5, 7, 9).toDF("x")
    val m = Profiler.zScoreModel(df, "x")
    assert(m.mean == 5.0 && m.stdPop == 2.0)
  }

  test("P4 degenerate std (constant column) flags nothing") {
    val df = Seq(3, 3, 3).toDF("x")
    val m = Profiler.zScoreModel(df, "x")
    assert(m.degenerate)
    assert(df.filter(m.mask).count() == 0)
  }

  test("P4 outliers detected past 3 sigma; nulls never flagged") {
    val df = (Seq.fill(50)(10.0) ++ Seq.fill(50)(12.0) ++ Seq(1000.0))
      .map(Option(_)).:+(None).toDF("x")
    val m = Profiler.zScoreModel(df, "x")
    val flagged = df.filter(m.mask).collect().map(_.getDouble(0))
    assert(flagged.toSeq == Seq(1000.0))
  }

  test("P5 date-likeness: whitelist formats parse, garbage does not") {
    val df = Seq("2024-01-01", "31/12/2024", "2024/13/01", "bad", "20240101")
      .toDF("d")
    // 3 of 5 parse
    assert(math.abs(Profiler.dateLikeRatio(df, "d") - 0.6) < 1e-12)
    // numeric-looking strings do NOT count as dates (dateutil divergence)
    assert(Profiler.dateLikeRatio(Seq("50", "17").toDF("d"), "d") == 0.0)
  }

  test("P6 missions golden run on the seeded sample dataset") {
    val df = SampleData.load(spark)
    val ms = Profiler.detectMissions(df)
    // Verified against the reference's own code on its seeded data
    // (FIXTURES.md §A overstates these): only 5000 exceeds 3 sigma — the
    // 5000 itself inflates sigma to ~355 so 999 lands at z≈2.6 — and only
    // "2024/13/01" fails to parse ("01-02-2024" is valid d-M-y).
    val outlier = ms.collectFirst { case Mission.Outlier("price", n) => n }
    assert(outlier.contains(1L), s"price outliers == 1 (just 5000): $ms")
    assert(ms.collectFirst { case Mission.DateMixed("date", n) => n }
      .contains(1L), "exactly 1 unparseable date (2024/13/01)")
    assert(ms.collectFirst { case Mission.Duplicates(n) => n }.contains(2L),
      "rows 10,11 duplicate row 9")
    val catNulls = ms.collectFirst { case Mission.Nulls("category", n) => n }
    assert(catNulls.exists(_ > 0), "category has injected nulls")
  }

  test("sample data defect structure is exact") {
    val df = SampleData.load(spark)
    assert(df.count() == 200)
    val prices = df.filter(col("order_id").isin(6, 18, 51))
      .orderBy("order_id").select("price").as[Double].collect()
    assert(prices.toSeq == Seq(999.0, -100.0, 5000.0))
    val dates = df.filter(col("order_id").isin(3, 4)).orderBy("order_id")
      .select("date").as[String].collect()
    assert(dates.toSeq == Seq("2024/13/01", "01-02-2024"))
  }

  test("nullPatterns: coupled missingness shows as one pattern, shares " +
      "total 1, column order fixes the string") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("a"), Some(1.0)), // ---
      (Some(2), Some("b"), Some(2.0)),
      (None, None, Some(3.0)), // NN- twice: x,y missing TOGETHER
      (None, None, Some(4.0)),
      (Some(5), Some("c"), None), // --N
      (None, Some("d"), Some(6.0))) // N--
      .toDF("x", "y", "z")
    val out = Profiler.nullPatterns(df, Seq("x", "y", "z"))
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out == Map(
      "---" -> ((2L, 0.333333)),
      "NN-" -> ((2L, 0.333333)),
      "--N" -> ((1L, 0.166667)),
      "N--" -> ((1L, 0.166667))), s"patterns: $out")
    // the census SEES the coupling: x-null rows are 3, y-null rows 2,
    // but joint NN- is 2 — higher than independence (3*2/6 = 1) predicts
    assert(out("NN-")._1 == 2L)
    intercept[IllegalArgumentException] {
      Profiler.nullPatterns(df, Seq.empty)
    }
  }

  test("kmvDistinct: exact below k, bounded error above, deterministic, " +
      "and the sketch is union-mergeable") {
    import spark.implicits._
    def md5h(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val k = 16
    // group "small": 9 distinct (< k, exact); "big": 500 distinct
    val rows = (1 to 9).map(i => ("small", i.toLong)) ++
      (1 to 1000).map(i => ("big", (i % 500 + 1000).toLong))
    val df = rows.toDF("g", "v")
    val out = Profiler.kmvDistinct(df, "g", "v", k = k)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // small group: sketch IS the value set
    assert(out("small")._2 == 9 && out("small")._4 == 9.0)
    // big group: kept exactly k, estimate within the KMV error envelope
    assert(out("big")._2 == k)
    val est = out("big")._4
    assert(est > 250 && est < 1000, s"KMV estimate off: $est vs 500")
    // the k-th hash is the k-th smallest of the distinct-value hashes
    val hashes = (1 to 500).map(i => md5h((i + 1000).toString)).sorted
    assert(out("big")._3 == hashes(k - 1), "kth_hash is the true k-th min")
    assert(est == (k - 1).toDouble * math.pow(2.0, 60) / hashes(k - 1).toDouble)
    // mergeability: bottom-k of the union == bottom-k of merged sketches
    val halfA = (1 to 250).map(i => md5h((i + 1000).toString)).sorted.take(k)
    val halfB = (251 to 500).map(i => md5h((i + 1000).toString)).sorted.take(k)
    assert((halfA ++ halfB).sorted.take(k) == hashes.take(k),
      "union of shard sketches reproduces the global sketch")
    // determinism under reshuffling
    val again = Profiler.kmvDistinct(df.repartition(7), "g", "v", k = k)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(again == out)
    // null values are excluded, matching countDistinct semantics
    val withNulls = (rows.map { case (g, v) => (g, Option(v)) } :+
      ("small", Option.empty[Long]) :+ ("small", Option.empty[Long]))
      .toDF("g", "v")
    val nn = Profiler.kmvDistinct(withNulls, "g", "v", k = k)
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(nn == out, "nulls must not count as a distinct value")
  }

  test("cmsCounts: never underestimates, exact when wide, collisions " +
      "only inflate, partition-invariant") {
    import spark.implicits._
    // 50 keys, key k appears k+1 times -> known exact counts
    val rows = (0 until 50).flatMap(k => Seq.fill(k + 1)(k.toLong)).toDF("k")
    val probe = col("k") % 1 === 0 // all keys
    // tight sketch (w=8): collisions certain; CMS invariant must hold
    val tight = Profiler.cmsCounts(rows, "k", probe, w = 8, d = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(tight.size == 50)
    tight.foreach { case (k, (_, exact, est, over)) =>
      assert(exact == k + 1, s"exact count for $k")
      assert(est >= exact && over == est - exact,
        s"CMS must never underestimate: $k -> $est < $exact")
    }
    assert(tight.values.exists(_._4 > 0),
      "w=8 against 50 keys must produce at least one collision")
    // wide sketch (w=4096): 50 keys almost surely collision-free on
    // at least one of 4 rows -> estimates exact
    val wide = Profiler.cmsCounts(rows, "k", probe, w = 4096, d = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(wide.values.forall(r => r._4 == 0),
      "wide sketch should be exact on this key set")
    // sketch is a pure function of the multiset: reshuffling changes
    // nothing (merge = the partial aggregate's bucket addition)
    val again = Profiler.cmsCounts(rows.repartition(7), "k", probe,
        w = 8, d = 4)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == tight)
  }
}
