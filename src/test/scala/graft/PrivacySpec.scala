package graft

import graft.profile.Privacy

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // 3 classes: (NY, M) x4, (NY, F) x2, (LA, M) x1
  private val people = Seq(
    ("NY", "M", 1), ("NY", "M", 2), ("NY", "M", 3), ("NY", "M", 4),
    ("NY", "F", 5), ("NY", "F", 6),
    ("LA", "M", 7)
  ).toDF("city", "sex", "id")

  test("k-anonymity histogram: class sizes, row accounting, at-risk marking") {
    val h = Privacy.kAnonymityHistogram(people, Seq("city", "sex"), k = 3)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(h == Map(
      4L -> ((1L, 4L, false)), // one class of 4, satisfies k=3
      2L -> ((1L, 2L, true)),
      1L -> ((1L, 1L, true))))
    assert(h.values.map(_._2).sum == 7L, "every row accounted for exactly once")
  }

  test("riskiest classes: smallest first, deterministic tie order, bounded") {
    val r = Privacy.riskiestClasses(people, Seq("city", "sex"), topK = 2)
      .as[(String, String, Long)].collect().toSeq
    assert(r == Seq(("LA", "M", 1L), ("NY", "F", 2L)))
  }

  test("single QID column and k guardrails") {
    val h = Privacy.kAnonymityHistogram(people, Seq("city"), k = 5)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(h == Map(6L -> false, 1L -> true))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityHistogram(people, Seq.empty, k = 3)
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityHistogram(people, Seq("city"), k = 1)
    }
  }

  test("dpGroupCounts: noise bounded by the inverse CDF's support, " +
      "deterministic per salt, distinct across salts, threshold suppresses") {
    val rows = (0 until 200).map(i => (s"g${i % 40}", i)).toDF("g", "x")
    val out = Privacy.dpGroupCounts(rows, Seq("g"), eps = 1.0)
      .as[(String, Double)].collect().toMap
    assert(out.size == 40)
    // true count is 5 per group; |noise| <= ln(1e6) ~ 13.82 at eps 1
    out.values.foreach(v => assert(math.abs(v - 5.0) <= 13.9, s"noise bound: $v"))
    assert(out.values.exists(v => v != 5.0), "noise actually applied")
    val again = Privacy.dpGroupCounts(rows, Seq("g"), eps = 1.0)
      .as[(String, Double)].collect().toMap
    assert(again == out, "same salt -> identical release")
    val fresh = Privacy.dpGroupCounts(rows, Seq("g"), eps = 1.0, salt = "r2")
      .as[(String, Double)].collect().toMap
    assert(fresh != out, "fresh salt -> fresh draw")
    // Laplace scale: mean |noise| over 40 groups should be near b=1/eps
    val meanAbs = out.values.map(v => math.abs(v - 5.0)).sum / out.size
    assert(meanAbs > 0.2 && meanAbs < 3.0, s"Laplace scale sanity: $meanAbs")
    // tighter eps -> proportionally wider noise, same underlying u
    val wide = Privacy.dpGroupCounts(rows, Seq("g"), eps = 0.5)
      .as[(String, Double)].collect().toMap
    wide.foreach { case (g, v) =>
      assert(math.abs((v - 5.0) - 2.0 * (out(g) - 5.0)) < 1e-5,
        s"eps halved must double the draw for $g")
    }
    // suppression: singleton groups vanish at threshold 10, big survive
    val mixed = ((0 until 50).map(i => ("big", i)) ++ Seq(("rare", 1)))
      .toDF("g", "x")
    val rel = Privacy.dpGroupCounts(mixed, Seq("g"), eps = 1.0,
      threshold = 10.0).as[(String, Double)].collect().toMap
    assert(rel.contains("big") && !rel.contains("rare"))
    // null group values are releasable (hash key coalesces)
    val withNull = Seq((null.asInstanceOf[String], 1), ("a", 2), ("a", 3))
      .toDF("g", "x")
    assert(Privacy.dpGroupCounts(withNull, Seq("g"), eps = 1.0).count() == 2)
    intercept[IllegalArgumentException] {
      Privacy.dpGroupCounts(rows, Seq.empty, eps = 1.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpGroupCounts(rows, Seq("g"), eps = 0.0)
    }
  }

  test("dpGroupCounts: null group noise matches the documented ' ' " +
      "coalesce convention (oracle parity)") {
    // The DuckDB oracle (qDpHistogramSql) and dpGroupMeans both build
    // the noise key with COALESCE(col, ' '); a null group value must
    // therefore draw EXACTLY the noise of an explicit " " value, or a
    // null-group release hashes differently in the two engines.
    val nullG = Seq((null.asInstanceOf[String], 1),
      (null.asInstanceOf[String], 2), (null.asInstanceOf[String], 3))
      .toDF("g", "x")
    val spaceG = Seq((" ", 1), (" ", 2), (" ", 3)).toDF("g", "x")
    val nNull = Privacy.dpGroupCounts(nullG, Seq("g"), eps = 1.0)
      .select("noisy_count").as[Double].collect().head
    val nSpace = Privacy.dpGroupCounts(spaceG, Seq("g"), eps = 1.0)
      .select("noisy_count").as[Double].collect().head
    assert(nNull == nSpace,
      s"null group must hash like ' ' (got $nNull vs $nSpace)")
    assert(nNull != 3.0, "noise actually applied to the null group")
    // same parity for the means release (it already used ' ')
    val mNull = Privacy.dpGroupMeans(
        Seq((null.asInstanceOf[String], 4.0)).toDF("g", "v"),
        Seq("g"), "v", 0.0, 10.0, eps = 0.5)
      .select("noisy_count", "dp_mean").as[(Double, Double)].collect().head
    val mSpace = Privacy.dpGroupMeans(Seq((" ", 4.0)).toDF("g", "v"),
        Seq("g"), "v", 0.0, 10.0, eps = 0.5)
      .select("noisy_count", "dp_mean").as[(Double, Double)].collect().head
    assert(mNull == mSpace, s"means parity: $mNull vs $mSpace")
  }

  // sensitive values: (NY,M) -> {a,a,b,b} l=2, (NY,F) -> {a,c} l=2,
  // (LA,M) -> {a} l=1
  private val sensPeople = Seq(
    ("NY", "M", "a"), ("NY", "M", "a"), ("NY", "M", "b"), ("NY", "M", "b"),
    ("NY", "F", "a"), ("NY", "F", "c"),
    ("LA", "M", "a")
  ).toDF("city", "sex", "diag")

  test("l-diversity histogram: distinct-sensitive counts per class, " +
      "row accounting, threshold marking") {
    val h = Privacy.lDiversityHistogram(sensPeople, Seq("city", "sex"),
        "diag", l = 4)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(h == Map(
      2L -> ((2L, 6L, true)), // two classes with 2 distinct diagnoses
      1L -> ((1L, 1L, true))))
    assert(h.values.map(_._2).sum == 7L, "every row accounted for once")
    // a homogeneous-but-large class is exactly what l-diversity flags
    // and k-anonymity misses: size 4 passes k=3, l=2 fails l=4
    val k = Privacy.kAnonymityHistogram(sensPeople, Seq("city", "sex"), k = 3)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(k(4L) == false && h(2L)._3 == true)
    // at l=2 the 2-diverse classes clear the bar
    val h2 = Privacy.lDiversityHistogram(sensPeople, Seq("city", "sex"),
        "diag", l = 2)
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(h2 == Map(2L -> false, 1L -> true))
    intercept[IllegalArgumentException] {
      Privacy.lDiversityHistogram(sensPeople, Seq.empty, "diag", l = 2)
    }
    intercept[IllegalArgumentException] {
      Privacy.lDiversityHistogram(sensPeople, Seq("city"), "diag", l = 1)
    }
  }

  test("dpGroupMeans: clamping bounds the release, near-exact at huge " +
      "eps, deterministic per salt, count floored at 1") {
    // group "hi" has values far above the clamp cap
    val rows = ((0 until 100).map(i => ("a", (i % 10).toDouble)) ++
      (0 until 50).map(_ => ("hi", 1e9))).toDF("g", "v")
    // eps so large the noise is negligible -> release ~= clamped truth
    val out = Privacy.dpGroupMeans(rows, Seq("g"), "v",
        lo = 0.0, hi = 10.0, eps = 1e9)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(math.abs(out("a")._1 - 100.0) < 1e-3, s"count a: ${out("a")}")
    assert(math.abs(out("a")._2 - 4.5) < 1e-3, s"mean a: ${out("a")}")
    // the 1e9 values were clamped to hi BEFORE aggregation
    assert(math.abs(out("hi")._2 - 10.0) < 1e-3, s"clamp: ${out("hi")}")
    // determinism + fresh-salt freshness at a realistic eps
    val r1 = Privacy.dpGroupMeans(rows, Seq("g"), "v", 0.0, 10.0, eps = 0.5)
      .as[(String, Double, Double)].collect().toSet
    val r2 = Privacy.dpGroupMeans(rows, Seq("g"), "v", 0.0, 10.0, eps = 0.5)
      .as[(String, Double, Double)].collect().toSet
    assert(r1 == r2, "same salt -> identical release")
    val r3 = Privacy.dpGroupMeans(rows, Seq("g"), "v", 0.0, 10.0,
      eps = 0.5, salt = "fresh").as[(String, Double, Double)].collect().toSet
    assert(r3 != r1, "fresh salt -> fresh draw")
    // a tiny group at tight eps: the count release is floored at 1 so
    // the mean can never divide by <= 0
    val tiny = Seq(("solo", 5.0)).toDF("g", "v")
    val t = Privacy.dpGroupMeans(tiny, Seq("g"), "v", 0.0, 10.0, eps = 0.01)
      .as[(String, Double, Double)].collect().head
    assert(t._2 >= 1.0, s"noisy count floored: $t")
    intercept[IllegalArgumentException] {
      Privacy.dpGroupMeans(rows, Seq("g"), "v", 10.0, 0.0, eps = 1.0)
    }
    intercept[IllegalArgumentException] {
      Privacy.dpGroupMeans(rows, Seq("g"), "v", 0.0, 10.0, eps = -1.0)
    }
  }
}
