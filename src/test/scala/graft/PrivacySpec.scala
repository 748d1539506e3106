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
}
