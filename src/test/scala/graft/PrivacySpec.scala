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
}
