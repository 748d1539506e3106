package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

  test("hash sample: deterministic, ~rate, salt-decorrelated") {
    val a = Sampling.hashSample(docs, "doc_id", 100).select("doc_id")
      .as[Long].collect().toSet
    val b = Sampling.hashSample(docs, "doc_id", 100).select("doc_id")
      .as[Long].collect().toSet
    assert(a == b, "same salt must give identical rows across runs")
    val n = docs.count().toDouble
    assert(a.size > n * 0.06 && a.size < n * 0.14, s"~10% expected, got ${a.size}/$n")
    val c = Sampling.hashSample(docs, "doc_id", 100, salt = "other")
      .select("doc_id").as[Long].collect().toSet
    assert(c != a, "different salt must draw a different sample")
    assert(c.size > n * 0.06 && c.size < n * 0.14)
  }

  test("weightedSample: k per group, deterministic, weight-responsive") {
    val rows = (1L to 200L).map(i =>
      (if (i % 2 == 0) "a" else "b", i, if (i == 42) 1.0e9 else 1.0)
    ) ++ Seq(("a", 500L, 0.0), ("a", 501L, -3.0)) // excluded weights
    val df = rows.toDF("g", "id", "w")
    val s1 = Sampling.weightedSample(df, Seq("g"), "id", "w", k = 5)
      .select("g", "id").as[(String, Long)].collect().toSet
    assert(s1.count(_._1 == "a") == 5 && s1.count(_._1 == "b") == 5)
    assert(!s1.exists(r => r._2 >= 500L), "non-positive weights excluded")
    assert(s1.contains(("a", 42L)),
      "a weight 1e9 outdraws 99 weight-1 rivals for any fixed salt")
    val s2 = Sampling.weightedSample(df.repartition(13), Seq("g"), "id", "w",
      k = 5).select("g", "id").as[(String, Long)].collect().toSet
    assert(s1 == s2, "membership is partitioning-invariant")
    val s3 = Sampling.weightedSample(df, Seq("g"), "id", "w", k = 5,
      salt = "other").select("g", "id").as[(String, Long)].collect().toSet
    assert(s1 != s3, "different salt draws a different sample")
  }

  test("split: total partition, disjoint, proportions, stable membership") {
    val split = Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = docs.count()
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == n, "fractions summing to 1000 cover every row")
    assert(counts("train") > n * 0.7 && counts("train") < n * 0.9)
    // a row's split must not depend on the other rows present: sampling
    // the input first must keep each surviving row's assignment
    val sub = Sampling.assignSplit(docs.filter($"doc_id" % 3 === 0), "doc_id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val full = split.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    sub.foreach { case (id, sp) => assert(full(id) == sp) }
  }

  test("content-keyed split: exact copies always co-locate, leakage " +
      "audit reads zero, proportions hold") {
    val base = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select($"doc_id", $"text")
    // inject an exact copy of EVERY doc under a new id — the worst case
    // for an id-keyed split (every fingerprint now has 2 chances to
    // straddle)
    val docs = base.union(base.select(($"doc_id" + 1000000).as("doc_id"),
      $"text"))
    val split = graft.ext.Sampling.assignSplitByContent(docs, "text",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    // co-location property: one split per original id-pair
    val pairSplits = split
      .withColumn("orig", $"doc_id" % 1000000)
      .groupBy("orig")
      .agg(countDistinct($"split").as("k"))
      .filter($"k" > 1).count()
    assert(pairSplits == 0L, "every copy pair must land in ONE split")
    val leaks = graft.ext.Dedup.crossSplitLeakage(split, "text", "split")
    assert(leaks.count() == 0L, "leakage audit structurally empty")
    // id-keyed split on the same corpus DOES straddle (the failure mode
    // this operator removes)
    val idSplit = graft.ext.Sampling.assignSplit(docs, "doc_id",
      Seq("train" -> 800, "val" -> 100, "test" -> 100))
    assert(graft.ext.Dedup.crossSplitLeakage(idSplit, "text", "split")
      .count() > 0L, "id-keyed split must show straddlers on this corpus")
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val n = docs.count().toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9,
      s"~80% train, got ${counts("train") / n}")
  }

  test("token budget: equals the sequential single-window spec, edges hold") {
    import org.apache.spark.sql.expressions.Window
    val budget = 700L
    // tiny bucketWidth forces many buckets -> the two-level offsets path
    // is actually exercised (a huge width would degenerate to 1 bucket)
    val got = Sampling.tokenBudget(docs, "doc_id", "text", "source",
        budget, bucketWidth = 16)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = docs.select($"doc_id", $"source",
        graft.ext.TextStats.tokenCount($"text").cast("long").as("n"))
      .withColumn("cum", sum($"n").over(w))
      .filter($"cum" <= budget)
      .select("doc_id", "cum").as[(Long, Long)].collect().toMap
    assert(got == ref, "two-level prefix sum must reproduce the global window")
    assert(got.nonEmpty, "budget must keep something")
    val all = docs.count()
    assert(got.size < all, "budget must also cut something")
    // kept set is a per-source id-prefix: every kept doc's predecessors
    // within its source are kept too
    val bySource = docs.select("doc_id", "source").as[(Long, String)]
      .collect().groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    bySource.foreach { case (_, ids) =>
      val kept = ids.takeWhile(got.contains)
      assert(ids.filter(got.contains).toSeq == kept.toSeq,
        "kept docs must form a prefix in doc-id order")
    }
  }

  test("temperature weights: alpha flattens the head, quotas track shares") {
    val df = (1 to 900).map(i => (i.toLong,
      if (i <= 800) "big" else if (i <= 890) "mid" else "small"))
      .toDF("doc_id", "source").withColumn("text", lit("x"))
    val w = Sampling.temperatureWeights(df, "source", alpha = 0.5,
        budgetDocs = 1000L)
      .select("source", "n_docs", "share", "quota")
      .as[(String, Long, Double, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(w("big")._2 == 800 && w("mid")._2 == 90 && w("small")._2 == 10)
    // alpha=1 would give big 800/900 = .889 of the budget; sqrt flattens
    val shares = w.view.mapValues(_._3).toMap
    assert(shares("big") < 0.8 && shares("big") > 0.6)
    assert(shares("small") > 10.0 / 900.0, "small source gains share")
    assert(math.abs(shares.values.sum - 1.0) < 1e-5)
    // quota = round(share * budget) exactly
    w.values.foreach { case (_, _, s, q) =>
      assert(q == math.floor(s * 1000 + 0.5).toLong)
    }
    // alpha=1.0 reduces to plain proportions
    val plain = Sampling.temperatureWeights(df, "source", alpha = 1.0,
        budgetDocs = 900L)
      .select("source", "quota").as[(String, Long)].collect().toMap
    assert(plain == Map("big" -> 800L, "mid" -> 90L, "small" -> 10L))
    intercept[IllegalArgumentException] {
      Sampling.temperatureWeights(df, "source", alpha = 0.3)
        .collect()
    }
  }

  test("mixture sample: per-group rates, default rate, determinism") {
    val rates = Seq("src0" -> 1000, "src1" -> 0)
    val m = Sampling.mixtureSample(docs, "doc_id", "source", rates,
      defaultPermille = 500)
    val got = m.groupBy("source").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    // rate 1000 keeps everything, rate 0 drops the group entirely
    assert(got.getOrElse("src0", 0L) == sizes("src0"))
    assert(!got.contains("src1"))
    // the default-rate tail keeps roughly half overall
    val tailKept = got.filterKeys(k => k != "src0" && k != "src1").values.sum
    val tailSize = sizes.filterKeys(k => k != "src0" && k != "src1").values.sum
    assert(tailKept > tailSize * 0.35 && tailKept < tailSize * 0.65,
      s"~50% of the tail expected, got $tailKept/$tailSize")
    // membership is per-row deterministic: independent of partitioning
    val a = m.select("doc_id").as[Long].collect().toSet
    val b = Sampling.mixtureSample(docs.repartition(7), "doc_id", "source",
      rates, defaultPermille = 500).select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // mixture draws are decorrelated from the plain-sample salt: a doc
    // kept at 500 permille here need not be in hashSample(500)
    val plain = Sampling.hashSample(docs, "doc_id", 500).select("doc_id")
      .as[Long].collect().toSet
    assert(a != plain)
  }

  test("stratified quota: exactly min(quota, |stratum|) per stratum, deterministic") {
    val q = Sampling.stratifiedQuota(docs, Seq("lang"), "doc_id", 10)
    val got = q.groupBy("lang").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (lang, sz) =>
      assert(got.getOrElse(lang, 0L) == math.min(10L, sz),
        s"$lang: expected ${math.min(10L, sz)}, got ${got.getOrElse(lang, 0L)}")
    }
    val again = Sampling.stratifiedQuota(docs, Seq("lang"), "doc_id", 10)
      .select("doc_id").as[Long].collect().toSet
    assert(q.select("doc_id").as[Long].collect().toSet == again)
  }
}
