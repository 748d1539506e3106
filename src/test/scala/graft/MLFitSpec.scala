package graft

import org.apache.spark.sql.functions._

import graft.ext.MLFit

class MLFitSpec extends SparkSpec {
  import spark.implicits._

  private def sigmoid(z: Double) = 1.0 / (1.0 + math.exp(-z))

  test("logisticFit: first step from zero matches the closed form") {
    // at w=0 every p=0.5, so g = mean((0.5 - y) * x) exactly
    val df = Seq((1.0, 1.0), (2.0, 1.0), (-1.0, 0.0), (-2.0, 0.0))
      .toDF("x", "y")
    val w = MLFit.logisticFit(df, Seq("x"), "y", iterations = 1, lr = 0.5)
    // g_bias = mean(0.5 - y) = -0.0 + ... = (0.5-1)+(0.5-1)+(0.5)+(0.5) = 0 -> /4 = 0
    assert(w(0) == 0.0)
    // g_x = ((0.5-1)*1 + (0.5-1)*2 + 0.5*(-1) + 0.5*(-2))/4 = -3.0/4
    assert(math.abs(w(1) - 0.5 * 3.0 / 4) < 1e-9, w.mkString(","))
  }

  test("logisticFit: separable data -> growing positive weight, loss falls") {
    val rows = (1 to 40).map(i => (i % 2 * 2 - 1.0, i % 2 * 1.0)) // x=±1, y=(x>0)
    val df = rows.toDF("x", "y").localCheckpoint()
    def loss(w: Array[Double]): Double = rows.map { case (x, y) =>
      val p = sigmoid(w(0) + w(1) * x)
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }.sum / rows.size
    val w1 = MLFit.logisticFit(df, Seq("x"), "y", iterations = 1)
    val w3 = MLFit.logisticFit(df, Seq("x"), "y", iterations = 3)
    val w6 = MLFit.logisticFit(df, Seq("x"), "y", iterations = 6)
    assert(w3(1) > w1(1) && w6(1) > w3(1), "weight grows toward separation")
    assert(loss(w6) < loss(w3) && loss(w3) < loss(w1), "GD reduces loss")
    assert(math.abs(w6(0)) < 1e-6, "balanced classes keep bias ~0")
  }

  test("logisticFit: partitioning-invariant (decimal gradient sums)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) = {
      val f = graft.ext.TextStats.classifyQuality(docs.repartition(parts), "text")
        .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0))
        .localCheckpoint()
      MLFit.logisticFit(f,
        Seq("stopword_ratio", "punct_ratio", "avg_token_len", "len_ok"), "y")
        .toSeq
    }
    assert(run(3) == run(13), "weights must be bit-identical")
  }

  test("simpleLinearFit: exact line recovered, R^2 = 1") {
    val df = Seq((1.0, 5.0), (2.0, 7.0), (3.0, 9.0), (10.0, 23.0))
      .toDF("x", "y") // y = 2x + 3 exactly
    val r = MLFit.simpleLinearFit(df, "x", "y")
      .as[(Long, Double, Double, Double)].head()
    assert(r._1 == 4L)
    assert(math.abs(r._2 - 3.0) < 1e-9 && math.abs(r._3 - 2.0) < 1e-9, r)
    assert(math.abs(r._4 - 1.0) < 1e-12)
  }

  test("simpleLinearFit: noisy fit matches hand-computed OLS, partition-invariant") {
    val pts = Seq((1.0, 2.1), (2.0, 3.9), (3.0, 6.2), (4.0, 7.8), (5.0, 10.1))
    val n = pts.size.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val b1 = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val b0 = (sy - b1 * sx) / n
    val df = pts.toDF("x", "y")
    val r = MLFit.simpleLinearFit(df, "x", "y")
      .as[(Long, Double, Double, Double)].head()
    assert(math.abs(r._2 - b0) < 1e-9 && math.abs(r._3 - b1) < 1e-9)
    assert(r._4 > 0.99 && r._4 < 1.0, "strong but not perfect fit")
    val r13 = MLFit.simpleLinearFit(df.repartition(13), "x", "y")
      .as[(Long, Double, Double, Double)].head()
    assert(r == r13, "decimal moment sums are partitioning-invariant")
  }

  test("logisticFit: learned weights actually separate the labels") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val f = graft.ext.TextStats.classifyQuality(docs, "text")
      .withColumn("y", when(col("lang") === "en", 1.0).otherwise(0.0))
      .localCheckpoint()
    val names = Seq("stopword_ratio", "punct_ratio", "avg_token_len", "len_ok")
    val w = MLFit.logisticFit(f, names, "y", iterations = 10, lr = 1.0)
    // score rows with the learned weights; English docs lean on English
    // stopwords, so mean score(en) must exceed mean score(other)
    val z = names.zipWithIndex.foldLeft(lit(w(0)): org.apache.spark.sql.Column) {
      case (acc, (c, j)) => acc + (lit(w(j + 1)) * col(c))
    }
    val m = f.withColumn("z", z).groupBy("y").agg(avg("z")).as[(Double, Double)]
      .collect().toMap
    assert(m(1.0) > m(0.0), s"en mean logit ${m(1.0)} must beat ${m(0.0)}")
  }

  test("targetEncode: hand-computed smoothing, tiny category shrinks to " +
      "the global mean, nulls excluded, partitioning-invariant") {
    import graft.ext.MLFit
    // big: 100 rows of 10.0; tiny: 2 rows of 100.0; global mean
    // = (1000 + 200) / 102 = 11.764706
    val df = ((1 to 100).map(_ => ("big", Some(10.0))) ++
      Seq(("tiny", Some(100.0)), ("tiny", Some(100.0)),
        ("tiny", None))).toDF("cat", "y")
    val out = MLFit.targetEncode(df, "cat", "y", m = 50.0)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val gm = 1200.0 / 102.0
    assert(out("big")._2 == 100L && out("big")._3 == 10.0)
    assert(out("tiny")._2 == 2L && out("tiny")._3 == 100.0,
      "null target rows excluded from the encoding stats")
    val encTiny = (200.0 + 50.0 * gm) / 52.0
    val encBig = (1000.0 + 50.0 * gm) / 150.0
    assert(math.abs(out("tiny")._4 - encTiny) < 1e-6, s"tiny: ${out("tiny")}")
    assert(math.abs(out("big")._4 - encBig) < 1e-6, s"big: ${out("big")}")
    // the shrinkage direction: tiny lands far from its raw mean,
    // big stays near its own
    assert(math.abs(out("tiny")._4 - gm) < math.abs(100.0 - gm) / 2)
    assert(math.abs(out("big")._4 - 10.0) < 1.0)
    val again = MLFit.targetEncode(df.repartition(7), "cat", "y", m = 50.0)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == out, "decimal sums make the encoding partition-stable")
    intercept[IllegalArgumentException] {
      MLFit.targetEncode(df, "cat", "y", m = 0.0)
    }
  }

  test("hashedGramTrain separates a planted good/bad corpus: the " +
      "learned linear score ranks every good doc above every bad doc " +
      "(VERDICT r14 Next #5)") {
    // planted vocabulary: good docs speak {alpha, beta}, bad docs
    // {gamma, delta} — with 8 hash buckets the two vocabularies may
    // collide, so the assertion is FUNCTIONAL (score separation), not
    // per-bucket sign
    val good = (0 until 12).map(i =>
      (s"alpha beta alpha beta win$i", 1.0))
    val bad = (0 until 12).map(i =>
      (s"gamma delta gamma delta loss$i", 0.0))
    val df = (good ++ bad).toDF("text", "y")
    val w = MLFit.hashedGramTrain(df, "text", "y", d = 8,
      iterations = 3, lr = 0.5)
      .as[(String, Double)].collect().toMap
    assert(w.size == 9 && w.contains("bias"))
    // score each doc with the learned weights through the SAME
    // feature build (buckets + normalized counts)
    val toks = graft.ext.TextStats.tokens(
      graft.ext.TextStats.normalized($"text"))
    val grams = concat(col("__t"),
      when(size(col("__t")) >= 2,
        transform(sequence(lit(0), size(col("__t")) - 2), i =>
          concat(element_at(col("__t"), i + 1), lit(" "),
            element_at(col("__t"), i + 2))))
        .otherwise(array().cast("array<string>")))
    val scored = df.withColumn("__t", toks).withColumn("__g", grams)
      .withColumn("__b", transform(col("__g"),
        g => pmod(graft.functions.Hashing.hash64(g), lit(8))))
      .select(col("y"), (0 until 8).map(j =>
        (size(filter(col("__b"), b => b === j)).cast("double") /
          size(col("__b")).cast("double")) * lit(w(s"x$j")))
        .foldLeft(lit(w("bias")))(_ + _).as("score"))
      .as[(Double, Double)].collect()
    val worstGood = scored.filter(_._1 == 1.0).map(_._2).min
    val bestBad = scored.filter(_._1 == 0.0).map(_._2).max
    assert(worstGood > bestBad,
      s"no separation: worst good $worstGood <= best bad $bestBad")
  }

  test("hashedGramTrain is deterministic across partitionings and " +
      "excludes zero-gram docs instead of dividing by zero") {
    val df = Seq(("alpha beta gamma", 1.0), ("delta beta", 0.0),
      ("", 1.0), ("   ", 0.0)).toDF("text", "y")
    val a = MLFit.hashedGramTrain(df, "text", "y", d = 4)
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    val b = MLFit.hashedGramTrain(df.repartition(5), "text", "y", d = 4)
      .as[(String, Double)].collect().sortBy(_._1).toSeq
    assert(a == b, "decimal-sum GD must be partition-stable")
    assert(a.forall(w => !w._2.isNaN), s"NaN weight leaked: $a")
  }
}
