package graft

import org.apache.spark.sql.functions._

import graft.ext.LangModel

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("unigramLogProb: common-word docs score higher, empties kept") {
    val docs = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the the the the the the"), // all max-frequency tokens
      (3L, "zyx qwv jkq pfx bnm vvv"), // all singletons
      (4L, "")
    ).toDF("doc_id", "text")
    val r = LangModel.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(4L) == ((0L, None)), "empty doc: n_tok 0, null score")
    assert(r(1L)._1 == 6L && r(3L)._1 == 6L)
    val s2 = r(2L)._2.get; val s1 = r(1L)._2.get; val s3 = r(3L)._2.get
    assert(s2 > s1 && s1 > s3,
      s"frequency must order scores: $s2 > $s1 > $s3")
    assert(s3 < 0 && s2 < 0, "log-probs are negative")
  }

  test("unigramLogProb: tokenization matches the corpus normalizer") {
    // punctuation folds away, case folds: both docs identical tokens
    val docs = Seq((1L, "Hello, World!"), (2L, "hello world"))
      .toDF("doc_id", "text")
    val r = LangModel.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3.get).toMap
    assert(r(1L) == r(2L))
  }

  test("bigramLogProb: word ORDER matters (context signal the unigram " +
      "scorer cannot see), short docs kept with null score") {
    // every word appears exactly 5 times corpus-wide, so the UNIGRAM
    // score of docs 1-5 is identical — only bigram order separates them
    val docs = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha beta gamma"), (4L, "alpha beta gamma"),
      (5L, "gamma beta alpha"), // same words, scrambled order
      (6L, "alpha"),            // 1 token: no bigrams
      (7L, "")                  // empty
    ).toDF("doc_id", "text")
    val u = LangModel.unigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3).toMap
    assert(u(1L) == u(5L), "unigram is order-blind by construction")
    val r = LangModel.bigramLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(6L) == ((0L, None)), "1-token doc: no bigrams, null score")
    assert(r(7L) == ((0L, None)), "empty doc: no bigrams, null score")
    assert(r(1L)._1 == 2L, "n-1 bigrams for n tokens")
    assert(r(1L)._2 == r(4L)._2, "identical docs score identically")
    val common = r(1L)._2.get; val scrambled = r(5L)._2.get
    assert(common > scrambled,
      s"common word order must outscore scrambled: $common > $scrambled")
    assert(common < 0 && scrambled < 0, "log-probs are negative")
  }

  test("bigramLogProb: deterministic across partitionings") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) = LangModel.bigramLogProb(
      docs.repartition(parts), "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(run(3) == run(13), "decimal sums are partitioning-invariant")
  }

  test("stupidBackoff: each tier hand-computed (trigram hit, bigram " +
      "backoff, unigram floor), short docs null") {
    // train corpus: "a b c a b c" -> trigrams (a,b,c)x2, (b,c,a), (c,a,b);
    // bigrams (a,b)x2, (b,c)x2, (c,a); unigrams a:2 b:2 c:2, N=6, V=3
    val docs = Seq(
      (1L, "a b c a b c", true),
      (2L, "a b c", false),  // seen trigram: S = c3/ctx2 = 2/2 = 1
      (3L, "b b c", false),  // unseen trigram, seen bigram (b,c):
                             // S = 0.5 * c2/c1ctx = 0.5 * 2/2 = 0.5
      (4L, "b a x", false),  // unseen everything incl. word x:
                             // S = 0.25 * (0+1)/(6+3)
      (5L, "a b", false)     // < 3 tokens: no trigrams
    ).toDF("doc_id", "text", "trn")
    val r = LangModel.stupidBackoff(docs, "doc_id", "text", col("trn"))
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(5L) == ((0L, None)), s"2-token doc: no trigrams: ${r(5L)}")
    assert(r(2L)._1 == 1L && math.abs(r(2L)._2.get - 0.0) < 1e-6,
      s"trigram-tier: ln(1) = 0, got ${r(2L)}")
    assert(math.abs(r(3L)._2.get - math.log(0.5)) < 1e-6,
      s"bigram-tier: ln(0.5), got ${r(3L)}")
    assert(math.abs(r(4L)._2.get - math.log(0.25 / 9.0)) < 1e-6,
      s"unigram-floor: ln(0.25/9), got ${r(4L)}")
    // tier ordering: seen > bigram-backoff > unseen-word floor
    assert(r(2L)._2.get > r(3L)._2.get && r(3L)._2.get > r(4L)._2.get)
  }

  test("kneserNeyLogProb: hand-computed on a 3-cycle corpus") {
    // "a b c a b c a": bigrams ab,bc,ca each twice; every context has
    // c1=2, nf=1; every word has nb=1; T=3 types. So every observed
    // p(w2|w1) = (2-0.75)/2 + (0.75*1/2)*(1/3) = 0.75 and the doc's
    // avg_logp is exactly ln(0.75) (rounded@8 per type).
    val docs = Seq((1L, "a b c a b c a"), (2L, "x"), (3L, ""))
      .toDF("doc_id", "text")
    val r = LangModel.kneserNeyLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(2L) == ((0L, None)), "1-token doc: no bigrams, null score")
    assert(r(3L) == ((0L, None)), "empty doc kept")
    assert(r(1L)._1 == 6L)
    val expected = BigDecimal(math.log(0.75))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(r(1L)._2.get - expected) < 1e-12,
      s"avg_logp ${r(1L)._2.get} != ln(0.75) rounded@8 $expected")
  }

  test("kneserNeyLogProb: continuation diversity outranks raw frequency " +
      "(the KN signal Jelinek-Mercer cannot see)") {
    // q follows THREE distinct contexts (diverse continuation), u
    // follows one; every bigram appears once and every context total is
    // 1, so the ONLY difference between doc 1 and doc 4 is N1+(·w2):
    // p(q|p) = 0.25 + 0.75*(3/4) vs p(u|t) = 0.25 + 0.75*(1/4).
    val docs = Seq((1L, "p q"), (2L, "r q"), (3L, "s q"), (4L, "t u"))
      .toDF("doc_id", "text")
    val r = LangModel.kneserNeyLogProb(docs, "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> t._3.get).toMap
    assert(r(1L) > r(4L),
      s"diverse continuation must score higher: ${r(1L)} > ${r(4L)}")
    assert(r(1L) == r(2L) && r(2L) == r(3L),
      "symmetric contexts of the same continuation score identically")
  }

  test("kneserNeyLogProb: deterministic across partitionings") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) = LangModel.kneserNeyLogProb(
      docs.repartition(parts), "doc_id", "text")
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(run(3) == run(13))
  }

  test("stupidBackoff: deterministic across partitionings") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) = LangModel.stupidBackoff(
      docs.repartition(parts), "doc_id", "text",
      col("source").isin("src1", "src3"))
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(run(3) == run(13))
  }

  test("importanceWeights: target-like docs weigh positive") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", true),
      (2L, "alpha beta gamma epsilon", true),
      (3L, "omega sigma tau phi", false),
      (4L, "omega sigma tau psi", false),
      (5L, "alpha beta gamma delta", false), // target-like content
      (6L, "", false)
    ).toDF("doc_id", "text", "tgt")
    val r = LangModel.importanceWeights(docs, "doc_id", "text",
      col("tgt"), buckets = 64)
      .as[(Long, Long, Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(r(6L) == ((0L, None)))
    // smoothing dominates absolute signs at toy counts — the operator's
    // guarantee is the ORDERING: target-like content outweighs off-target
    val w5 = r(5L)._2.get; val w3 = r(3L)._2.get
    assert(w5 > w3, s"target-like content must outweigh: $w5 > $w3")
    assert(r(1L)._2.get > w3, "in-target above off-target")
    assert(r(2L)._2.get > r(4L)._2.get)
  }

  test("importanceWeights: deterministic across runs and partitionings") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) = LangModel.importanceWeights(
      docs.repartition(parts), "doc_id", "text",
      col("source").isin("src1", "src3"))
      .as[(Long, Long, Option[Double])].collect().sortBy(_._1).toSeq
    assert(run(3) == run(13), "decimal sums are partitioning-invariant")
  }

  test("perplexityBuckets: ~terciles per group, head scores >= tail, " +
      "empties excluded, partitioning-invariant") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val b = LangModel.perplexityBuckets(docs, "doc_id", "text", "lang")
    val rows = b.as[(Long, String, Long, Double, String)].collect()
    val n = docs.count()
    assert(rows.length <= n && rows.length > 0)
    // per language: every bucket non-empty, sizes within histogram-tie
    // slack of n/3, and the head's WORST score >= the tail's BEST
    rows.groupBy(_._2).foreach { case (lang, rs) =>
      val byBucket = rs.groupBy(_._5).view.mapValues(_.toSeq).toMap
      assert(byBucket.keySet == Set("head", "middle", "tail"),
        s"$lang: ${byBucket.keySet}")
      val third = rs.length / 3.0
      assert(byBucket("head").size >= third * 0.5 &&
        byBucket("head").size <= third * 1.5,
        s"$lang head=${byBucket("head").size} of ${rs.length}")
      val headMin = byBucket("head").map(_._4).min
      val tailMax = byBucket("tail").map(_._4).max
      assert(headMin >= tailMax, s"$lang: head $headMin < tail $tailMax")
    }
    // deterministic under repartitioning (histogram + integer cutoffs)
    def run(parts: Int) = LangModel.perplexityBuckets(
      docs.repartition(parts), "doc_id", "text", "lang")
      .as[(Long, String, Long, Double, String)].collect()
      .sortBy(_._1).toSeq
    assert(run(3) == run(13))
  }

  test("doremiWeights: harder domain upweighted, weights sum to 1, " +
      "smoothing floors every domain, eta->0 goes uniform") {
    // easy: repeats of the corpus's most common words; hard: each doc
    // mostly unique tokens -> high self-trained unigram NLL
    val docs = ((1L to 20L).map(i => (i, "the data the data the data", "easy")) ++
      (21L to 40L).map(i => (i, s"zx$i qq$i ww$i ee$i rr$i tt$i", "hard")))
      .toDF("doc_id", "text", "src")
    val w = LangModel.doremiWeights(docs, "doc_id", "text", "src",
        eta = 5.0, smoothing = 0.1)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(w("hard")._3 > w("easy")._3, s"hard NLL must exceed easy: $w")
    assert(w("hard")._4 > 0 && w("easy")._4 < 0, s"excess signs: $w")
    assert(w("hard")._5 > w("easy")._5, s"hard domain upweighted: $w")
    val total = w.values.map(_._5).sum
    assert(math.abs(total - 1.0) < 1e-5, s"weights sum to 1: $total")
    // smoothing floor: no domain below s/D = 0.05
    assert(w.values.forall(_._5 >= 0.05 - 1e-9), s"floor: $w")
    // eta -> 0: softmax flattens, weights -> uniform regardless of loss
    val flat = LangModel.doremiWeights(docs, "doc_id", "text", "src",
        eta = 1e-9, smoothing = 0.1)
      .as[(String, Long, Double, Double, Double)].collect()
    flat.foreach(r => assert(math.abs(r._5 - 0.5) < 1e-4, s"uniform: $r"))
    intercept[IllegalArgumentException] {
      LangModel.doremiWeights(docs, "doc_id", "text", "src", eta = 0.0)
    }
    intercept[IllegalArgumentException] {
      LangModel.doremiWeights(docs, "doc_id", "text", "src",
        smoothing = 1.0)
    }
  }
}
