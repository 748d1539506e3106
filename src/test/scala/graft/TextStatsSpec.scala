package graft

import org.apache.spark.sql.functions._

import graft.ext.TextStats

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenization: whitespace runs, no empties") {
    val df = Seq("  a  b\tc\nd  ").toDF("t")
    assert(df.select(TextStats.tokenCount($"t")).as[Int].head() == 4)
  }

  test("bpe-ish token count: letter runs + digit runs + punctuation") {
    val df = Seq("Hello, world42!").toDF("t")
    // hello | , | world | 42 | !
    assert(df.select(TextStats.bpeishTokenCount($"t")).as[Int].head() == 5)
  }

  test("quality features: ratios exact on a known sentence") {
    val df = Seq((1L, "the cat sat on the mat!")).toDF("id", "t")
    val r = TextStats.qualityScore(df, "t").head()
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_stopwords") == 3) // the, on, the
    assert(r.getAs[Int]("n_punct") == 1)
    assert(math.abs(r.getAs[Double]("stopword_ratio") - 0.5) < 1e-12)
    // short doc (<10 tokens): 0.0 length credit + 0.3 stopwords + 0.3 punct
    assert(r.getAs[Double]("quality_score") == 0.6)
  }

  test("language id: stopword voting with deterministic tie-break") {
    val df = Seq(
      "the cat and the dog is in that house",  // en
      "el perro y la casa es de un gato",      // es
      "der hund und die katze ist nicht ein",  // de
      "xyzzy qwerty asdf")                     // no hits -> und
      .toDF("t")
    val got = df.select(TextStats.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de", "und"))
  }

  test("fingerprints collapse case/punctuation/whitespace variants") {
    val df = Seq("Hello,  World!", "hello world", "different").toDF("t")
    val md5s = df.select(TextStats.fingerprintMd5($"t")).as[String].collect()
    assert(md5s(0) == md5s(1) && md5s(0) != md5s(2))
    val rolls = df.select(TextStats.fingerprintRolling($"t")).as[Long].collect()
    assert(rolls(0) == rolls(1) && rolls(0) != rolls(2))
  }
}
