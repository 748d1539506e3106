package graft

import org.apache.spark.sql.functions._

import graft.ext.TextStats

/** VERDICT r8 Next #7: the two documented model-quality ceilings
  * (stopword-heuristic langId, BPE-ish token counting) become
  * user-pluggable seams — an external profile/merge TABLE swaps the
  * model without touching engine code, and the shipped heuristics are
  * the defaults. These specs pin (a) default parity: the seam with the
  * shipped profile reproduces the compiled-in path bit-exactly, and
  * (b) liveness: a custom profile/merge table CHANGES verdicts, so the
  * seam demonstrably reaches the decision. */
class ModelSeamSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat and the dog sat on that old mat"), // en stopwords
    (2L, "der Hund ist nicht mit der Katze zu Haus"), // de stopwords
    (3L, "el perro y la casa es un lugar con luz"),   // es stopwords
    (4L, "qwerty zxcvb plmokn"),                      // no hits -> und
    (5L, "le chien est dans la maison avec un chat")  // fr stopwords
  ).toDF("id", "text")

  test("langId seam: default profile reproduces the compiled-in path") {
    val compiled = TextStats.withLangId(docs, "text")
      .select($"id", $"predicted").as[(Long, String)].collect().toMap
    val seam = TextStats.withLangIdProfile(docs, "id", "text",
        TextStats.defaultLangProfile(spark))
      .select($"id", $"predicted").as[(Long, String)].collect().toMap
    assert(seam == compiled)
    assert(compiled(1L) == "en" && compiled(2L) == "de" &&
      compiled(4L) == "und")
  }

  test("langId seam: a custom profile changes verdicts") {
    // a hypothetical external model whose profile claims the tokens of
    // doc 4 for 'xx' and re-labels English function words as 'yy'
    val custom = Seq(
      ("xx", "qwerty"), ("xx", "zxcvb"),
      ("yy", "the"), ("yy", "and"), ("yy", "on")).toDF("lang", "word")
    val out = TextStats.withLangIdProfile(docs, "id", "text", custom)
      .select($"id", $"predicted").as[(Long, String)].collect().toMap
    assert(out(4L) == "xx") // was "und" under the default
    assert(out(1L) == "yy") // was "en" under the default
    assert(out(2L) == "und") // no de words in the custom profile
  }

  test("langId seam: tie-break is (count desc, lang asc), like compiled") {
    val tie = Seq((9L, "alpha beta")).toDF("id", "text")
    val profile = Seq(("zz", "alpha"), ("aa", "beta")).toDF("lang", "word")
    val out = TextStats.withLangIdProfile(tie, "id", "text", profile)
      .select($"predicted").as[String].head()
    assert(out == "aa") // 1 hit each -> lexicographically smallest lang
  }

  test("tokenCount seam: an external merge table changes piece counts") {
    val d = Seq((1L, "banana band")).toDF("id", "text")
    val noMerges = TextStats.tokenCountWithMerges(d, "id", "text",
      Seq.empty[(Int, String, String)].toDF("rank", "left", "right"))
    val r0 = noMerges.select($"n_pieces").as[Long].head()
    assert(r0 == 10L) // character-level: banana 6 + band 4
    // external tokenizer merges: a+n -> 'an', b+an -> 'ban'
    val merges = Seq((0, "a", "n"), (1, "b", "an"))
      .toDF("rank", "left", "right")
    val r = TextStats.tokenCountWithMerges(d, "id", "text", merges)
      .select($"n_words", $"n_pieces").as[(Long, Long)].head()
    assert(r._1 == 2L)
    // banana -> ban|an|a (3), band -> ban|d (2)
    assert(r._2 == 5L)
  }

  test("tokenCount seam: merge-table size guard fails fast") {
    val d = Seq((1L, "ab")).toDF("id", "text")
    val merges = (0 until 4).map(i => (i, s"x$i", "y")).toDF("rank", "left", "right")
    intercept[IllegalArgumentException] {
      TextStats.tokenCountWithMerges(d, "id", "text", merges, maxMerges = 3 - 1)
    }
  }

  // ---- committed fixture tables (VERDICT r9 Next #2) ----------------

  test("committed lang profile: non-default and changes a verdict") {
    val prof = graft.ext.ModelFixtures.langProfileDf(spark)
    // strictly larger vocabulary than the shipped default, valid langs
    assert(prof.count() == 125)
    assert(TextStats.defaultLangProfile(spark).count() == 50)
    val langs = prof.select($"lang").distinct().as[String].collect().toSet
    assert(langs == Set("en", "de", "es", "fr", "zh"))
    // a doc made of profile-only words (absent from the 10-word default
    // lists) flips from 'und' under the default to a verdict under the
    // fixture — the seam demonstrably reaches the decision
    val d = Seq((1L, "it was on this but")).toDF("id", "text")
    val dflt = TextStats.withLangIdProfile(d, "id", "text",
      TextStats.defaultLangProfile(spark))
      .select($"predicted").as[String].head()
    val fix = TextStats.withLangIdProfile(d, "id", "text", prof)
      .select($"predicted").as[String].head()
    assert(dflt == "und" && fix == "en")
  }

  test("committed merge table: real learned merges, applied end-to-end") {
    val m = graft.ext.ModelFixtures.bpeMergesDf(spark)
    assert(m.count() == 24)
    // ranks are dense 0..23 (a real merges file is rank-ordered)
    val ranks = m.select($"rank").as[Int].collect().sorted
    assert(ranks.sameElements(0 until 24))
    // compound merges reference earlier products only (well-formed
    // chain: 'jo'+'in' requires rank 10's 'j'+'o' and rank 1's 'i'+'n')
    val prods = graft.ext.ModelFixtures.bpeMerges
      .scanLeft(Set.empty[String] ++ ('a' to 'z').map(_.toString)) {
        case (acc, (_, l, r)) =>
          assert(acc(l) && acc(r), s"merge ($l,$r) references unseen symbol")
          acc + (l + r)
      }
    assert(prods.last.contains("join") && prods.last.contains("batch"))
    // applying the table contracts: 'join' -> 1 piece, vs 4 chars
    val d = Seq((1L, "join")).toDF("id", "text")
    val r = TextStats.tokenCountWithMerges(d, "id", "text", m)
      .select($"n_pieces").as[Long].head()
    assert(r == 1L)
  }
}
