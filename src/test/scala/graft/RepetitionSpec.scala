package graft

import org.apache.spark.sql.functions._

import graft.ext.Repetition

/** Hand-computed goldens for the Gopher repetition statistics — every
  * fraction is verified against a by-hand count so the oracle SQL (which
  * mirrors these semantics via unnest + group-by) has a fixed target. */
class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("line stats: dup fraction and dup-char fraction, trim + empty-drop") {
    // lines after trim/drop-empty: ["abc", "abc", "de", "abc"] (4 lines,
    // 2 distinct) -> dup_line_frac = 2/4; "abc" occurs 3x (9 chars dup),
    // total chars = 3+3+2+3 = 11 -> dup_line_char_frac = 9/11
    val df = Seq((1L, "abc\n  abc  \n\n   \nde\nabc")).toDF("doc_id", "text")
    val r = Repetition.withRepetitionStats(df, "text")
      .select("n_lines", "dup_line_frac", "dup_line_char_frac").head()
    assert(r.getInt(0) == 4)
    assert(r.getDouble(1) == 2.0 / 4.0)
    assert(r.getDouble(2) == 9.0 / 11.0)
  }

  test("top n-gram char fraction with smallest-gram tie-break") {
    // toks = [a b a b c a b] -> 2-grams: "a b"x3, "b a"x1, "b c"x1, "c a"x1
    // norm text = "a b a b c a b" (13 chars); top2 = 3*len("a b")=9 -> 9/13
    val df = Seq((1L, "a b a b c a b")).toDF("doc_id", "text")
    val r = Repetition.withRepetitionStats(df, "text")
      .select("top2_char_frac", "top3_char_frac").head()
    assert(r.getDouble(0) == 9.0 / 13.0)
    // 3-grams: "a b a", "b a b", "a b c", "b c a", "c a b" all x1 ->
    // tie at count 1 -> lexicographically smallest is "a b a" (len 5) -> 5/13
    assert(r.getDouble(1) == 5.0 / 13.0)
  }

  test("dup 5-gram char fraction: runs > 1 over total gram chars") {
    // toks = x y z w v x y z w v x y z w v  (15 toks, period 5)
    // 5-grams (11 of them): "x y z w v" x3, the other 4 rotations x2 each
    // every gram has len 9; dup chars = 11*9 (all grams repeat) -> frac 1.0
    val periodic = Seq.fill(3)(Seq("x", "y", "z", "w", "v")).flatten.mkString(" ")
    val df = Seq((1L, periodic), (2L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val r = Repetition.withRepetitionStats(df, "text")
      .orderBy("doc_id").select("dup5_char_frac").collect()
    assert(r(0).getDouble(0) == 1.0)
    assert(r(1).getDouble(0) == 0.0) // 6 distinct 5-grams, all unique
  }

  test("empty / sub-n documents produce zero fractions, no nulls") {
    val df = Seq((1L, ""), (2L, "one"), (3L, "你好")).toDF("doc_id", "text")
    val rows = Repetition.withRepetitionStats(df, "text")
      .select("n_lines", "dup_line_frac", "dup_line_char_frac",
        "top2_char_frac", "top3_char_frac", "dup5_char_frac")
      .collect()
    rows.foreach { r =>
      assert(!r.anyNull)
      (1 to 5).foreach(i => assert(r.getDouble(i) == 0.0))
    }
  }

  test("lexical diversity: TTR and Gini from hand counts") {
    // toks = [a a a b] -> n=4 types=2 sumsq=9+1=10
    // ttr = 2/4; gini = 1 - 10/16 = 0.375
    val df = Seq((1L, "a a a b"), (2L, "x x x x"), (3L, "")).toDF("doc_id", "text")
    val r = Repetition.withLexicalDiversity(df, "text")
      .orderBy("doc_id")
      .select("n_tokens_lex", "n_types", "type_token_ratio", "gini_diversity")
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(r(0) == ((4L, 2L, 0.5, 0.375)))
    assert(r(1) == ((4L, 1L, 0.25, 0.0))) // single type: gini exactly 0
    assert(r(2) == ((0L, 0L, 0.0, 0.0))) // empty doc: zeros, no NaN
  }

  test("gopher filter: clean doc keeps, repetitive doc flagged with reasons") {
    val cleanText = ("the quick brown fox jumps over a lazy dog and then " +
      "runs far away to the hills where it rests in peace for a while now")
    val spamText = Seq.fill(30)("buy cheap pills").mkString("\n")
    val df = Seq((1L, cleanText), (2L, spamText)).toDF("doc_id", "text")
    val r = Repetition.withGopherFilter(df, "text")
      .orderBy("doc_id").select("keep", "reasons").collect()
    assert(r(0).getBoolean(0), s"clean doc dropped: ${r(0).getString(1)}")
    assert(!r(1).getBoolean(0))
    val reasons = r(1).getString(1).split(",").toSet
    assert(reasons.contains("dup_lines"))
    assert(reasons.contains("top3_chars"))
    // reasons list is alphabetical (deterministic for the oracle)
    assert(r(1).getString(1).split(",").toSeq.sorted == r(1).getString(1).split(",").toSeq)
  }

  test("removeRepeatedSpans: hand-computed removal, first occurrence " +
      "survives, clean docs untouched") {
    val df = Seq(
      (1L, "a b c d e a b c d e"),   // exact self-repeat
      (2L, "one two three four five"), // no repeated 3-gram
      (3L, "hi there"),               // shorter than n: no grams
      (4L, "x y x y x y x y"),        // dense overlapping repeats
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = Repetition.removeRepeatedSpans(df, "text", n = 3)
      .select("doc_id", "n_tokens", "n_dup_spans", "n_removed", "clean_text")
      .as[(Long, Int, Int, Int, String)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4, x._5))).toMap
    // doc 1: grams abc..eab + repeat of abc/bcd/cde at 5/6/7 ->
    // covered positions 5..9, the SECOND copy is removed, first kept
    assert(r(1L) == ((10, 3, 5, "a b c d e")))
    assert(r(2L) == ((5, 0, 0, "one two three four five")))
    assert(r(3L) == ((2, 0, 0, "hi there")))
    // doc 4: xyx repeats at 2,4; yxy at 3,5 -> covered 2..7, "x y" left
    assert(r(4L) == ((8, 4, 6, "x y")))
    assert(r(5L) == ((0, 0, 0, "")))
  }
}
