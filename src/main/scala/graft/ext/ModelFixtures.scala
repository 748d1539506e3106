package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Committed external-model fixture tables for the two pluggable model
  * seams (VERDICT r9 Next #2) — the tables a REAL deployment would drop
  * into [[TextStats.withLangIdProfile]] and
  * [[TextStats.tokenCountWithMerges]], shipped as data so the oracle
  * faces q_lang_id_profile / q_token_count_merges exercise the seams
  * with NON-DEFAULT inputs end-to-end (Spark and DuckDB both read the
  * same literals).
  *
  * Both tables are deliberately different from the compiled-in defaults
  * ([[TextStats.langStopwords]]'s 10 words/language; the whitespace /
  * BPE-ish token counters): a green oracle row through these proves the
  * seam path — broadcast profile join, vocab-bounded merge collect,
  * distributed distinct-word BPE fold — not the default shortcut.
  */
object ModelFixtures {

  /** Top function words per language, ~25 each — the head of the public
    * word-frequency lists for each language (the Leipzig-corpora /
    * wordfreq class of lists; function words dominate every such list,
    * which is exactly why they are the standard language-ID profile).
    * 2.5x the shipped default's vocabulary and a strict superset in
    * spirit but NOT in content (e.g. the default's en list lacks "it",
    * "was", "on"; de lacks "den", "im"), so verdicts can differ from
    * [[TextStats.withLangId]] — ModelSeamSpec pins that they do on at
    * least one fixture document. */
  val langProfile: Seq[(String, String)] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "a", "is", "that", "it",
      "was", "for", "on", "are", "with", "as", "be", "at", "by", "this",
      "have", "from", "or", "not", "but", "what"),
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das",
      "mit", "sich", "des", "auf", "ist", "im", "dem", "nicht", "ein",
      "eine", "als", "auch", "es", "an", "werden", "aus", "er"),
    "es" -> Seq("de", "la", "que", "el", "en", "y", "a", "los", "se",
      "del", "las", "un", "por", "con", "no", "una", "su", "para", "es",
      "al", "lo", "como", "pero", "sus", "le"),
    "fr" -> Seq("de", "la", "le", "et", "les", "des", "en", "un", "du",
      "une", "que", "est", "pour", "qui", "dans", "a", "par", "plus",
      "pas", "au", "sur", "ne", "se", "ce", "il"),
    "zh" -> Seq("的", "一", "是", "在", "不", "了", "有", "和", "人",
      "这", "中", "大", "为", "上", "个", "国", "我", "以", "要", "他",
      "时", "来", "用", "们", "生")
  ).flatMap { case (l, ws) => ws.map(w => (l, w)) }

  def langProfileDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    langProfile.toDF("lang", "word")
  }

  /** A real learned BPE merge table, frozen as data — the deployment
    * shape of every production tokenizer (train once, ship merges.txt,
    * apply everywhere). Learned by [[TextStats.bpeTrain]] (numMerges=24,
    * minPairCount=2) on the sf0.01 fixture corpus and verified bit-exact
    * against the DuckDB-unrolled training oracle (q_bpe_train) before
    * committing; q_token_count_merges then applies THIS committed table
    * at every scale — including scales where training would have learned
    * different merges — which is precisely what distinguishes an
    * external model table from the in-pipeline trainer. */
  val bpeMerges: Seq[(Int, String, String)] = Seq(
    (0, "e", "r"), (1, "i", "n"), (2, "o", "w"), (3, "o", "r"),
    (4, "s", "t"), (5, "m", "er"), (6, "a", "t"), (7, "l", "u"),
    (8, "a", "r"), (9, "p", "ar"), (10, "j", "o"), (11, "jo", "in"),
    (12, "a", "s"), (13, "as", "h"), (14, "h", "ash"), (15, "r", "ow"),
    (16, "at", "c"), (17, "atc", "h"), (18, "b", "atch"), (19, "a", "n"),
    (20, "c", "an"), (21, "s", "can"), (22, "c", "o"), (23, "c", "u"))

  def bpeMergesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    bpeMerges.toDF("rank", "left", "right")
  }

  /** A REALISTIC-SIZE language profile, generated deterministically
    * (VERDICT r10 Next #6): production language-ID word profiles are
    * 10k-100k entries per language (the wordfreq / Leipzig-corpora
    * class of lists), not the 25-word heads above, and the seam's
    * "profile broadcasts, documents never shuffle" claim deserves
    * exercise at that size. Vendoring 50k real words is neither
    * possible offline nor necessary — the PLAN depends only on profile
    * cardinality — so each language gets its [[langProfile]] head words
    * plus synthetic stem+suffix inflections from language-typical
    * suffix families over deterministic CV-syllable stems (sorted
    * combinatorics, no RNG: any engine regenerates the identical list).
    * Shape fixture only — the synthetic tail must NOT match real text
    * (quality claims stay with the committed [[langProfile]]), so every
    * generated word carries a reserved "qu" prefix ahead of two CV
    * syllables: 6+ characters of fixed structure no fixture token
    * shares (first cut of this generator emitted bare CV-CV stems and
    * "da"+"ta" = "data" silently flipped 20 fixture verdicts —
    * ModelSeamSpec pins the no-perturbation invariant). */
  def syntheticLangProfile(spark: SparkSession,
      wordsPerLang: Int = 10000): DataFrame = {
    import spark.implicits._
    val suffixes: Map[String, Seq[String]] = Map(
      "en" -> Seq("", "s", "ed", "ing", "er", "est", "ly", "ness",
        "ment", "tion"),
      "de" -> Seq("", "en", "er", "es", "em", "ung", "heit", "keit",
        "lich", "isch"),
      "es" -> Seq("", "s", "es", "ar", "ado", "ida", "osa", "ciones",
        "mente", "amos"),
      "fr" -> Seq("", "s", "e", "es", "ez", "ait", "tions", "ment",
        "eur", "euse"),
      "zh" -> Seq("", "的", "了", "是", "在", "有", "人", "中", "大",
        "上"))
    // deterministic stem pool: CV + CVC syllable pairs, enough for
    // wordsPerLang / |suffixes| stems at any requested size
    val cs = "bcdfglmnprstvz"
    val vs = "aeiou"
    val syl = for (c <- cs; v <- vs) yield s"$c$v"
    val stems = (for (a <- syl; b <- syl) yield s"qu$a$b").sorted
    val rows = suffixes.toSeq.sortBy(_._1).flatMap { case (lang, sfx) =>
      val head = langProfile.collect { case (l, w) if l == lang => w }
      val need = math.max(0, wordsPerLang - head.size)
      val stemCount = (need + sfx.size - 1) / sfx.size
      val gen = stems.take(stemCount)
        .flatMap(st => sfx.map(su => s"$st$su"))
        .distinct.take(need)
      (head ++ gen).map(w => (lang, w))
    }
    rows.toDF("lang", "word")
  }
}
