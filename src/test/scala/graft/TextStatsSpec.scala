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

  test("quality classifier: linear logit exact on known features, keep thresholds at 0") {
    // 12 tokens (len_ok=1), 6 stopwords (ratio .5), 0 punct, avg len known
    val good = "the cat and the dog sat on that old mat in peace"
    // junk: no stopwords, all punct noise
    val junk = "@@@ ### $$$ %%% ^^^ &&&"
    val out = TextStats.classifyQuality(
        Seq((1L, good), (2L, junk)).toDF("id", "t"), "t")
      .select("id", "quality_logit", "keep")
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> r).toMap
    val (b, wS, wP, wA, wL) = TextStats.qualityClassifierWeights
    // hand-computed expectation with the SAME association as the impl
    val avgLen = good.split("\\s+").map(_.length).sum.toDouble / 12
    val expGood = b + (wS * 0.5) + (wP * 0.0) + (wA * avgLen) + (wL * 1.0)
    assert(out(1L)._2 == expGood, s"got ${out(1L)._2}, want $expGood")
    assert(out(1L)._3, "clean prose must keep")
    assert(!out(2L)._3, "punctuation junk must drop")
    assert(out(2L)._2 < 0.0)
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

  test("PII redaction: counts and replacement on known strings") {
    val df = Seq(
      ("mail me at a.b+c@ex-ample.org or x@y.io thanks", 2, 0, 0,
        "mail me at <EMAIL> or <EMAIL> thanks"),
      ("call +1 (555) 123-4567 now", 0, 1, 0, "call <PHONE> now"),
      ("server 192.168.0.1 and 10.0.255.7.", 0, 0, 2,
        "server <IP> and <IP>."),
      ("no pii here, just 12345 and a plain sentence.", 0, 0, 0,
        "no pii here, just 12345 and a plain sentence."))
      .toDF("t", "e", "p", "i", "want")
    val got = TextStats.withPiiRedaction(df, "t")
      .select("e", "n_emails", "p", "n_phones", "i", "n_ipv4",
        "want", "redacted")
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(0), s"emails: $r")
      assert(r.getInt(3) == r.getInt(2), s"phones: $r")
      assert(r.getInt(5) == r.getInt(4), s"ips: $r")
      assert(r.getString(7) == r.getString(6), s"redaction: $r")
    }
  }

  test("sourceStats: within-source dup rate, integer-sum ratios, keep verdict") {
    val df = Seq(
      (0L, "the cat sat", "a"), (1L, "the cat sat", "a"),   // exact dup pair
      (2L, "dogs run fast here", "a"),
      (3L, "one doc only", "b"),
      (4L, "the the the word", "b")).toDF("doc_id", "text", "source")
    val r = TextStats.sourceStats(df, "text", "source",
      minDocs = 3, maxDupRate = 0.25)
      .collect().map(x => x.getAs[String]("source") -> x).toMap
    val a = r("a")
    assert(a.getAs[Long]("n_docs") == 3 && a.getAs[Long]("n_distinct") == 2)
    assert(a.getAs[Double]("dup_rate") == 1.0 / 3.0)
    assert(a.getAs[Double]("avg_tokens") == 10.0 / 3.0)
    // stopword share = ratio of sums: 'the' x2 of 10 tokens
    assert(a.getAs[Double]("stop_share") == 2.0 / 10.0)
    assert(!a.getAs[Boolean]("keep")) // dup_rate 0.33 > 0.25
    val b = r("b")
    assert(b.getAs[Double]("dup_rate") == 0.0)
    assert(!b.getAs[Boolean]("keep")) // only 2 docs < minDocs=3
  }

  test("BM25: hand-computed scores on a tiny corpus, decimal-exact sum") {
    val df = Seq(
      (0L, "apple banana apple"),
      (1L, "banana cherry"),
      (2L, "cherry cherry cherry")).toDF("doc_id", "text")
    val r = TextStats.bm25(df, "doc_id", "text", Seq("apple", "cherry"))
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getDouble(2))).toMap
    // N=3 sum_dl=8 avgdl=8/3; k1=1.25 b=0.75 k1+1=2.25 (all binary-exact)
    def term(tf: Long, df: Long, dl: Long): Double =
      (3.0 / df) * (tf * 2.25) /
        (tf + 1.25 * (0.25 + 0.75 * (dl / (8.0 / 3.0))))
    def dec6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r(0L) == ((1L, dec6(term(2, 1, 3)))))          // apple tf=2
    assert(r(1L) == ((1L, dec6(term(1, 2, 2)))))          // cherry tf=1
    assert(r(2L) == ((1L, dec6(term(3, 2, 3)))))          // cherry tf=3
    // doc with no query terms is absent, not zero-scored
    assert(!r.contains(3L) && r.size == 3)
  }

  test("topKeywords ranks doc-frequent corpus-rare tokens first, k-capped") {
    // "zebra" appears 3x in doc 1 only; "common" in all 3 docs
    val df = Seq(
      (1L, "zebra zebra zebra common alpha"),
      (2L, "common beta beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val out = TextStats.topKeywords(df, "doc_id", "text", k = 2)
      .select("id", "tok", "rank").as[(Long, String, Int)].collect()
      .groupBy(_._1).map { case (id, rs) =>
        id -> rs.sortBy(_._3).map(_._2).toSeq }
    // doc 1: zebra (tf=3, df=1, score 9) over alpha (tf=1, df=1, score 3)
    //   over common (tf=1, df=3, score 1)
    assert(out(1L) == Seq("zebra", "alpha"))
    // doc 2: beta (tf=2, df=1, score 6) then common (score 1)
    assert(out(2L) == Seq("beta", "common"))
    // doc 3: gamma (3) then common (1)
    assert(out(3L) == Seq("gamma", "common"))
  }

  test("buildVocab: specials first, frequency rank, minCount gate, cap") {
    val df = Seq((1L, "aa bb aa cc bb aa"), (2L, "bb dd cc")).toDF("id", "text")
    // counts: aa=3 bb=3 cc=2 dd=1(dropped by minCount=2)
    val v = TextStats.buildVocab(df, "text", maxSize = 2, minCount = 2)
      .orderBy("token_id").as[(String, Long, Long)].collect().toSeq
    assert(v.take(4).map(_._1) == Seq("<pad>", "<unk>", "<bos>", "<eos>"))
    assert(v.take(4).map(_._2) == Seq(0L, 1L, 2L, 3L))
    // rank ties (aa=3, bb=3) break token-asc; cap=2 drops cc
    assert(v.drop(4) == Seq(("aa", 4L, 3L), ("bb", 5L, 3L)))
  }

  test("encodeWithVocab: in-vocab ids in order, OOV -> <unk>, empty doc -> empty array") {
    val df = Seq((1L, "aa bb aa cc bb aa"), (2L, "bb dd cc")).toDF("id", "text")
    val vocab = TextStats.buildVocab(df, "text", maxSize = 2, minCount = 2)
    val enc = TextStats.encodeWithVocab(
      df.union(Seq((3L, "")).toDF("id", "text")), "id", "text", vocab)
      .orderBy("id").select("id", "token_ids")
      .as[(Long, Seq[Long])].collect().toSeq
    // vocab: aa=4, bb=5; cc (capped out) and dd (minCount) are OOV -> 1
    assert(enc == Seq(
      (1L, Seq(4L, 5L, 4L, 1L, 5L, 4L)),
      (2L, Seq(5L, 1L, 1L)),
      (3L, Seq.empty[Long])))
  }

  test("collocations: the fixed phrase tops PMI, value matches the " +
      "hand formula, minCount suppresses rare pairs") {
    import graft.ext.TextStats
    // "san francisco" always adjacent; "the" is frequent and promiscuous
    val docs = (
      Seq.fill(6)("san francisco the end") ++
        Seq.fill(6)("the cat saw the dog") ++
        Seq("rare pair") // c12 = 1 -> under minCount, must not appear
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val r = TextStats.collocations(docs, "text", minCount = 5, k = 10)
      .as[(String, String, Long, Double)].collect()
    // "cat saw" shares identical stats (both phrases always adjacent,
    // same frequencies) so it ties; the fixed phrase must sit in the
    // top tie group at the max pmi
    val topPmi = r.head._4
    val topGroup = r.filter(_._4 == topPmi).map(p => (p._1, p._2)).toSet
    assert(topGroup.contains(("san", "francisco")),
      s"fixed phrase must share the top PMI: ${r.toSeq}")
    // hand PMI: c12=6, c(san)=6, c(francisco)=6; tokens Nu=6*4+6*5+2=56,
    // adjacent pairs Nb=6*3+6*4+1=43
    val expected = math.log((6.0 * 56 * 56) / (43.0 * 6 * 6))
    assert(math.abs(r.head._4 - expected) < 1e-5,
      s"pmi formula: got ${r.head._4}, want ~$expected")
    assert(!r.exists(p => p._1 == "rare" || p._2 == "pair"),
      "minCount must suppress the singleton pair")
    r.foreach(p => assert(p._3 >= 5L))
  }

  test("zipfFit: slope ~ -1 with high R^2 on a Zipfian corpus, flat " +
      "corpus degrades to zero slope with null R^2") {
    import graft.ext.TextStats
    // token k gets floor(1600/k) occurrences: ln(c) ~ -1 * ln(rank) + b
    val zipfText = (1 to 16).flatMap(k =>
      Seq.fill(1600 / k)(f"w$k%02d")).mkString(" ")
    val z = TextStats.zipfFit(Seq((1L, zipfText)).toDF("id", "text"), "text")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(z._1 == 16L)
    val slope = z._3.get
    assert(slope > -1.1 && slope < -0.85, s"Zipf slope ~ -1, got $slope")
    assert(z._4.get > 0.98, s"Zipf linearity: R^2 high, got ${z._4}")
    // flat spectrum: every token equally frequent -> ly constant ->
    // slope 0, R^2 NULL (degenerate y-variance, the corrMatrix guard)
    val flatText = (1 to 16).flatMap(k => Seq.fill(100)(f"w$k%02d"))
      .mkString(" ")
    val f = TextStats.zipfFit(Seq((1L, flatText)).toDF("id", "text"), "text")
      .as[(Long, Option[Double], Option[Double], Option[Double])].head()
    assert(math.abs(f._3.get) < 1e-9,
      s"flat spectrum: slope ~0 (decimal-grid residue only), got ${f._3}")
    // y-variance collapses to the decimal-grid residue: R^2 is either
    // NULL (exact-zero deny fires the guard) or indistinguishable from 0
    assert(f._4.forall(r2 => math.abs(r2) < 1e-9),
      s"flat spectrum: no linear relation, got ${f._4}")
  }

  test("packTokenIds: eos separators, fixed windows, short tail, empty doc") {
    import graft.ext.Packing
    val enc = Seq(
      (1L, Seq(10L, 11L, 12L)),
      (2L, Seq.empty[Long]),       // empty doc -> lone eos in the stream
      (3L, Seq(20L, 21L))
    ).toDF("id", "token_ids")
    val got = Packing.packTokenIds(enc, "id", "token_ids",
      contextLen = 4, buckets = 1, eosId = 3L)
      .orderBy("seq_id")
      .select("seq_id", "n_tokens", "token_ids")
      .as[(Long, Int, Seq[Long])].collect().toSeq
    // stream (doc-id order): 10 11 12 3 | 3 20 21 3 -> two full windows
    assert(got == Seq(
      (0L, 4, Seq(10L, 11L, 12L, 3L)),
      (1L, 4, Seq(3L, 20L, 21L, 3L))))
    // short tail: contextLen 3 -> windows of 3,3,2
    val tail = Packing.packTokenIds(enc, "id", "token_ids",
      contextLen = 3, buckets = 1, eosId = 3L)
      .orderBy("seq_id").select("n_tokens").as[Int].collect().toSeq
    assert(tail == Seq(3, 3, 2))
  }

  test("packTokenIds conserves every token: sum of windows == sum of (len+1)") {
    import graft.ext.Packing
    val enc = (1L to 100L).map(i => (i, (0L until (i % 9)).toSeq))
      .toDF("id", "token_ids")
    val packed = Packing.packTokenIds(enc, "id", "token_ids",
      contextLen = 10, buckets = 4)
    val total = packed.agg(sum($"n_tokens")).as[Long].head()
    assert(total == (1L to 100L).map(i => (i % 9) + 1).sum)
    // and every window except each bucket's last is exactly contextLen
    val windows = packed.select("bucket", "seq_id", "n_tokens")
      .as[(Int, Long, Int)].collect().groupBy(_._1)
    windows.values.foreach { ws =>
      val sorted = ws.sortBy(_._2)
      assert(sorted.init.forall(_._3 == 10))
      assert(sorted.last._3 <= 10)
    }
  }

  test("packingEfficiency agrees exactly with materialized packTokenIds") {
    import graft.ext.Packing
    val enc = (1L to 100L).map(i => (i, (0L until (i % 9)).toSeq))
      .toDF("id", "token_ids")
    val packed = Packing.packTokenIds(enc, "id", "token_ids",
      contextLen = 10, buckets = 4)
      .select("bucket", "seq_id", "n_tokens")
      .as[(Int, Long, Int)].collect().groupBy(_._1)
    val report = Packing.packingEfficiency(enc, "id", "token_ids",
      contextLen = 10, buckets = 4)
      .as[(Int, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(report.keySet == packed.keySet, "same buckets observed")
    report.foreach { case (b, (_, nDocs, nTok, nSeqs, nPad, fill)) =>
      val ws = packed(b)
      assert(nSeqs == ws.length.toLong, s"bucket $b: seq count")
      assert(nTok == ws.map(_._3.toLong).sum, s"bucket $b: token total")
      assert(nPad == ws.map(w => 10L - w._3).sum, s"bucket $b: padding " +
        "only in the final short window — report matches materialization")
      assert(math.abs(fill - nTok.toDouble / (nSeqs * 10L)) < 1e-6)
      assert(nDocs > 0 && fill > 0.0 && fill <= 1.0)
    }
  }

  test("packTokenIds is invariant to input partitioning") {
    import graft.ext.Packing
    val enc = (1L to 40L).map(i => (i, (1L to (i % 5)).toSeq))
      .toDF("id", "token_ids")
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packTokenIds(df, "id", "token_ids", contextLen = 7, buckets = 3)
        .select("bucket", "seq_id", "n_tokens", "token_ids")
        .as[(Int, Long, Int, Seq[Long])].collect().toSet
    assert(run(enc.repartition(7)) == run(enc.coalesce(1)))
  }

  test("packSequences: running chunk boundaries, truncation, determinism") {
    import graft.ext.Packing
    // force one bucket so the chunk arithmetic is easy to hand-check
    val df = Seq(
      (1L, Seq.fill(300)("w").mkString(" ")), // 300 toks, cum 300, chunk 0
      (2L, Seq.fill(300)("w").mkString(" ")), // cum 600 -> ends in chunk 1
      (3L, Seq.fill(9999)("w").mkString(" ")), // truncated to 512, cum 1112 -> chunk 2
      (4L, "")) // empty: stays at running position chunk 2
      .toDF("doc_id", "text")
    val out = Packing.packSequences(df, "doc_id", "text",
      contextLen = 512, buckets = 1)
      .orderBy("id").select("id", "n_tok", "cum_tok", "chunk_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, 300L, 300L, 0L), (2L, 300L, 600L, 1L),
      (3L, 512L, 1112L, 2L), (4L, 0L, 1112L, 2L)))
    // bucket assignment is a pure function of the id (not partitioning)
    val b1 = Packing.packSequences(df, "doc_id", "text", 512, 8)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    val b2 = Packing.packSequences(df.repartition(7), "doc_id", "text", 512, 8)
      .select("id", "bucket").as[(Long, Int)].collect().toMap
    assert(b1 == b2)
  }

  test("chunkDocs: overlap boundaries, tail chunk, lossless reconstruction") {
    val toks10 = (0 until 10).map(i => s"t$i").mkString(" ")
    val toks11 = (0 until 11).map(i => s"w$i").mkString(" ")
    val df = Seq((0L, toks10), (1L, toks11), (2L, "a b"), (3L, ""),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = graft.ext.Packing.chunkDocs(df, "doc_id", "text",
      window = 4, stride = 3)
      .orderBy($"id", $"chunk_idx")
      .select($"id", $"chunk_idx", $"n_chunk_tokens", $"chunk_text")
      .collect()
    val byDoc = r.groupBy(_.getLong(0))
    // 10 tokens, w=4 s=3 -> 3 chunks at starts 0,3,6; all width 4
    assert(byDoc(0L).map(_.getString(3)).toSeq == Seq(
      "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9"))
    // 11 tokens -> 4 chunks, tail has 2
    assert(byDoc(1L).length == 4 && byDoc(1L).last.getInt(2) == 2)
    assert(byDoc(1L).last.getString(3) == "w9 w10")
    // short doc: exactly one whole-doc chunk
    assert(byDoc(2L).map(_.getString(3)).toSeq == Seq("a b"))
    // empty and null docs yield no chunks
    assert(!byDoc.contains(3L) && !byDoc.contains(4L))
    // lossless: first `stride` tokens of each non-last chunk + whole last
    for (id <- Seq(0L, 1L)) {
      val chunks = byDoc(id).map(_.getString(3))
      val rebuilt = (chunks.init.map(_.split(" ").take(3).mkString(" ")) :+
        chunks.last).mkString(" ")
      val orig = if (id == 0L) toks10 else toks11
      assert(rebuilt == orig, s"doc $id: $rebuilt")
    }
  }

  test("fingerprints collapse case/punctuation/whitespace variants") {
    val df = Seq("Hello,  World!", "hello world", "different").toDF("t")
    val md5s = df.select(TextStats.fingerprintMd5($"t")).as[String].collect()
    assert(md5s(0) == md5s(1) && md5s(0) != md5s(2))
    val rolls = df.select(TextStats.fingerprintRolling($"t")).as[Long].collect()
    assert(rolls(0) == rolls(1) && rolls(0) != rolls(2))
  }

  test("C4 line filter: each rule fires on its own line; page verdicts") {
    val goodPage = Seq(
      "This opening sentence has more than enough words to pass.",
      "tiny line.",                       // < 5 words -> dropped
      "Enable JavaScript to view the full article content now.", // blocklist
      "no terminal punctuation on this line at all",             // punct
      "Another fine sentence closes out the page quite nicely!",
      "He said \"this quoted ending also counts as terminal.\""  // quote end
    ).mkString("\n")
    val loremPage = goodPage + "\nAnd some Lorem Ipsum filler text appears."
    val bracePage = goodPage + "\nvar config = { mode: 1 };"
    val thinPage = "Only one decent sentence survives on this page today.\nshort.\nugh"
    val df = Seq((1L, goodPage), (2L, loremPage), (3L, bracePage),
      (4L, thinPage), (5L, null.asInstanceOf[String])).toDF("id", "text")
    val r = TextStats.withC4Filter(df, "text")
      .select($"id", $"n_lines", $"n_kept_lines", $"clean_text",
        $"has_lorem", $"has_brace", $"keep_page")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Int]("n_lines") == 6)
    assert(r(1L).getAs[Int]("n_kept_lines") == 3)
    assert(r(1L).getAs[Boolean]("keep_page"))
    assert(r(1L).getAs[String]("clean_text").split("\n").length == 3)
    // lorem page: the lorem line itself is kept (ends in '.'), but the
    // page-level rule drops the whole page
    assert(r(2L).getAs[Boolean]("has_lorem") && !r(2L).getAs[Boolean]("keep_page"))
    assert(r(3L).getAs[Boolean]("has_brace") && !r(3L).getAs[Boolean]("keep_page"))
    // thin page: only 1 kept line < 3 minimum
    assert(r(4L).getAs[Int]("n_kept_lines") == 1 && !r(4L).getAs[Boolean]("keep_page"))
    // null text: empty everything, page dropped, no NPE
    assert(r(5L).getAs[Int]("n_lines") == 0 && !r(5L).getAs[Boolean]("keep_page"))
    assert(r(5L).getAs[String]("clean_text") == "")
  }

  test("stripHtml: tags, script/style blocks, entities, whitespace — and the traps") {
    import org.apache.spark.sql.functions.col
    val cases = Seq(
      (1L, "<p>plain</p>", "plain"),
      // script containing a bare '<' must vanish BEFORE tag stripping
      (2L, "<script>if (1 < 2) x();</script>after", "after"),
      (3L, "<STYLE a=b>p { x }</style>mixed<ScRiPt>\nmulti\nline\n</script>case",
        "mixed case"),
      // &amp;lt; decodes exactly once: to the TEXT "&lt;", never to "<"
      (4L, "a &amp;lt; b &gt; c &quot;q&quot; &#39;s&#39; x&nbsp;y", "a &lt; b > c \"q\" 's' x y"),
      (5L, "  <div> <b>bold</b>\t\ntext </div> ", "bold text"),
      (6L, "no markup at all", "no markup at all"),
      (7L, "<br/><br/>", ""))
      .toDF("id", "html", "expected")
    val out = cases.select(col("id"),
        TextStats.stripHtml(col("html")).as("got"), col("expected"))
      .as[(Long, String, String)].collect()
    out.foreach { case (id, got, exp) =>
      assert(got == exp, s"case $id: got '$got' expected '$exp'")
    }
  }

  test("BPE train: classic corpus learns the hand-derived merge sequence") {
    // Sennrich et al.'s worked example: low x5, lower x2, newest x6,
    // widest x3. Hand-derived greedy merges under the (count DESC,
    // left ASC, right ASC) tie-break:
    //   1. (e,s)  9   [newest 6 + widest 3; ties (s,t) on count, e < s]
    //   2. (es,t) 9
    //   3. (l,o)  7   [ties (o,w); l < o]
    //   4. (lo,w) 7
    //   5. (e,w)  6   [ties (n,e), (w,est); e first]
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextStats.bpeTrain(docs, "text", numMerges = 5)
      .orderBy($"rank")
      .select($"rank", $"left", $"right", $"pair_count")
      .as[(Int, String, String, Long)].collect().toSeq
    assert(merges == Seq(
      (0, "e", "s", 9L), (1, "es", "t", 9L), (2, "l", "o", 7L),
      (3, "lo", "w", 7L), (4, "e", "w", 6L)))
  }

  test("BPE encode: rank-ordered merge application segments unseen words") {
    val text = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" ")
    val train = Seq((1L, text)).toDF("doc_id", "text")
    val merges = TextStats.bpeTrain(train, "text", numMerges = 5)
      .orderBy($"rank").select($"left", $"right")
      .as[(String, String)].collect().toSeq
    // "lowest" is NOT in the training text; merges segment it low|est
    // (l,o w,e,s,t -> es -> est -> lo -> low|est); "newest" -> n|ew|est
    val out = TextStats.bpeEncode(
        Seq((7L, "lowest newest")).toDF("doc_id", "text"),
        "doc_id", "text", merges)
      .as[(Long, Long, Long)].collect().head
    assert(out == ((7L, 2L, 5L)), "low|est (2) + n|ew|est (3) pieces")
  }

  test("WordPiece train: likelihood gain picks the exclusive rare pair " +
      "over the promiscuous frequent one (the criterion BPE inverts)") {
    // "aa" x10, "bc" x4: pair (a,a) has pc=10 but score 10/(20*20) =
    // 0.025; (b,c) has pc=4 but score 4/(4*4) = 0.25 — WordPiece merges
    // (b,c) FIRST, BPE (a,a). Round 1: only (a,a) remains at 10/400.
    val docs = Seq((1L, (Seq.fill(10)("aa") ++ Seq.fill(4)("bc"))
      .mkString(" "))).toDF("doc_id", "text")
    val wp = TextStats.wordPieceTrain(docs, "text", numMerges = 5)
      .orderBy($"rank")
      .as[(Int, String, String, Long, Double)].collect().toSeq
    assert(wp == Seq(
      (0, "b", "c", 4L, 0.25), (1, "a", "a", 10L, 0.025)),
      s"got $wp")
    val bpeFirst = TextStats.bpeTrain(docs, "text", numMerges = 1)
      .select($"left", $"right").as[(String, String)].collect().head
    assert(bpeFirst == (("a", "a")),
      "same corpus, frequency criterion picks the other pair")
  }

  test("WordPiece train: early stop below minPairCount, empty corpus " +
      "yields none") {
    val single = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(TextStats.wordPieceTrain(single, "text", numMerges = 5)
      .count() == 0)
    // one occurrence of each pair: below the minPairCount=2 default
    val rare = Seq((1L, "xy zw")).toDF("doc_id", "text")
    assert(TextStats.wordPieceTrain(rare, "text", numMerges = 5)
      .count() == 0)
  }

  test("BPE train: single-char words exhaust merges early, empty corpus yields none") {
    val single = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    assert(TextStats.bpeTrain(single, "text", numMerges = 5).count() == 0)
    val empty = Seq((1L, "!!!")).toDF("doc_id", "text")
    assert(TextStats.bpeTrain(empty, "text", numMerges = 5).count() == 0)
  }

  test("charEntropy: hand-computed endpoints, normalization folds case " +
      "and punctuation, degenerate docs report zeros") {
    val df = Seq(
      (1L, "aaaa"),            // one symbol: entropy 0
      (2L, "AB, ab!"),         // normalizes to abab: ln 2
      (3L, "abcd"),            // uniform over 4: ln 4
      (4L, "!!! ..."),         // nothing alphanumeric
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextStats.charEntropy(df, "doc_id", "text")
      .as[(Long, Long, Long, Double)].collect()
      .map(x => x._1 -> ((x._2, x._3, x._4))).toMap
    assert(r(1L) == ((4L, 1L, 0.0)))
    assert(r(2L)._1 == 4L && r(2L)._2 == 2L &&
      math.abs(r(2L)._3 - math.log(2)) < 1e-6)
    assert(r(3L)._1 == 4L && r(3L)._2 == 4L &&
      math.abs(r(3L)._3 - math.log(4)) < 1e-6)
    assert(r(4L) == ((0L, 0L, 0.0)))
    assert(r(5L) == ((0L, 0L, 0.0)))
  }

  test("tokenJsDivergence: identical slices score 0, disjoint slices " +
      "approach ln 2, drifted slice ranks above twins, single slice null") {
    val twinA = (1L, "alpha beta gamma delta alpha beta", "a")
    val twinB = (2L, "alpha beta gamma delta alpha beta", "b")
    val alien = (3L, "zeta eta theta iota kappa lambda", "c")
    val js = TextStats.tokenJsDivergence(
      Seq(twinA, twinB, alien).toDF("doc_id", "text", "source"),
      "text", "source", vocabSize = 50)
      .as[(String, Long, Option[Double])].collect()
      .map(r => r._1 -> r._3.get).toMap
    // c shares no token with a+b: JS = ln 2 exactly
    assert(math.abs(js("c") - math.log(2)) < 1e-6, s"disjoint: ${js("c")}")
    // a's complement (b+c) still contains a twin of a -> far below ln 2
    assert(js("a") < js("c") && js("a") > 0)
    assert(js("a") == js("b"), "symmetric twins")
    val single = TextStats.tokenJsDivergence(
      Seq(twinA).toDF("doc_id", "text", "source"), "text", "source")
      .as[(String, Long, Option[Double])].collect()
    assert(single.head._3.isEmpty, "single-slice corpus has no complement")
    // identical distributions: two slices with the same text -> JS 0
    val same = TextStats.tokenJsDivergence(
      Seq(twinA, twinB).toDF("doc_id", "text", "source"),
      "text", "source").as[(String, Long, Option[Double])].collect()
    same.foreach(r => assert(r._3.get == 0.0, s"identical slices: $r"))
  }

  test("ppmiVectors: shared-context words embed closer than unrelated, " +
      "deterministic across partitionings, dims bounded") {
    // cat and dog share contexts (feeds/sleeps); rock shares none
    val rows = (0 until 20).flatMap(i => Seq(
      (i * 4 + 0L, "the cat feeds daily and the cat sleeps nightly"),
      (i * 4 + 1L, "the dog feeds daily and the dog sleeps nightly"),
      (i * 4 + 2L, "a rock erodes slowly under rain under wind"),
      (i * 4 + 3L, "a rock sits inert beside gravel beside sand")))
    val df = rows.toDF("doc_id", "text")
    val v = TextStats.ppmiVectors(df, "text", vocabSize = 30, dims = 8)
      .as[(String, Int, Double)].collect()
    assert(v.map(_._2).distinct.sorted.toSeq.forall(d => d >= 0 && d < 8))
    val byTok = v.groupBy(_._1)
      .map { case (t, rs) =>
        t -> rs.sortBy(_._2).map(_._3)
      }
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum)
      val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    val catDog = cos(byTok("cat"), byTok("dog"))
    val catRock = cos(byTok("cat"), byTok("rock"))
    assert(catDog > catRock,
      s"shared contexts must dominate: cos(cat,dog)=$catDog cos(cat,rock)=$catRock")
    val again = TextStats.ppmiVectors(df.repartition(7), "text",
      vocabSize = 30, dims = 8)
      .as[(String, Int, Double)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq ==
      v.sortBy(r => (r._1, r._2)).toSeq, "partitioning-invariant")
  }

  test("unigramTokenizerTrain: frequent multi-char pieces win the " +
      "Viterbi, coverage never dead-ends, counts weight by frequency, " +
      "deterministic") {
    val docs = Seq(
      (1L, "the data the data banana bandana"),
      (2L, "banana banana band and hand"),
      (3L, "the band and the hand")).toDF("doc_id", "text")
    val out = TextStats.unigramTokenizerTrain(docs, "text",
        vocabSize = 30, maxWordLen = 12, maxPieceLen = 4, topK = 20)
      .as[(String, Long, Double)].collect()
    val use = out.map(r => r._1 -> r._2).toMap
    // "banana" x3 segments as ban|ana and "bandana" as band|ana: the
    // shared pieces out-count any single char in the top usage
    assert(use("ana") == 4L && use("the") == 4L, s"usage: $use")
    assert(use("ban") == 3L && use("band") == 3L, s"usage: $use")
    assert(use.keys.forall(_.nonEmpty))
    // logp ordering follows usage (same smoothing denominator)
    val sorted = out.sortBy(r => (-r._2, r._1))
    assert(out.toSeq == sorted.toSeq, "output ordered (n_use desc, piece)")
    // a word of corpus-rare characters still segments: single chars
    // are always in vocab, so Viterbi cannot dead-end
    val weird = docs.union(Seq((4L, "zqxj")).toDF("doc_id", "text"))
    val w = TextStats.unigramTokenizerTrain(weird, "text",
        vocabSize = 10, maxWordLen = 12, maxPieceLen = 4, topK = 40)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(Seq("z", "q", "x", "j").forall(c => w.getOrElse(c, 0L) >= 1L),
      s"rare chars covered: $w")
    // deterministic across partitionings (the whole chain)
    val again = TextStats.unigramTokenizerTrain(docs.repartition(5),
        "text", vocabSize = 30, maxWordLen = 12, maxPieceLen = 4,
        topK = 20)
      .as[(String, Long, Double)].collect()
    assert(again.toSeq == out.toSeq)
    intercept[IllegalArgumentException] {
      TextStats.unigramTokenizerTrain(docs, "text", vocabSize = 0)
    }
  }

  test("unigramFertility: a slice the vocab fits reads lower fertility " +
      "than one that shatters; accounting; fertility >= 1") {
    // "common" slice dominates training, so its words become whole
    // pieces; the "alien" slice's words never repeat and shatter
    val common = (1L to 12L).map(i =>
      (i, "banana band the data hand banana the data", "common"))
    val alien = (101L to 104L).map(i =>
      (i, s"zq${i}xw jv${i}kp qx${i}zn", "alien"))
    val docs = (common ++ alien).toDF("doc_id", "text", "lang")
    val f = TextStats.unigramFertility(docs, "text", "lang",
        vocabSize = 20, maxWordLen = 12, maxPieceLen = 4)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(f("common")._5 < f("alien")._5,
      s"fitting vocab -> lower fertility: $f")
    assert(f.values.forall(r => r._5 >= 1.0), s"at least 1 piece/word: $f")
    assert(f.values.forall(r => r._4 >= r._3), s"pieces >= tokens: $f")
    assert(f("common")._3 == 12L * 8, s"token accounting: ${f("common")}")
    // determinism across partitionings (two chained Viterbi rounds)
    val again = TextStats.unigramFertility(docs.repartition(5), "text",
        "lang", vocabSize = 20, maxWordLen = 12, maxPieceLen = 4)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(again == f)
  }
  test("lexicalTopK: IDF weighting, stopword df cap, distinct-token " +
      "scoring, self-exclusion, (score desc, id asc) tie-break") {
    // 34 docs so the df cap floor(34 * 0.1) = 3 keeps gem (df 3) and
    // rare/unique (df 2) but drops the stopword "the" (df 34)
    val corpus = ((0L until 30L).map(i => (i, s"the filler$i")) ++ Seq(
      (30L, "the rare unique gem"),
      (31L, "the rare gem"),
      (32L, "the gem gem gem"),      // tf must NOT matter (distinct)
      (33L, "the unique"))).toDF("doc_id", "text")
    val q = Seq((30L, "the rare unique gem")).toDF("doc_id", "text")
    val out = TextStats.lexicalTopK(corpus, q, "doc_id", "text", k = 10)
      .as[(Long, Long, Double, Int)].collect().sortBy(_._4)
    // "the": df 34 > cap 3 -> dropped entirely. Shared-token scores:
    // 31 -> rare(34/2) + gem(34/3); 33 -> unique(34/2); 32 -> gem(34/3)
    assert(out.map(_._2).toSeq == Seq(31L, 33L, 32L), out.toSeq)
    assert(!out.map(_._2).contains(30L), "self excluded")
    assert(math.abs(out(0)._3 - (17.0 + 34.0 / 3)) < 2e-6, out(0))
    // doc 32's repeated "gem" counts once
    assert(math.abs(out(2)._3 - 34.0 / 3) < 2e-6, out(2))
    // pure-filler docs share no kept token and never appear
    assert(out.length == 3, out.toSeq)
  }
  test("fimSplit: segment lengths partition the doc, spans are pure id " +
      "arithmetic, and the segment hashes pin exact token content") {
    import graft.ext.Packing
    def md5h(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val texts = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "one two"),
      (3L, "solo"),
      (4L, ""),
      (5L, "Repeat, repeat! REPEAT repeat repeat six seven eight"))
    val docs = texts.toDF("doc_id", "text")
    val out = Packing.fimSplit(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    texts.foreach { case (id, text) =>
      val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSeq
      val n = toks.size.toLong
      val (a, m) =
        if (n >= 2) {
          val a0 = md5h(id.toString) % n
          (a0, 1L + md5h(id.toString + ":m") % (n - a0))
        } else (n, 0L)
      val r = out(id)
      assert(r._2 == n && r._3 == a && r._4 == m && r._5 == n - a - m,
        s"lengths for $id: $r vs ($n, $a, $m)")
      assert(r._3 + r._4 + r._5 == n, s"partition: $r")
      if (n >= 2) assert(r._4 >= 1, s"non-empty middle: $r")
      val (pre, rest) = toks.splitAt(a.toInt)
      val (mid, suf) = rest.splitAt(m.toInt)
      assert(r._6 == md5h(pre.mkString(" ")), s"pre_h for $id")
      assert(r._7 == md5h(mid.mkString(" ")), s"mid_h for $id")
      assert(r._8 == md5h(suf.mkString(" ")), s"suf_h for $id")
    }
    // determinism: a second run over a reshuffled frame is identical
    val again = Packing.fimSplit(docs.repartition(7), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(again == out, "split is partitioning-invariant")
  }

  test("withCcDetection: Luhn separates real cards from card-shaped " +
      "noise; redaction scrubs every candidate") {
    import graft.ext.TextStats
    val docs = Seq(
      (1L, "pay with 4539 1488 0343 6467 now"),          // valid, spaced
      (2L, "order 1234-5678-9012-3456 shipped"),         // shape ok, Luhn fails
      (3L, "acct 4111111111111111."),                    // valid, bare
      (4L, "short 123456789012 id"),                     // 12 digits: not a candidate
      (5L, "no digits at all"),
      (6L, "two: 4539 1488 0343 6467 and 1234-5678-9012-3456 done"))
      .toDF("doc_id", "text")
    val out = TextStats.withCcDetection(docs, "text")
      .select($"doc_id", $"n_cc_candidates", $"n_cc_valid", $"cc_redacted")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(2L)._2 == 1 && out(2L)._3 == 0, "Luhn rejects the order number")
    assert(out(3L)._2 == 1 && out(3L)._3 == 1)
    assert(out(4L)._2 == 0, "12 digits is below the candidate floor")
    assert(out(5L)._2 == 0 && out(5L)._3 == 0)
    assert(out(6L)._2 == 2 && out(6L)._3 == 1)
    assert(out(1L)._4 == "pay with <CC> now")
    assert(out(6L)._4 == "two: <CC> and <CC> done",
      "every candidate is scrubbed, valid or not")
    assert(out(5L)._4 == "no digits at all")
    // null text reads as empty, not size(null) = -1
    val nulled = TextStats.withCcDetection(
      Seq((9L, Option.empty[String])).toDF("doc_id", "text"), "text")
      .select($"n_cc_candidates", $"n_cc_valid", $"cc_redacted")
      .as[(Int, Int, String)].head()
    assert(nulled == ((0, 0, "")), nulled)
  }

  test("spanCorrupt: stratified spans never overlap, masked+target " +
      "reconstruct the doc, hashes pin both sequences") {
    import graft.ext.Packing
    def md5h(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val texts = Seq(
      (1L, (1 to 40).map(i => s"tok$i").mkString(" ")),   // k = 2
      (2L, "one two three four five six seven eight"),    // n = 8, k = 1
      (3L, "tiny doc here"),                              // n < 8, k = 0
      (4L, ""),                                           // empty
      (5L, (1 to 95).map(i => s"w$i").mkString(" ")))     // k = 4, strat 23
    val docs = texts.toDF("doc_id", "text")
    val out = Packing.spanCorrupt(docs, "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    texts.foreach { case (id, text) =>
      val tk = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split("\\s+").filter(_.nonEmpty).toVector
      val n = tk.size.toLong
      val k = math.max(n / 20, if (n >= 8) 1L else 0L)
      val (masked, target) =
        if (k == 0) (tk, Vector.empty[String])
        else {
          val strat = n / k
          val starts = (0L until k).map(j =>
            j * strat + md5h(s"$id:$j") % (strat - 3))
          // spans must sit in disjoint strata with a gap
          starts.sliding(2).foreach { case Seq(a, b) =>
            assert(b > a + 3, s"non-overlap for $id: $starts")
          case _ => () }
          val m = (0L until k).flatMap { j =>
            val p0 = if (j == 0) 0L else starts(j.toInt - 1) + 3
            tk.slice(p0.toInt, starts(j.toInt).toInt) :+ s"<X$j>"
          }.toVector ++ tk.drop(starts(k.toInt - 1).toInt + 3)
          val t = (0L until k).flatMap { j =>
            s"<X$j>" +: tk.slice(starts(j.toInt).toInt,
              starts(j.toInt).toInt + 3)
          }.toVector
          (m, t)
        }
      val r = out(id)
      assert(r._2 == n && r._3 == k, s"n/k for $id: $r")
      assert(r._4 == masked.size && r._5 == target.size, s"lengths for $id")
      // masked keeps n - 3k tokens + k sentinels; target is 4k long
      assert(r._4 == n - 3 * k + k && r._5 == 4 * k, s"accounting for $id")
      assert(r._6 == md5h(masked.mkString(" ")), s"masked_h for $id")
      assert(r._7 == md5h(target.mkString(" ")), s"target_h for $id")
    }
    val again = Packing.spanCorrupt(docs.repartition(3), "doc_id", "text")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(again == out, "partitioning-invariant")
  }

  test("qualityLangScore: bit-identical columns AND values to the " +
      "withLangId(qualityScore(..)) composition it fuses") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.01/documents.parquet")
    val composed = TextStats.withLangId(
      TextStats.qualityScore(docs, "text"), "text")
    val fused = TextStats.qualityLangScore(docs, "text")
    assert(fused.columns.toSeq == composed.columns.toSeq,
      s"column sets diverge: ${fused.columns.toSeq} vs " +
        s"${composed.columns.toSeq}")
    val key = composed.columns.indexOf("doc_id")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(key) -> r.toSeq).toMap
    assert(rows(fused) == rows(composed),
      "fused pass must reproduce the composition exactly")
    // and only ONE whitespace split survives in the fused plan
    val plan = fused.queryExecution.executedPlan.toString
    val splits = "split\\(".r.findAllIn(plan).size
    val composedSplits = "split\\(".r.findAllIn(
      composed.queryExecution.executedPlan.toString).size
    assert(splits < composedSplits,
      s"fused plan should tokenize less: $splits vs $composedSplits")
  }
}
