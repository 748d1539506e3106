package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, TextStats}
import graft.functions.Hashing

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near-dup of 1
    (3L, "completely different content about spark distributed query engines and shuffles"),
    (4L, "The quick brown fox jumps over the lazy dog near the river bank today!"), // exact dup of 1 mod case/punct
    (5L, "unrelated short text")
  ).toDF("doc_id", "text")

  test("exact dedup by fingerprint: case/punctuation-insensitive, min-id survivor") {
    val groups = Dedup.exactByFingerprint(corpus, "doc_id", "text")
    val dup = groups.filter($"n_copies" > 1).collect()
    assert(dup.length == 1)
    assert(dup(0).getAs[Long]("keep_id") == 1L) // 1 and 4 collide, keep min
  }

  test("minhash LSH finds the near-dup pair and not the unrelated docs") {
    val pairs = Dedup.nearDuplicates(corpus, "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // exact dup is trivially near
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("minhashCalibration: exact dups anchor est=jac=1, estimates are " +
      "k-quantized, candidate set matches the LSH path") {
    val r = Dedup.minhashCalibration(corpus, "doc_id", "text")
      .as[(Long, Long, Double, Double, Double)].collect()
    val cands = Dedup.lshCandidates(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(r.map(p => (p._1, p._2)).toSet == cands,
      "one calibration row per LSH candidate pair")
    val exact = r.find(p => (p._1, p._2) == ((1L, 4L))).get
    assert(exact._3 == 1.0 && exact._4 == 1.0 && exact._5 == 0.0,
      s"exact-copy pair must read est=jac=1, err=0: $exact")
    r.foreach { p =>
      assert(p._3 >= 0.0 && p._3 <= 1.0 && p._4 >= 0.0 && p._4 <= 1.0)
      // est is (matching slots)/16 rounded at 6
      val slots = p._3 * 16
      assert(math.abs(slots - math.round(slots)) < 1e-4,
        s"estimate must be a multiple of 1/16: ${p._3}")
      assert(math.abs(p._5 - math.abs(p._3 - p._4)) < 1e-5)
    }
  }

  test("jaccard is exact on known shingle sets") {
    // doc 1 vs doc 2: 12 word-3-shingles each, 11 shared
    val h = corpus.filter($"doc_id".isin(1, 2))
      .select(Dedup.shingleHashes($"text", 3).as("h"))
      .collect().map(_.getSeq[Long](0).toSet)
    val inter = h(0).intersect(h(1)).size.toDouble
    val uni = h(0).union(h(1)).size.toDouble
    assert(inter / uni > 0.7 && inter / uni < 1.0)
  }

  test("prefix-filtered jaccard equals the uncapped inverted-index result (exactness)") {
    // the prefix filter is a pure candidate-pruning step: the final pair
    // set and similarities must be IDENTICAL to the exhaustive
    // inverted-index path with the doc-frequency cap disabled — on the
    // fixture docs AND on the real documents table
    val real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for ((df, t) <- Seq((corpus, 0.5), (real, 0.5), (real, 0.8))) {
      val full = Dedup.jaccardPairs(df, "doc_id", "text", threshold = t,
          maxDocFreq = Int.MaxValue)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      val pref = Dedup.jaccardPairsPrefix(df, "doc_id", "text", threshold = t)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect().toSet
      assert(pref == full,
        s"t=$t missed=${full -- pref} extra=${pref -- full}")
    }
    // exactly-at-threshold regression: B ⊆ A with 28 of A's 35 shingles
    // -> J = 28/35 = 0.8 precisely. A float ceil(0.8*35) = 29 would cut
    // the prefix one short / over-prune the length filter and drop the
    // pair before verification (code-review finding, fixed with the +2
    // prefix and division-form predicates).
    val wsA = (1 to 37).map(i => s"tok$i").mkString(" ") // 35 shingles
    val wsB = (1 to 30).map(i => s"tok$i").mkString(" ") // 28 shingles
    val edge = Seq((1L, wsA), (2L, wsB)).toDF("doc_id", "text")
    val atT = Dedup.jaccardPairsPrefix(edge, "doc_id", "text", threshold = 0.8)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq
    assert(atT == Seq((1L, 2L, 0.8)), s"at-threshold pair lost: $atT")
  }

  test("simhash: identical normalized docs share fingerprints; hamming pairs found") {
    val pairs = Dedup.simhashNearDups(corpus, "doc_id", "text", maxDist = 3)
      .select("id_a", "id_b", "hamming").collect()
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 4L)
    assert(exact.exists(_.getInt(2) == 0), s"1 vs 4 same tokens -> hamming 0: ${pairs.mkString(",")}")
  }

  test("incremental dedup: batch matches index only, novel docs pass, index cap bounds fanout") {
    val index = corpus
    val batch = Seq(
      (101L, "the quick brown fox jumps over the lazy dog near the river bank today"), // copy of 1
      (102L, "entirely novel document about streaming watermark semantics and state")
    ).toDF("doc_id", "text")
    val pairs = Dedup.incrementalNearDups(index, batch, "doc_id", "text",
      threshold = 0.8)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    // the copy matches its original (and its exact-mod-punct twin 4)
    assert(pairs.contains((101L, 1L)) && pairs.contains((101L, 4L)))
    assert(!pairs.exists(_._1 == 102L), s"novel doc flagged: $pairs")
    // batch ids never pair with each other even when near-identical
    val batchDups = batch.union(Seq((103L,
      "entirely novel document about streaming watermark semantics and state"))
      .toDF("doc_id", "text"))
    val p2 = Dedup.incrementalNearDups(index, batchDups, "doc_id", "text",
      threshold = 0.8)
      .select("batch_id", "index_id").as[(Long, Long)].collect().toSet
    assert(!p2.exists(p => p._1 == 102L || p._1 == 103L))
    // cap=0 drops every index bucket -> nothing can match
    assert(Dedup.incrementalNearDups(index, batch, "doc_id", "text",
      threshold = 0.8, maxBucket = 0).isEmpty)
  }

  test("minhash signature matches a hand-rolled reference for one doc") {
    val h = Seq(42L, 7L, 999999L)
    val expected = (0 until 16).map { i =>
      h.map(x => (Hashing.permuteA(i) * (x % Hashing.P) + Hashing.permuteB(i)) % Hashing.P).min
    }
    val got = Seq(Tuple1(h)).toDF("h")
      .select(graft.functions.VectorExprs.minhash_sig($"h", 16)).as[Seq[Long]].head()
    assert(got == expected)
  }

  test("minhash signature of an empty hash array is all-null (HOF/oracle parity)") {
    val native = Seq(Tuple1(Seq.empty[Long])).toDF("h")
      .select(graft.functions.VectorExprs.minhash_sig($"h", 16).as("sig"))
      .collect()(0).getSeq[Any](0)
    val hof = Seq(Tuple1(Seq.empty[Long])).toDF("h")
      .select(Dedup.minhashSignature($"h", 16).as("sig"))
      .collect()(0).getSeq[Any](0)
    assert(native.size == 16 && native.forall(_ == null), s"native=$native")
    assert(native == hof)
  }

  test("LSH banding rejects a signature length that bands do not divide") {
    val hashed = Seq((1L, Seq(1L, 2L))).toDF("id", "h")
    intercept[IllegalArgumentException] {
      Dedup.lshCandidatesFromHashes(hashed, k = 10, bands = 4, maxBucket = 64)
    }
  }

  test("hash64 is stable and non-negative (60-bit)") {
    val v = Seq("a", "b", "a").toDF("s")
      .select(Hashing.hash64($"s")).as[Long].collect()
    assert(v(0) == v(2) && v(0) != v(1) && v.forall(_ >= 0))
  }

  test("native hash64 equals the portable column formula (oracle contract)") {
    val inputs = Seq("", "a", "hello world", "ünïcode ok", "1234567890",
      "the quick brown fox")
    val df = inputs.toDF("s")
    val native = df.select(Hashing.hash64($"s")).as[Long].collect().toSeq
    val formula = df.select(
      conv(substring(md5($"s".cast("string")), 1, 15), 16, 10).cast("long"))
      .as[Long].collect().toSeq
    assert(native == formula)
  }

  test("native char-shingle hashes equal the composed column formula") {
    val df = Seq("hello world example", "ab", "aaaaaaa").toDF("t")
      .select(TextStats.normalized($"t").as("n"))
    val native = df.select(graft.functions.VectorExprs
      .char_shingle_hashes($"n", 5)).as[Seq[Long]].collect().toSeq
    val formula = df.select(
      transform(Dedup.charShinglesOfNormalized($"n", 5),
        s => Hashing.hash64(s))).as[Seq[Long]].collect().toSeq
    assert(native == formula)
  }

  test("native normalize equals the HOF formulation") {
    val df = Seq(Seq(3.0, 4.0), Seq(0.0, 0.0)).toDF("v")
    val native = df.select(graft.functions.VectorExprs.normalize_d($"v"))
      .as[Seq[Double]].collect().toSeq
    assert(native == Seq(Seq(0.6, 0.8), Seq(0.0, 0.0)))
  }

  test("typed corpus pipeline: dedups, filters quality/lang, keeps the Doc type") {
    import graft.ext.{CorpusDoc, CorpusConfig, CorpusPipeline}
    val good = "the quick brown fox jumps over the lazy dog and then it runs " +
      "to the river bank where all of the other animals are waiting for it"
    val ds = Seq(
      CorpusDoc(1L, good),
      CorpusDoc(2L, good + "!"), // exact dup mod punctuation -> dropped (keep 1)
      CorpusDoc(3L, good + " tonight"), // near-dup of 1 -> dropped
      CorpusDoc(4L, "zz qq"), // 2 tokens -> fails the length gate (score 0.3)
      CorpusDoc(5L, "el perro y el gato y la casa y el rio y la luna del " +
        "campo y el sol y la noche y el dia y la tierra y el agua")) // es
      .toDS()
    val out: org.apache.spark.sql.Dataset[CorpusDoc] = CorpusPipeline.clean(ds)
    assert(out.collect().map(_.doc_id).toSet == Set(1L))
    // language filter off: the Spanish doc survives too
    val anyLang = CorpusPipeline.clean(ds, CorpusConfig(lang = None))
    assert(anyLang.collect().map(_.doc_id).toSet == Set(1L, 5L))
  }

  test("prepare pipeline: dedup -> decontaminate -> chunk -> per-source yield") {
    import graft.ext.CorpusPipeline
    val d = Seq(
      (1L, "aa bb cc", "s1"),
      (2L, "aa bb cc", "s1"),        // exact dup of 1 -> dropped
      (3L, "dd ee", "s2"),
      (4L, "leak gram here", "s2"))  // matches the benchmark -> dropped
      .toDF("doc_id", "text", "source")
    val bench = Seq((9L, "leak gram here")).toDF("doc_id", "text")
    val r = CorpusPipeline.prepare(d, "doc_id", "text", "source",
      bench, "text", window = 2, stride = 1)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // s1: doc 1 only, 3 tokens -> chunks "aa bb","bb cc" (2+2 tokens)
    assert(r("s1") == ((1L, 2L, 4L)))
    // s2: doc 3 only, one 2-token chunk
    assert(r("s2") == ((1L, 1L, 2L)))
  }

  test("curate funnel: every stage drops its own defect class, budget binds last") {
    import graft.ext.CorpusPipeline
    val prose = "the cat and the dog sat on that old mat in peace today"
    val secret = (1 to 13).map(i => s"leak$i").mkString(" ")
    val d = Seq(
      (1L, prose, "s1"),
      (2L, "@@@ ### $$$ %%% ^^^ &&&", "s1"),     // classifier junk -> quality
      (3L, prose, "s1"),                          // exact dup of 1 -> dedup
      (4L, s"$prose $secret", "s1"),              // contaminated -> decontam
      (5L, prose + " two", "s1"),                 // survives; budget decides
      (6L, prose + " three", "s1"))
      .toDF("doc_id", "text", "source")
    val bench = Seq((9L, secret)).toDF("doc_id", "text")
    // budget = doc1 (13 tokens) + doc5 (14) = 27; doc 6 (14 more) over
    val r = CorpusPipeline.curate(d, "doc_id", "text", "source",
        bench, "text", budgetTokens = 27L, bucketWidth = 2L)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4), x.getLong(5), x.getLong(6)))
    assert(r.length == 1)
    val (src, nIn, nQ, nU, nC, nK, tok) = r.head
    assert(src == "s1" && nIn == 6)
    assert(nQ == 5, "classifier drops the junk doc")
    assert(nU == 4, "exact dedup drops the copy")
    assert(nC == 3, "decontamination drops the leaked doc")
    assert(nK == 2 && tok == 27L, "budget keeps docs 1+5, cuts doc 6")
  }

  test("winnow fingerprints: kernel matches a naive re-derivation, short/empty degenerate") {
    import graft.functions.ExprKernels
    import org.apache.spark.unsafe.types.UTF8String
    val P = 2147483647L
    def naive(s: String, k: Int, w: Int): Set[Long] = {
      def poly(g: String): Long = g.foldLeft(0L)((h, c) => (h * 31 + c) % P)
      if (s.length < k) Set(poly(s))
      else {
        val gh = (0 to s.length - k).map(i => poly(s.substring(i, i + k)))
        if (gh.length <= w) Set(gh.min)
        else (0 to gh.length - w).map(j => gh.slice(j, j + w).min).toSet
      }
    }
    def kernel(s: String, k: Int, w: Int): Set[Long] = {
      val a = ExprKernels.winnowFingerprints(UTF8String.fromString(s), k, w)
      (0 until a.numElements()).map(a.getLong).toSet
    }
    val samples = Seq("", "ab", "abcdefghijklmnop",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", // constant string: one fingerprint
      "abc abc abc abc abc abc abc abc abc")
    for (s <- samples; (k, w) <- Seq((16, 8), (5, 3))) {
      assert(kernel(s, k, w) == naive(s, k, w), s"mismatch on '$s' k=$k w=$w")
    }
    assert(kernel("", 16, 8) == Set(0L), "empty string fingerprints as [0]")
  }

  test("substring dedup: shared >=23-char span always caught, disjoint text never") {
    // guarantee: shared normalized substring of length >= w+k-1 = 23
    // must yield a shared fingerprint at ANY alignment in either doc
    val span = "zebra quantum voltage crystal" // 29 chars, survives norm
    val d = Seq(
      (1L, s"alpha beta gamma $span delta epsilon"),
      (2L, s"one two three four five six seven $span"),
      (3L, "nothing in common with anyone here at all today ok"),
      (4L, s"alpha beta gamma $span delta epsilon")) // exact dup of 1
      .toDF("doc_id", "text")
    val pairs = Dedup.substringDupPairs(d, "doc_id", "text",
        k = 16, w = 8, maxDocFreq = 64, minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "shared span at different offsets")
    assert(pairs.contains((1L, 4L)) && pairs.contains((2L, 4L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "no false pair")
  }

  test("qualityAgreement: unanimous keeps and hand-built disagreements " +
      "land in the right census cells, shares total 1") {
    import graft.ext.CorpusPipeline
    // fluent + long + varied: all three screens keep it
    val good = "the data pipeline reads and the filters keep what is " +
      "useful because the quality of a corpus is decided by many " +
      "independent screens working together on every single document"
    // repetitive boilerplate but fluent words: gopher flags dup lines,
    // classifier/entropy still pass
    val boiler = (("the offer ends today and you should click here now\n" * 8)
      + "the unique closing line differs")
    // low-entropy structured gibberish: long enough for gopher, but
    // one repeated character dominates the alphabet
    val gibber = ("a" * 400) + " " + good
    val d = Seq((1L, good), (2L, boiler), (3L, gibber))
      .toDF("doc_id", "text")
    val cells = CorpusPipeline.qualityAgreement(d, "doc_id", "text",
        minEntropy = 2.5)
      .as[(Boolean, Boolean, Boolean, Boolean, Long, Double)].collect()
    assert(cells.map(_._5).sum == 3L, "every doc in exactly one cell")
    assert(math.abs(cells.map(_._6).sum - 1.0) < 1e-5, "shares total 1")
    val byCell = cells.map(c => (c._1, c._2, c._3) -> c._5).toMap
    assert(byCell.contains((true, true, true)), s"good doc unanimous: $byCell")
    assert(byCell.keys.exists(k => !k._1 && k._2),
      s"boilerplate: gopher drops what the classifier keeps: $byCell")
    assert(byCell.keys.exists(k => !k._3),
      s"gibberish fails the entropy screen: $byCell")
    cells.foreach(c =>
      assert(c._4 == (c._1 && c._2 && c._3), s"unanimous flag: $c"))
  }

  test("dedupSurvivorsByPolicy: canonical source beats length, length " +
      "breaks within source, ids break last, singletons untouched") {
    import org.apache.spark.sql.functions.{col, struct, concat, lit}
    val d = Seq(
      (1L, "srcX", 500L), (2L, "src0", 100L), // cluster {1,2}
      (3L, "srcY", 80L), (4L, "srcY", 300L), // cluster {3,4}
      (5L, "srcZ", 10L), (6L, "srcZ", 10L), // cluster {5,6}: full tie
      (7L, "srcQ", 1L)) // singleton, not in any pair
      .toDF("doc_id", "source", "n_chars")
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val prio = struct((col("source") === "src0").cast("int").as("p1"),
      col("n_chars").as("p2"))
    val kept = graft.ext.Dedup
      .dedupSurvivorsByPolicy(d, "doc_id", pairs, prio)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L, 7L),
      s"src0 beats longer srcX; longest srcY; min-id on full tie: $kept")
    // contrast: the min-id picker keeps 1, 3, 5 instead
    val minId = graft.ext.Dedup.dedupSurvivors(d, "doc_id", pairs)
      .select("doc_id").as[Long].collect().toSet
    assert(minId == Set(1L, 3L, 5L, 7L), s"min-id baseline: $minId")
    // STRING doc ids work too (the window path has no -id negation):
    // same clusters, ids prefixed — full tie at {d5,d6} keeps min id d5
    val ds = d.select(concat(lit("d"), col("doc_id")).as("doc_id"),
      col("source"), col("n_chars"))
    val pairsS = pairs.select(concat(lit("d"), col("id_a")).as("id_a"),
      concat(lit("d"), col("id_b")).as("id_b"))
    val keptS = graft.ext.Dedup
      .dedupSurvivorsByPolicy(ds, "doc_id", pairsS, prio)
      .select("doc_id").as[String].collect().toSet
    assert(keptS == Set("d2", "d4", "d5", "d7"), s"string ids: $keptS")
  }

  test("dupAttribution: within-source pairs land on the diagonal, " +
      "cross-source off it, canonical source order, clean docs absent") {
    val body = "the quick brown fox jumps over the lazy dog again and " +
      "again until the whole corpus has seen this sentence"
    val d = Seq(
      (1L, "A", body), (2L, "B", body + " tail"), // cross-source near-dup
      (3L, "A", s"$body exactly"), (4L, "A", s"$body exactly"), // within A
      (5L, "C", "completely unrelated content about databases and " +
        "distributed systems running on large clusters"))
      .toDF("doc_id", "source", "text")
    val m = Dedup.dupAttribution(d, "doc_id", "text", "source",
        threshold = 0.5)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(m(("A", "A")) >= 1L, s"within-source diagonal: $m")
    assert(m(("A", "B")) >= 1L, s"cross-source flow: $m")
    assert(!m.keys.exists(k => k._1 == "C" || k._2 == "C"),
      s"the clean source stays out of the matrix: $m")
    assert(m.keys.forall(k => k._1 <= k._2), s"canonical order: $m")
  }

  test("fingerprintNovelty: exact copies read 0, disjoint text reads 1, " +
      "a shared span drags novelty strictly below 1, totals account") {
    val span = "zebra quantum voltage crystal"
    val d = Seq(
      (1L, s"alpha beta gamma $span delta epsilon"),
      (2L, s"one two three four five six seven $span"),
      (3L, "nothing in common with anyone here at all today ok"),
      (4L, s"alpha beta gamma $span delta epsilon")) // exact dup of 1
      .toDF("doc_id", "text")
    val nv = Dedup.fingerprintNovelty(d, "doc_id", "text", k = 16, w = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(nv.size == 4, "every doc gets a score")
    // docs 1 and 4 are identical: every fingerprint of each appears in
    // the other, so nothing is corpus-unique
    assert(nv(1L)._4 == 0.0 && nv(4L)._4 == 0.0, s"exact copies: $nv")
    assert(nv(3L)._4 == 1.0, s"fully disjoint doc is fully novel: $nv")
    // doc 2 shares the span with 1/4 but keeps its own prefix
    assert(nv(2L)._4 > 0.0 && nv(2L)._4 < 1.0, s"partial overlap: $nv")
    nv.values.foreach { r =>
      assert(r._2 >= 1L && r._3 >= 0L && r._3 <= r._2, s"accounting: $r")
    }
    // single-doc corpus: everything it says is novel
    val solo = Dedup.fingerprintNovelty(
      d.filter($"doc_id" === 3L), "doc_id", "text")
      .as[(Long, Long, Long, Double)].head()
    assert(solo._4 == 1.0)
  }

  test("substring dedup: boilerplate fingerprints above maxDocFreq are capped out") {
    val boiler = "standard license header text for everyone"
    val d = (1L to 10L).map(i => (i, s"$boiler unique tail $i"))
      .toDF("doc_id", "text")
    // every fingerprint from the shared prefix sits in all 10 docs ->
    // df cap at 4 suppresses them; unique tails share nothing
    val capped = Dedup.substringDupPairs(d, "doc_id", "text",
      k = 16, w = 8, maxDocFreq = 4, minShared = 1)
    assert(capped.count() == 0, "capped boilerplate must not emit pairs")
    val uncapped = Dedup.substringDupPairs(d, "doc_id", "text",
      k = 16, w = 8, maxDocFreq = 64, minShared = 1)
    assert(uncapped.count() == 45, "all C(10,2) pairs share the header")
  }

  test("cross-split leakage: straddling content reported, within-split dups are not leaks") {
    val d = Seq(
      (1L, "same words here", "train"), (2L, "Same words, here!", "test"), // leak (normalized)
      (3L, "dup in one split", "train"), (4L, "dup in one split", "train"), // not a leak
      (5L, "three way leak", "train"), (6L, "three way leak", "val"),
      (7L, "three way leak", "test"),
      (8L, "clean unique doc", "val"))
      .toDF("doc_id", "text", "split")
    val r = Dedup.crossSplitLeakage(d, "text", "split")
      .as[(String, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r == Map(
      "test+train" -> ((1L, 2L)),
      "test+train+val" -> ((1L, 3L))))
  }

  test("connected components: chains merge, islands stay apart, min-id labels") {
    val edges = Seq(
      (2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), // chain 1..6
      (10L, 11L), // island pair
      (20L, 20L)) // self-loop singleton
      .toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(edges)
      .as[(Long, Long)].collect().toMap
    (1L to 6L).foreach(i => assert(comps(i) == 1L, s"node $i"))
    assert(comps(10L) == 10L && comps(11L) == 10L)
    assert(comps(20L) == 20L)
    assert(comps.size == 9)
    // survivor composition: keep min-id per cluster + unpaired docs
    val docs = (1L to 12L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val kept = Dedup.dedupSurvivors(docs, "doc_id", edges)
      .select("doc_id").as[Long].collect().toSet
    // cluster {1..6} -> keep 1; {10,11} -> keep 10; 20 not in docs;
    // 7,8,9,12 unpaired -> kept
    assert(kept == Set(1L, 7L, 8L, 9L, 10L, 12L))
  }

  test("corpus diff: added/removed/changed by fingerprint, formatting-invariant") {
    val before = Seq(
      (1L, "same doc"), (2L, "will change"), (3L, "will be removed"),
      (4L, "Same,  DOC!?")) // formatting variant of "same doc"
      .toDF("doc_id", "text")
    val after = Seq(
      (1L, "same doc"), (2L, "has changed"), (5L, "brand new"),
      (4L, "same doc")) // formatting-only delta -> fingerprint-equal
      .toDF("doc_id", "text")
    val out = Dedup.corpusDiff(before, after, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    // 4 is ABSENT: its before/after normalize identically (unchanged)
    assert(out == Map(2L -> "changed", 3L -> "removed", 5L -> "added"))
    // null text is a PRESENT empty doc, not an absent id
    val nullBefore = Seq((6L, null: String), (7L, null: String))
      .toDF("doc_id", "text")
    val nullAfter = Seq((6L, "now has text"), (7L, null: String))
      .toDF("doc_id", "text")
    val nd = Dedup.corpusDiff(nullBefore, nullAfter, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(nd == Map(6L -> "changed")) // 7: null -> null = unchanged
    // formatting-only difference = unchanged (fingerprint normalizes)
    val fmt = Dedup.corpusDiff(before,
      Seq((1L, "SAME   doc!"), (2L, "will change"), (3L, "will be removed"),
        (4L, "Same,  DOC!?")).toDF("doc_id", "text"),
      "doc_id", "text").count()
    assert(fmt == 0)
  }

  test("decontamination: 13-gram overlap flags, clean docs pass") {
    val secret = (1 to 13).map(i => s"leak$i").mkString(" ")
    val bench = Seq((100L, s"question preamble $secret answer choices"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"training text containing $secret verbatim plus more words"),
      (2L, "completely unrelated training document with plenty of words " +
        "that never overlap the benchmark thirteen gram at all"),
      (3L, s"$secret")) // exactly the 13 tokens -> one shingle, contained
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long)].collect().toMap
    assert(out.contains(1L) && out(1L) >= 1L)
    assert(out.contains(3L))
    assert(!out.contains(2L))
  }

  test("editVerify: candidate set matches LSH, exact dups at dist 0, " +
      "banding never flips a verdict") {
    val r = Dedup.editVerify(corpus, "doc_id", "text",
        simThreshold = 0.7, prefixLen = 256)
      .as[(Long, Long, Int, Double, Boolean)].collect()
    val cands = Dedup.lshCandidates(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(r.map(p => (p._1, p._2)).toSet == cands,
      "editVerify must score exactly the LSH candidate pairs")
    val byPair = r.map(p => (p._1, p._2) -> p).toMap
    // 1 and 4 are identical after normalization -> distance 0, dup
    val exact = byPair((1L, 4L))
    assert(exact._3 == 0 && exact._4 == 1.0 && exact._5)
    // 1 and 2 differ only in the last word -> small distance, dup
    val near = byPair((1L, 2L))
    assert(near._3 > 0 && near._3 <= 6 && near._5, s"near pair: $near")
    // banded (-1) distances must only occur where the unbounded
    // similarity is below threshold anyway (the bound derivation)
    val texts = corpus.as[(Long, String)].collect().toMap
    def norm(s: String) =
      s.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.take(256)
    r.foreach { case (a, b, dist, _, dup) =>
      val (pa, pb) = (norm(texts(a)), norm(texts(b)))
      val full = org.apache.commons.text.similarity.LevenshteinDistance
        .getDefaultInstance.apply(pa, pb)
      val ml = math.max(pa.length, pb.length)
      val trueDup = ml == 0 || 1.0 - full.toDouble / ml >= 0.7
      assert(dup == trueDup, s"verdict flip on ($a,$b): dist=$dist")
      if (dist >= 0) assert(dist == full, s"unbanded dist mismatch ($a,$b)")
    }
  }

  test("editVerify: two docs normalizing to empty are identical (sim 1)") {
    val cjk = Seq((1L, "中文文档内容"), (2L, "另一个中文文档")).toDF("doc_id", "text")
    val r = Dedup.editVerify(cjk, "doc_id", "text")
      .as[(Long, Long, Int, Double, Boolean)].collect()
    assert(r.length == 1 && r.head._4 == 1.0 && r.head._5,
      s"empty-normalized docs collapse to one bucket and score sim 1: ${r.toSeq}")
  }

  test("decontaminateBloom: exact-confirmed, result identical to the exact path") {
    val secret = (1 to 13).map(i => s"leak$i").mkString(" ")
    val bench = Seq((100L, s"question preamble $secret answer choices"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"training text containing $secret verbatim plus more words"),
      (2L, "completely unrelated training document with plenty of words " +
        "that never overlap the benchmark thirteen gram at all"),
      (3L, s"$secret"))
      .toDF("doc_id", "text")
    val exact = Dedup.decontaminate(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long)].collect().toMap
    val bloom = Dedup.decontaminateBloom(corpus, "doc_id", "text", bench, "text")
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact, "Bloom prefilter must not change the result " +
      s"(exact=$exact bloom=$bloom)")
    // empty benchmark: no contaminated docs, and the empty-build-side
    // fast path must not blow up
    val emptyBench = bench.filter($"doc_id" < 0)
    assert(Dedup.decontaminateBloom(corpus, "doc_id", "text",
      emptyBench, "text").count() == 0L)
  }

  test("containment: full quote scores 1.0 one-way where jaccard stays low") {
    val quoted = (1 to 6).map(i => s"quote$i").mkString(" ") // 4 shingles
    val long = s"a lot of framing text comes first then $quoted and then " +
      "plenty of trailing prose that keeps going for quite a while more"
    val corpus = Seq((1L, quoted), (2L, long),
      (3L, "an unrelated document about something else entirely today"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentPairs(corpus, "doc_id", "text",
        threshold = 0.9, shingleN = 3)
      .select("id_a", "id_b", "containment_ab", "containment_ba")
      .as[(Long, Long, Double, Double)].collect()
    assert(out.length == 1, s"only the quote pair qualifies: ${out.toSeq}")
    val (a, b, cab, cba) = out.head
    assert((a, b) == ((1L, 2L)))
    assert(cab == 1.0, "every shingle of the short doc is in the long one")
    assert(cba < 0.9, "the long doc is NOT contained in the short one")
    // jaccard on the same pair is diluted below any useful threshold
    val j = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.0)
      .filter($"id_a" === 1 && $"id_b" === 2)
      .select("jaccard").as[Double].head()
    assert(j < 0.5, s"union dilution must keep jaccard low, got $j")
  }

  test("contamination report: fraction + verdict, clean docs kept at frac 0") {
    val secret = (1 to 13).map(i => s"leak$i").mkString(" ")
    val bench = Seq((100L, s"question preamble $secret answer choices"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"training text containing $secret verbatim plus more words"),
      (2L, "completely unrelated training document with plenty of words " +
        "that never overlap the benchmark thirteen gram at all"),
      (3L, s"$secret")) // one shingle, fully contained -> frac 1.0
      .toDF("doc_id", "text")
    val out = Dedup.contaminationReport(corpus, "doc_id", "text",
        bench, "text")
      .select("id", "n_grams", "n_contaminated", "contaminated_frac",
        "verdict")
      .as[(Long, Int, Long, Double, String)].collect()
      .map(r => r._1 -> r).toMap
    // every corpus doc appears, including the clean one
    assert(out.keySet == Set(1L, 2L, 3L))
    val (_, g2, c2, f2, v2) = out(2L)
    assert(g2 > 0 && c2 == 0L && f2 == 0.0 && v2 == "keep")
    val (_, g3, c3, f3, v3) = out(3L)
    assert(g3 == 1 && c3 == 1L && f3 == 1.0 && v3 == "drop")
    val (_, g1, c1, f1, v1) = out(1L)
    assert(c1 >= 1L && f1 > 0.0 && f1 < 1.0 && c1 <= g1)
    // doc 1's handful of contaminated grams out of many -> flag or keep
    assert(v1 == "flag" || v1 == "keep")
    // thresholds: frac >= dropFrac wins over flagFrac
    val strict = Dedup.contaminationReport(corpus, "doc_id", "text",
        bench, "text", flagFrac = 0.0, dropFrac = 2.0)
      .select("id", "verdict").as[(Long, String)].collect().toMap
    assert(strict(3L) == "flag") // frac 1.0 < dropFrac 2.0, >= flagFrac 0
  }

  test("line dedup: first occurrence wins corpus-wide, in-doc repeats collapse") {
    val df = Seq(
      (1L, "alpha\nshared nav\nbeta\nalpha"), // "alpha" repeats in-doc
      (2L, "shared nav\ngamma\n  shared nav  "), // loses both nav copies
      (3L, "shared nav")) // loses its only line
      .toDF("doc_id", "text")
    val out = Dedup.lineDedup(df, "doc_id", "text")
      .orderBy("id").collect()
    // doc 1 keeps alpha (first), shared nav (first), beta — not 2nd alpha
    assert(out(0).getAs[String]("cleaned") == "alpha\nshared nav\nbeta")
    assert(out(0).getAs[Int]("n_lines") == 4 && out(0).getAs[Int]("n_kept") == 3)
    // doc 2 keeps only gamma (nav claimed by doc 1, trimmed repeat too)
    assert(out(1).getAs[String]("cleaned") == "gamma")
    assert(out(1).getAs[Int]("n_lines") == 3 && out(1).getAs[Int]("n_kept") == 1)
    // doc 3 loses everything -> empty text, zero kept
    assert(out(2).getAs[String]("cleaned") == "")
    assert(out(2).getAs[Int]("n_lines") == 1 && out(2).getAs[Int]("n_kept") == 0)
  }

  test("erasureAudit: requests flagged, content copies caught, rest retained") {
    val docs = Seq(
      (1L, "the secret document"),
      (2L, "The SECRET document!"), // content copy of 1 (normalizes equal)
      (3L, "unrelated text"),
      (4L, "another doc"),
      (5L, null.asInstanceOf[String]) // null text must not match anything
    ).toDF("doc_id", "text")
    val del = Seq(1L).toDF("doc_id")
    val v = graft.ext.Dedup.erasureAudit(docs, "doc_id", "text", del)
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(v(1L).contains("requested"))
    assert(v(2L).contains("content_copy"), "normalized copy must be flagged")
    assert(v(3L).isEmpty && v(4L).isEmpty, "retained docs carry null")
    assert(v(5L).isEmpty, "null text stays retained unless '' is requested")
  }

  test("substringDedup: run extents exact on constructed overlaps, short " +
      "docs and capped boilerplate excluded, islands split on gaps") {
    // doc 10/11 share a verbatim 7-token run inside different contexts;
    // doc 12 shares the run with 10 TWICE (two islands on two
    // diagonals); doc 13 is under minRun; 14/15 are disjoint content
    val share = "one two three four five six seven"
    val d = Seq(
      (10L, s"alpha beta $share gamma delta epsilon"),
      (11L, s"start $share middle end finish close out"),
      (12L, s"$share filler filler2 filler3 $share"),
      (13L, "tiny doc"), // 2 tokens < minRun
      (14L, "wholly unrelated content about query engines and plans x y"),
      (15L, "different unrelated words concerning storage layers a b c")
    ).toDF("doc_id", "text")
    val r = Dedup.substringDedup(d, "doc_id", "text",
      minRun = 5, maxBucket = 64)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getLong(4))).toMap
    // 10 vs 11: one island, exactly the 7 shared tokens
    assert(r((10L, 11L)) == ((7L, 1L, 3L)), s"got ${r.get((10L, 11L))}")
    // 10 vs 12: the run matches both copies in 12 -> two diagonals
    assert(r((10L, 12L))._1 == 7L && r((10L, 12L))._2 == 2L)
    assert(!r.keySet.exists(p => p._1 == 13L || p._2 == 13L),
      "sub-minRun docs cannot pair")
    assert(!r.keySet.exists(p => p._1 == 14L || p._2 == 14L))
    // a tight bucket cap drops every posting of the shared run
    // (12 emits it twice, 10/11 once each -> bucket of 4-ish > cap 3)
    val capped = Dedup.substringDedup(d, "doc_id", "text",
      minRun = 5, maxBucket = 3).collect()
    assert(!capped.exists(x => x.getLong(0) == 10L && x.getLong(1) == 11L),
      "hot-shingle guard must drop over-cap postings")
  }

  test("substringDupCoverage: overlapping runs collapse, clean docs " +
      "report 0, verdict thresholds at >= flagAt/dropAt") {
    val share = "one two three four five six seven"
    val d = Seq(
      (10L, s"alpha beta $share gamma delta epsilon"), // 12 toks, 7 dup
      (11L, s"start $share middle end finish close out"), // 13 toks, 7 dup
      (12L, s"$share filler filler2 filler3 $share"), // 17 toks, 14 dup
      (14L, "wholly unrelated content about query engines and plans x y"),
      (20L, share) // 7 toks, all dup -> fraction 1.0 -> drop
    ).toDF("doc_id", "text")
    val r = Dedup.substringDupCoverage(d, "doc_id", "text",
      minRun = 5, maxBucket = 64, flagAt = 0.2, dropAt = 0.8)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getString(4))).toMap
    assert(r(10L) == ((12L, 7L, 0.583333, "flag")), s"got ${r(10L)}")
    assert(r(11L) == ((13L, 7L, 0.538462, "flag")), s"got ${r(11L)}")
    // doc 12: both copies of the run covered, overlap-collapsed
    assert(r(12L) == ((17L, 14L, 0.823529, "drop")), s"got ${r(12L)}")
    assert(r(14L) == ((10L, 0L, 0.0, "keep")), s"clean doc: ${r(14L)}")
    assert(r(20L) == ((7L, 7L, 1.0, "drop")), s"got ${r(20L)}")
  }

  test("decontaminateRuns: quote extents exact, positions reported, " +
      "clean docs absent, both-side caps guard boilerplate") {
    val evalItem = "what is the capital of france paris is the capital"
    val corpus = Seq(
      // quotes the full 10-token eval item inside other text
      (1L, s"some intro text $evalItem and a closing remark here"),
      // quotes only 6 tokens of it (below minRun 7)
      (2L, "padding words what is the capital of france more padding x"),
      (3L, "entirely unrelated training content about distributed joins")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, evalItem)).toDF("bench_id", "btext")
    val r = Dedup.decontaminateRuns(corpus, "doc_id", "text",
      bench, "bench_id", "btext", minRun = 7, maxBucket = 64)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getInt(2), x.getInt(3), x.getLong(4))).toMap
    // doc 1: the full 10-token quote, starting at corpus pos 3 / bench 0
    assert(r((1L, 100L)) == ((3, 0, 10L)), s"got ${r.get((1L, 100L))}")
    assert(!r.keySet.exists(_._1 == 2L), "6-token overlap < minRun 7")
    assert(!r.keySet.exists(_._1 == 3L))
  }

  test("substring family edge cases: null/empty text rows survive " +
      "coverage with null fraction -> keep; invalid params refuse") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, null.asInstanceOf[String]),
      (4L, "")
    ).toDF("doc_id", "text")
    val cov = Dedup.substringDupCoverage(d, "doc_id", "text",
      minRun = 5, maxBucket = 64)
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), r.getLong(2), Option(r.get(3)),
          r.getString(4))).toMap
    assert(cov(1L)._4 == "drop" && cov(2L)._4 == "drop",
      "exact 8-token copies are fully covered")
    // null text: token count NULL, fraction NULL, CASE falls to keep —
    // both engines (the oracle mirrors this exact chain)
    assert(cov(3L)._1.isEmpty && cov(3L)._2 == 0L && cov(3L)._4 == "keep")
    // empty text: zero tokens, fraction pinned 0.0
    assert(cov(4L) == ((Some(0L), 0L, Some(0.0), "keep")), s"got ${cov(4L)}")
    intercept[IllegalArgumentException] {
      Dedup.substringDedup(d, "doc_id", "text", minRun = 1)
    }
    intercept[IllegalArgumentException] {
      Dedup.substringDupCoverage(d, "doc_id", "text",
        minRun = 5, flagAt = 0.9, dropAt = 0.2)
    }
  }

  test("removeDuplicatedSpans: min-id side keeps its span, higher-id " +
      "sides excise all covered copies, flanks join, clean docs round-trip") {
    val share = "one two three four five six seven"
    val d = Seq(
      (10L, s"alpha beta $share gamma delta epsilon"),
      (11L, s"start $share middle end finish close out"),
      (12L, s"$share filler filler2 filler3 $share"),
      (14L, "wholly unrelated content about query engines and plans x y")
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(d, "doc_id", "text",
      minRun = 5, maxBucket = 64)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    // doc 10 is the min id of every pair it joins: keeps everything
    assert(r(10L) == ((12L, 0L,
      s"alpha beta $share gamma delta epsilon")), s"got ${r(10L)}")
    // doc 11: the 7-token span (positions 1..7) excised, flanks joined
    assert(r(11L) == ((13L, 7L, "start middle end finish close out")),
      s"got ${r(11L)}")
    // doc 12: BOTH copies covered (positions 0..6 and 10..16)
    assert(r(12L) == ((17L, 14L, "filler filler2 filler3")),
      s"got ${r(12L)}")
    // clean doc: normalized token stream unchanged
    assert(r(14L) == ((10L, 0L,
      "wholly unrelated content about query engines and plans x y")),
      s"got ${r(14L)}")
  }

  test("removeDuplicatedSpans edge cases: null text nulls counts and " +
      "rebuilds empty, empty text round-trips, all-covered doc empties, " +
      "sub-minRun docs untouched") {
    val share = "one two three four five six seven eight"
    val d = Seq(
      (1L, share),                      // min id: keeps everything
      (2L, share),                      // exact copy: fully excised
      (3L, null.asInstanceOf[String]),
      (4L, ""),
      (5L, "tiny doc")                  // 2 tokens < minRun
    ).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(d, "doc_id", "text",
      minRun = 5, maxBucket = 64)
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(1)), Option(x.get(2)), x.getString(3))).toMap
    assert(r(1L) == ((Some(8L), Some(0L), share)), s"got ${r(1L)}")
    assert(r(2L) == ((Some(8L), Some(8L), "")), s"got ${r(2L)}")
    // null text: token counts null on BOTH engines, rebuild ''
    assert(r(3L) == ((None, None, "")), s"got ${r(3L)}")
    assert(r(4L) == ((Some(0L), Some(0L), "")), s"got ${r(4L)}")
    assert(r(5L) == ((Some(2L), Some(0L), "tiny doc")), s"got ${r(5L)}")
  }

  test("incrementalSubstringRuns: batch pairs against the index only — " +
      "index-internal and batch-internal runs are never reported") {
    val share = "one two three four five six seven"
    val index = Seq(
      (1L, s"alpha beta $share gamma"),
      (2L, s"zz $share yy ww vv") // 1-2 share the run: must NOT pair
    ).toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"prefix $share suffix"),
      (101L, s"intro $share outro zz"), // 100-101 share: must NOT pair
      (102L, "unrelated new crawl content entirely here now")
    ).toDF("doc_id", "text")
    val r = Dedup.incrementalSubstringRuns(index, batch, "doc_id", "text",
      minRun = 5, maxBucket = 64)
      .collect().map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2))
      .toMap
    assert(r((100L, 1L)) == 7L && r((100L, 2L)) == 7L, s"got $r")
    assert(r((101L, 1L)) == 7L && r((101L, 2L)) == 7L, s"got $r")
    assert(r.size == 4,
      s"no index x index or batch x batch pair may appear: $r")
    assert(!r.keySet.exists(p => p._1 == 102L),
      "a batch doc with no indexed run must be absent")
  }

  test("rolling hash expression matches a JVM reference implementation") {
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 2147483647L)
    val inputs = Seq("", "a", "hello world", "ünïcode ok")
    val got = inputs.toDF("s").select(Hashing.rolling_hash($"s")).as[Long].collect()
    assert(got.toSeq == inputs.map(ref))
  }
}
