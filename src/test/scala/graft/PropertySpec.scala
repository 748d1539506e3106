package graft

import scala.util.Random

import graft.clean.CleaningAction._
import graft.model.QualityStats
import graft.score.Quality

/** Property-style invariants (SURVEY §5.4) over seeded random inputs —
  * deterministic run-to-run (fixed seeds), 10 trials per property. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def trials[A](gen: Random => A)(check: A => Unit): Unit =
    (0 until 10).foreach { i => check(gen(new Random(1234 + i))) }

  test("T9: dedup output has no duplicates and is a subset of the input") {
    trials(r => List.fill(25)(r.nextInt(6))) { xs =>
      val df = xs.toDF("x")
      val out = DropDuplicates()(df)
      assert(out.count() == xs.distinct.size)
      assert(out.except(df).count() == 0)
    }
  }

  test("T4: clip preserves row count and keeps values within input range") {
    trials(r => List.fill(30)(r.nextDouble() * 2000 - 1000)) { xs =>
      val out = OutlierClip("x")(xs.toDF("x")).select("x").as[Double].collect()
      assert(out.length == xs.length)
      assert(out.max <= xs.max && out.min >= xs.min)
    }
  }

  test("Q1: score in [0,100]; >= 50 when cleaning only removes dirt; monotone") {
    trials(r => (r.nextLong(10000), r.nextLong(10000), r.nextLong(100), r.nextLong(100))) {
      case (nb, na, db, da) =>
        val s = Quality.score(QualityStats(nb, db), QualityStats(na, da))
        assert(s >= 0.0 && s <= 100.0)
        if (na <= nb && da <= db) assert(s >= 50.0)
        assert(Quality.score(QualityStats(nb + 2, db), QualityStats(na, da)) >= s)
    }
  }

  test("T10: date auto-parse never throws; output is yyyy-MM-dd or null") {
    val shapes: Seq[Random => String] = Seq(
      r => Random.javaRandomToRandom(new java.util.Random(r.nextLong())).alphanumeric.take(12).mkString,
      r => f"${r.nextInt(28) + 1}%02d/03/2024",
      _ => "2024-02-30", // invalid date, valid shape
      _ => "", _ => "9999-99-99", _ => "12345678")
    trials(r => List.fill(20)(shapes(r.nextInt(shapes.size))(r))) { xs =>
      val out = DateAutoParse("d")(xs.toDF("d")).as[Option[String]].collect()
      assert(out.length == xs.length)
      assert(out.flatten.forall(_.matches("""\d{4}-\d{2}-\d{2}""")))
    }
  }

  test("minhash signatures are order-invariant over shingle sets") {
    trials(r => List.fill(12)(r.nextLong(Long.MaxValue / 2))) { hs =>
      val sig = (xs: Seq[Long]) => Seq(Tuple1(xs)).toDF("h")
        .select(graft.functions.VectorExprs.minhash_sig($"h", 8)).as[Seq[Long]].head()
      assert(sig(hs) == sig(new Random(99).shuffle(hs)))
    }
  }

  test("T1/T2 row-count contracts: remove drops exactly flagged rows, replace keeps all") {
    trials { r =>
      val base = List.fill(80)(r.nextGaussian() * 10 + 100)
      if (r.nextBoolean()) 100000.0 :: base else base
    } { xs =>
      val df = xs.toDF("x")
      val model = graft.profile.Profiler.zScoreModel(df, "x")
      val flagged = if (model.degenerate) 0L
        else df.filter(model.mask).count()
      assert(OutlierRemove("x")(df).count() == xs.length - flagged)
      assert(OutlierReplaceMedian("x")(df).count() == xs.length)
    }
  }

  test("Repetition: fractions match a brute-force JVM reference on random docs") {
    def brute(text: String): (Double, Double, Double) = {
      val toks = text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim
        .split("\\s+").filter(_.nonEmpty).toSeq
      def grams(n: Int) =
        if (toks.size >= n) toks.sliding(n).map(_.mkString(" ")).toSeq else Nil
      val g2 = grams(2)
      val top2 = if (g2.isEmpty) 0.0 else {
        val counts = g2.groupBy(identity).map { case (g, o) => (g, o.size) }
        val (bg, bc) = counts.toSeq.sortBy { case (g, c) => (-c, g) }.head
        val norm = toks.mkString(" ").length
        if (norm == 0) 0.0 else bc.toLong * bg.length / norm.toDouble
      }
      val g5 = grams(5)
      val d5 = if (g5.isEmpty) 0.0 else {
        val counts = g5.groupBy(identity).map { case (_, o) => o.size }
        val tot = g5.map(_.length).sum.toDouble
        val dup = g5.groupBy(identity).collect {
          case (g, o) if o.size > 1 => o.size.toLong * g.length
        }.sum.toDouble
        if (tot == 0) 0.0 else dup / tot
      }
      val lines = text.split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      val dl = if (lines.isEmpty) 0.0
        else (lines.size - lines.distinct.size).toDouble / lines.size
      (dl, top2, d5)
    }
    trials { r =>
      val vocab = Seq("aa", "bb", "cc", "dd")
      (0 until 4).map { _ =>
        (0 until (r.nextInt(20) + 1))
          .map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
      }.mkString("\n")
    } { text =>
      val row = graft.ext.Repetition
        .withRepetitionStats(Seq((1L, text)).toDF("doc_id", "text"), "text")
        .select("dup_line_frac", "top2_char_frac", "dup5_char_frac").head()
      val (dl, top2, d5) = brute(text)
      assert(row.getDouble(0) == dl, s"dup_line_frac on <$text>")
      assert(row.getDouble(1) == top2, s"top2_char_frac on <$text>")
      assert(row.getDouble(2) == d5, s"dup5_char_frac on <$text>")
    }
  }

  test("lineDedup: every distinct line survives exactly once corpus-wide") {
    trials { r =>
      (1L to 5L).map(i => (i,
        (0 until r.nextInt(6)).map(_ => s"line${r.nextInt(5)}").mkString("\n")))
    } { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = graft.ext.Dedup.lineDedup(df, "doc_id", "text").collect()
      val keptLines = out.flatMap(_.getAs[String]("cleaned").split("\n"))
        .filter(_.nonEmpty).toSeq
      val distinctInput = docs.flatMap(_._2.split("\n").map(_.trim))
        .filter(_.nonEmpty).distinct
      assert(keptLines.sorted == distinctInput.sorted.map(identity),
        "each distinct line exactly once")
      assert(out.map(r => r.getAs[Int]("n_kept")).sum == distinctInput.size)
    }
  }

  test("packSequences: per-bucket cumulative sums and monotone chunk ids") {
    trials { r =>
      (1L to 30L).map(i => (i,
        (0 until r.nextInt(40)).map(_ => "w").mkString(" ")))
    } { docs =>
      val out = graft.ext.Packing
        .packSequences(docs.toDF("doc_id", "text"), "doc_id", "text",
          contextLen = 16, buckets = 4)
        .orderBy("bucket", "id")
        .select("bucket", "n_tok", "cum_tok", "chunk_id")
        .as[(Int, Long, Long, Long)].collect().toSeq
      out.groupBy(_._1).values.foreach { rows =>
        var running = 0L
        var lastChunk = -1L
        rows.foreach { case (_, n, cum, chunk) =>
          running += n
          assert(cum == running, "prefix sum")
          assert(chunk >= lastChunk, "chunks never go backwards")
          lastChunk = chunk
        }
      }
    }
  }

  test("CMS: never underestimates and is exact on a collision-free row " +
      "over random multisets") {
    import org.apache.spark.sql.functions.col
    trials(r => List.fill(80)(r.nextInt(15).toLong)) { keys =>
      val df = keys.toDF("k")
      val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val out = graft.profile.Profiler
        .cmsCounts(df, "k", col("k") >= 0, w = 4, d = 4)
        .as[(Long, Long, Long, Long)].collect()
      assert(out.map(_._1).toSet == exact.keySet)
      out.foreach { case (k, ne, est, over) =>
        assert(ne == exact(k), s"exact count for $k")
        assert(est >= ne && over == est - ne,
          s"CMS must never underestimate: $k -> $est < $ne")
      }
      // and a wide sketch collapses the overestimate to zero here
      val wide = graft.profile.Profiler
        .cmsCounts(df, "k", col("k") >= 0, w = 8192, d = 4)
        .as[(Long, Long, Long, Long)].collect()
      assert(wide.forall(_._4 == 0L), "15 keys in 8192 buckets x 4 rows")
    }
  }

  test("A-ES weighted sample: streamed 2-batch state equals the batch " +
      "window form over random weights and split points") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    trials { r =>
      val rows = (1 to 40).map(i =>
        ("g" + (i % 3), i.toLong, r.nextInt(1000).toLong + 1))
      (rows, 5 + r.nextInt(30))
    } { case (rows, split) =>
      val df = rows.toDF("g", "id", "w")
      val batch = graft.ext.Sampling
        .weightedSample(df, Seq("g"), "id", "w", k = 5)
        .select($"g", $"id").as[(String, Long)].collect().toSet
      val input = MemoryStream[(String, Long, Long)]
      val q = graft.streaming.StreamProfile.streamWeightedSample(
          input.toDS().toDF("g", "id", "w")
            .select(col("g"), col("id"), col("w"),
              graft.ext.Sampling.aesKey(col("id"), col("w")).as("key"))
            .as[graft.streaming.StreamProfile.WSampleRow], k = 5)
        .toDF().writeStream.format("memory")
        .queryName(s"prop_ws_$split").outputMode("update").start()
      try {
        input.addData(rows.take(split): _*)
        q.processAllAvailable()
        input.addData(rows.drop(split): _*)
        q.processAllAvailable()
      } finally q.stop()
      val W = org.apache.spark.sql.expressions.Window
        .partitionBy($"g").orderBy($"n_seen".desc)
      val streamed = spark.table(s"prop_ws_$split")
        .withColumn("__rn",
          org.apache.spark.sql.functions.row_number().over(W))
        .filter($"__rn" === 1)
        .select($"g", org.apache.spark.sql.functions.explode($"ids").as("id"))
        .as[(String, Long)].collect().toSet
      assert(streamed == batch,
        s"split at $split diverged: $streamed vs $batch")
    }
  }

  test("bounded quantile windows always contain the exact lower quantile " +
      "over random grids") {
    trials(r => List.fill(60)(("g" + r.nextInt(2), r.nextInt(40).toLong))) { xs =>
      val df = xs.toDF("g", "v")
      val exact = graft.profile.NumericProfile
        .quantilePanel(df, "v", "g", qs = Seq(0.5))
        .as[(String, Long, Long)].collect().map(x => x._1 -> x._3).toMap
      val gate = graft.profile.NumericProfile
        .quantilePanelBounded(df, "v", "g", qs = Seq(0.5))
        .collect().map { row =>
          row.getAs[String]("g") ->
            ((row.getAs[Long]("lo50"), row.getAs[Long]("hi50"),
              row.getAs[Boolean]("ok_p50")))
        }.toMap
      gate.foreach { case (g, (lo, hi, ok)) =>
        assert(lo <= exact(g) && exact(g) <= hi,
          s"window [$lo, $hi] must contain the exact p50 ${exact(g)}")
        assert(ok, "sub-accuracy sketch is exact, must pass the gate")
      }
    }
  }

  test("substringDedup: max_run_tokens equals the brute-force longest " +
      "common token substring on random near-dup docs (guard off)") {
    // reference: O(n*m) LCS-of-tokens DP
    def lcs(a: Array[String], b: Array[String]): Int = {
      val dp = Array.ofDim[Int](a.length + 1, b.length + 1)
      var best = 0
      for (i <- 1 to a.length; j <- 1 to b.length)
        if (a(i - 1) == b(j - 1)) {
          dp(i)(j) = dp(i - 1)(j - 1) + 1
          if (dp(i)(j) > best) best = dp(i)(j)
        }
      best
    }
    val L = 4
    trials { r =>
      // small token alphabet + a planted shared segment => rich run
      // structure (multiple diagonals, overlaps, repeats)
      def doc(n: Int): Array[String] =
        Array.fill(n)("w" + r.nextInt(8))
      val shared = doc(L + r.nextInt(6))
      val d1 = doc(r.nextInt(10)) ++ shared ++ doc(r.nextInt(10))
      val d2 = doc(r.nextInt(10)) ++ shared ++ doc(r.nextInt(10))
      val d3 = doc(12 + r.nextInt(8))
      Seq(1L -> d1, 2L -> d2, 3L -> d3)
    } { ds =>
      val df = ds.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = graft.ext.Dedup
        .substringDedup(df, "doc_id", "text",
          minRun = L, maxBucket = Int.MaxValue)
        .collect()
        .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
      val byId = ds.toMap
      for (a <- Seq(1L, 2L, 3L); b <- Seq(1L, 2L, 3L) if a < b) {
        val expect = lcs(byId(a), byId(b))
        val reported = got.getOrElse((a, b), 0L)
        if (expect >= L)
          assert(reported == expect,
            s"pair ($a,$b): reported $reported vs brute-force LCS $expect " +
              s"docs=${byId(a).mkString(" ")} | ${byId(b).mkString(" ")}")
        else
          assert(reported == 0L,
            s"pair ($a,$b): sub-minRun LCS $expect must not pair")
      }
    }
  }

  test("removeDuplicatedSpans: rebuilt corpus has NO cross-doc run >= " +
      "minRun (guard off), each planted span survives in exactly one doc") {
    import org.apache.spark.sql.functions.col
    val L = 5
    var uniq = 0
    trials { r =>
      // diverse vocab (fresh token per draw) so post-excision flank
      // joins cannot coincidentally re-form a run; two planted spans
      // crossing three docs exercise the multi-pair excision chains
      def doc(n: Int): Array[String] =
        Array.fill(n) { uniq += 1; s"u${r.nextInt(100000)}n$uniq" }
      val shared = doc(L + r.nextInt(8))
      val shared2 = doc(L + r.nextInt(5))
      val d1 = doc(3 + r.nextInt(6)) ++ shared ++ doc(3 + r.nextInt(6))
      val d2 = doc(3 + r.nextInt(6)) ++ shared ++ doc(2) ++ shared2
      val d3 = shared2 ++ doc(4 + r.nextInt(6)) ++ shared
      val d4 = doc(10 + r.nextInt(5))
      (Seq(1L -> d1, 2L -> d2, 3L -> d3, 4L -> d4), shared, shared2)
    } { case (ds, shared, shared2) =>
      val df = ds.map { case (id, ts) => (id, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val out = graft.ext.Dedup.removeDuplicatedSpans(
        df, "doc_id", "text", minRun = L, maxBucket = Int.MaxValue)
      val rows = out.collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
      // self-consistency: removed = n_tokens - |rebuilt tokens|
      ds.foreach { case (id, ts) =>
        val kept = rows(id)._3.split(" ").filter(_.nonEmpty)
        assert(rows(id)._1 == ts.length &&
          rows(id)._2 == ts.length - kept.length, s"doc $id: ${rows(id)}")
      }
      // the Lee et al. postcondition: no cross-doc verbatim run >= L
      // survives in the rebuilt corpus
      val residual = graft.ext.Dedup.substringDedup(
        out.select(col("doc_id"), col("text_deduped").as("text")),
        "doc_id", "text", minRun = L, maxBucket = Int.MaxValue).count()
      assert(residual == 0L,
        s"rebuilt corpus still has cross-doc runs: ${rows.values}")
      // exactly one canonical copy of each planted span survives
      def holders(span: Array[String]): Seq[Long] =
        rows.toSeq.collect { case (id, (_, _, txt))
          if txt.split(" ").sliding(span.length)
            .exists(_.sameElements(span)) => id }.sorted
      assert(holders(shared) == Seq(1L),
        s"span must survive only in min-id doc 1: ${holders(shared)}")
      assert(holders(shared2) == Seq(2L),
        s"span2 must survive only in min-id doc 2: ${holders(shared2)}")
    }
  }
}
