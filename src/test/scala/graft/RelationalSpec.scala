package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions.levenshtein

import graft.ext.Relational

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asof join picks the latest right row at-or-before each left row, per key") {
    val trades = Seq(
      (1L, 7L, ts("2024-01-01 10:00:05")),
      (2L, 7L, ts("2024-01-01 10:00:30")),
      (3L, 9L, ts("2024-01-01 10:00:10")))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (101L, 7L, ts("2024-01-01 10:00:00")),
      (102L, 7L, ts("2024-01-01 10:00:05")), // exactly at trade 1 -> included
      (103L, 7L, ts("2024-01-01 10:00:20")),
      (104L, 8L, ts("2024-01-01 09:00:00"))) // wrong key
      .toDF("event_id", "sym", "ts")
    val out = Relational.asofJoin(trades, quotes, "sym", "ts", Seq("event_id"))
      .orderBy("trade_id")
      .select("trade_id", "asof_event_id").collect()
    assert(out(0).getLong(0) == 1L && out(0).getLong(1) == 102L) // tie included
    assert(out(1).getLong(0) == 2L && out(1).getLong(1) == 103L) // latest prior
    assert(out(2).getLong(0) == 3L && out(2).isNullAt(1))        // no quote for sym 9
  }

  test("asof join carries the latest right row WHOLE — a null field is not back-filled from an older row") {
    val trades = Seq((1L, 7L, ts("2024-01-01 10:00:30")))
      .toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      (Some(101L), 7L, ts("2024-01-01 10:00:00")),
      (None, 7L, ts("2024-01-01 10:00:20"))) // latest row has a NULL field
      .toDF("event_id", "sym", "ts")
    val out = Relational.asofJoin(trades, quotes, "sym", "ts",
      Seq("event_id", "ts")).head()
    // latest right row (10:00:20) wins as a unit: its null event_id must
    // NOT be replaced by 101 from the older row
    assert(out.isNullAt(out.fieldIndex("asof_event_id")))
    assert(out.getAs[ts0]("asof_ts") == ts("2024-01-01 10:00:20"))
  }
  private type ts0 = java.sql.Timestamp

  test("sample data stays valid for small n (defects injected only where they fit)") {
    val df = graft.io.SampleData.load(spark, n = 30)
    assert(df.count() == 30) // indices 50+ skipped, no crash
  }

  test("char near-dup excludes docs that normalize to empty (CJK guard)") {
    val docs = Seq((1L, "完全不同的文档一"), (2L, "另一个不同的文档"),
      (3L, "the quick brown fox jumps over the dog"),
      (4L, "The quick brown fox jumps over the dog!"))
      .toDF("doc_id", "text")
    val pairs = graft.ext.Dedup.nearDuplicatesChar(docs, "doc_id", "text",
      threshold = 0.6).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((3L, 4L)), s"CJK docs must not pair: $pairs")
  }

  test("salted join equals the plain join and salts the shuffle keys") {
    val big = Seq((1L, 10L), (2L, 10L), (3L, 10L), (4L, 20L))
      .toDF("row_id", "k") // hot key 10
    val dim = Seq((10L, "ten"), (20L, "twenty"), (30L, "thirty"))
      .toDF("k", "label")
    val salted = Relational.saltedJoin(big, dim, "k", salts = 4,
      saltExpr = $"row_id")
    val plain = big.join(dim, Seq("k"))
    assert(salted.select("row_id", "k", "label").as[(Long, Long, String)]
      .collect().toSet ==
      plain.select("row_id", "k", "label").as[(Long, Long, String)]
        .collect().toSet)
    // NULL salt source must not drop rows (contract: == unsalted join)
    val bigN = Seq((Some(1L), 10L), (None, 10L), (None, 20L))
      .toDF("salt_src", "k")
    val saltedN = Relational.saltedJoin(bigN, dim, "k", salts = 4,
      saltExpr = $"salt_src")
    assert(saltedN.count() == 3, "rows with NULL saltExpr must survive")
    // plan evidence: a real shuffle join (not broadcast) whose join keys
    // include the salt — the hot key spreads over `salts` reducers
    salted.count() // materialize so AQE finalizes the plan
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected shuffle join:\n$plan")
    assert(plan.contains("__salt"), s"expected salted join keys:\n$plan")
  }

  test("AQE splits a skewed shuffle-join partition at runtime (skew=true)") {
    // The runtime companion to saltedJoin: when the join IS sort-merge,
    // AQE can split oversized partitions without any rewrite. Tiny
    // thresholds make the 90%-hot key trip the detector at test scale.
    val restore = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.forceOptimizeSkewedJoin",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1KB")
      spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      import org.apache.spark.sql.functions.{col, when => cwhen}
      val big = spark.range(0, 50000)
        .select(cwhen(col("id") % 10 === 0, col("id") % 100)
          .otherwise(0L).as("k"), col("id").as("v")) // ~90% of rows on key 0
      val dim = spark.range(0, 100).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = big.join(dim, "k")
      // collect() drives joined's OWN QueryExecution, so the plan below
      // is the AQE-final one (count() would spawn a separate execution)
      assert(joined.collect().length == 50000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split in final plan:\n$plan")
    } finally restore.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom semi join equals the plain semi join, including empty build side") {
    val big = (1L to 200L).map(i => (i, s"v$i")).toDF("k", "payload")
    val small = Seq(3L, 7L, 7L, 150L, 999L).toDF("k")
    val expected = big.join(small.distinct(), Seq("k"), "left_semi")
      .as[(Long, String)].collect().toSet
    val got = Relational.bloomSemiJoin(big, small, "k", expectedItems = 16)
      .as[(Long, String)].collect().toSet
    assert(got == expected && got.map(_._1) == Set(3L, 7L, 150L))
    // tiny expectedItems -> high FPP: exactness must still hold (the
    // final semi join re-checks bloom false positives)
    val crowded = Relational.bloomSemiJoin(big, small, "k", expectedItems = 1)
      .as[(Long, String)].collect().toSet
    assert(crowded == expected)
    // empty build side -> empty result, same schema
    val none = Relational.bloomSemiJoin(big, small.filter($"k" < 0), "k")
    assert(none.columns.toSeq == big.columns.toSeq && none.count() == 0)
  }

  test("key-skew report: hottest keys first, ratio = multiple of mean frequency") {
    val rows = Seq.fill(4)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d")
    val df = rows.zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "payload")
    val out = Relational.keySkewReport(df, Seq("k"), topK = 2)
      .select("k", "n_rows", "n_keys", "n_total", "skew_ratio")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // mean frequency = 8/4 = 2 rows/key: a is 2x the mean, b is 1x
    assert(out == Seq(("a", 4L, 4L, 8L, 2.0), ("b", 2L, 4L, 8L, 1.0)))
    // deterministic tie-break on the key when counts tie
    val tied = Relational.keySkewReport(df, Seq("k"), topK = 4)
      .select("k").as[String].collect().toSeq
    assert(tied == Seq("a", "b", "c", "d"))
  }

  test("fuzzyJoin equals the brute-force cross join on random-ish strings") {
    // deterministic pseudo-random word soup: every true pair within
    // distance 2 must survive blocking (completeness) and none beyond
    val words = (0 until 60).map { i =>
      val base = s"w${i % 7}rd${i % 5}x${i % 3}"
      (i.toLong, base.drop(i % 3)) // vary lengths too
    }
    val left = words.toDF("lid", "lv")
    val right = words.map { case (i, w) => (i + 1000, w.reverse) }
      .toDF("rid", "rv")
    val fast = Relational.fuzzyJoin(left, right, "lid", "lv", "rid", "rv",
      maxDist = 2, maxBucket = 100000)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    val brute = left.crossJoin(right)
      .filter(levenshtein($"lv", $"rv") <= 2)
      .select($"lid", $"rid").as[(Long, Long)].collect().toSet
    assert(fast == brute, s"missing=${brute -- fast} extra=${fast -- brute}")
  }

  test("joinAdvisor: broadcast, salted and sort-merge branches with exact stats") {
    val uniform = (1L to 100L).map(k => (k, "x")).toDF("k", "v")
    val tiny = Seq((1L, "d")).toDF("k", "d")
    // broadcast: one side under the row cap
    val b = Relational.joinAdvisor(uniform, tiny, "k",
      broadcastMaxRows = 10L)
      .select("recommendation", "right_rows").as[(String, Long)].head()
    assert(b == (("broadcast", 1L)))
    // salted: a hot key holding half of one side; cap forces non-broadcast
    val hot = ((1L to 50L).map(_ => 7L) ++ (1L to 50L)).map((_, "x"))
      .toDF("k", "v")
    val s = Relational.joinAdvisor(hot, uniform, "k",
      broadcastMaxRows = 0L, skewRatio = 8.0)
      .select("recommendation", "salts", "left_max_key_rows")
      .as[(String, Option[Int], Long)].head()
    // hottest key: 7 appears 51x of 100 rows over 50 distinct keys
    // -> ratio 51*50/100 = 25.5 -> 26 salts
    assert(s == (("salted_sort_merge", Some(26), 51L)))
    // sort-merge: big-ish uniform sides, no skew
    val m = Relational.joinAdvisor(uniform, uniform, "k",
      broadcastMaxRows = 0L)
      .select("recommendation", "left_skew_ratio").as[(String, Double)].head()
    assert(m == (("sort_merge", 1.0)))
  }

  test("scdMerge: close+append, no-op, insert, passthrough, latest-wins") {
    val dim = Seq(
      // closed history: must pass through untouched
      ("A", "old", ts("2019-01-01 00:00:00"), ts("2020-01-01 00:00:00")),
      // current versions
      ("A", "x", ts("2020-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      ("B", "y", ts("2020-01-01 00:00:00"), null.asInstanceOf[Timestamp]),
      ("D", "w", ts("2020-01-01 00:00:00"), null.asInstanceOf[Timestamp])
    ).toDF("k", "seg", "valid_from", "valid_to")
    val upd = Seq(
      ("A", "x2", ts("2024-01-01 00:00:00")), // superseded by the later row
      ("A", "x3", ts("2024-06-01 00:00:00")), // latest wins -> change
      ("B", "y", ts("2024-01-01 00:00:00")),  // no-op: same attrs
      ("C", "z", ts("2024-01-01 00:00:00"))   // brand-new key
    ).toDF("k", "seg", "eff_ts")
    val got = Relational.scdMerge(dim, upd, "k", Seq("seg"), "eff_ts")
      .select("k", "seg", "valid_from", "valid_to")
      .as[(String, String, Timestamp, Option[Timestamp])]
      .collect().toSet
    assert(got == Set(
      ("A", "old", ts("2019-01-01 00:00:00"), Some(ts("2020-01-01 00:00:00"))),
      ("A", "x", ts("2020-01-01 00:00:00"), Some(ts("2024-06-01 00:00:00"))),
      ("A", "x3", ts("2024-06-01 00:00:00"), None),
      ("B", "y", ts("2020-01-01 00:00:00"), None),
      ("C", "z", ts("2024-01-01 00:00:00"), None),
      ("D", "w", ts("2020-01-01 00:00:00"), None)))
  }

  test("fuzzyJoin finds all pairs within edit distance 1 and nothing else") {
    val left = Seq((1L, "kitten"), (2L, "kiten"), (3L, "apple"),
      (4L, "zzz"), (5L, "")).toDF("lid", "lv")
    val right = Seq((10L, "kitten"), (11L, "sitten"), (12L, "aple"),
      (13L, "qqq"), (14L, "a")).toDF("rid", "rv")
    val got = Relational.fuzzyJoin(left, right, "lid", "lv", "rid", "rv",
      maxDist = 1)
      .select("l_id", "r_id", "dist").as[(Long, Long, Int)].collect().toSet
    // kitten==kitten (0), kitten~sitten (sub, 1), kiten~kitten (ins, 1),
    // apple~aple (del, 1), ""~"a" (ins, 1); kiten vs sitten is dist 2;
    // zzz/qqq match nothing
    assert(got == Set((1L, 10L, 0), (1L, 11L, 1), (2L, 10L, 1),
      (3L, 12L, 1), (5L, 14L, 1)))
  }

  test("fuzzyJoin at maxDist=2 reaches two-edit pairs; bucket cap drops boilerplate") {
    val left = Seq((1L, "kiten"), (2L, "dup")).toDF("lid", "lv")
    val right = Seq((11L, "sitten"), (12L, "dup"), (13L, "dup"),
      (14L, "dup")).toDF("rid", "rv")
    val d2 = Relational.fuzzyJoin(left, right, "lid", "lv", "rid", "rv",
      maxDist = 2)
      .select("l_id", "r_id", "dist").as[(Long, Long, Int)].collect().toSet
    assert(d2.contains((1L, 11L, 2))) // substitution + insertion
    // "dup" appears 4x -> its own variant bucket holds >= 4 occupants;
    // with maxBucket=3 every dup-variant bucket (incl. deletions, which
    // only dup rows generate) is dropped, so the exact-dup pairs vanish
    // while the unrelated kiten~sitten pair (2 edits) survives
    val capped = Relational.fuzzyJoin(left, right, "lid", "lv", "rid", "rv",
      maxDist = 2, maxBucket = 3)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSet
    assert(capped == Set((1L, 11L)))
  }

  test("range join matches rows to containing intervals across bucket edges") {
    val points = Seq(
      (1L, ts("2024-01-01 10:59:59")),
      (2L, ts("2024-01-01 11:00:01")),
      (3L, ts("2024-01-01 13:00:00")))
      .toDF("id", "ts")
    val intervals = Seq(
      (10L, ts("2024-01-01 10:30:00"), ts("2024-01-01 11:30:00")))
      .toDF("iv_id", "start_ts", "end_ts")
    val out = Relational.rangeJoinByBucket(points, intervals,
      "ts", "start_ts", "end_ts", bucketSeconds = 3600)
      .select("id", "iv_id").as[(Long, Long)].collect().toSet
    // 1 and 2 fall inside the interval (straddling the hour boundary); 3 outside
    assert(out == Set((1L, 10L), (2L, 10L)))
  }

  test("cdc apply: latest-wins upsert/delete/insert, untouched rows pass through") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0),
      (4L, "d", 40.0)).toDF("key", "attr", "price")
    val ops = Seq(
      (2L, 1L, "U", "b2", 21.0),   // plain update
      (3L, 1L, "D", null, 0.0),    // delete
      (4L, 1L, "U", "d2", 41.0),   // update...
      (4L, 2L, "D", null, 0.0),    // ...then delete: latest wins
      (5L, 1L, "I", "e", 50.0),    // brand-new key
      (6L, 1L, "D", null, 0.0),    // delete of a key not in the snapshot
      (6L, 2L, "I", "f", 60.0))    // ...resurrected by a later insert
      .toDF("key", "seq", "op", "attr", "price")
    val out = Relational.cdcApply(snap, ops, "key", "seq", "op",
        Seq("attr", "price"))
      .as[(Long, String, Double)].collect().map(r => r._1 -> r).toMap
    assert(out.keySet == Set(1L, 2L, 4L, 5L, 6L) - 4L,
      s"3 deleted, 4 update-then-deleted; got ${out.keySet}")
    assert(out(1L) == ((1L, "a", 10.0)), "untouched row passes through")
    assert(out(2L) == ((2L, "b2", 21.0)), "update replaces payload")
    assert(out(5L) == ((5L, "e", 50.0)), "insert lands")
    assert(out(6L) == ((6L, "f", 60.0)), "later insert overrides delete")
  }

  test("heavy hitters: exact at the threshold boundary, sketch noise invisible") {
    import graft.ext.Relational
    // n = 100; support 0.2 -> threshold floor(20)+1 = 21: an item at
    // EXACTLY 20 must be excluded, 21 included — and the result must be
    // exact even though the MG sketch itself has no such guarantee at
    // the boundary (the re-count pass is what's under test)
    val items = Seq.fill(40)("a") ++ Seq.fill(21)("b") ++
      Seq.fill(20)("c") ++ (1 to 19).map(i => s"x$i")
    val df = items.toDF("item")
    assert(df.count() == 100)
    val out = Relational.heavyHitters(df, "item", 0.2)
      .as[(String, Long)].collect().toMap
    assert(out == Map("a" -> 40L, "b" -> 21L),
      s"c sits exactly AT floor(n*s) and must be excluded; got $out")
  }

  test("heavy hitters: nothing frequent yields empty, not an error") {
    import graft.ext.Relational
    val df = (1 to 50).map(i => s"u$i").toDF("item")
    assert(Relational.heavyHitters(df, "item", 0.5).count() == 0)
  }

  test("nearestJoin: closer side wins in either direction, equal " +
      "distance prefers backward, same-instant is distance 0, " +
      "keyless rows get nulls") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    import graft.ext.Relational
    val left = Seq(
      (1L, 7L, ts("2024-01-01 10:00:10")), // b at :07 (3s), f at :12 (2s) -> forward
      (2L, 7L, ts("2024-01-01 10:00:17")), // b at :12 (5s), f at :22 (5s) -> tie -> backward
      (3L, 7L, ts("2024-01-01 10:00:22")), // same instant -> backward, d=0
      (4L, 9L, ts("2024-01-01 10:00:00"))) // no rights for key 9
      .toDF("lid", "k", "ts")
    val right = Seq(
      (101L, 7L, ts("2024-01-01 10:00:07")),
      (102L, 7L, ts("2024-01-01 10:00:12")),
      (103L, 7L, ts("2024-01-01 10:00:22")))
      .toDF("rid", "k", "ts")
    val out = Relational.nearestJoin(left, right, "k", "ts", Seq("rid"))
      .select("lid", "asof_rid", "direction")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) == ((Some(102L), Some("forward"))), out(1L))
    assert(out(2L) == ((Some(102L), Some("backward"))), out(2L))
    assert(out(3L) == ((Some(103L), Some("backward"))), out(3L))
    assert(out(4L) == ((None, None)), out(4L))
  }

  test("gridRadiusJoin: cross-cell pairs found, boundary inclusive, " +
      "grid equals brute force on a dyadic point cloud") {
    import graft.ext.Relational
    // hand-placed: q1 near a cell corner must see points in 3 different
    // cells; p4 exactly at distance radius (inclusive); p5 just outside
    val pts = Seq(
      (1L, 0.0625, 0.0625),   // same cell as q1
      (2L, 0.0615, 0.0625),   // west neighbor cell
      (3L, 0.0625, 0.0615),   // south neighbor cell
      (4L, 0.1125, 0.0625),   // exactly 0.05 east of q1
      (5L, 0.1130, 0.0625))   // just past the radius
      .toDF("id", "x", "y")
    val qs = Seq((10L, 0.0625, 0.0625)).toDF("id", "x", "y")
    val got = Relational.gridRadiusJoin(pts, qs, "id", "id", "x", "y",
        cell = 0.0625, radius = 0.05)
      .select($"id_a").as[Long].collect().toSet
    assert(got == Set(1L, 2L, 3L, 4L), got)
    // grid == brute force over a deterministic dyadic cloud
    val cloud = (1 to 300).map(i =>
      (i.toLong, (i * 7919 % 1024) / 1024.0, (i * 104729 % 1024) / 1024.0))
    val a = cloud.toDF("id", "x", "y")
    val b = (1 to 40).map(i =>
      (i.toLong, (i * 31 % 1024) / 1024.0, (i * 61 % 1024) / 1024.0))
      .toDF("id", "x", "y")
    val grid = Relational.gridRadiusJoin(a, b, "id", "id", "x", "y",
        cell = 0.125, radius = 0.125)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    val brute = a.select($"id".as("ia"), $"x".as("xa"), $"y".as("ya"))
      .crossJoin(b.select($"id".as("ib"), $"x".as("xb"), $"y".as("yb")))
      .filter(($"xa" - $"xb") * ($"xa" - $"xb") +
        ($"ya" - $"yb") * ($"ya" - $"yb") <= 0.125 * 0.125)
      .select($"ia", $"ib").as[(Long, Long)].collect().toSet
    assert(grid == brute, s"grid pruning must lose nothing: " +
      s"${(brute -- grid).take(3)} missing, ${(grid -- brute).take(3)} extra")
    assert(brute.nonEmpty, "fixture must produce pairs")
  }
}
