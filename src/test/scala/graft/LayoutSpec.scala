package graft

import org.apache.spark.sql.functions._

import graft.ext.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("zorder64: known interleavings and JVM-reference cross-check") {
    // z(3,5): a bits {0,1} -> even bits {0,2}; b bits {0,2} -> odd {1,5}
    // = 0b100111 = 39
    assert(Layout.zorder64Ref(3L, 5L) == 39L)
    assert(Layout.zorder64Ref(1L, 0L) == 1L)
    assert(Layout.zorder64Ref(0L, 1L) == 2L)
    assert(Layout.zorder64Ref((1L << 31) - 1, (1L << 31) - 1) == (1L << 62) - 1)
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(200)(
      (rnd.nextLong().abs % (1L << 31), rnd.nextLong().abs % (1L << 31)))
    val got = pairs.toDF("a", "b")
      .select(Layout.zorder64($"a", $"b")).as[Long].collect().toSeq
    assert(got == pairs.map { case (a, b) => Layout.zorder64Ref(a, b) })
  }

  test("zorder64: out-of-domain keys fail loudly, not by aliasing") {
    val bad = Seq((1L << 31, 0L)).toDF("a", "b")
      .select(Layout.zorder64($"a", $"b"))
    intercept[Exception](bad.collect())
  }

  test("writeZOrdered: files cover disjoint z ranges (skippable layout)") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val df = (0 until 4096).map(i => (i.toLong % 64, i.toLong / 64))
      .toDF("a", "b")
    Layout.writeZOrdered(df, dir, "a", "b", numFiles = 4)
    val back = spark.read.parquet(dir)
      .withColumn("z", Layout.zorder64($"a", $"b"))
      .withColumn("f", input_file_name())
      .groupBy("f").agg(min($"z").as("lo"), max($"z").as("hi"))
      .select("lo", "hi").as[(Long, Long)].collect().sortBy(_._1)
    assert(back.length >= 2)
    back.sliding(2).foreach { case Array((_, hi1), (lo2, _)) =>
      assert(hi1 <= lo2, s"overlapping z ranges: $hi1 vs $lo2")
    }
    // and every row survives the round trip
    assert(spark.read.parquet(dir).count() == 4096)
  }

  test("zRangeFileStats: per-bucket envelopes are exact and prune correctly") {
    // 0..63 x 0..63 grid; shift 8 -> file_id = z div 256 = the 4x4
    // "quadrant at depth 3" decomposition: 16 buckets of a 16x16 tile each
    val df = (for { a <- 0 until 64; b <- 0 until 64 } yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val stats = Layout.zRangeFileStats(df, "a", "b", shiftBits = 8)
      .orderBy("file_id")
      .select("file_id", "n_rows", "min_a", "max_a", "min_b", "max_b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(stats.length == 16)
    assert(stats.forall(_._2 == 256L))
    // every bucket is a 16x16 tile: tight envelopes, keys aligned to 16
    stats.foreach { case (_, _, minA, maxA, minB, maxB) =>
      assert(maxA - minA == 15 && maxB - minB == 15)
      assert(minA % 16 == 0 && minB % 16 == 0)
    }
    // a one-tile range predicate on EITHER column keeps exactly 4/16 tiles
    assert(stats.count(s => s._4 >= 16 && s._3 <= 31) == 4)  // a in [16,31]
    assert(stats.count(s => s._6 >= 32 && s._5 <= 47) == 4)  // b in [32,47]
  }

  test("compaction plan: next-fit groups fill to the target in path order") {
    val files = Seq(("a", 100L), ("b", 200L), ("c", 250L), ("d", 50L))
      .toDF("path", "bytes")
    val out = Layout.compactionPlan(files, "path", "bytes", targetBytes = 300L)
      .select("path", "group_id").as[(String, Long)].collect().toMap
    // prefix sums: a=0, b=100, c=300, d=550 -> groups {a,b} and {c,d}
    assert(out == Map("a" -> 0L, "b" -> 0L, "c" -> 1L, "d" -> 1L))
    // a single file larger than the target gets its own group, and the
    // next file starts a fresh one (no infinite bin)
    val big = Seq(("a", 1000L), ("b", 10L)).toDF("path", "bytes")
    val out2 = Layout.compactionPlan(big, "path", "bytes", targetBytes = 300L)
      .select("path", "group_id").as[(String, Long)].collect().toMap
    assert(out2 == Map("a" -> 0L, "b" -> 3L))
  }

  test("shard plan: total partition, deterministic assignment, exact loads") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = Layout.shardPlan(docs, "doc_id", "text", nShards = 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(plan.keySet.subsetOf(Set(0L, 1L, 2L, 3L)))
    assert(plan.values.map(_._1).sum == docs.count(), "every doc in one shard")
    // loads agree with an independent per-doc recomputation
    val byDoc = docs.select(
        org.apache.spark.sql.functions.pmod(
          graft.functions.Hashing.hash64($"doc_id".cast("string")),
          lit(4L)).as("shard"),
        graft.ext.TextStats.tokenCount($"text").cast("long").as("t"))
      .groupBy("shard").agg(sum($"t")).as[(Long, Long)].collect().toMap
    plan.foreach { case (s, (_, tok, _, _)) => assert(byDoc(s) == tok) }
    // skew ratios average to 1 across occupied shards weighted by docs
    val n = docs.count().toDouble
    plan.foreach { case (_, (d, _, _, skew)) =>
      assert(math.abs(skew - d * 4 / n) < 1e-12)
    }
    // determinism under different parallelism
    val again = Layout.shardPlan(docs.repartition(7), "doc_id", "text", 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == plan.view.mapValues(_._1).toMap)
  }
}
