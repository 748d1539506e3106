package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout optimization: Z-order (Morton) keys for multi-column
  * data skipping (the Delta Lake / Iceberg Z-ORDER technique, public).
  * Sorting/range-partitioning a table by the interleaved key clusters
  * rows that are close in BOTH dimensions into the same files, so
  * min/max row-group stats prune scans filtered on EITHER column —
  * a single-column sort can only serve one predicate.
  *
  * Pure codegen'd integer bit-arithmetic (the classic magic-number
  * spread), exactly mirrorable in the oracle. Domain: both keys must
  * fit in 31 bits (interleaved result stays positive in an int64);
  * out-of-range keys throw at runtime via the ANSI guard below rather
  * than silently aliasing. */
object Layout {

  private val masks = Seq(
    (16, 0x0000FFFF0000FFFFL),
    (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL),
    (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the lower 32 bits of `x` onto even bit positions. */
  def spreadBits(x: Column): Column =
    masks.foldLeft(x.bitwiseAND(lit(0xFFFFFFFFL))) { case (v, (s, m)) =>
      (v.bitwiseOR(shiftleft(v, s))).bitwiseAND(lit(m))
    }

  /** JVM reference (spec + driver-side use). */
  def spreadBitsRef(x: Long): Long =
    masks.foldLeft(x & 0xFFFFFFFFL) { case (v, (s, m)) => (v | (v << s)) & m }

  /** Morton interleave of two non-negative < 2^31 keys: bit 2i = a's
    * bit i, bit 2i+1 = b's bit i. Monotone locality: nearby (a, b)
    * pairs get nearby z values. */
  def zorder64(a: Column, b: Column): Column = {
    val guard = when(
      a < 0 || a >= (1L << 31) || b < 0 || b >= (1L << 31),
      raise_error(lit("zorder64: keys must be in [0, 2^31)")))
    coalesce(guard.cast("long"),
      spreadBits(a.cast("long"))
        .bitwiseOR(shiftleft(spreadBits(b.cast("long")), 1)))
  }

  def zorder64Ref(a: Long, b: Long): Long = {
    require(a >= 0 && a < (1L << 31) && b >= 0 && b < (1L << 31))
    spreadBitsRef(a) | (spreadBitsRef(b) << 1)
  }

  /** Z-ordered write: range-partition on the z key (cluster-parallel
    * global clustering — range exchange, not a single-task sort), sort
    * within partitions, write parquet. Each output file then covers a
    * compact z-range = a compact rectangle in (a, b) space, which is
    * what makes min/max stats selective for both columns. */
  def writeZOrdered(df: DataFrame, path: String, colA: String,
      colB: String, numFiles: Int = 8): Unit =
    df.withColumn("__z", zorder64(col(colA), col(colB)))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file min/max statistics of a Z-ORDERED layout, computed from
    * the z key itself: a z-sorted table's files cover compact z ranges,
    * so bucketing rows by their z-value's high bits (`file_id =
    * z div 2^shiftBits`) reproduces exactly the per-file key envelopes
    * a writer would persist — the min/max index that data skipping
    * consults. Pair with a range predicate to report WHICH files a scan
    * must touch (see q_zprune): the payoff claim of z-ordering ("a
    * filter on EITHER column prunes most files") becomes a checkable
    * number instead of prose.
    *
    * Scale shape: the z key and bucket id are narrow codegen'd
    * bit-arithmetic; the only shuffle is the partial-agg groupBy on
    * file_id, which carries one row per z-range bucket — at 100 TB,
    * thousands of rows. No global window, no sampling (the fixed-width
    * z grid is deterministic where repartitionByRange's sampled
    * boundaries are not — which is also what makes it oracle-able). */
  def zRangeFileStats(df: DataFrame, colA: String, colB: String,
      shiftBits: Int): DataFrame = {
    require(shiftBits >= 0 && shiftBits < 62, "need 0 <= shiftBits < 62")
    df.select(col(colA), col(colB),
      zorder64(col(colA), col(colB)).as("__z"))
      .withColumn("file_id", expr(s"__z div ${1L << shiftBits}L"))
      .groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(colA)).as(s"min_$colA"), max(col(colA)).as(s"max_$colA"),
        min(col(colB)).as(s"min_$colB"), max(col(colB)).as(s"max_$colB"))
  }

  /** Bucketed external-table write — the co-location half of the
    * bucketed-join strategy: both fact tables pre-hashed on the join
    * key into the SAME bucket count means every future equi-join or
    * aggregation on that key runs with ZERO exchange, amortizing one
    * write-time shuffle across every downstream read. At 100 TB this is
    * the difference between re-shuffling the fact table per query and
    * never shuffling it again.
    *
    * The frame is pre-partitioned on the key into exactly `nBuckets`
    * tasks with the SAME hash family bucketing uses (Spark bucket ids
    * are `HashPartitioning`'s murmur3 pmod), so each task holds exactly
    * one bucket and each bucket lands in ONE file — the layout the
    * scan-side needs to also honor `sortCols` metadata (multi-file
    * buckets force a re-sort). Registered as an EXTERNAL table at
    * `path` (works on the in-memory catalog; no Hive needed). */
  def writeBucketedTable(df: DataFrame, tableName: String, path: String,
      nBuckets: Int, keyCols: Seq[String],
      sortCols: Seq[String] = Nil): DataFrame = {
    require(nBuckets > 0 && keyCols.nonEmpty,
      "need nBuckets > 0 and at least one bucket column")
    val writer = df.repartition(nBuckets, keyCols.map(col): _*)
      .write.mode("overwrite").format("parquet").option("path", path)
      .bucketBy(nBuckets, keyCols.head, keyCols.tail: _*)
    (if (sortCols.nonEmpty) writer.sortBy(sortCols.head, sortCols.tail: _*)
     else writer).saveAsTable(tableName)
    df.sparkSession.table(tableName)
  }

  /** Small-file compaction planner: assign each file of a listing
    * (`pathCol`, `bytesCol`) to a compaction group whose total
    * approaches `targetBytes` — the OPTIMIZE/bin-packing step every
    * big-table format runs when streaming ingestion has littered a
    * partition with kilobyte files. Next-fit in path order: group id =
    * exclusive-prefix-sum div targetBytes, so a group fills until the
    * running total crosses the target (the straddling file may push a
    * group at most one file past it — the accepted compaction trade;
    * groups are contiguous in path order, preserving any existing sort
    * locality). Fully deterministic and integer-only → oracle-mirrorable.
    *
    * The running sum is a single-partition window BY DESIGN: the input
    * is file METADATA (one row per file — a 100 TB table with 128 MB
    * files is ~800k rows of (path, long)), never the data itself. The
    * plan that consumes the group ids (read group → write one file) is
    * where the data parallelism lives. */
  def compactionPlan(files: DataFrame, pathCol: String, bytesCol: String,
      targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(pathCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    files
      .withColumn("__cum", sum(col(bytesCol)).over(w))
      .withColumn("group_id",
        expr(s"(__cum - $bytesCol) div ${targetBytes}L"))
      .drop("__cum")
  }

  /** Training-shard assignment plan: every doc lands in one of
    * `nShards` output shards by portable hash of its id (deterministic
    * under any partitioning/parallelism — NOT round-robin), and the
    * report shows each shard's doc/token/byte load plus its skew
    * against the ideal uniform share. This is the export step of a
    * training-data pipeline (webdataset/TFRecord-style sharding), and
    * the skew column is the number that says whether shard-parallel
    * training will stall on a hot shard.
    *
    * Scale shape: one narrow projection (hash + token count + byte
    * length fused into the scan) and one partial-agg shuffle carrying
    * `nShards` rows. The skew ratio is integer-derived
    * (docs * nShards / total) so the report is engine-exact. */
  def shardPlan(docs: DataFrame, idCol: String, textCol: String,
      nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val staged = docs.select(
      pmod(graft.functions.Hashing.hash64(col(idCol).cast("string")),
        lit(nShards.toLong)).as("shard"),
      TextStats.tokenCount(col(textCol)).cast("long").as("__tok"),
      octet_length(col(textCol)).cast("long").as("__bytes"))
    val perShard = staged.groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__tok")).as("n_tokens"),
        sum(col("__bytes")).as("n_bytes"))
    val total = perShard.agg(sum(col("n_docs")).as("__t"))
    perShard.crossJoin(broadcast(total))
      .withColumn("doc_skew",
        (col("n_docs") * nShards).cast("double") / col("__t").cast("double"))
      .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_bytes"),
        col("doc_skew"))
  }
}
