package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — a broadcast join of the (small)
  * query set against the corpus, all arithmetic in codegen'd higher-order
  * functions on doubles (cast once, up front).
  *
  * Scale path: LSH random-hyperplane bucketing — per-vector sign
  * signature (narrow map), candidates = bucket collisions, exact rerank
  * only inside buckets. At 100 TB the corpus never self-joins; shuffle
  * volume is one small signature row per vector.
  */
object SimSearch {

  /** Cast to double once; all downstream arithmetic is double (float
    * accumulation drifts and is not portable across engines). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-to-right dot product — a native expression (tight JVM loop),
    * numerically identical to zip_with + aggregate but ~100x cheaper on
    * pairwise joins (see VectorExprs scaladoc). */
  def dot(a: Column, b: Column): Column =
    // DotProductD reads raw 8-byte slots — float arrays MUST be cast up
    // (no-op when already array<double>)
    graft.functions.VectorExprs.dot_product(
      a.cast("array<double>"), b.cast("array<double>"))

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** L2-normalize (zero vectors stay zero) — native single pass; the HOF
    * form re-evaluates the norm per element. */
  def normalize(v: Column): Column =
    graft.functions.VectorExprs.normalize_d(v.cast("array<double>"))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d > 0, dot(a, b) / d).otherwise(lit(0.0))
  }

  /** Brute-force cosine top-k: queries (small) are broadcast against the
    * corpus; per-query ranking is one window over the joined frame.
    * Deterministic tie-break on neighbor id. */
  def bruteTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), normalize(toDouble(col(vecCol))).as("v"))
    val q = queries.select(col(idCol).as("query_id"), normalize(toDouble(col(vecCol))).as("qv"))
    val joined = c.join(broadcast(q),
      if (excludeSelf) col("id") =!= col("query_id") else lit(true))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  /** IVF-Flat ANN: partition the corpus into `nlist` inverted lists by
    * nearest centroid; queries scan only the `nprobe` closest lists and
    * rerank exactly. Centroids here are a deterministic id-sample of the
    * corpus itself (one pass, no training iterations — "k-means-lite");
    * a production build would refine them with a few Lloyd rounds, same
    * plan shape. On isotropic data IVF recall beats hyperplane LSH
    * because candidate selection follows actual data geometry instead of
    * fixed random cuts: expected scan fraction = nprobe/nlist.
    *
    * Plan shape at 100 TB: centroid set is tiny (nlist rows) and
    * broadcast twice (corpus assignment + query probing); the corpus
    * shuffles ONCE on its list id; the probe join is a hash join on
    * list id. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
    // deterministic centroid sample: the nlist smallest ids
    val cents = c.orderBy(col("id").asc).limit(nlist)
      .select(col("id").as("cent_id"), col("v").as("cv"))
    // assign: argmin over centroid distance == argmax dot (unit vectors),
    // ties to smallest cent_id
    def assign(df: DataFrame, vc: String, rankCol: String, keep: Int): DataFrame = {
      val w = Window.partitionBy(col("__aid"))
        .orderBy(dot(col(vc), col("cv")).desc, col("cent_id").asc)
      df.withColumn("__aid", col("id"))
        .join(broadcast(cents), lit(true))
        .withColumn(rankCol, row_number().over(w))
        .filter(col(rankCol) <= keep)
        .drop("__aid")
    }
    val assigned = assign(c, "v", "__crank", 1)
      .select(col("id"), col("v"), col("cent_id").as("list_id"))
    val q = queries.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("qv"))
    val probes = assign(q.withColumnRenamed("qv", "v"), "v", "__qrank", nprobe)
      .select(col("id").as("query_id"), col("v").as("qv"),
        col("cent_id").as("list_id"))
    val joined = assigned.join(broadcast(probes), Seq("list_id"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }

  /** Random-hyperplane LSH signature: `planes` sign bits packed into a
    * long. Hyperplane components are deterministic pseudo-random values
    * derived from hash64(plane, dim) — reproducible with zero egress and
    * no stored model. */
  def hyperplaneSignature(v: Column, dims: Int, planes: Int = 16): Column = {
    // one codegen'd dot per plane, summed flat — no HOF loop
    (0 until planes).map { p =>
      val plane = array((0 until dims).map { d =>
        // hash -> [-0.5, 0.5) grid; fixed seed via the (p,d) pair
        lit((((Hashing.permuteA(p * dims + d) % 1000L) / 1000.0) - 0.5))
      }: _*)
      when(dot(plane, v) >= 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** ANN top-k: candidates share the hyperplane bucket or differ in at
    * most 2 bits (multi-probe), exact cosine rerank inside candidates.
    * Recall < 1 by construction: strong when true neighbors are close
    * (cos > 0.8, the near-dup regime), weak on isotropic random vectors
    * where the "nearest" neighbor sits at ~60-70 degrees — benchmark
    * against bruteTopK on a sample before trusting it on a new corpus.
    * Candidate fraction ~ (1 + p + p(p-1)/2) / 2^p of the corpus. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dims: Int, k: Int, planes: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"),
      normalize(toDouble(col(vecCol))).as("v"))
      .withColumn("sig", hyperplaneSignature(col("v"), dims, planes))
    val q = queries.select(col(idCol).as("query_id"),
      normalize(toDouble(col(vecCol))).as("qv"))
      .withColumn("qsig", hyperplaneSignature(col("qv"), dims, planes))
    // multi-probe: own bucket + all 1-bit and 2-bit flips
    val flips: Seq[Long] =
      (0 until planes).map(p => 1L << p) ++
        (for (p1 <- 0 until planes; p2 <- (p1 + 1) until planes)
          yield (1L << p1) | (1L << p2))
    val probes = q.select(col("query_id"), col("qv"),
      explode(array_union(array(col("qsig")),
        array(flips.map(f => col("qsig").bitwiseXOR(lit(f))): _*))).as("sig"))
    val joined = c.join(broadcast(probes), Seq("sig"))
      .filter(col("id") =!= col("query_id"))
      .withColumn("cosine", dot(col("v"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("id").asc)
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("id").as("neighbor_id"), col("rank"),
        col("cosine"))
  }
}
