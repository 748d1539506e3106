package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column (`array<float>`): top
  * principal component via POWER ITERATION on the covariance matrix,
  * plus projection of the corpus onto it — the reduce-then-cluster step
  * of embedding curation (SemDeDup runs its clustering on PCA-reduced
  * vectors; whitening/projection is also the standard pre-step before
  * quantization and visualization).
  *
  * Algorithm (all public, Golub & Van Loan power method):
  *   1. per-dimension mean  m_j  (one aggregation),
  *   2. covariance  C = E[(x-m)(x-m)^T]  as long-format (i, j, c) rows —
  *      computed on the UPPER TRIANGLE only and mirrored (halves the
  *      pair volume),
  *   3. T iterations of  v <- normalize(C v)  from the fixed start
  *      v0 = 1/sqrt(d) * ones  (the d^2-row matrix is bounded driver
  *      state for any realistic width — collected once, T in-memory
  *      matvecs; distributed join+agg fallback above d^2 = 4M),
  *   4. projection  p = (x - m) . v  per vector (broadcast of the d-row
  *      component).
  *
  * Scale shape at 100 TB: the corpus is touched exactly twice — once for
  * means+covariance, once for projection; both are narrow scans whose
  * shuffles carry DIMENSION-indexed aggregates (d and d^2 keys), not
  * corpus rows. The iteration loop runs over the d^2-row covariance
  * frame only (KBs), so its cost is independent of corpus size. The
  * covariance pair explosion is n * d(d+1)/2 rows — the one term that
  * scales with both n and d^2; for d in the hundreds that is the
  * standard cost (FAISS trains PCA the same way on a sample; pass a
  * `.sample` as input if even that is too much).
  *
  * Determinism for the oracle: every cross-row sum is an exact
  * DECIMAL(28,14) fold of per-row IEEE products (order-free), and every
  * quantity that RE-ENTERS arithmetic (means, covariance entries,
  * iterated components) is rounded at 8 decimals first, so both engines
  * iterate over bit-identical values. The start vector is fixed, making
  * the component's SIGN deterministic too. */
object Pca {

  private val all = Window.partitionBy(lit(1))

  /** (id, j, x) long form of the embedding column, j 1-based (matches
    * SQL generate_subscripts), x cast to double once. */
  private def longForm(emb: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    emb.select(col(idCol).as("id"),
      posexplode(SimSearch.toDouble(col(vecCol))).as(Seq("p", "x")))
      .select(col("id"), (col("p") + 1).as("j"), col("x"))

  /** Centered long form + its per-dimension means: (cx, mn). */
  private def centered(emb: DataFrame, idCol: String, vecCol: String)
      : (DataFrame, DataFrame) = {
    val ex = longForm(emb, idCol, vecCol)
    val mn = ex.groupBy(col("j"))
      .agg(round(sum(col("x").cast("decimal(28,14)")).cast("double")
        / count(lit(1)), 8).as("m"))
    (ex.join(broadcast(mn), "j").select(col("id"), col("j"),
      (col("x") - col("m")).as("y")), mn)
  }

  /** Long-format covariance (i, j, c): upper triangle aggregated, then
    * mirrored. One shuffle on id (pair build), one on (i, j). */
  private def covariance(cx: DataFrame, n: Long): DataFrame = {
    val a = cx.select(col("id"), col("j").as("i"), col("y").as("ya"))
    val b = cx.select(col("id"), col("j"), col("y").as("yb"))
    val upper = a.join(b, Seq("id")).filter(col("i") <= col("j"))
      .groupBy(col("i"), col("j"))
      .agg(round(sum((col("ya") * col("yb")).cast("decimal(28,14)"))
        .cast("double") / lit(n.toDouble), 8).as("c"))
    upper.union(upper.filter(col("i") < col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("c")))
  }

  /** Top principal component by `iterations` power-method steps:
    * (j, loading) with j 1-based, loadings rounded at 8. Loadings come
    * back NULL if the covariance is identically zero (constant corpus —
    * nothing to normalize). */
  def topComponent(emb: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 8): DataFrame = {
    val (cx, mn, n) = prepared(emb, idCol, vecCol)
    iterate(cx, mn, n, iterations).select(col("j"), col("vv").as("loading"))
  }

  private def prepared(emb: DataFrame, idCol: String, vecCol: String)
      : (DataFrame, DataFrame, Long) = {
    val n = emb.count()
    require(n > 0, "Pca: empty corpus")
    val (cx, mn) = centered(emb, idCol, vecCol)
    (cx, mn, n)
  }

  private def iterate(cx: DataFrame, mn: DataFrame, n: Long,
      iterations: Int): DataFrame = {
    require(iterations >= 1, "need at least one power iteration")
    val spark = cx.sparkSession
    import spark.implicits._
    val d = mn.count()
    // The d-ROW component vector iterates on the driver — the
    // bounded-collect regime (same as centroids/vocabs). Round 8: the
    // all-lazy form composed T nested join+window stages into one plan
    // and its scheduling/codegen dwarfed the arithmetic (7.8s isolated
    // at sf0.1 for d = 64; per-step localCheckpoint was WORSE, 12.6s).
    // Round 13: for any realistic embedding width the d^2-row
    // covariance itself is bounded driver state (d = 2048 -> 4.2M
    // entries, ~64 MB), so the WHOLE T-step loop runs in memory on one
    // collected matrix — the r12-era shape still paid 8 Spark
    // jobs-with-collect on a 4096-row frame, pure job overhead
    // (q_pca_project 11.6s in-suite, almost all scheduling). The
    // distributed join+agg loop is kept as the fallback for
    // pathological widths (d^2 > 4M), where the matrix is the
    // scale-bearing side. Arithmetic is REPLICATED BIT-EXACTLY either
    // way: per-term products cast to DECIMAL(28,14) (HALF_UP at scale
    // 14, exactly Spark's double->decimal cast), decimal sums (exact,
    // order-free), null-term skipping like Spark's sum, round at 8
    // HALF_UP — the SQL oracle's chain. Hashes are unchanged
    // (CORRECTNESS r13: q_pca_project bit-exact at all three scales).
    def dec14(x: Double): java.math.BigDecimal =
      java.math.BigDecimal.valueOf(x)
        .setScale(14, java.math.RoundingMode.HALF_UP)
    def round8(x: Double): Double =
      java.math.BigDecimal.valueOf(x)
        .setScale(8, java.math.RoundingMode.HALF_UP).doubleValue
    var v: Seq[(Int, Option[Double])] =
      (1 to d.toInt).map(j => j -> Some(1.0 / math.sqrt(d.toDouble)))
    def step(mv: Seq[(Int, Option[Double])]): Seq[(Int, Option[Double])] = {
      val squares = mv.flatMap(_._2).map(x => dec14(x * x))
      val nn =
        if (squares.isEmpty) None
        else Some(math.sqrt(
          squares.reduce(_.add(_)).doubleValue))
      mv.map { case (i, m) =>
        i -> (for (x <- m; z <- nn; if z > 0) yield round8(x / z))
      }
    }
    if (d * d <= 4194304L) {
      // one bounded collect, T in-memory matvecs
      val rows = covariance(cx, n)
        .select(col("i"), col("j"), col("c"))
        .as[(Int, Int, Double)].collect()
      val byI = rows.groupBy(_._1)
      for (_ <- 1 to iterations) {
        val vm = v.toMap
        val mv = byI.toSeq.map { case (i, entries) =>
          // Spark's sum skips null terms and returns null when ALL
          // terms are null — replicated exactly
          val terms = entries.flatMap { case (_, j, c) =>
            vm.getOrElse(j, None).map(vj => dec14(c * vj)) }
          i -> (if (terms.isEmpty) None
            else Some(terms.reduce(_.add(_)).doubleValue))
        }.sortBy(_._1)
        v = step(mv)
      }
    } else {
      // pathological width: the matrix is the scale-bearing side —
      // materialize it once and keep the matvec distributed
      val cov = covariance(cx, n).localCheckpoint()
      for (_ <- 1 to iterations) {
        val vDf = v.toDF("j", "vv")
        val mv = cov.join(broadcast(vDf), Seq("j"))
          .groupBy(col("i"))
          .agg(sum((col("c") * col("vv")).cast("decimal(28,14)")).as("mvd"))
          .select(col("i"), col("mvd").cast("double").as("mv"))
          .as[(Int, Option[Double])].collect().sortBy(_._1).toSeq
        v = step(mv)
      }
    }
    v.toDF("j", "vv")
  }

  /** Projection of every vector onto the top component:
    * (id, proj) = ((x - m) . v). The component is computed once and
    * broadcast; the corpus-side work is one narrow scan + one id-keyed
    * aggregation of decimal terms. */
  def projectTop(emb: DataFrame, idCol: String, vecCol: String,
      iterations: Int = 8): DataFrame = {
    val (cx, mn, n) = prepared(emb, idCol, vecCol)
    val v = iterate(cx, mn, n, iterations)
    cx.join(broadcast(v), "j")
      .groupBy(col("id"))
      .agg(sum((col("y") * col("vv")).cast("decimal(28,14)"))
        .as("pd"))
      .select(col("id"), col("pd").cast("double").as("proj"))
  }
}
