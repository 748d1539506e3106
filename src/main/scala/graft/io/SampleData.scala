package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** S3 — the reference's seeded 200-row sample with injected defects
  * (/root/reference/app.py:27-41). The random streams (numpy PCG64) are not
  * reproducible on the JVM; what matters for the golden tests is the DEFECT
  * STRUCTURE, which is injected deterministically and exactly:
  *   - price outliers 999, -100, 5000 at idx 5/17/50 (app.py:38)
  *   - malformed dates "2024/13/01", "01-02-2024" at idx 2/3 (app.py:39)
  *   - rows 10-11 overwritten with row 9 => 2 duplicate rows (app.py:40)
  *   - category in {A,B,C,null}, p=[.4,.4,.15,.05] (app.py:36)
  * The filler streams use a seeded java.util.Random so the table is fully
  * deterministic run-to-run.
  */
object SampleData {
  val schema: StructType = StructType(Seq(
    StructField("order_id", LongType, nullable = false),
    StructField("date", StringType, nullable = true),
    StructField("price", DoubleType, nullable = true),
    StructField("quantity", LongType, nullable = true),
    StructField("category", StringType, nullable = true)))

  def rows(n: Int = 200, seed: Long = 123L): Seq[Row] = {
    val rng = new java.util.Random(seed)
    val start = java.time.LocalDate.of(2024, 1, 1)
    val base = (0 until n).map { i =>
      val price = math.rint(math.abs(rng.nextGaussian() * 20 + 50) * 100) / 100
      val qty = (rng.nextInt(9) + 1).toLong
      val cat = rng.nextDouble() match {
        case p if p < 0.40 => "A"
        case p if p < 0.80 => "B"
        case p if p < 0.95 => "C"
        case _             => null
      }
      Row(
        (i + 1).toLong,
        start.plusDays(i.toLong).toString, // yyyy-MM-dd strings (app.py:33)
        price, qty, cat)
    }.toArray
    // injected defects — exact values and positions from app.py:38-40;
    // guarded so a small n yields a defect-light sample instead of an
    // index crash
    def withPrice(r: Row, p: Double) = Row(r.get(0), r.get(1), p, r.get(3), r.get(4))
    def withDate(r: Row, d: String) = Row(r.get(0), d, r.get(2), r.get(3), r.get(4))
    def inject(i: Int)(f: Row => Row): Unit = if (i < n) base(i) = f(base(i))
    inject(5)(withPrice(_, 999.0))
    inject(17)(withPrice(_, -100.0))
    inject(50)(withPrice(_, 5000.0))
    inject(2)(withDate(_, "2024/13/01"))
    inject(3)(withDate(_, "01-02-2024"))
    if (n > 10) base(10) = base(9)
    if (n > 11) base(11) = base(9)
    base.toSeq
  }

  def load(spark: SparkSession, n: Int = 200, seed: Long = 123L): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows(n, seed), 4), schema)
}
