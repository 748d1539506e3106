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
    // injected defects — exact values and positions from app.py:38-40
    def withPrice(r: Row, p: Double) = Row(r.get(0), r.get(1), p, r.get(3), r.get(4))
    def withDate(r: Row, d: String) = Row(r.get(0), d, r.get(2), r.get(3), r.get(4))
    base(5) = withPrice(base(5), 999.0)
    base(17) = withPrice(base(17), -100.0)
    base(50) = withPrice(base(50), 5000.0)
    base(2) = withDate(base(2), "2024/13/01")
    base(3) = withDate(base(3), "01-02-2024")
    base(10) = base(9)
    base(11) = base(9)
    base.toSeq
  }

  def load(spark: SparkSession, n: Int = 200, seed: Long = 123L): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows(n, seed), 4), schema)
}
