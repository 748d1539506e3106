package graft

import org.apache.spark.sql.functions._

import graft.functions.Moments
import graft.profile.Profiler

class MomentsSpec extends SparkSpec {
  import spark.implicits._

  test("one-pass moments match built-in count/avg/stddev_pop") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val df = xs.toDF("x")
    val m = df.select(Moments.momentsCol($"x").as("m")).select("m.*").head()
    assert(m.getAs[Long]("n") == 8)
    assert(math.abs(m.getAs[Double]("mean") - 5.0) < 1e-12)
    assert(math.abs(m.getAs[Double]("stddevPop") - 2.0) < 1e-12)
  }

  test("moments merge correctly across many partitions") {
    val df = spark.range(0, 10000, 1, 16).select($"id".cast("double").as("x"))
    val m = df.select(Moments.momentsCol($"x").as("m")).select("m.*").head()
    val builtin = df.agg(avg($"x"), stddev_pop($"x")).head()
    assert(m.getAs[Long]("n") == 10000)
    assert(math.abs(m.getAs[Double]("mean") - builtin.getDouble(0)) < 1e-9)
    assert(math.abs(m.getAs[Double]("stddevPop") - builtin.getDouble(1)) < 1e-9)
  }

  test("empty input yields NaN moments, zero count") {
    val m = Seq.empty[Double].toDF("x")
      .select(Moments.momentsCol($"x").as("m")).select("m.*").head()
    assert(m.getAs[Long]("n") == 0 && m.getAs[Double]("mean").isNaN)
  }

  test("IQR model: Tukey fences on a known distribution") {
    // 1..100 plus one far outlier
    val df = ((1 to 100).map(_.toDouble) :+ 1000.0).toDF("x")
    val m = Profiler.iqrModel(df, "x")
    // q1=26, q3=75.5 (interpolated on 101 values), iqr=49.5
    assert(df.filter(m.mask).count() == 1)
    assert(m.lo < 1 && m.hi < 1000 && m.hi > 100)
  }

  test("IQR approx mode flags the same far outlier") {
    val df = ((1 to 100).map(_.toDouble) :+ 1000.0).toDF("x")
    val m = Profiler.iqrModel(df, "x", exact = false)
    assert(df.filter(m.mask).count() == 1)
  }
}
