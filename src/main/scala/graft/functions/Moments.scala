package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.expressions.Aggregator

/** One-pass streaming moments (count, mean, M2) via Welford/Chan
  * parallel merge — the typed UDAF face of the extension surface
  * (SURVEY §7.3 "one-pass profile moments").
  *
  * Numerically stable under distribution: each partition accumulates
  * locally, merges pairwise with the Chan et al. update; no second scan,
  * no sum-of-squares cancellation. `stddevPop` matches `stddev_pop`
  * within float tolerance (exact aggregation order differs — use the
  * built-in where oracle-exact parity matters; use this where one pass
  * over a 100 TB scan should produce ALL of count/mean/variance at
  * once). */
object Moments {

  final case class State(n: Long, mean: Double, m2: Double)
  final case class Result(n: Long, mean: Double, variancePop: Double,
      stddevPop: Double)

  val aggregator: Aggregator[Double, State, Result] =
    new Aggregator[Double, State, Result] {
      def zero: State = State(0L, 0.0, 0.0)
      def reduce(s: State, x: Double): State = {
        val n = s.n + 1
        val d = x - s.mean
        val mean = s.mean + d / n
        State(n, mean, s.m2 + d * (x - mean))
      }
      def merge(a: State, b: State): State =
        if (a.n == 0) b
        else if (b.n == 0) a
        else {
          val n = a.n + b.n
          val d = b.mean - a.mean
          State(n,
            a.mean + d * b.n / n,
            a.m2 + b.m2 + d * d * a.n * b.n / n)
        }
      def finish(s: State): Result =
        if (s.n == 0) Result(0L, Double.NaN, Double.NaN, Double.NaN)
        else {
          val v = s.m2 / s.n
          Result(s.n, s.mean, v, math.sqrt(v))
        }
      def bufferEncoder: Encoder[State] = Encoders.product[State]
      def outputEncoder: Encoder[Result] = Encoders.product[Result]
    }

  /** Typed column for Dataset[Double] / agg over a double column. */
  def moments: TypedColumn[Double, Result] = aggregator.toColumn

  /** Untyped face for DataFrame.agg on a named double column. */
  def momentsCol(c: Column): Column =
    org.apache.spark.sql.functions.udaf(aggregator)
      .apply(c.cast("double"))
}
