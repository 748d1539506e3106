package graft.tools

import org.apache.spark.sql.SparkSession

/** Registry-wide physical-plan census: for EVERY face in
  * `SparkEntry.queries`, build the DataFrame at sf0.001 and count the
  * plan features that matter at 100 TB — hash/range Exchanges,
  * broadcasts, sort-merge joins, cartesian products, window group
  * limits, whole-stage-codegen spans. One JSON line per face to
  * stdout; the committed PLAN_AUDIT.md is generated from this output.
  *
  * This is the breadth complement to PlanAssertSpec's depth pins: the
  * spec pins the invariants of the highest-risk faces both ways; the
  * census makes the whole registry's shuffle surface reviewable at a
  * glance (and diffable round over round — a face whose exchange count
  * jumps is a plan regression even when its wall time hides in noise).
  *
  * Faces whose builders run driver-side training loops (BPE, Lloyd,
  * GD) execute those loops while building — the census pays that
  * bounded cost at sf0.001 rather than special-casing them. */
object PlanCensus {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val line =
        try {
          val plan = graft.SparkEntry.queries(n)(spark, dir)
            .queryExecution.executedPlan.toString
          def c(re: String): Int = re.r.findAllIn(plan).size
          val ex = c("Exchange ((hash|range)partitioning|RoundRobinPartitioning|SinglePartition)")
          val bc = c("BroadcastExchange")
          val smj = c("SortMergeJoin")
          val cart = c("CartesianProduct")
          val bnl = c("BroadcastNestedLoopJoin")
          val wgl = c("WindowGroupLimit")
          val top = c("TakeOrderedAndProject")
          val wscg = c("WholeStageCodegen")
          s"""{"q":"$n","exchanges":$ex,"broadcasts":$bc,""" +
            s""""smj":$smj,"cartesian":$cart,"bnl":$bnl,""" +
            s""""wgl":$wgl,"topk":$top,"wscg":$wscg}"""
        } catch {
          // NonFatal only (ADVICE r14): an OOM/StackOverflow mid-census
          // leaves a possibly-corrupted JVM whose remaining rows would
          // silently skew the committed counts — abort loudly instead
          case scala.util.control.NonFatal(e) =>
            s"""{"q":"$n","error":"${e.getClass.getSimpleName}"}"""
        }
      println(line)
    }
    spark.stop()
  }
}
