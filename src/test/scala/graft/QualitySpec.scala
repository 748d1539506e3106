package graft

import graft.clean.CleaningAction._
import graft.io.SampleData
import graft.model.QualityStats
import graft.pipeline.CleaningPipeline
import graft.score.Quality

class QualitySpec extends SparkSpec {
  import spark.implicits._

  test("Q1 formula: 50 + 0.5*nulls_removed + 1.0*dups_removed, clamped") {
    assert(Quality.score(QualityStats(10, 4), QualityStats(2, 0)) == 58.0)
    assert(Quality.score(QualityStats(0, 0), QualityStats(5, 5)) == 50.0) // no credit for adding dirt
    assert(Quality.score(QualityStats(1000, 0), QualityStats(0, 0)) == 100.0) // clamp
  }

  test("Q1 stats counts nulls across ALL columns") {
    val df = Seq((Some(1.0), None: Option[String]), (None, Some("a")))
      .toDF("x", "s")
    val st = Quality.stats(df)
    assert(st.totalNulls == 2 && st.duplicateRows == 0)
  }

  test("Q2 insights") {
    val before = Seq(1, 2, 3).toDF("x")
    val after = Seq(1, 2).toDF("x")
    val ins = Quality.insights(before, after)
    assert(ins.rowsBefore == 3 && ins.rowsAfter == 2 && ins.nullsAfter == 0)
    assert(ins.lines.head == "Rows before: 3, rows after: 2")
  }

  test("end-to-end pipeline on the seeded sample: detect -> clean -> score") {
    val p0 = CleaningPipeline(SampleData.load(spark))
    assert(p0.missions.nonEmpty)
    val p1 = p0
      .apply(DropDuplicates())
      .apply(NullFillConstant("category"))
      .apply(OutlierReplaceMedian("price"))
      .apply(DateAutoParse("date"))
    // dups removed (+2) but date-parse introduced 2 NaT nulls (-0 credit)
    assert(p1.qualityScore >= 50.0 && p1.qualityScore <= 100.0)
    assert(p1.missionsLog.size == 4)
    val ms = p1.missions
    assert(!ms.exists(_.isInstanceOf[graft.model.Mission.Duplicates]))
    val ins = p1.insights
    assert(ins.rowsBefore == 200 && ins.rowsAfter == 198)
    p1.reset()
  }

  test("lineage replays as a portable recipe on fresh data") {
    val p = CleaningPipeline(SampleData.load(spark))
      .apply(DropDuplicates())
      .apply(NullFillConstant("category"))
    // a different seed: same defect STRUCTURE, different values
    val fresh = SampleData.load(spark, seed = 999L)
    val replayed = p.replay(fresh)
    assert(replayed.count() == 198) // same injected dups removed
    assert(replayed.filter(replayed("category").isNull).count() == 0)
    // and the original pipeline state is untouched
    assert(p.work.count() == 198)
  }

  test("round-4 actions compose into the lifecycle like the originals") {
    import graft.clean.CleaningAction.{QuantileBin, ScaleRobust}
    val p = CleaningPipeline(SampleData.load(spark))
      .apply(ScaleRobust("price"))
      .apply(QuantileBin("price", nBins = 4))
    assert(p.missionsLog == Seq(
      "Robust-scaled price (median/IQR)",
      "Quantile-binned price into 4 bins"))
    val out = p.work
    assert(out.columns.contains("price_scaled") &&
      out.columns.contains("price_bin"))
    // replay on fresh data recomputes ITS OWN quartiles (a recipe, not
    // frozen literals): every non-null value still lands in a bin
    val fresh = SampleData.load(spark, seed = 999L)
    val replayed = p.replay(fresh)
    assert(replayed.filter(replayed("price").isNotNull &&
      replayed("price_bin").isNull).count() == 0)
    p.reset()
  }
}
