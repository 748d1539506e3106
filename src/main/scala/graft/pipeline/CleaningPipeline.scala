package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

import graft.clean.CleaningAction
import graft.model.{Insights, Mission}
import graft.profile.Profiler
import graft.score.Quality

/** The interactive-session lifecycle (SURVEY §3) rebuilt as an immutable
  * lineage: `orig` plus an ordered `Seq[CleaningAction]` replayed lazily,
  * replacing the reference's two mutable pandas copies
  * (/root/reference/app.py:176-188).
  *
  * Caching policy: the current working version is pinned
  * (MEMORY_AND_DISK — spills instead of OOM at scale) and the previous
  * version unpersisted on every apply, so repeated detect/profile cycles
  * (entry point B, app.py:190-240) rescan memory, not storage.
  */
final class CleaningPipeline private (
    val orig: DataFrame,
    val lineage: Vector[CleaningAction],
    val work: DataFrame) {

  def apply(action: CleaningAction): CleaningPipeline = {
    val next = action(work)
    next.persist(StorageLevel.MEMORY_AND_DISK)
    if (work ne orig) work.unpersist(blocking = false)
    new CleaningPipeline(orig, lineage :+ action, next)
  }

  /** Reset to original (app.py:184-188): drop lineage, re-point at orig. */
  def reset(): CleaningPipeline = {
    if (work ne orig) work.unpersist(blocking = false)
    new CleaningPipeline(orig, Vector.empty, orig)
  }

  /** Replay this lineage over a DIFFERENT input — the typed action log
    * doubles as a portable cleaning recipe (the roll-back/replay the
    * reference lists as its next step, app.py:396). Statistics
    * (medians, z-models) are recomputed against the new data, which is
    * the point: the recipe is declarative, not value-frozen. */
  def replay(freshInput: DataFrame): DataFrame =
    lineage.foldLeft(freshInput)((df, a) => a(df))

  def missions: Seq[Mission] = Profiler.detectMissions(work)
  def missionsLog: Seq[String] = lineage.map(_.describe)
  def insights: Insights = Quality.insights(orig, work)
  def qualityScore: Double = Quality.score(orig, work)
}

object CleaningPipeline {
  def apply(df: DataFrame): CleaningPipeline = {
    df.persist(StorageLevel.MEMORY_AND_DISK)
    new CleaningPipeline(df, Vector.empty, df)
  }
}
