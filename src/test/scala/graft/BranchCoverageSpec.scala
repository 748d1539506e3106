package graft

import org.apache.spark.sql.functions._

/** Adversarial branch-coverage pins for the injected-defect faces
  * (VERDICT r6 #7 / r7 Next #6, the q_erasure vacuous-gate audit
  * generalized): for each face, every verdict/branch its scaladoc
  * claims must actually APPEAR in the oracle-checked output at sf0.01.
  * A face whose defect-injection stops reaching a branch (data drift,
  * threshold change, broken injection) passes its value oracle
  * trivially — these tests make that vacuousness a build failure.
  * Ground truths are recomputed from the fixture tables, not
  * hard-coded, so a regenerated fixture moves the expectations with
  * it.
  */
class BranchCoverageSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.01"

  private def face(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q_contamination: all three verdicts (keep/flag/drop) appear") {
    val verdicts = face("q_contamination")
      .groupBy(col("verdict")).count()
      .as[(String, Long)].collect().toMap
    assert(verdicts.keySet == Set("keep", "flag", "drop"),
      s"vacuous verdict branch; observed: $verdicts")
    // the quoted-prefix injection must be the flag driver: every
    // (doc_id % 40 = 7) corpus doc is either flagged or dropped
    val quoted = face("q_contamination")
      .filter(col("doc_id") % 40 === 7)
      .select(col("verdict")).as[String].collect()
    assert(quoted.nonEmpty && quoted.forall(v => v == "flag" || v == "drop"),
      s"every prefix-quoted doc must be caught: ${quoted.toSeq}")
  }

  test("q_split_leakage: injected content copies straddle every split pair") {
    val combos = face("q_split_leakage")
      .select(col("split_combo"), col("n_fingerprints"))
      .as[(String, Long)].collect().toMap
    Seq("test+train", "test+val", "train+val").foreach { c =>
      assert(combos.getOrElse(c, 0L) > 0L,
        s"no leaked fingerprints for $c; observed: $combos")
    }
  }

  test("q_embed_outliers: every injected 10x-rescaled row is flagged") {
    val injectedPerLabel = spark.read
      .parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 25 === 0)
      .groupBy(col("label")).count()
      .as[(Int, Long)].collect().toMap
    assert(injectedPerLabel.values.sum > 0, "no injected rows at this sf")
    val out = face("q_embed_outliers")
      .select(col("label"), col("n_outliers"))
      .as[(Int, Long)].collect().toMap
    injectedPerLabel.foreach { case (label, injected) =>
      assert(out.getOrElse(label, 0L) >= injected,
        s"label $label: ${out.get(label)} outliers < $injected injected")
    }
    // and labels without injections exist too — the screen is not
    // flagging everything indiscriminately
    val clean = out.keySet -- injectedPerLabel.keySet
    assert(clean.forall(l => out(l) == 0L),
      s"false positives on injection-free labels: ${clean.map(l => l -> out(l))}")
  }

  test("q_frame_dedup: exactly the injected re-uploads pair up, at jaccard 1") {
    val expectedCopies = spark.read
      .parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 5 === 0 && col("doc_id") % 15 === 0)
      .count()
    assert(expectedCopies > 0, "no injected copies at this sf")
    val pairs = face("q_frame_dedup")
      .select(col("id_a"), col("id_b"), col("jaccard_r"))
      .as[(Long, Long, Double)].collect()
    assert(pairs.length.toLong == expectedCopies,
      s"${pairs.length} pairs vs $expectedCopies injected copies")
    pairs.foreach { case (a, b, j) =>
      assert(b == a + 1000000L, s"non-injected pair ($a, $b) reported")
      assert(j == 1.0, s"copy pair ($a, $b) at jaccard $j, expected 1.0")
    }
  }
}
