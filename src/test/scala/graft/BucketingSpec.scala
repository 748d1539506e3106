package graft

import org.apache.spark.sql.functions._

/** Scale-evidence spec: bucketing co-locates join keys so the join plan
  * has NO shuffle exchange — the SCALE.md claim, asserted on the actual
  * physical plan. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables sort-merge join without any Exchange") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select("o_orderkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed").hint("merge"),
        $"l_orderkey" === $"o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle:\n$plan")
    // and it still computes the right thing
    assert(joined.count() == li.count())
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }

  test("bucketed corpus: the langId enrich join-back moves NO document " +
      "text (the scaladoc remedy, proven on the plan)") {
    // ModelSeamSpec pins that on an unbucketed corpus the final enrich
    // join-back of withLangIdProfile co-partitions the docs (text moves
    // once). The documented remedy is a doc_id-bucketed layout: the
    // text side then reads pre-partitioned and ONLY the narrow
    // (doc_id, verdict) side may shuffle to match the buckets.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    docs.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .mode("overwrite").saveAsTable("docs_bucketed")
    val bucketed = spark.table("docs_bucketed")
    val out = graft.ext.TextStats.withLangIdProfile(
      bucketed, "doc_id", "text",
      graft.ext.ModelFixtures.langProfileDf(spark))
    val plan = out.queryExecution.executedPlan.toString
    // the text column must appear in NO exchange's child output: every
    // hashpartitioning exchange in this plan carries only narrow
    // derived rows ((word, lang) profile rows, (id, lang) hits, or the
    // (id, verdict) join-back side)
    val exchanges = plan.split("\n")
      .zipWithIndex.filter(_._1.contains("Exchange hashpartitioning"))
    assert(exchanges.nonEmpty, s"expected narrow-side exchanges:\n$plan")
    exchanges.foreach { case (line, _) =>
      assert(!line.contains("text#"),
        s"an exchange partitions by/carries text: $line\n$plan")
    }
    // stronger: the doc scan feeding the final join is the bucketed
    // relation with no Exchange between scan and join on the text path.
    // Count doc-text scans vs exchanges touching doc_id partitioning of
    // a text-bearing child: the SortMergeJoin text side must read
    // "Bucketed: true"
    assert(plan.contains("Bucketed: true"),
      s"join-back must consume the bucketed layout:\n$plan")
    // verdicts identical to the unbucketed path
    val plain = graft.ext.TextStats.withLangIdProfile(
      docs, "doc_id", "text",
      graft.ext.ModelFixtures.langProfileDf(spark))
      .select($"doc_id", $"predicted").as[(Long, String)].collect().toMap
    val got = out.select($"doc_id", $"predicted")
      .as[(Long, String)].collect().toMap
    assert(got == plain)
    spark.sql("DROP TABLE docs_bucketed")
  }
}
