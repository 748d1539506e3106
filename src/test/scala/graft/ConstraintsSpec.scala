package graft

import org.apache.spark.sql.functions._

import graft.profile.Constraints
import graft.profile.Constraints._

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def report(rows: Seq[(String, String, Long, Long, Boolean)]) = rows

  test("all five rule classes, hand-counted violations and null scoping") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 5.0, "A"),
      (1L, 50.0, "B"),    // dup id, out-of-range hi, bad code
      (2L, -1.0, "A"),    // out-of-range lo
      (null, null, null), // null id/val/code: only not_null counts it
      (3L, 10.0, "C")
    ).toDF("id", "v", "code")
    val ref = Seq(1L, 2L).toDF("k") // id=3 is an orphan
    val got = Constraints.validate(df, Seq(
      NotNull("id"),
      InRange("v", 0.0, 20.0),
      Matches("code", "^[AB]$"),
      AcceptedValues("code", Seq("A", "B")),
      Unique(Seq("id")),
      RefIntegrity("id", ref, "k"),
      Predicate("v_gt_40", col("v") > 40.0)))
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got == report(Seq(
      ("accepted_values", "code", 1L, 5L, false), // C
      ("in_range", "v", 2L, 5L, false),           // 50, -1; null passes
      ("matches", "code", 1L, 5L, false),         // C
      ("not_null", "id", 1L, 5L, false),
      ("predicate", "v_gt_40", 1L, 5L, false),    // 50
      ("ref_integrity", "id", 1L, 4L, false),     // id=3; null FK skipped
      ("unique", "id", 1L, 4L, false)             // two id=1 rows -> 1 surplus
    )))
  }

  test("clean table is all-ok and row-local rules share one scan") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "s")
    val rowLocalOnly = Seq(
      NotNull("id"), NotNull("s"), InRange("id", 0.0, 10.0),
      Matches("s", "^[a-z]+$"))
    val got = Constraints.validate(df, rowLocalOnly)
    assert(got.as[(String, String, Long, Long, Boolean)].collect()
      .forall(r => r._3 == 0L && r._4 == 2L && r._5))
    // fused row-local pass = exactly one aggregate source scan: no join,
    // no union of per-rule subplans
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
  }

  test("unique with nulls: null-keyed rows are out of scope") {
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (1L, "b"),
      (null, "c"), (null, "d")).toDF("k", "s")
    val got = Constraints.validate(df, Seq(Unique(Seq("k"))))
      .as[(String, String, Long, Long, Boolean)].head()
    assert(got == (("unique", "k", 1L, 2L, false)))
  }

  test("empty table: zero violations, zero checked, ok") {
    val df = Seq.empty[(Long, String)].toDF("id", "s")
    val ref = Seq(1L).toDF("k")
    val got = Constraints.validate(df,
      Seq(NotNull("id"), Unique(Seq("id")), RefIntegrity("id", ref, "k")))
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(got == report(Seq(
      ("not_null", "id", 0L, 0L, true),
      ("ref_integrity", "id", 0L, 0L, true),
      ("unique", "id", 0L, 0L, true))))
  }

  test("fdDiscovery: held and violated FDs, null-determinant exclusion, " +
      "null dependent counts as a value, surplus = retractions to repair") {
    import graft.profile.Constraints
    val df = Seq(
      (1L, Option("a"), Option("x")),
      (2L, Option("a"), Option("x")),   // duplicate pair: no violation
      (3L, Option("b"), Option("y")),
      (4L, Option("b"), Option("z")),   // b -> {y, z}: violating group
      (5L, Option("c"), None),          // null dependent IS a value
      (6L, Option("c"), Option("w")),   // c -> {null, w}: violating group
      (7L, None, Option("q")))          // null determinant: excluded
      .toDF("id", "det", "dep")
    val out = Constraints.fdDiscovery(df,
        Seq("id" -> "det", "det" -> "dep"))
      .as[(String, String, Long, Long, Long, Double, Boolean)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    // id is a key: FD holds over all 7 rows
    assert(out(("id", "det")) == (("id", "det", 7L, 0L, 0L, 0.0, true)))
    // det -> dep: groups a (1 dep), b (2), c (2); 2 of 3 violate,
    // surplus = 2 retractions (one each in b and c)
    assert(out(("det", "dep")) ==
      (("det", "dep", 3L, 2L, 2L, round2(2.0 / 3.0), false)),
      s"got ${out(("det", "dep"))}")
  }

  private def round2(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("indDiscovery: full containment is an FK candidate, orphans are " +
      "counted distinct, nulls excluded both sides") {
    import graft.profile.Constraints
    val child = Seq(Option(1L), Option(1L), Option(2L), Option(9L),
      Option(9L), None).toDF("fk")
    val parent = Seq(Option(1L), Option(2L), Option(3L), None).toDF("pk")
    val out = Constraints.indDiscovery(child, Seq(("fk", parent, "pk")))
      .as[(String, String, Long, Long, Double, Boolean)].collect()
    // distinct non-null child values {1, 2, 9}; 9 is the one orphan
    assert(out.toSeq == Seq(("fk", "pk", 3L, 1L,
      BigDecimal(2.0 / 3.0).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, false)), out.toSeq)
    val held = Constraints.indDiscovery(
      child.filter($"fk" =!= 9L), Seq(("fk", parent, "pk"))).collect()(0)
    assert(held.getAs[Long]("n_orphans") == 0 &&
      held.getAs[Boolean]("is_fk_candidate"))
  }

  test("uccDiscovery: keys admit no nulls, duplicate accounting, " +
      "composite candidates") {
    import graft.profile.Constraints
    val df = Seq(
      (Option(1L), "a"), (Option(2L), "a"), (Option(2L), "b"),
      (None, "c"))
      .toDF("k", "v")
    val out = Constraints.uccDiscovery(df,
        Seq(Seq("k"), Seq("v"), Seq("k", "v")))
      .as[(String, Long, Long, Long, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    // k: one null row, one duplicate among the 3 non-null
    assert(out("k") == (("k", 4L, 1L, 2L, 1L, false)), out("k"))
    // v: no nulls, "a" duplicated
    assert(out("v") == (("v", 4L, 0L, 3L, 1L, false)))
    // (k, v): non-null part IS unique, but the null row vetoes keyhood
    assert(out("k,v") == (("k,v", 4L, 1L, 3L, 0L, false)))
    val keyed = Constraints.uccDiscovery(df.filter($"k".isNotNull),
      Seq(Seq("k", "v"))).collect()(0)
    assert(keyed.getAs[Boolean]("is_key"), "complete unique set is a key")
  }
}
