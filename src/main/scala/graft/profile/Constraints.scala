package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the "expectations"
  * validation layer (reference app.py's quality checks generalized to a
  * reusable rule engine; cf. the public Deequ/Great-Expectations model):
  * a caller declares what must hold, `validate` returns one row per
  * rule with its violation count and verdict.
  *
  * Scale shape is the point of the design:
  *   - ALL row-local rules (not-null / range / regex / accepted-values /
  *     custom predicate) are fused into a SINGLE conditional-aggregation
  *     pass — one scan of the table no matter how many rules, partial
  *     aggs absorb everything map-side, and the shuffle carries exactly
  *     one row. Adding a 50th rule costs one more counter, not a scan.
  *   - `Unique` costs one partial-agg shuffle on its key columns.
  *   - `RefIntegrity` costs one join against the DISTINCT reference keys
  *     (Catalyst broadcasts when small; at 100 TB a big FK check is an
  *     honest shuffle join — there is no cheaper exact answer).
  * The result is always a tiny frame (#rules rows), safe to collect,
  * join into dashboards, or gate a pipeline on.
  *
  * Null semantics follow SQL constraint conventions: only `NotNull`
  * fails on NULL; every other rule treats NULL as out of scope (a NULL
  * FK is not an orphan, a NULL value is not out of range) so rules
  * compose instead of double-counting missingness.
  */
object Constraints {

  sealed trait Check {
    /** Rule kind tag in the report. */
    def kind: String
    /** Column(s) the rule targets, rendered for the report. */
    def target: String
  }
  /** Column must not contain NULLs. */
  final case class NotNull(column: String) extends Check {
    val kind = "not_null"; val target = column
  }
  /** Non-null values must fall in [lo, hi] (inclusive both ends). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Check {
    val kind = "in_range"; val target = column
  }
  /** Non-null values must match `regex` (RE2-portable subset: keep to
    * character classes/anchors/quantifiers so oracles can mirror it). */
  final case class Matches(column: String, regex: String) extends Check {
    val kind = "matches"; val target = column
  }
  /** Non-null values must be one of `values`. */
  final case class AcceptedValues(column: String, values: Seq[String])
      extends Check {
    val kind = "accepted_values"; val target = column
  }
  /** Rows where every key column is non-null must be unique on the key.
    * Violations = surplus rows (total keyed rows - distinct keys). */
  final case class Unique(columns: Seq[String]) extends Check {
    val kind = "unique"; val target = columns.mkString(",")
  }
  /** Non-null values must exist in `ref`'s `refColumn` (FK check).
    * Violations = orphan rows. */
  final case class RefIntegrity(column: String, ref: DataFrame,
      refColumn: String) extends Check {
    val kind = "ref_integrity"; val target = column
  }
  /** Escape hatch: rows where `violated` evaluates true are violations;
    * fused into the same single row-local pass. */
  final case class Predicate(name: String, violated: Column) extends Check {
    val kind = "predicate"; val target = name
  }

  /** Evaluate every rule against `df`; returns
    * (check_kind, target, violations, n_checked, ok) sorted by
    * (check_kind, target) — deterministic under any partitioning.
    * n_checked is the rule's own scope: all rows for row-local rules,
    * fully-non-null-keyed rows for `Unique`, non-null FK rows for
    * `RefIntegrity`. */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val rowLocal: Seq[(Check, Column)] = checks.collect {
      case c @ NotNull(col0) => c -> col(col0).isNull
      case c @ InRange(col0, lo, hi) =>
        c -> (col(col0).isNotNull &&
          (col(col0) < lit(lo) || col(col0) > lit(hi)))
      case c @ Matches(col0, re) =>
        c -> (col(col0).isNotNull && !col(col0).rlike(re))
      case c @ AcceptedValues(col0, vs) =>
        c -> (col(col0).isNotNull && !col(col0).isin(vs: _*))
      case c @ Predicate(_, v) => c -> v
    }
    val spark = df.sparkSession
    import spark.implicits._
    val fusedOpt: Option[DataFrame] =
      if (rowLocal.isEmpty) None
      else {
        val aggs = count(lit(1)).as("__n") +: rowLocal.zipWithIndex.map {
          case ((_, viol), i) =>
            sum(when(viol, 1L).otherwise(0L)).as(s"__v$i")
        }
        val one = df.agg(aggs.head, aggs.tail: _*)
        // unpivot the single agg row into one report row per rule
        val entries = rowLocal.zipWithIndex.map { case ((c, _), i) =>
          struct(lit(c.kind).as("check_kind"), lit(c.target).as("target"),
            coalesce(col(s"__v$i"), lit(0L)).as("violations"),
            col("__n").as("n_checked"))
        }
        Some(one.select(explode(array(entries: _*)).as("e"))
          .select(col("e.*")))
      }
    val uniques = checks.collect { case Unique(cols0) =>
      val keyed = df.filter(cols0.map(col(_).isNotNull).reduce(_ && _))
      keyed.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c") - 1L), lit(0L)).as("violations"),
          coalesce(sum(col("__c")), lit(0L)).as("n_checked"))
        .select(lit("unique").as("check_kind"),
          lit(cols0.mkString(",")).as("target"),
          col("violations"), col("n_checked"))
    }
    val refs = checks.collect { case RefIntegrity(col0, ref, refCol) =>
      val fk = df.filter(col(col0).isNotNull).select(col(col0))
      val orphans = fk.join(ref.select(col(refCol).as(col0)).distinct(),
        Seq(col0), "left_anti")
      fk.agg(count(lit(1)).as("n_checked"))
        .crossJoin(broadcast(
          orphans.agg(count(lit(1)).as("violations"))))
        .select(lit("ref_integrity").as("check_kind"),
          lit(col0).as("target"), col("violations"), col("n_checked"))
    }
    (fusedOpt.toSeq ++ uniques ++ refs)
      .reduce(_ unionByName _)
      .withColumn("ok", col("violations") === 0L)
      .orderBy(col("check_kind"), col("target"))
  }

  /** Unique-column-combination (key candidate) DISCOVERY — the third
    * leg of schema profiling next to [[fdDiscovery]] and
    * [[indDiscovery]]: for each candidate column set, distinct count
    * vs non-null rows and the duplicate share; a candidate is a key
    * when every complete row is distinct AND nothing was null
    * (SQL key semantics: keys admit no nulls — a candidate with null
    * rows is reported with `n_nulls` > 0 and is_key = false even if
    * the non-null part is unique). All candidates evaluated
    * independently and unioned; each is one map-side-combined
    * distinct + a count — two columns on the wire. */
  def uccDiscovery(df: DataFrame, candidates: Seq[Seq[String]])
      : DataFrame = {
    require(candidates.nonEmpty, "no candidate column sets given")
    candidates.map { cols0 =>
      val allNN = cols0.map(col(_).isNotNull).reduce(_ && _)
      df.agg(count(lit(1)).as("n_total"),
          sum(when(allNN, 1L).otherwise(0L)).as("n_rows"))
        .crossJoin(broadcast(
          df.filter(allNN).select(cols0.map(col): _*).distinct()
            .agg(count(lit(1)).as("n_distinct"))))
        .select(lit(cols0.mkString(",")).as("column_set"),
          col("n_total"),
          (col("n_total") - coalesce(col("n_rows"), lit(0L))).as("n_nulls"),
          col("n_distinct"),
          (coalesce(col("n_rows"), lit(0L)) - col("n_distinct"))
            .as("n_duplicate_rows"))
        .withColumn("is_key",
          col("n_nulls") === 0L && col("n_duplicate_rows") === 0L)
    }.reduce(_ unionByName _)
  }

  /** Inclusion-dependency (foreign-key candidate) DISCOVERY — the
    * cross-table half of schema profiling, paired with
    * [[fdDiscovery]]: for each candidate (child column ⊆ parent
    * column), measure containment — the share of the child's distinct
    * non-null values present in the parent. Containment 1.0 = a valid
    * FK target; high-but-under-1 = a broken reference worth a
    * RefIntegrity rule. Direction matters and both directions are
    * often informative, so candidates are explicit (childCol,
    * parentDf, parentCol) triples; nulls are excluded on both sides
    * (SQL FK semantics).
    *
    * Scale shape, per candidate: distinct-shrink both sides to single
    * columns, then one left_anti join keyed on the value — the same
    * orphan-count shape [[validate]]'s RefIntegrity uses, evaluated
    * per pair and unioned. Exchanges carry one column of distinct
    * values. */
  def indDiscovery(child: DataFrame,
      candidates: Seq[(String, DataFrame, String)]): DataFrame = {
    require(candidates.nonEmpty, "no candidate inclusions given")
    candidates.map { case (childCol, parent, parentCol) =>
      val cvals = child.filter(col(childCol).isNotNull)
        .select(col(childCol).as("__v")).distinct()
      val orphans = cvals.join(
        parent.filter(col(parentCol).isNotNull)
          .select(col(parentCol).as("__v")).distinct(),
        Seq("__v"), "left_anti")
      cvals.agg(count(lit(1)).as("n_child_distinct"))
        .crossJoin(broadcast(
          orphans.agg(count(lit(1)).as("n_orphans"))))
        .select(lit(childCol).as("child_col"),
          lit(parentCol).as("parent_col"),
          col("n_child_distinct"), col("n_orphans"))
        .withColumn("containment",
          when(col("n_child_distinct") > 0,
            round((col("n_child_distinct") - col("n_orphans"))
              .cast("double") / col("n_child_distinct").cast("double"), 6))
            .otherwise(1.0))
        .withColumn("is_fk_candidate", col("n_orphans") === 0L)
    }.reduce(_ unionByName _)
  }

  /** Approximate functional-dependency DISCOVERY (the profiling
    * complement of [[validate]]'s declared rules): for each candidate
    * determinant→dependent pair, measure how close `det → dep` is to
    * holding. Per pair: group by the determinant over the DISTINCT
    * (det, dep) projection and report (a) the violating-group share —
    * groups whose dependent takes more than one distinct value, over
    * all groups — and (b) the surplus distinct pairs (the minimum
    * number of (det, dep) assignments to retract for the FD to hold
    * exactly). An FD "holds" at eps when the violating-group share
    * is ≤ eps.
    *
    * Null discipline: rows with a null determinant are excluded (a
    * null key determines nothing); null dependents count as a value
    * (two rows (a, null),(a, x) DO violate a → x).
    *
    * Scale shape, per pair: one map-side-combined distinct on
    * (det, dep) then a groupBy(det) over the shrunken pairs; both
    * exchanges carry two columns. Pairs are evaluated independently
    * and unioned — candidate lists are small (schema-sized), data is
    * not. */
  def fdDiscovery(df: DataFrame,
      candidates: Seq[(String, String)], eps: Double = 0.0): DataFrame = {
    require(candidates.nonEmpty, "no candidate pairs given")
    candidates.map { case (det, dep) =>
      val pairs = df.filter(col(det).isNotNull)
        .select(col(det).as("__det"), col(dep).as("__dep"))
        .distinct()
      pairs.groupBy(col("__det"))
        .agg(count(lit(1)).as("__ndep"))
        .agg(count(lit(1)).as("n_groups"),
          sum(when(col("__ndep") > 1, 1L).otherwise(0L))
            .as("violating_groups"),
          sum(col("__ndep") - 1L).as("surplus_pairs"))
        .select(lit(det).as("determinant"), lit(dep).as("dependent"),
          coalesce(col("n_groups"), lit(0L)).as("n_groups"),
          coalesce(col("violating_groups"), lit(0L)).as("violating_groups"),
          coalesce(col("surplus_pairs"), lit(0L)).as("surplus_pairs"))
        .withColumn("violation_share",
          when(col("n_groups") > 0,
            round(col("violating_groups").cast("double") /
              col("n_groups").cast("double"), 6)).otherwise(0.0))
        .withColumn("holds", col("violation_share") <= eps)
    }.reduce(_ unionByName _)
  }
}
