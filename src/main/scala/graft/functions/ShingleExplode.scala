package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** UDTF (table-generating function) face of the extension surface — the
  * third leg next to the scalar registry (GraftFunctions) and the
  * Moments UDAF; the reference has no user-extensible functions of any
  * kind (SURVEY §2.5).
  *
  * One output row per distinct word n-gram shingle of the normalized
  * text, in first-occurrence order with its position:
  *
  * {{{
  * SELECT doc_id, pos, shingle
  * FROM docs LATERAL VIEW graft_shingles(text, 3) g AS pos, shingle
  * }}}
  *
  * Row semantics are EXACTLY [[graft.ext.Dedup.wordShingles]] (same
  * normalization `lower -> [^a-z0-9]+ -> ' ' -> trim`, same
  * fewer-than-n fallback to one whole-text shingle), spec-locked
  * against the column formulation — so SQL users shingling via the
  * UDTF and pipeline users shingling via the dedup library see the
  * same shingle sets. Runs under GenerateExec: per-partition streaming
  * output, no driver involvement, parallelism preserved.
  */
case class ShingleExplode(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs STRING, got ${child.dataType}")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) return Nil
    // parity with TextStats.normalized: Spark's lower() is
    // UTF8String.toLowerCase and regexp_replace is java.util.regex on
    // the same pattern; after collapsing to [a-z0-9 ] the String.trim
    // below strips only the same 0x20 spaces Spark's trim() does
    val norm = v.asInstanceOf[UTF8String].toLowerCase.toString
      .replaceAll("[^a-z0-9]+", " ").trim
    val toks = norm.split("\\s+").filter(_.nonEmpty).toSeq
    val shingles: Seq[String] =
      if (toks.length >= n) toks.sliding(n).map(_.mkString(" ")).distinct.toSeq
      else Seq(toks.mkString(" "))
    shingles.zipWithIndex.map { case (s, i) =>
      InternalRow(i, UTF8String.fromString(s))
    }
  }

  override protected def withNewChildInternal(c: Expression): ShingleExplode =
    copy(child = c)
}
