package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashing primitives for the dedup / fingerprint tier.
  *
  * `hash64` is deliberately md5-based rather than `xxhash64`: the
  * correctness oracle (DuckDB) has no xxhash64, while md5 is bit-identical
  * in both engines — `CAST(('0x' || substr(md5(x),1,15)) AS BIGINT)` in
  * DuckDB equals this column exactly. 60 bits, always non-negative.
  *
  * MinHash uses one md5 per shingle plus k universal-hash permutations
  * `(a_i * h + b_i) mod p` (p = 2^31 - 1) instead of k independent md5s —
  * at 100 TB that's the difference between 1 and k digest passes per
  * shingle. Constants are Knuth multiplicative; everything stays in
  * non-overflowing BIGINT range so ANSI mode never trips.
  */
object Hashing {
  /** Mersenne prime 2^31 - 1 — modulus for the permutation family. */
  val P: Long = 2147483647L

  /** Portable 60-bit hash: first 15 hex chars of md5 — implemented as a
    * native expression (StringHash64, spec-checked equal to the column
    * formula `conv(substring(md5(x),1,15),16,10)`). */
  def hash64(c: Column): Column =
    VectorExprs.string_hash64(c.cast(StringType))

  /** DuckDB rendering of [[hash64]] (for oracle SQL). */
  def hash64Sql(expr: String): String =
    s"CAST(('0x' || substr(md5(CAST($expr AS VARCHAR)), 1, 15)) AS BIGINT)"

  def permuteA(i: Int): Long = ((i + 1) * 2654435761L) % P
  def permuteB(i: Int): Long = ((i + 1) * 40503L) % P

  /** i-th permutation of a base hash, in [0, P). */
  def permute(h: Column, i: Int): Column =
    (lit(permuteA(i)) * (h % P) + lit(permuteB(i))) % P

  def permuteSql(h: String, i: Int): String =
    s"(${permuteA(i)} * (($h) % $P) + ${permuteB(i)}) % $P"

  /** Column wrapper for the codegen'd rolling hash (Spark 4 Column <->
    * Expression bridge). */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      RollingHash(org.apache.spark.sql.GraftBridge.expression(c)))
}

/** Polynomial rolling hash over a string's UTF-8 bytes:
  * `h = (h * 31 + byte) mod (2^31 - 1)` — the classic Karp-Rabin
  * fingerprint. A native Catalyst expression with whole-stage codegen
  * (no UDF serialization, no boxing), used for document fingerprinting
  * where a cheap order-sensitive digest beats md5 by ~10x.
  */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"rolling_hash needs STRING, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * 31 + (bytes(i) & 0xff)) % 2147483647L
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = ($h * 31 + ($bytes[$i] & 0xff)) % 2147483647L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}
