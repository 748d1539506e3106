package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Native Catalyst expressions for the vector / fingerprint hot paths.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate one
  * interpreted lambda dispatch PER ELEMENT — a 64-dim dot product costs
  * ~130 boxed closure calls. These expressions run one tight JVM loop per
  * row instead (~100x less overhead at 4M+ pairs), while keeping
  * bit-identical results: same left-to-right summation order, so the
  * DuckDB oracle comparison is unaffected.
  *
  * CodegenFallback is deliberate: the expression itself is a compiled
  * Scala loop (the per-element interpretation is what hurt, not the
  * per-row call); a doGenCode version is a further ~2x if profiling ever
  * demands it.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i) // left-to-right, like zip_with+aggregate
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
  // real codegen (not fallback): the loop inlines into the enclosing
  // WholeStageCodegen stage, so pairwise-join plans keep one fused span
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : DotProductD = copy(left = l, right = r)
}

/** 32-bit SimHash over an array of 60-bit token hashes: bit j of the
  * result is set iff the sum over tokens of (2*((h>>j)&1) - 1) is
  * positive. Integer votes are order-independent, so this matches the
  * HOF formulation and the DuckDB oracle exactly. One pass over tokens,
  * 32 counters — O(32*T) compiled vs O(32*T) interpreted lambdas. */
case class SimHash32(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }
  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
}

/** MinHash signature over an array of base hashes: out[i] = min over h of
  * (a_i * (h mod p) + b_i) mod p — identical to the HOF formulation and
  * the DuckDB oracle (same constants, same arithmetic), one compiled
  * k x T loop instead of k x T interpreted lambdas. */
case class MinHashSig(child: Expression, ks: Int)
    extends UnaryExpression with CodegenFallback {
  private val as: Array[Long] = (0 until ks).map(Hashing.permuteA).toArray
  private val bs: Array[Long] = (0 until ks).map(Hashing.permuteB).toArray
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = Array.fill(ks)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hm = arr.getLong(i) % Hashing.P
      var j = 0
      while (j < ks) {
        val v = (as(j) * hm + bs(j)) % Hashing.P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** L2-normalize an array<double> in one pass (norm computed once; the
  * HOF formulation re-evaluates the norm's dot product for EVERY element
  * of the output — 64x redundant work on 64-dim vectors). Zero vectors
  * pass through unchanged, matching `when(n > 0, ...)`. */
case class NormalizeD(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var s = 0.0
    var i = 0
    while (i < n) { val x = arr.getDouble(i); s += x * x; i += 1 }
    if (s <= 0.0) arr
    else {
      val norm = math.sqrt(s)
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = arr.getDouble(i) / norm; i += 1 }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }
  }
  override protected def withNewChildInternal(c: Expression): NormalizeD =
    copy(child = c)
}

/** Distinct character-k-shingle hashes of an (already normalized) string
  * in one pass: slide a k-char window, md5 each window (same 60-bit
  * truncation as StringHash64), first-occurrence order. Replaces
  * transform(sequence...substr) + array_distinct + hash64 — which costs
  * O(len^2) array_distinct comparisons plus per-element expression
  * machinery. Strings shorter than k hash as a single whole-string
  * shingle (matching charShinglesOfNormalized's otherwise-branch). */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  private def h64(bytes: Array[Byte]): Long = {
    val md = StringHash64.digest.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }
  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[Long]()
    if (s.length < k) {
      out += h64(s.getBytes("UTF-8"))
    } else {
      var i = 0
      while (i + k <= s.length) {
        val h = h64(s.substring(i, i + k).getBytes("UTF-8"))
        if (seen.add(h)) out += h
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out.toArray)
  }
  override protected def withNewChildInternal(c: Expression): CharShingleHashes =
    copy(child = c)
}

/** Native md5-based 60-bit hash: numerically identical to
  * `conv(substring(md5(x), 1, 15), 16, 10)` (first 15 hex chars = first
  * 7.5 bytes of the digest) but one JVM call per value instead of a
  * 4-node interpreted expression tree — the shingle-hashing hot path
  * runs millions of these. */
case class StringHash64(child: Expression) extends UnaryExpression
    with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = {
    val md = StringHash64.digest.get()
    md.reset()
    val d = md.digest(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    java.lang.Long.valueOf((acc << 4) | ((d(7) & 0xf0L) >> 4))
  }
  override protected def withNewChildInternal(c: Expression): StringHash64 =
    copy(child = c)
}
object StringHash64 {
  private[functions] val digest = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })
}

object VectorExprs {
  def string_hash64(c: Column): Column =
    GraftBridge.column(StringHash64(GraftBridge.expression(c)))
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(DotProductD(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  def simhash32(tokenHashes: Column): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(tokenHashes)))
  def minhash_sig(shingleHashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSig(GraftBridge.expression(shingleHashes), k))
  def normalize_d(v: Column): Column =
    GraftBridge.column(NormalizeD(GraftBridge.expression(v)))
  def char_shingle_hashes(norm: Column, k: Int): Column =
    GraftBridge.column(CharShingleHashes(GraftBridge.expression(norm), k))
}
