package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector / fingerprint hot paths.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) evaluate one
  * interpreted lambda dispatch PER ELEMENT — a 64-dim dot product costs
  * ~130 boxed closure calls. These expressions run one tight JVM loop per
  * row instead (~100x less overhead at 4M+ pairs), while keeping
  * bit-identical results: same left-to-right summation order, so the
  * DuckDB oracle comparison is unaffected.
  *
  * Every expression here implements real `doGenCode` (round 2 — they were
  * CodegenFallback in round 1, which split the enclosing whole-stage-
  * codegen span and deoptimized each dedup/fingerprint stage they sat
  * in). The row kernels live in [[ExprKernels]] so the interpreted path
  * and the generated code share one implementation; generated code calls
  * the kernel through a bound reference — one virtual call per row, and
  * the enclosing WholeStageCodegen span stays fused.
  */
object ExprKernels extends Serializable {

  private val digest = ThreadLocal.withInitial(
    new java.util.function.Supplier[java.security.MessageDigest] {
      def get(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    })

  private def h64(bytes: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(bytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** First 60 bits of md5 — numerically identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)`. */
  def md5h64(s: UTF8String): Long = h64(s.getBytes)

  /** 32-bit SimHash over 60-bit token hashes: bit j set iff the sum over
    * tokens of (2*((h>>j)&1) - 1) is positive. */
  def simhash32(arr: ArrayData): Long = {
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
    out
  }

  /** MinHash signature: out[i] = min over h of (a_i*(h mod p)+b_i) mod p.
    * Empty input yields an all-null signature — the HOF formulation
    * (array_min of empty) and DuckDB's list_min both give NULL slots. */
  def minhashSig(arr: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val ks = as.length
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](ks))
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
    ArrayData.toArrayData(out)
  }

  /** One-pass L2 normalize; zero vectors pass through unchanged. */
  def normalizeD(arr: ArrayData): ArrayData = {
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
      ArrayData.toArrayData(out)
    }
  }

  /** Distinct k-char-shingle hashes in first-occurrence order; strings
    * shorter than k hash as one whole-string shingle. Windows over UTF-16
    * chars — callers pass ASCII-normalized input (TextStats.normalized);
    * supplementary characters would split surrogate pairs, diverging from
    * the code-point substr formulation (see DedupSpec contract test). */
  def charShingleHashes(u: UTF8String, k: Int): ArrayData = {
    val s = u.toString
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
    ArrayData.toArrayData(out.toArray)
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
    * public paper): distinct window-minimum Karp-Rabin k-gram hashes.
    * Guarantee: any substring of length >= w + k - 1 shared by two
    * documents contributes at least one SHARED fingerprint to both —
    * position-independent (the selection is content-defined), so
    * cross-document matches are caught at any alignment, at expected
    * density 2/(w+1) of the gram stream. This is the Spark-first
    * re-expression of suffix-array exact-substring dedup (Lee et al.
    * 2022): instead of a global suffix sort, each doc emits O(n/w)
    * fingerprints and duplication becomes a hash-join problem.
    *
    * Gram hash = polynomial (h*31 + char) mod (2^31-1), rolled in O(1)
    * per position; window min is by VALUE only (positions are not
    * emitted), so no tie-break is needed and the DuckDB mirror is a
    * plain `list_min` over a slice. ASCII-normalized input expected
    * (same contract as [[charShingleHashes]]); strings shorter than k
    * fingerprint as one whole-string hash (so exact duplicates always
    * share fingerprints regardless of length); the empty string hashes
    * to 0. */
  def winnowFingerprints(u: UTF8String, k: Int, w: Int): ArrayData = {
    val s = u.toString
    val n = s.length
    val P = 2147483647L
    def polyAll(): Long = {
      var h = 0L; var i = 0
      while (i < n) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
      h
    }
    if (n < k) return ArrayData.toArrayData(Array(polyAll()))
    val nGrams = n - k + 1
    val gh = new Array[Long](nGrams)
    var pow = 1L
    var i = 1
    while (i < k) { pow = (pow * 31) % P; i += 1 }
    var h = 0L
    i = 0
    while (i < k) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
    gh(0) = h
    i = 1
    while (i < nGrams) {
      h = ((h - (s.charAt(i - 1) * pow) % P + P) * 31 + s.charAt(i + k - 1)) % P
      gh(i) = h
      i += 1
    }
    val out = new scala.collection.mutable.ArrayBuffer[Long]()
    val seen = new java.util.HashSet[Long]()
    if (nGrams <= w) {
      var m = gh(0); i = 1
      while (i < nGrams) { if (gh(i) < m) m = gh(i); i += 1 }
      out += m
    } else {
      var j = 0
      while (j + w <= nGrams) {
        var m = gh(j); var t = j + 1
        while (t < j + w) { if (gh(t) < m) m = gh(t); t += 1 }
        if (seen.add(m)) out += m
        j += 1
      }
    }
    ArrayData.toArrayData(out.toArray)
  }
}

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
  // the loop inlines into the enclosing WholeStageCodegen stage, so
  // pairwise-join plans keep one fused span
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
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

/** See [[ExprKernels.simhash32]]. */
case class SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprKernels.simhash32(input.asInstanceOf[ArrayData]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernels", ExprKernels,
      "graft.functions.ExprKernels$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.simhash32($c);")
  }
  override protected def withNewChildInternal(c: Expression): SimHash32 =
    copy(child = c)
}

/** See [[ExprKernels.minhashSig]]. Element type is nullable only for the
  * (unreachable-by-construction) empty-input signature. */
case class MinHashSig(child: Expression, ks: Int)
    extends UnaryExpression {
  private val as: Array[Long] = (0 until ks).map(Hashing.permuteA).toArray
  private val bs: Array[Long] = (0 until ks).map(Hashing.permuteB).toArray
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def nullSafeEval(input: Any): Any =
    ExprKernels.minhashSig(input.asInstanceOf[ArrayData], as, bs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernels", ExprKernels,
      "graft.functions.ExprKernels$")
    val asRef = ctx.addReferenceObj("as", as, "long[]")
    val bsRef = ctx.addReferenceObj("bs", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.minhashSig($c, $asRef, $bsRef);")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** See [[ExprKernels.normalizeD]]. */
case class NormalizeD(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprKernels.normalizeD(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernels", ExprKernels,
      "graft.functions.ExprKernels$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.normalizeD($c);")
  }
  override protected def withNewChildInternal(c: Expression): NormalizeD =
    copy(child = c)
}

/** See [[ExprKernels.charShingleHashes]]. */
case class CharShingleHashes(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprKernels.charShingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernels", ExprKernels,
      "graft.functions.ExprKernels$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.charShingleHashes($c, $k);")
  }
  override protected def withNewChildInternal(c: Expression): CharShingleHashes =
    copy(child = c)
}

/** See [[ExprKernels.winnowFingerprints]] — one fused pass (rolling
  * hash + window min) per document, O(len * w) worst case with w a
  * small constant; the HOF formulation would be two materialized
  * intermediate arrays and ~len * w boxed lambda calls. */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ExprKernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernels", ExprKernels,
      "graft.functions.ExprKernels$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $kernel.winnowFingerprints($c, $k, $w);")
  }
  override protected def withNewChildInternal(c: Expression): WinnowFingerprints =
    copy(child = c)
}

/** See [[ExprKernels.md5h64]] — the shingle-hashing hot path runs
  * millions of these per corpus pass. */
case class StringHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    java.lang.Long.valueOf(ExprKernels.md5h64(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val kernel = ctx.addReferenceObj("kernels", ExprKernels,
      "graft.functions.ExprKernels$")
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $kernel.md5h64($c);")
  }
  override protected def withNewChildInternal(c: Expression): StringHash64 =
    copy(child = c)
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
  def winnow_fingerprints(norm: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(norm), k, w))
}
