package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd text-hashing expressions — the production escape
 * hatch from the interpreted higher-order-function tax.
 *
 * The dedup operators are built from [[Portable]] primitives (md5 +
 * substr/ascii arithmetic that DuckDB reproduces bit-for-bit) so the
 * driver's oracle can check VALUES, but Spark evaluates HOF lambdas
 * interpreted — per shingle, per hash, per bit. These expressions
 * compute the exact same values in one generated static call per row
 * ([[RollingHash]]'s pattern — `doGenCode` keeps the whole projection
 * inside WholeStageCodegen), so operators can run the native form while
 * the portable form remains the oracle-checked specification;
 * `OperatorsSpec` asserts value identity between the two on edge cases
 * and real corpus data.
 *
 *  - `graft_shingles(text, n)`   == [[Portable.shingles]]
 *  - `graft_minhash(text, n, k)` == `Dedup.sigFromHashes(Dedup.shingleHashes(text, n), k)`
 *  - `graft_simhash64(text)`     == `Dedup.simhash64(text)`
 */
object NativeText {

  val MinhashP = 2147483647L // 2^31 - 1

  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** Whitespace words of the trimmed text — `split(trim(text), '\\s+')`
    * semantics (Java split with limit -1, matching Spark's `split`).
    * NOT `String.trim`: Java trim strips every char <= 0x20 (\n, \t,
    * \r, ...) while Spark's and DuckDB's `trim` strip the SPACE
    * character only — a doc with a leading newline would otherwise
    * produce different words (and so different shingles/signatures)
    * on the native path than the portable/oracle one. */
  private def spaceTrim(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && s.charAt(a) == ' ') a += 1
    while (b > a && s.charAt(b - 1) == ' ') b -= 1
    s.substring(a, b)
  }

  private def words(text: String): Array[String] =
    spaceTrim(text).split("\\s+", -1)

  /** Word n-gram shingles; docs of <= n words yield one whole-text
    * shingle (exact [[Portable.shinglesFromWords]] semantics). */
  def shingles(text: String, n: Int): Array[String] = {
    val ws = words(text)
    if (ws.length <= n) Array(ws.mkString(" "))
    else Array.tabulate(ws.length - n + 1)(i => {
      val sb = new java.lang.StringBuilder
      var j = i
      while (j < i + n) { if (j > i) sb.append(' '); sb.append(ws(j)); j += 1 }
      sb.toString
    })
  }

  private def md5Hex(s: String): Array[Byte] =
    md5Local.get().digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** First 8 hex nibbles of md5 as a non-negative long —
    * [[Portable.hash32]] semantics. */
  def hash32(s: String): Long = {
    val d = md5Hex(s)
    // 8 hex nibbles = first 4 digest bytes, big-endian
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** (a_j, b_j) universal-hash parameters — the single derivation both
    * the Spark-plan constants and this native path share (delegated to
    * by `Dedup.uhashParams`). */
  private val paramCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Long]]]()

  def params(k: Int): Array[Array[Long]] =
    paramCache.computeIfAbsent(k, _ => {
      def h7(s: String): Long = {
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        java.lang.Long.parseLong(hex.take(7), 16) // < 2^28
      }
      Array.tabulate(k)(j => Array(1L + 2L * h7(s"mh_a_$j"), h7(s"mh_b_$j") % MinhashP))
    })

  /** k-minhash signature of the text's word n-gram shingle multiset. */
  def minhashSig(text: String, n: Int, k: Int): Array[Long] = {
    val hs = shingles(text, n).map(hash32)
    val ps = params(k)
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      val a = ps(j)(0); val b = ps(j)(1)
      var m = Long.MaxValue
      var i = 0
      while (i < hs.length) {
        val v = java.lang.Math.floorMod(hs(i) * a + b, MinhashP)
        if (v < m) m = v
        i += 1
      }
      out(j) = m
      j += 1
    }
    out
  }

  /** 64-bit simhash — [[graft.operators.Dedup.simhash64]] semantics:
    * sign bit b of a word = bit (b mod 4) of md5 hex nibble (b div 4),
    * signature bit set when the word-sum of signs is >= 0. */
  def simhash64(text: String): Long = {
    val ws = words(text)
    val sums = new Array[Int](64)
    var w = 0
    while (w < ws.length) {
      val d = md5Hex(ws(w))
      var b = 0
      while (b < 64) {
        // hex nibble (b/4): high nibble of byte (b/8) when (b/4) even
        val byteIdx = b >> 3
        val nib = if ((b & 4) == 0) (d(byteIdx) >> 4) & 0xf else d(byteIdx) & 0xf
        sums(b) += (if (((nib >> (b & 3)) & 1) == 1) 1 else -1)
        b += 1
      }
      w += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** First 15 hex nibbles of an md5 digest as a long (60 bits — always
    * non-negative, never overflows). The portable mirror is
    * `conv(substring(md5(x),1,15),16,10)::LONG` ([[Portable.hash60]]);
    * both read the high 60 bits of the digest. */
  def hash60(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Minhash signature + sorted-distinct 60-bit gram hashes in ONE
    * shingle pass: each shingle is md5'd exactly once — the first 4
    * digest bytes feed the k universal hashes ([[hash32]] semantics,
    * so the signature is identical to [[minhashSig]]), the first 60
    * bits are the gram's set-identity hash ([[hash60]]). Compare with
    * running `graft_minhash` + `graft_shingles` side by side: that
    * shingles (and digests) the text twice and materializes the gram
    * STRINGS into the row — this emits two long arrays. */
  def sigHGrams(text: String, n: Int, k: Int): (Array[Long], Array[Long]) = {
    val sh = shingles(text, n)
    val ps = params(k)
    val mins = Array.fill(k)(Long.MaxValue)
    val hg = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      val d = md5Hex(sh(i))
      val h32 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      hg(i) = hash60(d)
      var j = 0
      while (j < k) {
        val v = java.lang.Math.floorMod(h32 * ps(j)(0) + ps(j)(1), MinhashP)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    java.util.Arrays.sort(hg)
    // in-place dedupe of the sorted gram hashes
    var w = 0
    i = 0
    while (i < hg.length) {
      if (w == 0 || hg(i) != hg(w - 1)) { hg(w) = hg(i); w += 1 }
      i += 1
    }
    (mins, if (w == hg.length) hg else java.util.Arrays.copyOf(hg, w))
  }

  /** |A ∩ B| / |A ∪ B| over two SORTED-DISTINCT long arrays by merge
    * scan — [[graft.operators.Dedup.jaccard]] semantics (union 0 →
    * 1.0), without array_intersect's per-row hash-set build. */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = na.toDouble + nb.toDouble - inter
    if (union == 0d) 1d else inter / union
  }

  // UTF8String/ArrayData adapters called from generated code
  def shinglesArray(t: UTF8String, n: Int): ArrayData =
    new GenericArrayData(shingles(t.toString, n).map(UTF8String.fromString(_)).toArray[Any])
  def minhashArray(t: UTF8String, n: Int, k: Int): ArrayData =
    new GenericArrayData(minhashSig(t.toString, n, k))
  def simhash64(t: UTF8String): Long = simhash64(t.toString)
  def sigHGramsRow(t: UTF8String, n: Int, k: Int): org.apache.spark.sql.catalyst.InternalRow = {
    val (sig, hg) = sigHGrams(t.toString, n, k)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(sig), new GenericArrayData(hg)))
  }
}

/** `graft_shingles(text, n)` — native array<string> shingles. */
case class ShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"graft_shingles n=$n must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"
  override def nullSafeEval(input: Any): Any =
    NativeText.shinglesArray(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.shinglesArray($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShinglesExpr =
    copy(child = newChild)
}

/** `graft_minhash(text, n, k)` — native array<long> minhash signature. */
case class MinhashExpr(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(n >= 1 && k >= 1, s"graft_minhash n=$n k=$k must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash needs a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullSafeEval(input: Any): Any =
    NativeText.minhashArray(input.asInstanceOf[UTF8String], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.minhashArray($c, $n, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinhashExpr =
    copy(child = newChild)
}

/** `graft_sig_hgrams(text, n, k)` — native
  * struct<sig: array<bigint>, hgrams: array<bigint>>: the minhash
  * signature plus the sorted-distinct 60-bit gram hashes, one md5 per
  * shingle (see [[NativeText.sigHGrams]]). */
case class SigHGramsExpr(child: Expression, n: Int, k: Int) extends UnaryExpression {
  require(n >= 1 && k >= 1, s"graft_sig_hgrams n=$n k=$k must be >= 1")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sig_hgrams needs a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("hgrams", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "graft_sig_hgrams"
  override def nullSafeEval(input: Any): Any =
    NativeText.sigHGramsRow(input.asInstanceOf[UTF8String], n, k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.sigHGramsRow($c, $n, $k)")
  override protected def withNewChildInternal(newChild: Expression): SigHGramsExpr =
    copy(child = newChild)
}

/** `graft_jaccard_sorted(a, b)` — merge-scan Jaccard over two
  * sorted-distinct array<bigint> columns ([[NativeText.jaccardSorted]];
  * value-identical to [[graft.operators.Dedup.jaccard]]). */
case class JaccardSortedExpr(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard_sorted needs two array<bigint> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaccard_sorted"
  override def nullSafeEval(a: Any, b: Any): Any =
    NativeText.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.NativeText.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardSortedExpr =
    copy(left = newLeft, right = newRight)
}

/** `graft_simhash64(text)` — native 64-bit simhash. */
case class Simhash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 needs a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override def nullSafeEval(input: Any): Any =
    NativeText.simhash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NativeText.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): Simhash64Expr =
    copy(child = newChild)
}
