package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * `graft_rolling_hash(text)` — the document fingerprint
 * (fold (acc * 31 + codepoint) mod 1e9+7 over the text, see
 * [[graft.operators.TextAnalysis.fingerprint]]) as a NATIVE Catalyst
 * expression with `doGenCode`: one generated static call per row inside
 * whole-stage codegen, instead of the interpreted higher-order-function
 * pipeline (which builds a length-of-text array and evaluates an
 * interpreted lambda per character — the portability tax the HOF
 * version pays so DuckDB can reproduce the value).
 *
 * Value-identical to the HOF version and to the DuckDB oracle
 * (`ord` = codepoint = `Character.codePointAt`), so q18 can run on this
 * expression and still be value-checked.
 *
 * Registered through the public `SparkSessionExtensions` hook
 * ([[GraftExtensions]]) — `spark.sql.extensions=graft.functions.GraftExtensions`
 * — and called as `call_function("graft_rolling_hash", col)`.
 */
case class RollingHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash needs a string argument, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any =
    RollingHash.hash(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RollingHash.hash($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  val Mod = 1000000007L

  /** Static entry point shared by interpreted eval and generated code. */
  def hash(s: String): Long = {
    var acc = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Session extension registering the graft native functions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
      org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesExpr].getName, "graft_shingles"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_shingles(text, n) takes two arguments")
        ShinglesExpr(children.head, intLit(children(1), "graft_shingles n"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashExpr].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_minhash(text, n, k) takes three arguments")
        MinhashExpr(children.head, intLit(children(1), "graft_minhash n"),
          intLit(children(2), "graft_minhash k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[Simhash64Expr].getName, "graft_simhash64"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_simhash64(text) takes one argument")
        Simhash64Expr(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "graft_rolling_hash(text) takes one argument")
        RollingHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_sig_hgrams"),
      new ExpressionInfo(classOf[SigHGramsExpr].getName, "graft_sig_hgrams"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_sig_hgrams(text, n, k) takes three arguments")
        SigHGramsExpr(children.head, intLit(children(1), "graft_sig_hgrams n"),
          intLit(children(2), "graft_sig_hgrams k"))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaccard_sorted"),
      new ExpressionInfo(classOf[JaccardSortedExpr].getName, "graft_jaccard_sorted"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_jaccard_sorted(a, b) takes two arguments")
        JaccardSortedExpr(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[BoundedTopK].getName, "graft_topk"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_topk(entry, k) takes two arguments")
        BoundedTopK(children.head, intLit(children(1), "graft_topk k"))
      }))
  }
}
