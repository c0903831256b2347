package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native codegen'd vector kernels.
  *
  * The portable exact-micros dot product ([[Portable.dotMicros]] semantics:
  * Σ floor(a_i·1e6+0.5)·floor(b_i·1e6+0.5) as a long) sits on the hot path
  * of every similarity op (ANN top-k, embedding dedup, LSH bucketing).
  * Expressed with `zip_with` + `aggregate` it runs as an INTERPRETED
  * higher-order function — per-element lambda dispatch and array
  * allocation per row pair. These expressions generate the tight Java
  * loop instead (whole-stage-codegen'd, no allocation), ~5-10× faster on
  * the similarity joins, with bit-identical results (same IEEE ops in the
  * same order — the DuckDB oracle twins are unchanged).
  *
  * Registered on every graft session via [[registerAll]]
  * (SparkSessionExtensions.injectFunction), callable from SQL as
  * `dot_micros(a, b)` / `proj_micros(v, weights)`.
  */
object VectorExpressions {

  private def quantLoop(arr: String, i: String): String =
    s"(long) java.lang.Math.floor(((double) $arr.getFloat($i)) * 1000000.0 + 0.5)"

  /** `dot_micros(a: array<float>, b: array<float>): long` — exact integer
    * dot product in micro units (both sides quantized).
    */
  case class DotMicrosExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    // inputs are array<float> × array<float>; call sites are the graft
    // helpers, which guarantee the types (ExpectsInputTypes is private[sql])
    override def dataType: DataType = LongType
    override def prettyName: String = "dot_micros"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        val qa = math.floor(x.getFloat(i).toDouble * 1e6 + 0.5).toLong
        val qb = math.floor(y.getFloat(i).toDouble * 1e6 + 0.5).toLong
        acc += qa * qb
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
        long $acc = 0L;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${quantLoop(a, i)} * ${quantLoop(b, i)};
        }
        ${ev.value} = $acc;"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** `proj_micros(v: array<float>, w: array<long>): long` — exact integer
    * projection of a quantized float vector onto integer hyperplane
    * weights (the LSH bucketing kernel): Σ floor(v_i·1e6+0.5)·w_i.
    */
  case class ProjMicrosExpr(left: Expression, right: Expression)
      extends BinaryExpression {
    // inputs are array<float> × array<long> (see note on DotMicrosExpr)
    override def dataType: DataType = LongType
    override def prettyName: String = "proj_micros"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val w = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), w.numElements())
      var acc = 0L
      var i = 0
      while (i < n) {
        acc += math.floor(x.getFloat(i).toDouble * 1e6 + 0.5).toLong * w.getLong(i)
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        s"""
        long $acc = 0L;
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        for (int $i = 0; $i < $n; $i++) {
          $acc += ${quantLoop(a, i)} * $b.getLong($i);
        }
        ${ev.value} = $acc;"""
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Injects both kernels into a session's function registry. */
  def registerAll(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_micros"),
      new ExpressionInfo(classOf[DotMicrosExpr].getName, "dot_micros"),
      (args: Seq[Expression]) => DotMicrosExpr(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("proj_micros"),
      new ExpressionInfo(classOf[ProjMicrosExpr].getName, "proj_micros"),
      (args: Seq[Expression]) => ProjMicrosExpr(args(0), args(1))))
  }
}
