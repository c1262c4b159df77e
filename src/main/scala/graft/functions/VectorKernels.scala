package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the vector hot loops.
  *
  * Spark's higher-order functions (`aggregate(zip_with(...))`) are
  * evaluated INTERPRETED — per element they allocate lambda variables
  * and box doubles, and they punch a hole in whole-stage codegen. The
  * typed `mapPartitions` kernels used previously avoid that but pay an
  * encoder round-trip (InternalRow → case class → InternalRow) and
  * split the stage. These expressions are the top tier: a tight
  * primitive `double` loop emitted INSIDE whole-stage codegen via
  * `doGenCode`, no boxing, no stage break, same left-to-right fold
  * order as the SQL `aggregate(zip_with(...))` oracle text — so
  * results are bit-identical and every existing hash gate still holds.
  *
  * Contract: inputs are `ARRAY<DOUBLE>` with non-null elements (the
  * engine's vector relations never carry null components); arrays of
  * unequal length yield NULL, matching `zip_with`'s null-padding
  * propagation through the fold.
  */
abstract class VectorFoldExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  /** Java source for one loop step accumulating into `acc` from
    * elements `xi`, `yi`. */
  protected def stepJava(xi: String, yi: String): String
  /** Scala step for interpreted eval — must mirror [[stepJava]]. */
  protected def stepEval(x: Double, y: Double): Double

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += stepEval(x.getDouble(i), y.getDouble(i)); i += 1 }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        final int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          double $acc = 0.0;
          for (int $i = 0; $i < $n; $i++) {
            $acc += ${stepJava(s"$a.getDouble($i)", s"$b.getDouble($i)")};
          }
          ${ev.value} = $acc;
        }"""
    })
}

/** `Σ aᵢ·bᵢ` — the cosine/IVF/ADC workhorse. */
case class DotProductD(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def stepJava(xi: String, yi: String): String = s"$xi * $yi"
  override protected def stepEval(x: Double, y: Double): Double = x * y
  override def prettyName: String = "graft_dot"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `Σ (aᵢ−bᵢ)²` — the k-means / PQ squared-distance kernel. */
case class L2SquaredD(left: Expression, right: Expression) extends VectorFoldExpression {
  override protected def stepJava(xi: String, yi: String): String =
    s"($xi - $yi) * ($xi - $yi)"
  override protected def stepEval(x: Double, y: Double): Double = (x - y) * (x - y)
  override def prettyName: String = "graft_l2sq"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorKernels {
  import org.apache.spark.sql.GraftColumnBridge.column
  def dot(a: Column, b: Column): Column =
    column(DotProductD(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  def l2sq(a: Column, b: Column): Column =
    column(L2SquaredD(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
