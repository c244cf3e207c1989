package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Exact left-to-right dot product of two `array<double>` columns as a
  * native codegen'd Catalyst expression.
  *
  * Semantically identical to the builtin composition
  * `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0, (acc,x) -> acc+x)` —
  * the same fold order, so results are bit-for-bit equal to that and to
  * DuckDB's `list_inner_product` — but evaluated as a single fused loop
  * with no intermediate array allocation and no per-element lambda
  * dispatch. On the embedding self-join paths (similarity search,
  * embedding near-dup) every candidate pair pays one of these, so the
  * fused loop is the difference between the join being compute-bound
  * and allocation-bound.
  *
  * Null semantics match the builtin composition: a null array, length
  * mismatch (zip_with pads with null), or any null element yields null.
  */
case class DotProductDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"dot_product expects (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = leftGen.value
    val b = rightGen.value
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull}) {
          ${rightGen.code}
          if (!${rightGen.isNull}) {
            final int $n = $a.numElements();
            if ($b.numElements() == $n) {
              ${ev.isNull} = false;
              for (int $i = 0; $i < $n; $i++) {
                if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
                ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
              }
            }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

/** Exact left-to-right squared L2 distance of two `array<double>`
  * columns — the fused twin of [[DotProductDouble]] for the OTHER core
  * vector primitive. Semantically identical (same fold order, so
  * bit-for-bit equal) to
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)*(x-y)), 0.0, (acc,d) -> acc+d)`,
  * which is what the PQ/ADC paths evaluated as interpreted per-element
  * lambda dispatch. Null semantics match that composition.
  */
case class SquaredDistanceDouble(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"squared_distance expects (array<double>, array<double>), got (${l.catalogString}, ${r.catalogString})")
    }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val a = leftGen.value
    val b = rightGen.value
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val d = ctx.freshName("d")
    val code =
      code"""
        ${leftGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull}) {
          ${rightGen.code}
          if (!${rightGen.isNull}) {
            final int $n = $a.numElements();
            if ($b.numElements() == $n) {
              ${ev.isNull} = false;
              for (int $i = 0; $i < $n; $i++) {
                if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
                final double $d = $a.getDouble($i) - $b.getDouble($i);
                ${ev.value} += $d * $d;
              }
            }
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)

  override def prettyName: String = "squared_distance"
}

object VectorOps {
  def dotProduct(a: Column, b: Column): Column =
    GraftShim.column(DotProductDouble(GraftShim.expression(a), GraftShim.expression(b)))

  def squaredDistance(a: Column, b: Column): Column =
    GraftShim.column(SquaredDistanceDouble(GraftShim.expression(a), GraftShim.expression(b)))
}
