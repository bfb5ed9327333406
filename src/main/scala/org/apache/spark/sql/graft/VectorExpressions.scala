// Hosted under org.apache.spark.sql: ExpectsInputTypes.inputTypes returns
// the private[sql] AbstractDataType, and the Expression->Column bridge
// (classic.ExpressionUtils) is private[sql] too — the standard packaging
// for third-party native expressions.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path. The higher-order
  * `aggregate`/`zip_with` forms in [[VectorFunctions]] are interpreted per
  * element; a dot product over `array<float>` is the single most executed
  * kernel in the similarity operators, so it gets a real expression with
  * whole-stage codegen (SURVEY.md §2.8: custom Expression where built-ins
  * don't fit; preference (b) on the custom-operator ladder).
  *
  * Semantics are EXACTLY the HOF fold's, in every case — index-ordered sum
  * of double products (the contract the DuckDB oracles replicate), NULL
  * when either array is null, contains a null element, or the lengths
  * differ (zip_with pads the shorter side with null, nulling the sum).
  * Full HOF equivalence is what makes [[RewriteHofDot]] a sound
  * plan-rewrite rather than a semantics change.
  *
  * ImplicitCastInputTypes keeps the public `dot()` input domain of the old
  * HOF form: array<double>/array<int> inputs are implicitly cast to
  * array<float> at analysis instead of failing. Note the cast is to SINGLE
  * precision — callers needing full-double accumulation over array<double>
  * should use [[DoubleDot]].
  */
case class FloatDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  // null even on non-null inputs (null element / length mismatch)
  override def nullable: Boolean = true
  override def prettyName: String = "float_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

/** Full-double sibling of [[FloatDot]] for `array<double>` inputs: the
  * quantization-eval and diagnostics queries derive DOUBLE arrays (casts,
  * rounds, centroid grids) and score them with index-ordered double dot
  * products that the DuckDB oracles replicate term-for-term — a cast to
  * float there would move 6-dp-rounded cosines off the oracle's grid. The
  * HOF form (`aggregate(zip_with(...))`) is interpreted per element with
  * boxing; this is the same loop under whole-stage codegen (measured on
  * q113: the dominant cost term). Exact HOF equivalence in every case —
  * same accumulation order and width, NULL on null element or length
  * mismatch — so [[RewriteHofDot]] may substitute it freely. */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  // null even on non-null inputs (null element / length mismatch)
  override def nullable: Boolean = true
  override def prettyName: String = "double_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column wrapper for [[FloatDot]]. */
  def floatDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      FloatDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Column wrapper for [[DoubleDot]]. */
  def doubleDot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DoubleDot(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
