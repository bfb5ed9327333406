package org.apache.spark.sql.graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions installer for the engine's native expressions —
  * wire with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`, after
  * which SQL can call the codegen kernels directly:
  *
  * {{{ SELECT float_dot(a.embedding, b.embedding) FROM ... }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(GraftExtensions.floatDotDescriptor)
}

object GraftExtensions {
  private val floatDotDescriptor = (
    FunctionIdentifier("float_dot"),
    new ExpressionInfo(classOf[FloatDot].getCanonicalName, "float_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "float_dot expects exactly 2 arguments")
      FloatDot(children.head, children(1)): Expression
    })

  /** Register into an ALREADY-BUILT session (tests, notebooks) — extensions
    * configured on the builder only apply to sessions created after. */
  def registerInto(spark: SparkSession): Unit = {
    val (id, info, builder) = floatDotDescriptor
    spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }
}
