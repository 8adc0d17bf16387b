package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for Hill-formula canonicalization (F2) —
  * participates in whole-stage codegen (emits a static call into the
  * generated Java instead of the UDF's serialization/boxing round trip),
  * so formula-heavy scans keep their codegen pipeline intact.
  *
  * Null semantics: null or unparseable input → null (same as
  * [[Formulas.hillFormulaOrNull]], which it delegates to).
  */
case class HillFormulaExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "hill_formula"

  override def nullSafeEval(input: Any): Any =
    HillFormulaExpr.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.HillFormulaExpr.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HillFormulaExpr {
  /** Static entry point for generated code (static forwarder). */
  def compute(s: UTF8String): UTF8String = {
    if (s == null) return null
    val out = Formulas.hillFormulaOrNull(s.toString)
    if (out == null) null else UTF8String.fromString(out)
  }
}
