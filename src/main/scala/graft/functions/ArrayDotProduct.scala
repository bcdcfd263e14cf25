package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: double-precision dot product of two
  * `array<float>` columns, with whole-stage codegen emitting a tight loop.
  *
  * This is the custom-Expression tier of the extension ladder (SURVEY §2.7 /
  * builder brief: compose built-ins → custom Expression → custom plan):
  * the built-in spellings are either interpreted per row (zip_with +
  * aggregate higher-order functions) or a dim-sized element_at chain that
  * bloats the plan; a 10-line generated loop beats both and keeps the exact
  * sequential fold order (bit-identical to an external engine's loop).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // inputs must be array<float> (AbstractDataType is private[sql] in
  // Spark 4, so the contract is asserted here instead of ExpectsInputTypes).
  // A bare NULL literal (NullType) is admitted — the null-safe eval returns
  // null without touching it, matching every built-in binary function.
  require(Seq(left, right).forall(e => !e.resolved ||
    e.dataType == NullType ||
    e.dataType.isInstanceOf[ArrayType] &&
      e.dataType.asInstanceOf[ArrayType].elementType == FloatType),
    s"$prettyName needs array<float> inputs")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  val name = "graft_dot"

  /** Idempotently register `graft_dot` in the session's function registry
    * (the runtime equivalent of SparkSessionExtensions.injectFunction). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[ArrayDotProduct].getName, name),
        (children: Seq[Expression]) => ArrayDotProduct(children(0), children(1)))
    }
  }
}
