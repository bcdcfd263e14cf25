package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonical first pass of any web-scale text pipeline
  * (decomposed accents, compatibility variants from different crawlers,
  * `e` + U+0301 vs `é`) so that downstream tokenization, hashing, and
  * dedup see one spelling per grapheme.
  *
  * Spark has no built-in normalizer, and a Scala UDF would pay
  * serialization + break whole-stage codegen in the hottest map stage of
  * the pipeline. This is the custom-Expression tier of the extension
  * ladder (same as [[ArrayDotProduct]]): `doGenCode` emits a branch that
  * first asks `Normalizer.isNormalized` — for the overwhelmingly common
  * already-NFC document this is a scan with ZERO allocation, and the
  * original `UTF8String` is passed through untouched — and only pays the
  * normalize + re-encode on the rare decomposed row.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  // input must be a string (NullType admitted for bare NULL literals,
  // same contract style as ArrayDotProduct — AbstractDataType is
  // private[sql] in Spark 4 so the check lives here).
  require(!child.resolved || child.dataType == NullType ||
    child.dataType.isInstanceOf[StringType],
    s"$prettyName needs a string input")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) u
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |String $s = $c.toString();
         |if (java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)) {
         |  ${ev.value} = $c;
         |} else {
         |  ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |    java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  val name = "graft_nfc"

  /** Idempotently register `graft_nfc` in the session's function registry
    * (the runtime equivalent of the [[graft.GraftExtensions]] injection). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    val ident = FunctionIdentifier(name)
    if (!registry.functionExists(ident)) {
      registry.registerFunction(
        ident,
        new ExpressionInfo(classOf[NfcNormalize].getName, name),
        (children: Seq[Expression]) => NfcNormalize(children.head))
    }
  }
}
