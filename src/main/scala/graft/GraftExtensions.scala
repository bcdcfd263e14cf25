package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster-configuration entry point for the library's Catalyst surface:
  * `--conf spark.sql.extensions=graft.GraftExtensions` injects the native
  * expressions into every session at startup — the
  * `SparkSessionExtensions` tier of the extension ladder (compose
  * built-ins → custom Expression → injected extensions → custom plan).
  * Programmatic sessions can keep using
  * [[graft.functions.ArrayDotProduct.register]], which is the same
  * registration done at runtime; both are idempotent.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier(functions.ArrayDotProduct.name),
      new ExpressionInfo(classOf[functions.ArrayDotProduct].getName,
        functions.ArrayDotProduct.name),
      (children: Seq[Expression]) =>
        functions.ArrayDotProduct(children(0), children(1))))
    e.injectFunction((
      FunctionIdentifier(functions.NfcNormalize.name),
      new ExpressionInfo(classOf[functions.NfcNormalize].getName,
        functions.NfcNormalize.name),
      (children: Seq[Expression]) =>
        functions.NfcNormalize(children.head)))
    e.injectFunction((
      FunctionIdentifier(functions.BoundedLevenshtein.name),
      new ExpressionInfo(classOf[functions.BoundedLevenshtein].getName,
        functions.BoundedLevenshtein.name),
      (children: Seq[Expression]) =>
        functions.BoundedLevenshtein(children(0), children(1), children(2))))
    e.injectFunction((
      FunctionIdentifier(functions.KmvSketchAgg.name),
      new ExpressionInfo(classOf[functions.KmvSketchAgg].getName,
        functions.KmvSketchAgg.name),
      (children: Seq[Expression]) => functions.KmvSketchAgg.build(children)))
    e.injectFunction((
      FunctionIdentifier(functions.TopKAgg.name),
      new ExpressionInfo(classOf[functions.TopKAgg].getName,
        functions.TopKAgg.name),
      (children: Seq[Expression]) => functions.TopKAgg.build(children)))
  }
}
