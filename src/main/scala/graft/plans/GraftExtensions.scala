package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import org.apache.spark.sql.catalyst.expressions.Literal

import graft.functions.{DotProduct, MinHashSigs, ShingleArr, SimHash64,
  SimHashMd5, SimHashMd516, SimHashMd564, ToUpperCamelCase}

/** Session-extension wiring for graft's custom Catalyst expressions, so a
  * deployment can enable them cluster-wide without touching code:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.plans.GraftExtensions ...
  *   // or
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  * }}}
  *
  * This is preference-order (b) of the custom-operator ladder: scalar
  * expressions injected at the function registry. No custom `Rule` or
  * `SparkStrategy` is required anywhere in this engine — every whole-operator
  * semantic the reference has (routing, enrichment, backpressure) is
  * expressible as a declarative plan over built-ins, which is exactly what
  * keeps Catalyst free to optimize (see SURVEY.md §4.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("upper_camel"),
      new ExpressionInfo(classOf[ToUpperCamelCase].getName, "upper_camel"),
      (exprs: Seq[Expression]) => ToUpperCamelCase(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs(0), exprs(1))))
    e.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (exprs: Seq[Expression]) => SimHash64(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      (exprs: Seq[Expression]) => SimHashMd5(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash_md5_64"),
      new ExpressionInfo(classOf[SimHashMd564].getName, "simhash_md5_64"),
      (exprs: Seq[Expression]) => SimHashMd564(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("simhash_md5_16"),
      new ExpressionInfo(classOf[SimHashMd516].getName, "simhash_md5_16"),
      (exprs: Seq[Expression]) => SimHashMd516(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("minhash_sigs"),
      new ExpressionInfo(classOf[MinHashSigs].getName, "minhash_sigs"),
      (exprs: Seq[Expression]) => MinHashSigs(exprs.head)))
    e.injectFunction((
      new FunctionIdentifier("shingle_arr"),
      new ExpressionInfo(classOf[ShingleArr].getName, "shingle_arr"),
      (exprs: Seq[Expression]) => exprs(1) match {
        // the shingle width is part of the generated code, so it must be
        // a literal — `shingle_arr(words, 3)`
        case Literal(n: Int, _) => ShingleArr(exprs.head, n)
        case other => throw new IllegalArgumentException(
          s"shingle_arr width must be an integer literal, got $other")
      }))
  }
}
