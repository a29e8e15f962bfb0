package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Event-code normalization: uppercase the first character, then every
  * character following a `-`, `_`, or ` ` delimiter (delimiter removed).
  *
  * Semantics match the reference's `stringToUpperCamelCase`
  * (/root/reference/src/helpers/index.ts:8-10):
  * `"my-event_name x" -> "MyEventNameX"`. Spark's `initcap` is NOT
  * equivalent (it keeps delimiters and lowercases the rest), hence a native
  * Catalyst `UnaryExpression` with codegen so the hot enrichment path stays
  * inside whole-stage codegen at scale.
  */
case class ToUpperCamelCase(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "upper_camel"

  override def nullSafeEval(input: Any): Any =
    ToUpperCamelCase.transform(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ToUpperCamelCase.transform($c)")

  override protected def withNewChildInternal(newChild: Expression): ToUpperCamelCase =
    copy(child = newChild)
}

object ToUpperCamelCase {
  /** Reference rule: first char upper-cased; `[-_ ]x` -> `X`; everything
    * else passes through untouched (NOT lower-cased — unlike initcap). */
  def transform(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var upNext = true
    var i = 0
    while (i < str.length) {
      val ch = str.charAt(i)
      if (ch == '-' || ch == '_' || ch == ' ') {
        upNext = true
      } else {
        if (upNext) { sb.append(Character.toUpperCase(ch)); upNext = false }
        else sb.append(ch)
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Column-level API + SQL registration for graft's custom expressions. */
object GraftFunctions {
  import org.apache.spark.sql.GraftShims

  /** `upper_camel(col)` as a Column (no session registration needed). */
  def upper_camel(c: Column): Column =
    GraftShims.column(ToUpperCamelCase(GraftShims.expression(c)))

  /** Register SQL-callable names (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "upper_camel", exprs => ToUpperCamelCase(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "scala_udf")
  }
}
