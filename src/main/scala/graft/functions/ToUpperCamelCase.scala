package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Event-code normalization — EXACT mirror of the reference's
  * `stringToUpperCamelCase` (/root/reference/src/helpers/index.ts:8-10):
  *
  * {{{ input.charAt(0).toUpperCase() +
  *     input.slice(1).replace(/[-_ ]./g, x => x[1].toUpperCase()) }}}
  *
  * i.e. char 0 is upper-cased and KEPT (even when it is itself a
  * delimiter), then from index 1 each non-overlapping delimiter+char pair
  * is replaced by the upper-cased follower, scanning left to right. A
  * delimiter with no follower (trailing) or whose follower is a JS line
  * terminator (`.` does not match `\n \r    `) passes through
  * unchanged. Consequences the naive "drop every delimiter" rule gets
  * wrong: `"a--b" -> "A-b"`, `"-ab" -> "-ab"`, `"a-" -> "A-"`,
  * `"__x" -> "_X"`. `"my-event_name x" -> "MyEventNameX"` as usual.
  *
  * Spark's `initcap` is NOT equivalent (it keeps delimiters and
  * lower-cases the rest), hence a native Catalyst `UnaryExpression` with
  * codegen so the hot enrichment path stays inside whole-stage codegen at
  * scale.
  */
case class ToUpperCamelCase(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "upper_camel"

  override def nullSafeEval(input: Any): Any =
    ToUpperCamelCase.transform(input.asInstanceOf[UTF8String])

  // NB: must call through MODULE$ — the case class inherits
  // TreeNode.transform, so scalac emits NO static forwarder named
  // `transform`, and Janino would fail to resolve the bare class-qualified
  // call, silently dropping the whole stage out of codegen.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.ToUpperCamelCase$$.MODULE$$.transform($c)")

  override protected def withNewChildInternal(newChild: Expression): ToUpperCamelCase =
    copy(child = newChild)
}

object ToUpperCamelCase {
  private def isDelim(c: Char): Boolean = c == '-' || c == '_' || c == ' '

  /** JS `.` (no dotall flag) matches any UTF-16 code unit except these. */
  private def isJsLineTerminator(c: Char): Boolean =
    c == '\n' || c == '\r' || c == 0x2028.toChar || c == 0x2029.toChar

  /** Single-code-unit uppercase with JS `String.prototype.toUpperCase`
    * semantics: Unicode Default Case Conversion, which may expand (e.g.
    * `ß -> SS`); a lone surrogate passes through unchanged. Java's
    * `String.toUpperCase(Locale.ROOT)` implements the same mapping
    * (`Character.toUpperCase` does NOT — it cannot expand). */
  private def upper1(c: Char): String =
    String.valueOf(c).toUpperCase(java.util.Locale.ROOT)

  /** Exact reference rule — see the class Scaladoc. Iterative twin of
    * `charAt(0).toUpperCase() + slice(1).replace(/[-_ ]./g, up)`. */
  def transform(s: UTF8String): UTF8String = {
    val str = s.toString
    if (str.isEmpty) return s
    val sb = new java.lang.StringBuilder(str.length + 4)
    sb.append(upper1(str.charAt(0)))
    var i = 1
    while (i < str.length) {
      val ch = str.charAt(i)
      if (isDelim(ch) && i + 1 < str.length && !isJsLineTerminator(str.charAt(i + 1))) {
        sb.append(upper1(str.charAt(i + 1)))
        i += 2
      } else {
        sb.append(ch)
        i += 1
      }
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
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sigs", exprs => MinHashSigs(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_md5", exprs => SimHashMd5(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_md5_64", exprs => SimHashMd564(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash_md5_16", exprs => SimHashMd516(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_arr", exprs => exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(n: Int, _) =>
          ShingleArr(exprs.head, n)
        case other => throw new IllegalArgumentException(
          s"shingle_arr width must be an integer literal, got $other")
      }, "scala_udf")
  }
}
