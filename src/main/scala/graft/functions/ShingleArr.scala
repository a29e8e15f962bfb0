package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DISTINCT word n-gram shingles of a words array, as one codegen'd
  * per-row pass: `shingle_arr(w, n)[k]` = the k-th first-occurrence
  * distinct value of `concat_ws(' ', w[i], ..., w[i+n-1])`.
  *
  * Value-identical to the relational form
  * `array_distinct(transform(sequence(1, size(w)-n+1), i -> concat_ws(...)))`
  * (and to DuckDB's `SELECT DISTINCT ... unnest(list_transform(...))` —
  * doc-local distinctness, first-occurrence order, `concat_ws` null-word
  * skipping). The win is evaluation cost, not semantics: the HOF chain is
  * a CodegenFallback evaluated interpreted — `array_distinct` alone is
  * O(shingles²) boxed string equality — and Catalyst DUPLICATES the whole
  * expression wherever the array feeds `explode` (InferFiltersFromGenerate
  * emits `size(expr) > 0 AND isnotnull(expr)` filters, and each un-reused
  * plan subtree carries its own copy), so the interpreted cost is paid up
  * to ~12× per document. This expression is one hash-set pass inside
  * whole-stage codegen — cheap enough that plan-level duplication is
  * irrelevant, which is what lets shingling stay a NARROW map (no
  * staging shuffle, no cache) at 100 TB.
  *
  * Totality: fewer than n words yields an empty array (never an ANSI
  * element_at error) — short documents simply produce no shingles, so
  * callers need no size guard even under a generator.
  */
case class ShingleArr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_arr"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleArr.compute(input.asInstanceOf[ArrayData], n)

  // MODULE$-qualified like MinHashSigs: the static forwarder on the case
  // class is not guaranteed by scalac.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleArr$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleArr =
    copy(child = newChild)
}

object ShingleArr {
  private val Space = UTF8String.fromString(" ")

  def compute(words: ArrayData, n: Int): ArrayData = {
    val cnt = words.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val out = new java.util.ArrayList[AnyRef](cnt - n + 1)
    val seen = new java.util.HashSet[UTF8String](math.max(8, (cnt - n + 1) * 2))
    val window = new Array[UTF8String](n)
    var i = 0
    while (i + n - 1 < cnt) {
      var k = 0
      while (k < n) {
        // null words: pass through — UTF8String.concatWs skips nulls AND
        // their separators, exactly concat_ws(' ', ...) semantics
        window(k) = if (words.isNullAt(i + k)) null else words.getUTF8String(i + k)
        k += 1
      }
      val s = UTF8String.concatWs(Space, window: _*)
      if (seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  import org.apache.spark.sql.GraftShims
  def apply(c: Column, n: Int): Column =
    GraftShims.column(ShingleArr(GraftShims.expression(c), n))
}
