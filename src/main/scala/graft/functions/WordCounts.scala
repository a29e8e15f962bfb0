package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row term-frequency map of a words array, as one codegen'd pass:
  * `word_counts(w)[k]` = struct(t, tf) for the k-th first-occurrence
  * distinct word of `w`, with `tf` = its number of occurrences in `w`.
  *
  * Multiset-identical to the relational form
  * `GROUP BY doc_id, t` over `explode(w)` (and to DuckDB's
  * `GROUP BY doc_id, unnest(w)`) whenever the grouping key contains a
  * per-row id — i.e. the aggregation is provably ROW-LOCAL. Catalyst
  * cannot see that locality: a `groupBy(doc_id, t)` plans a full
  * hash-aggregate whose partials are near-unreduced (each doc's terms
  * appear in exactly one partition), so the exchange carries one
  * (id, term-string, count) row per posting — measured 36 MB at sf0.1
  * for t16's wordcount alone. This expression collapses that exchange
  * to ZERO: the count map is built doc-locally inside whole-stage
  * codegen and exploded in place, so downstream vocabulary-bounded aggs
  * (df, corpus stats) are the only shuffles left, and per-doc totals
  * (dl = size(w)) ride the same row instead of a re-aggregation join.
  *
  * Null words are skipped (they are not a term; `explode` of a null
  * element would still yield a row, but callers here always feed
  * `split()` output, which is null-free). An empty or all-null array
  * yields an empty array, never an error.
  */
case class WordCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("t", StringType, nullable = false),
      StructField("tf", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_counts"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    WordCounts.compute(input.asInstanceOf[ArrayData])

  // MODULE$-qualified like ShingleArr: the static forwarder on the case
  // class is not guaranteed by scalac.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordCounts$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): WordCounts =
    copy(child = newChild)
}

object WordCounts {
  def compute(words: ArrayData): ArrayData = {
    val cnt = words.numElements()
    // first-occurrence order via insertion-ordered map; long counts so a
    // downstream SUM never widens
    val m = new java.util.LinkedHashMap[UTF8String, Array[Long]](
      math.max(8, cnt * 2))
    var i = 0
    while (i < cnt) {
      if (!words.isNullAt(i)) {
        val w = words.getUTF8String(i)
        val slot = m.get(w)
        if (slot == null) m.put(w, Array(1L)) else slot(0) += 1L
      }
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = new GenericInternalRow(Array[Any](e.getKey, e.getValue()(0)))
      k += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftShims
  def apply(c: Column): Column =
    GraftShims.column(WordCounts(GraftShims.expression(c)))
}
