package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 64-bit SimHash over a token array — the production-width variant of the
  * oracle-checked 16-bit pipeline in `Dedup.d04` (which is md5-derived only
  * so DuckDB can replicate it).
  *
  * Per token: a 64-bit xxHash64; each of the 64 bit positions accumulates
  * +1/-1 by the token-hash bit; the signature sets bit i iff the
  * accumulator is positive. One codegen'd static call per row — no
  * per-token JVM object churn, stays inside whole-stage codegen. Pair
  * search at scale = 4×16-bit multi-index blocks (pigeonhole: Hamming ≤ 3
  * pairs share a block), the same equi-join shape d04 demonstrates.
  *
  * Null array → null; null tokens are skipped; empty array → 0L.
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  // MODULE$-qualified for the same reason as ToUpperCamelCase: resolving
  // through the case class relies on a static forwarder scalac may omit.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  private val Seed = 42L

  def compute(tokens: ArrayData): Long = {
    val v = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (v(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  import org.apache.spark.sql.GraftShims
  def apply(c: Column): Column = GraftShims.column(SimHash64(GraftShims.expression(c)))
}
