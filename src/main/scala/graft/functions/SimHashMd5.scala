package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** 32-bit md5-derived SimHash over a token array, in one codegen'd
  * per-row pass — the ORACLE-CHECKABLE mid-width signature between
  * `Dedup.d04`'s relational 16-bit pipeline and the xxHash64-based
  * [[SimHash64]] (which DuckDB cannot replicate).
  *
  * Per token: the first 4 md5 bytes as a 32-bit word hash (bit-for-bit
  * DuckDB's `('0x' || substr(md5(w), 1, 8))::BIGINT`); each of the 32
  * bit positions accumulates +1/-1 by the token-hash bit; the signature
  * sets bit d iff accumulator d is positive. Value-identical to the
  * relational form (explode words → 32 conditional sums → bit
  * recombine) and its DuckDB twin, but a NARROW map: no word explode, no
  * 32-sum groupBy shuffle — signatures for 100 TB of text fused into the
  * scan stage, feeding the d11 multi-index block join directly.
  *
  * Null array → null; null tokens are skipped; empty array → 0L.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashMd5.compute(input.asInstanceOf[ArrayData])

  // MODULE$-qualified for the same reason as ToUpperCamelCase: resolving
  // through the case class relies on a static forwarder scalac may omit.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5 =
    copy(child = newChild)
}

/** 64-bit md5-derived SimHash over a token array — [[SimHashMd5]] widened to
  * production width while staying ORACLE-CHECKABLE (DuckDB rebuilds the
  * word hash from two 32-bit md5-prefix halves:
  * `('0x'||substr(md5(w),1,8))::BIGINT` and `substr(md5(w),9,8)`).
  *
  * Per token: the first 8 md5 bytes big-endian as a 64-bit word hash; the
  * usual +1/-1 bit-position accumulation; signature bit d set iff
  * accumulator d is positive. Same narrow fused-into-the-scan shape as
  * [[SimHashMd5]]. The xxHash64-based [[SimHash64]] stays the faster
  * hash plug for clusters that don't need a cross-engine oracle — the
  * signature layout and the 4×16-bit multi-index block join downstream are
  * identical; only the word-hash function differs.
  *
  * Null array → null; null tokens are skipped; empty array → 0L.
  */
case class SimHashMd564(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_md5_64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashMd5.compute64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5$$.MODULE$$.compute64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd564 =
    copy(child = newChild)
}

object SimHashMd564 {
  import org.apache.spark.sql.GraftShims
  def apply(c: Column): Column = GraftShims.column(SimHashMd564(GraftShims.expression(c)))
}

/** 16-bit md5-derived SimHash over a token array — d04's relational
  * formula (feature d = HIGH BIT of hex digit d of md5(word), d < 16;
  * signature bit d set iff the +1/-1 accumulator is positive) as one
  * codegen'd narrow pass. Value-identical to the explode → 16
  * conditional sums → bit-recombine pipeline and to its DuckDB twin
  * (`strpos('89abcdef', substr(md5(w), d+1, 1)) > 0`), but with no word
  * explode and no 16-sum groupBy shuffle.
  *
  * Null array → null; null tokens are skipped; empty array → 0L.
  */
case class SimHashMd516(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_md5_16"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHashMd5.compute16(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5$$.MODULE$$.compute16($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd516 =
    copy(child = newChild)
}

object SimHashMd516 {
  import org.apache.spark.sql.GraftShims
  def apply(c: Column): Column = GraftShims.column(SimHashMd516(GraftShims.expression(c)))
}

object SimHashMd5 {
  // one digest per thread — codegen calls this per row; no per-row churn
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(tokens: ArrayData): Long = {
    val v = new Array[Int](32)
    val n = tokens.numElements()
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        val dg = md.digest()
        // first 8 hex chars = bytes 0..3, big-endian — exactly
        // conv(substr(md5(w), 1, 8), 16, 10)
        val h = ((dg(0) & 0xffL) << 24) | ((dg(1) & 0xffL) << 16) |
          ((dg(2) & 0xffL) << 8) | (dg(3) & 0xffL)
        var b = 0
        while (b < 32) {
          if (((h >>> b) & 1L) == 1L) v(b) += 1 else v(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 32) {
      if (v(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** [[SimHashMd516]]'s kernel: feature d = high bit of HEX DIGIT d of
    * md5(token) — the high nibble of byte d/2 for even d, the low nibble
    * for odd d ("digit ≥ 8" ⇔ nibble bit 3 set). */
  def compute16(tokens: ArrayData): Long = {
    val v = new Array[Int](16)
    val n = tokens.numElements()
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        val dg = md.digest()
        var dd = 0
        while (dd < 16) {
          val nib =
            if ((dd & 1) == 0) (dg(dd >> 1) >>> 4) & 0xf
            else dg(dd >> 1) & 0xf
          if ((nib & 8) != 0) v(dd) += 1 else v(dd) -= 1
          dd += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var dd = 0
    while (dd < 16) {
      if (v(dd) > 0) sig |= (1L << dd)
      dd += 1
    }
    sig
  }

  /** [[SimHashMd564]]'s kernel: first 8 md5 bytes big-endian per token. */
  def compute64(tokens: ArrayData): Long = {
    val v = new Array[Int](64)
    val n = tokens.numElements()
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        md.reset()
        md.update(tokens.getUTF8String(i).getBytes)
        val dg = md.digest()
        // first 16 hex chars = bytes 0..7, big-endian — the two DuckDB
        // halves ('0x'||substr(md5,1,8)) << 32 | ('0x'||substr(md5,9,8))
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (dg(k) & 0xffL); k += 1 }
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
  def apply(c: Column): Column = GraftShims.column(SimHashMd5(GraftShims.expression(c)))
}
