package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** EVERY-POSITION word n-gram hashes of a words array, as one codegen'd
  * per-row pass: `shingle_hashes(w, n)[i]` = the 60-bit md5-prefix
  * integer of `concat_ws(' ', w[i], ..., w[i+n-1])` — NOT deduplicated,
  * one element per window position, in position order.
  *
  * The positional complement of [[ShingleArr]] (which collapses to
  * first-occurrence distinct values and so cannot say WHERE a shingle
  * occurred): `posexplode(shingle_hashes(w, n))` yields the
  * (position, window-hash) pairs that exact-substring span dedup needs
  * to merge overlapping duplicated windows into maximal spans. Hashing
  * INSIDE the expression (t09's rule, fused into the scan) means the
  * exploded rows — the only thing a corpus-wide duplicate count ever
  * shuffles — are 8-byte integers, never window text.
  *
  * Bit-for-bit DuckDB's
  * `('0x' || substr(md5(array_to_string(w[i+1:i+n], ' ')), 1, 15))::BIGINT`
  * (15 hex digits = md5 bytes 0–6 plus the high nibble of byte 7; both
  * joiners skip null elements). 60 bits keeps collisions negligible
  * (~n_windows²/2^61) while staying inside a BIGINT in both engines.
  *
  * Fewer than n words yields an empty array — total under `explode`.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  // MODULE$-qualified like ShingleArr: the static forwarder on the case
  // class is not guaranteed by scalac.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  private val Space = UTF8String.fromString(" ")

  // one digest per thread — codegen calls this per row; no per-row churn
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  def compute(words: ArrayData, n: Int): ArrayData = {
    val cnt = words.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Long])
    val md = digest.get()
    val out = new Array[Long](cnt - n + 1)
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
      md.reset()
      md.update(UTF8String.concatWs(Space, window: _*).getBytes)
      val dg = md.digest()
      // first 15 hex digits: bytes 0..6 big-endian, then byte 7's high
      // nibble — exactly ('0x' || substr(md5(s), 1, 15))::BIGINT
      var v = 0L
      var j = 0
      while (j < 7) { v = (v << 8) | (dg(j) & 0xffL); j += 1 }
      out(i) = (v << 4) | ((dg(7) >> 4) & 0xfL)
      i += 1
    }
    new GenericArrayData(out)
  }

  import org.apache.spark.sql.GraftShims
  def apply(c: Column, n: Int): Column =
    GraftShims.column(ShingleHashes(GraftShims.expression(c), n))
}
