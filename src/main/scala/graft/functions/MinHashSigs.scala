package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All `numPerms` MinHash permutation minima over a document's word-3-gram
  * shingles in ONE per-row pass: `sig[j] = min over shingles of
  * (A_j*h + B_j) mod P` where `h` is the 28-bit md5 prefix of the shingle
  * string. Two widths are registered: 8 (the legacy demo constants, d03's
  * oracle-pinned form) and 128 (the production width, md5-derived
  * constants — d19). Widening changes only the permutation table; the
  * per-shingle hashing is shared, so the cost of 128 perms over 8 is 120
  * more multiply-mods per shingle, not 16× the hashing.
  *
  * Value-identical to the relational signature pipeline (explode shingles →
  * md5 → 8 permutation mins in a groupBy) and to its DuckDB oracle CTEs —
  * the min over the shingle multiset equals the min over the distinct set,
  * so signatures agree whether or not duplicates were collapsed first. The
  * win is the plan shape: the relational form costs a generate (rows ×
  * ~shingle-count blow-up) plus a full groupBy SHUFFLE of every shingle
  * hash; this expression is a narrow map — signatures for 100 TB of text
  * without a single shuffled byte, feeding LSH banding directly.
  *
  * Shingle string = words joined with a single space (null words skipped,
  * matching `concat_ws`); hashing is MD5 over the UTF-8 bytes, top 7 hex
  * chars (28 bits) — bit-for-bit the relational pipeline's
  * `conv(substring(md5(s),1,7),16,10)`.
  *
  * Contract: arrays with fewer than 3 words have no shingles and return
  * the all-`Long.MaxValue` sentinel signature — callers filter
  * `size(w) >= 3` first (as every shingle consumer already does), the
  * sentinel never collides with a real permutation value (all < 2^31).
  */
case class MinHashSigs(child: Expression, numPerms: Int = 8)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _ if !MinHashSigs.widths.contains(numPerms) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName supports widths ${MinHashSigs.widths.keys.toSeq.sorted}, got $numPerms")
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    MinHashSigs.compute(input.asInstanceOf[ArrayData], numPerms)

  // MODULE$-qualified for the same reason as ToUpperCamelCase: resolving
  // through the case class relies on a static forwarder scalac may omit.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashSigs$$.MODULE$$.compute($c, $numPerms)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  import graft.ext.Dedup.{MinhashA, MinhashB, MinhashP, WideA, WideB, WideNumPerms}

  // permutation tables by width: 8 = legacy demo constants, 128 = wide
  private[functions] val widths: Map[Int, (Array[Long], Array[Long])] = Map(
    MinhashA.size -> ((MinhashA.toArray, MinhashB.toArray)),
    WideNumPerms -> ((WideA.toArray, WideB.toArray)))

  // one digest per thread — codegen calls this per row; no per-row churn
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val Space = Array[Byte](' ')

  def compute(words: ArrayData, numPerms: Int): ArrayData = {
    val (a, b) = widths(numPerms)
    val n = words.numElements()
    val mins = Array.fill(numPerms)(Long.MaxValue)
    val md = digest.get()
    var i = 0
    while (i + 2 < n) {
      md.reset()
      // shingle bytes = UTF-8 of concat_ws(' ', w(i), w(i+1), w(i+2)):
      // null words contribute nothing (and no separator), like concat_ws
      var first = true
      var k = i
      while (k <= i + 2) {
        if (!words.isNullAt(k)) {
          if (!first) md.update(Space)
          md.update(words.getUTF8String(k).getBytes)
          first = false
        }
        k += 1
      }
      val dg = md.digest()
      // first 7 hex chars = bytes 0..2 plus the high nibble of byte 3
      val h = ((dg(0) & 0xffL) << 20) | ((dg(1) & 0xffL) << 12) |
        ((dg(2) & 0xffL) << 4) | ((dg(3) & 0xffL) >>> 4)
      var j = 0
      while (j < numPerms) {
        val p = (a(j) * h + b(j)) % MinhashP
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  import org.apache.spark.sql.GraftShims
  def apply(c: Column): Column =
    GraftShims.column(MinHashSigs(GraftShims.expression(c)))
  def apply(c: Column, numPerms: Int): Column =
    GraftShims.column(MinHashSigs(GraftShims.expression(c), numPerms))
}
