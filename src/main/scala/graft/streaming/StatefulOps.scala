package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

import graft.core.Tok
import graft.ext.Dedup

/** Custom stateful streaming operators.
  *
  * [[RunningStatsProcessor]] uses Spark 4's `transformWithState` API (the
  * successor to mapGroupsWithState): typed per-key state in the RocksDB
  * state store, TTL-able, timer-capable. At 100 TB/day the state store
  * shards by key across executors and checkpoints incrementally — the
  * operator itself holds one small row per key.
  *
  * [[StreamingDedup]] is the streaming twin of the batch MinHash dedup
  * (Dedup d03): an incoming document whose 8-permutation signature was
  * already seen inside the watermark horizon is dropped. State size is
  * bounded by the watermark; the signature (8 longs) is independent of
  * document length, so the state store never holds documents.
  */
object StatefulOps {

  /** Per-key running (count, sum) via transformWithState. */
  class RunningStatsProcessor
    extends StatefulProcessor[Long, (Long, Double), (Long, Long, Double)] {
    @transient private var state: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Double)](
        "stats", ExpressionEncoder[(Long, Double)](), TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Long, Double)] = {
      val (dn, dsum) = rows.foldLeft((0L, 0.0)) { case ((n, s), r) => (n + 1, s + r._2) }
      val prev = if (state.exists()) state.get() else (0L, 0.0)
      val next = (prev._1 + dn, prev._2 + dsum)
      state.update(next)
      Iterator.single((key, next._1, next._2))
    }
  }

  /** Streaming funnel — the incremental twin of the batch q45 stage
    * machine. Keyed by user; state is one fixed-size row per user:
    * `(seen, t1, t2, t3)` in event-time micros with −1 for "stage not
    * reached" — the state store never holds events, so 100 TB/day of
    * traffic costs 32 bytes × active users.
    *
    * Correctness contract: EVENT-TIME-ORDERED DELIVERY across triggers
    * (the live-feed condition; within a trigger rows are re-sorted here,
    * so only cross-trigger order matters). Under it the incremental fold
    * computes exactly the batch semantics — t1 = min view ts, t2 = min
    * click ts strictly after t1, t3 = min purchase ts strictly after t2:
    * processing in ts order makes "first qualifying seen" ≡ "min
    * qualifying", including the equal-timestamp edge (strict `>` rejects
    * an equal-ts successor in both modes, whichever side of the sort it
    * lands on). Out-of-order tails need the watermark machinery instead —
    * that accounting is q46's territory. Each trigger emits the key's
    * updated state (Update mode); `seen` is the per-user event count,
    * monotone, so the row with max `seen` is the final state. */
  class FunnelProcessor
    extends StatefulProcessor[Long, (Long, String, Long), (Long, Long, Long, Long, Long)] {
    @transient private var state: ValueState[(Long, Long, Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long, Long, Long)](
        "funnel", ExpressionEncoder[(Long, Long, Long, Long)](), TTLConfig.NONE)

    override def handleInputRows(
        key: Long,
        rows: Iterator[(Long, String, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
      var (seen, t1, t2, t3) =
        if (state.exists()) state.get() else (0L, -1L, -1L, -1L)
      rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, et, ts) =>
        seen += 1
        if (et == "view" && t1 < 0) t1 = ts
        else if (et == "click" && t2 < 0 && t1 >= 0 && ts > t1) t2 = ts
        else if (et == "purchase" && t3 < 0 && t2 >= 0 && ts > t2) t3 = ts
      }
      state.update((seen, t1, t2, t3))
      Iterator.single((key, seen, t1, t2, t3))
    }
  }

  /** MinHash signature over a words-array column (same permutation
    * constants as the batch d03 pipeline). Requires `size(wordsCol) >= 3`;
    * callers must provide a fallback for shorter inputs. */
  private def signatureCol(wordsCol: String): org.apache.spark.sql.Column = {
    val w = wordsCol
    val sigs = (0 until 8).map { j =>
      s"""array_min(transform(
         |  transform(sequence(1, size($w) - 2),
         |    i -> CAST(conv(substr(md5(CAST(concat_ws(' ', element_at($w, i),
         |         element_at($w, i + 1), element_at($w, i + 2)) AS BINARY)), 1, 7), 16, 10) AS BIGINT)),
         |  h -> (${Dedup.MinhashA(j)}L * h + ${Dedup.MinhashB(j)}L) % ${Dedup.MinhashP}L))""".stripMargin
    }
    expr(s"concat_ws('-', ${sigs.mkString(", ")})")
  }

  object StreamingDedup {
    /** Drop documents whose MinHash signature already appeared within the
      * watermark horizon; emits the surviving rows (append mode). `df`
      * needs an event-time column and a text column. Documents too short
      * for 3-gram shingling fall back to an exact-text signature — they
      * pass through unless literally identical, never silently vanish. */
    def bySignature(
        df: DataFrame,
        tsCol: String,
        textCol: String,
        watermark: String = "1 hour"): DataFrame =
      df.withColumn("__w", split(trim(col(textCol)), Tok.Ws))
        .withColumn("minhash_sig",
          when(size(col("__w")) >= 3, signatureCol("__w"))
            .otherwise(concat(lit("exact:"), md5(col(textCol).cast("binary")))))
        .drop("__w")
        .withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("minhash_sig")
  }
}
