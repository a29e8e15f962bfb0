package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exactly-once micro-batch application to a partitioned file ledger.
  *
  * Structured Streaming's `foreachBatch` contract is at-least-once: the
  * engine commits a batch's offsets to the checkpoint only AFTER the
  * user function returns, so a crash after the sink write but before the
  * commit replays the whole micro-batch on restart (same batchId, same
  * rows — file/Kafka sources replay deterministically from the
  * write-ahead offset log). A naive read-merge-overwrite upsert (the
  * obvious form of c21's rollup maintenance) DOUBLE-APPLIES under that
  * replay: the re-run merges the batch's partials into a ledger that
  * already contains them. This mirrors the reference consumer's own
  * at-least-once commit window (`src/consumer/legacy-consumer.ts:100-106`
  * commits offsets only after the handler resolves), upgraded here to
  * exactly-once observable effects on the sink.
  *
  * The fix is the staged-swap machinery s24/c21 already use, made
  * transactional by keying the STAGE on batchId and ordering the commit
  * point correctly — the same batchId-versioned-transaction idea
  * Delta-style sinks use for `foreachBatch` idempotence:
  *
  *  - Phase 1 (stage = the transaction log): if `stage_<batchId>` lacks
  *    its `_GRAFT_STAGED` marker, compute the merged post-state of the
  *    TOUCHED partitions from the current ledger + this batch's
  *    partials, write it to `stage_<batchId>` (mode=overwrite: a crash
  *    mid-stage just rewrites), then create the marker file LAST — a
  *    single atomic file create, the phase's commit point. A crash
  *    anywhere before the marker leaves the ledger untouched, so the
  *    replay recomputes the identical stage from identical inputs.
  *  - Phase 2 (swap, idempotent by construction): dynamic-partition-
  *    overwrite the ledger's touched partitions FROM the staged files.
  *    Replaying the swap rewrites the same partitions with the same
  *    bytes — a no-op on observable state, safe after any crash point
  *    (including mid-swap: whole-partition overwrite replaces torn
  *    output). Once the marker exists the merge is never recomputed, so
  *    the post-swap ledger can never feed a second merge of the same
  *    batch.
  *
  * Net: for every crash point — mid-stage, post-stage/pre-swap,
  * mid-swap, post-swap/pre-checkpoint-commit — replaying the batch
  * converges to the once-applied ledger. `StreamingParitySpec` proves
  * the post-sink/pre-commit window (the one a correctness bug would
  * hide in) by injecting a crash after `applyBatch` returns and
  * restarting from the same checkpoint.
  *
  * Scale shape: identical to c21 — the batch's partials are mergeable
  * states (never raw history), only touched partitions are read and
  * rewritten, and the stage adds one batch-sized write. Stages older
  * than the engine's committed batch are dead; `pruneStages` reclaims
  * them (a replay can only ever be of the LATEST uncommitted batch, so
  * pruning `batchId - 1` and older at the top of batch `batchId` is
  * always safe).
  */
object ExactlyOnceSink {

  /** Outcome of one `applyBatch` call, so callers (and specs) can
    * observe whether the merge ran or a replay skipped straight to the
    * idempotent swap. */
  sealed trait Outcome
  case object Merged extends Outcome
  case object Replayed extends Outcome

  /** Apply one micro-batch's `partials` into the partitioned parquet
    * ledger at `root/roll`, exactly once per `batchId` even across
    * crash-and-replay. A fresh root bootstraps: when `root/roll` does
    * not exist yet (the first-ever batch), the merge runs against an
    * empty ledger rather than failing on the missing path.
    *
    * @param root        sink root; the ledger lives at `root/roll`
    *                    (partitioned by `partitionCol`), stages at
    *                    `root/stage_<batchId>`
    * @param batchId     the foreachBatch batch id (the replay key)
    * @param partials    this batch's mergeable partial states — must be
    *                    deterministic for a given batch (Spark replays
    *                    the same source rows, so any deterministic
    *                    aggregation qualifies). `partitionCol` values
    *                    must be NON-NULL: a null cannot name a touched
    *                    partition directory (enforced with a fast
    *                    failure here, not a silent drop)
    * @param remerge     merges `ledgerRows ∪ partials` (both in ledger
    *                    schema) back to one state row per key. CONTRACT:
    *                    must emit at least one row for every touched
    *                    partition — phase 2's dynamic overwrite can only
    *                    rewrite partitions PRESENT in the stage, so a
    *                    remerge that drops a touched partition entirely
    *                    (tombstone/delete semantics) would leave the old
    *                    partition's rows in the ledger. ENFORCED: after
    *                    staging, the staged partition set is checked to
    *                    cover every touched partition and the batch
    *                    fails loudly (before the merge's commit point,
    *                    so a replay re-fails rather than half-applying)
    *                    on violation. GroupBy-style
    *                    merges satisfy this by construction (every
    *                    touched key contributes a state row); a deleting
    *                    merge needs explicit partition deletes instead
    *                    of this sink
    * @param partitionCol ledger partition column (also the touched-
    *                    partition pruning key)
    */
  def applyBatch(root: String, batchId: Long, partials: DataFrame,
                 remerge: DataFrame => DataFrame,
                 partitionCol: String): Outcome = {
    val spark = partials.sparkSession
    val rollPath = s"$root/roll"
    val stagePath = s"$root/stage_$batchId"
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // leading-underscore name: Spark's file index ignores it when the
    // stage dir is read back as parquet (same convention as _SUCCESS)
    val marker = new Path(stagePath, "_GRAFT_STAGED")
    val outcome = if (!fs.exists(marker)) {
      // phase 1 — stage the post-state of the touched partitions only.
      // The touched list is a per-batch handful of partition keys (a
      // driver-side overwrite decision, same as s24's compaction list).
      spark.catalog.refreshByPath(rollPath)
      val touchedRaw = partials.select(col(partitionCol).cast("string"))
        .distinct().collect().map(r => Option(r.getString(0))).toSeq
      // a null partition value cannot name a touched partition dir —
      // fail loudly rather than NPE or silently mis-route rows
      require(touchedRaw.forall(_.isDefined),
        s"ExactlyOnceSink: null value in partition column '$partitionCol'" +
          s" of batch $batchId partials — partition keys must be non-null")
      val touched = touchedRaw.flatten
      // bootstrap: the first-ever batch has no ledger yet; merge
      // against an empty frame of the same (ledger == partials) schema
      val ledger =
        if (fs.exists(new Path(rollPath)))
          spark.read.parquet(rollPath)
            .filter(col(partitionCol).cast("string").isin(touched: _*))
        else partials.limit(0)
      remerge(ledger.unionByName(partials))
        .write.mode("overwrite").parquet(stagePath)
      // must-emit contract check BEFORE the commit point: phase 2 can
      // only rewrite partitions present in the stage, so a remerge that
      // dropped a touched partition would silently leave that
      // partition's stale rows in the ledger — exactly the failure the
      // contract paragraph warns about. Checked against the staged
      // FILES (what phase 2 will actually read), not the remerge plan.
      val staged = spark.read.parquet(stagePath)
        .select(col(partitionCol).cast("string")).distinct()
        .collect().map(r => Option(r.getString(0))).toSet
      require(!staged.contains(None),
        s"ExactlyOnceSink: remerge of batch $batchId produced a NULL " +
          s"'$partitionCol' partition value — partition keys must be non-null")
      val dropped = touched.toSet.diff(staged.flatten)
      require(dropped.isEmpty,
        s"ExactlyOnceSink: remerge of batch $batchId emitted no rows for " +
          s"touched partition(s) ${dropped.mkString(", ")} — every touched " +
          "partition must appear in the staged output (a deleting merge " +
          "needs explicit partition deletes, not this sink)")
      fs.create(marker, true).close() // commit point of the merge
      Merged
    } else Replayed
    // phase 2 — idempotent swap: whole-partition overwrite from the
    // frozen stage; replaying it rewrites identical content
    spark.read.parquet(stagePath)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCol).parquet(rollPath)
    spark.catalog.refreshByPath(rollPath)
    outcome
  }

  /** Drop stage dirs for batches strictly below `committedBatchId`.
    * Safe to call at the top of batch N with `committedBatchId = N`:
    * the engine only starts batch N after committing N-1, so no replay
    * of an older batch can occur. */
  def pruneStages(root: String, committedBatchId: Long,
                  partials: DataFrame): Unit = {
    val fs = new Path(root).getFileSystem(
      partials.sparkSession.sparkContext.hadoopConfiguration)
    val rootPath = new Path(root)
    if (fs.exists(rootPath)) {
      fs.listStatus(rootPath).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("stage_")) {
          val id = scala.util.Try(name.stripPrefix("stage_").toLong)
          if (id.toOption.exists(_ < committedBatchId))
            fs.delete(st.getPath, true)
        }
      }
    }
  }
}
