package graft.ops

/** EXACTLY-ONCE micro-batch writes THROUGH [[CommitLog]] — the seam
  * between the streaming and lakehouse tiers. Structured Streaming's
  * `foreachBatch` contract is AT-LEAST-ONCE: after a crash between
  * the sink's write and the engine's checkpoint advance, the same
  * (streamId, batchId) is RE-DELIVERED on restart. A sink that blindly
  * re-applies it double-counts; a transactional sink records the
  * batch identity in the same atomic commit as the data and skips the
  * duplicate — Delta's `txnAppId`/`txnVersion` dedup, distilled onto
  * the commit-log entry itself:
  *
  *   - IDENTITY: the committed entry carries `writer = streamId`,
  *     `op = stream:<batchId>` — one atomic artifact holds both the
  *     data flip and the transaction identity, so there is no window
  *     where data landed but the identity didn't (the flaw of a
  *     side-table dedup).
  *   - SKIP RULE: a delivery with `batchId ≤` the stream's committed
  *     high-water mark is dropped BEFORE staging (Structured
  *     Streaming batch ids are strictly monotone per checkpoint
  *     lineage, so ≤ means already-applied, never out-of-order new
  *     work).
  *   - DURABILITY ACROSS EXPIRY: [[CommitLog.checkpoint]] folds the
  *     per-stream watermarks into `#txn` checkpoint lines, so the
  *     skip rule survives [[CommitLog.expireBelow]] physically
  *     deleting the slots that carried the `stream:` entries.
  *   - RACES: a zombie duplicate delivery that loses the commit race
  *     re-checks the watermark on [[CommitLog.CommitConflict]] and
  *     skips. Staging disciplines, pick per sink:
  *     (a) BATCH-DETERMINISTIC paths (streamId + batchId) — a
  *     duplicate's staging coincides with the winner's files and
  *     nothing orphans, BUT two zombies writing the shared dir
  *     concurrently can interleave delete+write and leave both jobs'
  *     part files (doubled rows): only safe when deliveries cannot
  *     overlap in time;
  *     (b) ATTEMPT-UNIQUE paths (what the graftlake sink uses) — the
  *     winner's dir is pristine under any interleaving; a zombie that
  *     lost AFTER claiming leaves an aborted entry naming its path,
  *     reclaimable via [[CommitLog.sweepOrphanStaging]]; one that
  *     skipped before claiming leaves junk for the caller's age-based
  *     retention (Delta's VACUUM answer).
  *
  * Scale shape: the skip check and the commit are metadata-only (the
  * commit-log critical-section guarantee); `stage()` — the only data
  * work — runs once per genuinely-new batch and never for a
  * re-delivery. */
object StreamCommit {

  /** The stream's committed high-water mark: highest batch id this
    * streamId ever committed (live entries ∪ checkpoint `#txn` folds),
    * None for a stream that never committed. */
  def lastCommittedBatch(root: String, streamId: String): Option[Long] =
    CommitLog.txnWatermarks(root).get(streamId)

  /** Commit one micro-batch exactly once. `stage` materializes the
    * batch's private data and returns (dataPath, touched partitions) —
    * it is called ONLY when the batch is new, and duplicate deliveries
    * of one batch MUST return the same partition set (they carry the
    * same rows — always true for a deterministic sink). Returns
    * Some(version) when this delivery applied the batch, None when it
    * was a detected re-delivery (already committed — possibly by a
    * rival duplicate that won the race mid-call). Genuine partition
    * conflicts with OTHER writers rebase from a fresh stable base up
    * to `maxRebase` times, then surface.
    *
    * Race-freedom of the skip: the watermark is re-read AFTER the
    * stable base on every attempt, so a duplicate that committed
    * before the base read is visible to the watermark check, and one
    * that commits after it lands ABOVE the base (in-flight claims
    * never sit at or below a stable version) — a write-write rival
    * `tryCommit` conflicts on (same batch ⇒ same partitions), landing
    * in the catch where the watermark is checked again. No
    * interleaving applies a batch twice. */
  def commitBatch(root: String, streamId: String, batchId: Long,
                  stage: () => (String, Seq[String]),
                  maxRebase: Int = 8): Option[Long] =
    commitBatchRebasing(root, streamId, batchId, _ => stage(), maxRebase)

  /** [[commitBatch]] with BASE-AWARE staging — the variant a
    * read-modify-write sink needs. `stageAt(base)` derives the
    * batch's data AGAINST that stable base and is re-invoked per
    * rebase: a sink whose staged content depends on the table state
    * (the graftlake Append sink unions the touched partitions'
    * current rows) would otherwise retry a genuine conflict with
    * STALE staged data and silently overwrite the rival's rows — the
    * lost update the rebase exists to prevent. Base-independent
    * sinks (the batch-tranche shape) just ignore the argument; their
    * deterministic re-staging overwrites identical content.
    *
    * Staging-path discipline under rebase: derive the path from
    * (streamId, batchId, base) — duplicates racing AT THE SAME BASE
    * coincide (nothing torn: identical content), distinct bases never
    * share a path (a committing winner's files are never rewritten by
    * a rebasing loser). A loser's other-base stagings are
    * unreferenced junk for age-based retention. */
  def commitBatchRebasing(root: String, streamId: String, batchId: Long,
                          stageAt: Long => (String, Seq[String]),
                          maxRebase: Int = 8): Option[Long] =
    commitBatchRebasingStats(root, streamId, batchId,
      base => { val (p, ps) = stageAt(base); (p, ps, Map.empty) },
      maxRebase)

  /** [[commitBatchRebasing]] whose staging also returns per-partition
    * byte statistics ([[CommitLog.Entry.partBytes]]) — the sink already
    * walked its staged files for the manifest, so the planner stats
    * ride the same commit for free. */
  def commitBatchRebasingStats(root: String, streamId: String,
                               batchId: Long,
                               stageAt: Long =>
                                 (String, Seq[String], Map[String, Long]),
                               maxRebase: Int = 8): Option[Long] = {
    require(batchId >= 0, s"negative batchId $batchId")
    require(!streamId.contains("\t") && !streamId.contains("\n"),
      s"streamId must be entry-safe: '$streamId'")
    // the cheap common-path check — a plain restart re-delivery never
    // stages a byte
    if (lastCommittedBatch(root, streamId).exists(_ >= batchId))
      return None
    var rebases = 0
    while (true) {
      val base = CommitLog.stableVersion(root) // BEFORE the re-check
      if (lastCommittedBatch(root, streamId).exists(_ >= batchId))
        return None
      val (dataPath, partitions, partBytes) = stageAt(base)
      // exactly-once leans on same-batch duplicates WRITE-WRITE
      // conflicting via identical partition sets; an empty partition
      // set has no conflict surface, so two racing duplicate
      // deliveries could BOTH commit (two stream: entries for one
      // batch). An empty micro-batch must stage a sentinel partition
      // (e.g. "empty_<streamId>") to keep the conflict surface
      // non-empty.
      require(partitions.nonEmpty,
        s"stage() for $streamId batch $batchId returned no partitions — " +
          "an empty micro-batch must return a sentinel partition so " +
          "duplicate deliveries keep a write-write conflict surface")
      try {
        return Some(CommitLog.tryCommit(root, CommitLog.Entry(
          streamId, s"${CommitLog.StreamOpPrefix}$batchId", dataPath,
          partitions, base, partBytes = partBytes)))
      } catch {
        case ex: CommitLog.CommitConflict =>
          // the rival may have been OUR duplicate: re-check identity
          if (lastCommittedBatch(root, streamId).exists(_ >= batchId))
            return None
          rebases += 1
          if (rebases > maxRebase) throw ex
          Thread.sleep(1L << math.min(rebases, 7))
      }
    }
    None // unreachable
  }
}
