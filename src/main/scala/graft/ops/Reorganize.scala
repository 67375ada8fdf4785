package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** COMPACTION THAT COMMUTES with concurrent row-level MERGEs —
  * Delta's OPTIMIZE-vs-update rebase distilled onto the key-domain
  * layer model (+ stable row ids for the identity certificate).
  *
  * A compaction is a pure REORGANIZATION: same logical rows, new
  * physical layout. Under partition-granular conflicts it loses to
  * ANY rival touching its partition and must redo the whole rewrite —
  * at 100 TB that makes maintenance and ingest mutually exclusive on
  * hot partitions. But when the rival is a KEY-DOMAIN layer (a MERGE
  * that committed only its changed key ranges), the compaction
  * commutes: the rival's delta is self-describing — its rows replace
  * the staged rows inside its declared ranges — so the loser PATCHES
  * its already-staged output (delta-proportional work) instead of
  * re-deriving it (partition-proportional), and retries. Stable row
  * ids ([[graft.queries.MaintenancePipelineQuery]] `q_row_tracking`)
  * ride through both the rewrite and the patch, so every surviving
  * logical row keeps its identity across the commuted pair — the
  * property the spec certifies bit-for-bit against the serial order.
  *
  * A rival that rewrote the partition FULLY is NOT commutable (the
  * staged compaction is worthless against a complete rewrite) — that
  * surfaces as [[Reorganize.NonCommutable]] and the caller recompacts
  * from the new base.
  *
  * Scale shape: staging is one layered read + bin-packed write (paid
  * once); each rebase round is one anti-filter + union over the
  * rival's staged delta (delta-proportional) + the commit's
  * metadata-only validation. */
object Reorganize {

  /** The rival rewrote the partition fully — rebasing is impossible;
    * recompact from the new base. */
  final class NonCommutable(msg: String) extends RuntimeException(msg)

  /** Compact `partition` (bin-pack its layered view into one file)
    * and commit, rebasing across concurrent key-domain rivals.
    * `locate` maps an entry's dataPath to a readable location
    * (identity for absolute paths). `onFirstStage` runs after the
    * first staging write and before its commit attempt — the
    * deterministic race-injection seam (the Delta-test commit-hook
    * pattern); production callers leave it a no-op. Returns the
    * committed version. */
  def compactPartition(spark: SparkSession, root: String,
                       partition: String, keyCol: String,
                       stageDir: String, writer: String = "compactor",
                       locate: String => String = identity,
                       onFirstStage: () => Unit = () => (),
                       maxRebase: Int = 4): Long = {
    var base = CommitLog.stableVersion(root)
    var staged = LakeRead.layeredFrame(spark,
      CommitLog.resolveLayers(root, partition, base), keyCol, locate)
    var attempt = 0
    while (true) {
      val out = s"$stageDir/attempt$attempt"
      staged.coalesce(1).write.mode("overwrite").parquet(out)
      if (attempt == 0) onFirstStage()
      try {
        return CommitLog.tryCommit(root, CommitLog.Entry(
          writer, "compact", out, Seq(partition), base))
      } catch {
        case ex: CommitLog.CommitConflict =>
          attempt += 1
          if (attempt > maxRebase) throw ex
          val newBase = CommitLog.stableVersion(root)
          val rivals = CommitLog.readLog(root).filter { case (v, e) =>
            v > base && v <= newBase && e.partitions.contains(partition)
          }
          rivals.find { case (_, e) => !e.keyDomains.contains(partition) }
            .foreach { case (v, e) =>
              throw new NonCommutable(
                s"rival at v$v rewrote '$partition' fully (op=${e.op})" +
                  " — compaction cannot rebase; recompact from the new base")
            }
          // the COMMUTATION: re-apply each rival layer to the staged
          // artifact (read back physically — the patch is over staged
          // files, never a recompute of the compaction's lineage), in
          // version order; row ids ride through untouched. A DV-shaped
          // rival ([[LakeRead.isDvLayer]]) patches as mask-plus-append
          // — same commute, delta-proportional either way.
          staged = rivals.sortBy(_._1)
            .foldLeft(spark.read.parquet(out)) { case (acc, (_, e)) =>
              val loc = locate(e.dataPath)
              if (LakeRead.isDvLayer(loc))
                acc.join(
                  broadcast(spark.read.parquet(s"$loc/keys")
                    .select(keyCol)), Seq(keyCol), "left_anti")
                  .unionByName(spark.read.parquet(s"$loc/rows"))
              else {
                val ranges = e.keyDomains(partition)
                acc.filter(!LakeRead.inDomain(col(keyCol), ranges))
                  .unionByName(spark.read.parquet(loc)
                    .filter(LakeRead.inDomain(col(keyCol), ranges)))
              }
            }
          base = newBase
          // an in-flight (not yet resolved) rival leaves rivals empty
          // and newBase == base: back off and retry against the same
          // staging — the winner's metadata-only commit lands fast
          if (rivals.isEmpty) Thread.sleep(1L << math.min(attempt, 7))
      }
    }
    -1L // unreachable
  }
}
