package graft.ops

/** CROSS-TABLE (SPANNING) TRANSACTIONS over [[CommitLog]] — the
  * general form of what the erasure flagship pioneered bespoke
  * (reference pipeline steps `il_analysis_git.py:126-175` compose
  * several tables per run; a platform doing that atomically needs a
  * commit that flips ALL of them at one slot). The protocol is the
  * Delta log→files indirection lifted one level, log→tables:
  *
  *   - A spanning transaction stages its per-table data privately,
  *     writes ONE tiny TIER MANIFEST (`table → data path`, TSV,
  *     kilobytes at any scale), and commits ONE [[CommitLog.Entry]]
  *     whose partitions are the table-qualified tier names and whose
  *     dataPath names the manifest. A crash between table writes
  *     leaves the spanning entry uncommitted — readers of EVERY
  *     member table still resolve the prior manifest: all-or-nothing
  *     to observers.
  *   - CONCURRENCY is inherited from the commit protocol, with tier
  *     names as the conflict surface: two spanning transactions over
  *     INTERSECTING tier sets produce exactly one winner (the
  *     in-flight lower-slot-wins rule); disjoint tier sets from the
  *     same snapshot both land; a spanning transaction and a plain
  *     single-table [[CommitLog.tryCommit]] writer naming one member
  *     tier as its partition conflict in BOTH directions — the tier
  *     name is one shared namespace, so the spanning entry needs no
  *     special casing in validation.
  *   - READS: [[resolveTiers]] hands each tier to the newest
  *     committed manifest naming it (tiers may resolve at different
  *     versions when transactions touch different subsets — each is
  *     still internally atomic); [[resolveUniform]] additionally
  *     REQUIRES every tier to resolve at one slot — the erasure
  *     flagship's invariant, where every commit spans all tiers.
  *
  * Scale shape: manifests are |tiers| lines; commit and resolution
  * are metadata-only ([[CommitLog]]'s critical-section guarantee);
  * data staging happens before, outside any lock. */
object MultiTableCommit {

  private def manifestFile(logRoot: String, mPath: String) =
    new java.io.File(logRoot, mPath)

  /** Stage the tier manifest and commit the spanning entry. `name`
    * keys the manifest file (re-commits under one name overwrite the
    * staged manifest BEFORE the commit — the entry that loses a race
    * never became visible, so the overwrite is safe for the winner
    * only when names are per-attempt; use distinct names per
    * transaction). Throws [[CommitLog.CommitConflict]] exactly as
    * `tryCommit` does. */
  def commit(logRoot: String, writer: String, name: String, op: String,
             tiers: Map[String, String], base: Long): Long = {
    require(tiers.nonEmpty, "a spanning transaction must name tiers")
    val mPath = s"manifests/$name.tsv"
    val f = manifestFile(logRoot, mPath)
    f.getParentFile.mkdirs()
    java.nio.file.Files.writeString(f.toPath,
      tiers.toSeq.sorted.map { case (t, p) => s"$t\t$p" }
        .mkString("", "\n", "\n"))
    CommitLog.tryCommit(logRoot, CommitLog.Entry(
      writer, op, mPath, tiers.keys.toSeq.sorted, base))
  }

  private def readManifest(logRoot: String,
                           mPath: String): Map[String, String] =
    java.nio.file.Files.readString(manifestFile(logRoot, mPath).toPath)
      .split("\n").filter(_.nonEmpty)
      .map { l => val p = l.split("\t", -1); p(0) -> p(1) }.toMap

  /** Tier → (owning version, data path): each tier resolves through
    * the newest committed entry naming it, then through that entry's
    * manifest. Entries whose dataPath is not a manifest this object
    * wrote (a plain single-table writer on the shared namespace)
    * resolve to their dataPath directly. */
  def resolveTiers(logRoot: String): Map[String, (Long, String)] = {
    // one read per DISTINCT manifest, not per tier
    val cache = scala.collection.mutable.Map.empty[String, Map[String, String]]
    CommitLog.resolvePartitions(logRoot).map { case (tier, (v, dp)) =>
      val path =
        if (dp.startsWith("manifests/") &&
            manifestFile(logRoot, dp).isFile)
          cache.getOrElseUpdate(dp, readManifest(logRoot, dp))
            .getOrElse(tier, dp)
        else dp
      tier -> (v, path)
    }
  }

  /** [[resolveTiers]] under the EVERY-COMMIT-SPANS-ALL-TIERS
    * discipline: requires all tiers to resolve at ONE slot (readers
    * of every tier gate on the same resolved version) and returns it
    * with the tier map. */
  def resolveUniform(logRoot: String): (Long, Map[String, String]) = {
    val owners = resolveTiers(logRoot)
    val vs = owners.toSeq.map(_._2._1).distinct
    require(vs.size == 1,
      s"tiers resolve to multiple versions — not atomic: $owners")
    (vs.head, owners.map { case (t, (_, p)) => t -> p })
  }
}
