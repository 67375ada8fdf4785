package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DataFrame-side materialization of [[CommitLog.resolveLayers]] —
  * the one place the layered-read fold lives, shared by the
  * `graftlake` connector, `q_merge_concurrent`, and the specs so the
  * MERGE semantics cannot drift between consumers.
  *
  * Semantics (per [[CommitLog.Entry.keyDomains]]): start from the
  * base; per layer in version order, REPLACE the rows whose key falls
  * inside ANY of the layer's inclusive [lo, hi] ranges with the
  * layer's rows. Later layers replace earlier layers inside an
  * overlap, because the fold filters the accumulated frame — exactly
  * the newest-wins-within-domain contract.
  *
  * Scale shape: the fold is |layers| pruned scans unioned — each
  * layer contributes only its (delta-proportional) staged rows, the
  * base contributes everything outside the union of domains; no
  * shuffle is introduced beyond the scans themselves. */
object LakeRead {

  /** `key ∈ ∪ ranges` as one predicate — pushed to the parquet scan
    * (a disjunction of range filters stays pushdown-eligible). */
  def inDomain(key: Column, ranges: Seq[(Long, Long)]): Column =
    ranges.map { case (lo, hi) => key.between(lo, hi) }
      .reduce(_ || _)

  /** A DELETION-VECTOR layer's artifact shape: the staged dataPath
    * holds `keys/` (the tombstone key set — delete keys + update
    * pre-image keys, one column named by the merge key) and `rows/`
    * (update post-images + inserts). Self-describing: a layer whose
    * location carries a committed `keys/` dir resolves as a DV layer;
    * anything else is a RANGE layer (full replacement content for its
    * declared domain). The key DOMAIN on the entry stays the conflict
    * descriptor either way — DV flips only the READ arithmetic from
    * range-replacement to mask-plus-append, which is the
    * delta-proportional economics (`q_merge_dv`): the layer stores
    * keys + changed rows, never a range's full content. */
  def isDvLayer(location: String): Boolean =
    new java.io.File(s"$location/keys", "_SUCCESS").exists()

  /** Materialize one partition's layered view from
    * [[CommitLog.resolveLayers]] output. `path` maps a layer's
    * dataPath to a readable parquet location (identity when entries
    * store absolute paths; `root`-prefixing when they are relative).
    *
    * Per layer, in version order: a RANGE layer replaces the rows
    * whose key falls in its domain with its own; a DV layer
    * ([[isDvLayer]]) anti-joins the accumulated frame against its
    * broadcast tombstone keys (tombstones small by law — they are
    * the DELTA) and appends its `rows/` — `q_merge_dv`'s
    * base ⟕anti DV ∪ append resolution, recovered from the log. */
  def layeredFrame(spark: SparkSession,
                   layers: Seq[(Long, String, Option[Seq[(Long, Long)]])],
                   keyCol: String,
                   path: String => String = identity): DataFrame =
    layers.tail.foldLeft(spark.read.parquet(path(layers.head._2))) {
      case (acc, (_, p, Some(ranges))) =>
        val loc = path(p)
        if (isDvLayer(loc))
          acc.join(
            broadcast(spark.read.parquet(s"$loc/keys").select(keyCol)),
            Seq(keyCol), "left_anti")
            .unionByName(spark.read.parquet(s"$loc/rows"))
        else
          acc.filter(!inDomain(col(keyCol), ranges))
            .unionByName(spark.read.parquet(loc)
              .filter(inDomain(col(keyCol), ranges)))
      case (acc, _) => acc
    }
}
