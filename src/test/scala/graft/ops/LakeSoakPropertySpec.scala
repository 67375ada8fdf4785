package graft.ops

import graft.ops.CommitLog.{CommitConflict, Entry}
import org.scalatest.funsuite.AnyFunSuite

/** RANDOMIZED MULTI-WRITER SOAK over one commit log (round 19, r18
  * verdict #5: the concurrency specs were scenario-based; the r17/r18
  * ADVICE bugs were all "an interleaving nobody scripted") — a seeded
  * generator drives N threads × {data commit, key-domain merge,
  * manual compaction, schema commit, stream batch, checkpoint,
  * expiry, vacuum} against one log and asserts GLOBAL invariants:
  *
  *   1. STABLE RESOLUTION MONOTONE — a monitor thread polls
  *      [[CommitLog.stableVersion]] throughout; it never decreases.
  *   2. NO LOST UPDATE — per partition, the resolution's winning
  *      version equals the MAXIMUM version any recorded successful
  *      commit touched it at (nothing a writer was told "committed"
  *      is ever shadowed by an older rival).
  *   3. EVERY COMMITTED WRITE READABLE — every path the resolution
  *      serves (full owners and every layer of every stack) exists on
  *      disk, before AND after a final vacuum (vacuum never reclaims
  *      live paths).
  *   4. EXACTLY-ONCE STREAMS — per stream, the txn watermark equals
  *      the highest batch id that delivery reported applied, and no
  *      batch id committed twice.
  *   5. SCHEMA LINEARITY — the active mapping is the newest recorded
  *      successful schema commit.
  *
  * Pure metadata (no Spark jobs): ops stage marker files, so 100+
  * seeds fit the CI budget while still racing the real claim /
  * validate / resolve / checkpoint / expiry / sweep code paths. */
class LakeSoakPropertySpec extends AnyFunSuite {

  private val Partitions = Vector("p0", "p1", "p2", "p3")

  private final case class Success(version: Long, partitions: Seq[String])

  private def stageDir(root: String, name: String): String = {
    val rel = s"data/$name"
    val d = new java.io.File(root, rel)
    d.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(d, "part-0").toPath, name)
    rel
  }

  /** One seeded episode; returns a diagnostic string on violation. */
  private def runSeed(seed: Int): Unit = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_soak_$seed").toString
    val rnd = new scala.util.Random(seed)
    val nThreads = 2 + rnd.nextInt(3)
    val opsPer = 3 + rnd.nextInt(3)
    // per-thread op scripts drawn up front (thread-safe determinism)
    val scripts = (0 until nThreads).map { t =>
      (0 until opsPer).map { _ =>
        (rnd.nextInt(100), rnd.nextInt(Partitions.size),
          rnd.nextInt(Partitions.size), rnd.nextLong(40).abs,
          rnd.nextInt(1 << 20))
      }
    }
    val successes =
      new java.util.concurrent.ConcurrentLinkedQueue[Success]()
    val streamApplied =
      new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val schemaApplied =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val violations =
      new java.util.concurrent.ConcurrentLinkedQueue[String]()
    // invariant 1: the stable version never decreases, ever
    @volatile var running = true
    val monitor = new Thread(() => {
      var last = 0L
      while (running) {
        val v = CommitLog.stableVersion(root)
        if (v < last) {
          val ls = Option(new java.io.File(root, "commitlog").listFiles())
            .map(_.map(_.getName).sorted.mkString(",")).getOrElse("-")
          violations.add(
            s"stableVersion went BACKWARDS: $last -> $v [dir: $ls]")
        }
        last = math.max(last, v)
        Thread.sleep(2)
      }
    })
    monitor.start()
    // invariant 3, DURING the run: a concurrent reader's resolved plan
    // must always be servable — resolution never throws unexpectedly
    // and every path it returns exists (committed owners are immutable
    // and never vacuumed; a reader racing checkpoint/expiry/vacuum
    // must not observe a torn state)
    val reader = new Thread(() => {
      while (running) {
        try {
          (CommitLog.resolveForRead(root) - CommitLog.SchemaPartition)
            .foreach {
              case (p, Left((v, dp))) =>
                if (!new java.io.File(root, dp).exists())
                  violations.add(s"mid-run: owner of $p gone: v$v $dp")
              case (p, Right(stack)) => stack.foreach { case (v, dp, _) =>
                if (!new java.io.File(root, dp).exists())
                  violations.add(s"mid-run: layer of $p gone: v$v $dp")
              }
            }
        } catch { case t: Throwable =>
          violations.add(s"mid-run resolution threw: " +
            s"${t.getClass.getSimpleName}: ${t.getMessage}")
        }
        Thread.sleep(3)
      }
    })
    reader.start()
    // seed commit so layers/compaction always have a base
    successes.add(Success(
      CommitLog.tryCommit(root, Entry("seed", "ingest",
        stageDir(root, "seed"), Partitions, 0L)), Partitions))
    val threads = (0 until nThreads).map { t =>
      new Thread(() => {
        var batchId = 0L
        scripts(t).zipWithIndex.foreach { case ((die, pi, pj, lo, nonce), k) =>
          val writer = s"w${t}_$k"
          try {
            if (die < 30) {
              // DATA COMMIT (overwrite of 1–2 partitions)
              val parts = Seq(Partitions(pi), Partitions(pj)).distinct
              val v = CommitLog.commitWithRebase(root, base =>
                Entry(writer, "rewrite",
                  stageDir(root, s"${writer}_b${base}_$nonce"),
                  parts, base))
              successes.add(Success(v, parts))
            } else if (die < 50) {
              // KEY-DOMAIN MERGE layer
              val p = Partitions(pi)
              val v = CommitLog.commitWithRebase(root, base =>
                Entry(writer, "merge",
                  stageDir(root, s"${writer}_m${base}_$nonce"),
                  Seq(p), base,
                  keyDomains = Map(p -> Seq((lo, lo + 5)))))
              successes.add(Success(v, Seq(p)))
            } else if (die < 62) {
              // MANUAL COMPACTION: full-partition commit that shadows
              // the partition's layers (re-arms checkpointing)
              val p = Partitions(pi)
              val v = CommitLog.commitWithRebase(root, base => {
                // prove the layered view is assemblable at this base
                val stack = CommitLog.resolveLayers(root, p, base)
                require(stack.nonEmpty)
                Entry(writer, "compact",
                  stageDir(root, s"${writer}_c${base}_$nonce"),
                  Seq(p), base)
              })
              successes.add(Success(v, Seq(p)))
            } else if (die < 70) {
              // SCHEMA COMMIT (conflicts with everything; few retries)
              var tries = 0
              var done = false
              while (!done && tries < 3) {
                val base = CommitLog.stableVersion(root)
                try {
                  val v = CommitLog.commitSchema(root, writer,
                    s"chg_${t}_$k", stageDir(root, s"${writer}_s$tries"),
                    base)
                  schemaApplied.add((v, s"chg_${t}_$k")); done = true
                } catch { case _: CommitConflict => tries += 1 }
              }
            } else if (die < 85) {
              // STREAM BATCH (exactly-once identity per thread-stream;
              // staging path derived from (streamId, batchId, base) —
              // the documented discipline: distinct bases never share
              // a path, so an aborted attempt's sweepable staging is
              // never the path the retry is about to commit)
              val sid = s"stream_t$t"
              val myBatch = batchId
              StreamCommit.commitBatchRebasing(root, sid, myBatch, base =>
                (stageDir(root, s"stream_${sid}_b${myBatch}_r${base}_$nonce"),
                  Seq(s"sp$t"))) match {
                case Some(_) =>
                  val prev = Option(streamApplied.put(sid, myBatch))
                  if (prev.exists(_ >= myBatch))
                    violations.add(s"$sid batch $myBatch applied twice")
                case None =>
                  if (!StreamCommit.lastCommittedBatch(root, sid)
                      .exists(_ >= myBatch))
                    violations.add(
                      s"$sid batch $myBatch skipped but not committed")
              }
              batchId += 1
            } else if (die < 92) {
              // CHECKPOINT (refuses over layered heads — acceptable)
              try CommitLog.checkpoint(root)
              catch { case _: IllegalStateException => () }
            } else if (die < 96) {
              // EXPIRY (needs a covering checkpoint; may refuse)
              try {
                val ck = CommitLog.checkpoint(root)
                if (ck > 0) CommitLog.expireBelow(root, ck)
              } catch {
                case _: IllegalStateException => ()
                case _: IllegalArgumentException => ()
              }
            } else {
              // VACUUM with a sane retention (in-flight staging young)
              graft.io.GraftLakeSource.vacuum(root,
                retainMillis = 60000L)
              ()
            }
          } catch {
            case _: CommitConflict => () // contended beyond rebases: ok
            case t: Throwable =>
              violations.add(s"op died: ${t.getClass.getSimpleName}: " +
                s"${t.getMessage}")
          }
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    running = false; monitor.join(); reader.join()
    // final vacuum, then check every invariant
    graft.io.GraftLakeSource.vacuum(root, retainMillis = 60000L)
    val plan = CommitLog.resolveForRead(root) - CommitLog.SchemaPartition
    val byPartition = successes.toArray(Array.empty[Success])
      .flatMap(s => s.partitions.map(_ -> s.version))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    byPartition.foreach { case (p, expect) =>
      val got = plan.get(p).map {
        case Left((v, _)) => v
        case Right(stack) => stack.map(_._1).max
      }
      if (!got.contains(expect))
        violations.add(
          s"LOST UPDATE on $p: newest success v$expect, served $got")
    }
    plan.values.foreach {
      case Left((v, dp)) =>
        if (!new java.io.File(root, dp).exists() &&
            !new java.io.File(dp).isAbsolute)
          violations.add(s"owner path gone after vacuum: v$v $dp")
      case Right(stack) => stack.foreach { case (v, dp, _) =>
        if (!new java.io.File(root, dp).exists() &&
            !new java.io.File(dp).isAbsolute)
          violations.add(s"layer path gone after vacuum: v$v $dp")
      }
    }
    val marks = CommitLog.txnWatermarks(root)
    streamApplied.forEach { (sid, hi) =>
      if (!marks.get(sid).contains(hi))
        violations.add(
          s"$sid watermark ${marks.get(sid)} != applied high $hi")
    }
    val schemas = schemaApplied.toArray(Array.empty[(Long, String)])
    if (schemas.nonEmpty) {
      val (hv, hc) = schemas.maxBy(_._1)
      val active = CommitLog.schemaHistory(root).lastOption
      // an expired-and-folded schema slot reads back as "(folded)" —
      // the version (and mapping path) is what must survive
      if (!active.exists { case (v, c, _) =>
          v == hv && (c == hc || c == "(folded)") })
        violations.add(s"active schema $active != newest success " +
          s"($hv, $hc)")
    }
    assert(violations.isEmpty,
      s"seed $seed violated invariants:\n  " +
        violations.toArray(Array.empty[String]).mkString("\n  "))
  }

  test("200 seeded multi-writer episodes hold every global invariant") {
    (1 to 200).foreach(runSeed)
  }
}
