package graft.ops

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.storage.StorageLevel

/** The caller-managed side-table lifecycle ([[SideCache]]): query
  * closures persist reuse-boundary tables; after the consumer
  * materializes, `releaseAll` must leave none of THEM persisted —
  * the contract `Verify`/`Bench` rely on between queries, and the
  * guard against block leaks in long-lived sessions.
  *
  * Assertions scope to SideCache's own registry (not the session-wide
  * `getPersistentRDDs`): suites share one SparkSession and run
  * concurrently, so global-emptiness checks race against whatever a
  * neighboring suite has cached. */
class SideCacheSpec extends SparkSpec {

  test("q_dedup_minhash registers side tables; releaseAll unpersists them all") {
    SideCache.releaseAll()
    // materialize a query whose plan pins shingle + band side tables
    SparkEntry.queries("q_dedup_minhash")(spark, sf0001).count()
    val registered = SideCache.liveSnapshot
    assert(registered.nonEmpty,
      "expected the minhash side tables to be registered during the run")
    assert(registered.forall(_.storageLevel == StorageLevel.MEMORY_AND_DISK))
    SideCache.releaseAll()
    assert(SideCache.liveSnapshot.isEmpty, "registry must drain")
    assert(registered.forall(_.storageLevel == StorageLevel.NONE),
      "every registered side table must be unpersisted")
  }

  test("releaseAll is idempotent and safe with live downstream plans") {
    val df = SparkEntry.queries("q_dedup_simhash")(spark, sf0001)
    assert(df.count() >= 0)
    SideCache.releaseAll()
    SideCache.releaseAll() // second call: registry already empty
    // the plan still works after its side tables were dropped — it
    // just recomputes them
    assert(df.limit(1).count() >= 0)
    SideCache.releaseAll()
    assert(SideCache.liveSnapshot.isEmpty)
  }
}
