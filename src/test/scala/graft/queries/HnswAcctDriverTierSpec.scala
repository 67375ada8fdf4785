package graft.queries

import graft.SparkSpec

/** The hnsw maintenance-accounting driver tier (corpus + stored
  * segments collected under the bounds, affected-bucket algebra
  * replayed locally) must be row-identical to the distributed plan
  * for BOTH queries: same labels, same counts, same ic sums, same
  * edge xors. */
class HnswAcctDriverTierSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("upsert accounting driver tier equals the distributed plan") {
    val local = SimilarityQueries.hnswAcctLocal(spark, sf0001, delete = false)
    assert(local.nonEmpty, "tier must engage at sf0.001")
    val l = rows(local.get)
    graft.ops.SideCache.releaseAll()
    val d = rows(SimilarityQueries.annHnswUpsertDistributed(spark, sf0001))
    graft.ops.SideCache.releaseAll()
    assert(l == d)
    assert(l.nonEmpty)
  }

  test("delete accounting driver tier equals the distributed plan") {
    val local = SimilarityQueries.hnswAcctLocal(spark, sf0001, delete = true)
    assert(local.nonEmpty, "tier must engage at sf0.001")
    val l = rows(local.get)
    graft.ops.SideCache.releaseAll()
    val d = rows(SimilarityQueries.annHnswDeleteDistributed(spark, sf0001))
    graft.ops.SideCache.releaseAll()
    assert(l == d)
    assert(l.nonEmpty)
  }
}
