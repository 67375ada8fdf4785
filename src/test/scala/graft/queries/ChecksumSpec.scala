package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_table_checksum — the oracle hash-verifies the values; these
  * tests pin the properties that make it a CHECKSUM: partitioning/
  * order invariance and sensitivity to any row change. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def xorOf(df: org.apache.spark.sql.DataFrame): (Long, Long) =
    df.select(graft.functions.F.polyHash(
        concat_ws("|", col("doc_id"), col("lang"), col("text"))).as("h"))
      .agg(count(lit(1)), expr("bit_xor(h)"))
      .as[(Long, Long)].head()

  test("checksum is invariant under repartitioning and row order") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val a = xorOf(docs.repartition(3))
    val b = xorOf(docs.repartition(17, col("lang")))
    val c = xorOf(docs.orderBy(col("doc_id").desc))
    assert(a === b && b === c)
  }

  test("checksum detects a flipped byte, a dropped row, and a duplicated row") {
    val docs = graft.tables.Tables.documents(spark, sf0001)
    val clean = xorOf(docs)
    val flipped = xorOf(docs.withColumn("text",
      when(col("doc_id") === 7, concat(col("text"), lit("x")))
        .otherwise(col("text"))))
    val dropped = xorOf(docs.filter(col("doc_id") =!= 7))
    val dup = xorOf(docs.union(docs.filter(col("doc_id") === 7)))
    assert(flipped._2 !== clean._2)
    assert(dropped._1 === clean._1 - 1)
    assert(dup._1 === clean._1 + 1)
    // one extra copy pairs with the original and XORs the row's hash
    // OUT of the total: dup == dropped on the xor axis — the count
    // separates them, and EVEN-multiplicity changes (two extra
    // copies) are xor-invisible entirely, which is why the checksum
    // is the (count, xor, sum) TRIPLE, not the xor alone
    assert((dup._2 === dropped._2) && (dup._2 !== clean._2))
    assert(dropped._2 !== clean._2)
  }

  test("q_table_checksum output is well-formed: three tables, positive counts") {
    val rows = graft.SparkEntry.queries("q_table_checksum")(spark, sf0001)
      .select("tbl", "n_rows", "content_sum")
      .as[(String, Long, Long)].collect().toSeq
    assert(rows.map(_._1) === Seq("1_documents", "2_orders", "3_customer"))
    assert(rows.forall(_._2 > 0))
  }
}
