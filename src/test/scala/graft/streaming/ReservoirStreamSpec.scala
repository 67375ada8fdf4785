package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming per-language priority reservoir
  * ([[EventStream.reservoirStream]]) against the batch
  * `q_group_weighted_sample` — final state must be bit-equal, and
  * arrival order / batch boundaries / replays must not matter. */
class ReservoirStreamSpec extends SparkSpec {

  // the real corpus rows with the REAL priority key (same expression
  // as the batch query), collected once
  private lazy val rows: Seq[EventStream.DocIn] = {
    val s = spark
    import s.implicits._
    val u = (graft.functions.F.polyHash(col("text")) + lit(1L))
      .cast("double") / lit(2147483648.0)
    val w = greatest(col("n_chars"), lit(1L)).cast("double")
    graft.tables.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        floor(u / w * lit(1e15)).cast("long").as("prio_q"))
      .as[(Long, String, Long, Long)].collect().toSeq
      .map { case (id, lang, nc, p) => EventStream.DocIn(id, lang, nc, p) }
  }

  private def runStream(feed: Seq[Seq[EventStream.DocIn]]): Seq[(String, Long, Long, Long, Int)] = {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[EventStream.DocIn]
    val name = s"res${System.nanoTime()}"
    val q = EventStream.reservoirStream(in.toDS(), k = 20)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      feed.foreach { c => in.addData(c: _*); q.processAllAvailable() }
      // Update sink: latest row per (lang, rk) is the live reservoir
      val all = s.table(name)
        .select("lang", "doc_id", "n_chars", "prio_q", "rk")
        .as[(String, Long, Long, Long, Int)].collect()
      // the memory sink appends updates; reconstruct the final state
      // by keeping the LAST emission per (lang, rk)
      all.zipWithIndex.groupBy { case (r, _) => (r._1, r._5) }
        .map { case (_, g) => g.maxBy(_._2)._1 }.toSeq
        .sortBy(r => (r._1, r._5))
    } finally q.stop()
  }

  test("final streamed reservoir is bit-equal to batch q_group_weighted_sample") {
    val s = spark
    import s.implicits._
    val batch = SparkEntry.queries("q_group_weighted_sample")(spark, sf0001)
      .select(col("lang"), col("doc_id"), col("n_chars"), col("prio_q"),
        col("rk").cast("int"))
      .as[(String, Long, Long, Long, Int)].collect().toSeq
      .sortBy(r => (r._1, r._5))

    val rnd = new scala.util.Random(7)
    val shuffled = rnd.shuffle(rows)
    val n = shuffled.size
    val streamed = runStream(Seq(
      shuffled.take(n / 3), shuffled.slice(n / 3, 2 * n / 3), shuffled.drop(2 * n / 3)))
    assert(streamed === batch)
  }

  test("arrival order and at-least-once replay cannot change the reservoir") {
    val rnd = new scala.util.Random(99)
    val a = runStream(Seq(rnd.shuffle(rows)))
    // reversed order, different batching, and one batch replayed
    val rev = rows.reverse
    val b = runStream(Seq(rev.take(100), rev.take(100), rev.drop(100)))
    assert(a === b)
  }
}
