package graft.streaming

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CUSUM ([[EventStream.cusumStream]]) against the batch
  * `q_cusum` chart: the live monitor fed the same daily deviation
  * series (pre-centered with the batch-fitted μ and h) must emit
  * bit-identical (cum, S⁺, S⁻, alarm) rows across micro-batches —
  * the recurrence and the batch's two-running-window closed form are
  * the same function. A second key carrying the same series proves
  * per-key state isolation. */
class CusumStreamSpec extends SparkSpec {

  test("streaming CUSUM bit-equals the batch chart over micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // batch truth at sf0.001: (day, dev, s_pos, s_neg, h, alarm)
    val batch = SparkEntry.queries("q_cusum")(spark, sf0001)
      .select("day", "dev", "s_pos", "s_neg", "h", "alarm")
      .collect()
      .map(r => (r.getDate(0).toLocalDate.toEpochDay, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .sortBy(_._1)
    assert(batch.nonEmpty)
    assert(batch.map(_._6).sum > 0, "fixture must raise at least one alarm")
    val h = batch.head._5

    // the same deviation series on two keys (isolation check)
    val evs = batch.flatMap { case (t, dev, _, _, _, _) =>
      Seq(EventStream.CusumEv(0L, t, dev), EventStream.CusumEv(1L, t, dev))
    }.toSeq

    val in = MemoryStream[EventStream.CusumEv]
    val q = EventStream.cusumStream(in.toDS(), h)
      .writeStream.format("memory").queryName("cusum_live")
      .outputMode("append").start()
    try {
      // three in-order chunks, order shuffled within each chunk
      val rnd = new scala.util.Random(7)
      val third = evs.size / 3
      val chunks = Seq(evs.take(third), evs.slice(third, 2 * third),
        evs.drop(2 * third))
      chunks.foreach { c =>
        in.addData(rnd.shuffle(c): _*)
        q.processAllAvailable()
      }
      val streamed = s.table("cusum_live")
        .select("key", "t", "s_pos", "s_neg", "alarm")
        .as[(Long, Long, Long, Long, Long)].collect()
      val expected = batch.map(b => (b._1, b._3, b._4, b._6))
      for (key <- Seq(0L, 1L)) {
        val got = streamed.filter(_._1 == key).sortBy(_._2)
          .map(r => (r._2, r._3, r._4, r._5))
        assert(got.toSeq === expected.toSeq,
          s"streamed CUSUM diverged from the batch chart for key $key")
      }
    } finally q.stop()
  }
}
