package graft.streaming

import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming decay score ([[EventStream.decayScoreStream]]) against
  * the batch `q_decay_score` recurrence. */
class BehaviorStreamSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp((1440 + minute) * 60000L)

  test("streaming decay score equals the batch recurrence under in-order batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext

    // two users, 10 events each, values chosen so every tap matters
    val evs = (0 until 10).flatMap { i =>
      Seq(EventStream.ScoreEv(1L, ts(i), 100L + i, (i + 1) * 1000L),
        EventStream.ScoreEv(2L, ts(i), 200L + i, 1L << i))
    }

    val in = MemoryStream[EventStream.ScoreEv]
    val q = EventStream.decayScoreStream(in.toDS())
      .writeStream.format("memory").queryName("decay")
      .outputMode("append").start()
    try {
      // feed in three in-order chunks; within each chunk order is shuffled
      val rnd = new scala.util.Random(42)
      val chunks = Seq(evs.take(8), evs.slice(8, 14), evs.drop(14))
      chunks.foreach { c =>
        in.addData(rnd.shuffle(c): _*)
        q.processAllAvailable()
      }
      val streamed = s.table("decay")
        .select("user_id", "event_id", "v", "decay_sum")
        .as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))

      // batch twin: the unrolled 8-tap recurrence per user
      val expected = evs.groupBy(_.user_id).toSeq.flatMap { case (uid, rows) =>
        val ordered = rows.sortBy(e => (e.ts.getTime, e.event_id))
        ordered.zipWithIndex.map { case (e, i) =>
          val window = ordered.slice(math.max(0, i - 7), i + 1).map(_.v)
          val dsum = window.reverse.zipWithIndex.map { case (v, k) => v >> k }.sum
          (uid, e.event_id, e.v, dsum)
        }
      }.sortBy(r => (r._1, r._2))

      assert(streamed.toSeq === expected)
    } finally q.stop()
  }
}
