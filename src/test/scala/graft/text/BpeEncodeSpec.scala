package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q_bpe_encode — the oracle hash-verifies the regex-fold encode;
  * these tests pin tokenizer PROPERTIES against an independent
  * list-based JVM reference (no regexes — a different implementation
  * of the same merge semantics). */
class BpeEncodeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows =
    graft.SparkEntry.queries("q_bpe_encode")(spark, sf0001)
      .select("doc_id", "n_tok_bpe", "enc_head")
      .as[(Long, Long, String)].collect().toSeq

  private lazy val docs = graft.tables.Tables.documents(spark, sf0001)
    .select("doc_id", "text").as[(Long, String)].collect().toMap

  /** The same one-shot merge learning, recomputed independently. */
  private lazy val merges: Seq[(Char, Char)] = {
    val counts = scala.collection.mutable.Map.empty[String, Long]
    docs.values.foreach { t =>
      t.split(" ", -1).filter(_.length >= 2).foreach { w =>
        w.sliding(2).foreach { pg =>
          if (pg.forall(c => c.isDigit || (c >= 'a' && c <= 'z')))
            counts(pg) = counts.getOrElse(pg, 0L) + 1
        }
      }
    }
    counts.toSeq.sortBy { case (pg, n) => (-n, pg) }.take(8)
      .map { case (pg, _) => (pg(0), pg(1)) }
  }

  /** List-based merge application in rank order, leftmost-first. */
  private def encodeRef(word: String): Seq[String] = {
    var toks: Vector[String] = word.map(_.toString).toVector
    merges.foreach { case (a, b) =>
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < toks.length) {
        if (i + 1 < toks.length && toks(i) == a.toString && toks(i + 1) == b.toString) {
          out += s"$a$b"; i += 2
        } else { out += toks(i); i += 1 }
      }
      toks = out.result()
    }
    toks
  }

  test("enc_head matches the independent list-based reference on every doc") {
    // this equality is also the SCALE story: encodeRef is the O(text)
    // kernel a 32k-merge vocab would deploy (one token-vector fold per
    // word, merge table broadcast); the engine's chained-regex fold is
    // the oracle-parity path, O(merges × text) — acceptable only while
    // the merge count stays single-digit (BpeK = 8)
    assert(merges.length == 8)
    rows.foreach { case (id, _, enc) =>
      val head = docs(id).split(" ", -1).head
      assert(enc === encodeRef(head).mkString("|"), s"doc $id head '$head'")
    }
  }

  test("tokenization is lossless and compresses: chars >= tokens >= words") {
    rows.foreach { case (id, nTok, enc) =>
      val head = docs(id).split(" ", -1).head
      assert(enc.replace("|", "") === head, s"doc $id lossless")
      val words = docs(id).split(" ", -1)
      val nChars = words.map(w => math.max(w.length, 1)).sum
      assert(nTok <= nChars, s"doc $id merges must not grow token count")
      assert(nTok >= words.length, s"doc $id at least one token per word")
    }
    // merges must actually fire somewhere
    assert(rows.exists { case (id, nTok, _) =>
      nTok < docs(id).split(" ", -1).map(w => math.max(w.length, 1)).sum
    })
  }
}
