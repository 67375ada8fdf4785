package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** WRITE-PATH EXPECTATIONS (Delta CHECK constraints / DLT
  * expectations, distilled): declarative row predicates enforced at
  * write time, each with a mode —
  *
  *   - `fail`: any violating row aborts the whole write (Delta's
  *     `CHECK` constraint; the certifying count runs BEFORE a byte
  *     lands, so a failed write leaves nothing partial),
  *   - `drop`: violating rows are quarantined out of the admitted
  *     set but counted (DLT `expect_or_drop`),
  *   - `warn`: violations counted, rows admitted anyway (DLT
  *     `expect`).
  *
  * NULL semantics follow SQL CHECK: a predicate evaluating to NULL
  * PASSES (only an explicit FALSE violates) — the reason
  * [[violates]] wraps the predicate in `coalesce(p, true)`.
  *
  * Scale shape: enforcement is one flag column per expectation inside
  * the write's own scan (codegen'd comparisons, no UDF); the report
  * is a single map-side aggregate to |expectations| rows. Nothing
  * here adds a shuffle to the write. */
object Expectations {

  final case class Expectation(name: String, predicate: Column,
                               mode: String) {
    require(Set("fail", "drop", "warn")(mode), s"unknown mode $mode")
  }

  final class ExpectationViolated(val name: String, val n: Long)
    extends RuntimeException(
      s"expectation '$name' (mode=fail) violated by $n rows — write aborted")

  /** TRUE where the row violates `e` (NULL predicate passes). */
  def violates(e: Expectation): Column =
    !coalesce(e.predicate, lit(true))

  /** One aggregate over `df` producing (per expectation) the
    * violation count and an order-free xor of `keyHash` over the
    * violating rows — the quarantine certificate. STRUCTURALLY one
    * scan: the single wide aggregate row is collected and the
    * |expectations|-row report built driver-side, so the one-scan
    * property never depends on exchange reuse collapsing
    * |expectations| identical aggregate subtrees. Counts are
    * coalesced to 0 so an EMPTY input (a streaming micro-batch with
    * no rows, or an all-dropped trigger) reports zeros instead of
    * NULLs that NPE downstream getLong/enforceFail readers. */
  def report(df: DataFrame, exps: Seq[Expectation],
             keyHash: Column): DataFrame = {
    val aggs = exps.flatMap { e =>
      Seq(coalesce(sum(violates(e).cast("long")), lit(0L))
          .as(s"n_${e.name}"),
        coalesce(bit_xor(when(violates(e), keyHash)), lit(0L))
          .as(s"x_${e.name}"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val spark = df.sparkSession
    import spark.implicits._
    exps.zipWithIndex.map { case (e, i) =>
      (e.name, e.mode, row.getLong(2 * i), row.getLong(2 * i + 1))
    }.toDF("constraint", "mode", "n", "key_xor")
  }

  /** Enforce `fail`-mode expectations from a COLLECTED report (the
    * |expectations|-row frame from [[report]]): throws on the first
    * violated one. Call BEFORE writing. */
  def enforceFail(collected: Seq[(String, String, Long)]): Unit =
    collected.collectFirst {
      case (name, "fail", n) if n > 0 => new ExpectationViolated(name, n)
    }.foreach(throw _)

  /** The admitted set: rows violating NO drop- or fail-mode
    * expectation (warn violations ride through). */
  def admitted(df: DataFrame, exps: Seq[Expectation]): DataFrame =
    exps.filter(e => e.mode == "drop" || e.mode == "fail")
      .map(e => !violates(e))
      .reduceOption(_ && _)
      .map(df.filter)
      .getOrElse(df)
}
