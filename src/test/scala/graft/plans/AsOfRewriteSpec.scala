package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [[AsOfAutoRewrite]]: the union-window as-of idiom is recognized by
  * the optimizer and executed as the native sorted-merge
  * [[AsOfJoinExec]]; the kill switch restores the window plan; guard
  * violations leave the plan alone. Differential: both plans produce
  * identical rows.
  */
class AsOfRewriteSpec extends SparkSpec {
  import spark.implicits._

  AsOf.ensureStrategy(spark)

  /** The synthetic cases below build on local Seqs; without this,
    * ConvertToLocalRelation folds the tagging Projects into
    * LocalRelation rows before the rewrite rule can see the idiom
    * (parquet-backed plans — the real workload — keep them). */
  private def withLocalProjects[T](body: => T): T = {
    spark.conf.set("spark.sql.optimizer.excludedRules",
      "org.apache.spark.sql.catalyst.optimizer.ConvertToLocalRelation")
    try body
    finally spark.conf.unset("spark.sql.optimizer.excludedRules")
  }

  /** The canonical idiom (q_join_asof's shape) on synthetic rows:
    * left (k, t, payload), right (k, t, v) — carry v onto left rows. */
  private def unionWindowAsof(sideOfLeft: Int = 0): DataFrame = {
    val left = Seq((1L, 10L, 100L), (1L, 20L, 200L), (1L, 15L, 150L),
        (2L, 5L, 500L), (3L, 7L, 700L))
      .toDF("k", "t", "payload")
      .select(col("k"), col("t"), col("payload"),
        lit(sideOfLeft).as("side"), lit(null).cast("long").as("r_v"))
    val right = Seq((1L, 10L, 1L), (1L, 18L, 2L), (2L, 6L, 3L), (4L, 1L, 4L))
      .toDF("k", "t", "v")
      .select(col("k"), col("t"),
        lit(null).cast("long").as("payload"),
        lit(1 - sideOfLeft).as("side"), col("v").as("r_v"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    left.unionByName(right)
      .withColumn("asof_v", last(col("r_v"), ignoreNulls = true).over(w))
      .filter(col("side") === sideOfLeft)
      .select(col("k"), col("t"), col("payload"),
        coalesce(col("asof_v"), lit(-1L)).as("asof_v"))
  }

  private val expected = Seq(
    (1L, 10L, 100L, 1L),   // right (1,10) inclusive at the tie
    (1L, 15L, 150L, 1L),
    (1L, 20L, 200L, 2L),   // latest right <= 20 is (1,18)
    (2L, 5L, 500L, -1L),   // right (2,6) is in the future
    (3L, 7L, 700L, -1L))   // no right rows for k=3

  test("idiom is rewritten to the native as-of exec and stays correct") {
    withLocalProjects {
    val df = unionWindowAsof()
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
    assert(!phys.contains("Window"), phys)
    assert(df.as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq === expected)
    }
  }

  test("kill switch restores the union-window plan, same rows") {
    spark.conf.set(AsOfAutoRewrite.ConfKey, "false")
    try {
      val df = unionWindowAsof()
      val phys = df.queryExecution.executedPlan.toString
      assert(!phys.contains("AsOfJoin"), phys)
      assert(phys.contains("Window"), phys)
      assert(df.as[(Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
        .toSeq === expected)
    } finally spark.conf.unset(AsOfAutoRewrite.ConfKey)
  }

  test("guard: wrong tie polarity (strict as-of) is NOT rewritten") {
    withLocalProjects {
    // side asc with left tag 0 sorts LEFT before right on a time tie:
    // strict `rightTime < leftTime` semantics the native exec does not
    // implement — the rule must leave the window plan alone.
    val left = Seq((1L, 10L)).toDF("k", "t")
      .select(col("k"), col("t"), lit(0).as("side"),
        lit(null).cast("long").as("r_v"))
    val right = Seq((1L, 10L, 7L)).toDF("k", "t", "v")
      .select(col("k"), col("t"), lit(1).as("side"), col("v").as("r_v"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = left.unionByName(right)
      .withColumn("asof_v", last(col("r_v"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("k"), coalesce(col("asof_v"), lit(-1L)).as("asof_v"))
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("AsOfJoin"), phys)
    assert(df.as[(Long, Long)].head() === ((1L, -1L))) // strict: tie not visible
    }
  }

  test("guard: left-side real values in the carried column block the rewrite") {
    withLocalProjects {
    // if the kept side's carried column is not null-padded, the window
    // also carries LEFT values forward — not expressible as a join
    val left = Seq((1L, 10L, 99L), (1L, 20L, 98L)).toDF("k", "t", "r_v")
      .select(col("k"), col("t"), lit(0).as("side"), col("r_v"))
    val right = Seq((1L, 15L, 7L)).toDF("k", "t", "v")
      .select(col("k"), col("t"), lit(1).as("side"), col("v").as("r_v"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = left.unionByName(right)
      .withColumn("asof_v", last(col("r_v"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("k"), col("t"), col("asof_v"))
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("AsOfJoin"), phys)
    // the t=20 left row's OWN value (98) shadows the right row's 7 —
    // exactly the semantics a join cannot express, hence the guard
    val rows = df.as[(Long, Long, Long)].collect().sortBy(_._2).toSeq
    assert(rows === Seq((1L, 10L, 99L), (1L, 20L, 98L)))
    }
  }

  test("guard: a NULLABLE carried right column blocks the rewrite") {
    withLocalProjects {
    // when(v > 0, v) is nullable: last(..ignoreNulls) would SKIP a
    // runtime NULL (carrying an older right row's value) while the
    // join snapshots the latest right row — so the rule must not fire.
    // Data makes the divergence concrete: right (1,15)->7, (1,18)->NULL;
    // the window carries 7 onto left t=20, a join would give NULL.
    val left = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "t", "payload")
      .select(col("k"), col("t"), col("payload"),
        lit(0).as("side"), lit(null).cast("long").as("r_v"))
    val right = Seq((1L, 15L, 7L), (1L, 18L, -5L)).toDF("k", "t", "v")
      .select(col("k"), col("t"), lit(null).cast("long").as("payload"),
        lit(1).as("side"), when(col("v") > 0, col("v")).as("r_v"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = left.unionByName(right)
      .withColumn("asof_v", last(col("r_v"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
      .select(col("k"), col("t"), coalesce(col("asof_v"), lit(-1L)).as("asof_v"))
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("AsOfJoin"), phys)
    // window semantics preserved: t=20 sees 7 (the NULL at t=18 is skipped)
    assert(df.as[(Long, Long, Long)].collect().sortBy(_._2).toSeq ===
      Seq((1L, 10L, -1L), (1L, 20L, 7L)))
    }
  }

  test("nullable key/time with runtime NULLs: rewrite fires and matches the window plan") {
    withLocalProjects {
    // Option-typed key/time columns (nullable, with actual NULLs).
    // The exec's null-aware merge must reproduce the window semantics:
    // null keys form ONE partition group, null times order FIRST.
    def build(): DataFrame = {
      val left = Seq(
          (Option(1L), Option(10L), 100L), (Option(1L), Option(20L), 200L),
          (None: Option[Long], Option(5L), 500L), (Option(1L), None: Option[Long], 150L),
          (None: Option[Long], None: Option[Long], 900L))
        .toDF("k", "t", "payload")
        .select(col("k"), col("t"), col("payload"),
          lit(0).as("side"), lit(null).cast("long").as("r_v"))
      val right = Seq(
          (Option(1L), Option(8L), 7L), (None: Option[Long], Option(3L), 9L),
          (Option(1L), None: Option[Long], 5L), (None: Option[Long], None: Option[Long], 11L))
        .toDF("k", "t", "v")
        .select(col("k"), col("t"), lit(null).cast("long").as("payload"),
          lit(1).as("side"), col("v").as("r_v"))
      val w = Window.partitionBy("k")
        .orderBy(col("t").asc, col("side").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      left.unionByName(right)
        .withColumn("asof_v", last(col("r_v"), ignoreNulls = true).over(w))
        .filter(col("side") === 0)
        .select(col("k"), col("t"), col("payload"),
          coalesce(col("asof_v"), lit(-1L)).as("asof_v"))
    }
    val native = build()
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      native.queryExecution.executedPlan.toString)
    val nativeRows = native.collect().map(_.toString).sorted.toSeq
    spark.conf.set(AsOfAutoRewrite.ConfKey, "false")
    try {
      val windowed = build()
      assert(!windowed.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(nativeRows === windowed.collect().map(_.toString).sorted.toSeq)
    } finally spark.conf.unset(AsOfAutoRewrite.ConfKey)
    }
  }

  test("a preceding equality conjunct does not shadow the side tag") {
    withLocalProjects {
    // `payload = 100 AND side = 0`: a collectFirst would pick the
    // payload conjunct (no literal tags on the children), and silently
    // skip the rewrite; the rule must scan all conjuncts and still
    // find the side predicate. (payload is NOT the partition key, so
    // the conjunct cannot be pushed below the Window out of the way.)
    val left = Seq((1L, 10L, 100L), (1L, 20L, 200L)).toDF("k", "t", "payload")
      .select(col("k"), col("t"), col("payload"),
        lit(0).as("side"), lit(null).cast("long").as("r_v"))
    val right = Seq((1L, 10L, 1L), (1L, 18L, 2L)).toDF("k", "t", "v")
      .select(col("k"), col("t"), lit(null).cast("long").as("payload"),
        lit(1).as("side"), col("v").as("r_v"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val df = left.unionByName(right)
      .withColumn("asof_v", last(col("r_v"), ignoreNulls = true).over(w))
      .filter(col("payload") === 100L && col("side") === 0)
      .select(col("k"), col("t"), col("payload"),
        coalesce(col("asof_v"), lit(-1L)).as("asof_v"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"), phys)
    assert(df.as[(Long, Long, Long, Long)].collect().toSeq ===
      Seq((1L, 10L, 100L, 1L)))
    }
  }

  test("guard: duplicate column names in a rebuilt child block the rewrite") {
    withLocalProjects {
    // two payload columns both NAMED `p` on the kept side (positional
    // union keeps them; attribute refs stay unambiguous by exprId).
    // The exec and the pruning rule resolve columns by FIRST name
    // match, so the rule must refuse rather than bind an arbitrary
    // ordinal in a duplicate-name child.
    val left = Seq((1L, 10L, 99L, 98L)).toDF("k", "t", "p1", "p2")
      .select(col("k"), col("t"), col("p1").as("p"), col("p2").as("p"),
        lit(0).as("side"), lit(null).cast("long").as("r_v"))
    val right = Seq((1L, 8L, 7L)).toDF("k", "t", "v")
      .select(col("k"), col("t"), lit(null).cast("long").as("p"),
        lit(null).cast("long").as("p"),
        lit(1).as("side"), col("v").as("r_v"))
    val w = Window.partitionBy("k")
      .orderBy(col("t").asc, col("side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // no final projection: ColumnPruning would otherwise drop the
    // unused duplicate-named columns and defuse the scenario
    val df = left.union(right)
      .withColumn("asof_v", last(col("r_v"), ignoreNulls = true).over(w))
      .filter(col("side") === 0)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("AsOfJoin"), phys)
    val row = df.collect().head
    assert(row.getLong(0) === 1L && row.getLong(6) === 7L)
    }
  }

  test("q_join_asof plans to the native exec and flips back with the switch") {
    val native = graft.SparkEntry.queries("q_join_asof")(spark, sf0001)
    assert(native.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "q_join_asof should auto-rewrite to AsOfJoinExec")
    val nRows = native.collect()
    spark.conf.set(AsOfAutoRewrite.ConfKey, "false")
    try {
      val windowed = graft.SparkEntry.queries("q_join_asof")(spark, sf0001)
      assert(!windowed.queryExecution.executedPlan.toString.contains("AsOfJoin"))
      assert(windowed.collect().toSeq === nRows.toSeq)
    } finally spark.conf.unset(AsOfAutoRewrite.ConfKey)
  }
}
