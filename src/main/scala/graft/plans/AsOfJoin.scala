package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}

/** Native sorted-merge AS-OF join — the full custom-operator ladder
  * (SURVEY §4 / builder contract step (c)): a logical node, a planner
  * [[Strategy]], and a physical [[AsOfJoinExec]] with declared
  * distribution + ordering requirements, registered either via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]) or at runtime
  * ([[AsOf.ensureStrategy]]).
  *
  * Semantics: left-outer as-of — each left row picks up the LATEST
  * right row of the same key with `rightTime <= leftTime` (right
  * columns null when none). The reference's workload has no as-of
  * join; this generalizes its "latest value at date" window logic
  * (il_analysis_git.py:134-136) into a first-class operator.
  *
  * Scale anatomy: EnsureRequirements co-partitions both sides by the
  * key (one shuffle each — same cost envelope as a sort-merge join)
  * and sorts by (key, time); the merge itself is a single forward
  * pass per partition holding ONE buffered right row — O(1) memory,
  * no window machinery carrying left payloads, no union row blow-up
  * (the alternative union+last-ignoreNulls plan sorts left+right rows
  * together and widens every row to the union schema). Skew follows
  * the key distribution exactly as in any shuffled join.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: String, rightKey: String,
                        leftTime: String, rightTime: String)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  /** The node consumes every child column (its output passes them all
    * through), so ColumnPruning must not strip the string-named
    * key/time columns out of the children. Callers prune by
    * projecting BEFORE the join. */
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(children.flatMap(_.output))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plan-shaping optimizer rule: column pruning through
  * [[AsOfJoinPlan]].
  *
  * The node declares `references` = all child output (it passes every
  * child column through), which correctly stops Catalyst's own
  * ColumnPruning from touching it — but then a narrow `Project` above
  * the join still drags BOTH full child schemas through shuffle, sort
  * and merge, and the parquet scans read every column. This rule does
  * what ColumnPruning cannot know how to: when a Project on top uses
  * a subset of the join's output, push per-side Projects into the
  * children keeping only the referenced columns plus each side's
  * key/time columns (which the physical operator resolves by name).
  * Pruning then cascades — Catalyst pushes the new child Projects
  * further down into the scans, shrinking `ReadSchema` and every
  * exchange in between. Fires at most once per join (the rewritten
  * children are already minimal), so the optimizer batch converges.
  */
object AsOfColumnPruning extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projList, aj: AsOfJoinPlan) =>
      val needed = AttributeSet(projList.flatMap(_.references))
      def prune(side: LogicalPlan, key: String, time: String): Seq[Attribute] =
        side.output.filter(a =>
          needed.contains(a) || a.name == key || a.name == time)
      val lKeep = prune(aj.left, aj.leftKey, aj.leftTime)
      val rKeep = prune(aj.right, aj.rightKey, aj.rightTime)
      if (lKeep.length < aj.left.output.length ||
          rKeep.length < aj.right.output.length) {
        p.copy(child = aj.copy(
          left = Project(lKeep, aj.left),
          right = Project(rKeep, aj.right)))
      } else p
  }
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]; everything else falls
  * through to the stock strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: String, rightKey: String,
                        leftTime: String, rightTime: String)
    extends BinaryExecNode {

  private def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in [${side.output.map(_.name).mkString(",")}]"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Co-partition both sides by the join key (EnsureRequirements
    * inserts compatible hash exchanges, exactly as for SMJ). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(attr(left, leftKey))) ::
      ClusteredDistribution(Seq(attr(right, rightKey))) :: Nil

  /** Partition-local sort by (key, time) on both sides. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attr(left, leftKey), Ascending), SortOrder(attr(left, leftTime), Ascending)),
    Seq(SortOrder(attr(right, rightKey), Ascending), SortOrder(attr(right, rightTime), Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  /** Long view of a (key|time) column: integral + date/timestamp
    * physical types (int days / long micros). */
  private def longGetter(a: Attribute, ordinal: Int): InternalRow => Long =
    a.dataType match {
      case LongType | TimestampType => row => row.getLong(ordinal)
      case IntegerType | DateType => row => row.getInt(ordinal).toLong
      case t => throw new IllegalArgumentException(
        s"as-of join key/time must be integral/date/timestamp, got $t for ${a.name}")
    }

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKey = longGetter(attr(left, leftKey), lOut.indexWhere(_.name == leftKey))
    val lTime = longGetter(attr(left, leftTime), lOut.indexWhere(_.name == leftTime))
    val rKey = longGetter(attr(right, rightKey), rOut.indexWhere(_.name == rightKey))
    val rTime = longGetter(attr(right, rightTime), rOut.indexWhere(_.name == rightTime))
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // right side re-declared nullable, or the bound references would
      // skip null checks and read 0s out of the all-null row
      val project = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      // one-row right-side state: the latest right row at or before the
      // current merge frontier (copied out of the reused UnsafeRow)
      var candidate: InternalRow = null
      var candidateKey = 0L
      var lookahead: InternalRow = if (rIt.hasNext) rIt.next().copy() else null
      lIt.map { lrow =>
        val lk = lKey(lrow)
        val lt = lTime(lrow)
        // advance the right side up to (key, time) <= (lk, lt)
        while (lookahead != null && {
          val nk = rKey(lookahead)
          nk < lk || (nk == lk && rTime(lookahead) <= lt)
        }) {
          if (rKey(lookahead) == lk) {
            candidate = lookahead
            candidateKey = lk
          }
          lookahead = if (rIt.hasNext) rIt.next().copy() else null
        }
        val r = if (candidate != null && candidateKey == lk) candidate else nullRight
        project(joined(lrow, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing API. */
object AsOf {

  /** Idempotently add the planner strategy + optimizer rule to an
    * existing session (the deploy path is `spark.sql.extensions` →
    * GraftExtensions). */
  def ensureStrategy(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfColumnPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfColumnPruning
  }

  /** Left-outer as-of join: latest `right` row per key with
    * `right.timeCol <= left.timeCol`. Column names must be unambiguous
    * across the two sides (rename the right side's before the call). */
  def join(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    ColumnBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKey, rightKey, leftTime, rightTime))
  }
}
