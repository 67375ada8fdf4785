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

/** Plan-shaping optimizer rule #2: AUTO-REWRITE of the union-window
  * as-of idiom into the native [[AsOfJoinPlan]].
  *
  * The declarative as-of pattern (SURVEY §2.6; q_join_asof) is:
  * tag both sides with a `side` literal, union, run
  * `last(value, ignoreNulls) over (partition by key order by time,
  * side rows unbounded preceding..current row)`, keep `side = leftTag`
  * rows. That plan widens EVERY row to the union schema and drags the
  * full window machinery (buffered frames, two-pass sort) over
  * left+right rows together. The native sorted-merge exec computes the
  * same relation with a single forward pass and one buffered right row
  * per partition — same shuffle envelope, no row widening.
  *
  * This rule recognizes the optimized idiom
  * {{{
  *   Filter(side = keptTag,
  *     Window([last(v_i, true) over (pb key ob time, side)]*,
  *       Union(Project_kept, Project_other)))
  * }}}
  * and rewrites it to
  * {{{
  *   Filter(cond,                      -- original condition, verbatim
  *     Project(outList,                -- reproduces EVERY original
  *       AsOfJoinPlan(left, right)))   --   attribute id
  * }}}
  * so parent operators resolve untouched. Guards (all must hold, else
  * the plan is left alone): exactly two union children, both Projects;
  * the kept side is the FIRST child (its aliases own the union's
  * attribute ids); one partition key; order is (time asc, side) with
  * the tag polarity that sorts right-side rows BEFORE left rows on
  * time ties (inclusive as-of, matching [[AsOfJoinExec]]); every
  * window expression is `last(x, ignoreNulls = true)` over that same
  * spec with a ROWS unbounded-preceding..current frame; each `x` is
  * null-padded on the kept side (a real left value would feed the
  * carry-forward, which the join cannot express); key/time columns are
  * integral/date/timestamp on both sides (the exec's merge types).
  *
  * Kill switch: `spark.graft.asof.autoRewrite=false` (the window path
  * stays exercisable for differential tests — AsOfRewriteSpec).
  */
object AsOfAutoRewrite
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, CurrentRow, EqualTo, Expression, Literal, NamedExpression, RowFrame, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Last}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Project, Union, Window}
  import org.apache.spark.sql.types.DataType

  val ConfKey = "spark.graft.asof.autoRewrite"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(ConfKey, "true").toBoolean) plan
    else plan.transformDown {
      case f @ Filter(_, _: Window) => rewrite(f).getOrElse(f)
    }

  private def asofTemporal(t: DataType): Boolean = t match {
    case LongType | IntegerType | DateType | TimestampType => true
    case _ => false
  }

  private def intTagOf(e: Expression): Option[Long] = e match {
    case Alias(Literal(v: Int, _), _) => Some(v.toLong)
    case Alias(Literal(v: Long, _), _) => Some(v)
    case _ => None
  }

  private def isNullLit(e: Expression): Boolean = e match {
    case Alias(Literal(null, _), _) => true
    case Literal(null, _) => true
    case _ => false
  }

  /** A union child whose column list the rule can inspect and rebuild
    * with a subset: a Project, or an Aggregate (CollapseProject merges
    * the tagging Project into an aggregate's result expressions — the
    * q_join_asof right side). */
  private def sideLists(p: LogicalPlan)
      : Option[(Seq[NamedExpression], Seq[NamedExpression] => LogicalPlan)] =
    p match {
      case pr: Project => Some((pr.projectList, l => Project(l, pr.child)))
      case ag: Aggregate =>
        Some((ag.aggregateExpressions, l => ag.copy(aggregateExpressions = l)))
      case _ => None
    }

  private def rewrite(f: Filter): Option[LogicalPlan] = {
    val w = f.child.asInstanceOf[Window]
    val u = w.child match { case u: Union if u.children.length == 2 => u
                            case _ => return None }
    val (keptList, keptRebuild) = sideLists(u.children.head).getOrElse(return None)
    val (otherList, otherRebuild) = sideLists(u.children.last).getOrElse(return None)
    val unionOut = u.output
    if (keptList.length != unionOut.length ||
        otherList.length != unionOut.length) return None
    def pos(e: Expression): Int = e match {
      case a: AttributeReference => unionOut.indexWhere(_.exprId == a.exprId)
      case _ => -1
    }
    // ---- the side tag: Filter must pin `side = <kept child's tag>` ----
    // Scan ALL integer-equality conjuncts and pick the one whose column
    // is an integer LITERAL tag on both union children (distinct values,
    // pinned to the kept child's tag). A preceding unrelated equality
    // (`k = 5 AND side = 0`) must not shadow the side predicate.
    val conjuncts = splitConjunctivePredicates(f.condition)
    val eqTags: Seq[(Int, Long)] = conjuncts.flatMap {
      case EqualTo(a: AttributeReference, Literal(v: Int, _)) => Some((pos(a), v.toLong))
      case EqualTo(Literal(v: Int, _), a: AttributeReference) => Some((pos(a), v.toLong))
      case EqualTo(a: AttributeReference, Literal(v: Long, _)) => Some((pos(a), v))
      case EqualTo(Literal(v: Long, _), a: AttributeReference) => Some((pos(a), v))
      case _ => None
    }.filter(_._1 >= 0)
    val sideEq = eqTags.find { case (p, v) =>
      (intTagOf(keptList(p)), intTagOf(otherList(p))) match {
        case (Some(kt), Some(ot)) => kt == v && ot != kt
        case _ => false
      }
    }
    val (ps, _) = sideEq.getOrElse(return None)
    val keptTag = intTagOf(keptList(ps)).get
    val otherTag = intTagOf(otherList(ps)).get
    // ---- window spec: one key, (time asc, side <dir>) ----
    if (w.partitionSpec.length != 1 || w.orderSpec.length != 2) return None
    val pk = pos(w.partitionSpec.head)
    val timeOrd = w.orderSpec.head
    val sideOrd = w.orderSpec.last
    val pt = pos(timeOrd.child)
    if (pk < 0 || pt < 0 || pos(sideOrd.child) != ps) return None
    if (timeOrd.direction != Ascending) return None
    // the exec's merge orders null times FIRST (matching the default
    // Ascending/NullsFirst the node's requiredChildOrdering produces);
    // an explicit asc_nulls_last window would diverge — skip it
    if (timeOrd.nullOrdering != org.apache.spark.sql.catalyst.expressions.NullsFirst)
      return None
    // right rows must sort BEFORE left rows on a time tie — that is
    // what makes the carried value inclusive (right at t visible to
    // left at t), matching the exec's `rightTime <= leftTime`.
    val rightFirst = sideOrd.direction match {
      case Ascending => otherTag < keptTag
      case _ => otherTag > keptTag
    }
    if (!rightFirst) return None
    // ---- every window expression: last(x, ignoreNulls) over same spec ----
    val valPairs: Seq[(Alias, Int)] = w.windowExpressions.map {
      case al @ Alias(WindowExpression(
            AggregateExpression(Last(x: AttributeReference, true), _, _, _, _),
            WindowSpecDefinition(psSpec, osSpec,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)
          if psSpec == w.partitionSpec && osSpec == w.orderSpec && pos(x) >= 0 =>
        (al, pos(x))
      case _ => return None
    }
    // carried columns must be null-padded on the kept side, real on the
    // other side (otherwise the window also carries left values and the
    // rewrite would change results)
    if (!valPairs.forall { case (_, p) =>
      isNullLit(keptList(p)) && !isNullLit(otherList(p)) })
      return None
    // ...and provably NON-NULL on the other side: `last(v, ignoreNulls)`
    // skips runtime NULLs per column (several carried columns may then
    // come from DIFFERENT right rows), while the join snapshots all
    // columns of the single latest right row. The plans only coincide
    // when every carried right expression is non-nullable (aggregate
    // outputs like count, or an explicit coalesce with a literal).
    if (!valPairs.forall { case (_, p) => !otherList(p).toAttribute.nullable })
      return None
    // ---- key/time columns: real + mergeable types on both sides ----
    // (they MAY be nullable: the exec's merge is null-aware — null keys
    // group together and null times order first, exactly matching the
    // window's partitionBy grouping and Ascending/NullsFirst sort)
    for (p <- Seq(pk, pt); list <- Seq(keptList, otherList)) {
      val e = list(p)
      if (isNullLit(e) || intTagOf(e).isDefined) return None
      if (!asofTemporal(e.dataType)) return None
    }
    // ---- build the join ----
    // pure-literal entries (side tag, null padding) are not child
    // columns: they are reproduced verbatim in the top projection
    def isPureLit(e: Expression): Boolean = e match {
      case Alias(_: Literal, _) => true
      case _: Literal => true
      case _ => false
    }
    val valPos = valPairs.map(_._2).distinct
    val leftKeep = keptList.filterNot(isPureLit)
    if (!Seq(pk, pt).forall(i => leftKeep.exists(_.exprId == keptList(i).exprId)))
      return None
    val rightKeepPos = (Seq(pk, pt) ++ valPos).distinct
    val rightKeep = rightKeepPos.map(otherList(_))
    val newLeft = keptRebuild(leftKeep)
    val newRight = otherRebuild(rightKeep)
    // AsOfJoinExec and AsOfColumnPruning resolve key/time by FIRST name
    // match; duplicate names within a child's output (legal in Spark
    // plans) would silently bind the wrong ordinal — skip the rewrite
    def uniqueNames(p: LogicalPlan): Boolean = {
      val names = p.output.map(_.name)
      names.distinct.length == names.length
    }
    if (!uniqueNames(newLeft) || !uniqueNames(newRight)) return None
    val join = AsOfJoinPlan(newLeft, newRight,
      keptList(pk).name, otherList(pk).name,
      keptList(pt).name, otherList(pt).name)
    // ---- top projection: reproduce every original attribute id ----
    val rightNullable = newRight.output.map(a => a.exprId -> a.withNullability(true)).toMap
    val unionCols: Seq[NamedExpression] = unionOut.zipWithIndex.map { case (ua, i) =>
      keptList(i) match {
        case Alias(l: Literal, _) => Alias(l, ua.name)(exprId = ua.exprId)
        case l: Literal => Alias(l, ua.name)(exprId = ua.exprId)
        case e => e.toAttribute
      }
    }
    val winCols: Seq[NamedExpression] = valPairs.map { case (al, p) =>
      val src = rightNullable(otherList(p).exprId)
      Alias(src, al.name)(exprId = al.exprId)
    }
    // original Filter kept verbatim on top: `side` is reproduced as the
    // kept-side literal (so the tag conjunct folds to true) and any
    // user conjuncts on other columns still apply.
    Some(Filter(f.condition, Project(unionCols ++ winCols, join)))
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

  /** Null-aware long view of a (key|time) column: integral +
    * date/timestamp physical types (int days / long micros). A null
    * cell reads as `(isNull = true, value = 0)`; [[AsOfJoinExec.cmp]]
    * orders the null flag first. */
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
    val lKeyOrd = lOut.indexWhere(_.name == leftKey)
    val lTimeOrd = lOut.indexWhere(_.name == leftTime)
    val rKeyOrd = rOut.indexWhere(_.name == rightKey)
    val rTimeOrd = rOut.indexWhere(_.name == rightTime)
    val lKey = longGetter(attr(left, leftKey), lKeyOrd)
    val lTime = longGetter(attr(left, leftTime), lTimeOrd)
    val rKey = longGetter(attr(right, rightKey), rKeyOrd)
    val rTime = longGetter(attr(right, rightTime), rTimeOrd)
    val outAttrs = output
    // zipPartitions pairs the i-th left partition with the i-th right
    // partition. That is only correct because requiredChildDistribution
    // declares ClusteredDistribution on the SAME key for both children:
    // EnsureRequirements then inserts COMPATIBLE hash exchanges (equal
    // partitioning expressions and numPartitions), so key k lands in
    // the same partition index on both sides. If AQE or a future
    // planner change ever produced incompatible child partitionings,
    // this pairing — not the merge — is the invariant that breaks;
    // AsOfJoinSpec asserts the plan shape to catch that.
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      // right side re-declared nullable, or the bound references would
      // skip null checks and read 0s out of the all-null row
      val project = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      // nulls-first ordering on (isNull, value), null == null: matches
      // the Ascending/NullsFirst child sort AND window-partitionBy
      // grouping (all null keys form ONE group), so the merge agrees
      // with the union-window plan AsOfAutoRewrite replaces.
      @inline def cmp(n1: Boolean, v1: Long, n2: Boolean, v2: Long): Int =
        if (n1 && n2) 0 else if (n1) -1 else if (n2) 1
        else java.lang.Long.compare(v1, v2)
      // one-row right-side state: the latest right row at or before the
      // current merge frontier (copied out of the reused UnsafeRow)
      var candidate: InternalRow = null
      var candKeyNull = false
      var candKey = 0L
      var lookahead: InternalRow = if (rIt.hasNext) rIt.next().copy() else null
      lIt.map { lrow =>
        val lkN = lrow.isNullAt(lKeyOrd)
        val lk = if (lkN) 0L else lKey(lrow)
        val ltN = lrow.isNullAt(lTimeOrd)
        val lt = if (ltN) 0L else lTime(lrow)
        // advance the right side up to (key, time) <= (lk, lt)
        var advancing = true
        while (advancing && lookahead != null) {
          val rkN = lookahead.isNullAt(rKeyOrd)
          val rk = if (rkN) 0L else rKey(lookahead)
          val kc = cmp(rkN, rk, lkN, lk)
          val behind = kc < 0 || (kc == 0 && {
            val rtN = lookahead.isNullAt(rTimeOrd)
            val rt = if (rtN) 0L else rTime(lookahead)
            cmp(rtN, rt, ltN, lt) <= 0
          })
          if (behind) {
            if (kc == 0) {
              candidate = lookahead
              candKeyNull = rkN
              candKey = rk
            }
            lookahead = if (rIt.hasNext) rIt.next().copy() else null
          } else advancing = false
        }
        val r =
          if (candidate != null && cmp(candKeyNull, candKey, lkN, lk) == 0) candidate
          else nullRight
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
    if (!spark.experimental.extraOptimizations.contains(AsOfAutoRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfAutoRewrite
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
