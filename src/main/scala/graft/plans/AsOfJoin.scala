package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, ClusteredDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DataType, DateType, IntegerType, LongType, TimestampType}

/** Native sorted-merge AS-OF join — the full custom-operator ladder
  * (SURVEY §4 / builder contract step (c)): a logical node, a planner
  * [[Strategy]], and two physical operators with declared
  * distribution + ordering requirements, registered either via
  * `SparkSessionExtensions.injectPlannerStrategy`
  * ([[graft.functions.GraftExtensions]]) or at runtime
  * ([[AsOf.ensureStrategy]]).
  *
  * Semantics: left-outer as-of — each left row picks up the LATEST
  * right row of the same (composite) key with `rightTime <= leftTime`
  * (right columns null when none). The reference's workload has no
  * as-of join; this generalizes its "latest value at date" window
  * logic (il_analysis_git.py:134-136) into a first-class operator.
  *
  * Scale anatomy — the strategy picks one of two physical plans:
  *  - [[AsOfJoinExec]] (large right side): EnsureRequirements
  *    co-partitions both sides by the keys (one shuffle each — same
  *    cost envelope as a sort-merge join) and sorts by (keys, time);
  *    the merge is a single forward pass per partition holding ONE
  *    buffered right row — O(1) memory, no window machinery, no union
  *    row blow-up. Skew follows the key distribution exactly as in
  *    any shuffled join.
  *  - [[BroadcastAsOfJoinExec]] (right side under
  *    `spark.sql.autoBroadcastJoinThreshold`): the right side is
  *    broadcast once and indexed per partition (hash by key, binary
  *    search on time) — ZERO shuffles, ZERO sorts, the common
  *    dimension-as-of case (join 100 TB of facts to a small slowly-
  *    changing dimension without moving the facts at all).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKeys: Seq[String], rightKeys: Seq[String],
                        leftTime: String, rightTime: String)
    extends BinaryNode {
  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs >= 1 key and matching key counts")
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
      def prune(side: LogicalPlan, keys: Seq[String], time: String): Seq[Attribute] =
        side.output.filter(a =>
          needed.contains(a) || keys.contains(a.name) || a.name == time)
      val lKeep = prune(aj.left, aj.leftKeys, aj.leftTime)
      val rKeep = prune(aj.right, aj.rightKeys, aj.rightTime)
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
  * `last(value, ignoreNulls) over (partition by keys order by time,
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
  *     Window([last(v_i, true) over (pb keys ob time, side)]*,
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
  * attribute ids); one or more partition keys; order is (time asc,
  * side) with the tag polarity that sorts right-side rows BEFORE left
  * rows on time ties (inclusive as-of, matching [[AsOfJoinExec]]);
  * every window expression is `last(x, ignoreNulls = true)` over that
  * same spec with a ROWS unbounded-preceding..current frame; each `x`
  * is null-padded on the kept side (a real left value would feed the
  * carry-forward, which the join cannot express) and provably
  * non-null on the other side; key/time columns are
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
    // ---- window spec: >= 1 keys, (time asc, side <dir>) ----
    if (w.partitionSpec.isEmpty || w.orderSpec.length != 2) return None
    val pks = w.partitionSpec.map(pos)
    val timeOrd = w.orderSpec.head
    val sideOrd = w.orderSpec.last
    val pt = pos(timeOrd.child)
    if (pks.exists(_ < 0) || pt < 0 || pos(sideOrd.child) != ps) return None
    if (pks.distinct.length != pks.length) return None
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
    for (p <- pks :+ pt; list <- Seq(keptList, otherList)) {
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
    if (!(pks :+ pt).forall(i => leftKeep.exists(_.exprId == keptList(i).exprId)))
      return None
    val rightKeepPos = (pks ++ Seq(pt) ++ valPos).distinct
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
      pks.map(keptList(_).name), pks.map(otherList(_).name),
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

/** Plans [[AsOfJoinPlan]] to [[BroadcastAsOfJoinExec]] when the right
  * side's estimated size is under `spark.sql.autoBroadcastJoinThreshold`
  * (zero shuffles — the dimension-as-of case), else to the shuffled
  * sorted-merge [[AsOfJoinExec]]. Kill switch:
  * `spark.graft.asof.broadcast=false` forces the shuffled plan.
  * Everything else falls through to the stock strategies. */
object AsOfJoinStrategy extends SparkStrategy {
  val BroadcastConfKey = "spark.graft.asof.broadcast"

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lks, rks, lt, rt) =>
      val conf = SQLConf.get
      val bcEnabled = conf.getConfString(BroadcastConfKey, "true").toBoolean
      val threshold = conf.autoBroadcastJoinThreshold
      val small = bcEnabled && threshold > 0 &&
        r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= threshold
      if (small)
        BroadcastAsOfJoinExec(planLater(l), planLater(r), lks, rks, lt, rt) :: Nil
      else
        AsOfJoinExec(planLater(l), planLater(r), lks, rks, lt, rt) :: Nil
    case _ => Nil
  }
}

/** Task-side merge helpers for the two as-of physical operators.
  * A standalone serializable object: the operator closures reference
  * these (and small [[AsOfMerge.TupleReader]] instances) instead of
  * methods on the plan node, so tasks never capture the SparkPlan
  * tree itself. */
private[plans] object AsOfMerge extends Serializable {

  /** nulls-first ordering on (isNull, value), null == null: matches
    * the Ascending/NullsFirst child sort AND window-partitionBy
    * grouping (all null keys form ONE group), so both execs agree
    * with the union-window plan AsOfAutoRewrite replaces. */
  def cmp(n1: Boolean, v1: Long, n2: Boolean, v2: Long): Int =
    if (n1 && n2) 0 else if (n1) -1 else if (n2) 1
    else java.lang.Long.compare(v1, v2)

  /** Lexicographic null-aware comparison of two extracted tuples. */
  def cmpTuple(n1: Array[Boolean], v1: Array[Long],
               n2: Array[Boolean], v2: Array[Long]): Int = {
    var i = 0
    while (i < n1.length) {
      val c = cmp(n1(i), v1(i), n2(i), v2(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Per-row extraction of a null-aware (nulls, values) tuple for a
    * named column set. Built driver-side from the child's output;
    * carries only ordinals + per-type lambdas into the task. A null
    * cell reads as `(isNull = true, value = 0)`; [[cmp]] orders the
    * null flag first. Supported physical types: integral +
    * date/timestamp (int days / long micros). */
  final class TupleReader(attrs: Seq[Attribute], names: Seq[String]) extends Serializable {
    val ordinals: Array[Int] = names.map { name =>
      val i = attrs.indexWhere(_.name == name)
      if (i < 0) throw new IllegalArgumentException(
        s"column '$name' not in [${attrs.map(_.name).mkString(",")}]")
      i
    }.toArray
    private val getters: Array[InternalRow => Long] =
      names.zip(ordinals).map { case (name, ordinal) =>
        attrs(ordinal).dataType match {
          case LongType | TimestampType => (row: InternalRow) => row.getLong(ordinal)
          case IntegerType | DateType => (row: InternalRow) => row.getInt(ordinal).toLong
          case t => throw new IllegalArgumentException(
            s"as-of join key/time must be integral/date/timestamp, got $t for $name")
        }
      }.toArray
    val n: Int = ordinals.length
    def read(row: InternalRow, nulls: Array[Boolean], values: Array[Long]): Unit = {
      var i = 0
      while (i < n) {
        nulls(i) = row.isNullAt(ordinals(i))
        values(i) = if (nulls(i)) 0L else getters(i)(row)
        i += 1
      }
    }
  }
}

/** Driver-side plumbing shared by the two as-of physical operators:
  * name-based attribute resolution and the common output schema. */
trait AsOfExecBase { self: BinaryExecNode =>
  protected def attr(side: SparkPlan, name: String): Attribute =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"column '$name' not in [${side.output.map(_.name).mkString(",")}]"))

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
}

/** Shuffled sorted-merge as-of: both sides co-partitioned by the keys
  * and sorted by (keys, time); single forward pass per partition. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[String], rightKeys: Seq[String],
                        leftTime: String, rightTime: String)
    extends BinaryExecNode with AsOfExecBase {

  /** Co-partition both sides by the join keys (EnsureRequirements
    * inserts compatible hash exchanges, exactly as for SMJ). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys.map(attr(left, _))) ::
      ClusteredDistribution(rightKeys.map(attr(right, _))) :: Nil

  /** Partition-local sort by (keys, time) on both sides. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(k => SortOrder(attr(left, k), Ascending)) :+
      SortOrder(attr(left, leftTime), Ascending),
    rightKeys.map(k => SortOrder(attr(right, k), Ascending)) :+
      SortOrder(attr(right, rightTime), Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    import AsOfMerge.{cmp, cmpTuple}
    val lOut = left.output
    val rOut = right.output
    val lKeyR = new AsOfMerge.TupleReader(lOut, leftKeys)
    val lTimeR = new AsOfMerge.TupleReader(lOut, Seq(leftTime))
    val rKeyR = new AsOfMerge.TupleReader(rOut, rightKeys)
    val rTimeR = new AsOfMerge.TupleReader(rOut, Seq(rightTime))
    val nk = lKeyR.n
    val outAttrs = output
    // zipPartitions pairs the i-th left partition with the i-th right
    // partition. That is only correct because requiredChildDistribution
    // declares ClusteredDistribution on the SAME keys for both children:
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
      val lkN = new Array[Boolean](nk); val lk = new Array[Long](nk)
      val ltN = new Array[Boolean](1); val lt = new Array[Long](1)
      val rkN = new Array[Boolean](nk); val rk = new Array[Long](nk)
      val rtN = new Array[Boolean](1); val rt = new Array[Long](1)
      // one-row right-side state: the latest right row at or before the
      // current merge frontier (copied out of the reused UnsafeRow)
      var candidate: InternalRow = null
      val candKN = new Array[Boolean](nk); val candK = new Array[Long](nk)
      var lookahead: InternalRow = if (rIt.hasNext) rIt.next().copy() else null
      lIt.map { lrow =>
        lKeyR.read(lrow, lkN, lk)
        lTimeR.read(lrow, ltN, lt)
        // advance the right side up to (keys, time) <= (lk, lt)
        var advancing = true
        while (advancing && lookahead != null) {
          rKeyR.read(lookahead, rkN, rk)
          val kc = cmpTuple(rkN, rk, lkN, lk)
          val behind = kc < 0 || (kc == 0 && {
            rTimeR.read(lookahead, rtN, rt)
            cmp(rtN(0), rt(0), ltN(0), lt(0)) <= 0
          })
          if (behind) {
            if (kc == 0) {
              candidate = lookahead
              System.arraycopy(rkN, 0, candKN, 0, nk)
              System.arraycopy(rk, 0, candK, 0, nk)
            }
            lookahead = if (rIt.hasNext) rIt.next().copy() else null
          } else advancing = false
        }
        val r =
          if (candidate != null && cmpTuple(candKN, candK, lkN, lk) == 0) candidate
          else nullRight
        project(joined(lrow, r))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Broadcast as-of: the right side is broadcast whole (Identity mode
  * — plain collected rows) and indexed once per partition into a
  * key-hash of time-sorted row arrays; each left row does a hash
  * lookup + binary search. NO exchange and NO sort on either side —
  * the left (fact) side streams through untouched, which is the plan
  * you want when joining a petabyte fact table to a megabyte
  * dimension history. */
case class BroadcastAsOfJoinExec(left: SparkPlan, right: SparkPlan,
                                 leftKeys: Seq[String], rightKeys: Seq[String],
                                 leftTime: String, rightTime: String)
    extends BinaryExecNode with AsOfExecBase {

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    import AsOfMerge.cmp
    val lOut = left.output
    val rOut = right.output
    val lKeyR = new AsOfMerge.TupleReader(lOut, leftKeys)
    val lTimeR = new AsOfMerge.TupleReader(lOut, Seq(leftTime))
    val rKeyR = new AsOfMerge.TupleReader(rOut, rightKeys)
    val rTimeR = new AsOfMerge.TupleReader(rOut, Seq(rightTime))
    val nk = lKeyR.n
    val outAttrs = output
    val bc = right.executeBroadcast[Array[InternalRow]]()
    left.execute().mapPartitions({ lIt =>
      // ---- build the per-partition index over the broadcast rows ----
      // key tuple (nulls boxed as null, values as java.lang.Long) →
      // rows sorted by null-aware time. Build cost is |dim| log |dim|
      // per partition — the dimension is under the broadcast
      // threshold by construction, so this is bounded and cheap
      // relative to scanning the fact partition.
      val rkN = new Array[Boolean](nk); val rk = new Array[Long](nk)
      val rtN = new Array[Boolean](1); val rt = new Array[Long](1)
      val index = new java.util.HashMap[List[Any], scala.collection.mutable.ArrayBuffer[(Boolean, Long, InternalRow)]]()
      bc.value.foreach { rrow =>
        rKeyR.read(rrow, rkN, rk)
        rTimeR.read(rrow, rtN, rt)
        val key: List[Any] = (0 until nk).map(i =>
          if (rkN(i)) null else java.lang.Long.valueOf(rk(i))).toList
        val buf = index.computeIfAbsent(key,
          _ => scala.collection.mutable.ArrayBuffer.empty[(Boolean, Long, InternalRow)])
        buf += ((rtN(0), rt(0), rrow))
      }
      // ties at equal (isNull, time) need no tie-break: any of them is
      // a valid "latest" (matches the window plan's tie nondeterminism)
      index.values.forEach { buf =>
        buf.sortInPlaceWith((a, b) => cmp(a._1, a._2, b._1, b._2) < 0); ()
      }
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.length)
      val project = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val lkN = new Array[Boolean](nk); val lk = new Array[Long](nk)
      val ltN = new Array[Boolean](1); val lt = new Array[Long](1)
      lIt.map { lrow =>
        lKeyR.read(lrow, lkN, lk)
        lTimeR.read(lrow, ltN, lt)
        val key: List[Any] = (0 until nk).map(i =>
          if (lkN(i)) null else java.lang.Long.valueOf(lk(i))).toList
        val buf = index.get(key)
        var r: InternalRow = nullRight
        if (buf != null) {
          // binary search: RIGHTMOST entry with time <= left time
          var lo = 0
          var hi = buf.length - 1
          var found = -1
          while (lo <= hi) {
            val mid = (lo + hi) >>> 1
            val e = buf(mid)
            if (cmp(e._1, e._2, ltN(0), lt(0)) <= 0) { found = mid; lo = mid + 1 }
            else hi = mid - 1
          }
          if (found >= 0) r = buf(found)._3
        }
        project(joined(lrow, r))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsOfJoinExec =
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
           leftTime: String, rightTime: String): DataFrame =
    joinKeys(left, right, Seq(leftKey), Seq(rightKey), leftTime, rightTime)

  /** Composite-key variant: the latest right row per (k1, …, kn). */
  def joinKeys(left: DataFrame, right: DataFrame,
               leftKeys: Seq[String], rightKeys: Seq[String],
               leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    ColumnBridge.ofRows(spark, AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKeys, rightKeys, leftTime, rightTime))
  }
}
