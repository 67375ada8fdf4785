package graft.io

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, InsertIntoStatement, LogicalPlan, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** The READ-side V2→V1 conversion behind [[GraftLakeCatalog]] —
  * Delta's `DeltaAnalysis`/`DeltaRelation.fromV2Relation` pattern
  * distilled: a [[DataSourceV2Relation]] over a [[GraftLakeTable]] is
  * rewritten during RESOLUTION into a [[LogicalRelation]] over the
  * connector's existing `HadoopFsRelation`, REUSING the v2 relation's
  * output attributes so references above the node stay bound. From
  * there the native scan stack plans exactly as the
  * `spark.read.format("graftlake")` path — same FileIndex, pruning,
  * commit-entry statistics, parquet pushdown, codegen. A from-scratch
  * DSv2 `PartitionReader` would have re-implemented (slower) parquet
  * decoding instead; this rule is the price of NOT doing that.
  *
  * WRITE targets are left as v2 relations: `INSERT INTO lake.t` must
  * resolve through the DSv2 write path ([[GraftLakeTable]]'s
  * [[org.apache.spark.sql.connector.write.V1Write]] fallback →
  * `AppendDataExecV1` → the connector's commit protocol). Converting
  * the target under an in-flight `InsertIntoStatement`/V2 write
  * command would instead route the insert into the RAW
  * `InsertIntoHadoopFsRelationCommand` — bytes written WITHOUT a
  * commit-log entry, invisible to readers and unsafe against
  * concurrent writers — so the rule collects write targets first (by
  * object identity) and skips them. */
case class GraftLakeV2Conversion(spark: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    // the target may sit under a SubqueryAlias (DELETE resolves its
    // relation that way) — exclude every v2 relation in the target
    // SUBTREE, not just the direct child
    def addTargets(target: LogicalPlan): Unit = target.foreach {
      case r: DataSourceV2Relation => writeTargets.add(r); ()
      case _ => ()
    }
    plan.foreach {
      case w: V2WriteCommand => addTargets(w.table)
      case i: InsertIntoStatement => addTargets(i.table)
      case d: DeleteFromTable => addTargets(d.table)
      case _ => ()
    }
    plan.transformUp {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftLakeTable] &&
            !writeTargets.contains(r) =>
        val t = r.table.asInstanceOf[GraftLakeTable]
        if (t.isEmptyTable)
          // a created-but-never-written table reads as zero rows of
          // its declared schema (the CREATE→SELECT flow), not an error
          org.apache.spark.sql.catalyst.plans.logical.LocalRelation(
            r.output)
        else t.columnMapping match {
          case None =>
            LogicalRelation(t.v1Relation, r.output, None,
              isStreaming = false, None)
          case Some(mapping) =>
            // SCHEMA-MAPPED table: the physical relation is wrapped in
            // a projection binding logical names (and the v2 output's
            // exprIds, so references above stay bound) to immutable
            // physical ids — a mapped-but-absent id (a re-added
            // column) reads as typed NULL; the partition column rides
            // through unmapped. Filters on logical names push through
            // the aliases into the scan as usual.
            import org.apache.spark.sql.catalyst.expressions.{Alias, Literal}
            import org.apache.spark.sql.catalyst.plans.logical.Project
            val physRel = LogicalRelation(t.v1Relation)
            val byPhys = physRel.output.map(a => a.name -> a).toMap
            val toPhys = mapping.map { case (lg, ph, _) => lg -> ph }.toMap
            val projected = r.output.map { out =>
              toPhys.get(out.name) match {
                case Some(ph) => byPhys.get(ph) match {
                  case Some(src) => Alias(src, out.name)(exprId = out.exprId)
                  case None => Alias(
                    Literal.create(null, out.dataType), out.name)(
                    exprId = out.exprId)
                }
                case None => // the partition/virtual column
                  Alias(byPhys(out.name), out.name)(exprId = out.exprId)
              }
            }
            Project(projected, physRel)
        }
    }
  }
}

/** `spark.sql.extensions = graft.io.GraftLakeExtensions` — injects the
  * V2→V1 read conversion. The catalog itself needs no extension
  * (plain `spark.sql.catalog.<name>` config). */
class GraftLakeExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(session => GraftLakeV2Conversion(session))
    ()
  }
}
