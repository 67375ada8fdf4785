package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's 4-case city/area reconciliation
  * (il_analysis_git.py:84-115) as a single declarative plan.
  *
  *  - case 1: city with no area-0 rows — keep as-is;
  *  - case 2: city with area-0 AND real areas — drop the area-0 rows;
  *  - case 3: city with only area-0 rows but multiple shape areas —
  *    dissolve geometry (geo package) and remap area/id to area+1;
  *  - case 4: city with only area-0 rows and a single shape area —
  *    remap area/id to area+1.
  *
  * The reference iterates `groupby('city')` in Python (O(cities) driver
  * loop); here the per-city facts (`has zero-area rows`, `has non-zero-
  * area rows`) are window aggregates, so the whole reconciliation is
  * one shuffle on `city` + a codegen'd filter/project — no driver loop,
  * scale-safe.
  */
object ReconcileOps {

  /** Cases 1, 2 and the area/id remap of case 3/4 on the *fact* side.
    * (Case 3's geometry dissolve lives in graft.geo; its fact-side
    * effect — the remap — is identical to case 4's.) */
  def reconcileFact(df: DataFrame, city: String = "city", area: String = "area"): DataFrame = {
    val wc = Window.partitionBy(city)
    val hasZero = max(when(col(area) === 0, 1).otherwise(0)).over(wc)
    val hasNonZero = max(when(col(area) =!= 0, 1).otherwise(0)).over(wc)
    df.withColumn("__hz", hasZero)
      .withColumn("__hnz", hasNonZero)
      // case 2: drop area-0 rows of mixed cities
      .filter(!(col(area) === 0 && col("__hz") === 1 && col("__hnz") === 1))
      // case 3/4: all-zero city -> area 1 (matches shape-side remap :102,:113)
      .withColumn(area,
        when(col("__hz") === 1 && col("__hnz") === 0 && col(area) === 0, lit(1))
          .otherwise(col(area)))
      .drop("__hz", "__hnz")
  }
}
