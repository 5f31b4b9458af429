package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic gaps-and-islands coalescing: merge sorted per-group points into
  * maximal runs where consecutive points are within `gap`.
  *
  * This is the reference's remove_ptr -> remove_range merge generalized
  * (cpp_engine_dedup.h:282-292: extend while last.end >= ptr). Partitioned
  * by the group key, so it scales with the number of groups; within a
  * group the window sort is the only cost.
  */
object Islands {

  /** df(groupCols..., pointCol) -> (groupCols..., s = min point,
    * e = max point + extent) coalescing runs where
    * point <= prev_point + gap.
    */
  def coalesce(df: DataFrame, groupCols: Seq[String], pointCol: String,
               gap: Column, extent: Column): DataFrame = {
    val byGroup = Window.partitionBy(groupCols.map(col): _*).orderBy(col(pointCol))
    val p = col(pointCol)
    df
      .withColumn("_prev", lag(p, 1).over(byGroup))
      .withColumn("_brk", when(col("_prev").isNull || p > col("_prev") + gap, 1).otherwise(0))
      .withColumn("_island", sum(col("_brk")).over(byGroup))
      .groupBy((groupCols.map(col) :+ col("_island")): _*)
      .agg(min(p).as("s"), (max(p) + extent).as("e"))
      .drop("_island")
  }
}
