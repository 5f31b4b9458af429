package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join (the reference's ptr -> doc binary search,
  * cpp_engine_dedup.h:963-977, relationalized).
  *
  * A naive `p >= s AND p < e` join has no equi-key and Catalyst falls back
  * to broadcast-nested-loop -- O(points x intervals). The scalable shape:
  * quantize both sides into fixed-width buckets, explode each interval to
  * the buckets it overlaps, equi-join on (keys..., bucket), then re-verify
  * the exact predicate. Bucket width should approximate the median
  * interval length so each interval lands in O(1) buckets.
  */
object RangeJoin {

  /** points(keyCols..., p) x intervals(keyCols..., s, e) ->
    * joined rows with s <= p < e. Empty intervals (s == e) match nothing.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      bucketWidth: Long, keyCols: Seq[String] = Nil): DataFrame = {
    val ib = intervals
      .where(col("e") > col("s"))
      .withColumn("_bkt",
        explode(sequence(floor(col("s") / bucketWidth).cast("long"),
          floor((col("e") - 1) / bucketWidth).cast("long"))))
    val pb = points.withColumn("_bkt", floor(col("p") / bucketWidth).cast("long"))
    pb.join(ib, keyCols :+ "_bkt")
      .where(col("p") >= col("s") && col("p") < col("e"))
      .drop("_bkt")
  }
}
