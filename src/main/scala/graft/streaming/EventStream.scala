package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is strictly batch
  * (SURVEY.md §2.I), but a training-data engine needs an ingest path:
  * file-source streaming over the same table layout, watermarked windowed
  * aggregation, and the batch-equivalent transform shared so the streaming
  * query is just `readStream` + the same column expressions.
  */
object EventStream {

  val schema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Shared transform: 5-minute tumbling-window counts per event type.
    * Works identically on a batch or streaming DataFrame.
    */
  def windowCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "5 minutes").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("total_value"))
      .select(
        date_format(col("win.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Streaming variant with a watermark (late data beyond 10 min dropped).
    * Tests drive it with the file source over a testdata dir + memory sink.
    */
  def streamingWindowCounts(spark: SparkSession, dir: String): DataFrame =
    windowCounts(
      spark.readStream.schema(schema).parquet(dir)
        .withWatermark("ts", "10 minutes"))
}
