package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.DedupPipeline

/** Streaming ingest for the images table layout (BASELINE.json
  * input_hint: image_id, bytes, w, h, fmt, caption, phash): exact
  * duplicates are dropped AT INGEST, using the exact same content key the
  * batch pipeline's exact-dedup stage groups on (DedupPipeline stage 2 ->
  * ExactDedup digest of sha2(bytes) || caption), so a corpus admitted by
  * the streaming path is precisely what batch ExactDedup would keep.
  *
  * This is the join-up between the streaming surface and the dedup
  * pipeline: a training-data engine's ingest path runs THIS, then the
  * heavier near-dup stages (LSH/pHash/CC) run in batch over the admitted
  * corpus.
  */
object IngestDedup {

  val imagesSchema: StructType = StructType(Seq(
    StructField("image_id", StringType),
    StructField("bytes", BinaryType),
    StructField("w", IntegerType),
    StructField("h", IntegerType),
    StructField("fmt", StringType),
    StructField("caption", StringType),
    StructField("phash", LongType)))

  /** The batch pipeline's content digest, verbatim: ExactDedup.flag on a
    * string column hashes its UTF-8 encoding, and the pipeline's content
    * column is sha2(bytes) || nullSafe(caption) (DedupPipeline.content).
    * State per distinct payload is this single 32-byte digest, never the
    * image bytes.
    */
  def contentDigest: Column =
    sha2(encode(concat(sha2(col("bytes"), 256),
      DedupPipeline.nullSafeCaption(col("caption"))), "UTF-8"), 256)

  /** File-source stream over an images-table directory; first arrival of
    * each distinct content passes, later copies are dropped. Without an
    * event-time column the dedup state is unbounded (one digest per
    * distinct payload) -- for bounded state on an endless ingest stream
    * use `streamingDedupBounded` with an arrival-time column + watermark,
    * the `dropDuplicatesWithinWatermark` analogue of EventStream's dedup.
    */
  def streamingDedup(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(imagesSchema).parquet(dir)
      .withColumn("digest", contentDigest)
      .dropDuplicates("digest")

  /** Watermark-bounded variant: duplicates are only suppressed while
    * their ingest time is inside the watermark horizon -- state stays
    * bounded on an unbounded stream; re-ingests separated by more than
    * `watermark` are re-admitted (batch dedup downstream catches them).
    */
  def streamingDedupBounded(spark: SparkSession, dir: String,
                            tsCol: String, watermark: String): DataFrame =
    spark.readStream.schema(
      StructType(imagesSchema.fields :+ StructField(tsCol, TimestampType)))
      .parquet(dir)
      .withWatermark(tsCol, watermark)
      .withColumn("digest", contentDigest)
      .dropDuplicatesWithinWatermark("digest")
}
