package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary remove_ranges compat writer (reference B6): the reference's
  * `remove_ranges` file is a flat array of `pair<size_t, size_t>` --
  * 16-byte little-endian (u64 left-inclusive, u64 right-exclusive) global
  * byte offsets into the concatenated corpus, sorted ascending
  * (cpp_engine_dedup.h:294-297; README.md:85). This sink converts our
  * per-doc (k, s, e) ranges into that format for golden comparison.
  *
  * Global coordinates follow the reference tokenized layout: every doc is
  * prefixed by one 0xff separator byte (indexing_v6_sharded.py:56), so doc
  * k's text starts at `1 + sum_{j<k}(1 + len_j)`. Doc offsets are computed
  * with a two-phase distributed prefix sum (per-range-partition running
  * sums + driver-side partition offsets -- one row per partition, same
  * shape as StableIds), never a single-partition global window.
  */
object RemoveRangesBin {

  /** docLens(k, len) -> (k, start): global text start offset per doc. */
  def docStarts(docLens: DataFrame): DataFrame = {
    val spark = docLens.sparkSession
    val parts = spark.sessionState.conf.numShufflePartitions
    val ranged = docLens
      .select(col("k").cast("long"), col("len").cast("long"))
      .repartitionByRange(parts, col("k"))
      .withColumn("_pid", spark_partition_id())
    val withCum = ranged.withColumn("_cum",
      sum(col("len") + 1).over(Window.partitionBy("_pid").orderBy("k")))
      .localCheckpoint(true) // pin one partitioning + numbering
    val counts = withCum.groupBy("_pid").agg(max(col("_cum")).as("_n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
    val offsetDf = spark.createDataFrame(
      counts.map(_._1).zip(offsets.map(_._2)).toSeq).toDF("_pid", "_off")
    withCum
      .join(broadcast(offsetDf), Seq("_pid"))
      // start of doc text = global cum BEFORE this doc + 1 separator byte
      .withColumn("start", col("_off") + col("_cum") - (col("len") + 1) + 1)
      .select(col("k"), col("start"))
  }

  /** Write ranges(k, s, e) as sorted 16-byte LE pairs in global
    * coordinates; one binary part file per output partition
    * (part-00000.bin ...). Returns the number of ranges written.
    */
  def writeLE(ranges: DataFrame, docLens: DataFrame, outDir: String,
              partitions: Int = 1): Long = {
    val spark = ranges.sparkSession
    import spark.implicits._
    val global = ranges
      .join(docStarts(docLens), Seq("k"))
      .select((col("start") + col("s")).as("gs"), (col("start") + col("e")).as("ge"))
      .repartitionByRange(partitions, col("gs"))
      .sortWithinPartitions("gs", "ge")
      .as[(Long, Long)]
    val hadoopProps = HadoopConfs.snapshot(spark)
    val counts = global.rdd.mapPartitionsWithIndex { (pid, it) =>
      val conf = HadoopConfs.build(hadoopProps)
      val target = new Path(outDir, f"part-$pid%05d.bin")
      val os = target.getFileSystem(conf).create(target, true)
      val buf = ByteBuffer.allocate(16).order(ByteOrder.LITTLE_ENDIAN)
      var n = 0L
      it.foreach { case (gs, ge) =>
        buf.clear(); buf.putLong(gs); buf.putLong(ge)
        os.write(buf.array()); n += 1
      }
      os.close()
      Iterator.single(n)
    }.collect()
    counts.sum
  }
}
