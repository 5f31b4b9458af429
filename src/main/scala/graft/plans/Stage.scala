package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent stage snapshots + per-stage metrics (the north_rule's
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Mirrors the reference's skip-if-exists stage restart
  * (indexing_v6_sharded.py:67-69, 201-203, 225-227) and its per-run
  * counters (total_remove_ptrs/ranges/bytes, cpp_engine_dedup.h:601-606):
  * every stage writes a parquet snapshot (parquet's _SUCCESS is the
  * completion marker) plus per-partition metrics rows following the
  * FIXTURES.md F4 schema (stage, partition, rows_in, rows_out,
  * bytes_removed, wall_ms); a rerun that finds the marker reads the
  * snapshot instead of recomputing, so any stage resumes after a crash.
  *
  * The marker probe goes through the Hadoop FileSystem API, so snapshots
  * work on any supported filesystem (local, HDFS, s3a), not just the
  * local disk. Plain parquet dirs behind this surface -- an Iceberg
  * catalog slots in unchanged when its jars are present (SURVEY.md §7.4:
  * no iceberg jars in this sandbox).
  */
class Stage(spark: SparkSession, baseDir: String) {

  private def dir(name: String) = s"$baseDir/$name"

  private def done(name: String): Boolean = {
    val marker = new Path(dir(name), "_SUCCESS")
    marker.getFileSystem(spark.sessionState.newHadoopConf()).exists(marker)
  }

  /** Run (or resume) a named stage. Returns the snapshot-backed DataFrame,
    * so downstream stages read the materialized parquet -- lineage is cut
    * at every stage boundary exactly like the reference's file IRs.
    *
    * `rowsIn` is the caller-known input cardinality (-1 = not supplied:
    * a generic snapshot manager cannot count an arbitrary plan's inputs
    * without re-executing them). `bytes_removed` is derived when the
    * snapshot carries [s, e) range columns (the reference's
    * total_remove_bytes counter, h:601-606); 0 otherwise.
    */
  def run(name: String, rowsIn: Long = -1L)(compute: => DataFrame): DataFrame = {
    if (!done(name)) {
      val t0 = System.nanoTime()
      compute.write.mode("overwrite").parquet(dir(name))
      val wallMs = (System.nanoTime() - t0) / 1000000
      val out = spark.read.parquet(dir(name))
      val hasRange = out.columns.contains("s") && out.columns.contains("e")
      val removedExpr =
        if (hasRange) sum(col("e") - col("s")) else lit(0L)
      val byPartition = out
        .groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows_out"),
          coalesce(removedExpr, lit(0L)).cast("long").as("bytes_removed"))
        .withColumn("stage", lit(name))
        .withColumn("rows_in", lit(rowsIn))
        .withColumn("wall_ms", lit(wallMs))
        .select("stage", "partition", "rows_in", "rows_out", "bytes_removed", "wall_ms")
      byPartition.write.mode("append").parquet(s"$baseDir/_metrics")
    }
    spark.read.parquet(dir(name))
  }

  def metrics: DataFrame = spark.read.parquet(s"$baseDir/_metrics")
}
