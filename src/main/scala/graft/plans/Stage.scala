package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Idempotent stage snapshots + per-stage metrics (the north_rule's
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Mirrors the reference's skip-if-exists stage restart
  * (indexing_v6_sharded.py:67-69, 201-203, 225-227) and its per-run
  * counters (total_remove_ptrs/ranges/bytes, cpp_engine_dedup.h:601-606):
  * every stage writes a parquet snapshot (parquet's _SUCCESS is the
  * completion marker) plus a metrics row (stage, rows_out, partitions,
  * wall_ms); a rerun that finds the marker reads the snapshot instead of
  * recomputing, so any stage resumes after a crash.
  *
  * Plain parquet dirs behind this trait'd surface -- an Iceberg catalog
  * slots in unchanged when its jars are present (SURVEY.md §7.4: no
  * iceberg jars in this sandbox).
  */
class Stage(spark: SparkSession, baseDir: String) {

  private def dir(name: String) = s"$baseDir/$name"
  private def done(name: String) =
    new java.io.File(s"${dir(name)}/_SUCCESS").exists()

  /** Run (or resume) a named stage. Returns the snapshot-backed DataFrame,
    * so downstream stages read the materialized parquet -- lineage is cut
    * at every stage boundary exactly like the reference's file IRs.
    */
  def run(name: String)(compute: => DataFrame): DataFrame = {
    if (!done(name)) {
      val t0 = System.nanoTime()
      compute.write.mode("overwrite").parquet(dir(name))
      val wallMs = (System.nanoTime() - t0) / 1000000
      val out = spark.read.parquet(dir(name))
      val byPartition = out
        .groupBy(spark_partition_id().as("partition"))
        .agg(count(lit(1)).as("rows_out"))
        .withColumn("stage", lit(name))
        .withColumn("wall_ms", lit(wallMs))
        .select("stage", "partition", "rows_out", "wall_ms")
      byPartition.write.mode("append").parquet(s"$baseDir/_metrics")
    }
    spark.read.parquet(dir(name))
  }

  def metrics: DataFrame = spark.read.parquet(s"$baseDir/_metrics")
}
