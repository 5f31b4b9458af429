package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact duplicate-document detection: keep the first occurrence (minimum
  * order key) of every distinct content value, flag the rest.
  *
  * The scalable shape: group on a 256-bit content digest (sha2) rather than
  * the content itself, so the shuffle carries 32 bytes per row instead of
  * the full payload; the per-group min is a partial-aggregating hash
  * aggregate (map-side combine). Mirrors the reference's first-occurrence
  * keep rule (cpp_engine_dedup.h:239-246) at document granularity.
  */
object ExactDedup {

  /** docs(k: Long, <contentCol>) -> (k, keeper, is_dup): one row per doc,
    * keeper = min k among docs with identical content.
    */
  def flag(docs: DataFrame, contentCol: String): DataFrame = {
    val keyed = docs.select(
      col("k").cast("long"),
      sha2(col(contentCol).cast("string"), 256).as("digest"))
    val keepers = keyed.groupBy("digest").agg(min(col("k")).as("keeper"))
    keyed
      .join(keepers, "digest")
      .select(col("k"), col("keeper"), (col("k") =!= col("keeper")).as("is_dup"))
  }

  /** Distinct-content summary: (keeper, n_copies) per duplicate group. */
  def groups(docs: DataFrame, contentCol: String): DataFrame =
    docs
      .select(col("k").cast("long"), sha2(col(contentCol).cast("string"), 256).as("digest"))
      .groupBy("digest")
      .agg(min(col("k")).as("keeper"), count(lit(1)).as("n_copies"))
      .select("keeper", "n_copies")

  /** Deduplicated view: first occurrence of each content value only. */
  def dedup(docs: DataFrame, contentCol: String): DataFrame =
    flag(docs, contentCol).where(!col("is_dup")).select("k")
      .join(docs.withColumn("k", col("k").cast("long")), Seq("k"))
}
