package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each `queries` entry is one operator from SURVEY.md §2 exercised on the
  * driver's parquet tables; `oracleSql` holds the equivalent ANSI SQL the
  * driver runs in DuckDB on the same tables. Column names are aligned
  * between the two (the driver's compare sorts columns by name).
  */
object SparkEntry {

  /** documents + planted duplicates: every doc_id % 7 == 0 doc reappears
    * under doc_id + 1000000. Deterministic and reproducible in SQL, so the
    * DuckDB oracle sees the identical input. Gives the dedup operators
    * non-empty output (the driver corpus itself has no duplicate texts).
    */
  private def docsWithDups(spark: SparkSession, dir: String): DataFrame = {
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id").cast("long").as("k"), col("text"))
    d.unionAll(
      d.where(col("k") % 7 === 0).select((col("k") + 1000000L).as("k"), col("text")))
  }

  private val docsWithDupsSql =
    """SELECT CAST(doc_id AS BIGINT) AS k, text FROM documents
      |UNION ALL
      |SELECT CAST(doc_id + 1000000 AS BIGINT) AS k, text FROM documents WHERE doc_id % 7 = 0""".stripMargin

  val MinLen = 32

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val docs = docsWithDups(spark, "/root/testdata/sf0.001")
    SubstringDedup.removeRanges(docs, SubstringDedup.Config(MinLen))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1+A4: substring dedup -> coalesced remove ranges (the flagship).
    "a1_remove_ranges" -> ((s, dir) => {
      SubstringDedup.removeRanges(docsWithDups(s, dir), SubstringDedup.Config(MinLen))
        .select(col("k"), col("s"), col("e"))
    }),
    // Baseline sanity: TPC-H Q1-ish aggregation.
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(s"$dir/lineitem.parquet")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("double").as("sum_qty"),
          sum(col("l_extendedprice")).cast("double").as("sum_price"),
          count(lit(1)).as("n"))
    }),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "a1_remove_ranges" ->
      s"""WITH docs AS ($docsWithDupsSql),
         |pos AS (
         |  SELECT k, text, unnest(generate_series(0, length(text) - $MinLen)) AS pos
         |  FROM docs WHERE length(text) >= $MinLen
         |),
         |ranked AS (
         |  SELECT k, pos,
         |         row_number() OVER (PARTITION BY substr(text, pos + 1, $MinLen) ORDER BY k, pos) AS rn
         |  FROM pos
         |),
         |removable AS (SELECT k, pos FROM ranked WHERE rn > 1),
         |flagged AS (
         |  SELECT k, pos,
         |         CASE WHEN lag(pos) OVER (PARTITION BY k ORDER BY pos) IS NULL
         |                OR pos > lag(pos) OVER (PARTITION BY k ORDER BY pos) + $MinLen
         |              THEN 1 ELSE 0 END AS brk
         |  FROM removable
         |),
         |isl AS (
         |  SELECT k, pos, sum(brk) OVER (PARTITION BY k ORDER BY pos) AS island FROM flagged
         |)
         |SELECT k, CAST(min(pos) AS BIGINT) AS s, CAST(max(pos) + $MinLen AS BIGINT) AS e
         |FROM isl GROUP BY k, island""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
        |       CAST(sum(l_extendedprice) AS DOUBLE) AS sum_price,
        |       count(*) AS n
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
  )
}
