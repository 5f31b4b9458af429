package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Shingles

/** Exact n-gram Jaccard near-duplicate pairs via an inverted shingle
  * index -- no O(n^2) cross join: only pairs that SHARE at least one
  * shingle are ever considered, the intersection size falls out of a
  * groupBy on the shared-shingle join, and set sizes come from a tiny
  * per-doc aggregate that Catalyst broadcasts when small.
  *
  * This is the exact counterpart to MinHash/LSH: same shingle definition,
  * no approximation. Used both as a first-class operator and as the
  * verifier for LSH candidates (MinHashLSH.verifiedPairs) and as the
  * recall oracle in tests.
  *
  * Skew note: a shingle shared by *every* doc (boilerplate) would make the
  * self-join quadratic on that key. `maxShingleFreq` drops shingles above
  * a document-frequency cap before the join -- standard inverted-index
  * stop-shingle pruning; exactness is preserved for pairs whose overlap
  * isn't exclusively stop-shingles (and the verify path recomputes true
  * Jaccard anyway).
  */
object NgramJaccard {

  /** docs(k, text) -> (k, sh: Long) distinct shingle hashes. */
  def shingleTable(docs: DataFrame, n: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("k").cast("long"), encode(col("text"), "UTF-8").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (k, b) =>
        Shingles.distinctHashes(b, n).iterator.map(sh => (k, sh))
      })
      .toDF("k", "sh")
  }

  /** Exact Jaccard >= threshold pairs (a < b), with the similarity.
    * Output: (a, b, jacc).
    */
  def pairs(docs: DataFrame, n: Int, threshold: Double,
            maxShingleFreq: Long = Long.MaxValue): DataFrame = {
    val sh = shingleTable(docs, n)
    val pruned =
      if (maxShingleFreq == Long.MaxValue) sh
      else {
        val hot = sh.groupBy("sh").agg(count(lit(1)).as("df"))
          .where(col("df") > maxShingleFreq).select("sh")
        sh.join(hot, Seq("sh"), "left_anti")
      }
    val sizes = sh.groupBy("k").agg(count(lit(1)).as("sz"))

    val left = pruned.select(col("k").as("a"), col("sh"))
    val right = pruned.select(col("k").as("b"), col("sh"))
    val inter = left.join(right, Seq("sh"))
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("inter"))

    inter
      .join(sizes.select(col("k").as("a"), col("sz").as("sza")), "a")
      .join(sizes.select(col("k").as("b"), col("sz").as("szb")), "b")
      .withColumn("jacc",
        col("inter").cast("double") / (col("sza") + col("szb") - col("inter")))
      .where(col("jacc") >= threshold)
      .select(col("a"), col("b"), round(col("jacc"), 6).as("jacc"))
  }
}
