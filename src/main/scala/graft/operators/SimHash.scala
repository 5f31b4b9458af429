package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Shingles

/** SimHash near-duplicate detection: a 64-bit locality-sensitive content
  * fingerprint per doc (computed locally, no shuffle), then Hamming-radius
  * pairing via the pigeonhole band join (Hamming.pairs). The same Hamming
  * machinery serves image-level near-dups over the `phash` column
  * (north_star: "SimHash over perceptual pHash bits").
  */
object SimHash {

  /** docs(k, text) -> (k, simhash: long). */
  def simhashes(docs: DataFrame, shingleLen: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val n = shingleLen
    docs
      .select(col("k").cast("long"), encode(col("text"), "UTF-8").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (k, b) =>
        // null text: no fingerprint (emitting a shared constant would
        // cluster every caption-less doc at Hamming distance 0)
        if (b == null) None else Some((k, Shingles.simhash64(Shingles.allHashes(b, n))))
      })
      .toDF("k", "simhash")
  }

  /** Near-dup pairs (a < b, hamming distance) at Hamming radius r. */
  def pairs(docs: DataFrame, shingleLen: Int, r: Int): DataFrame =
    Hamming.pairs(simhashes(docs, shingleLen).select(col("k").as("id"), col("simhash").as("bits")), r)
}
