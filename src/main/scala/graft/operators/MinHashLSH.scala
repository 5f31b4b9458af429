package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.{PolyHash, Shingles}

/** MinHash signatures + LSH banding for near-duplicate candidate
  * generation (the stage the reference corpus had already been through
  * upstream -- README.md:17 `minhash/param_26_11` -- and which the
  * north_rule requires natively).
  *
  * Scale shape:
  *  - signatures are computed PER DOC inside mapPartitions (the shingle
  *    set of a row is local), so the only shuffle in the whole operator is
  *    the band-bucket self-join;
  *  - each doc emits exactly `bands` rows of (band, band_hash) -- 20 B/row
  *    regardless of numHashes -- so the join input is tiny relative to the
  *    corpus;
  *  - the band self-join is an equi-join on (band, band_hash): AQE
  *    skew-join splits viral buckets (empty-doc or boilerplate signatures),
  *    and `maxBucketSize` drops degenerate buckets entirely (a bucket with
  *    thousands of members is boilerplate, not near-duplication -- same
  *    rationale as NgramJaccard's stop-shingle cap).
  */
object MinHashLSH {

  case class Config(
      shingleLen: Int = 5,
      numHashes: Int = 128,
      bands: Int = 32,
      maxBucketSize: Long = 10000) {
    require(numHashes % bands == 0, "bands must divide numHashes")
    def rowsPerBand: Int = numHashes / bands
  }

  /** docs(k, text) -> (k, sig: array<long>) one row per doc, no shuffle. */
  def signatures(docs: DataFrame, cfg: Config): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val seeds = Shingles.seeds(cfg.numHashes)
    val n = cfg.shingleLen
    docs
      .select(col("k").cast("long"), encode(col("text"), "UTF-8").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (k, b) =>
          (k, Shingles.minhashSignature(Shingles.distinctHashes(b, n), seeds))
        }
      }
      .toDF("k", "sig")
  }

  /** (k, band, band_hash): one row per doc per band; band_hash folds the
    * band's signature rows with mix64 chaining.
    */
  def bandTable(docs: DataFrame, cfg: Config): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val seeds = Shingles.seeds(cfg.numHashes)
    val (n, bands, rows) = (cfg.shingleLen, cfg.bands, cfg.rowsPerBand)
    docs
      .select(col("k").cast("long"), encode(col("text"), "UTF-8").as("b"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (k, b) =>
          val sig = Shingles.minhashSignature(Shingles.distinctHashes(b, n), seeds)
          Iterator.range(0, bands).map { bi =>
            var h = 0x6a0917b1L + bi
            var r = 0
            while (r < rows) { h = PolyHash.mix64(h ^ sig(bi * rows + r)); r += 1 }
            (k, bi, h)
          }
        }
      }
      .toDF("k", "band", "band_hash")
  }

  /** Candidate pairs (a < b): docs sharing at least one band bucket. */
  def candidatePairs(docs: DataFrame, cfg: Config): DataFrame = {
    val bt = bandTable(docs, cfg)
    val pruned =
      if (cfg.maxBucketSize == Long.MaxValue) bt
      else {
        val hot = bt.groupBy("band", "band_hash").agg(count(lit(1)).as("n"))
          .where(col("n") > cfg.maxBucketSize).select("band", "band_hash")
        bt.join(hot, Seq("band", "band_hash"), "left_anti")
      }
    pruned.select(col("band"), col("band_hash"), col("k").as("a"))
      .join(pruned.select(col("band"), col("band_hash"), col("k").as("b")),
        Seq("band", "band_hash"))
      .where(col("a") < col("b"))
      .select("a", "b")
      .distinct()
  }

  /** Candidates re-verified with EXACT shingle Jaccard >= threshold.
    * Output (a, b, jacc) -- the LSH-accelerated version of
    * NgramJaccard.pairs: same result set minus LSH false negatives
    * (recall is tuned by bands/rows; tests assert >= 0.99 on fixtures).
    */
  def verifiedPairs(docs: DataFrame, cfg: Config, threshold: Double): DataFrame = {
    val cand = candidatePairs(docs, cfg)
    val sh = NgramJaccard.shingleTable(docs, cfg.shingleLen)
    val sizes = sh.groupBy("k").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("k").as("a"), col("sh")), "a")
      .join(sh.select(col("k").as("b"), col("sh")), Seq("b", "sh"))
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
