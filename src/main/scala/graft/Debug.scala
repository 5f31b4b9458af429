package graft

import org.apache.spark.sql.functions._
import graft.functions.StableIds
import graft.operators._
import graft.sources.ImagesGen

/** Scratch diagnostics (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "50000").toInt
    val spark = Bench.session(cpus)
    val images = ImagesGen.writeFixture(spark,
      s"/dev/shm/graft-fixtures/images_bench-$nBase-p40", nBase, period = 40)
    images.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[stage] cpus=$cpus $name%-10s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val cfg = DedupPipeline.Config()
    var keyed: org.apache.spark.sql.DataFrame = null
    time("keyed") {
      keyed = images.join(broadcast(StableIds.idMap(images, "image_id", "k")), Seq("image_id"))
      keyed.count()
    }
    time("exact")(ExactDedup.flag(
      keyed.withColumn("content", concat(sha2(col("bytes"), 256), col("caption"))), "content")
      .where(col("is_dup")).count())
    time("annotate")(SubstringDedup.annotate(
      keyed.select(col("k"), col("caption").as("text")), SubstringDedup.Config(cfg.minLen))
      .agg(count(lit(1)), sum(size(col("sa_remove_ranges")))).collect()(0).getLong(0))
    time("near")(MinHashLSH.verifiedPairs(
      keyed.select(col("k"), col("caption").as("text")), cfg.minhash, cfg.jaccThreshold).count())
    time("phash")(Hamming.pairs(
      keyed.select(col("k").as("id"), col("phash").as("bits")), cfg.hammingRadius).count())
    time("phash_flat")(Hamming.pairsFlat(
      keyed.select(col("k").as("id"), col("phash").as("bits")), cfg.hammingRadius).count())
    time("phash_2lvl")(Hamming.pairsTwoLevel(
      keyed.select(col("k").as("id"), col("phash").as("bits")), cfg.hammingRadius).count())
    // winnow O(len) check: the deque form must be ~w-independent
    for (w <- Seq(4, 64))
      time(s"winnow_w$w")(TextStats.winnowFingerprints(
        keyed.select(col("k"), col("caption").as("text")), 8, w).count())
    time("full")(DedupPipeline.run(spark, images, cfg).clusters.count())
    spark.stop()
  }
}
