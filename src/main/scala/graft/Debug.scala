package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.StableIds
import graft.operators._
import graft.sources.ImagesGen

/** Scratch diagnostics (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "50000").toInt
    val spark = Bench.session(cpus)
    val images = ImagesGen.writeFixture(spark,
      s"/root/repo/target/fixtures/images_bench-$nBase", nBase)
    images.count()

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[stage] cpus=$cpus $name%-16s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val cfg = DedupPipeline.Config()
    val keyed = StableIds.assign(images, "image_id", "k").localCheckpoint(true)
    keyed.count()
    val docs = keyed.select(col("k"), col("caption").as("text")).localCheckpoint(true)
    docs.count()
    time("signatures")(MinHashLSH.signatures(docs, cfg.minhash).count())
    time("bandTable")(MinHashLSH.bandTable(docs, cfg.minhash).count())
    time("bandTable2")(MinHashLSH.bandTable(docs, cfg.minhash).count())
    spark.stop()
  }
}
