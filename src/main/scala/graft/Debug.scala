package graft

import org.apache.spark.sql.functions._
import graft.functions.StableIds
import graft.operators._

/** Scratch diagnostics (not part of the library surface). */
object Debug {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val images = spark.read.parquet("/root/repo/target/fixtures/images_bench-12000")
    def p(s: String) = System.err.println("[debug] " + s)
    p(s"images=${images.count()} distinct=${images.select("image_id").distinct().count()}")

    val keyed = StableIds.assign(images, "image_id", "k")
    p(s"keyed=${keyed.count()} distinct_k=${keyed.select("k").distinct().count()}")
    // stability across actions: two independent materializations must agree
    val m1 = keyed.select("image_id", "k")
    val m2 = StableIds.assign(images, "image_id", "k").select(col("image_id"), col("k").as("k2"))
    p(s"id_mismatch=${m1.join(m2, "image_id").where(col("k") =!= col("k2")).count()}")

    val exactEdges = ExactDedup.flag(
      keyed.withColumn("content", concat(sha2(col("bytes"), 256), col("caption"))), "content")
      .where(col("is_dup")).select(col("keeper").as("a"), col("k").as("b"))
    val nearEdges = MinHashLSH.verifiedPairs(
      keyed.select(col("k"), col("caption").as("text")),
      MinHashLSH.Config(shingleLen = 3, wordShingles = true), 0.6)
    val phashEdges = Hamming.pairs(
      keyed.select(col("k").as("id"), col("phash").as("bits")), 4)
    p(s"exact=${exactEdges.count()} near=${nearEdges.count()} phash=${phashEdges.count()}")

    val edges = exactEdges.select("a", "b")
      .unionAll(nearEdges.select("a", "b"))
      .unionAll(phashEdges.select("a", "b"))
    val assigned = ConnectedComponents.run(edges)
    p(s"assigned=${assigned.count()} distinct_id=${assigned.select("id").distinct().count()}")
    val full = ConnectedComponents.assign(keyed.select(col("k").as("id")), edges)
    p(s"full=${full.count()} distinct=${full.select("id").distinct().count()}")
    spark.stop()
  }
}
