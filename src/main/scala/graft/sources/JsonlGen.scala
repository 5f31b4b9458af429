package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.PolyHash

/** Deterministic synthetic JSONL corpus for the like-for-like reference
  * benchmark (JSONL tree in -> substring dedup -> JSONL tree out, the
  * workflow behind the reference's ~46 MB/s single-box number,
  * README.md:6-7). Docs are a few KB of seeded words (reference corpora
  * are multi-KB documents deduped at minlen=500, aws_workflow.sh:2);
  * ~10% of docs embed a >= minLen run copied from an earlier doc, the
  * realistic post-MinHash duplication rate.
  */
object JsonlGen {

  private val words = Array(
    "data", "model", "train", "batch", "token", "shard", "merge", "index",
    "query", "range", "hash", "byte", "text", "image", "caption", "corpus",
    "dedup", "spark", "scale", "stream")

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(PolyHash.mix64(seed))(PolyHash.mix64)

  private def docText(i: Long): String = {
    val r = rng(0xd0c5L * 1000003 + i)
    val n = 400 + math.floorMod(r.next(), 400).toInt // ~2.4-4.8 KB
    val sb = new StringBuilder
    var w = 0
    while (w < n) {
      if (w > 0) sb.append(' ')
      sb.append(words(math.floorMod(r.next(), words.length).toInt))
      sb.append(math.floorMod(r.next(), 99989)) // unique-ish suffixes kill
      w += 1                                    // accidental duplication
    }
    val base = sb.toString
    if (i % 10 == 7 && i >= 10) {
      // plant: splice a long run from doc i-7 into the middle
      val donor = {
        val d = new StringBuilder; val rr = rng(0xd0c5L * 1000003 + (i - 7))
        val nn = 400 + math.floorMod(rr.next(), 400).toInt
        var ww = 0
        while (ww < nn) {
          if (ww > 0) d.append(' ')
          d.append(words(math.floorMod(rr.next(), words.length).toInt))
          d.append(math.floorMod(rr.next(), 99989))
          ww += 1
        }
        d.toString
      }
      val run = donor.substring(0, math.min(donor.length, 800))
      base.substring(0, base.length / 2) + " " + run + " " + base.substring(base.length / 2)
    } else base
  }

  /** Write nDocs JSONL docs as `files` gzip files under dir (idempotent);
    * returns total UNCOMPRESSED text bytes (the MB/s denominator).
    */
  def writeTree(spark: SparkSession, dir: String, nDocs: Int, files: Int = 96): Long = {
    import spark.implicits._
    // marker lives OUTSIDE dir: json readers with recursiveFileLookup
    // would otherwise try to parse it as a corpus file
    val marker = new java.io.File(dir + ".done")
    if (!marker.exists()) {
      val docs = spark.range(nDocs.toLong)
        .repartition(files)
        .map { i =>
          (f"part-${i % files}%04d.jsonl", i / files, docText(i), s"doc$i")
        }
        .toDF("path", "linenum", "text", "docid")
      Writeback.jsonlTree(docs, dir, compression = "gzip").collect()
      marker.getParentFile.mkdirs()
      java.nio.file.Files.writeString(marker.toPath, "ok")
    }
    import org.apache.spark.sql.functions._
    spark.read.option("recursiveFileLookup", "true").json(dir)
      .agg(sum(octet_length(encode(col("text"), "UTF-8")))).as[Long].collect()(0)
  }

  /** spark-submit entry (`--class graft.sources.JsonlGen <jar> <dir>
    * <nDocs> [files]`) so the full workflow demo -- generate, dedup,
    * writeback -- runs through `spark-submit` alone, no sbt classpath
    * (dev/spark_submit_e2e.sh).
    */
  def main(argv: Array[String]): Unit = {
    require(argv.length >= 2, "usage: <dir> <nDocs> [files]")
    val spark = SparkSession.builder().appName("graft-jsonl-gen").getOrCreate()
    val bytes = writeTree(spark, argv(0), argv(1).toInt,
      if (argv.length > 2) argv(2).toInt else 96)
    System.err.println(s"[graft] generated ${argv(1)} docs / $bytes text bytes under ${argv(0)}")
    spark.stop()
  }
}
