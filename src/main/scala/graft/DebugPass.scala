package graft
import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup

/** Scratch phase-breakdown of the JSONL workflow (not library surface):
  * where do the seconds go in read -> windows -> dedup -> writeback.
  */
object DebugPass {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_JSONL_DOCS", "80000").toInt
    val spark = Bench.session(cpus)
    val inDir = s"/dev/shm/graft-fixtures/jsonl-in-$nDocs"
    val bytes = graft.sources.JsonlGen.writeTree(spark, inDir, nDocs)
    System.err.println(f"[v] corpus ${bytes / 1e6}%.1f MB")
    // SPARK_GRAFT_DEBUG_ONLY=substr1,substr2 runs only matching stages
    val only = sys.env.get("SPARK_GRAFT_DEBUG_ONLY").map(_.split(",").toSeq)
    def time(name: String)(f: => Long): Unit =
      if (only.forall(_.exists(name.contains))) {
        val t0 = System.nanoTime()
        val n = f
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[v] $name%-22s $sec%7.2f s  rows=$n  (${bytes / 1e6 / sec}%.1f MB/s)")
      }
    time("read_only")(JsonlDedupJob.readTree(spark, inDir).count())
    val codec = sys.env.getOrElse("SPARK_GRAFT_JSONL_CODEC", "gzip")
    time(s"workflow_full[$codec]") {
      JsonlDedupJob.run(spark, inDir, s"/dev/shm/graft-fixtures/jsonl-dbg-out-$nDocs",
        minLen = 500, mode = "annotate", compression = codec).written.count()
    }
    val parsed = JsonlDedupJob.readTree(spark, inDir)
      .select(col("k"), col("text")).localCheckpoint(true)
    System.err.println(s"[v] docs=${parsed.count()}")
    time("ranges_verify_on")(SubstringDedup.removeRanges(parsed, SubstringDedup.Config(500)).count())
    time("ranges_verify_off")(SubstringDedup.removeRanges(parsed, SubstringDedup.Config(500, verifyBytes = false)).count())
    time("ranges_hybrid_on")(SubstringDedup.removeRangesHybrid(parsed, SubstringDedup.Config(500)).count())
    time("ranges_hybrid_off")(SubstringDedup.removeRangesHybrid(parsed, SubstringDedup.Config(500, verifyBytes = false)).count())
    time("ranges_adaptive")(SubstringDedup.removeRangesAdaptive(parsed, SubstringDedup.Config(500)).count())
    time("removable_only")(SubstringDedup.removablePositionsSortScan(parsed, 500).count())
    time("windows_only")(SubstringDedup.windows(parsed, 500).count())
    spark.stop()
  }
}
