package graft
import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup
object DebugPass {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_JSONL_DOCS", "80000").toInt
    val spark = Bench.session(cpus)
    val inDir = s"/dev/shm/graft-fixtures/jsonl-in-$nDocs"
    graft.sources.JsonlGen.writeTree(spark, inDir, nDocs)
    val parsed = JsonlDedupJob.readTree(spark, inDir)
      .select(monotonically_increasing_id().as("k"), col("text")).localCheckpoint(true)
    System.err.println(s"[v] docs=${parsed.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      System.err.println(f"[v] $name%-22s ${(System.nanoTime()-t0)/1e9}%7.2f s  rows=$n")
    }
    time("ranges_verify_on")(SubstringDedup.removeRanges(parsed, SubstringDedup.Config(500)).count())
    time("ranges_verify_off")(SubstringDedup.removeRanges(parsed, SubstringDedup.Config(500, verifyBytes = false)).count())
    time("removable_only")(SubstringDedup.removablePositionsSortScan(parsed, 500).count())
    time("windows_only")(SubstringDedup.windows(parsed, 500).count())
    spark.stop()
  }
}
