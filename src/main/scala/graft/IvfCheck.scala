package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Ad-hoc IVF scale check: runs ivfTopKInt at a CONFIGURABLE nCells
  * (the oracle query pins nCells=64 to keep the driver's unrolled-CTE
  * SQL tractable; production sizing is nCells ~ sqrt(N), so this main
  * verifies the distributed trainer + broadcast-centroid path at larger
  * cell counts against the same generated DuckDB oracle).
  *
  * Usage: runMain graft.IvfCheck [sfDir] [nCells] [outDir]
  * Then:  python3 dev/compare.py <sfDir> <outDir>
  */
object IvfCheck {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val nCells = if (args.length > 1) args(1).toInt else 512
    val outDir = if (args.length > 2) args(2) else "/tmp/ivf_check"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val name = s"ann_ivf_topk_c$nCells"
    val vecs = SparkEntry.intVecs(spark, sfDir)
    val t0 = System.nanoTime()
    operators.AnnCosine.ivfTopKInt(
      vecs.where(col("id") < 5).select(col("id").as("qid"), col("vec")),
      vecs.select(col("id"), col("vec")),
      10, nCells = nCells, nProbe = 4, rounds = 2)
      .select("qid", "id", "rn")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    System.err.println(f"[ivf-check] nCells=$nCells query ran in ${(System.nanoTime() - t0) / 1e9}%.2f s")

    val sql = OracleSqlGen.ivfTopKSql(5, SparkEntry.AnnDim, nCells, 4, 10, rounds = 2)
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"{${q(name)}: ${q(sql)}}")
    spark.stop()
  }
}
