package graft
object DebugPass {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Bench.session(cpus)
    SparkEntry.queries("q1_agg")(spark, sfDir).count() // warm
    for (r <- 1 to 3; q <- Seq("a1_remove_ranges", "a2_remove_ranges_sortscan", "e4_kept_middle_hist", "a6_dup_ptrs")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).count()
      System.err.println(f"[q] $q%-28s run$r ${(System.nanoTime()-t0)/1e9}%6.2f s rows=$n")
    }
    spark.stop()
  }
}
