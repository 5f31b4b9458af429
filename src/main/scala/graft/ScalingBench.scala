package graft

/** Scaling-efficiency evidence (BASELINE.json: throughput scaling
  * efficiency >= 0.8 between N and 4N executors; sandboxed as local[N]
  * vs local[4N] on identical input -- no real cluster here).
  *
  * Runs the full images dedup pipeline at each parallelism level in one
  * JVM (sequential sessions), reports throughput per level and the
  * efficiency  (t_N / t_4N) / 4  between the first and last level.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.toSeq else Seq("8", "32")
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "12000").toInt
    val fixtureDir = "/root/repo/target/fixtures/images_bench"

    val results = levels.map { cpus =>
      val spark = Bench.session(cpus)
      // warmup pass (fixture write on first ever run + codegen), then timed
      Bench.pipelinePass(spark, fixtureDir, nBase)
      val (n, sec) = Bench.pipelinePass(spark, fixtureDir, nBase)
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      System.err.println(f"[scaling] local[$cpus]: $n images in $sec%.2f s = ${n / sec}%.0f images/s")
      (cpus, n, sec)
    }
    val (c0, n0, t0) = results.head
    val (c1, _, t1) = results.last
    val ratio = c1.toDouble / c0.toDouble
    val efficiency = (t0 / t1) / ratio
    val lvls = results.map { case (c, n, t) =>
      s"""{"cpus":$c,"sec":$t,"images_per_sec":${n / t}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"scaling_efficiency","value":$efficiency,"unit":"ratio","levels":$lvls,"core_ratio":$ratio}""")
  }
}
