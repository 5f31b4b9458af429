package graft

/** Scaling-efficiency evidence (BASELINE.json: throughput scaling
  * efficiency >= 0.8 between N and 4N executors; sandboxed as local[N]
  * vs local[4N] on identical input -- no real cluster here).
  *
  * The sandbox host has heavy noisy-neighbor variance (identical stages
  * measured 1.3 s to 21 s across runs), so each level is measured
  * `rounds` times with the levels INTERLEAVED (N, 4N, N, 4N, ...) and the
  * per-level MINIMUM taken -- min is the standard low-noise estimator for
  * shared-host timing.
  *
  * Efficiency = (t_N / t_4N) / (4N / N).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.toSeq else Seq("8", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALING_ROUNDS", "3").toInt
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "50000").toInt
    val fixtureBase = "/root/repo/target/fixtures/images_bench"

    // generate + warm the fixture once
    locally {
      val s = Bench.session(levels.last)
      Bench.pipelinePass(s, fixtureBase, nBase) // also warms codegen paths
      s.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }

    val times = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    var n = 0L
    for (r <- 1 to rounds; cpus <- levels) {
      val spark = Bench.session(cpus)
      val (ni, sec) = Bench.pipelinePass(spark, fixtureBase, nBase)
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      n = ni
      times(cpus) = sec :: times(cpus)
      System.err.println(f"[scaling] round $r local[$cpus]: $ni images in $sec%.2f s = ${ni / sec}%.0f images/s")
    }

    val best = levels.map(c => (c, times(c).min))
    val (c0, t0) = best.head
    val (c1, t1) = best.last
    val ratio = c1.toDouble / c0.toDouble
    val efficiency = (t0 / t1) / ratio
    val lvls = best.map { case (c, t) =>
      s"""{"cpus":$c,"sec":$t,"images_per_sec":${n / t},"all_runs":${times(c).reverse.mkString("[", ",", "]")}}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"scaling_efficiency","value":$efficiency,"unit":"ratio","levels":$lvls,"core_ratio":$ratio,"n_images":$n}""")
  }
}
