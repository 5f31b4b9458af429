package graft

/** Standalone scaling-efficiency runner (BASELINE.json: throughput scaling
  * efficiency >= 0.8 between N and 4N executors; sandboxed as local[N] vs
  * local[4N] on identical input -- no real cluster here). The measurement
  * itself lives in Bench.scalingPass, which Bench.main also embeds in the
  * per-round bench JSON; this main exists for ad-hoc runs at custom levels.
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val levels = if (args.nonEmpty) args.toSeq else Seq("2", "8", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_SCALING_ROUNDS", "3").toInt
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "100000").toInt
    val fixtureBase = "/dev/shm/graft-fixtures/images_bench"

    // generate + warm the fixture (and codegen paths) once, untimed
    locally {
      val s = Bench.session(levels.last)
      try Bench.pipelinePass(s, fixtureBase, nBase) finally s.stop()
    }

    val (efficiency, _, json) = Bench.scalingPass(fixtureBase, nBase, rounds, levels)
    println(s"""{"metric":"scaling_efficiency","value":$efficiency,"unit":"ratio","detail":$json}""")
  }
}
