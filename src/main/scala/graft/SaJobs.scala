package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Scratch: per-Spark-job timing of the sa_index_remove_ranges path, to
  * see where the wall-clock goes (scheduling/materialization vs shuffle).
  */
object SaJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts.put(js.jobId, (System.nanoTime(),
          Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, d) = starts.get(je.jobId)
        System.err.println(f"[jobs] job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
      }
    })
    val docs = SparkEntry.docsWithDups(spark, sfDir)
    // warmup
    operators.SuffixIndex.removeRanges(
      operators.SuffixIndex.build(docs.limit(50), operators.SuffixIndex.Config(32, parts = 4)), 32).count()
    System.err.println("[jobs] ---- measured e2e run ----")
    val t0 = System.nanoTime()
    spark.sparkContext.setJobDescription("build")
    val idx = operators.SuffixIndex.build(docs, operators.SuffixIndex.Config(maxDepth = 32, parts = 32))
    val tb = System.nanoTime()
    spark.sparkContext.setJobDescription("query")
    val n = operators.SuffixIndex.removeRanges(idx, 32).count()
    System.err.println(f"[jobs] build ${(tb - t0) / 1e9}%.2f s, query ${(System.nanoTime() - tb) / 1e9}%.2f s, ranges=$n")
    spark.stop()
  }
}
