package graft

import graft.operators.{SubstringDedup, SuffixIndex}

/** Ad-hoc timing for the `sa_index_remove_ranges` fidelity path: builds
  * the prefix-doubling suffix index over the driver query's own fixture
  * (docsWithDups at a given sf dir) and answers remove-ranges at
  * SparkEntry.MinLen, timing build and query separately, with a
  * differential against the default sort-scan. Used to record the
  * index-path cost in BASELINE.md without running the whole bench.
  *
  * Usage: runMain graft.SaBench [sfDir] [maxDepth]
  */
object SaBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxDepth = if (args.length > 1) args(1).toInt else 32
    val spark = Bench.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    def timed[A](what: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[sabench] $what%-32s $sec%8.2f s")
      (a, sec)
    }
    val docs = SparkEntry.docsWithDups(spark, sfDir).localCheckpoint(true)
    // untimed warmup: pay codegen/JIT on a slice
    SuffixIndex.removeRanges(
      SuffixIndex.build(docs.limit(50), SuffixIndex.Config(maxDepth, parts = 4)),
      SparkEntry.MinLen).count()
    val (index, buildSec) = timed(s"build maxDepth=$maxDepth") {
      SuffixIndex.build(docs, SuffixIndex.Config(maxDepth, parts = 32))
        .localCheckpoint(true)
    }
    val (nRanges, querySec) = timed(s"query minLen=${SparkEntry.MinLen}") {
      SuffixIndex.removeRanges(index, SparkEntry.MinLen).count()
    }
    val (_, e2eSec) = timed("end-to-end (build+query, as the driver runs it)") {
      SuffixIndex.removeRanges(
        SuffixIndex.build(docs, SuffixIndex.Config(maxDepth, parts = 32)),
        SparkEntry.MinLen).count()
    }
    val a = SuffixIndex.removeRanges(index, SparkEntry.MinLen)
    val b = SubstringDedup.removeRanges(docs, SubstringDedup.Config(SparkEntry.MinLen))
    val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    require(diff == 0, s"index vs sort-scan differential: $diff rows differ")
    System.err.println("[sabench] differential vs sort-scan: identical")
    println(f"""{"metric":"sa_bench","sf":"$sfDir","max_depth":$maxDepth,"build_sec":$buildSec%.2f,"query_sec":$querySec%.2f,"e2e_sec":$e2eSec%.2f,"ranges":$nRanges,"differential":"identical"}""")
    spark.stop()
  }
}
