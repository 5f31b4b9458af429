package graft

import org.apache.spark.sql.SparkSession
import graft.sources.ImagesGen

/** Per-round benchmark: every SparkEntry query on SPARK_GRAFT_SF_DIR plus
  * the end-to-end images dedup pipeline (images/sec). Prints ONE JSON line.
  */
object Bench {

  def session(cpus: String): SparkSession = {
    // Shuffle/spill/checkpoint blocks on tmpfs: the sandbox disk has
    // erratic write latency that stalls executor threads (observed: same
    // stage 1.3 s vs 21 s run-to-run); production clusters get this from
    // multiple spark.local.dir volumes (reference: --num_volumes striping,
    // aws_workflow.sh:22-39).
    val localDir = "/dev/shm/spark-local"
    new java.io.File(localDir).mkdirs()
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // let AQE flip SMJ -> broadcast for mid-sized build sides (the
      // duplicated-window-hash set); plenty of driver heap for it.
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "128m")
      .config("spark.sql.autoBroadcastJoinThreshold", "64m")
      .config("spark.local.dir", localDir)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One timed pipeline pass; returns (nImages, seconds). The fixture dir
    * is keyed by nBase so differently-sized runs never reuse a stale cache.
    * Stages snapshot to a fresh tmpfs dir (wiped first -- a stale dir would
    * resume instead of compute): each stage is scanned once by its
    * consumers instead of recomputed per branch, exactly like the
    * reference's file IRs.
    */
  def pipelinePass(spark: SparkSession, fixtureBase: String, nBase: Int): (Long, Double) = {
    // period=40: ~10% planted duplicates, a realistic post-MinHash rate.
    val images = ImagesGen.writeFixture(spark, s"$fixtureBase-$nBase-p40", nBase, period = 40)
    val n = images.count()
    val t0 = System.nanoTime()
    val res = DedupPipeline.run(spark, images, DedupPipeline.Config())
    val clusters = res.clusters.count()
    // aggregate over sa_remove_ranges so the substring-dedup branch is
    // actually executed -- a bare count() lets Catalyst eliminate the
    // ranges join entirely (left join on aggregated key, no columns used).
    val annRow = res.annotated.agg(
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
      org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.size(
          org.apache.spark.sql.functions.col("sa_remove_ranges")))).collect()(0)
    val annotated = annRow.getLong(0)
    require(clusters == n && annotated == n, s"pipeline row fidelity: $clusters/$annotated vs $n")
    (n, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "12000").toInt
    val spark = session(cpus)

    // untimed warmup: pay session/codegen/parquet-footer costs outside the
    // first measured query.
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    SparkEntry.queries("q1_agg")(spark, sfDir).count()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-28s $sec%8.2f s")
      name -> sec
    }

    val (nImages, pipeSec) = pipelinePass(spark,
      "/root/repo/target/fixtures/images_bench", nBase)
    val imagesPerSec = nImages / pipeSec
    System.err.println(f"[bench] pipeline: $nImages images in $pipeSec%.2f s = $imagesPerSec%.0f images/s")

    val qs = (results :+ ("images_pipeline" -> pipeSec))
      .map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + pipeSec
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","images_per_sec":$imagesPerSec,"n_images":$nImages}""")
    spark.stop()
  }
}
