package graft

import org.apache.spark.sql.functions._

/** Round-6 optimization-loop measurement harness (guide §1) -- NOT the
  * driver bench: Bench.scala is frozen; this main exists so individual
  * queries can be timed/isolated/explained without running the whole
  * gated Bench. Subcommands:
  *
  *   queries [substr...]   min-of-N .count() per matching query (Bench
  *                         methodology), N from SPARK_GRAFT_EXTRA_RUNS (2)
  *   noop [substr...]      same but through the noop sink (computes every
  *                         column; guide §1.4)
  *   explain <dir> [s...]  write .explain("formatted") per matching query
  *                         to <dir>/<name>.txt
  *   pipeline [nImages]    one DedupPipeline pass (Bench.pipelinePass)
  *   jsonl [nDocs]         one JSONL workflow pass (Bench.jsonlPass)
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_EXTRA_RUNS", "2").toInt
    val cmd = args.headOption.getOrElse("queries")
    val rest = args.drop(1).toSeq
    val spark = Bench.session(cpus)

    def matching(filters: Seq[String]) =
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (n, _) => filters.isEmpty || filters.exists(n.contains) }

    cmd match {
      case "queries" | "noop" =>
        // same warmup as Bench.main
        spark.read.parquet(s"$sfDir/lineitem.parquet").count()
        SparkEntry.queries("q1_agg")(spark, sfDir).count()
        val all = matching(rest)
        var total = 0.0
        all.foreach { case (name, fn) =>
          spark.sparkContext.setJobDescription(name)
          val secs = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            if (cmd == "noop")
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            else fn(spark, sfDir).count()
            (System.nanoTime() - t0) / 1e9
          }
          total += secs.min
          println(f"[extra] $name%-28s ${secs.min}%8.3f s  (runs: ${secs.map(s => f"$s%.2f").mkString(", ")}; load1=${Bench.load1()}%.1f)")
        }
        println(f"[extra] TOTAL(min) ${total}%.2f s over ${all.size} queries")
      case "explain" =>
        val dir = rest.head
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        matching(rest.drop(1)).foreach { case (name, fn) =>
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, s"$name.txt"), plan)
          println(s"[extra] wrote $dir/$name.txt")
        }
      case "pipeline" =>
        val n = rest.headOption.map(_.toInt).getOrElse(150000)
        (1 to runs).foreach { i =>
          val l = Bench.awaitQuiet(threshold = 4.0, maxWaitSec = 240)
          val st = Bench.pipelinePass(spark, "/dev/shm/graft-fixtures/images_bench", n)
          println(f"[extra] pipeline[$i] ${st.nImages} images in ${st.sec}%.2f s = ${st.imagesPerSec}%.0f img/s = ${st.mbPerSec}%.2f MB/s (load1@start=$l%.1f)")
        }
      case "jsonlab" =>
        // pinParsed A/B over the bench-shaped workflow, load-gated
        val n = rest.headOption.map(_.toInt).getOrElse(50000)
        val inDir = s"/dev/shm/graft-fixtures/jsonl-in-$n"
        val bytes = graft.sources.JsonlGen.writeTree(spark, inDir, n)
        (1 to runs).foreach { i =>
          for (pin <- Seq(true, false)) {
            val l = Bench.awaitQuiet(threshold = 4.0, maxWaitSec = 240)
            val t0 = System.nanoTime()
            val res = JsonlDedupJob.run(spark, inDir,
              s"/dev/shm/graft-fixtures/jsonl-ab-out-$n", minLen = 500,
              mode = "annotate", compression = "gzip", pinParsed = pin)
            val files = res.written.count()
            val sec = (System.nanoTime() - t0) / 1e9
            println(f"[extra] jsonlab[$i] pin=$pin ${bytes / 1e6}%.1f MB, $files files in $sec%.2f s = ${bytes / 1e6 / sec}%.2f MB/s (load1@start=$l%.1f)")
          }
        }
      case "substrab" =>
        // verifyPrune A/B on the pipeline's caption corpus, load-gated
        val n = rest.headOption.map(_.toInt).getOrElse(150000)
        val images = graft.sources.ImagesGen.writeFixture(
          spark, s"/dev/shm/graft-fixtures/images_bench-$n-p40", n, period = 40)
        val caps = DedupPipeline.run(spark, images, DedupPipeline.Config())
          .keyed.select(col("k"), col("caption").as("text"))
          .localCheckpoint(true)
        (1 to runs).foreach { i =>
          for (prune <- Seq(false, true)) {
            val l = Bench.awaitQuiet(threshold = 4.0, maxWaitSec = 240)
            val t0 = System.nanoTime()
            val rows = operators.SubstringDedup.removeRanges(caps,
              operators.SubstringDedup.Config(32, verifyPrune = prune)).count()
            println(f"[extra] substrab[$i] prune=$prune ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$rows (load1@start=$l%.1f)")
          }
        }
      case "queryjobs" =>
        // job-level trace of one named query's execution (guide §1: find
        // which scheduled job inside a multi-job operator eats the time)
        val starts2 = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts2.put(js.jobId, (System.nanoTime(),
              Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, d) = starts2.get(je.jobId)
            println(f"[extra] job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  ${d.take(60)}")
          }
        })
        spark.read.parquet(s"$sfDir/lineitem.parquet").count()
        SparkEntry.queries("q1_agg")(spark, sfDir).count()
        matching(rest).foreach { case (name, fn) =>
          (1 to runs).foreach { i =>
            println(s"[extra] ---- $name run $i ----")
            val t0 = System.nanoTime()
            fn(spark, sfDir).count()
            println(f"[extra] $name TOTAL ${(System.nanoTime() - t0) / 1e9}%7.2f s (load1=${Bench.load1()}%.1f)")
          }
        }
      case "pipejobs" =>
        // job-level trace of DedupPipeline.run's eager part (the id map)
        val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
        spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            starts.put(js.jobId, (System.nanoTime(),
              Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
          override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val (t0, d) = starts.get(je.jobId)
            println(f"[extra] job ${je.jobId}%3d ${(System.nanoTime() - t0) / 1e9}%7.3f s  $d")
          }
        })
        val n = rest.headOption.map(_.toInt).getOrElse(150000)
        val images = graft.sources.ImagesGen.writeFixture(
          spark, s"/dev/shm/graft-fixtures/images_bench-$n-p40", n, period = 40)
        val res0 = DedupPipeline.run(spark, images, DedupPipeline.Config())
        val caps = res0.keyed.select(col("k"), col("caption").as("text"))
          .localCheckpoint(true)
        (1 to runs).foreach { i =>
          spark.sparkContext.setJobDescription(s"substr_noverify$i")
          var t0 = System.nanoTime()
          val n1 = operators.SubstringDedup.removeRanges(
            caps, operators.SubstringDedup.Config(32, verifyBytes = false)).count()
          println(f"[extra] substr_noverify[$i] ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n1")
          spark.sparkContext.setJobDescription(s"substr_verify$i")
          t0 = System.nanoTime()
          val n2 = operators.SubstringDedup.removeRanges(
            caps, operators.SubstringDedup.Config(32)).count()
          println(f"[extra] substr_verify[$i] ${(System.nanoTime() - t0) / 1e9}%7.2f s rows=$n2")
        }
      case "pipestages" =>
        // per-stage breakdown of DedupPipeline (each branch counted
        // separately; the id-map pin happens inside run())
        val n = rest.headOption.map(_.toInt).getOrElse(150000)
        val images = graft.sources.ImagesGen.writeFixture(
          spark, s"/dev/shm/graft-fixtures/images_bench-$n-p40", n, period = 40)
        def time(what: String)(f: => Long): Unit = {
          val t0 = System.nanoTime()
          val rows = f
          println(f"[extra] $what%-18s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$rows (load1=${Bench.load1()}%.1f)")
        }
        (1 to runs).foreach { i =>
          println(s"[extra] ---- pass $i ----")
          val t0 = System.nanoTime()
          val res = DedupPipeline.run(spark, images, DedupPipeline.Config())
          println(f"[extra] run() (id map)   ${(System.nanoTime() - t0) / 1e9}%7.2f s")
          time("exact_edges")(res.exactEdges.count())
          val caps = res.keyed.select(col("k"), col("caption").as("text"))
          time("substr_ranges")(operators.SubstringDedup.removeRanges(
            caps, operators.SubstringDedup.Config(32)).count())
          time("substr_noverify")(operators.SubstringDedup.removeRanges(
            caps, operators.SubstringDedup.Config(32, verifyBytes = false)).count())
          time("annotated")(res.annotated.agg(count(lit(1)),
            sum(size(col("sa_remove_ranges")))).collect()(0).getLong(0))
          time("near_edges")(res.nearEdges.count())
          time("phash_edges")(res.phashEdges.count())
          time("clusters")(res.clusters.count())
        }
      case "jsonl" =>
        val n = rest.headOption.map(_.toInt).getOrElse(50000)
        (1 to runs).foreach { i =>
          val l = Bench.awaitQuiet(threshold = 4.0, maxWaitSec = 240)
          val (b, sec, files) = Bench.jsonlPass(spark, "/dev/shm/graft-fixtures", n)
          println(f"[extra] jsonl[$i] ${b / 1e6}%.1f MB, $files files in $sec%.2f s = ${b / 1e6 / sec}%.2f MB/s (load1@start=$l%.1f)")
        }
      case other => sys.error(s"unknown subcommand $other")
    }
    spark.stop()
  }
}
