package graft
import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap
object DebugPass {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nBase = sys.env.getOrElse("SPARK_GRAFT_BENCH_IMAGES", "100000").toInt
    val spark = Bench.session(cpus)
    val byStage = TrieMap.empty[Int, (String, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val (n, ms, c) = byStage.getOrElse(t.stageId, ("", 0L, 0))
        byStage(t.stageId) = (n, ms + t.taskInfo.duration, c + 1); ()
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val (_, ms, c) = byStage.getOrElse(s.stageInfo.stageId, ("", 0L, 0))
        byStage(s.stageInfo.stageId) = (s.stageInfo.name.take(60), ms, c); ()
      }
    })
    // warm
    Bench.pipelinePass(spark, "/dev/shm/graft-fixtures/images_bench", nBase)
    byStage.clear()
    val st = Bench.pipelinePass(spark, "/dev/shm/graft-fixtures/images_bench", nBase)
    Thread.sleep(500)
    System.err.println(f"[pass] cpus=$cpus wall=${st.sec}%.2f s")
    byStage.toSeq.sortBy(-_._2._2).take(14).foreach { case (id, (n, ms, c)) =>
      System.err.println(f"[stagetime] cpus=$cpus ${ms / 1000.0}%8.1f s  tasks=$c%4d  $n")
    }
  }
}
