package graft

import org.apache.spark.sql.SparkSession

/** spark-submit entry point for the reference workflow -- what a user of
  * the reference's aws_workflow.sh runs instead of its index ->
  * find_remove_ranges -> write_back chain:
  *
  *   spark-submit --class graft.JsonlDedupCli <jar> \
  *     <inDir> <outDir> [--minlen 500] [--mode annotate|remove] \
  *     [--compression gzip|zstd|none] [--stage-dir <dir>] \
  *     [--unit bytes|tokens|ids] [--reversed]
  *
  * Master/executors come from spark-submit (the same binary runs at any
  * cluster size -- the N vs 4N scaling contract); --stage-dir enables the
  * remove_ranges snapshot + metrics, the workflow's crash-resume point;
  * --unit tokens counts minlen in whitespace tokens (reference C2);
  * --unit ids consumes pre-tokenized `tokens: array<int>` records (the
  * reference's production shape); --reversed (tokens/ids) scans the
  * mirrored stream.
  */
object JsonlDedupCli {

  private case class Args(inDir: String, outDir: String, minLen: Int = 500,
                          mode: String = "annotate", compression: String = "gzip",
                          stageDir: Option[String] = None,
                          unit: String = "bytes", reversed: Boolean = false)

  private def parse(argv: List[String]): Args = {
    def loop(a: Args, rest: List[String]): Args = rest match {
      case Nil => a
      case "--minlen" :: v :: t => loop(a.copy(minLen = v.toInt), t)
      case "--mode" :: v :: t => loop(a.copy(mode = v), t)
      case "--compression" :: v :: t => loop(a.copy(compression = v), t)
      case "--stage-dir" :: v :: t => loop(a.copy(stageDir = Some(v)), t)
      case "--unit" :: v :: t => loop(a.copy(unit = v), t)
      case "--reversed" :: t => loop(a.copy(reversed = true), t)
      case x :: _ => throw new IllegalArgumentException(s"unknown argument: $x")
    }
    argv match {
      case in :: out :: rest => loop(Args(in, out), rest)
      case _ => throw new IllegalArgumentException(
        "usage: <inDir> <outDir> [--minlen N] [--mode annotate|remove] [--compression gzip[:1-9]|zstd[:lvl]|none] [--stage-dir DIR] [--unit bytes|tokens|ids] [--reversed]")
    }
  }

  def main(argv: Array[String]): Unit = {
    val args = parse(argv.toList)
    val spark = SparkSession.builder().appName("graft-jsonl-dedup").getOrCreate()
    val res = JsonlDedupJob.run(spark, args.inDir, args.outDir,
      args.minLen, args.mode, args.compression, args.stageDir,
      args.unit, args.reversed)
    val files = res.written.count()
    System.err.println(s"[graft] wrote $files files to ${args.outDir} (mode=${args.mode}, minlen=${args.minLen}, unit=${args.unit})")
    spark.stop()
  }
}
