package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.GZIPOutputStream
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** End-to-end reference-workflow test: JSONL tree in -> substring dedup ->
  * mirrored JSONL tree out, both modes, with the reference's own checks
  * (line-count equality per file, verify_zst.py:20-43; non-dup docs
  * byte-identical; metadata passthrough).
  */
class JsonlDedupJobSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val run = "qwertyuiopasdfghjklzxcvbnm0123456789QWERTY" // 42 bytes >= minLen 32

  private def writeGz(p: Path, lines: Seq[String]): Unit = {
    Files.createDirectories(p.getParent)
    val os = new GZIPOutputStream(Files.newOutputStream(p))
    os.write(lines.map(_ + "\n").mkString.getBytes(StandardCharsets.UTF_8))
    os.close()
  }

  private def writePlain(p: Path, lines: Seq[String]): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, lines.map(_ + "\n").mkString)
  }

  private def mkTree(): String = {
    val root = Files.createTempDirectory("graft_jsonl_in")
    writeGz(root.resolve("crawl=a/part0.jsonl.gz"), Seq(
      s"""{"text": "the original $run lives here first", "meta": "m0"}""",
      """{"text": "totally unrelated content with no duplicate run", "meta": "m1"}"""))
    writePlain(root.resolve("b/part1.jsonl"), Seq(
      s"""{"text": "a later copy $run appears again", "meta": "m2"}""",
      """{"text": "short", "meta": "m3"}"""))
    root.toString
  }

  test("annotate mode: mirrored tree, line counts equal, dup copy annotated, metadata passes through") {
    val in = mkTree()
    val out = Files.createTempDirectory("graft_jsonl_out").toString
    val res = JsonlDedupJob.run(spark, in, out, minLen = 32, mode = "annotate", compression = "gzip")
    val files = res.written.as[(String, Long)].collect().toMap
    assert(files == Map("crawl=a/part0.jsonl" -> 2L, "b/part1.jsonl" -> 2L))
    // gzip out + gzip in -> the tree mirrors exactly
    assert(Files.exists(Paths.get(out, "crawl=a", "part0.jsonl.gz")))
    assert(Files.exists(Paths.get(out, "b", "part1.jsonl.gz")))

    val back = spark.read.option("recursiveFileLookup", "true").json(out)
    assert(back.count() == 4)
    // metadata passthrough, all docs present
    assert(back.select("meta").as[String].collect().toSet == Set("m0", "m1", "m2", "m3"))
    // only the later copy (file b sorts after crawl=a? no -- "b/..." < "crawl=a/...",
    // so the b/part1 copy is FIRST in (path, linenum) order and crawl=a's is annotated)
    val annotated = back.where(size(col("sa_remove_ranges")) > 0)
      .select("meta").as[String].collect().toSet
    assert(annotated == Set("m0"), s"got $annotated")
  }

  test("remove mode: duplicated span cut, non-dup docs byte-identical, counts preserved") {
    val in = mkTree()
    val out = Files.createTempDirectory("graft_jsonl_out2").toString
    JsonlDedupJob.run(spark, in, out, minLen = 32, mode = "remove", compression = "none")
      .written.collect()

    val back = spark.read.option("recursiveFileLookup", "true").json(out)
      .select("meta", "text").as[(String, String)].collect().toMap
    assert(back.size == 4)
    // first occurrence (b/part1 line 0 in path order) intact
    assert(back("m2") == s"a later copy $run appears again")
    // non-dup docs byte-identical
    assert(back("m1") == "totally unrelated content with no duplicate run")
    assert(back("m3") == "short")
    // the later copy lost (at least) the shared run
    assert(!back("m0").contains(run))
    assert(back("m0").length < s"the original $run lives here first".length)
  }
}
