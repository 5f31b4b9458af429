package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.StableIds
import graft.operators.SubstringDedup
import graft.sources.Writeback

/** The reference's end-to-end workflow as one Spark job: read a JSONL
  * corpus tree, remove duplicated substrings from `text`, write the
  * corpus back as a mirrored JSONL tree -- the equivalent of
  * aws_workflow.sh's index -> find_remove_ranges -> write_back chain
  * (README.md:23-30) for a user switching from the reference.
  *
  *  - input: any JSONL tree readable by spark.read.json (.gz/.zst/plain);
  *    each document must carry a `text` field; all other fields are
  *    passed through verbatim (write_back_to_jsonl_sharded.py:100
  *    `{**item, **meta}`).
  *  - document order: (file path, line number) defines the stable global
  *    first-occurrence order, exactly the reference's sorted-path x
  *    linenum order (indexing_v6_sharded.py:179-189). Files are read
  *    whole (one task per file -- the reference's worker-per-shard unit)
  *    so line numbers are exact.
  *  - mode "annotate": adds `sa_remove_ranges` (UTF-8-clipped [s,e) byte
  *    offsets, README.md:109-113); mode "remove": rewrites `text` with
  *    duplicated spans cut out (write_back_to_jsonl_sharded.py:89-94).
  *  - output: one file per input file, same relative path, original line
  *    order, chosen compression.
  */
object JsonlDedupJob {

  case class Result(docs: DataFrame, written: DataFrame)

  /** Parsed lines with exact (path, linenum): files are read whole and
    * split -- empty trailing lines dropped (indexing_v6_sharded.py:21-39).
    */
  def readTree(spark: SparkSession, inDir: String): DataFrame = {
    val schema = spark.read
      .option("recursiveFileLookup", "true").json(inDir).schema
    require(schema.fieldNames.contains("text"), "JSONL docs must carry a `text` field")
    // input_file_name() yields a URI (file:///abs/...); normalize the
    // scheme + slashes away, then strip the absolute input dir.
    val absDir = new java.io.File(inDir).getAbsolutePath
    spark.read.option("wholetext", "true").option("recursiveFileLookup", "true")
      .textFile(inDir).toDF("whole")
      .select(input_file_name().as("abs"), col("whole"))
      .select(
        regexp_replace(
          regexp_replace(col("abs"), "^[a-zA-Z0-9+.-]+:/+", "/"),
          "^" + java.util.regex.Pattern.quote(absDir + "/"), "").as("path"),
        posexplode(split(col("whole"), "\n")).as(Seq("linenum", "line")))
      .where(length(trim(col("line"))) > 0)
      .select(col("path"), col("linenum").cast("long"), from_json(col("line"), schema).as("j"))
      .select(col("path"), col("linenum"), col("j.*"))
  }

  def run(spark: SparkSession, inDir: String, outDir: String,
          minLen: Int, mode: String = "annotate",
          compression: String = "gzip"): Result = {
    require(mode == "annotate" || mode == "remove", s"unknown mode $mode")
    // strip the input's compression extension: the sink appends the one
    // matching the CHOSEN output compression, so the tree mirrors exactly
    // when in/out codecs agree and stays honest when they differ
    val parsed = readTree(spark, inDir)
      .withColumn("path", regexp_replace(col("path"), "\\.(gz|zst)$", ""))

    // dense stable ids in (path, linenum) order -- the reference's global
    // document order; the narrow map is pinned, the payload joins lazily
    val ordered = parsed.withColumn("_ord",
      concat(col("path"), lit("\u0000"), format_string("%019d", col("linenum"))))
    val keyed = ordered.join(
      broadcast(StableIds.idMap(ordered, "_ord", "k")), Seq("_ord")).drop("_ord")

    val out = mode match {
      case "annotate" =>
        SubstringDedup.annotate(keyed, SubstringDedup.Config(minLen))
      case "remove" =>
        SubstringDedup.remove(keyed, SubstringDedup.Config(minLen))
          .drop("text", "sa_remove_ranges")
          .withColumnRenamed("text_deduped", "text")
    }
    val written = Writeback.jsonlTree(out.drop("k"), outDir, compression = compression)
    Result(out, written)
  }
}
