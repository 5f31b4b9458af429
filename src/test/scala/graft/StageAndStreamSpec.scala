package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.Stage
import graft.streaming.EventStream

class StageAndStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("stage snapshot: computed once, resumed from parquet, metrics written") {
    val dir = Files.createTempDirectory("graft_stage").toString
    val stage = new Stage(spark, dir)
    var computes = 0
    def body = { computes += 1; Seq((1L, "a"), (2L, "b")).toDF("k", "v") }
    val first = stage.run("s1")(body)
    assert(first.count() == 2 && computes == 1)
    val second = stage.run("s1")(body)
    assert(second.count() == 2 && computes == 1, "must resume, not recompute")
    val m = stage.metrics
    assert(m.where($"stage" === "s1").agg(sum($"rows_out")).as[Long].collect()(0) == 2)
    assert(m.columns.toSet ==
      Set("stage", "partition", "rows_in", "rows_out", "bytes_removed", "wall_ms"))
    // rows_in passthrough + bytes_removed derived from [s, e) snapshots
    stage.run("s2", rowsIn = 7L)(Seq((1L, 10L, 25L), (2L, 0L, 4L)).toDF("k", "s", "e"))
    val m2 = stage.metrics.where($"stage" === "s2")
      .agg(sum($"bytes_removed"), max($"rows_in")).as[(Long, Long)].collect()(0)
    assert(m2 == ((19L, 7L)))
  }

  test("streaming dedup keeps exactly one row per key, keys match batch") {
    val src = Files.createTempDirectory("graft_sdedup").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)
    val q = EventStream.streamingDedup(spark, src)
      .writeStream.format("memory").queryName("sd")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamedKeys = spark.table("sd")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val batchKeys = EventStream.batchDedup(events)
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    // one survivor per key; which physical row survives is processing-order
    // dependent in streaming, so parity is on the key multiset
    assert(streamedKeys.length == streamedKeys.distinct.length)
    assert(streamedKeys.toSet == batchKeys.toSet)
    assert(streamedKeys.length == batchKeys.length)
  }

  test("streaming image ingest dedup admits exactly what batch ExactDedup keeps") {
    val dir = Files.createTempDirectory("graft_ingest").toString + "/images"
    // period=5 plants plenty of exact dups (ImagesGen kind=exact)
    val images = graft.sources.ImagesGen.writeFixture(spark, dir, 300, period = 5)

    val q = graft.streaming.IngestDedup.streamingDedup(spark, dir)
      .writeStream.format("memory").queryName("ingest")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ingest").select($"digest").as[String].collect()

    // batch reference: the pipeline's exact-dedup stage on the same table
    val batchKept = graft.operators.ExactDedup.flag(
        images.select(expr("xxhash64(image_id)").as("k"), // unique per row
          concat(sha2($"bytes", 256),
            DedupPipeline.nullSafeCaption($"caption")).as("content")), "content")
      .where(!$"is_dup")
    // some payloads really are duplicated, so the stream dropped rows...
    assert(images.count() > streamed.length)
    // ...and what survived is exactly one row per distinct content, the
    // same content set batch ExactDedup keeps
    assert(streamed.length == streamed.distinct.length)
    assert(streamed.length == batchKept.count())
    val batchDigests = images
      .withColumn("digest", graft.streaming.IngestDedup.contentDigest)
      .select($"digest").distinct().as[String].collect()
    assert(streamed.toSet == batchDigests.toSet)
  }

  test("null captions: distinct images are NOT collapsed by the content digest") {
    // regression: a NULL caption nulled the whole concat, and groupBy /
    // dropDuplicates treat NULLs as equal -- every distinct null-caption
    // image collapsed into one arbitrarily-kept row
    val dir = Files.createTempDirectory("graft_nullcap").toString + "/images"
    val rows = Seq(
      ("i0", Array[Byte](1, 2, 3), 1, 1, "png", null.asInstanceOf[String], 10L),
      ("i1", Array[Byte](4, 5, 6), 1, 1, "png", null.asInstanceOf[String], 11L),
      ("i2", Array[Byte](1, 2, 3), 1, 1, "png", null.asInstanceOf[String], 10L), // true dup of i0
      ("i3", Array[Byte](1, 2, 3), 1, 1, "png", "cap", 10L)) // same bytes, real caption
      .toDF("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
    rows.write.mode("overwrite").parquet(dir)

    val q = graft.streaming.IngestDedup.streamingDedup(spark, dir)
      .writeStream.format("memory").queryName("nullcap")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val admitted = spark.table("nullcap").select($"image_id").as[String].collect().toSet
    // i0/i1 distinct bytes -> both admitted; i2 duplicates i0; i3's real
    // caption distinguishes it from the null-caption i0
    assert(admitted.intersect(Set("i0", "i2")).size == 1)
    assert(admitted.contains("i1") && admitted.contains("i3"))
    assert(admitted.size == 3)

    // the FULL batch pipeline survives null captions end to end: exactly
    // one exact dup edge (i2 -> i0), every image clustered, null-caption
    // docs get empty annotate ranges (no windows, not an NPE)
    val res = DedupPipeline.run(spark, spark.read.parquet(dir), DedupPipeline.Config())
    assert(res.exactEdges.count() == 1)
    assert(res.clusters.count() == 4)
    assert(res.annotated.where($"caption".isNull)
      .select(size($"sa_remove_ranges")).as[Int].collect().forall(_ == 0))
  }

  test("streaming window counts equal batch on the same events") {
    val src = Files.createTempDirectory("graft_stream").toString
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    events.write.mode("overwrite").parquet(src)
    val q = EventStream.streamingWindowCounts(spark, src)
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("wc")
      .as[(String, String, Long, Double)].collect().toSet
    val batch = EventStream.windowCounts(events)
      .as[(String, String, Long, Double)].collect().toSet
    // append-mode watermark holds back windows newer than (max ts - 10min):
    // streamed must be a subset; everything emitted must match batch exactly.
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch))
    assert((batch.size - streamed.size) <= 8, "only tail windows may be held back")
  }
}
