package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AnnCosine, Multimodal}
import graft.sources.ImagesGen

/** End-to-end pipeline on the synthetic images fixture: cluster recall on
  * planted duplicate edges, per-row fidelity, real decode plumbing.
  */
class PipelineSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private lazy val (rows, goldenEdges, negEdges) = ImagesGen.generate(60)
  private lazy val images = ImagesGen.toDf(spark, rows).cache()

  test("pipeline clusters: recall >= 0.99 on planted edges, negatives stay apart") {
    val res = DedupPipeline.run(spark, images, DedupPipeline.Config())
    val clusters = res.clusters.as[(String, String)].collect().toMap
    assert(goldenEdges.nonEmpty)
    val hit = goldenEdges.count { case (a, b) => clusters(a) == clusters(b) }
    val recall = hit.toDouble / goldenEdges.size
    assert(recall >= 0.99, s"recall=$recall (${goldenEdges.size} golden edges)")
    // precision probe: below-threshold near-miss pairs (word Jaccard ~0.43
    // < 0.6, unrelated pixels) must NOT share a cluster
    assert(negEdges.nonEmpty)
    val falseMerges = negEdges.filter { case (a, b) => clusters(a) == clusters(b) }
    assert(falseMerges.isEmpty, s"negatives clustered: $falseMerges")
    // cluster_id is a member of its own cluster (min-member labeling)
    val ids = clusters.keySet
    assert(clusters.values.forall(ids.contains))
    assert(clusters.forall { case (id, cid) => cid <= id })
  }

  test("per-row fidelity: bytes and captions pass through unmodified") {
    val res = DedupPipeline.run(spark, images, DedupPipeline.Config())
    val orig = images.select($"image_id", $"caption".as("caption0"), sha2($"bytes", 256).as("d"))
    val out = res.annotated
      .join(res.keyed.select($"k", $"image_id", sha2($"bytes", 256).as("d2")), "k")
    val joined = out.join(orig, Seq("image_id"))
    assert(joined.where($"caption" =!= $"caption0").count() == 0)
    assert(joined.where($"d" =!= $"d2").count() == 0)
    assert(res.annotated.count() == images.count())
  }

  test("substring dups planted in captions produce remove ranges") {
    val res = DedupPipeline.run(spark, images, DedupPipeline.Config())
    assert(res.annotated.where(size($"sa_remove_ranges") > 0).count() > 0)
  }

  test("real decode: png phash identical, jpg phash hamming-close") {
    val decoded = Multimodal.decodeAndHash(images)
      .withColumnRenamed("phash", "phash2")
      .join(images.select($"image_id", $"phash", $"fmt"), "image_id")
      .withColumn("drift", bit_count($"phash".bitwiseXOR($"phash2")))
    assert(decoded.where(!$"ok").count() == 0)
    assert(decoded.where($"fmt" === "png" && $"drift" =!= 0).count() == 0)
    val jpgDrift = decoded.where($"fmt" === "jpg")
      .agg(max($"drift")).as[Int].collect()(0)
    assert(jpgDrift <= 16, s"jpeg phash drift $jpgDrift")
  }

  test("png round-trip is lossless (PSNR = inf) and resize plumbing works") {
    val png = rows.find(_.fmt == "png").get
    val re = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png.bytes))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    assert(Multimodal.psnr(png.bytes, re).isPosInfinity)
    val resized = Multimodal.resize(images.limit(4), 16, 16).collect()
    assert(resized.length == 4 && resized.forall(_.getAs[Int]("w") == 16))
  }

  test("multimodal: audio features + frame sampling shapes; non-WAV takes the fallback") {
    val audio = images.limit(3).select($"image_id".as("clip_id"), $"bytes")
    val feats = Multimodal.audioFeatures(audio, bands = 8).collect()
    assert(feats.length == 3 && feats.forall(_.getSeq[Double](1).length == 8))
    assert(feats.forall(!_.getBoolean(2))) // png payloads are not WAV -> ok=false
    // png payloads are not MJPEG -> fallback pseudo-digests (a JPEG
    // payload IS a valid 1-frame MJPEG, so jpg rows are excluded here)
    val vids = images.where($"fmt" === "png").limit(2)
      .select($"image_id".as("video_id"), $"bytes")
    val fs = Multimodal.frameSample(vids, 5).collect()
    assert(fs.length == 10 && fs.forall(!_.getBoolean(3)))
  }

  test("multimodal: real MJPEG frame sampling -- boundaries found, frames decoded and aHashed") {
    // patterned frames (solid colors all aHash to 0 -- the hash is
    // mean-relative): vertical vs horizontal split have distinct hashes
    def jpegFrame(vertical: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until 16).foreach(y => (0 until 16).foreach { x =>
        val bright = if (vertical) x >= 8 else y >= 8
        img.setRGB(x, y, if (bright) 0xffffff else 0x000000)
      })
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    // a 3-frame MJPEG stream: vertical, horizontal, vertical
    val mjpeg = jpegFrame(true) ++ jpegFrame(false) ++ jpegFrame(true)
    assert(Multimodal.mjpegFrameOffsets(mjpeg).size == 3)
    val vids = Seq(("v0", mjpeg)).toDF("video_id", "bytes")
    val got = Multimodal.frameSample(vids, 2).collect() // evenly spaced: first + last
    assert(got.length == 2 && got.forall(_.getBoolean(3)))
    // first and last frames are the same dark image -> equal perceptual digests
    assert(got(0).getLong(2) == got(1).getLong(2))
    val all3 = Multimodal.frameSample(vids, 5).collect() // capped at frame count
    assert(all3.length == 3)
    assert(all3.map(_.getLong(2)).distinct.length == 2) // dark, light, dark
  }

  test("multimodal: real PCM16 WAV decode -- band RMS tracks the signal envelope") {
    // synthesize a mono PCM16 WAV: silent first half, loud square second half
    def wav(n: Int, rate: Int): Array[Byte] = {
      val data = new Array[Byte](n * 2)
      var i = n / 2
      while (i < n) {
        val v: Short = if (i % 2 == 0) 20000 else -20000
        data(2 * i) = (v & 0xff).toByte
        data(2 * i + 1) = ((v >> 8) & 0xff).toByte
        i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      def le32(x: Int) = (0 until 4).foreach(j => bos.write((x >> (8 * j)) & 0xff))
      def le16(x: Int) = (0 until 2).foreach(j => bos.write((x >> (8 * j)) & 0xff))
      bos.write("RIFF".getBytes); le32(36 + data.length); bos.write("WAVE".getBytes)
      bos.write("fmt ".getBytes); le32(16); le16(1); le16(1) // PCM, mono
      le32(rate); le32(rate * 2); le16(2); le16(16)
      bos.write("data".getBytes); le32(data.length); bos.write(data, 0, data.length)
      bos.toByteArray
    }
    val clips = Seq(("c0", wav(8000, 8000))).toDF("clip_id", "bytes")
    val row = Multimodal.audioFeatures(clips, bands = 4).collect().head
    val f = row.getSeq[Double](1)
    assert(row.getBoolean(2)) // decoded, not the fallback
    assert(f(0) < 0.01 && f(1) < 0.01, s"silent half: $f") // silence
    assert(f(2) > 0.5 && f(3) > 0.5, s"loud half: $f") // square wave RMS ~0.61
  }

  test("ann: brute top-k exact, lsh top-k recall") {
    val r = new scala.util.Random(13)
    val vecs = (0 until 200).map(i => (i.toLong, Array.fill(16)(r.nextFloat() * 2 - 1)))
    val corpus = vecs.toDF("id", "vec")
    val queries = vecs.take(5).map { case (i, v) => (i, v) }.toDF("qid", "vec")
    val brute = AnnCosine.bruteTopK(queries, corpus, 10)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    // scala oracle
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val expected = (for ((qi, qv) <- vecs.take(5)) yield {
      vecs.filter(_._1 != qi).map { case (ci, cv) => (ci, cos(qv, cv)) }
        .sortBy { case (ci, s) => (-s, ci) }.take(10).map(c => (qi, c._1))
    }).flatten.toSet
    assert(brute == expected)
    val lsh = AnnCosine.lshTopK(queries, corpus, 10, dim = 16, tables = 24, planeBits = 4)
      .select($"qid", $"id").as[(Long, Long)].collect().toSet
    val recall = lsh.intersect(brute).size.toDouble / brute.size
    assert(recall >= 0.5, s"lsh recall=$recall")
  }

  test("ann ivf: planted near-copy surfaces as rank-1 through the cell path") {
    // integer corpus: id 9 = id 0's vector with +1 on component 0
    // (cosine ~0.997); ids 1..4 have no planted partner
    def vec(id: Long): Array[Double] = Array.tabulate(16) { j =>
      val eid = if (id % 10 == 9) id - 9 else id
      val base = Math.floorMod(graft.functions.PolyHash.mix64(eid * 131L + j), 17) - 8
      (base + (if (id % 10 == 9 && j == 0) 1 else 0)).toDouble
    }
    val corpus = (0L until 200L).map(i => (i, vec(i))).toDF("id", "vec")
    val queries = Seq((0L, vec(0L))).toDF("qid", "vec")
    val got = AnnCosine.ivfTopKInt(queries, corpus, 10, nCells = 8, nProbe = 2)
      .select($"qid", $"id", $"rn").as[(Long, Long, Int)].collect()
    assert(got.nonEmpty)
    // the near-identical vector lands in the same cell and wins the rerank
    assert(got.find(_._3 == 1).map(_._2).contains(9L), s"got ${got.toSeq.sortBy(_._3)}")
  }
}
