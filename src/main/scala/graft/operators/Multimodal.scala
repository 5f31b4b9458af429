package graft.operators

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Multimodal column processing: images/audio/video as opaque binary
  * columns with typed metadata, processed batch-wise in mapPartitions.
  *
  * Image decode is REAL (javax.imageio ships with the JDK: png + jpeg).
  * Audio/video feature extraction is a deterministic STUB (this container
  * has no codec libraries): the Spark-side plumbing -- schema, typed
  * Dataset batching, partition shape -- is real and tested; swap
  * `fakeAudioFeatures`/`fakeFrameSample` for a codec call in production.
  */
object Multimodal {

  case class Decoded(image_id: String, w: Int, h: Int, ok: Boolean, phash: Long)
  case class Resized(image_id: String, bytes: Array[Byte], w: Int, h: Int)

  /** Decode + recompute perceptual hash from pixels. Real decode path. */
  def decodeAndHash(images: DataFrame): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        try {
          val img = ImageIO.read(new ByteArrayInputStream(bytes))
          val w = img.getWidth; val h = img.getHeight
          val px = img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xffffff)
          Decoded(id, w, h, ok = true, graft.sources.ImagesGen.aHash(px, w, h))
        } catch {
          case _: Exception => Decoded(id, -1, -1, ok = false, 0L)
        }
      })
      .toDF()
  }

  /** Resize to (tw x th) by nearest-neighbor and re-encode png. Real. */
  def resize(images: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select(col("image_id"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val img = ImageIO.read(new ByteArrayInputStream(bytes))
        val out = new java.awt.image.BufferedImage(tw, th,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g = out.createGraphics()
        g.drawImage(img, 0, 0, tw, th, null)
        g.dispose()
        val bos = new java.io.ByteArrayOutputStream()
        ImageIO.write(out, "png", bos)
        Resized(id, bos.toByteArray, tw, th)
      })
      .toDF()
  }

  /** STUB: deterministic fake audio features (n mel-ish bands) derived
    * from the payload hash -- replace with a codec in production. The
    * schema and batch shape are the real contract.
    */
  def audioFeatures(audio: DataFrame, bands: Int = 16): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("clip_id").cast("string"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val h0 = PolyHash.hash(bytes, 0, math.min(bytes.length, 4096), PolyHash.B1)
        val feats = Array.tabulate(bands)(i =>
          (PolyHash.mix64(h0 ^ i.toLong) >>> 11).toDouble / (1L << 53).toDouble)
        (id, feats)
      })
      .toDF("clip_id", "features")
  }

  /** STUB: deterministic fake frame sampling -- emits `n` pseudo-frame
    * digests per video; replace the digest with a real frame decode.
    */
  def frameSample(videos: DataFrame, n: Int = 4): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("video_id").cast("string"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val h0 = PolyHash.hash(bytes, 0, math.min(bytes.length, 4096), PolyHash.B2)
        Iterator.range(0, n).map(i => (id, i, PolyHash.mix64(h0 + i)))
      })
      .toDF("video_id", "frame_ix", "frame_digest")
  }

  /** PSNR between two decodable images (fidelity gate: >= 40 dB for lossy
    * round-trips, BASELINE.json input_hint). Infinity for identical.
    */
  def psnr(aBytes: Array[Byte], bBytes: Array[Byte]): Double = {
    val a = ImageIO.read(new ByteArrayInputStream(aBytes))
    val b = ImageIO.read(new ByteArrayInputStream(bBytes))
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "dims differ")
    val pa = a.getRGB(0, 0, a.getWidth, a.getHeight, null, 0, a.getWidth)
    val pb = b.getRGB(0, 0, b.getWidth, b.getHeight, null, 0, b.getWidth)
    var mse = 0.0
    var i = 0
    while (i < pa.length) {
      var c = 0
      while (c < 3) {
        val d = ((pa(i) >> (8 * c)) & 0xff) - ((pb(i) >> (8 * c)) & 0xff)
        mse += d.toDouble * d
        c += 1
      }
      i += 1
    }
    mse /= (pa.length * 3.0)
    if (mse == 0) Double.PositiveInfinity else 10 * math.log10(255.0 * 255.0 / mse)
  }
}
