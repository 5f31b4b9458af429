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
  * Audio is REAL for RIFF/PCM16 WAV (in-repo chunk parser, no codec
  * libraries needed). Video frame sampling is REAL for MJPEG streams
  * (JPEG boundary scan + per-frame decode + perceptual aHash). Payloads
  * in codec formats this container cannot decode (mp3/mp4/webm/...)
  * take deterministic hash-derived fallbacks flagged ok=false, so every
  * pipeline stays total and callers filter on `ok`.
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

  /** Minimal RIFF/PCM16 WAV parser (JDK-only, no codec libraries):
    * walks the word-aligned chunk list, accepts audioFormat=1 / 16-bit,
    * averages channels to mono in [-1, 1]. Returns (sampleRate, samples)
    * or None for anything that is not plain PCM16 WAV. Total on arbitrary
    * bytes: chunk sizes that read as negative (le32 of 0xFFFFFFF8 = -8
    * would stall the walk at a fixed offset) or that overflow the cursor
    * bail to None, and the whole walk is wrapped so ANY malformed payload
    * takes the documented ok=false fallback rather than killing the task.
    */
  private[graft] def parseWavPcm16(bytes: Array[Byte]): Option[(Int, Array[Double])] =
    try parseWavPcm16Unsafe(bytes) catch { case _: Exception => None }

  private def parseWavPcm16Unsafe(bytes: Array[Byte]): Option[(Int, Array[Double])] = {
    def le32(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8) |
      ((bytes(o + 2) & 0xff) << 16) | ((bytes(o + 3) & 0xff) << 24)
    def le16(o: Int): Int = (bytes(o) & 0xff) | ((bytes(o + 1) & 0xff) << 8)
    def tag(o: Int): String = new String(bytes, o, 4, "US-ASCII")
    if (bytes.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L // Long cursor: a hostile sz near Int.MaxValue must not wrap
    var fmtOk = false; var channels = 0; var rate = 0
    var samples: Array[Double] = null
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val id = tag(o); val sz = le32(o + 4)
      if (sz < 0) return None // declared size >= 2 GiB: not a sane WAV chunk
      if (id == "fmt " && o + 24 <= bytes.length) {
        channels = le16(o + 10); rate = le32(o + 12)
        fmtOk = le16(o + 8) == 1 && le16(o + 22) == 16 && channels >= 1
      } else if (id == "data" && fmtOk) {
        val n = (math.min(sz.toLong, (bytes.length - o - 8).toLong) / 2 / channels).toInt
        val out = new Array[Double](n)
        var i = 0
        while (i < n) {
          var acc = 0.0; var c = 0
          while (c < channels) {
            val so = o + 8 + 2 * (i * channels + c)
            acc += (((bytes(so) & 0xff) | (bytes(so + 1) << 8)).toShort) / 32768.0
            c += 1
          }
          out(i) = acc / channels
          i += 1
        }
        samples = out
      }
      off += 8L + sz + (sz & 1) // RIFF chunks are word-aligned; advances >= 8
    }
    if (fmtOk && samples != null) Some((rate, samples)) else None
  }

  /** Audio features: REAL for RIFF/PCM16 WAV payloads (decoded with the
    * in-repo parser above -- per-band RMS energy over `bands` equal time
    * segments, ok=true); payloads in codec formats this container cannot
    * decode (mp3/flac/...) fall back to deterministic hash-derived
    * pseudo-features with ok=false, so the pipeline shape stays total and
    * the caller can filter on `ok`.
    */
  def audioFeatures(audio: DataFrame, bands: Int = 16): DataFrame = {
    val spark = audio.sparkSession
    import spark.implicits._
    audio.select(col("clip_id").cast("string"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        parseWavPcm16(bytes) match {
          case Some((_, s)) if s.nonEmpty =>
            val feats = Array.tabulate(bands) { b =>
              val lo = (b.toLong * s.length / bands).toInt
              val hi = math.max(lo + 1, ((b + 1).toLong * s.length / bands).toInt)
              var e = 0.0; var i = lo
              while (i < hi) { e += s(i) * s(i); i += 1 }
              math.sqrt(e / (hi - lo))
            }
            (id, feats, true)
          case _ =>
            val h0 = PolyHash.hash(bytes, 0, math.min(bytes.length, 4096), PolyHash.B1)
            val feats = Array.tabulate(bands)(i =>
              (PolyHash.mix64(h0 ^ i.toLong) >>> 11).toDouble / (1L << 53).toDouble)
            (id, feats, false)
        }
      })
      .toDF("clip_id", "features", "ok")
  }

  /** MJPEG frame boundaries: a Motion-JPEG stream is concatenated JPEG
    * images; frames run from an SOI marker (FF D8 FF) to the next EOI
    * (FF D9). Frames are walked SEGMENT-AWARE: marker segments (APPn,
    * COM, DQT, SOF, ...) carry a big-endian 2-byte length and are skipped
    * whole -- an EXIF APP1 segment can legitimately contain a complete
    * embedded thumbnail JPEG (its own SOI/EOI), which a raw FF D9 scan
    * would mistake for the frame end. Entropy-coded data after SOS
    * byte-stuffs FF as FF 00 and uses FF D0-D7 restarts, so inside it
    * only a non-stuffing marker terminates the scan. A structurally
    * malformed frame falls back to the naive EOI scan for that frame.
    * Returns [start, end) offsets per frame.
    */
  private[graft] def mjpegFrameOffsets(bytes: Array[Byte]): Seq[(Int, Int)] = {
    // an MJPEG stream STARTS with SOI; without this gate, arbitrary
    // binary (png, mp4) can contain FF D8 FF / FF D9 byte runs by chance
    // and would be misdetected as a 1-frame "video"
    if (bytes.length < 4 || bytes(0) != 0xff.toByte ||
        bytes(1) != 0xd8.toByte || bytes(2) != 0xff.toByte) return Nil
    def u(o: Int): Int = bytes(o) & 0xff
    // end offset (exclusive) of the JPEG starting at `start`, or -1 if the
    // segment structure is malformed / truncated
    def frameEnd(start: Int): Int = {
      var i = start + 2
      var inScan = false
      while (i + 1 < bytes.length) {
        if (!inScan) {
          if (u(i) != 0xff) return -1
          while (i + 1 < bytes.length && u(i + 1) == 0xff) i += 1 // fill bytes
          if (i + 1 >= bytes.length) return -1
          val m = u(i + 1)
          if (m == 0xd9) return i + 2 // EOI
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd8)) i += 2 // standalone
          else if (i + 3 < bytes.length) {
            val len = (u(i + 2) << 8) | u(i + 3)
            if (len < 2) return -1
            if (m == 0xda) inScan = true // SOS: entropy data follows header
            i += 2 + len
          } else return -1
        } else if (u(i) == 0xff && u(i + 1) != 0x00 &&
                   !(u(i + 1) >= 0xd0 && u(i + 1) <= 0xd7)) {
          inScan = false // real marker ends the entropy-coded run
        } else i += 1
      }
      -1
    }
    def naiveEnd(start: Int): Int = {
      var i = start + 2
      while (i + 1 < bytes.length &&
             !(bytes(i) == 0xff.toByte && bytes(i + 1) == 0xd9.toByte)) i += 1
      if (i + 1 < bytes.length) i + 2 else -1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i + 2 < bytes.length) {
      if (bytes(i) == 0xff.toByte && bytes(i + 1) == 0xd8.toByte &&
          bytes(i + 2) == 0xff.toByte) {
        val e0 = frameEnd(i)
        val e = if (e0 > 0) e0 else naiveEnd(i)
        if (e > 0) { out += ((i, e)); i = e } else i = bytes.length
      } else i += 1
    }
    out.toSeq
  }

  /** Frame sampling: REAL for MJPEG payloads -- up to `n` evenly spaced
    * frames are split at JPEG boundaries, decoded (javax.imageio), and
    * digested with the same perceptual aHash the image path uses
    * (ok=true) -- so sampled frames feed directly into the pHash Hamming
    * near-dup join. Containers this JDK cannot parse (mp4/webm/mkv) fall
    * back to deterministic pseudo-digests with ok=false.
    */
  def frameSample(videos: DataFrame, n: Int = 4): DataFrame = {
    val spark = videos.sparkSession
    import spark.implicits._
    videos.select(col("video_id").cast("string"), col("bytes")).as[(String, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        val frames = mjpegFrameOffsets(bytes)
        if (frames.nonEmpty) {
          val m = math.min(n, frames.size)
          val picks =
            if (m == 1) Seq(0)
            else (0 until m).map(j => j * (frames.size - 1) / (m - 1)).distinct
          picks.zipWithIndex.map { case (fi, ix) =>
            val (s, e) = frames(fi)
            val digest =
              try {
                val img = ImageIO.read(new ByteArrayInputStream(
                  java.util.Arrays.copyOfRange(bytes, s, e)))
                val w = img.getWidth; val h = img.getHeight
                graft.sources.ImagesGen.aHash(
                  img.getRGB(0, 0, w, h, null, 0, w).map(_ & 0xffffff), w, h)
              } catch {
                case _: Exception => PolyHash.mix64(PolyHash.hash(bytes, s, e - s, PolyHash.B2))
              }
            (id, ix, digest, true)
          }
        } else {
          val h0 = PolyHash.hash(bytes, 0, math.min(bytes.length, 4096), PolyHash.B2)
          Iterator.range(0, n).map(i => (id, i, PolyHash.mix64(h0 + i), false)).toSeq
        }
      })
      .toDF("video_id", "frame_ix", "frame_digest", "ok")
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
