package graft.sources

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.functions.PolyHash

/** Deterministic synthetic `images` fixture generator -- the primary input
  * table shape from BASELINE.json input_hint:
  *   images(image_id string, bytes binary, w int, h int, fmt string,
  *          caption string, phash long)
  *
  * Seeded per-row via splitmix64 (no RNG state, so generation is
  * order-independent and distributable). Plants, per FIXTURES.md F1:
  *  - exact dups (identical bytes + caption, new id)
  *  - caption near-dups (>= ~0.9 shingle Jaccard via junction-append)
  *  - substring dups (shared >= minLen caption run inside distinct text)
  *  - image near-dups (few pixels perturbed -> pHash within small Hamming)
  *  - negatives (independent rows)
  * plus multi-byte UTF-8 captions to exercise the clip path.
  *
  * Ships golden edges: (a, b) pairs that MUST cluster together, for recall
  * measurement against pipeline output.
  */
object ImagesGen {

  case class Img(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                 fmt: String, caption: String, phash: Long)

  private val words = Array(
    "spark", "query", "table", "join", "scan", "merge", "window", "hash",
    "filter", "order", "batch", "value", "stream", "column", "vector",
    "café", "日本", "über", "😊", "naïve")

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(PolyHash.mix64(seed))(PolyHash.mix64)

  private def caption(seed: Long, nWords: Int): String = {
    val r = rng(seed ^ 0xcaf7e0L)
    (0 until nWords).map(_ => words(math.floorMod(r.next(), words.length).toInt))
      .mkString(" ")
  }

  /** Deterministic pixels: 32x32 RGB from the seed stream. */
  private def pixels(seed: Long, w: Int, h: Int): Array[Int] = {
    val r = rng(seed ^ 0x9158e1L)
    Array.fill(w * h)((r.next() & 0xffffff).toInt)
  }

  private def encode(px: Array[Int], w: Int, h: Int, fmt: String): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, w, h, px, 0, w)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, if (fmt == "jpg") "jpg" else "png", bos)
    bos.toByteArray
  }

  /** Average-hash (aHash): 8x8 block-mean grayscale, bit = mean > global
    * mean. A real perceptual hash: small pixel perturbations flip few bits.
    */
  def aHash(px: Array[Int], w: Int, h: Int): Long = {
    val means = new Array[Double](64)
    val bw = w / 8; val bh = h / 8
    var bi = 0
    while (bi < 64) {
      val bx = bi % 8; val by = bi / 8
      var sum = 0.0; var n = 0
      var y = by * bh
      while (y < (by + 1) * bh) {
        var x = bx * bw
        while (x < (bx + 1) * bw) {
          val p = px(y * w + x)
          sum += ((p >> 16 & 0xff) * 0.299 + (p >> 8 & 0xff) * 0.587 + (p & 0xff) * 0.114)
          n += 1; x += 1
        }
        y += 1
      }
      means(bi) = sum / n
      bi += 1
    }
    val global = means.sum / 64
    var bits = 0L
    bi = 0
    while (bi < 64) { if (means(bi) > global) bits |= (1L << bi); bi += 1 }
    bits
  }

  /** Generate nBase base rows + planted clusters. Returns (rows, golden
    * edges of must-cluster pairs).
    */
  def generate(nBase: Int, minLen: Int = 32): (Seq[Img], Seq[(String, String)]) = {
    val w = 32; val h = 32
    def id(i: Int) = f"img$i%08d"
    val rows = Vector.newBuilder[Img]
    val edges = Vector.newBuilder[(String, String)]

    val base = (0 until nBase).map { i =>
      val seed = 42L * 1000003 + i
      val fmt = if (i % 3 == 0) "jpg" else "png"
      val px = pixels(seed, w, h)
      val nWords = 10 + math.floorMod(PolyHash.mix64(seed), 30).toInt
      Img(id(i), encode(px, w, h, fmt), w, h, fmt, caption(seed, nWords), aHash(px, w, h))
    }
    rows ++= base
    var next = nBase

    // exact dups of every 10th base row
    base.indices.filter(_ % 10 == 0).foreach { i =>
      val b = base(i)
      rows += b.copy(image_id = id(next)); edges += ((b.image_id, id(next))); next += 1
    }
    // caption near-dups (junction append) of every 10th+1 row
    base.indices.filter(_ % 10 == 1).foreach { i =>
      val b = base(i)
      val cap = b.caption + " " + b.caption.take(12)
      rows += b.copy(image_id = id(next), caption = cap)
      edges += ((b.image_id, id(next))); next += 1
    }
    // substring dups: new caption embedding a >= minLen run of base caption
    base.indices.filter(_ % 10 == 2).foreach { i =>
      val b = base(i)
      val seed = 7777L + i
      val run = b.caption.take(math.max(minLen + 8, b.caption.length / 2))
      val cap = caption(seed, 6) + " " + run + " " + caption(seed ^ 5, 6)
      val px = pixels(seed ^ 0xabc, w, h)
      rows += Img(id(next), encode(px, w, h, "png"), w, h, "png", cap, aHash(px, w, h))
      next += 1 // substring dup, not necessarily a cluster edge
    }
    // image near-dups: perturb 3 pixels of every 10th+3 row
    base.indices.filter(_ % 10 == 3).foreach { i =>
      val b = base(i)
      val seed = 42L * 1000003 + i
      val px = pixels(seed, w, h)
      val r = rng(seed ^ 0xfeed)
      (0 until 3).foreach { _ =>
        val at = math.floorMod(r.next(), px.length).toInt
        px(at) = (px(at) ^ 0x070707) & 0xffffff
      }
      val cap2 = caption(seed ^ 0x1234, 12)
      rows += Img(id(next), encode(px, w, h, "png"), w, h, "png", cap2, aHash(px, w, h))
      edges += ((b.image_id, id(next))); next += 1
    }
    (rows.result(), edges.result())
  }

  def toDf(spark: SparkSession, rows: Seq[Img]): DataFrame = {
    import spark.implicits._
    // parallelize deterministically ordered by image_id
    spark.createDataset(rows.sortBy(_.image_id)).toDF()
  }

  /** Generate and write a fixture table (idempotent per (n, dir)). */
  def writeFixture(spark: SparkSession, dir: String, nBase: Int): DataFrame = {
    val path = new java.io.File(dir)
    if (!new java.io.File(dir + "/_SUCCESS").exists()) {
      val (rows, _) = generate(nBase)
      toDf(spark, rows).repartition(8).write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir)
  }
}
