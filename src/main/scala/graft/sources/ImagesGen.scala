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
  * Rows are rendered from a pure (spec -> row) function seeded by
  * splitmix64, so generation is order-independent and DISTRIBUTABLE: the
  * lightweight spec list (id, kind, baseIdx) is built on the driver, the
  * pixel rendering + PNG/JPEG encode runs inside mapPartitions. Plants,
  * per FIXTURES.md F1:
  *  - exact dups (identical bytes + caption, new id)         kind=exact
  *  - caption near-dups (~0.9 shingle Jaccard, junction append) kind=near
  *  - substring dups (shared >= minLen caption run)          kind=substr
  *  - image near-dups (3 pixels perturbed -> close pHash)    kind=pixel
  * plus multi-byte UTF-8 captions to exercise the clip path.
  *
  * Ships golden edges: (a, b) pairs that MUST cluster together, for recall
  * measurement against pipeline output.
  */
object ImagesGen {

  case class Img(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                 fmt: String, caption: String, phash: Long)
  case class Spec(image_id: String, kind: String, baseIdx: Int)

  val W = 32; val H = 32

  private val words = Array(
    "spark", "query", "table", "join", "scan", "merge", "window", "hash",
    "filter", "order", "batch", "value", "stream", "column", "vector",
    "café", "日本", "über", "😊", "naïve")

  private def rng(seed: Long): Iterator[Long] =
    Iterator.iterate(PolyHash.mix64(seed))(PolyHash.mix64)

  private def baseSeed(i: Int): Long = 42L * 1000003 + i

  private def caption(seed: Long, nWords: Int): String = {
    val r = rng(seed ^ 0xcaf7e0L)
    (0 until nWords).map(_ => words(math.floorMod(r.next(), words.length).toInt))
      .mkString(" ")
  }

  private def pixels(seed: Long): Array[Int] = {
    val r = rng(seed ^ 0x9158e1L)
    Array.fill(W * H)((r.next() & 0xffffff).toInt)
  }

  private def encode(px: Array[Int], fmt: String): Array[Byte] = {
    val img = new BufferedImage(W, H, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, W, H, px, 0, W)
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

  private def baseImg(id: String, i: Int): Img = {
    val seed = baseSeed(i)
    val fmt = if (i % 3 == 0) "jpg" else "png"
    val px = pixels(seed)
    // ~60-240 words (~0.4-1.6 KB): reference-like document mass, so the
    // dedup stages are data-bound rather than stage-latency-bound.
    val nWords = 60 + math.floorMod(PolyHash.mix64(seed), 180).toInt
    Img(id, encode(px, fmt), W, H, fmt, caption(seed, nWords), aHash(px, W, H))
  }

  /** Pure rendering of one spec row. */
  def render(spec: Spec, minLen: Int): Img = spec.kind match {
    case "base" => baseImg(spec.image_id, spec.baseIdx)
    case "exact" =>
      baseImg("", spec.baseIdx).copy(image_id = spec.image_id)
    case "near" =>
      val b = baseImg("", spec.baseIdx)
      b.copy(image_id = spec.image_id, caption = b.caption + " " + b.caption.take(12))
    case "substr" =>
      val b = baseImg("", spec.baseIdx)
      val seed = 7777L + spec.baseIdx
      val run = b.caption.take(math.max(minLen + 8, b.caption.length / 2))
      val cap = caption(seed, 6) + " " + run + " " + caption(seed ^ 5, 6)
      val px = pixels(seed ^ 0xabc)
      Img(spec.image_id, encode(px, "png"), W, H, "png", cap, aHash(px, W, H))
    case "pixel" =>
      val b = baseImg("", spec.baseIdx)
      val seed = baseSeed(spec.baseIdx)
      val px = pixels(seed)
      val r = rng(seed ^ 0xfeed)
      (0 until 3).foreach { _ =>
        val at = math.floorMod(r.next(), px.length).toInt
        px(at) = (px(at) ^ 0x070707) & 0xffffff
      }
      Img(spec.image_id, encode(px, "png"), W, H, "png",
        caption(seed ^ 0x1234, 12), aHash(px, W, H))
    case "neg" =>
      // high-similarity-but-below-threshold NEGATIVE (FIXTURES.md F1):
      // shares ~60% of the base's words -> word-3-gram Jaccard ~0.43,
      // under the 0.6 verification threshold; pixels/phash unrelated.
      // Must NOT cluster with its base (precision probe).
      val b = baseImg("", spec.baseIdx)
      val seed = 0xce9aL * 1000003 + spec.baseIdx
      val words0 = b.caption.split(" ")
      val keep = (words0.length * 3) / 5
      val cap = words0.take(keep).mkString(" ") + " " +
        caption(seed, words0.length - keep)
      val px = pixels(seed ^ 0xbeefL)
      Img(spec.image_id, encode(px, "png"), W, H, "png", cap, aHash(px, W, H))
  }

  /** Spec list (cheap, no rendering) + golden must-cluster edges.
    * `period` controls planted-duplicate density: one copy of each kind
    * per `period` base rows (period=10 -> 40% planted rows for dense unit
    * tests; period=40 -> ~10%, a realistic post-MinHash duplication rate
    * for benchmarks -- the reference corpus arrives already MinHash-deduped,
    * README.md:17).
    */
  def specs(nBase: Int, period: Int = 10): (Seq[Spec], Seq[(String, String)], Seq[(String, String)]) = {
    def id(i: Int) = f"img$i%08d"
    val out = Vector.newBuilder[Spec]
    val edges = Vector.newBuilder[(String, String)]
    val negEdges = Vector.newBuilder[(String, String)]
    (0 until nBase).foreach(i => out += Spec(id(i), "base", i))
    var next = nBase
    def plant(sel: Int, kind: String, edge: Boolean, neg: Boolean = false): Unit =
      (0 until nBase).filter(_ % period == sel).foreach { i =>
        out += Spec(id(next), kind, i)
        if (edge) edges += ((id(i), id(next)))
        if (neg) negEdges += ((id(i), id(next)))
        next += 1
      }
    plant(0, "exact", edge = true)
    plant(1, "near", edge = true)
    plant(2, "substr", edge = false)
    plant(3, "pixel", edge = true)
    plant(4, "neg", edge = false, neg = true)
    (out.result(), edges.result(), negEdges.result())
  }

  /** Driver-side generation (tests, <= a few hundred rows). Returns
    * (rows, must-cluster edges, must-NOT-cluster negative pairs).
    */
  def generate(nBase: Int, minLen: Int = 32, period: Int = 10): (Seq[Img], Seq[(String, String)], Seq[(String, String)]) = {
    val (sp, edges, negEdges) = specs(nBase, period)
    (sp.map(render(_, minLen)), edges, negEdges)
  }

  def toDf(spark: SparkSession, rows: Seq[Img]): DataFrame = {
    import spark.implicits._
    spark.createDataset(rows.sortBy(_.image_id)).toDF()
  }

  /** Distributed generation: specs parallelized, pixels rendered in
    * mapPartitions -- scales to bench sizes without serializing the driver.
    */
  def generateDf(spark: SparkSession, nBase: Int, minLen: Int = 32,
                 partitions: Int = 32, period: Int = 10): DataFrame = {
    import spark.implicits._
    val (sp, _, _) = specs(nBase, period)
    spark.createDataset(sp).repartition(partitions)
      .mapPartitions(_.map(render(_, minLen)))
      .toDF()
  }

  /** Generate once, cache as parquet, read back (idempotent per dir).
    * 96 output files: a small file has a single parquet row group, and a
    * row group is the minimum split unit -- with few fat files the scan
    * stage caps at file count tasks no matter how many cores exist. 96
    * keeps every scan-stage divisible by 8/16/32-core runs.
    */
  def writeFixture(spark: SparkSession, dir: String, nBase: Int,
                   period: Int = 10): DataFrame = {
    if (!new java.io.File(dir + "/_SUCCESS").exists()) {
      generateDf(spark, nBase, partitions = 96, period = period)
        .write.mode("overwrite").parquet(dir)
    }
    spark.read.parquet(dir)
  }
}
