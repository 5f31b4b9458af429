package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed bounded-depth suffix index via prefix doubling -- the
  * build-once / query-many-minLens fidelity stage.
  *
  * The reference builds its suffix array ONCE (rust_indexing sidecar,
  * README.md:44-48) and then answers `find_remove_ranges` at any
  * `min_len` without re-indexing (workflow_v1.sh minlen=500 vs
  * workflow_pileval.sh minlen=200 reuse the same index). Our default
  * per-minLen sort-scan (SubstringDedup.removeRanges*) re-pays the full
  * window exchange per minLen; this operator closes that gap: one
  * prefix-doubling build to `maxDepth`, then any `minLen <= maxDepth`
  * remove-ranges query is a narrow scan over the prebuilt
  * (order, lcp) table.
  *
  * Construction is the textbook prefix-doubling recurrence (Manber-Myers)
  * expressed as Spark relational ops, log2(maxDepth) rounds of:
  * sort-by-(rank, rank-at-offset-2^i) -> dense-ish re-rank. Ranks are
  * EXACT equality classes of 2^i-byte prefixes (no hashing anywhere), so
  * the index -- and every query over it -- is collision-free by
  * construction. Suffixes never cross documents (the reference's doc-sep
  * exclusion, C3/C4): beyond-end compares as a sentinel that sorts before
  * every real byte, per-doc.
  *
  * Scale shape: each round moves one narrow (k, pos, rank, r2) row per
  * byte position through a range-repartition sort -- the same O(N)
  * exchange spine as the sort-scan path, log2(maxDepth) times. Only
  * per-partition COUNTS ever reach the driver (the distributed
  * zip-with-index offsets), never data. That 8-ish-N-log(depth) build
  * cost is why the per-minLen sort-scan stays the default for one-shot
  * dedup; the index pays off when >= 2 minLens are queried (measured in
  * BASELINE.md).
  */
object SuffixIndex {

  /** `maxDepth`: suffixes are ordered by their first `maxDepth` bytes
    * (power of two); any `minLen <= maxDepth` is answerable. This is the
    * same bounded-depth contract as the default path (the reference only
    * ever compares `min_len` prefixes, cpp_engine_dedup.h:233) hoisted to
    * the index level: one build covers the reference's whole production
    * minlen range (200..1000 -> maxDepth 1024) instead of one minLen.
    * `parts`: range-partition width for the global sorts.
    */
  case class Config(maxDepth: Int = 128, parts: Int = 32)

  /** Running total of `value` over the global `orderCols` order WITHOUT a
    * single-partition window: range-repartition + in-partition window,
    * with cross-partition offsets from a per-partition count aggregation
    * (P longs to the driver, broadcast back). Ties in `orderCols` all
    * receive the tie-group's closing total (RANGE frame) -- callers
    * either have unique keys or only need order-isomorphic values.
    */
  private def withRunningTotal(df: DataFrame, orderCols: Seq[String],
                               value: Column, name: String,
                               parts: Int): DataFrame = {
    val oc = orderCols.map(col)
    val parted = df.withColumn("_v", value)
      .repartitionByRange(parts, oc: _*)
      .sortWithinPartitions(oc: _*)
      .withColumn("_pid", spark_partition_id())
      .localCheckpoint(true) // pin: _pid must agree across the two jobs below
    val perPart = parted.groupBy("_pid").agg(sum("_v").as("_s"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = perPart.map { case (pid, s) => val o = (pid, acc); acc += s; o }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF("_pid", "_off"))
    val w = Window.partitionBy("_pid").orderBy(oc: _*)
    parted.join(offDf, "_pid")
      .withColumn(name, col("_off") + sum(col("_v")).over(w))
      .drop("_pid", "_v", "_off")
  }

  /** Dense global row index (0-based) over `orderCols` order. */
  private def withGlobalIndex(df: DataFrame, orderCols: Seq[String],
                              name: String, parts: Int): DataFrame =
    withRunningTotal(df, orderCols, lit(1L), name, parts)
      .withColumn(name, col(name) - 1L)

  /** docs(k, text) -> index(gidx, k, pos, slen, rank, lcp):
    * one row per byte position, in bounded-depth suffix order (`gidx`
    * dense, `rank` ties = suffixes equal through maxDepth bytes), with
    * `lcp` = longest common prefix with the PREVIOUS row in that order,
    * capped at maxDepth (null on the first row). `slen` = bytes remaining
    * in the suffix's document.
    */
  def build(docs: DataFrame, cfg: Config): DataFrame = {
    require(cfg.maxDepth >= 2 && (cfg.maxDepth & (cfg.maxDepth - 1)) == 0,
      s"maxDepth ${cfg.maxDepth} must be a power of two")
    val levelsCount = java.lang.Integer.numberOfTrailingZeros(cfg.maxDepth)
    val spark = docs.sparkSession
    import spark.implicits._

    // one row per byte position; level-0 rank = unsigned byte + 1
    // (order-isomorphic to byte lex order; 0 is the beyond-end sentinel,
    // so a shorter suffix sorts before every extension of it)
    var cur = docs.select(col("k").cast("long"), col("text"))
      .as[(Long, String)]
      .flatMap { case (k, t) =>
        if (t == null) Iterator.empty
        else {
          val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
          Iterator.range(0, b.length).map(p =>
            (k, p.toLong, (b.length - p).toLong, (b(p) & 0xff).toLong + 1L))
        }
      }
      .toDF("k", "pos", "slen", "rank")
      .localCheckpoint(true)

    // level tables: levels(i) holds exact equality classes of 2^i-byte
    // (end-truncated) prefixes -- kept for the LCP doubling walk below
    val levels = scala.collection.mutable.ArrayBuffer(cur.select("k", "pos", "rank"))
    var step = 1
    while (step < cfg.maxDepth) {
      val shifted = cur.select(col("k"), (col("pos") - step).as("pos"),
        col("rank").as("r2"))
      val paired = cur.join(shifted, Seq("k", "pos"), "left")
        .na.fill(0L, Seq("r2")) // 0 = suffix ends within this half
      // new rank = any order-isomorphic id of the (rank, r2) class: the
      // class's closing running-count in (rank, r2) order, PLUS ONE --
      // rank 0 is reserved for the beyond-end sentinel, and the smallest
      // class would otherwise collide with it
      val idx = withGlobalIndex(paired, Seq("rank", "r2"), "_g", cfg.parts)
      cur = idx
        .withColumn("rank", max(col("_g")).over(
          Window.partitionBy(col("rank"), col("r2"))) + 1L)
        .select("k", "pos", "slen", "rank")
        .localCheckpoint(true)
      levels += cur.select("k", "pos", "rank")
      step *= 2
    }

    // final bounded-depth order; (rank, k, pos) is unique so gidx is a
    // total order with rank-tied suffixes contiguous
    val ordered = withGlobalIndex(cur, Seq("rank", "k", "pos"), "gidx", cfg.parts)
      .localCheckpoint(true)
    val prev = ordered.select((col("gidx") + 1L).as("gidx"),
      col("k").as("pk"), col("pos").as("ppos"), col("rank").as("prank"))
    var pairs = ordered.join(prev, Seq("gidx"), "left")
      .withColumn("lcp",
        when(col("prank").isNull, lit(null).cast("long"))
          .when(col("prank") === col("rank"), lit(cfg.maxDepth.toLong))
          .otherwise(lit(0L)))
      .withColumn("_done", col("prank").isNull || col("prank") === col("rank"))

    // exact LCP with the previous suffix by the standard doubling walk,
    // high level to low: if the 2^i-prefix ranks at offset `lcp` agree,
    // the true lcp extends by 2^i. All joins are narrow equi-joins
    // against the pinned level tables -- no text bytes move.
    for (i <- (levelsCount - 1) to 0 by -1) {
      val len = 1L << i
      val a = levels(i).select(col("k").as("ak"), col("pos").as("apos"),
        col("rank").as("ar"))
      val b = levels(i).select(col("k").as("bk"), col("pos").as("bpos"),
        col("rank").as("br"))
      pairs = pairs
        .join(a, col("k") === col("ak") &&
          col("pos") + col("lcp") === col("apos"), "left")
        .join(b, col("pk") === col("bk") &&
          col("ppos") + col("lcp") === col("bpos"), "left")
        .withColumn("lcp",
          when(!col("_done") && col("ar").isNotNull && col("ar") === col("br"),
            col("lcp") + len).otherwise(col("lcp")))
        .drop("ak", "apos", "ar", "bk", "bpos", "br")
      pairs = pairs.localCheckpoint(true) // bound the 2-joins-per-level plan
    }
    pairs.select("gidx", "k", "pos", "slen", "rank", "lcp")
  }

  /** Remove-ranges at any `minLen <= maxDepth` from a prebuilt index --
    * NO re-sort, no window exchange: eligible suffixes (slen >= minLen)
    * in index order segment into equal-minLen-prefix classes wherever the
    * stored adjacent lcp stays >= minLen; every class member except the
    * first-occurrence (min (k, pos)) keeper is removable. Result is
    * byte-identical to SubstringDedup.removeRanges at the same minLen
    * (differential-tested).
    *
    * Stored lcp is with the ORIGINAL previous row, which may be an
    * ineligible short suffix -- still correct: any suffix lying between
    * two class members in suffix order shares their class prefix
    * (betweenness), so it is at least minLen long and thus eligible;
    * boundaries flagged through a filtered-out short row are real
    * boundaries.
    */
  def removeRanges(index: DataFrame, minLen: Int): DataFrame = {
    val parts = index.sparkSession.conf
      .getOption("spark.sql.shuffle.partitions").map(_.toInt).getOrElse(32)
    val eligible = index.where(col("slen") >= minLen)
      .withColumn("brk",
        when(col("lcp").isNull || col("lcp") < minLen, 1L).otherwise(0L))
    val seg = withRunningTotal(eligible, Seq("gidx"), col("brk"), "seg", parts)
    val keep = seg.groupBy("seg")
      .agg(min(struct(col("k"), col("pos"))).as("kp"))
    val removable = seg.join(keep, "seg")
      .where(col("k") =!= col("kp.k") || col("pos") =!= col("kp.pos"))
      .select("k", "pos")
    SubstringDedup.coalesceRanges(removable, minLen)
  }
}
