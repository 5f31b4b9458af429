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
  * expressed as Spark ops. Each round costs exactly TWO exchanges:
  * a per-doc window (`lead(rank, 2^i)` -- positions are dense per doc,
  * so the rank at `pos + 2^i` is the rank 2^i ROWS ahead) and one
  * range-repartition sort inside which the dense re-rank is computed as
  * a running count of class boundaries (per-partition boundary counts +
  * first/last keys -- P small tuples -- go to the driver for the
  * cross-partition offsets; no third shuffle, no per-class window).
  * Ranks are EXACT equality classes of 2^i-byte prefixes (no hashing
  * anywhere), so the index -- and every query over it -- is
  * collision-free by construction. Suffixes never cross documents (the
  * reference's doc-sep exclusion, C3/C4): beyond-end compares as a
  * sentinel that sorts before every real byte, per-doc.
  *
  * The build stops at the Manber-Myers FIXED POINT: when a doubling
  * round does not increase the number of classes, the new partition is a
  * refinement of the old with the same class count, hence identical --
  * and then equality at depth 2^i implies equality at every greater
  * depth (E_{2s}=E_s gives E_{4s}(p,q) = p E_s q AND (p+2s) E_s (q+2s),
  * both implied), so the remaining rounds are no-ops and rank ties are
  * "equal through maxDepth" already. The class count falls out of the
  * re-rank pass for free, so corpora whose longest repeat is far below
  * `maxDepth` pay only the rounds they need.
  *
  * Scale shape: each round moves one narrow (k, pos, slen, rank, r2) row
  * per byte position through the two exchanges -- the same O(N) spine as
  * the sort-scan path, at most log2(maxDepth) times. Only per-partition
  * counts and boundary keys ever reach the driver, never data. That
  * N-log(depth) build cost is why the per-minLen sort-scan stays the
  * default for one-shot dedup; the index pays off when many minLens are
  * queried (measured in BASELINE.md).
  */
object SuffixIndex {

  /** `maxDepth`: suffixes are ordered by their first `maxDepth` bytes
    * (power of two); any `minLen <= maxDepth` is answerable. This is the
    * same bounded-depth contract as the default path (the reference only
    * ever compares `min_len` prefixes, cpp_engine_dedup.h:233) hoisted to
    * the index level: one build covers the reference's whole production
    * minlen range (200..1000 -> maxDepth 1024) instead of one minLen.
    * `parts`: range-partition width for the global sorts.
    * `lcpViaBytes`: how adjacent-suffix LCPs are computed.
    *   - Some(true) / default for maxDepth <= 512: ONE equi-join against
    *     a per-position prefix table (<= maxDepth bytes per row, sliced
    *     straight from the docs scan) + the adjacency join; ~2 exchanges
    *     shipping ~maxDepth B/row.
    *   - Some(false) / default above 512: the classic doubling walk over
    *     the retained level tables -- 2 narrow equi-joins per level,
    *     ~2·log2(maxDepth) exchanges shipping ~32 B/row. The crossover
    *     is where maxDepth bytes/row exceeds the walk's total narrow
    *     traffic (~64·log2(maxDepth) B/row).
    */
  case class Config(maxDepth: Int = 128, parts: Int = 32,
                    lcpViaBytes: Option[Boolean] = None)

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

  /** (k, pos, slen, rank, r2) -> ((k, pos, slen, rank'), nClasses):
    * rank' is the dense 1-based id of the row's (rank, r2) class in
    * (rank, r2) order -- the doubling re-rank -- computed inside ONE
    * range-repartition sort. Boundary flags are a sorted-run scan per
    * partition; the only driver traffic is one (firstKey, lastKey,
    * boundaryCount) tuple per partition, from which the cross-partition
    * class offsets (and the total class count, used for the fixed-point
    * stop) follow. Row count and partition iteration order are pinned by
    * the eager localCheckpoint, exactly like withRunningTotal.
    */
  private def classRanks(df: DataFrame, parts: Int): (DataFrame, Long) = {
    val spark = df.sparkSession
    import spark.implicits._
    val parted = df
      .repartitionByRange(parts, col("rank"), col("r2"))
      .sortWithinPartitions("rank", "r2")
      .withColumn("_pid", spark_partition_id())
      .select("k", "pos", "slen", "rank", "r2", "_pid")
      .as[(Long, Long, Long, Long, Long, Int)]
      .localCheckpoint(true)
    val stats = parted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val (_, _, _, r0, r20, pid) = it.next()
        var bounds = 1L
        var pr = r0; var pr2 = r20
        it.foreach { case (_, _, _, r, r2, _) =>
          if (r != pr || r2 != pr2) { bounds += 1; pr = r; pr2 = r2 }
        }
        Iterator.single((pid, r0, r20, pr, pr2, bounds))
      }
    }.collect().sortBy(_._1)
    // class-id base per partition: classes closed in earlier partitions,
    // minus one when this partition's first class continues the previous
    // non-empty partition's last class (range partitioning can split a
    // class across a partition boundary)
    var acc = 0L
    var prevLast: (Long, Long) = null
    val bases = stats.map { case (pid, fr, fr2, lr, lr2, bounds) =>
      val cont = prevLast != null && prevLast == ((fr, fr2))
      val base = if (cont) acc - 1L else acc
      acc = base + bounds
      prevLast = (lr, lr2)
      (pid, base)
    }.toMap
    val bcBases = spark.sparkContext.broadcast(bases)
    val ranked = parted.mapPartitions { it =>
      if (!it.hasNext) Iterator.empty
      else {
        val buf = it.buffered
        val base = bcBases.value(buf.head._6)
        var local = 0L
        var pr = Long.MinValue; var pr2 = Long.MinValue; var first = true
        buf.map { case (k, pos, slen, r, r2, _) =>
          if (first || r != pr || r2 != pr2) { local += 1; pr = r; pr2 = r2; first = false }
          (k, pos, slen, base + local)
        }
      }
    }.toDF("k", "pos", "slen", "rank")
    (ranked, acc)
  }

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
    val direct = cfg.lcpViaBytes.getOrElse(cfg.maxDepth <= 512)
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
    // (end-truncated) prefixes -- retained only for the walk-mode LCP
    val levels = scala.collection.mutable.ArrayBuffer(cur.select("k", "pos", "rank"))
    val byDoc = Window.partitionBy("k").orderBy("pos")
    var step = 1
    var prevClasses = -1L
    var fixed = false
    while (step < cfg.maxDepth && !fixed) {
      // rank of the suffix 2^i positions ahead IN THE SAME DOC; positions
      // are dense 0..len-1 per doc, so a row offset IS a byte offset.
      // 0 = the suffix ends within this half (beyond-end sentinel).
      val withR2 = cur.withColumn("r2",
        coalesce(lead(col("rank"), step).over(byDoc), lit(0L)))
      val (ranked, nClasses) = classRanks(withR2, cfg.parts)
      cur = ranked
      if (nClasses == prevClasses) {
        // Manber-Myers fixed point: same class count under refinement =
        // identical partition = stable at every further depth. The new
        // level table would duplicate the previous one; don't keep it.
        fixed = true
      } else {
        levels += cur.select("k", "pos", "rank")
      }
      prevClasses = nClasses
      step *= 2
    }

    // final bounded-depth order; (rank, k, pos) is unique so gidx is a
    // total order with rank-tied suffixes contiguous
    val ordered0 = withGlobalIndex(cur, Seq("rank", "k", "pos"), "gidx", cfg.parts)
      .localCheckpoint(true)

    if (direct) {
      // LCP by direct byte comparison: each position carries its (end-
      // truncated) maxDepth-byte prefix, sliced in the docs scan -- no
      // level joins. Rank ties cap at maxDepth (fixed-point ties are
      // equal at EVERY depth, so the cap is exact); untied neighbors
      // diverge strictly inside maxDepth, so the byte compare is exact.
      val prefixes = docs.select(col("k").cast("long"), col("text"))
        .as[(Long, String)]
        .flatMap { case (k, t) =>
          if (t == null) Iterator.empty
          else {
            val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            Iterator.range(0, b.length).map(p =>
              (k, p.toLong, java.util.Arrays.copyOfRange(
                b, p, math.min(b.length, p + cfg.maxDepth))))
          }
        }
        .toDF("k", "pos", "pfx")
      val withPfx = ordered0.join(prefixes, Seq("k", "pos"))
      val prev = withPfx.select((col("gidx") + 1L).as("gidx"),
        col("rank").as("prank"), col("pfx").as("ppfx"))
      withPfx.join(prev, Seq("gidx"), "left")
        .withColumn("lcp",
          when(col("prank").isNull, lit(null).cast("long"))
            .when(col("prank") === col("rank"), lit(cfg.maxDepth.toLong))
            .otherwise(graft.functions.GraftFunctions.lcp(col("pfx"), col("ppfx"))))
        .select("gidx", "k", "pos", "slen", "rank", "lcp")
    } else {
      val prev = ordered0.select((col("gidx") + 1L).as("gidx"),
        col("k").as("pk"), col("pos").as("ppos"), col("rank").as("prank"))
      var pairs = ordered0.join(prev, Seq("gidx"), "left")
        .withColumn("lcp",
          when(col("prank").isNull, lit(null).cast("long"))
            .when(col("prank") === col("rank"), lit(cfg.maxDepth.toLong))
            .otherwise(lit(0L)))
        .withColumn("_done", col("prank").isNull || col("prank") === col("rank"))

      // exact LCP with the previous suffix by the standard doubling walk,
      // high level to low: if the 2^i-prefix ranks at offset `lcp` agree,
      // the true lcp extends by 2^i. All joins are narrow equi-joins
      // against the pinned level tables -- no text bytes move. With an
      // early fixed-point stop, untied neighbors diverge strictly below
      // the deepest computed level, so the retained levels are complete.
      for (i <- (levels.size - 2) to 0 by -1) {
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
