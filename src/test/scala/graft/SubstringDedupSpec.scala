package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.SubstringDedup
import graft.functions.Utf8

/** Differential tests: both distributed plans (hash-agg and sort-scan)
  * against a brute-force reimplementation of the reference naive mode
  * (cpp_engine_dedup.h:215-302) on small random corpora -- the same
  * correctness strategy the reference itself uses (naive vs parallel vs
  * parallel_sharded, workflow_toy.sh:16-33).
  */
class SubstringDedupSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Brute-force oracle (shared with the end-to-end JSONL differential). */
  def bruteRanges(docs: Seq[(Long, String)], minLen: Int): Set[(Long, Long, Long)] =
    DedupTestOracle.bruteRanges(docs, minLen)

  def randomDocs(seed: Int, n: Int, alphabet: String): Seq[(Long, String)] = {
    val r = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = r.nextInt(80)
      (i.toLong, (0 until len).map(_ => alphabet(r.nextInt(alphabet.length))).mkString)
    }
  }

  def spark_(docs: Seq[(Long, String)]) = docs.toDF("k", "text")

  test("all three plans (default verify on/off, hash-agg, sort-scan) match brute force") {
    for (seed <- Seq(1, 2, 3)) {
      val docs = randomDocs(seed, 25, "abc") // tiny alphabet -> dense dup structure
      val expected = bruteRanges(docs, 6)
      val df = spark_(docs)
      val got = SubstringDedup.removeRanges(df, SubstringDedup.Config(6))
        .as[(Long, Long, Long)].collect().toSet
      val gotNoVerify = SubstringDedup.removeRanges(df, SubstringDedup.Config(6, verifyBytes = false))
        .as[(Long, Long, Long)].collect().toSet
      val gotHashAgg = SubstringDedup.removeRangesHashAgg(df, SubstringDedup.Config(6))
        .as[(Long, Long, Long)].collect().toSet
      val gotHashAggNoVerify = SubstringDedup.removeRangesHashAgg(df, SubstringDedup.Config(6, verifyBytes = false))
        .as[(Long, Long, Long)].collect().toSet
      val gotSortScan = SubstringDedup.removeRangesSortScan(df, 6)
        .as[(Long, Long, Long)].collect().toSet
      val gotHybrid = SubstringDedup.removeRangesHybrid(df, SubstringDedup.Config(6))
        .as[(Long, Long, Long)].collect().toSet
      // tiny-alphabet corpora are DENSE (adaptive takes the sort-scan
      // arm); threshold 1.0 forces the hybrid arm so both are exercised
      val gotAdaptive = SubstringDedup.removeRangesAdaptive(df, SubstringDedup.Config(6))
        .as[(Long, Long, Long)].collect().toSet
      val gotAdaptiveHybrid = SubstringDedup.removeRangesAdaptive(df, SubstringDedup.Config(6), 1.0)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == expected, s"default seed=$seed")
      assert(gotNoVerify == expected, s"no-verify seed=$seed")
      assert(gotHashAgg == expected, s"hash-agg seed=$seed")
      assert(gotHashAggNoVerify == expected, s"hash-agg-no-verify seed=$seed")
      assert(gotSortScan == expected, s"sort-scan seed=$seed")
      assert(gotHybrid == expected, s"hybrid seed=$seed")
      assert(gotAdaptive == expected, s"adaptive seed=$seed")
      assert(gotAdaptiveHybrid == expected, s"adaptive-hybrid seed=$seed")
    }
  }

  /** Token-mode brute oracle: first-occurrence keep over minLenTok-token
    * windows of the (optionally reversed) whitespace token stream,
    * interval union in token offsets.
    */
  private def bruteTokenRanges(docs: Seq[(Long, String)], minLenTok: Int,
                               reversed: Boolean): Set[(Long, Long, Long)] = {
    val toks = docs.map { case (k, t) =>
      val ws = t.split(' ').filter(_.nonEmpty)
      (k, if (reversed) ws.reverse else ws)
    }
    val seen = scala.collection.mutable.Set.empty[Seq[String]]
    val removable = scala.collection.mutable.ArrayBuffer.empty[(Long, Int)]
    for ((k, ws) <- toks.sortBy(_._1); pos <- 0 to ws.length - minLenTok) {
      val w = ws.slice(pos, pos + minLenTok).toSeq
      if (seen(w)) removable += ((k, pos)) else seen += w
    }
    removable.groupBy(_._1).flatMap { case (k, ps) =>
      val sorted = ps.map(_._2).sorted
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      var s = sorted.head; var e = sorted.head + minLenTok
      for (p <- sorted.tail) {
        if (p <= e) e = p + minLenTok
        else { out += ((k, s.toLong, e.toLong)); s = p; e = p + minLenTok }
      }
      out += ((k, s.toLong, e.toLong))
      out
    }.toSet
  }

  test("token-unit dedup (C2): forward and reversed match brute force") {
    val words = "aa bb cc dd ee".split(" ")
    val r = new scala.util.Random(5)
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until r.nextInt(30)).map(_ => words(r.nextInt(words.length))).mkString(" "))
    }
    val df = spark_(docs)
    for (rev <- Seq(false, true); verify <- Seq(true, false)) {
      val got = SubstringDedup.removeRangesTokens(df, 4, verify = verify, reversed = rev)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteTokenRanges(docs, 4, rev), s"reversed=$rev verify=$verify")
    }
  }

  test("ids-unit dedup (C2 production shape): matches token-unit under an injective vocab") {
    // same corpus as the token test, pre-tokenized through an injective
    // vocab (word -> index): the ids-mode result must equal the
    // token-mode result position for position, forward and reversed
    val words = "aa bb cc dd ee".split(" ")
    val vocab = words.zipWithIndex.toMap
    val r = new scala.util.Random(5)
    val docs = (0 until 30).map { i =>
      (i.toLong, (0 until r.nextInt(30)).map(_ => words(r.nextInt(words.length))).mkString(" "))
    }
    val textDf = spark_(docs)
    val idsDf = docs.map { case (k, t) =>
      (k, t.split(' ').filter(_.nonEmpty).map(w => vocab(w).toLong))
    }.toDF("k", "tokens")
    for (rev <- Seq(false, true); verify <- Seq(true, false)) {
      val viaTokens = SubstringDedup.removeRangesTokens(textDf, 4, verify = verify, reversed = rev)
        .as[(Long, Long, Long)].collect().toSet
      val viaIds = SubstringDedup.removeRangesIds(idsDf, 4, verify = verify, reversed = rev)
        .as[(Long, Long, Long)].collect().toSet
      assert(viaIds == viaTokens, s"reversed=$rev verify=$verify")
    }
    // ids ARE the content: two docs with different provenance but equal
    // id runs dedup against each other (second occurrence removed)
    val run = Array.tabulate(6)(i => (100 + i).toLong)
    val planted = Seq(
      (1L, run ++ Array(7L, 8L)),
      (2L, Array(9L) ++ run)).toDF("k", "tokens")
    val got = SubstringDedup.removeRangesIds(planted, 6)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((2L, 1L, 7L)))
  }

  test("A7 slices + B10 render: dropped spans carry the actual window text and paint red") {
    val dup = "0123456789abcdefghij" // 20 bytes, minLen 10
    val docs = Seq((1L, s"$dup and a tail unique to doc one"),
                   (2L, s"prefix two $dup suffix <two>"))
    val df = spark_(docs)
    val slices = SubstringDedup.dupDocSlices(df, SubstringDedup.Config(10))
      .as[(Long, Long, Boolean, String)].collect()
    // every dropped slice in doc 2 must be an actual substring of doc 2
    val dropped = slices.filter(s => s._1 == 2L && s._3)
    assert(dropped.nonEmpty)
    dropped.foreach { case (_, pos, _, snip) =>
      assert(docs(1)._2.substring(pos.toInt, pos.toInt + 10) == snip)
    }
    // doc 1 holds the kept (first-occurrence) copies
    assert(slices.filter(s => s._1 == 1L).forall(!_._3))

    val ann = SubstringDedup.annotate(df, SubstringDedup.Config(10))
    val ansi = Render.annotated(ann)
    assert(ansi.contains("\u001b[31m")) // a red (removed) span exists
    assert(ansi.contains(dup)) // the duplicated run is painted
    val html = Render.annotated(ann, html = true)
    assert(html.contains("""<span class="dropped">"""))
    assert(html.contains("&lt;two&gt;")) // escaping
  }

  test("B10 render: multi-byte text slices at clipped boundaries without mojibake") {
    val dup = "日本語のテキストですね全部で" // 14 chars x 3 bytes = 42 bytes
    val docs = Seq((1L, s"first $dup copy"), (2L, s"zwei $dup copy two")).toDF("k", "text")
    val ann = SubstringDedup.annotate(docs, SubstringDedup.Config(12))
    val ansi = Render.annotated(ann)
    // rendered segments re-decode cleanly: no replacement characters
    assert(!ansi.contains("�"))
    assert(ansi.contains("\u001b[31m")) // something was painted red
    val html = Render.annotated(ann, html = true)
    assert(!html.contains("�") && html.contains("""<span class="dropped">"""))
  }

  test("suffix index: one prefix-doubling build answers multiple minLens == per-minLen path") {
    // docs long enough for minLen 32/64 windows, with planted verbatim
    // copies (cross-doc dups) and a repeated intra-doc run
    val r = new scala.util.Random(11)
    val base = (0 until 12).map { i =>
      (i.toLong, (0 until (70 + r.nextInt(60))).map(_ => "abcd"(r.nextInt(4))).mkString)
    }
    val docs = base ++ base.take(4).map { case (k, t) => (k + 100L, t) } :+
      (200L, base.head._2.take(70) * 2) // intra-doc repeat of a 70-byte run
    val df = spark_(docs)
    // both LCP modes: direct byte-compare (small-maxDepth default) and
    // the doubling walk over level tables (large-maxDepth default)
    for (viaBytes <- Seq(true, false)) {
      val index = operators.SuffixIndex.build(df,
        operators.SuffixIndex.Config(maxDepth = 64, parts = 8,
          lcpViaBytes = Some(viaBytes)))
        .localCheckpoint(true) // build once, query twice
      for (minLen <- Seq(32, 64)) {
        val viaIndex = operators.SuffixIndex.removeRanges(index, minLen)
          .as[(Long, Long, Long)].collect().toSet
        val perMinLen = SubstringDedup.removeRanges(df, SubstringDedup.Config(minLen))
          .as[(Long, Long, Long)].collect().toSet
        assert(viaIndex == perMinLen, s"minLen=$minLen viaBytes=$viaBytes")
        assert(viaIndex == bruteRanges(docs, minLen), s"minLen=$minLen viaBytes=$viaBytes vs brute")
      }
    }
  }

  test("suffix index: removeRanges on a NON-gidx-aligned index falls back and stays exact") {
    // the fast query path rides the build's gidx-aligned layout; an index
    // re-shuffled into arbitrary partitions (a storage re-read) must be
    // detected by the layout validation and answered by the sorting
    // fallback with identical results
    val r = new scala.util.Random(7)
    val base = (0 until 10).map { i =>
      (i.toLong, (0 until (60 + r.nextInt(40))).map(_ => "abcd"(r.nextInt(4))).mkString)
    }
    val docs = base ++ base.take(3).map { case (k, t) => (k + 100L, t) }
    val df = spark_(docs)
    val index = operators.SuffixIndex.build(df,
      operators.SuffixIndex.Config(maxDepth = 32, parts = 4))
    val expected = SubstringDedup.removeRanges(df, SubstringDedup.Config(32))
      .as[(Long, Long, Long)].collect().toSet
    // aligned fresh build -> fast path
    assert(operators.SuffixIndex.removeRanges(index, 32)
      .as[(Long, Long, Long)].collect().toSet == expected)
    // minLen == maxDepth declared-depth shortcut (per-row lcp predicate,
    // no layout probe / keeper join) -> identical ranges; also on a
    // reshuffled layout, since the predicate is layout-independent
    assert(operators.SuffixIndex.removeRanges(index, 32, indexDepth = 32)
      .as[(Long, Long, Long)].collect().toSet == expected)
    assert(operators.SuffixIndex.removeRanges(
        index.repartition(5, col("k")).localCheckpoint(true), 32, indexDepth = 32)
      .as[(Long, Long, Long)].collect().toSet == expected)
    // hash-reshuffled index -> layout check fails -> sorting fallback
    val shuffled = index.repartition(5, col("k")).localCheckpoint(true)
    assert(operators.SuffixIndex.removeRanges(shuffled, 32)
      .as[(Long, Long, Long)].collect().toSet == expected)
    // the fallback entry point itself, on the aligned index too
    assert(operators.SuffixIndex.removeRangesSorted(index, 32)
      .as[(Long, Long, Long)].collect().toSet == expected)
  }

  test("suffix index: fixed-point early stop (maxDepth far above longest repeat) stays exact") {
    // longest repeated substring is ~6 bytes but maxDepth is 256: the
    // class partition stabilizes after ~3 doubling rounds and the build
    // must stop there without changing any answer
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"),
      (3L, "sphinx of black quartz judge my vow"))
    val df = spark_(docs)
    for (viaBytes <- Seq(true, false)) {
      val idx = operators.SuffixIndex.build(df,
        operators.SuffixIndex.Config(maxDepth = 256, parts = 4,
          lcpViaBytes = Some(viaBytes)))
      val viaIndex = operators.SuffixIndex.removeRanges(idx, 4)
        .as[(Long, Long, Long)].collect().toSet
      assert(viaIndex == bruteRanges(docs, 4), s"viaBytes=$viaBytes")
    }
  }

  test("suffix index: lcp values are exact against brute-force suffix comparison") {
    val docs = Seq((1L, "banana"), (2L, "bananas are bananas"), (3L, "anab"))
    val df = spark_(docs)
    val maxDepth = 8
    for (viaBytes <- Seq(true, false)) {
    val idx = operators.SuffixIndex.build(df,
      operators.SuffixIndex.Config(maxDepth, parts = 4, lcpViaBytes = Some(viaBytes)))
      .orderBy("gidx")
      .select("k", "pos", "lcp").as[(Long, Long, Option[Long])].collect()
    val texts = docs.toMap
    def suffix(k: Long, p: Long): String = {
      val t = texts(k); t.substring(p.toInt, math.min(t.length, p.toInt + maxDepth))
    }
    // brute order: bounded-depth suffixes, ties by (k, pos)
    val bruteOrder = docs.flatMap { case (k, t) =>
      (0 until t.length).map(p => (suffix(k, p), k, p.toLong))
    }.sorted
    idx.zipWithIndex.foreach { case ((k, p, lcpOpt), i) =>
      val (bs, bk, bp) = bruteOrder(i)
      // rank ties may permute, but the bounded suffix STRING at each
      // order slot is unique-or-tied, so compare strings not (k,pos)
      assert(suffix(k, p) == bs, s"order slot $i: (${k},${p}) vs (${bk},${bp})")
      if (i == 0) assert(lcpOpt.isEmpty)
      else {
        val prevS = bruteOrder(i - 1)._1
        // bounded-equal suffixes (rank ties, incl. truncated-equal) store
        // the cap; otherwise the exact common-prefix length
        val expected =
          if (bs == prevS) maxDepth
          else math.min(bs.zip(prevS).takeWhile { case (a, b) => a == b }.size, maxDepth)
        assert(lcpOpt.contains(expected.toLong), s"slot $i lcp (viaBytes=$viaBytes): got $lcpOpt want $expected")
      }
    }
    }
  }

  test("A9 index-order verification: sorted window frame has no violations") {
    for (seed <- Seq(1, 4)) {
      val docs = spark_(randomDocs(seed, 40, "ab")) // dense duplicate runs
      assert(SubstringDedup.windowOrderViolations(docs, 6).count() == 0)
    }
  }

  test("multi-byte UTF-8: brute force agreement + annotate clips to char boundaries") {
    val docs = randomDocs(7, 20, "a日é😊b ")
    val minLen = 8
    val expected = bruteRanges(docs, minLen)
    val df = spark_(docs)
    val got = SubstringDedup.removeRanges(df, SubstringDedup.Config(minLen))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)

    val annotated = SubstringDedup.annotate(df, SubstringDedup.Config(minLen))
    val byK = docs.toMap
    annotated.select($"k", $"sa_remove_ranges").as[(Long, Seq[(Long, Long)])]
      .collect().foreach { case (k, ranges) =>
        val b = byK(k).getBytes(UTF_8)
        ranges.foreach { case (s, e) =>
          assert(s <= e)
          assert(s == b.length || (b(s.toInt) & 0xc0) != 0x80, s"k=$k s=$s not boundary")
          assert(e == b.length || (b(e.toInt) & 0xc0) != 0x80, s"k=$k e=$e not boundary")
          // clip only shrinks: re-clipping is identity
          assert(Utf8.clipRange(b, s, e) == ((s, e)))
        }
        // ranges stay sorted + disjoint after clipping
        ranges.sliding(2).foreach {
          case Seq((_, e1), (s2, _)) => assert(e1 <= s2)
          case _ =>
        }
      }
  }

  test("remove mode cuts exactly the clipped ranges") {
    val docs = Seq(
      (0L, "0123456789abcdefghij"),
      (1L, "xx0123456789abcdefghijyy")) // shares a 20-byte run
    val minLen = 10
    val out = SubstringDedup.remove(spark_(docs), SubstringDedup.Config(minLen))
      .select($"k", $"text_deduped").as[(Long, String)].collect().toMap
    assert(out(0L) == "0123456789abcdefghij") // first occurrence kept whole
    assert(out(1L) == "xxyy") // duplicated middle removed
  }

  test("docs shorter than minLen produce no windows and survive annotate") {
    val docs = Seq((0L, "short"), (1L, "short"), (2L, ""))
    val ranges = SubstringDedup.removeRanges(spark_(docs), SubstringDedup.Config(32))
    assert(ranges.count() == 0)
    val ann = SubstringDedup.annotate(spark_(docs), SubstringDedup.Config(32))
    assert(ann.count() == 3)
    assert(ann.where(size($"sa_remove_ranges") =!= 0).count() == 0)
  }

  test("first occurrence kept under (k, pos) order: dup_ptrs flags") {
    val docs = Seq((5L, "ABCDEFGHIJKLMNOP"), (2L, "ABCDEFGHIJKLMNOP"))
    val dp = SubstringDedup.dupPtrs(spark_(docs), SubstringDedup.Config(16))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(dp == Set((2L, 0L, false), (5L, 0L, true))) // k=2 is first
  }
}
