package graft

import java.nio.charset.StandardCharsets.UTF_8

/** Brute-force reimplementation of the reference naive dedup semantics
  * (cpp_engine_dedup.h:215-302) shared by the differential specs: group
  * positions by actual window bytes, keep the (k,pos)-minimum, coalesce
  * the rest per doc with overlap-or-touch.
  */
object DedupTestOracle {

  def bruteRanges(docs: Seq[(Long, String)], minLen: Int): Set[(Long, Long, Long)] = {
    val wins = for {
      (k, t) <- docs
      b = t.getBytes(UTF_8)
      p <- 0 to b.length - minLen
    } yield (b.slice(p, p + minLen).toSeq, (k, p.toLong))
    val removable = wins.groupBy(_._1).values.flatMap { g =>
      val members = g.map(_._2).sorted
      members.filterNot(_ == members.head)
    }.toSeq.distinct
    removable.groupBy(_._1).flatMap { case (k, ps) =>
      val sorted = ps.map(_._2).sorted
      val ranges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for (p <- sorted) {
        if (ranges.nonEmpty && ranges.last._2 >= p)
          ranges(ranges.length - 1) = (ranges.last._1, p + minLen)
        else ranges += ((p, p + minLen))
      }
      ranges.map { case (s, e) => (k, s, e) }
    }.toSet
  }

  /** Independent UTF-8 clip (reference write_back_to_jsonl_sharded.py:75-84
    * semantics, re-derived here so tests don't reuse the library's clip).
    */
  def clipIndependent(b: Array[Byte], s0: Long, e0: Long): (Long, Long) = {
    def cont(x: Byte) = (x & 0xc0) == 0x80
    var s = s0.toInt
    while (s < b.length && cont(b(s))) s += 1
    var e = e0.toInt
    if (e != b.length) { while (e > 0 && cont(b(e))) e -= 1 }
    assert(s <= e)
    (s.toLong, e.toLong)
  }
}
