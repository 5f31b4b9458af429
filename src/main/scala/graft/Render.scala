package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.{DataFrame, Row}

/** B10: human-verification overlay renderers -- the reference's debugging
  * loop paints each dup doc with kept spans green and dropped spans red
  * (find_dup_docs.cpp:18-68 ANSI codes; verify_zst_alldressed.py:25-34
  * re-checks writeback the same way). Driver-side, bounded: these render
  * a HANDFUL of collected rows for eyeballing, never a corpus.
  *
  * Ranges are [s, e) byte offsets into the UTF-8 encoding (the
  * sa_remove_ranges contract -- already clipped to char boundaries by
  * Utf8.clip, so slicing at them never splits a code point).
  */
object Render {

  private val Green = "\u001b[32m"
  private val Red = "\u001b[31m"
  private val Reset = "\u001b[0m"

  private def segments(text: String, ranges: Seq[(Long, Long)]): Seq[(String, Boolean)] = {
    val b = text.getBytes(UTF_8)
    val sorted = ranges.sortBy(_._1)
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Boolean)]
    var cur = 0
    for ((s, e) <- sorted) {
      val si = math.max(cur, math.min(s.toInt, b.length))
      val ei = math.max(si, math.min(e.toInt, b.length))
      if (cur < si) out += ((new String(b, cur, si - cur, UTF_8), false))
      if (si < ei) out += ((new String(b, si, ei - si, UTF_8), true))
      cur = math.max(cur, ei)
    }
    if (cur < b.length) out += ((new String(b, cur, b.length - cur, UTF_8), false))
    out.toSeq
  }

  /** One doc as an ANSI terminal line: kept green, removed red. */
  def ansiDoc(text: String, ranges: Seq[(Long, Long)]): String =
    segments(text, ranges).map {
      case (seg, true) => s"$Red$seg$Reset"
      case (seg, false) => s"$Green$seg$Reset"
    }.mkString

  private def escape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One doc as an HTML fragment: <span class="kept|dropped">. */
  def htmlDoc(text: String, ranges: Seq[(Long, Long)]): String =
    segments(text, ranges).map {
      case (seg, true) => s"""<span class="dropped">${escape(seg)}</span>"""
      case (seg, false) => s"""<span class="kept">${escape(seg)}</span>"""
    }.mkString

  /** Render up to `limit` rows of an annotate-mode output
    * (k, text, sa_remove_ranges) -- one ANSI or HTML block per doc,
    * docs with no removed spans skipped. The collect is bounded by
    * `limit`; this is the diagnostic endpoint, not an operator.
    */
  def annotated(df: DataFrame, limit: Int = 20, html: Boolean = false): String = {
    val rows = df.select("k", "text", "sa_remove_ranges").limit(limit).collect()
    val blocks = rows.toSeq.flatMap { r: Row =>
      val ranges = r.getSeq[Row](2).map(rr => (rr.getLong(0), rr.getLong(1)))
      if (ranges.isEmpty) None
      else {
        val body = if (html) htmlDoc(r.getString(1), ranges) else ansiDoc(r.getString(1), ranges)
        Some(s"--- k=${r.getLong(0)} (${ranges.size} removed spans) ---\n$body")
      }
    }
    blocks.mkString("\n")
  }
}
