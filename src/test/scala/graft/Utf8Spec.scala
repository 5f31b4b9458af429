package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.Utf8

/** Properties of UTF-8 clipping, mirroring the reference semantics
  * (write_back_to_jsonl_sharded.py:75-84) including the e == len guard.
  */
object Utf8Props extends Properties("Utf8") {

  private val charGen: Gen[String] = Gen.oneOf(
    Gen.alphaNumChar.map(_.toString),
    Gen.oneOf("é", "ü", "日", "本", "😊", "ñ", " ", "中"))
  private val textGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  private def isBoundary(b: Array[Byte], i: Int): Boolean =
    i == 0 || i == b.length || (b(i) & 0xc0) != 0x80

  property("clip lands on char boundaries, shrinks, keeps s<=e") =
    forAll(textGen, Gen.chooseNum(0, 60), Gen.chooseNum(0, 60)) { (t, x, y) =>
      val b = t.getBytes(UTF_8)
      val s0 = math.min(math.min(x, y), b.length).toLong
      val e0 = math.min(math.max(x, y), b.length).toLong
      // mirror the reference precondition: ranges at least one char wide or
      // empty -- clip can push s past e only if the whole range is inside
      // one multi-byte char, which real minLen>=4 windows can't produce.
      val (s, e) = try Utf8.clipRange(b, s0, e0) catch {
        case _: IllegalArgumentException => (-1L, -1L)
      }
      if (s < 0) Prop.passed // degenerate case rejected, as the reference asserts
      else Prop.all(
        Prop(s >= s0) :| "s advanced",
        Prop(e <= e0 || e == e0) :| "e never grows",
        Prop(s <= e) :| "s<=e",
        Prop(isBoundary(b, s.toInt)) :| "s boundary",
        Prop(e == b.length || isBoundary(b, e.toInt)) :| "e boundary",
        {
          val (s2, e2) = Utf8.clipRange(b, s, e)
          Prop(s2 == s && e2 == e) :| "idempotent"
        })
    }

  property("e == len is not retracted (doc-end guard)") = Prop {
    val b = "a日".getBytes(UTF_8) // 1 + 3 bytes
    val (s, e) = Utf8.clipRange(b, 0, b.length.toLong)
    s == 0 && e == b.length
  }

  property("mid-char end retracts to char start") = Prop {
    val b = "a日b".getBytes(UTF_8) // 'a'(1) '日'(3 at 1..3) 'b'(1 at 4)
    val (s, e) = Utf8.clipRange(b, 0, 2) // e=2 is inside 日
    s == 0 && e == 1
  }

  property("mid-char start advances to next char start") = Prop {
    val b = "日b".getBytes(UTF_8)
    val (s, e) = Utf8.clipRange(b, 1, 4) // s=1 inside 日
    s == 3 && e == 4
  }

  property("keepRanges complement + removeRanges reassembly") =
    forAll(textGen) { t =>
      val b = t.getBytes(UTF_8)
      // remove nothing -> identity; remove everything -> empty
      val id = Utf8.removeRanges(b, Seq.empty)
      val none = Utf8.removeRanges(b, Seq((0L, b.length.toLong)))
      Prop(id == t) && Prop(none == "")
    }

  property("removeRanges drops exactly the ranged bytes") = Prop {
    val t = "hello world again"
    val b = t.getBytes(UTF_8)
    Utf8.removeRanges(b, Seq((5L, 11L))) == "hello again"
  }
}
