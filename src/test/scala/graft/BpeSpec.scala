package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Bpe
import graft.operators.SubstringDedup

/** The in-repo byte-level BPE front end for --unit ids: lossless
  * round-trips, merges.txt-shaped vocab file I/O, deterministic
  * training, and the end-to-end text -> BPE ids -> removeRangesIds
  * chain agreeing with byte-level intuition on planted duplicates.
  */
class BpeSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val corpus = Seq(
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps while the quick fox runs",
    "pack my box with five dozen liquor jugs",
    "the the the quick quick lazy lazy dog dog")

  test("encode/decode round-trips every word, including multi-byte UTF-8") {
    val vocab = Bpe.train(corpus, 50)
    assert(vocab.merges.size == 50)
    for (text <- corpus :+ "café naïve 日本語 words") {
      for (w <- text.split(' ').filter(_.nonEmpty)) {
        val ids = Bpe.encodeWord(w, vocab)
        assert(Bpe.decodeWord(ids.toSeq, vocab) == w, s"word $w")
        assert(ids.forall(i => i >= 0 && i < vocab.size))
      }
    }
    // frequent words compress: "the" appears most, should be few symbols
    assert(Bpe.encodeWord("the", vocab).length < 3)
  }

  test("vocab file save/load round-trips byte-for-byte, ids stable") {
    val vocab = Bpe.train(corpus, 30)
    val p = java.nio.file.Files.createTempFile("graft_bpe", ".merges").toString
    Bpe.save(vocab, p)
    val back = Bpe.load(p)
    assert(back.merges == vocab.merges)
    val w = "quick"
    assert(Bpe.encodeWord(w, back).toSeq == Bpe.encodeWord(w, vocab).toSeq)
  }

  test("training is deterministic") {
    val a = Bpe.train(corpus, 40).merges
    val b = Bpe.train(corpus, 40).merges
    assert(a == b)
  }

  test("end-to-end: tokenize feeds removeRangesIds, planted dup run found") {
    val vocab = Bpe.train(corpus, 60)
    val run = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, s"$run plus trailing content here"),
      (2L, s"prefix words then $run and more"),
      (3L, "completely unrelated pack my box with five dozen liquor jugs")
    ).toDF("k", "text")
    val toks = Bpe.tokenize(docs, vocab)
    // doc 2's copy of the run is removed, doc 1's (first by k) is kept
    val nRun = Bpe.encode(run, vocab).length
    val ranges = SubstringDedup.removeRangesIds(toks, nRun)
      .as[(Long, Long, Long)].collect()
    assert(ranges.nonEmpty && ranges.forall(_._1 == 2L), ranges.mkString(","))
    // the removed id span decodes back to (at least) the shared run
    val tok2 = toks.where($"k" === 2L).as[(Long, Seq[Long])].collect()(0)._2
    val (s, e) = (ranges.map(_._2).min, ranges.map(_._3).max)
    val removedIds = tok2.slice(s.toInt, e.toInt).map(_.toInt)
    val runIds = Bpe.encode(run, vocab).toSeq
    assert(removedIds.containsSlice(runIds))
  }
}
