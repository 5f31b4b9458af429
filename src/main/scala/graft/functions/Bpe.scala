package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Minimal self-contained byte-level BPE (no external tokenizer
  * libraries): the text -> token-id front end for the pre-tokenized
  * dedup path (SubstringDedup.removeRangesIds / --unit ids).
  *
  * The reference tokenizes corpora up front with gpt2/llama/olmo
  * vocabularies (indexing_v6_sharded.py:205-218 via
  * transformers.AutoTokenizer) and its engine consumes the u16/u32 id
  * streams (cpp_engine_dedup.h:70-77). This is the same pipeline shape
  * with an in-repo encoder: byte-level symbols (any UTF-8 text encodes
  * losslessly; ids 0-255 are raw bytes), whitespace pre-tokenization,
  * and a ranked merge list exactly like GPT-2's merges.txt (merge r
  * produces token id 256 + r). Encoding is the standard greedy
  * lowest-rank-pair loop; decode(encode(w)) == w for every word.
  *
  * Vocabularies load from a plain text file of one merge per line
  * ("left<TAB>right", ISO-8859-1 so arbitrary bytes round-trip), the
  * same shape as a published merges.txt. `train` is a small
  * driver-side trainer for tests and ad-hoc vocabs -- production use is
  * "bring the vocabulary you already tokenize with".
  */
object Bpe {

  /** Symbols are byte strings in ISO-8859-1 (char i == byte i). */
  final case class Vocab(merges: IndexedSeq[(String, String)]) {
    @transient lazy val rank: Map[(String, String), Int] =
      merges.zipWithIndex.toMap
    @transient lazy val idOf: Map[String, Int] = {
      val m = scala.collection.mutable.HashMap.empty[String, Int]
      (0 until 256).foreach(b => m(b.toChar.toString) = b)
      merges.zipWithIndex.foreach { case ((a, b), r) => m(a + b) = 256 + r }
      m.toMap
    }
    @transient lazy val tokenOf: Map[Int, String] =
      idOf.map { case (s, i) => (i, s) }
    def size: Int = 256 + merges.size
  }

  def load(path: String): Vocab = {
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path), java.nio.charset.StandardCharsets.ISO_8859_1)
    import scala.jdk.CollectionConverters._
    Vocab(lines.asScala.iterator.filter(_.nonEmpty).map { l =>
      val i = l.indexOf('\t')
      require(i > 0, s"malformed merge line: $l")
      (l.substring(0, i), l.substring(i + 1))
    }.toIndexedSeq)
  }

  def save(vocab: Vocab, path: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      vocab.merges.map { case (a, b) => s"$a\t$b" }.mkString("", "\n", "\n")
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))

  private def toSymbols(word: String): Array[String] =
    word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      .map(b => (b & 0xff).toChar.toString)

  /** Greedy BPE: repeatedly merge the lowest-rank adjacent pair. */
  def encodeWord(word: String, vocab: Vocab): Array[Int] = {
    var syms = toSymbols(word)
    var done = syms.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue; var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        vocab.rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ =>
        }
        i += 1
      }
      if (bestAt < 0) done = true
      else {
        val (a, b) = (syms(bestAt), syms(bestAt + 1))
        val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
            out += a + b; j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.toArray
        if (syms.length <= 1) done = true
      }
    }
    syms.map(vocab.idOf)
  }

  /** Whitespace pre-tokenization, then per-word BPE; spaces are
    * separators, not symbols (matching the whitespace-token unit the
    * rest of the token path uses).
    */
  def encode(text: String, vocab: Vocab): Array[Int] =
    text.split(' ').filter(_.nonEmpty).flatMap(encodeWord(_, vocab))

  /** Lossless per-word inverse (ids -> byte string -> UTF-8). */
  def decodeWord(ids: Seq[Int], vocab: Vocab): String = {
    val bytes = ids.map(vocab.tokenOf).mkString
    new String(bytes.toCharArray.map(_.toByte),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** docs(k, text) -> (k, tokens: array<long>): the broadcast-vocab map
    * stage feeding removeRangesIds -- one narrow pass, no shuffle.
    */
  def tokenize(docs: DataFrame, vocab: Vocab): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(vocab)
    docs.select(col("k").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val v = bc.value
        v.rank; v.idOf // force the lazy tables once per partition
        it.map { case (k, t) =>
          (k, if (t == null) Array.empty[Long]
              else encode(t, v).map(_.toLong))
        }
      }
      .toDF("k", "tokens")
  }

  /** Small driver-side trainer (tests / ad-hoc vocabs): standard BPE --
    * count adjacent symbol pairs over the word multiset, merge the most
    * frequent (ties broken lexicographically for determinism), repeat.
    */
  def train(texts: Seq[String], nMerges: Int): Vocab = {
    val words = scala.collection.mutable.HashMap.empty[List[String], Long]
    texts.foreach(_.split(' ').filter(_.nonEmpty).foreach { w =>
      val k = toSymbols(w).toList
      words(k) = words.getOrElse(k, 0L) + 1L
    })
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var cur = words.toMap
    var m = 0
    var exhausted = false
    while (m < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      cur.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (pair, _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        merges += pair
        // re-merge and RE-AGGREGATE: two distinct lists can merge into the
        // same symbol list, and their counts must add, not collide
        val next = scala.collection.mutable.HashMap.empty[List[String], Long]
        cur.foreach { case (syms, n) =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: t if (a, b) == pair => out += a + b; rest = t
            case h :: t => out += h; rest = t
            case Nil =>
          }
          val k = out.toList
          next(k) = next.getOrElse(k, 0L) + n
        }
        cur = next.toMap
        m += 1
      }
    }
    Vocab(merges.toIndexedSeq)
  }
}
