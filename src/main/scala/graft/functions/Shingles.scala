package graft.functions

/** Character n-gram shingling over UTF-8 bytes. Per-doc, driver-free,
  * O(bytes) via the same rolling hash as window generation -- a shingle is
  * just a short fixed-length window keyed by its 61-bit hash. Shingle SETS
  * (distinct) feed Jaccard / MinHash; shingle BAGS feed SimHash weights.
  */
object Shingles {

  /** Distinct shingle hashes of byte n-grams (sorted, for deterministic
    * downstream folds). Empty when the doc is shorter than n.
    */
  def distinctHashes(bytes: Array[Byte], n: Int): Array[Long] = {
    if (bytes == null) return Array.emptyLongArray // null text = no shingles
    val hs = PolyHash.windowHashes(bytes, n, PolyHash.B1)
    if (hs.isEmpty) return hs
    java.util.Arrays.sort(hs)
    var w = 1
    var i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(hs, w)
  }

  /** All (non-distinct) shingle hashes in document order. */
  def allHashes(bytes: Array[Byte], n: Int): Array[Long] =
    if (bytes == null) Array.emptyLongArray
    else PolyHash.windowHashes(bytes, n, PolyHash.B1)

  /** Distinct word n-gram shingle hashes: whitespace tokens (empties
    * dropped), shingle = n consecutive words joined by a single space,
    * hashed over its UTF-8 bytes. Word shingles have a combinatorial
    * universe, so document frequencies stay low even on small-vocabulary
    * corpora where every char n-gram is near-universal -- the property
    * prefix filtering and inverted indexes need to stay linear.
    */
  def wordNgramHashes(text: String, n: Int): Array[Long] = {
    if (text == null) return Array.emptyLongArray // null text = no shingles
    val words = text.split(" ").filter(_.nonEmpty)
    if (words.length < n) return Array.emptyLongArray
    val hs = new Array[Long](words.length - n + 1)
    var i = 0
    while (i <= words.length - n) {
      val b = words.slice(i, i + n).mkString(" ")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)
      hs(i) = PolyHash.hash(b, 0, b.length, PolyHash.B1)
      i += 1
    }
    java.util.Arrays.sort(hs)
    var w = 1
    i = 1
    while (i < hs.length) {
      if (hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(hs, w)
  }

  /** Exact Jaccard similarity of two SORTED distinct-hash arrays. */
  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < a.length && j < b.length) {
      if (a(i) == b(j)) { inter += 1; i += 1; j += 1 }
      else if (a(i) < b(j)) i += 1
      else j += 1
    }
    inter.toDouble / (a.length + b.length - inter)
  }

  /** MinHash signature from distinct shingle hashes: sig(i) =
    * min over shingles of mix64(shingle ^ seed(i)). Computed per doc with
    * no shuffle (the shingle set is local to the row). Empty docs get
    * Long.MaxValue sentinels.
    */
  def minhashSignature(shingleHashes: Array[Long], seeds: Array[Long]): Array[Long] = {
    val sig = Array.fill(seeds.length)(Long.MaxValue)
    var i = 0
    while (i < shingleHashes.length) {
      val sh = shingleHashes(i)
      var j = 0
      while (j < seeds.length) {
        val h = PolyHash.mix64(sh ^ seeds(j))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** SimHash over shingle hashes: bit j of the result is 1 iff the sum of
    * (+1 / -1) votes from bit j of each (mixed) shingle hash is positive.
    */
  def simhash64(shingleHashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < shingleHashes.length) {
      val h = PolyHash.mix64(shingleHashes(i))
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Deterministic seed schedule for the k MinHash permutations. */
  def seeds(k: Int): Array[Long] =
    Array.tabulate(k)(i => PolyHash.mix64(0x5eed0000L + i))
}
