package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.functions.PolyHash

/** ScalaCheck properties for the rolling hash core (A9-style index
  * verification analog: the hash must agree with its definition at every
  * position, or dedup groups are garbage).
  */
object PolyHashProps extends Properties("PolyHash") {
  private val P = BigInt(PolyHash.P)
  private val inMod = Gen.chooseNum(0L, PolyHash.P - 1)

  property("mulmod = BigInt mulmod") = forAll(inMod, inMod) { (a, b) =>
    BigInt(PolyHash.mulmod(a, b)) == BigInt(a) * BigInt(b) % P
  }

  property("mulmod edges") = Prop {
    val edge = Seq(0L, 1L, 2L, PolyHash.P - 1, PolyHash.P - 2, 1L << 60)
    edge.forall(a => edge.forall(b =>
      BigInt(PolyHash.mulmod(a, b)) == BigInt(a) * BigInt(b) % P))
  }

  private val bytesGen = Gen.chooseNum(0, 96).flatMap(n =>
    Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))

  property("rolling == direct at every position") =
    forAll(bytesGen, Gen.chooseNum(1, 16)) { (bytes, winLen) =>
      val rolled = PolyHash.windowHashes(bytes, winLen, PolyHash.B1).toSeq
      val direct = (0 to bytes.length - winLen)
        .map(i => PolyHash.hash(bytes, i, winLen, PolyHash.B1))
      rolled == direct
    }

  property("fused dual-base pass == two single-base passes") =
    forAll(bytesGen, Gen.chooseNum(1, 16)) { (bytes, winLen) =>
      val (h1, h2) = PolyHash.windowHashes2(bytes, winLen)
      h1.toSeq == PolyHash.windowHashes(bytes, winLen, PolyHash.B1).toSeq &&
      h2.toSeq == PolyHash.windowHashes(bytes, winLen, PolyHash.B2).toSeq
    }

  property("equal windows hash equal across docs") = Prop {
    val a = "abcdefgh".getBytes
    val b = "xxabcdefghzz".getBytes
    PolyHash.hash(a, 0, 8, PolyHash.B1) == PolyHash.hash(b, 2, 8, PolyHash.B1) &&
    PolyHash.hash(a, 0, 8, PolyHash.B2) == PolyHash.hash(b, 2, 8, PolyHash.B2) &&
    PolyHash.hash("abcdefgi".getBytes, 0, 8, PolyHash.B1) != PolyHash.hash(a, 0, 8, PolyHash.B1)
  }
}
