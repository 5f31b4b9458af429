package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{GraftFunctions, PolyHash, Shingles}

/** Native Catalyst expressions (graft.functions.Native): SQL registration
  * via GraftExtensions (SparkTestBase's session sets
  * spark.sql.extensions=graft.functions.GraftExtensions), kernel equivalence, null
  * propagation, and a CODEGEN_ONLY pass proving every doGenCode actually
  * compiles (no silent interpreter fallback).
  */
class NativeFunctionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def bytes(s: String) = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  test("SQL surface: extension-registered functions match the Scala kernels") {
    val row = spark.sql(
      """SELECT
        |  graft_lcp(encode('abcdef', 'UTF-8'), encode('abcxyz', 'UTF-8')) AS l,
        |  graft_polyhash61(encode('hello world', 'UTF-8'), 257) AS ph,
        |  graft_simhash64(encode('the quick brown fox', 'UTF-8'), 4) AS sh,
        |  graft_minhash(encode('the quick brown fox', 'UTF-8'), 4, 8) AS mh
        |""".stripMargin).collect()(0)
    assert(row.getLong(0) == 3L)
    val b = bytes("hello world")
    assert(row.getLong(1) == PolyHash.hash(b, 0, b.length, 257L))
    val q = bytes("the quick brown fox")
    assert(row.getLong(2) == Shingles.simhash64(Shingles.allHashes(q, 4)))
    assert(row.getSeq[Long](3) ==
      Shingles.minhashSignature(Shingles.distinctHashes(q, 4), Shingles.seeds(8)).toSeq)
  }

  test("null propagation: null-intolerant expressions yield null, never throw") {
    val row = spark.sql(
      """SELECT
        |  graft_lcp(CAST(NULL AS BINARY), encode('x', 'UTF-8')) AS l,
        |  graft_polyhash61(CAST(NULL AS BINARY), 257) AS ph,
        |  graft_simhash64(CAST(NULL AS BINARY), 4) AS sh,
        |  graft_minhash(CAST(NULL AS BINARY), 4, 8) AS mh
        |""".stripMargin).collect()(0)
    (0 until 4).foreach(i => assert(row.isNullAt(i), s"col $i"))
  }

  test("CODEGEN_ONLY: every native expression compiles (no interpreter fallback)") {
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = Seq(("abcdef", "abcxyz"), ("same", "same")).toDF("a", "b")
        .select(
          GraftFunctions.lcp(encode(col("a"), "UTF-8"), encode(col("b"), "UTF-8")).as("l"),
          GraftFunctions.polyhash61(encode(col("a"), "UTF-8"), 257L).as("ph"),
          GraftFunctions.simhash64(encode(col("a"), "UTF-8"), 3).as("sh"),
          GraftFunctions.minhash(encode(col("a"), "UTF-8"), 3, 4).as("mh"))
      val rows = df.collect()
      assert(rows(0).getLong(0) == 3L && rows(1).getLong(0) == 4L)
      val a = bytes("abcdef")
      assert(rows(0).getLong(1) == PolyHash.hash(a, 0, a.length, 257L))
      assert(rows(0).getLong(2) == Shingles.simhash64(Shingles.allHashes(a, 3)))
      assert(rows(0).getSeq[Long](3) ==
        Shingles.minhashSignature(Shingles.distinctHashes(a, 3), Shingles.seeds(4)).toSeq)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("edge kernels: empty inputs, short docs, equal arrays") {
    assert(graft.functions.NativeKernels.lcp(Array.emptyByteArray, bytes("x")) == 0L)
    assert(graft.functions.NativeKernels.lcp(bytes("abc"), bytes("abc")) == 3L)
    // doc shorter than n: simhash of zero shingles = 0, minhash = sentinels
    val row = spark.sql(
      """SELECT graft_simhash64(encode('ab', 'UTF-8'), 4) AS sh,
        |       graft_minhash(encode('ab', 'UTF-8'), 4, 3) AS mh""".stripMargin)
      .collect()(0)
    assert(row.getLong(0) == 0L)
    assert(row.getSeq[Long](1) == Seq.fill(3)(Long.MaxValue))
  }

  test("graft_winnow: SQL output matches the kernel; guarantee holds") {
    val t = "the winnowing guarantee says shared runs share a fingerprint"
    val got = spark.sql(
      s"SELECT graft_winnow(encode('$t', 'UTF-8'), 8, 4) AS fp")
      .collect()(0).getSeq[Long](0).toSet
    val want = {
      val arr = graft.functions.NativeKernels.winnow(bytes(t), 8, 4)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    assert(got == want && got.nonEmpty)
    // at least one fingerprint per w positions
    assert(got.size * 4 >= bytes(t).length - 8 + 1 - 3)
  }

  test("registerUdfs: writeback UDFs reachable from SQL") {
    GraftFunctions.registerUdfs(spark)
    val out = spark.sql(
      """SELECT graft_remove_mode(encode('hello cruel world', 'UTF-8'),
        |  graft_clip_ranges(encode('hello cruel world', 'UTF-8'),
        |    array(named_struct('s', 5L, 'e', 11L)))) AS t""".stripMargin)
      .collect()(0).getString(0)
    assert(out == "hello world")
  }
}
