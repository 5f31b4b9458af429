package graft

/** Plan audit: prints formatted physical plans for the headline queries so
  * pushdown / codegen / join strategy can be reviewed without executing.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("2")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq else Seq("a1_remove_ranges", "d8_hamming_pairs", "jaccard_pairs_exact", "q3_join_agg")
    names.foreach { n =>
      println(s"==== $n ====")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
