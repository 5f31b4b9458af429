package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hamming-radius self-join over 64-bit fingerprints (pHash / SimHash)
  * via multi-index pigeonhole banding: split the 64 bits into r+1 blocks;
  * any pair within Hamming distance r must agree EXACTLY on at least one
  * block, so an equi-join per block finds every such pair (recall 1.0 --
  * this is exact, not probabilistic), and `bit_count(a ^ b) <= r` verifies.
  *
  * Scale shape: blocks are generated with a small posexplode (r+1 rows per
  * fingerprint), the candidate join is a plain equi-join on
  * (block, block_bits) that AQE can skew-split, and verification is a
  * codegen'd bit_count on the joined row -- no UDFs anywhere.
  */
object Hamming {

  /** df(id: Long, bits: Long) -> (block, block_bits, id): r+1 rows per id.
    * Block i covers bit range [i*w + min(i,extra), ...) where the first
    * `extra` blocks get an extra bit (64 = blocks*w + extra).
    */
  def blockTable(df: DataFrame, blocks: Int): DataFrame = {
    val w = 64 / blocks
    val extra = 64 % blocks
    val blockCols = (0 until blocks).map { i =>
      val start = i * w + math.min(i, extra)
      val width = w + (if (i < extra) 1 else 0)
      val mask = if (width == 64) -1L else (1L << width) - 1L
      struct(lit(i).as("block"),
        (shiftright(col("bits"), start).bitwiseAND(lit(mask))).as("block_bits"))
    }
    df.select(col("id"), col("bits"), explode(array(blockCols: _*)).as("bb"))
      .select(col("bb.block"), col("bb.block_bits"), col("id"), col("bits"))
  }

  /** All pairs (a < b) with hamming(bits_a, bits_b) <= r.
    * Output: (a, b, dist).
    */
  def pairs(df: DataFrame, r: Int): DataFrame = {
    val blocks = r + 1
    val bt = blockTable(df, blocks)
    bt.select(col("block"), col("block_bits"), col("id").as("a"), col("bits").as("ba"))
      .join(
        bt.select(col("block"), col("block_bits"), col("id").as("b"), col("bits").as("bb")),
        Seq("block", "block_bits"))
      .where(col("a") < col("b"))
      .withColumn("dist", bit_count(col("ba").bitwiseXOR(col("bb"))))
      .where(col("dist") <= r)
      .select("a", "b", "dist")
      .distinct()
  }
}
