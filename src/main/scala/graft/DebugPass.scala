package graft
import org.apache.spark.sql.functions._
import graft.operators.AnnCosine
object DebugPass {
  def main(args: Array[String]): Unit = {
    val spark = Bench.session("8")
    val dir = "/root/testdata/sf0.01"
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 5).select(col("vec_id").as("qid"), col("embedding").as("vec"))
    val c = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val brute = AnnCosine.bruteTopK(q, c, 10).select("qid","id","rn").collect().map(r=>(r.getLong(0),r.getLong(1),r.getInt(2))).toSet
    for ((t, pb) <- Seq((8,10),(16,6),(24,6),(16,5))) {
      val lsh = AnnCosine.lshTopK(q, c, 10, 64, t, pb).select("qid","id","rn").collect().map(r=>(r.getLong(0),r.getLong(1),r.getInt(2))).toSet
      System.err.println(s"[ann] tables=$t bits=$pb equal=${lsh == brute} lsh=${lsh.size} inter=${(lsh & brute).size}")
    }
    spark.stop()
  }
}
