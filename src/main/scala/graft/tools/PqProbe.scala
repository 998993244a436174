package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc recall probe for the PQ / IVF-PQ operating points (dev tool,
  * not part of the driver contract): prints measured recall@5 vs brute
  * force at the verification scale so the driver gates pin HONEST
  * thresholds (the same procedure that sized the IVF gate at 0.6).
  */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val q = emb.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (bf intersect got).size.toDouble / bf.size
    }
    for (os <- Seq(4, 8, 16); ks <- Seq(32, 64))
      println(f"pq m8 k$ks t2 o$os  recall=${recall(Similarity.pqTopK(q,
        emb, "vec_id", "embedding", 5, m = 8, ksub = ks, trainIters = 2,
        oversample = os))}%.3f")
    for (os <- Seq(4, 8, 16))
      println(f"ivfpq 16/6 m8k64 o$os  recall=${recall(
        Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", 5, nlist = 16,
          nprobe = 6, m = 8, ksub = 64, trainIters = 2,
          oversample = os))}%.3f")
    spark.stop()
  }
}
