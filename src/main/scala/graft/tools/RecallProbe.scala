package graft.tools

import graft.ext.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured ANN recall at a given corpus (`SPARK_GRAFT_SF_DIR`) for the
  * four recall-GATED driver families, at exactly the gated operating
  * points (`ExtQueries.simPqTopk` / `simIvfPqTopk` / `simRprojTopk` /
  * `simKnnGraph`): the driver gates emit pass/fail booleans, but scale
  * evidence (SCALE.md) needs the measured VALUES — recall degrades with
  * corpus density, so the 100 TB pitch requires at least one
  * larger-corpus point showing the gates still clear. Prints one JSON
  * line `{"corpus":…,"n_vectors":N,"recalls":{family:r,…}}`.
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()
    val q = emb.filter(col("vec_id") < 20)

    def recallVs(exact: Set[(Long, Long)],
        df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "neighbor_id")
        .as[(Long, Long)].collect().toSet
      (exact intersect got).size.toDouble / exact.size
    }

    val bf20 = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = recallVs(bf20, Similarity.pqTopK(q, emb, "vec_id",
      "embedding", 5, m = 8, ksub = 64, trainIters = 2, oversample = 8))
    val ivfPq = recallVs(bf20, Similarity.ivfPqTopK(q, emb, "vec_id",
      "embedding", 5, nlist = 16, nprobe = 6, m = 8, ksub = 64,
      trainIters = 2, oversample = 8))
    val rproj = recallVs(bf20, Similarity.rprojTopK(q, emb, "vec_id",
      "embedding", 5, dim = 64))
    // knn graph gate shape: graph over ALL nodes, exact side sampled
    // to the first 100
    val bf100 = Similarity.bruteForceTopK(
        emb.filter(col("vec_id") < 100), emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val knn = recallVs(bf100,
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
        .filter(col("src") < 100)
        .select(col("src").as("query_id"), col("dst").as("neighbor_id")))

    def f(v: Double) = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"corpus":"$dir","n_vectors":$n,"recalls":{""" +
      s""""pq_topk":${f(pq)},"ivf_pq_topk":${f(ivfPq)},""" +
      s""""rproj_topk":${f(rproj)},"knn_graph":${f(knn)}}}""")
    spark.stop()
  }
}
