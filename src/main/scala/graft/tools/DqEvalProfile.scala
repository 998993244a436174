package graft.tools

import graft.ext.{Expectations, ModelEval, TextStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the r15 scale pairs (dev tool, not part
  * of the driver contract):
  *
  *   - dq quantile family: rank-exact (per-group serial window sort)
  *     vs `approx = true` (mergeable percentile_approx sketch) — the
  *     pair SCALE.md records for VERDICT r14 finding #1.
  *   - eval_auc / eval_roc_curve decomposition: the bigram-LM score
  *     pipeline vs the AUC aggregation itself, plus the distinct-score
  *     cardinality at each scale point (the tail-annotation evidence:
  *     does the score-group count, which drives the Mann–Whitney
  *     grouped aggregate, actually grow with the corpus?).
  *
  * Run with SPARK_GRAFT_SF_DIR at both scale points back-to-back on a
  * quiet host (same-moment discipline).
  */
object DqEvalProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // ————— dq quantile family: rank-exact vs approx
    noop(Expectations.iqrOutliers(li, Seq("l_returnflag"),
      "l_extendedprice", approx = true)) // warm (JIT + FS cache)
    time("iqrOutliers rank-exact")(noop(
      Expectations.iqrOutliers(li, Seq("l_returnflag"), "l_extendedprice")))
    time("iqrOutliers approx")(noop(
      Expectations.iqrOutliers(li, Seq("l_returnflag"), "l_extendedprice",
        approx = true)))
    time("quantileReport rank-exact")(noop(
      Expectations.quantileReport(li, Seq("l_returnflag"),
        "l_extendedprice", Seq(0.5, 0.9, 0.99))))
    time("quantileReport approx")(noop(
      Expectations.quantileReport(li, Seq("l_returnflag"),
        "l_extendedprice", Seq(0.5, 0.9, 0.99), approx = true)))

    // ————— eval_auc decomposition
    val scored = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    noop(scored) // warm
    time("lm score pipeline alone")(noop(scored))
    time("eval_auc (score + Mann-Whitney)")(noop(
      ModelEval.rocAuc(scored, "is_en", "lm_score")
        .withColumn("u2", col("u2").cast("long"))))
    time("eval_roc_curve (score + curve)")(noop(
      ModelEval.rocCurve(scored, "is_en", "lm_score", maxPoints = 64)))
    val card = scored.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("lm_score")).as("distinct_scores")).head
    println(s"          rows=${card.getLong(0)} " +
      s"distinct_scores=${card.getLong(1)}")
    spark.stop()
  }
}
