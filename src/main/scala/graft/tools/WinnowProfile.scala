package graft.tools

import graft.ext.{Dedup, TextStats}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the winnowing pair (dev tool, not part of
  * the driver contract): isolates gram build, fingerprint hash, window
  * selection, and the pair join so the r14 plan work targets the stage
  * that actually costs.
  */
object WinnowProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"${(System.nanoTime() - t0) / 1e9}%8.2f  $name")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val k = 3
    val tk = split(lower(col("text")), "\\s+")
    val grams = docs
      .filter(size(tk) >= k)
      .select(col("doc_id"), col("text"))
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), posexplode(
        transform(sequence(lit(0), size(tk) - lit(k)),
          i => concat_ws(" ", slice(tk, i + 1, lit(k))))))
      .withColumnRenamed("col", "gram")
    noop(grams) // warm
    time("gram build")(noop(grams))
    time("gram build again")(noop(grams))
    val h = graft.functions.PortableHash.h60("wfp", 42L, col("gram"))
    time("grams + h60(md5)")(noop(grams.select(col("doc_id"), col("pos"),
      h.as("fp"))))
    time("grams + xxhash64")(noop(grams.select(col("doc_id"), col("pos"),
      xxhash64(col("gram")).as("fp"))))
    val full = TextStats.winnowing(docs, "doc_id", "text", 3, 4)
    time("full winnowing")(noop(full))
    time("full winnowing again")(noop(full))
    time("winnowing + orderBy (text_winnow)")(noop(
      full.orderBy("doc_id", "pos")))
    time("winnow pairs (dedup_winnow_pairs)")(noop(
      Dedup.winnowPairs(docs, "doc_id", "text", 3, 4, 2)))
    // A/B context row: the r14 aliased-self-join rewrite of
    // shingleIntersections measured a no-op against this baseline
    // (3.28-3.71 s either way at sf0.1) — AQE's canonicalized stage
    // reuse already dedupes the two rename-only-different join-side
    // exchanges, so the simpler two-projection shape stays.
    time("ngram jaccard pairs")(noop(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)))
    spark.stop()
  }
}
