package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for the dedup hot paths (dev tool, not part of
  * the driver contract).
  */
object Profile {
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

    val sh = docs.select(col("doc_id").as("id"),
      explode(graft.functions.TextFunctions.shingles(spark, col("text"), 3))
        .as("g"))
    // warm
    noop(sh)
    time("explode shingles")(noop(sh))
    time("explode shingles again")(noop(sh))
    val shH = sh.withColumn("h", xxhash64(col("g"))).drop("g")
    time("shingle hash")(noop(shH))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    time("sizes agg")(noop(sizes))
    val a = sh.select(col("g"), col("id").as("id_a"))
    val b = sh.select(col("g"), col("id").as("id_b"))
    val inter = a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("string-key join+agg")(noop(inter))
    val ah = shH.select(col("h"), col("id").as("id_a"))
    val bh = shH.select(col("h"), col("id").as("id_b"))
    val interH = ah.join(bh, Seq("h")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    time("long-key join+agg")(noop(interH))
    time("full jaccard")(noop(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)))
    time("minhash signatures")(noop(
      Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)))
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", 64, 3)
      .withColumn("sig", array((0 until 64).map(i => col(s"mh_$i")): _*))
      .select("id", "sig")
    time("sig+array")(noop(sig))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(15)), b =>
        xxhash64(concat_ws("_",
          b +: (0 until 4).map(r => element_at(col("sig"), b * 4 + r + 1)): _*)))))
    time("banded")(noop(banded))
    time("banded again")(noop(banded))
    time("full minhash lsh")(noop(
      Dedup.minhashLsh(docs, "doc_id", "text", 64, 16, 3, 0.5)))
    spark.stop()
  }
}
