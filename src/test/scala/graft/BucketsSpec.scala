package graft

import graft.tables.Buckets
import org.apache.spark.sql.functions._

/** Writer-side bucketing: co-located joins must be shuffle-free, the
  * on-disk spec must restore bucketed reads without a metastore, and
  * values must match the unbucketed equivalents exactly.
  */
class BucketsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val cust = spark.read
    .parquet(s"$sfDir/customer.parquet").select("c_custkey", "c_mktsegment")
  private lazy val ord = spark.read
    .parquet(s"$sfDir/orders.parquet").select("o_custkey", "o_totalprice")

  test("co-located bucketed join: zero Exchange, values match plain join") {
    val dir = tmpDir("graft-buckets")
    Buckets.write(spark, cust, "bspec_cust", s"$dir/cust",
      Seq("c_custkey"), 4)
    Buckets.write(spark, ord, "bspec_ord", s"$dir/ord",
      Seq("o_custkey"), 4)
    val joined = spark.table("bspec_cust").hint("merge")
      .join(spark.table("bspec_ord"), $"c_custkey" === $"o_custkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
    assert(plan.contains("SortMergeJoin"), plan)
    assert(plan.contains("SelectedBucketsCount"), plan)
    val bucketed = joined.groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    val plain = cust.join(ord, $"c_custkey" === $"o_custkey")
      .groupBy("c_mktsegment").count()
      .as[(String, Long)].collect().toMap
    assert(bucketed === plain)
    assert(plain.nonEmpty)
  }

  test("restore rebuilds bucketed reads from the on-disk spec alone") {
    val dir = tmpDir("graft-buckets-restore")
    Buckets.write(spark, ord, "bspec_r", s"$dir/ord", Seq("o_custkey"), 4)
    val before = spark.table("bspec_r").count()
    // simulate a fresh session: the catalog entry is gone, only files
    // + _bucket_spec.json remain
    spark.sql("DROP TABLE bspec_r")
    val name = Buckets.restore(spark, s"$dir/ord")
    assert(name === "bspec_r")
    assert(spark.table("bspec_r").count() === before)
    // the restored table still carries the bucket layout: a self-join
    // on the bucket key plans without any Exchange
    val self = spark.table("bspec_r").hint("merge").join(
      spark.table("bspec_r").select($"o_custkey".as("k"),
        $"o_totalprice".as("p2")),
      $"o_custkey" === $"k")
    val plan = self.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"restore lost bucketing:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), plan)
  }

  test("aggregation on the bucket key is exchange-free too") {
    val dir = tmpDir("graft-buckets-agg")
    Buckets.write(spark, ord, "bspec_agg", s"$dir/ord", Seq("o_custkey"), 4)
    val agg = spark.table("bspec_agg")
      .groupBy("o_custkey").agg(sum($"o_totalprice").as("v"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed distribution must satisfy the aggregate:\n$plan")
    assert(agg.count() === ord.select("o_custkey").distinct().count())
  }

  test("two-key bucketing restores and self-joins exchange-free") {
    val dir = tmpDir("graft-buckets-2k")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    Buckets.write(spark, li, "bspec_2k", s"$dir/li",
      Seq("l_orderkey", "l_linenumber"), 4)
    spark.sql("DROP TABLE bspec_2k")
    Buckets.restore(spark, s"$dir/li")
    val t = spark.table("bspec_2k")
    val self = t.hint("merge").join(
      t.select($"l_orderkey".as("k1"), $"l_linenumber".as("k2"),
        $"l_quantity".as("q2")),
      $"l_orderkey" === $"k1" && $"l_linenumber" === $"k2")
    val plan = self.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"two-key layout lost:\n$plan")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic
    // lineitem — compare against the plain (unbucketed) self-join
    val plain = li.join(
      li.select($"l_orderkey".as("k1"), $"l_linenumber".as("k2"),
        $"l_quantity".as("q2")),
      $"l_orderkey" === $"k1" && $"l_linenumber" === $"k2")
    assert(self.count() === plain.count())
  }

  test("write rejects DDL-breaking names, keys, and paths up front") {
    val dir = tmpDir("graft-buckets-ddl")
    val df = Seq((1, "a")).toDF("k", "v")
    val e1 = intercept[IllegalArgumentException] {
      Buckets.write(spark, df, "bad`name", s"$dir/t1", Seq("k"), 2)
    }
    assert(e1.getMessage.contains("identifier"))
    intercept[IllegalArgumentException] {
      Buckets.write(spark, df, "bspec_ok", s"$dir/t2", Seq("k`x"), 2)
    }
    val e3 = intercept[IllegalArgumentException] {
      Buckets.write(spark, df, "bspec_ok", s"$dir/it's", Seq("k"), 2)
    }
    assert(e3.getMessage.contains("quote"))
  }

  test("restore fails loud on a dir with no spec") {
    val dir = tmpDir("graft-buckets-nospec")
    ord.limit(5).write.mode("overwrite").parquet(s"$dir/plain")
    val e = intercept[IllegalStateException] {
      Buckets.restore(spark, s"$dir/plain")
    }
    assert(e.getMessage.contains("_bucket_spec"))
  }
}
