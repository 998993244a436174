package graft

import graft.ops.{RangeJoin, Skew, TableOps}
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._

/** Scale-utility tests: salted join/agg equivalence, approximate
  * aggregate bounds, compaction, and the parquet physical options (S8:
  * gzip codec + bloom filters actually present in the written footers).
  */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sfDir/orders.parquet")
  private lazy val customer = spark.read.parquet(s"$sfDir/customer.parquet")

  test("salted join == plain join, row-identical") {
    val plain = orders.join(customer,
      orders("o_custkey") === customer("c_custkey"))
      .select("o_orderkey", "c_custkey").as[(Long, Long)].collect().sorted
    val salted = Skew.saltedJoin(
      orders.withColumnRenamed("o_custkey", "k"),
      customer.withColumnRenamed("c_custkey", "k"), "k", buckets = 8)
      .select("o_orderkey", "k").as[(Long, Long)].collect().sorted
    assert(salted === plain)
  }

  test("salted agg == plain agg") {
    val plain = orders.groupBy("o_custkey")
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toSet
    val salted = Skew.saltedAgg(orders, "o_custkey", buckets = 8,
      partial = Seq(count(lit(1)).as("pn")),
      merge = Seq(sum(col("pn")).as("n")))
      .as[(Long, Long)].collect().toSet
    assert(salted === plain)
  }

  test("bucketed range join == plain non-equi join, overlaps included") {
    val ranges = Seq(("low", 0.0, 100.0), ("mid", 50.0, 250.0),
      ("high", 200.0, 1000.0)).toDF("band", "lo", "hi")
    val points = (1 to 500).map(i => (i.toLong, (i * 7 % 997).toDouble))
      .toDF("id", "v")
    val got = RangeJoin.pointInRange(points, "v", ranges, "lo", "hi",
      bucketWidth = 30.0)
      .select("id", "band").as[(Long, String)].collect().toSet
    val want = points.join(ranges,
      col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "band").as[(Long, String)].collect().toSet
    assert(got === want)
    assert(want.exists(_._2 == "mid"), "overlap band must match")
  }

  test("range join boundaries: lo inclusive, hi exclusive") {
    val ranges = Seq(("r", 10.0, 20.0)).toDF("band", "lo", "hi")
    val pts = Seq((1L, 10.0), (2L, 20.0), (3L, 19.999), (4L, 9.999))
      .toDF("id", "v")
    val got = RangeJoin.pointInRange(pts, "v", ranges, "lo", "hi",
      bucketWidth = 5.0)
      .select("id").as[Long].collect().toSet
    assert(got === Set(1L, 3L))
  }

  test("range join drops empty and inverted intervals, prunes dead buckets") {
    val ranges = Seq(("empty", 10.0, 10.0), ("inv", 30.0, 20.0),
      ("ok", 0.0, 50.0)).toDF("band", "lo", "hi")
    val pts = Seq((1L, 10.0), (2L, 25.0), (3L, 49.0)).toDF("id", "v")
    val got = RangeJoin.pointInRange(pts, "v", ranges, "lo", "hi",
      bucketWidth = 10.0)
      .select("id", "band").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "ok"), (2L, "ok"), (3L, "ok")))
    // bucket-aligned hi must not emit the dead [hi, hi+w) bucket: a
    // point at v=50 sits exactly there and must not even reach the
    // residual filter's join
    val atHi = RangeJoin.pointInRange(Seq((9L, 50.0)).toDF("id", "v"),
      "v", Seq(("ok", 0.0, 50.0)).toDF("band", "lo", "hi"),
      "lo", "hi", bucketWidth = 10.0)
    assert(atHi.isEmpty)
  }

  test("range join plans an equi-join, never a nested loop") {
    val ranges = Seq(("b", 0.0, 250000.0), ("t", 250000.0, 500000.0))
      .toDF("band", "lo", "hi")
    val plan = RangeJoin.pointInRange(orders, "o_totalprice", ranges,
      "lo", "hi", bucketWidth = 50000.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"non-equi fallback leaked into the bucketed plan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected an equi-join on the bucket id:\n$plan")
  }

  test("approximate aggregates land within sane bounds of exact") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val exactOrders = li.select("l_orderkey").distinct().count().toDouble
    val approx = li.agg(
      approx_count_distinct(col("l_orderkey")).as("a")).as[Long].head().toDouble
    assert(math.abs(approx - exactOrders) / exactOrders < 0.1,
      s"approx=$approx exact=$exactOrders")
    val exactMedian = li.stat.approxQuantile("l_extendedprice",
      Array(0.5), 0.0).head
    val apxMedian = li.agg(percentile_approx(col("l_extendedprice"),
      lit(0.5), lit(10000))).as[Double].head()
    assert(math.abs(apxMedian - exactMedian) / exactMedian < 0.05)
  }

  test("compaction resizes files, preserves rows, logs a commit") {
    val base = tmpDir("graft-compact")
    val t = KeyedTable("c", s"$base/c", Seq("o_orderkey"), "o_orderdate")
    TableOps.upsert(spark, t, orders, maxRecordsPerFile = 100L)
    val fs = new org.apache.hadoop.fs.Path(t.dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles: Int = fs.listStatus(new org.apache.hadoop.fs.Path(
      TableOps.partitionDirs(spark, t)("")))
      .count(_.getPath.getName.endsWith(".parquet"))
    val before = TableOps.snapshot(spark, t).count()
    assert(nFiles > 1)
    TableOps.compact(spark, t, numFiles = Some(1))
    assert(nFiles === 1)
    assert(TableOps.snapshot(spark, t).count() === before)
    assert(graft.tables.CommitLog(t, spark).listCommits().size === 2)
  }

  test("partition-scoped compaction rewrites only targeted partitions") {
    val base = tmpDir("graft-pcompact")
    val t = KeyedTable("pc", s"$base/pc", Seq("o_orderkey"), "o_orderdate",
      Seq("o_orderpriority"))
    TableOps.upsert(spark, t, orders.limit(2000), maxRecordsPerFile = 100L)
    val fs = new org.apache.hadoop.fs.Path(t.dataPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def nFiles(rel: String): Int =
      fs.listStatus(new org.apache.hadoop.fs.Path(
        TableOps.partitionDirs(spark, t)(rel)))
        .count(st => st.isFile && !st.getPath.getName.startsWith("_"))
    val small = TableOps.smallFilePartitions(spark, t, maxFiles = 2)
    assert(small.nonEmpty, "tiny maxRecordsPerFile must create small files")
    val target = small.head
    val other = TableOps.partitionDirs(spark, t).keySet - target
    val otherDirsBefore = other.map(TableOps.partitionDirs(spark, t))
    val before = TableOps.snapshot(spark, t).count()
    val ts = TableOps.compactPartitions(spark, t, Seq(target))
    assert(ts.nonEmpty)
    assert(nFiles(target) === 1, "compacted partition must coalesce to 1 file")
    assert(other.map(TableOps.partitionDirs(spark, t)) === otherDirsBefore,
      "untargeted partitions must keep their current dirs")
    assert(TableOps.snapshot(spark, t).count() === before)
    assert(!TableOps.smallFilePartitions(spark, t, maxFiles = 2)
      .contains(target))
  }

  test("idempotency key makes upsert exactly-once under replay") {
    val base = tmpDir("graft-idem")
    val t = KeyedTable("i", s"$base/i", Seq("o_orderkey"), "o_orderdate")
    val batch = orders.limit(100)
    val ts1 = TableOps.upsert(spark, t, batch,
      idempotencyKey = Some("batch-7"))
    assert(ts1.nonEmpty)
    // replay of the same batch id: skipped, no new commit
    val ts2 = TableOps.upsert(spark, t, batch,
      idempotencyKey = Some("batch-7"))
    assert(ts2 === "")
    assert(graft.tables.CommitLog(t, spark).listCommits() === Seq(ts1))
    // a new batch id commits normally
    val ts3 = TableOps.upsert(spark, t, batch,
      idempotencyKey = Some("batch-8"))
    assert(ts3.nonEmpty)
  }

  test("O5 clustering: file ranges are disjoint after a clustered write") {
    val base = tmpDir("graft-cluster")
    val t = KeyedTable("cl", s"$base/cl", Seq("o_orderkey"), "o_orderdate")
    TableOps.upsert(spark, t, orders, sortBy = Seq("o_totalprice"),
      maxRecordsPerFile = 300L)
    val perFile = TableOps.snapshot(spark, t)
      .groupBy(input_file_name().as("f"))
      .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
      .select("lo", "hi").as[(Double, Double)].collect().sortBy(_._1)
    assert(perFile.length > 1, "clustered write should produce several files")
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, "range-clustered files must not overlap")
      case _ =>
    }
  }

  test("S8 physical options: written parquet uses gzip and key bloom filters") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val base = tmpDir("graft-s8")
    val t = KeyedTable("p", s"$base/p", Seq("o_orderkey"), "o_orderdate")
    TableOps.upsert(spark, t, orders)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(t.dataPath).getFileSystem(conf)
    val file = fs.listStatus(new org.apache.hadoop.fs.Path(
      TableOps.partitionDirs(spark, t)("")))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val rg = reader.getFooter.getBlocks.get(0)
      val colMeta = rg.getColumns.asScala
        .find(_.getPath.toDotString == "o_orderkey").get
      assert(colMeta.getCodec.name().equalsIgnoreCase("gzip"))
      assert(reader.readBloomFilter(colMeta) != null,
        "bloom filter must be written for the record key")
    } finally reader.close()
  }

  test("interval overlap == plain non-equi join, exactly once per pair") {
    // seeded pseudo-random intervals incl. bucket-aligned, contained,
    // multi-bucket-shared, empty, and inverted cases
    val left = (1 to 200).map { i =>
      val lo = (i * 13 % 301).toDouble
      (i.toLong, lo, lo + (i * 7 % 45).toDouble)
    }.toDF("lid", "l_lo", "l_hi")
    val right = (1 to 80).map { j =>
      val lo = (j * 29 % 307).toDouble
      (j.toLong, lo, lo + (j * 11 % 60).toDouble)
    }.toDF("rid", "r_lo", "r_hi")
    for (w <- Seq(10.0, 33.0, 500.0)) {
      val got = RangeJoin.intervalOverlap(left, "l_lo", "l_hi",
        right, "r_lo", "r_hi", bucketWidth = w)
        .select("lid", "rid").as[(Long, Long)].collect()
      // exactly once: no duplicate pairs even when many buckets shared
      assert(got.length === got.distinct.length,
        s"duplicate pairs at width $w")
      val want = left.join(right,
        col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi") &&
          col("l_lo") < col("l_hi") && col("r_lo") < col("r_hi"))
        .select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got.toSet === want, s"mismatch at width $w")
      assert(want.nonEmpty)
    }
    // half-open: touching intervals do not overlap
    val a = Seq((1L, 0.0, 10.0)).toDF("lid", "l_lo", "l_hi")
    val b = Seq((2L, 10.0, 20.0)).toDF("rid", "r_lo", "r_hi")
    assert(RangeJoin.intervalOverlap(a, "l_lo", "l_hi", b, "r_lo", "r_hi",
      bucketWidth = 5.0).count() === 0)
  }
}
