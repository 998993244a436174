package graft

import graft.ops.{TableOps, ZOrder}
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._

/** Z-order clustering: Morton-value correctness against a driver-side
  * reference, and the payoff — column-stats file skipping on BOTH
  * dimensions of a 2-column layout (a lexicographic sort serves only
  * its prefix).
  */
class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  test("zvalue matches the driver-side Morton interleave on a grid") {
    val bits = 2
    val grid = for (x <- 0 to 3; y <- 0 to 3) yield (x.toLong, y.toLong)
    val df = grid.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
      ZOrder.zvalue(df, Seq("x", "y"), bits).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def morton(x: Long, y: Long): Long =
      (0 until bits).map { b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))
      }.reduce(_ | _)
    // x,y span 0..3 with bits=2 ⇒ linear scaling is the identity rank
    grid.foreach { case (x, y) =>
      assert(got((x, y)) === morton(x, y), s"z($x,$y)")
    }
  }

  test("nulls rank 0 and NaN/constant columns degrade to constant rank, no ANSI crash") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (0L, 1.0), (3L, Double.NaN), (null, 4.0), (2L, 2.0))
      .toDF("x", "y")
    val got = df.select(col("x"), ZOrder.zvalue(df, Seq("x", "y"), 2).as("z"))
      .collect().map(r => Option(r.get(0)) -> r.getLong(1)).toMap
    // y's max() is NaN ⇒ its range is non-finite ⇒ y contributes rank
    // 0 everywhere; x=null ranks 0 like x=min
    assert(got(Some(0L)) === got(None))
    // x=3 → rank 3 (bits 1,1) at interleave positions 0 and 2 → z=5
    assert(got(Some(3L)) === 5L)
  }

  test("numFiles bounds the z-order output layout") {
    val base = tmpDir("graft-zorder")
    val t = KeyedTable("t", s"$base/t", Seq("id"), "ver",
      statsColumns = Seq("x", "y"))
    val df = spark.range(256).select(
      col("id").cast("string").as("id"), lit(1).as("ver"),
      (col("id") / 16).cast("long").as("x"),
      (col("id") % 16).cast("long").as("y"))
    TableOps.upsert(spark, t, df)
    TableOps.compact(spark, t, numFiles = Some(2),
      zorderBy = Seq("x", "y"))
    assert(TableOps.snapshot(spark, t).inputFiles.length === 2)
    assert(TableOps.snapshot(spark, t).count() === 256)
  }

  test("z-order compaction prunes files on BOTH columns via column stats") {
    val base = tmpDir("graft-zorder")
    val t = KeyedTable("t", s"$base/t", Seq("id"), "ver",
      statsColumns = Seq("x", "y"))
    // 32x32 grid in row-major insert order: a lexicographic sort on x
    // would leave y spread 0..31 in every file
    val df = spark.range(1024).select(
      col("id").cast("string").as("id"), lit(1).as("ver"),
      (col("id") / 32).cast("long").as("x"),
      (col("id") % 32).cast("long").as("y"))
    TableOps.upsert(spark, t, df)
    TableOps.compact(spark, t, maxRecordsPerFile = 64L,
      zorderBy = Seq("x", "y"))
    val full = TableOps.snapshot(spark, t)
    assert(full.count() === 1024)
    for (pred <- Seq(
        col("x") >= 4L && col("x") < 8L,
        col("y") >= 4L && col("y") < 8L, // NOT a sort prefix — the point
        col("x") < 8L && col("y") < 8L)) {
      val pruned = TableOps.snapshotWhere(spark, t, pred)
      assert(pruned.select("id").orderBy("id").collect().toSeq ===
        full.filter(pred).select("id").orderBy("id").collect().toSeq)
      assert(pruned.inputFiles.length < full.inputFiles.length,
        s"no pruning for $pred: ${pruned.inputFiles.length} of ${full.inputFiles.length}")
    }
  }
}
