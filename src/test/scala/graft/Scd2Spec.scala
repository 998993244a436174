package graft

import graft.ops.{Scd2, TableOps}
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._

/** Type-2 SCD build over the commit history: interval chaining,
  * no-op-update collapse, tombstone close, and re-insert after delete.
  */
class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "v", "valid_from_ord", "valid_to_ord", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSet

  test("intervals chain, no-op updates collapse, tombstone closes") {
    val base = tmpDir("graft-scd2")
    val t = KeyedTable("scd2_t", s"$base/t", Seq("id"), "ver")
    // c1: keys 1..4 = a; c2: key 1 = b, key 2 = a (no-op); c3: delete key 3
    TableOps.upsert(spark, t, Seq(1L, 2L, 3L, 4L)
      .map((_, "a", 1)).toDF("id", "v", "ver"))
    TableOps.upsert(spark, t, Seq((1L, "b", 2), (2L, "a", 2))
      .toDF("id", "v", "ver"))
    TableOps.softDelete(spark, t, Seq(3L).toDF("id"))
    val got = rows(Scd2.build(spark, t, Seq("v")))
    assert(got === Set(
      (1L, "a", 1L, Some(2L), false),
      (1L, "b", 2L, None, true),
      (2L, "a", 1L, None, true),   // c2's identical write collapsed
      (3L, "a", 1L, Some(3L), false), // closed by the tombstone, no row for it
      (4L, "a", 1L, None, true)))
    // collapse off: the no-op write gets its own interval
    val raw = rows(Scd2.build(spark, t, Seq("v"), collapseUnchanged = false))
    assert(raw.contains((2L, "a", 1L, Some(2L), false)) &&
      raw.contains((2L, "a", 2L, None, true)))
  }

  test("re-insert after delete opens a NEW interval even with the same value") {
    val base = tmpDir("graft-scd2-re")
    val t = KeyedTable("scd2_re", s"$base/t", Seq("id"), "ver")
    TableOps.upsert(spark, t, Seq((1L, "a", 1)).toDF("id", "v", "ver"))
    TableOps.softDelete(spark, t, Seq(1L).toDF("id"))
    TableOps.upsert(spark, t, Seq((1L, "a", 3)).toDF("id", "v", "ver"))
    val got = rows(Scd2.build(spark, t, Seq("v")))
    // the tombstone breaks value-collapse across itself: a[1,2), a[3,∞)
    assert(got === Set(
      (1L, "a", 1L, Some(2L), false),
      (1L, "a", 3L, None, true)))
  }
}
