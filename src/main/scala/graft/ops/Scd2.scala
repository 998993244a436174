package graft.ops

import graft.tables.{CommitLog, KeyedTable}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Type-2 slowly-changing-dimension build — turn a keyed table's
  * commit history into validity intervals: one row per (key, tracked-
  * value version) with `valid_from`/`valid_to` commit bounds and an
  * `is_current` flag. The classic warehouse surface over exactly the
  * upsert lifecycle the reference's orders ETL drives (its Hudi table
  * + a downstream dimension consumer is this operator's natural user):
  * instead of replaying the CDC feed into a second modeling job, the
  * dimension falls straight out of [[TableOps.changeLog]], which
  * already stamps EVERY intermediate version of a key with the commit
  * that wrote it.
  *
  * Semantics:
  *   - versions of a key are ordered by commit; `valid_from` is the
  *     version's own commit, `valid_to` the NEXT retained version's
  *     commit (null = still current);
  *   - consecutive versions with identical tracked values collapse
  *     into one interval by default (`collapseUnchanged`) — the
  *     standard SCD2 "no-op update writes no history" rule; a
  *     soft-delete tombstone ([[TableOps.softDelete]]) never collapses
  *     with its neighbors, CLOSES the live interval at its commit, and
  *     emits no interval itself;
  *   - both the raw commit ts and its dense ORDINAL (1-based, over the
  *     table's full commit list — matching [[TableOps.timeline]] row
  *     order) are emitted; ordinals make the output a pure function of
  *     the write SEQUENCE, independent of wall-clock, which is what a
  *     value-level oracle can replay.
  *
  * Scale: one changeLog read (commit-dir unions, each pruned to its
  * own rows), a broadcast join against the kilobyte commit-ordinal
  * map, and ONE window shuffle on the record key — the same partition
  * a downstream key-merge would need anyway. History growth is bounded
  * by retention: versions in cleaned commits are gone (document the
  * dimension's horizon = the table's retention horizon).
  */
object Scd2 {

  /** @param trackCols the dimension attributes whose changes open a new
    *                   interval; all other columns ride along with the
    *                   version that opened the interval.
    */
  def build(spark: SparkSession, t: KeyedTable, trackCols: Seq[String],
      collapseUnchanged: Boolean = true): DataFrame = {
    require(trackCols.nonEmpty, "trackCols must be nonempty")
    import spark.implicits._
    // surviving-records-only BY CONTRACT (scaladoc above: "History
    // growth is bounded by retention: versions in cleaned commits are
    // gone") — so the changeLog completeness guard must not refuse an
    // archival-cleaned table here; the dimension's documented horizon
    // IS the retention horizon
    val changes = TableOps.changeLog(spark, t, "", None,
      allowIncomplete = true)
    // commit → 1-based ordinal: driver-side kilobyte manifest listing
    // (the timeline surface), broadcast — never a data-path window
    val ordinals = broadcast(
      CommitLog(t, spark).listCommits().sorted.zipWithIndex
        .map { case (ts, i) => (ts, (i + 1).toLong) }
        .toDF(KeyedTable.CommitCol, "_ord"))
    val keyCols = t.recordKey.map(col)
    val w = Window.partitionBy(keyCols: _*).orderBy(col("_ord"))
    val tracked = struct((trackCols.map(col) :+ col("_change_type")): _*)
    val ordered = changes.join(ordinals, Seq(KeyedTable.CommitCol))
    // a tombstone participates in the version stream (it must close
    // the previous interval and BREAK value-collapse across itself)
    // but is dropped from the output after the lead() is taken
    val collapsed =
      if (!collapseUnchanged) ordered
      else ordered
        .withColumn("_prev", lag(tracked, 1).over(w))
        .filter(col("_prev").isNull || !(col("_prev") <=> tracked))
        .drop("_prev")
    collapsed
      .withColumn("valid_from", col(KeyedTable.CommitCol))
      .withColumn("valid_from_ord", col("_ord"))
      // both leads in ONE projection: chained withColumn leaves a
      // Project between the Window nodes that blocks CollapseWindow
      // (two Window execs + a redundant sort for the same spec)
      .select(col("*"),
        lead(col(KeyedTable.CommitCol), 1).over(w).as("valid_to"),
        lead(col("_ord"), 1).over(w).as("valid_to_ord"))
      .filter(col("_change_type") =!= lit("delete"))
      .withColumn("is_current", col("valid_to_ord").isNull)
      .drop("_ord", "_change_type", KeyedTable.CommitCol)
  }
}
