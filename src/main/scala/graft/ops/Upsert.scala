package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Key-based merge semantics — the engine's core custom operator
  * (SURVEY.md §2 S3/J2). Replicates the Hudi COPY_ON_WRITE upsert the
  * reference configures (create_hudi_tables.py:120-210, executed at
  * :218-221): new record keys are inserted, existing keys updated, and
  * version conflicts resolved by the *precombine* field — the row with
  * the greatest precombine value wins; on a tie the newer batch wins.
  *
  * Implementation is a hash aggregation with `max_by` over a packed
  * struct, NOT a window sort:
  *
  *   - `groupBy(key).agg(max_by(struct(*), ord))` gets map-side partial
  *     aggregation (each shuffle mapper pre-combines its local rows per
  *     key), so shuffle volume is O(distinct keys per mapper), not O(rows)
  *     — at 100 TB with a skewed update stream this is the difference
  *     between shuffling the table and shuffling the key set.
  *   - The window-function formulation (`row_number` over
  *     partitionBy(key).orderBy(precombine desc)) shuffles every row and
  *     then sorts each partition; it is kept in [[mergeWindowed]] only as
  *     a cross-check for tests.
  */
object Upsert {

  /** Latest-version-per-key merge of `incoming` into `existing`.
    *
    * @param keys       record key columns (hoodie.recordkey.field analog)
    * @param precombine version-resolution columns, compared
    *                   lexicographically in order; greatest wins
    *                   (hoodie.precombine.field analog). On a full tie
    *                   the `incoming` row wins (Hudi: incoming replaces
    *                   stored row when precombine values equal).
    */
  def merge(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      precombine: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    // Additive schema evolution (Hudi-style): a batch may carry columns
    // the table lacks (and vice versa); the merged schema is the union,
    // with absent values null.
    val cols = existing.columns.toSeq ++
      incoming.columns.filterNot(existing.columns.contains)
    val u = existing.withColumn("_src", lit(0))
      .unionByName(incoming.withColumn("_src", lit(1)),
        allowMissingColumns = true)
    val ord = struct((precombine.map(col) :+ col("_src")): _*)
    val payload = struct(cols.map(col): _*)
    u.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("_row"))
      .select(cols.map(c => col(s"_row.`$c`").as(c)): _*)
  }

  /** Window-sort formulation of [[merge]] — semantically identical,
    * shuffles full rows then sorts; used only to cross-check `merge` in
    * property tests (SURVEY.md §5).
    */
  def mergeWindowed(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      precombine: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cols = existing.columns.toSeq
    val u = existing.withColumn("_src", lit(0))
      .unionByName(incoming.withColumn("_src", lit(1)))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy((precombine.map(c => col(c).desc) :+ col("_src").desc): _*)
    u.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(cols.map(col): _*)
  }

  /** Within-batch precombine dedup: one row per key, greatest precombine
    * wins (Hudi `hoodie.combine.before.upsert` behavior; reference
    * enables it implicitly via the precombine field,
    * create_hudi_tables.py:126). Ties are broken arbitrarily but
    * deterministically only if (keys ++ precombine) is unique — callers
    * that need strict determinism must pass a tiebreaking precombine.
    */
  def dedupBatch(
      batch: DataFrame,
      keys: Seq[String],
      precombine: Seq[String]): DataFrame = {
    val cols = batch.columns.toSeq
    val ord = struct(precombine.map(col): _*)
    val payload = struct(cols.map(col): _*)
    batch.groupBy(keys.map(col): _*)
      .agg(max_by(payload, ord).as("_row"))
      .select(cols.map(c => col(s"_row.`$c`").as(c)): _*)
  }

  /** Per-column latest-non-null resolution — the partial-update merge
    * core shared by [[mergePartial]] and [[dedupBatchPartial]]. For
    * every non-key column independently: the value of the greatest-ord
    * row IN WHICH THAT COLUMN IS NON-NULL (null only when the column is
    * null in every row of the key). Expressed as `max` over a
    * `(ord, value)` struct built only when the value is non-null —
    * `max` skips null inputs by SQL semantics and compares structs
    * lexicographically, so this needs no window sort, gets map-side
    * partial aggregation like [[merge]], and shuffles O(distinct keys),
    * not O(rows).
    */
  private def resolvePartial(u: DataFrame, keys: Seq[String],
      ordCols: Seq[String], outCols: Seq[String]): DataFrame = {
    val aggs = outCols.filterNot(keys.contains).map { c =>
      max(when(col(s"`$c`").isNotNull,
        struct((ordCols.map(col) :+ col(s"`$c`").as("v")): _*)))
        .getField("v").as(c)
    }
    u.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(outCols.map(c => col(s"`$c`")): _*)
  }

  /** Partial-update merge — the Hudi `PartialUpdateAvroPayload` /
    * `OverwriteNonDefaultsWithLatestAvroPayload` analog of [[merge]]:
    * instead of the whole greatest-precombine row replacing the stored
    * row, each column independently takes its latest NON-NULL value in
    * precombine order (incoming wins ties, like [[merge]]). An update
    * batch can therefore carry just the columns it changes, NULL
    * elsewhere, without erasing stored values — the sparse-update
    * shape CDC streams and feature-backfill pipelines emit.
    *
    * A column that is null in every version of a key stays null.
    * Schema evolution matches [[merge]]: the output schema is the
    * union, absent columns read as null (and so never win).
    */
  def mergePartial(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String],
      precombine: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert requires at least one key column")
    val cols = existing.columns.toSeq ++
      incoming.columns.filterNot(existing.columns.contains)
    val u = existing.withColumn("_src", lit(0))
      .unionByName(incoming.withColumn("_src", lit(1)),
        allowMissingColumns = true)
    resolvePartial(u, keys, precombine :+ "_src", cols)
  }

  /** Within-batch combine under partial-update semantics: several
    * sparse updates to one key in the same batch FOLD (each column's
    * latest non-null wins) rather than collapse to the single
    * greatest-precombine row — the batch-side half of the Hudi
    * partial-payload contract ([[dedupBatch]]'s whole-row analog).
    */
  def dedupBatchPartial(
      batch: DataFrame,
      keys: Seq[String],
      precombine: Seq[String]): DataFrame =
    resolvePartial(batch, keys, precombine, batch.columns.toSeq)

  /** Rows of `existing` whose key does NOT appear in `incoming` — the
    * untouched side of an upsert (SURVEY.md §2c: upsert internally needs
    * anti-join semantics). Broadcast-friendly: when `incoming`'s key set
    * is small Catalyst/AQE turns this into a broadcast hash anti-join.
    */
  def untouched(
      existing: DataFrame,
      incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.join(incoming.select(keys.map(col): _*).distinct(),
      keys, "left_anti")
}
