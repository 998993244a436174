package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** As-of (point-in-time) join: for each left row, the single right row
  * with the same key and the greatest right-timestamp ≤ the left
  * timestamp — the temporal-enrichment operator a training-data /
  * feature pipeline needs (label a purchase with the user's most recent
  * prior view, join a quote to the prevailing rate, …).
  *
  * Built by composition (preference (a) of the build brief — Spark's
  * built-ins CAN express it, so no custom LogicalPlan is warranted):
  * tag both sides, union, and run one ordered window per key with
  * `last(_, ignoreNulls)` carrying the right payload forward. Cost is
  * ONE shuffle + per-key sort over |L|+|R| rows — the canonical
  * scalable formulation. The naive alternative (range-condition join +
  * max-per-left dedup) explodes to O(|L|×|R|) per key and is strictly
  * worse at 100 TB; a backward-looking merge never needs it.
  */
object AsOfJoin {

  /** @param left       probe side; every row survives (left-outer)
    * @param right      reference side; its payload columns are appended
    * @param keys       equi-join key columns (both sides)
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right` (match: rt ≤ lt,
    *                   greatest rt wins; ties on rt broken by the last
    *                   payload in sort order)
    * @param payload    right-side columns to carry (must not collide
    *                   with left column names)
    * @param toleranceMicros max staleness: a match older than
    *                   `leftTime − tolerance` is DISCARDED (payload
    *                   null, left row survives) — the feature-store
    *                   "point-in-time with TTL" contract (a
    *                   week-stale feature must not label today's
    *                   event). Requires TIMESTAMP time columns. The
    *                   plan is unchanged: the window still carries the
    *                   single greatest rt ≤ lt match, and staleness is
    *                   one null-out projection after it — never a
    *                   range-condition join.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      payload: Seq[String],
      toleranceMicros: Option[Long] = None): DataFrame = {
    toleranceMicros.foreach(t =>
      require(t > 0, "toleranceMicros must be positive"))
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    // the carried struct appends an internal `_rt` field for the
    // staleness check; a payload column of that name would shadow it
    require(!payload.contains("_rt"),
      "payload column name '_rt' is reserved by the as-of carry")
    val leftCols = left.columns.toSeq
    val leftNonKey = leftCols.filterNot(keys.contains)
    // Keys are REAL on both sides (they are the window partition); every
    // other column is null on the side that doesn't own it. Right rows
    // sort before a left row at the same timestamp (side 0 < 1) so
    // rt == lt matches (inclusive as-of).
    val lTagged = left.select(
      (keys.map(col) ++ leftNonKey.map(col) ++
        payload.map(p => lit(null).as(p)) :+
        col(leftTime).as("_t")): _*)
      .withColumn("_side", lit(1))
    // A null right timestamp can match nothing (SQL comparison
    // semantics; DuckDB ASOF agrees) — drop those rows, or they'd sort
    // nulls-first and be carried into every left row as a bogus match.
    val rTagged = right.filter(col(rightTime).isNotNull).select(
      (keys.map(col) ++ leftNonKey.map(c => lit(null).as(c)) ++
        payload.map(col) :+
        col(rightTime).as("_t")): _*)
      .withColumn("_side", lit(0))
    val keyed = keys.map(col)
    val u = lTagged.unionByName(rTagged)
    val w = Window.partitionBy(keyed: _*)
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Carry the payload as ONE struct so all columns come from the SAME
    // matched right row (independent per-column carries could mix rows
    // when a right payload column is legitimately null).
    val carried = u
      .withColumn("_pay", when(col("_side") === 0,
        struct((payload.map(col) :+ col("_t").as("_rt")): _*)))
      .withColumn("_pay", last(col("_pay"), ignoreNulls = true).over(w))
      // staleness nulls the whole struct, so every payload column of a
      // too-old match drops together (same single-row discipline as
      // the struct carry itself)
      .withColumn("_pay", toleranceMicros match {
        case Some(t) => when(unix_micros(col("_t")) -
          unix_micros(col("_pay._rt")) <= t, col("_pay"))
        case None => col("_pay")
      })
    val expanded = payload.foldLeft(carried) { (d, p) =>
      d.withColumn(p, col(s"_pay.`$p`"))
    }
    expanded.filter(col("_side") === 1).drop("_t", "_side", "_pay")
  }
}
