package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Bucketed point-in-interval join — the scale path for the non-equi
  * join Spark would otherwise plan as a BroadcastNestedLoopJoin (fine
  * only while the range side broadcasts; degenerate past that).
  *
  * Each interval `[lo, hi)` explodes into the fixed-width buckets it
  * touches; each point maps to exactly ONE bucket; the match becomes a
  * plain equi-join on the bucket id with the exact interval predicate
  * as a residual filter. This is the classic IP→geo / price-band /
  * histogram-assignment shape: shuffle volume is points + Σ
  * ceil(span/width) per range — pick `bucketWidth` near the typical
  * interval span so most ranges explode into O(1) buckets.
  *
  * Scale notes (100 TB): the equi-join shuffles on the bucket id, so
  * hot buckets (value skew) are ordinary join skew — AQE's skew-join
  * splitting applies, unlike the nested-loop plan it replaces. With a
  * broadcastable range side Catalyst turns the equi-join into a
  * BroadcastHashJoin and the whole operator is map-only. Overlapping
  * intervals are allowed and produce one output row per covering
  * interval (exactly the non-equi semantics).
  */
object RangeJoin {

  /** Inner-join `points` rows to every `ranges` row whose
    * `[loCol, hiCol)` interval contains `valueCol`. Bucket column
    * names are internal and dropped; all other columns from both
    * sides pass through (they must not collide).
    */
  def pointInRange(points: DataFrame, valueCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = "_rj_bucket"
    // hi is EXCLUSIVE: a bucket-aligned hi must not emit the dead
    // [hi, hi+w) bucket (its points could never pass the residual —
    // pure wasted shuffle/join rows, ~1 extra bucket per aligned
    // range). Empty and inverted intervals match nothing under the
    // residual, so they are dropped up front instead of fanning out
    // through a descending sequence().
    val hiBucket = floor(col(hiCol) / bucketWidth).cast("long") -
      when(col(hiCol) % bucketWidth === 0.0, 1L).otherwise(0L)
    val exploded = ranges
      .filter(col(loCol) < col(hiCol))
      .withColumn(b, explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"), hiBucket)))
    points
      .withColumn(b, floor(col(valueCol) / bucketWidth).cast("long"))
      .join(exploded, Seq(b))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop(b)
  }

  /** Interval-OVERLAP join — both sides are intervals: inner-join every
    * `left` row to every `right` row with `[lLo, lHi) ∩ [rLo, rHi) ≠ ∅`
    * (half-open; i.e. `lLo < rHi AND rLo < lHi`). The
    * temporal/IP-range workhorse ([[pointInRange]] can't express it —
    * neither side is a point), and again the shape Spark would plan as
    * a BroadcastNestedLoopJoin.
    *
    * Same grid decomposition, both sides exploded; a pair overlapping
    * k shared buckets must be emitted ONCE, so instead of a wide-row
    * `distinct` the pair is emitted only in its FIRST shared bucket —
    * `bucket == max(firstBucket(l), firstBucket(r))`, which both sides
    * provably occupy (it is the bucket of `max(lLo, rLo)`, a point
    * inside both intervals whenever they overlap) — a pure filter, no
    * second shuffle. Skew/broadcast/AQE notes as [[pointInRange]];
    * shuffle volume is Σ ceil(span/width) over BOTH sides, so pick
    * `bucketWidth` near the typical span of the DENSER side.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String,
      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val b = "_rj_bucket"
    def firstBucket(lo: String) = floor(col(lo) / bucketWidth).cast("long")
    def lastBucket(hi: String) = floor(col(hi) / bucketWidth).cast("long") -
      when(col(hi) % bucketWidth === 0.0, 1L).otherwise(0L)
    def exploded(df: DataFrame, lo: String, hi: String) = df
      .filter(col(lo) < col(hi))
      .withColumn(b, explode(sequence(firstBucket(lo), lastBucket(hi))))
    exploded(left, lLo, lHi)
      .join(exploded(right, rLo, rHi), Seq(b))
      .filter(col(lLo) < col(rHi) && col(rLo) < col(lHi))
      .filter(col(b) === greatest(firstBucket(lLo), firstBucket(rLo)))
      .drop(b)
  }
}
