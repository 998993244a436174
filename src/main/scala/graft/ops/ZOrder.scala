package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton) clustering — the multi-column storage layout
  * behind Hudi's `hoodie.clustering.plan.strategy.sort.columns` with
  * z-order mode and Delta's OPTIMIZE ZORDER BY. A lexicographic sort
  * (`sortBy`) makes per-file ranges disjoint only on its PREFIX
  * column; interleaving the bits of several columns' normalized ranks
  * gives every participating column locality, so the column-stats
  * sidecar ([[graft.tables.ColumnStats]]) prunes files for predicates
  * on ANY of them.
  *
  * Construction (all codegen'd Column arithmetic, no UDFs):
  *   1. one metadata-sized agg collects each column's min/max;
  *   2. each value linearly scales to a `bits`-wide integer rank
  *      (nulls → rank 0, constant columns → 0);
  *   3. ranks interleave bit-by-bit into one LongType z-value
  *      (`cols.size * bits ≤ 60` keeps the arithmetic ANSI-safe);
  *   4. `repartitionByRange` + `sortWithinPartitions` on the z-value
  *      lay files out along the curve; the helper column is dropped
  *      before the write (a projection is narrow — it cannot reorder
  *      rows within partitions).
  *
  * Linear scaling (not exact ranks) is the standard engineering
  * trade-off: skewed distributions cluster less evenly, but the layout
  * stays a one-pass, shuffle-only operation at any scale.
  */
object ZOrder {

  /** The interleaved z-value of `cols` as a LongType Column. Numeric,
    * date, and timestamp columns only (values must linearly embed into
    * a rank).
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 16): Column = {
    require(cols.size >= 2, "z-order needs at least 2 columns")
    require(cols.size * bits <= 60,
      s"cols.size * bits must be <= 60 (ANSI-safe long): ${cols.size} * $bits")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType] || dt == DateType ||
        dt == TimestampType,
        s"z-order column $c has non-embeddable type $dt")
    }
    def asDouble(c: String): Column = df.schema(c).dataType match {
      case DateType => unix_date(col(c)).cast(DoubleType)
      case TimestampType => unix_micros(col(c)).cast(DoubleType)
      case _ => col(c).cast(DoubleType)
    }
    // one metadata-sized job for the per-column ranges
    val mm = df.agg(
      struct(cols.flatMap(c =>
        Seq(min(asDouble(c)).as(s"mn_$c"), max(asDouble(c)).as(s"mx_$c"))): _*)
        .as("s")).select("s.*").head()
    val maxRank = (1L << bits) - 1
    val ranks = cols.zipWithIndex.map { case (c, i) =>
      val mn = mm.getAs[Any](s"mn_$c")
      val mx = mm.getAs[Any](s"mx_$c")
      if (mn == null || mx == null || mn == mx) lit(0L)
      else {
        val lo = mn.asInstanceOf[Double]
        val hi = mx.asInstanceOf[Double]
        val scaled = ((asDouble(c) - lit(lo)) / lit(hi - lo) *
          lit(maxRank.toDouble))
        // clamp + null→0 so every row has a rank
        coalesce(greatest(lit(0L),
          least(lit(maxRank), scaled.cast(LongType))), lit(0L))
      }
    }
    // bit interleave: output bit (b * n + i) = bit b of rank i
    val n = cols.size
    (0 until bits).flatMap { b =>
      ranks.zipWithIndex.map { case (r, i) =>
        shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** `df` re-laid-out along the z-curve of `cols`: range-partitioned
    * and sorted by the interleaved z-value, helper column dropped.
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 16): DataFrame = {
    val z = "_zorder"
    df.withColumn(z, zvalue(df, cols, bits))
      .repartitionByRange(col(z))
      .sortWithinPartitions(col(z))
      .drop(z)
  }
}
