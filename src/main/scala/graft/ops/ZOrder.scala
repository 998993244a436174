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
  *   1. per-column min/max ranges — folded from the column-stats
  *      sidecars (kilobyte metadata) when the caller supplies them,
  *      else one column-pruned agg over the input;
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

  /** A value column embedded into doubles for ranking. */
  private def asDouble(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case DateType => unix_date(col(c)).cast(DoubleType)
      case TimestampType => unix_micros(col(c)).cast(DoubleType)
      case _ => col(c).cast(DoubleType)
    }

  /** Per-column `bits`-wide linear ranks (steps 1–2 of the z-value
    * construction) — shared with [[Hilbert]], which replaces only the
    * bit-combination step.
    *
    * `ranges` supplies known per-column (lo, hi) embeddings (e.g.
    * folded from column-stats sidecars — kilobyte metadata); columns
    * not covered get their range from one column-pruned agg over `df`.
    * A too-narrow supplied range only clamps outliers to the edge
    * ranks — clustering quality, never correctness.
    */
  private[ops] def ranks(df: DataFrame, cols: Seq[String], bits: Int,
      ranges: Map[String, (Double, Double)]): Seq[Column] = {
    require(cols.size >= 2, "multi-column clustering needs at least 2 columns")
    require(cols.size * bits <= 60,
      s"cols.size * bits must be <= 60 (ANSI-safe long): ${cols.size} * $bits")
    cols.foreach { c =>
      val dt = df.schema(c).dataType
      require(dt.isInstanceOf[NumericType] || dt == DateType ||
        dt == TimestampType,
        s"clustering column $c has non-embeddable type $dt")
    }
    val missing = cols.filterNot(ranges.contains)
    val computed: Map[String, (Double, Double)] =
      if (missing.isEmpty) Map.empty
      else {
        val mm = df.agg(
          struct(missing.flatMap(c => Seq(
            min(asDouble(df, c)).as(s"mn_$c"),
            max(asDouble(df, c)).as(s"mx_$c"))): _*)
            .as("s")).select("s.*").head()
        missing.flatMap { c =>
          (Option(mm.getAs[Any](s"mn_$c")), Option(mm.getAs[Any](s"mx_$c"))) match {
            case (Some(lo: java.lang.Double), Some(hi: java.lang.Double)) =>
              Some(c -> (lo.doubleValue, hi.doubleValue))
            case _ => None // all-null column — constant rank below
          }
        }.toMap
      }
    val bounds = ranges ++ computed
    val maxRank = (1L << bits) - 1
    cols.map { c =>
      bounds.get(c) match {
        // degenerate ranges (all-null, constant, NaN/Inf endpoints —
        // max() surfaces a single NaN as the column max) → constant
        // rank; an unguarded NaN would crash the ANSI double→long cast
        case Some((lo, hi))
            if java.lang.Double.isFinite(lo) &&
              java.lang.Double.isFinite(hi) && hi - lo > 0 =>
          val d = asDouble(df, c)
          val frac = (d - lit(lo)) / lit(hi - lo) * lit(maxRank.toDouble)
          // clamp in DOUBLE space (cast after — an out-of-range or NaN
          // value must never reach the ANSI cast), nulls → rank 0
          when(d.isNull, lit(0L)).otherwise(
            least(lit(maxRank.toDouble),
              greatest(lit(0.0), nanvl(frac, lit(0.0))))
              .cast(LongType))
        case _ => lit(0L)
      }
    }
  }

  /** The interleaved z-value of `cols` as a LongType Column. Numeric,
    * date, and timestamp columns only (values must linearly embed into
    * a rank); see [[ranks]] for the `ranges` contract.
    */
  def zvalue(df: DataFrame, cols: Seq[String], bits: Int = 16,
      ranges: Map[String, (Double, Double)] = Map.empty): Column = {
    val rk = ranks(df, cols, bits, ranges)
    // bit interleave: output bit (b * n + i) = bit b of rank i
    val n = cols.size
    (0 until bits).flatMap { b =>
      rk.zipWithIndex.map { case (r, i) =>
        shiftleft(shiftright(r, b).bitwiseAND(lit(1L)), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** `df` re-laid-out along the z-curve of `cols`: range-partitioned
    * (into `numPartitions` when given) and sorted by the interleaved
    * z-value, helper column dropped.
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 16,
      numPartitions: Option[Int] = None,
      ranges: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    val z = "_zorder"
    val withZ = df.withColumn(z, zvalue(df, cols, bits, ranges))
    numPartitions.fold(withZ.repartitionByRange(col(z)))(
      n => withZ.repartitionByRange(n, col(z)))
      .sortWithinPartitions(col(z))
      .drop(z)
  }
}
