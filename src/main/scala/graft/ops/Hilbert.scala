package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Hilbert-curve clustering — the alternative multi-column layout next
  * to [[ZOrder]] (Hudi 0.10's `hoodie.layout.optimize.curve.build
  * .method=hilbert`, Databricks' liquid-clustering ancestor). The
  * Hilbert curve preserves locality strictly better than the Morton
  * curve: consecutive curve positions are ALWAYS grid neighbors (the
  * Z-curve takes long diagonal jumps at power-of-two boundaries), so
  * a box predicate touches fewer distinct curve ranges → fewer files
  * at the same bit budget.
  *
  * Construction: per-column linear ranks come from the shared
  * [[ZOrder.ranks]] (stats-sidecar ranges honored, null/NaN/constant
  * guards identical); the rank vector then runs Skilling's
  * axes-to-transpose transform ("Programming the Hilbert curve", AIP
  * 2004 — the standard public-domain formulation) and interleaves to
  * one LongType index. The transform is a fixed `bits−1`-round
  * bit-twiddling loop; each round lands as its OWN projection
  * (chained `withColumns`), because inlining the rounds into one
  * Column tree duplicates the running `x0` expression per reference
  * and grows the tree exponentially — Catalyst's CollapseProject
  * guard keeps the chained form polynomial, and every op inside is
  * codegen'd long arithmetic (XOR/AND/shift), no UDFs.
  *
  * Scale: identical shape to z-order clustering — one (optional)
  * range agg, a fixed chain of narrow projections, one range
  * partitioning + within-partition sort. The curve only changes WHICH
  * long the layout sorts by.
  */
object Hilbert {

  /** `df` plus the Hilbert index of `cols` as LongType column `out`
    * (helper columns dropped). See [[ZOrder.ranks]] for the `ranges`
    * contract. */
  def withIndex(df0: DataFrame, cols: Seq[String], bits: Int = 16,
      ranges: Map[String, (Double, Double)] = Map.empty,
      out: String = "_hilbert"): DataFrame = {
    val n = cols.size
    val rk = ZOrder.ranks(df0, cols, bits, ranges)
    val hc = (i: Int) => col(s"_h$i")
    var df = df0.withColumns(
      (0 until n).map(i => s"_h$i").zip(rk).toMap)
    // Skilling axes → transpose: per round, bit Q of each axis decides
    // invert-x0 vs exchange-with-x0 on the low bits P = Q−1
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        val cond = hc(i).bitwiseAND(lit(q)) =!= lit(0L)
        if (i == 0) {
          df = df.withColumn("_h0",
            when(cond, hc(0).bitwiseXOR(lit(p))).otherwise(hc(0)))
        } else {
          val t = hc(0).bitwiseXOR(hc(i)).bitwiseAND(lit(p))
          df = df.withColumns(Map(
            "_h0" -> when(cond, hc(0).bitwiseXOR(lit(p)))
              .otherwise(hc(0).bitwiseXOR(t)),
            s"_h$i" -> when(cond, hc(i)).otherwise(hc(i).bitwiseXOR(t))))
        }
      }
      q >>= 1
    }
    // Gray encode (sequential: each axis folds the PREVIOUS updated one)
    for (i <- 1 until n)
      df = df.withColumn(s"_h$i", hc(i).bitwiseXOR(hc(i - 1)))
    val tExpr =
      if (bits == 1) lit(0L)
      else (1 until bits).map { qb =>
        val qq = 1L << qb
        when(hc(n - 1).bitwiseAND(lit(qq)) =!= lit(0L), lit(qq - 1))
          .otherwise(lit(0L))
      }.reduce(_.bitwiseXOR(_))
    df = df.withColumn("_ht", tExpr)
    df = df.withColumns(
      (0 until n).map(i => s"_h$i" -> hc(i).bitwiseXOR(col("_ht"))).toMap)
    // transpose-interleave: index bit (b·n + (n−1−i)) = bit b of axis i
    val h = (0 until bits).flatMap { b =>
      (0 until n).map { i =>
        shiftleft(shiftright(hc(i), b).bitwiseAND(lit(1L)),
          b * n + (n - 1 - i))
      }
    }.reduce(_.bitwiseOR(_))
    df.withColumn(out, h)
      .drop((0 until n).map(i => s"_h$i") :+ "_ht": _*)
  }

  /** `df` re-laid-out along the Hilbert curve of `cols`:
    * range-partitioned (into `numPartitions` when given) and sorted by
    * the index, helper column dropped — [[ZOrder.cluster]]'s exact
    * shape with the curve swapped. */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 16,
      numPartitions: Option[Int] = None,
      ranges: Map[String, (Double, Double)] = Map.empty): DataFrame = {
    val h = "_hilbert"
    val withH = withIndex(df, cols, bits, ranges, h)
    numPartitions.fold(withH.repartitionByRange(col(h)))(
      n => withH.repartitionByRange(n, col(h)))
      .sortWithinPartitions(col(h))
      .drop(h)
  }
}
