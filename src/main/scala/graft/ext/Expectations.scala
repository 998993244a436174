package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

/** Declarative data-quality expectations over a frame — the
  * validation gate a production pipeline runs before publishing a
  * commit (the Deequ/dbt-test idea, reduced to its Spark-native core:
  * a rule is just a boolean `Column`).
  *
  * Cost model: [[check]] evaluates ALL rules in ONE aggregation over
  * ONE scan — per-rule violation counts are conditional sums inside a
  * single map-side-combined aggregate, so adding a rule never adds a
  * pass over the data. A NULL predicate result counts as a violation
  * (an expectation that cannot be established is not met).
  * [[orphans]] is the referential-integrity check: a broadcast-or-
  * shuffled anti-join on the key, counting child rows with no parent.
  */
object Expectations {

  /** Violation flag: 1 unless the predicate is definitely true. */
  private def viol(pred: Column): Column =
    when(pred, 0L).otherwise(1L)

  /** One summary row per rule: `(rule, n_rows, n_violations, pass)`,
    * computed in a single aggregate over a single scan.
    */
  def check(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val aggs = count(lit(1)).as("n_rows") +:
      rules.map { case (name, pred) => sum(viol(pred)).as(s"v_$name") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = explode(array(rules.map { case (name, _) =>
      struct(lit(name).as("rule"), col(s"v_$name").as("n_violations"))
    }: _*)).as("r")
    wide.select(col("n_rows"), stacked)
      .select(col("r.rule").as("rule"), col("n_rows"),
        col("r.n_violations").as("n_violations"),
        (col("r.n_violations") === 0L).as("pass"))
  }

  /** Rows violating at least one rule, annotated with the violated
    * rule names — the quarantine output (route to a dead-letter table,
    * keep the clean rows flowing).
    */
  def violations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    val names = array_compact(array(rules.map { case (name, pred) =>
      when(viol(pred) === 1L, lit(name)).otherwise(lit(null))
    }: _*))
    df.withColumn("violated_rules", names)
      .filter(size(col("violated_rules")) > 0)
  }

  /** Single-scan column profile: `(column, n_rows, n_nulls,
    * n_distinct, min_value, max_value)` per requested column —
    * min/max rendered as strings so heterogeneous column types share
    * one result schema. Like [[check]], ALL columns profile in ONE
    * aggregation over ONE scan. Caveat: multiple EXACT distinct
    * aggregates plan through an Expand that replicates every input
    * row once per distinct column — still one scan, but shuffled
    * bytes grow with the column count, so at extreme scale flip
    * `exactDistinct` off to use HLL `approx_count_distinct` (plain
    * partial aggregates, no Expand, same single pass).
    */
  def profile(df: DataFrame, columns: Seq[String],
      exactDistinct: Boolean = true): DataFrame = {
    require(columns.nonEmpty, "at least one column")
    val aggs = count(lit(1)).as("n_rows") +: columns.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
        (if (exactDistinct) countDistinct(col(c))
         else approx_count_distinct(col(c))).as(s"nd_$c"),
        min(col(c)).cast("string").as(s"mn_$c"),
        max(col(c)).cast("string").as(s"mx_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = explode(array(columns.map { c =>
      struct(lit(c).as("column"), col(s"nn_$c").as("n_nulls"),
        col(s"nd_$c").as("n_distinct"), col(s"mn_$c").as("min_value"),
        col(s"mx_$c").as("max_value"))
    }: _*)).as("p")
    wide.select(col("n_rows"), stacked)
      .select(col("p.column").as("column"), col("n_rows"),
        col("p.n_nulls").as("n_nulls"), col("p.n_distinct").as("n_distinct"),
        col("p.min_value").as("min_value"), col("p.max_value").as("max_value"))
  }

  /** Per-group IQR (Tukey-fence) outlier report over a numeric
    * column: `(group…, n_rows, q1, q3, lo_fence, hi_fence,
    * n_outliers)` with fences `q1 − k·IQR` / `q3 + k·IQR` (k = 1.5,
    * the boxplot classic).
    *
    * Quartiles are RANK-EXACT, not interpolated: the value at row
    * rank `⌈p·n⌉` of the group's ascending sort. Deliberate —
    * interpolation formulas (`a + d(b−a)` vs `(1−d)a + db`) differ in
    * final ulps across engines, and a fence that drifts one ulp can
    * flip a boundary row's outlier flag; the rank-exact quartile is a
    * REAL data value, so fences and flags are bit-identical on any
    * engine running the same IEEE ops (ties in the value column are
    * rank-ambiguous but value-unambiguous). One window shuffle+sort
    * per group plus a broadcast fence join; at extreme scale pass
    * `approx = true` to swap the ranked window for
    * `percentile_approx` the same way [[profile]] trades exact
    * distinct counts for HLL — the fences lose exactness (rank error
    * ≤ n/accuracy), the single-scan shape stays and the per-group
    * serial sort disappears.
    */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Double = 1.5, approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val vals = df.select(gcols :+ col(valueCol).as("_v"): _*)
      .filter(col("_v").isNotNull)
    // Two quartile engines, one fence/count shape. Rank-exact
    // (default): the value at row rank ⌈p·n⌉ of the group's sort — a
    // REAL data value, bit-identical across engines, which is what
    // the driver oracle checks. Its price: the row_number window
    // routes every row of a group through ONE task's sort, so
    // parallelism is #groups, not #cores — the sf1 board showed it as
    // the worst non-output-bound ratio (5.07× for 10× data).
    // `approx = true` swaps in `percentile_approx` (a MERGEABLE
    // KLL-style sketch: map-side partial aggregation, parallelism =
    // #cores, no per-group sort) with rank error ≤ n/accuracy — the
    // quartile is still a real data value, just up to that many ranks
    // off; fences inherit the small shift. At extreme group sizes
    // this is the path to RUN; the rank-exact path is the oracle.
    val fences = (if (approx) {
      vals.groupBy(gcols: _*)
        .agg(percentile_approx(col("_v"),
          array(lit(0.25), lit(0.75)), lit(accuracy)).as("_q"))
        .select(gcols :+ col("_q").getItem(0).as("q1") :+
          col("_q").getItem(1).as("q3"): _*)
    } else {
      val w = Window.partitionBy(gcols: _*).orderBy(col("_v"))
      val cw = Window.partitionBy(gcols: _*)
      val ranked = vals
        .withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(cw))
      ranked.groupBy(gcols: _*)
        .agg(
          max(when(col("_rn") === ceil(col("_n") * 0.25), col("_v"))).as("q1"),
          max(when(col("_rn") === ceil(col("_n") * 0.75), col("_v"))).as("q3"))
    })
      .withColumn("lo_fence", col("q1") - lit(k) * (col("q3") - col("q1")))
      .withColumn("hi_fence", col("q3") + lit(k) * (col("q3") - col("q1")))
    // outlier counting joins the RAW values against the broadcast
    // fences — the rank columns are not needed on this branch. Joining
    // `ranked` here happened to cost nothing (ColumnPruning drops the
    // unreferenced window expressions, A/B-verified at sf1), but the
    // explicit form states the intent instead of leaning on the
    // optimizer to discover it.
    vals.join(broadcast(fences), groupCols)
      .groupBy(gcols: _*)
      .agg(count(lit(1)).as("n_rows"),
        first("q1").as("q1"), first("q3").as("q3"),
        first("lo_fence").as("lo_fence"), first("hi_fence").as("hi_fence"),
        count(when(col("_v") < col("lo_fence") ||
          col("_v") > col("hi_fence"), lit(1))).as("n_outliers"))
  }

  /** Per-group quantile profile at arbitrary probabilities — the
    * monitoring face of [[iqrOutliers]]' rank-exact trick: quantile p
    * is the value at row_number `ceil(n·p)` in the group's sort order,
    * a REAL data value with no interpolation, so the report is
    * cross-engine bit-exact (the property the driver oracle checks;
    * `percentile_approx` is the documented swap at extreme group
    * sizes, same as the IQR scaladoc). One sort shuffle on the group
    * key, one aggregation; each requested p is a conditional-max
    * column, so the column count — not the row count — scales with
    * `ps`.
    */
  def quantileReport(df: DataFrame, groupCols: Seq[String],
      valueCol: String, ps: Seq[Double], approx: Boolean = false,
      accuracy: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty, "at least one group column")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "probabilities must be in (0, 1]")
    import org.apache.spark.sql.expressions.Window
    val gcols = groupCols.map(col)
    val vals = df.select(gcols :+ col(valueCol).as("_v"): _*)
      .filter(col("_v").isNotNull)
    // label from the FULL decimal digits of 100·p (0.995 → p99_5,
    // 0.005 → p0_5) — round-to-percent labels collide for distinct
    // probabilities (0.005 and 0.01 would both emit "p1"), yielding
    // duplicate output columns that break downstream selects
    def label(p: Double): String = {
      // scale in BigDecimal, not double: 0.07 * 100 is the double
      // 7.000000000000001, which would leak into the label; BigDecimal
      // starts from the shortest decimal rendering so ×100 is exact
      val d = (BigDecimal(p) * 100).underlying.stripTrailingZeros.toPlainString
      "p" + d.replace("-", "").replace(".", "_")
    }
    val labels = ps.map(label)
    require(labels.distinct.size == labels.size,
      s"quantile probabilities map to duplicate labels: ${labels.mkString(", ")}")
    if (approx) {
      // same swap (and same contract note) as [[iqrOutliers]]: one
      // mergeable percentile_approx sketch per group — map-side
      // partials, no per-group sort, rank error ≤ n/accuracy
      val qa = percentile_approx(col("_v"),
        array(ps.map(lit): _*), lit(accuracy)).as("_q")
      vals.groupBy(gcols: _*)
        .agg(count(lit(1)).as("n_rows"), qa)
        .select(gcols ++ (col("n_rows") +:
          labels.zipWithIndex.map { case (l, i) =>
            col("_q").getItem(i).as(l)
          }): _*)
    } else {
      val w = Window.partitionBy(gcols: _*).orderBy(col("_v"))
      val cw = Window.partitionBy(gcols: _*)
      val ranked = vals
        .withColumn("_rn", row_number().over(w))
        .withColumn("_n", count(lit(1)).over(cw))
      val qCols = ps.zip(labels).map { case (p, l) =>
        max(when(col("_rn") === ceil(col("_n") * p), col("_v"))).as(l)
      }
      ranked.groupBy(gcols: _*)
        .agg(count(lit(1)).as("n_rows"), qCols: _*)
    }
  }

  /** Population-stability-index drift report between a REFERENCE and a
    * CURRENT corpus over equal-width bins of a numeric column — the
    * distribution-drift monitor a continuously-ingesting training
    * pipeline runs between snapshots (PSI is the standard industry
    * gauge: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 drifted).
    * Per-bin: exact counts from one aggregation per side (map-side
    * combine, `bins`-sized results), the two proportions, and the PSI
    * term `(p−q)·ln(p/q)` with both proportions floored at `eps` so
    * empty bins contribute a finite penalty instead of ±∞. The total
    * PSI is the sum of the term column — left to the caller/monitor so
    * the report stays one grain.
    *
    * Cross-engine note: counts and bin ids are integer-exact; the term
    * is rounded to 9 decimals, absorbing the ≤1-ulp `ln` divergence
    * class between libm implementations (the sim_rproj rounding
    * posture). Values outside [lo, hi) clamp into the edge bins, so
    * the report always partitions both corpora.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, value: Column,
      bins: Int, lo: Double, hi: Double,
      eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, "at least two bins")
    require(hi > lo, "hi must exceed lo")
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(value.cast(DoubleType).as("_v"))
      // NULL values ride through as a NULL bin: they count toward the
      // side's TOTAL (a missing value is still a row of the corpus —
      // the FromCounts twins and the DuckDB oracle both count it) but
      // never land on the 0..bins-1 spine. Filtering them here would
      // silently shrink totals relative to the incremental twin fed by
      // the same rows (code-review r12 finding).
      // Clamp on the LONG floor BEFORE narrowing: a non-ANSI long→int
      // cast wraps (keeps the low 32 bits), so a far-out-of-range value
      // could land in an interior bin instead of the edge.
      .select(least(lit((bins - 1).toLong), greatest(lit(0L),
        floor((col("_v") - lit(lo)) / lit((hi - lo) / bins))))
        .cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(out))
    psiDriftFromCounts(binned(ref, "n_ref"), binned(cur, "n_cur"),
      bins, eps)
  }

  /** [[psiDrift]] from pre-aggregated per-bin histograms
    * `(bin, n_ref)` / `(bin, n_cur)` — the incremental-monitoring
    * entry point: the current side's histogram is exactly a
    * (bin)-keyed [[graft.ops.IncrementalAgg]] count state, so
    * distribution drift against a frozen reference refreshes at
    * O(increment) from a bins-sized frame — the same posture as the
    * incremental eval family. Term arithmetic is byte-identical to
    * [[psiDrift]] (round(…,9) per term — the PSI float posture). */
  def psiDriftFromCounts(refCounts: DataFrame, curCounts: DataFrame,
      bins: Int, eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, "at least two bins")
    // defensive merge of duplicate bin rows (the rocAucFromCounts
    // posture) — an unmerged split bin would duplicate the spine row
    // and compute each term from partial counts
    val r = refCounts.select(col("bin"),
        col("n_ref").cast("long").as("n_ref"))
      .groupBy("bin").agg(sum("n_ref").as("n_ref"))
    val c = curCounts.select(col("bin"),
        col("n_cur").cast("long").as("n_cur"))
      .groupBy("bin").agg(sum("n_cur").as("n_cur"))
    val rt = broadcast(r.agg(sum(col("n_ref")).as("_tr")))
    val ct = broadcast(c.agg(sum(col("n_cur")).as("_tc")))
    val allBins = refCounts.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
    val p = greatest(col("n_ref").cast(DoubleType) / col("_tr"), lit(eps))
    val q = greatest(col("n_cur").cast(DoubleType) / col("_tc"), lit(eps))
    allBins
      .join(r, Seq("bin"), "left").join(c, Seq("bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(rt).crossJoin(ct)
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((p - q) * log(p / q), 9).as("psi_term_r"))
  }

  /** Per-slice [[psiDrift]]: one PSI report PER GROUP (per feed
    * source, per tenant, per language) between the reference and
    * current corpora — the slice matrix a multi-source ingestion
    * pipeline monitors (aggregate drift can hide one source drifting
    * against another; the slice report cannot). One aggregation per
    * side at (group, bin) grain; the group universe is the union of
    * groups seen on either side, and each group gets the full dense
    * bin spine with its own totals. */
  def psiDriftBy(ref: DataFrame, cur: DataFrame, groupCol: String,
      value: Column, bins: Int, lo: Double, hi: Double,
      eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, "at least two bins")
    require(hi > lo, "hi must exceed lo")
    def binned(df: DataFrame, out: String): DataFrame = df
      .select(col(groupCol), value.cast(DoubleType).as("_v"))
      // NULL GROUPS are dropped (no slice to report them under); NULL
      // VALUES ride through as a NULL bin so they count toward the
      // group's total exactly like the FromCounts twin and the oracle
      // (code-review r12 finding — filtering them shrank totals
      // relative to the incremental twin fed by the same rows)
      .filter(col(groupCol).isNotNull)
      .select(col(groupCol),
        least(lit((bins - 1).toLong), greatest(lit(0L),
          floor((col("_v") - lit(lo)) / lit((hi - lo) / bins))))
          .cast("int").as("bin"))
      .groupBy(groupCol, "bin").agg(count(lit(1)).as(out))
    psiDriftByFromCounts(binned(ref, "n_ref"), binned(cur, "n_cur"),
      groupCol, bins, eps)
  }

  /** [[psiDriftBy]] from pre-aggregated `(group, bin, n_ref)` /
    * `(group, bin, n_cur)` histograms — the incremental entry point:
    * the current side is exactly a (group, bin)-keyed
    * [[graft.ops.IncrementalAgg]] count state, so the WHOLE slice
    * matrix refreshes at O(increment) from a groups × bins-sized
    * frame (the eval-family slice posture applied to drift). Term
    * arithmetic is byte-identical to [[psiDriftFromCounts]]. */
  def psiDriftByFromCounts(refCounts: DataFrame, curCounts: DataFrame,
      groupCol: String, bins: Int, eps: Double = 1e-6): DataFrame = {
    require(bins >= 2, "at least two bins")
    // defensive merge of duplicate (group, bin) rows (the
    // rocAucFromCounts posture)
    val r = refCounts.select(col(groupCol), col("bin"),
        col("n_ref").cast("long").as("n_ref"))
      .groupBy(groupCol, "bin").agg(sum("n_ref").as("n_ref"))
    val c = curCounts.select(col(groupCol), col("bin"),
        col("n_cur").cast("long").as("n_cur"))
      .groupBy(groupCol, "bin").agg(sum("n_cur").as("n_cur"))
    val rt = r.groupBy(groupCol).agg(sum("n_ref").as("_tr"))
    val ct = c.groupBy(groupCol).agg(sum("n_cur").as("_tc"))
    // group universe = groups seen on EITHER side; a group absent from
    // one entire side still reports its rows (the counts show which
    // side is empty) with a NULL term — a one-sided proportion is 0/0,
    // and a silent drop would hide exactly the scariest event (a feed
    // appearing or vanishing)
    val groups = r.select(groupCol).union(c.select(groupCol)).distinct()
    val spine = groups.crossJoin(
      refCounts.sparkSession.range(0, bins)
        .select(col("id").cast("int").as("bin")))
    val p = greatest(col("n_ref").cast(DoubleType) / col("_tr"), lit(eps))
    val q = greatest(col("n_cur").cast(DoubleType) / col("_tc"), lit(eps))
    spine
      .join(r, Seq(groupCol, "bin"), "left")
      .join(c, Seq(groupCol, "bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .join(rt, Seq(groupCol), "left").join(ct, Seq(groupCol), "left")
      .select(col(groupCol), col("bin"), col("n_ref"), col("n_cur"),
        when(col("_tr").isNotNull && col("_tc").isNotNull,
          round((p - q) * log(p / q), 9)).as("psi_term_r"))
  }

  /** Referential integrity: `(rule, n_rows, n_violations, pass)` for
    * child keys with no matching parent key (NULL child keys are
    * orphans — a null FK fails the expectation; relax with an
    * upstream filter if nullable FKs are legal).
    */
  def orphans(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, rule: String = "referential_integrity"): DataFrame = {
    val orphanCount = child
      .join(parent.select(col(parentKey).as(childKey)).distinct(),
        Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
    child.agg(count(lit(1)).as("n_rows"))
      .crossJoin(orphanCount)
      .select(lit(rule).as("rule"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }
}
