package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Domain-level corpus curation — the C4/RefinedWeb-style pass that
  * profiles a corpus per origin domain (source site, crawl host,
  * dataset shard) and drops whole domains that fail quality gates,
  * before any per-document filtering runs. Operating at domain
  * granularity first is the standard large-corpus move: a spam or
  * boilerplate farm is cheaper to drop as ONE domain row than as
  * millions of per-document quality scores.
  *
  * Reference scope: the reference pipelines carry a source tag per
  * record (`incremental_etl_orders.py` partitions by a source-derived
  * field) but have no corpus curation; this module is part of the
  * SURVEY §2l training-data extension surface.
  *
  * Scale shape (100 TB): [[profile]] is one hash-aggregate shuffle
  * whose output is domain-cardinality (≤ ~10⁸ rows for the full web —
  * thousands of times smaller than the corpus). [[filterByStats]]
  * applies the verdict back with a semi-join on the domain key; AQE
  * plans it as a broadcast join whenever the surviving-domain list
  * fits, and the explicit literal blocklist never joins at all — it
  * is a map-side NOT IN filter evaluated inside the scan's codegen'd
  * Filter. No step is quadratic and nothing domain-sized ever
  * reaches the driver.
  */
object Domains {

  private def toks(textCol: Column): Column =
    split(trim(lower(textCol)), "\\s+")

  /** Per-domain corpus profile: `(domain, n_docs, sum_tokens,
    * n_distinct_texts, n_langs)` — document volume, whitespace-token
    * volume, exact-dup pressure (distinct normalized texts vs docs),
    * and language spread. With `exact=true` (default) all counters
    * are exact integers so the result is value-level verifiable
    * cross-engine; derived ratios (`avg tokens = sum_tokens /
    * n_docs`, `dup rate = 1 − n_distinct_texts / n_docs`) are left
    * to the consumer.
    *
    * One shuffle (hash aggregate on the domain key) with map-side
    * partial aggregation. The exact mode's TWO `count(DISTINCT …)`s
    * make Spark plan the multi-distinct Expand rewrite (each input
    * row replicated ×3 into the partial aggregate — CPU, not extra
    * shuffle volume, since partials still combine map-side). At
    * full-corpus scale pass `exact=false`: `approx_count_distinct`
    * (HLL++, default 5% rsd) keeps the aggregate single-phase with
    * no Expand, and domain-level curation gates only need the
    * ratios' magnitude — the same trade `Expectations.profile`
    * documents for `dq_profile`.
    */
  def profile(docs: DataFrame, domainCol: String, textCol: String,
      langCol: String, exact: Boolean = true): DataFrame = {
    val nd: Column => Column =
      if (exact) countDistinct(_) else approx_count_distinct(_)
    docs.groupBy(col(domainCol).as("domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(toks(col(textCol))).cast("long")).as("sum_tokens"),
        nd(lower(trim(col(textCol)))).as("n_distinct_texts"),
        nd(col(langCol)).as("n_langs"))
  }

  /** Documents surviving domain-level curation: a domain is kept when
    * it has at least `minDocs` documents, a mean whitespace-token
    * length of at least `minAvgTokens`, an exact-dup rate of at most
    * `maxDupRate`, and is not on the literal `blocklist`.
    *
    * The blocklist is applied map-side (`NOT IN` over literals —
    * never a join); the stats verdict comes back via a left-semi join
    * on the domain key against the kept-domain frame (domain-
    * cardinality; AQE broadcasts it when small). `exact=false`
    * switches the dup-rate counter to HLL++ (see [[profile]]) — the
    * right default at full-corpus scale, where a ±5% dup-rate
    * estimate moves no sensible threshold.
    */
  def filterByStats(docs: DataFrame, domainCol: String, textCol: String,
      langCol: String, minDocs: Long, minAvgTokens: Double,
      maxDupRate: Double, blocklist: Seq[String] = Nil,
      exact: Boolean = true): DataFrame = {
    require(minDocs >= 0 && minAvgTokens >= 0 && maxDupRate >= 0,
      "thresholds must be non-negative")
    val kept = profile(docs, domainCol, textCol, langCol, exact)
      .filter(col("n_docs") >= minDocs &&
        col("sum_tokens").cast("double") / col("n_docs") >= minAvgTokens &&
        (lit(1.0) - col("n_distinct_texts").cast("double") / col("n_docs"))
          <= maxDupRate)
      .select(col("domain"))
    val unblocked =
      if (blocklist.isEmpty) docs
      else docs.filter(!col(domainCol).isin(blocklist: _*))
    unblocked.join(kept, unblocked(domainCol) === kept("domain"),
      "left_semi")
  }

  /** Per-domain percentile score banding — the CCNet head/middle/tail
    * split (Wenzek et al. 2020, arXiv:1911.00359 §4.3, which buckets
    * each language's corpus by wiki-LM perplexity percentiles): each
    * row gets `band` = the number of its domain's percentile cuts
    * strictly below its score (0 = lowest band, `cuts.length` =
    * highest). Works over any numeric score column — token counts,
    * [[TextStats.lmScore]], a classifier margin.
    *
    * Determinism: cut values are rounded to 6 dp before comparison
    * (libm-drift discipline). With an INTEGER score column and
    * quarter/half cut fractions the interpolated percentiles are
    * exact binary arithmetic — bit-identical on any engine — which is
    * the operating point the driver oracle pins.
    *
    * Scale shape (100 TB): one hash aggregate to domain-cardinality
    * cut rows (`exact=true` uses Spark's exact `percentile`, whose
    * per-group state is a value→count map — right when score
    * cardinality is bounded, e.g. integer token counts; for unbounded
    * float scores at full corpus scale pass `exact=false` →
    * `approx_percentile` (GK summaries, bounded memory, documented
    * accuracy knob) — the same truth-plus-switch trade
    * [[Expectations.profile]] documents). Cuts join back on the
    * domain key (domain-cardinality frame — AQE broadcasts it); the
    * band arithmetic is a codegen'd higher-order fold, map-only.
    */
  def scoreBands(scored: DataFrame, domainCol: String, scoreCol: String,
      cuts: Seq[Double] = Seq(0.25, 0.5, 0.75),
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(cuts.nonEmpty && cuts == cuts.sorted && cuts.distinct == cuts
      && cuts.forall(c => c > 0 && c < 1),
      "cuts must be strictly increasing, all in (0, 1)")
    val cutsStr = cuts.mkString(", ")
    val agg =
      if (exact) expr(s"percentile(`$scoreCol`, array($cutsStr))")
      else expr(s"approx_percentile(`$scoreCol`, array($cutsStr), $accuracy)")
    // NULL-SAFE join back: the aggregate computes cuts for a NULL
    // domain like any other group, so the verdict must reach those
    // rows too (`<=>` — a plain equi-join would silently drop them).
    val bounds = scored.groupBy(col(domainCol))
      .agg(agg.as("_cuts"))
      .withColumnRenamed(domainCol, "_cut_dom")
    scored.join(bounds, col(domainCol) <=> col("_cut_dom"))
      .drop("_cut_dom")
      .withColumn("band",
        aggregate(transform(col("_cuts"), c => round(c, 6)), lit(0),
          (acc, c) => acc + when(col(scoreCol) > c, 1).otherwise(0)))
      .drop("_cuts")
  }

  /** Rank-based per-domain score banding: `band` = the row's k-tile
    * (0 = lowest … k−1 = highest) within its domain under the TOTAL
    * order (score, id) — SQL `ntile` semantics (the first n mod k
    * bands carry the extra row). Unlike [[scoreBands]] (threshold
    * cuts from interpolated percentiles) the bands are exactly
    * balanced by construction and the verdict is pure integer rank
    * arithmetic — bit-exact cross-engine for ANY score type, floats
    * included, because no quantile interpolation ever happens. NULL
    * domains band within their own partition (no join to lose them).
    *
    * The price at scale: a per-domain window sort (shuffle on the
    * domain key + sort — partitioned, never global) instead of an
    * aggregate; prefer [[scoreBands]] with `exact=false` when
    * approximate thresholds are acceptable at full corpus scale and
    * the domain cardinality is low enough that a hot domain's sort
    * would dominate.
    */
  def rankBands(scored: DataFrame, domainCol: String, scoreCol: String,
      idCol: String, k: Int = 4): DataFrame = {
    require(k >= 2, "k must be at least 2")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(domainCol))
      .orderBy(col(scoreCol).asc, col(idCol).asc)
    scored.withColumn("band", ntile(k).over(w) - 1)
  }
}
