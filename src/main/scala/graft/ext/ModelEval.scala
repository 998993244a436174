package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Binary-classifier evaluation: ROC-AUC, a thresholded confusion
  * report, and a calibration (reliability) table — the measurement
  * side of the model-based quality-filter loop ([[Classifier]] trains
  * and scores; this module answers "is the score any good, and is it
  * calibrated?" before the filter gates a 100 TB corpus on it).
  *
  * Everything is exact integer arithmetic until one final division:
  *   - AUC is the tie-corrected Mann–Whitney statistic computed over
  *     DISTINCT-SCORE groups, never row-level pairs: with pos_g/neg_g
  *     the per-score class counts and cnb_g the negatives strictly
  *     below score g,  2·U = Σ_g pos_g · (2·cnb_g + neg_g)  (ties
  *     count half), and AUC = 2U / (2·n_pos·n_neg). The cells fold
  *     through DECIMAL(38,0) so no count ever saturates BIGINT.
  *   - confusion cells are plain conditional counts; precision /
  *     recall / accuracy / F1 are each written as ONE division of two
  *     exact integers (F1 = 2tp / (2tp+fp+fn), never 2pr/(p+r)), so
  *     every emitted double is a single correctly-rounded IEEE op on
  *     identical operands — bit-stable cross-engine with no rounding
  *     shims.
  *   - calibration reuses the [[Expectations.psiDrift]] fixed-grid
  *     clamp (floor on the LONG bin before narrowing) over a
  *     caller-fixed [lo, hi): per-bin n / n_pos exact, pos_rate one
  *     division.
  *
  * Scale: rocAuc's only row-sized stage is the map-side-combinable
  * groupBy(score); the prefix over distinct scores reuses the
  * [[Packing.assignShards]] two-phase decomposition (approx-quantile
  * bucket cuts on the GROUPED frame, per-bucket negative totals — a
  * ≤4096-row driver collect — then a bucket-partitioned window), so
  * no single-partition global window ever appears even when score
  * cardinality approaches row count. Cut placement is value-invariant:
  * buckets are score-monotone and equal scores always share a bucket
  * (strict `>` against each cut), so cnb_g — negatives STRICTLY
  * below g — is the same for any cut vector. confusionAt and
  * calibration are one map-side-combinable aggregate each.
  */
object ModelEval {

  /** (score, label) projection: null scores/labels are DROPPED (they
    * carry no ranking/label semantics — the null-group convention),
    * then the binary-label contract is enforced inside the plan
    * (raise_error — stays distributed, fails fast; nulls are filtered
    * FIRST so the check never fires a null-valued message). */
  private def scored(df: DataFrame, labelCol: String,
      scoreCol: String): DataFrame = {
    val y = col(labelCol).cast("long")
    df.select(col(scoreCol).cast(DoubleType).as("_s"), y.as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull)
      .select(col("_s"),
        when(col("_y").isin(0L, 1L), col("_y")).otherwise(raise_error(
          concat(lit(s"ModelEval: label '$labelCol' must be 0/1, got "),
            col("_y").cast("string")))).as("_y"))
  }

  /** Approximate quantile cuts + monotone bucket assignment over a
    * distinct-score frame (`_s` column) — the shared phase 1 of every
    * two-phase prefix here. Cut placement is value-invariant: buckets
    * are score-monotone and equal scores always share a bucket
    * (strict `>` against each cut), so approxQuantile's partition-
    * order sensitivity can move bucket BALANCE but never an output
    * value. Returns (cuts, bucket column); offsets loops run over
    * `0 to cuts.length`. */
  private def scoreBuckets(g: DataFrame, buckets: Int): (Seq[Double], Column) = {
    val cuts: Seq[Double] =
      if (buckets == 1) Nil
      else g.stat.approxQuantile("_s",
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .toSeq.distinct.sorted
    val bucketOf: Column =
      if (cuts.isEmpty) lit(0)
      else aggregate(array(cuts.map(lit): _*), lit(0),
        (acc, c) => acc + when(col("_s") > c, 1).otherwise(0))
    (cuts, bucketOf)
  }

  /** Shared phase 2 of the per-group two-phase operators (rocAucBy,
    * averagePrecisionByFromCounts, rocCurveBy): collect the
    * `(group, bucket, total₁..totalₖ)` frame — capped at 4096 rows,
    * the slice-report contract — and return a broadcastable offsets
    * frame carrying, per (group, bucket), each total's EXCLUSIVE
    * per-group ascending-bucket running prefix (`offNames`) plus its
    * per-group grand total (`totNames`). The prefix arithmetic and
    * the cap live HERE once, so a fix cannot silently miss a sibling
    * operator. */
  private def groupOffsets(totals: DataFrame, opName: String,
      offNames: Seq[String], totNames: Seq[String]): DataFrame = {
    require(offNames.size == totNames.size)
    val k = offNames.size
    val tRows = totals.collect()
    require(tRows.length <= 4096,
      s"$opName: groups × occupied buckets = ${tRows.length} exceeds " +
        "the 4096 driver-collect cap — lower `buckets` or slice on a " +
        "lower-cardinality group column")
    val offRows = tRows.groupBy(_.get(0)).values.toSeq.flatMap { rs =>
      val sorted = rs.sortBy(_.getInt(1))
      val tots = (0 until k).map(i => sorted.map(_.getLong(2 + i)).sum)
      val acc = Array.fill(k)(0L)
      sorted.map { r =>
        val o = org.apache.spark.sql.Row.fromSeq(
          Seq(r.get(0), r.getInt(1)) ++ acc.toSeq ++ tots)
        (0 until k).foreach(i => acc(i) += r.getLong(2 + i))
        o
      }
    }
    val lt = org.apache.spark.sql.types.LongType
    val offSchema = org.apache.spark.sql.types.StructType(
      totals.schema.fields.take(2) ++ (offNames ++ totNames)
        .map(org.apache.spark.sql.types.StructField(_, lt,
          nullable = false)))
    import scala.jdk.CollectionConverters._
    totals.sparkSession.createDataFrame(offRows.asJava, offSchema)
  }

  /** Tie-corrected ROC-AUC (Mann–Whitney). One row:
    * `(n_pos, n_neg, u2, auc)` with `u2` = 2·U as DECIMAL(38,0) —
    * the exact integer surface — and `auc` null when either class is
    * empty. `buckets` bounds the per-bucket window sort; per-bucket
    * totals are collected, so it is capped at 4096. */
  def rocAuc(df: DataFrame, labelCol: String, scoreCol: String,
      buckets: Int = 256): DataFrame =
    rocAucFromCounts(
      scored(df, labelCol, scoreCol)
        .groupBy("_s")
        .agg(sum("_y").as("pos_g"), count(lit(1)).as("tot_g")),
      buckets)

  /** [[rocAuc]] from a PRE-AGGREGATED distinct-score frame
    * `(_s, pos_g, tot_g)` — the entry point for incrementally
    * maintained counts (an [[graft.ops.IncrementalAgg]] state table
    * grouped by score IS this frame: cnt = tot_g, sum of the 0/1
    * label = pos_g), so model-quality monitoring refreshes at
    * O(increment) and the AUC is recomputed from the
    * distinct-score-sized state — never by rescanning the corpus. */
  def rocAucFromCounts(counts: DataFrame,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 1 && buckets <= 4096,
      "buckets must be in [1, 4096] (per-bucket totals are collected)")
    // materialize the distinct-score frame ONCE: the quantile-cut job,
    // the totals collect, and the final aggregate would otherwise each
    // re-derive the caller's (possibly corpus-sized) score plan — 3
    // scans instead of 1 (caught live: eval_auc re-ran the whole
    // bigram-LM pipeline three times, 4.97 s -> LM-cost at sf0.1)
    // The re-aggregation by _s also makes duplicate-score rows (e.g.
    // unmerged per-batch counts) safe: the strict-below prefix treats
    // a tie partner as below, so unmerged ties would corrupt the
    // tie-corrected U — merge them here instead of requiring callers
    // to. On an already-distinct frame this is one no-op-shaped
    // shuffle of a distinct-score-sized frame, absorbed by the
    // localCheckpoint that had to happen anyway.
    val g = counts
      .select(col("_s"), col("pos_g").cast("long").as("pos_g"),
        col("tot_g").cast("long").as("tot_g"))
      .groupBy("_s")
      .agg(sum("pos_g").as("pos_g"), sum("tot_g").as("tot_g"))
      .withColumn("neg_g", col("tot_g") - col("pos_g"))
      .localCheckpoint()
    val (cuts, bucketOf) = scoreBuckets(g, buckets)
    val gb = g.withColumn("_b", bucketOf)
    // Phase 2: per-bucket negative totals -> driver prefix offsets
    // (metadata-sized: ≤ buckets rows).
    val totals = gb.groupBy("_b").agg(sum("neg_g").as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 to cuts.length).map { b =>
        val o = b -> acc; acc += totals.getOrElse(b, 0L); o
      }.toMap
    }
    // Phase 3: within-bucket strict-below prefix + literal offset.
    val w = Window.partitionBy("_b").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cnb = (element_at(typedLit(offsets), col("_b")) +
      coalesce(sum(col("neg_g")).over(w), lit(0L))).cast("decimal(38,0)")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val cells = gb
      .select(col("pos_g"), col("neg_g"),
        (dec(col("pos_g")) * (dec(lit(2)) * cnb + dec(col("neg_g"))))
          .as("_u2g"))
      .agg(sum(col("pos_g")).as("n_pos"), sum(col("neg_g")).as("n_neg"),
        sum(col("_u2g")).cast("decimal(38,0)").as("u2"))
    cells.select(col("n_pos"), col("n_neg"), col("u2"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        col("u2").cast(DoubleType) /
          (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Per-group ROC-AUC — the per-language / per-source slice audit of
    * [[rocAuc]] (a score that looks calibrated on the pooled corpus
    * can be anti-predictive inside one source; Simpson's reversal is
    * exactly what the slice report exposes). Output one row per group:
    * `(groupCol, n_pos, n_neg, u2, auc)`.
    *
    * Same two-phase shape as [[rocAuc]]: cuts are computed ONCE on the
    * global distinct-score frame (cut placement is value-invariant, so
    * sharing them across groups is free); the driver collect is the
    * (group × occupied-bucket) totals frame — capped at 4096 rows, so
    * this is the SLICE report (groups are languages/sources/folds, not
    * user ids); per-group running offsets come back as one broadcast
    * join; the window partitions by (group, bucket). */
  def rocAucBy(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, buckets: Int = 64,
      weightCol: Option[String] = None): DataFrame = {
    require(buckets >= 1 && buckets <= 4096,
      "buckets must be in [1, 4096] (per-bucket totals are collected)")
    // a null group is not a slice — and the offsets equi-join would
    // silently drop it anyway (null never equi-matches); exclude it
    // explicitly so the contract is visible. Nulls filter BEFORE the
    // binary check so the raise never fires a null-valued message.
    // With a weight column (exact non-negative integers — resampling
    // multiplicities, not float importance weights), every count
    // becomes a weighted count: zero/null-weight rows carry nothing
    // and drop.
    val wExpr = weightCol.map(col(_).cast("long")).getOrElse(lit(1L))
    val base = df.select(col(groupCol).as("_g"),
        col(scoreCol).cast(DoubleType).as("_s"),
        col(labelCol).cast("long").as("_y"), wExpr.as("_w"))
      .filter(col("_s").isNotNull && col("_y").isNotNull &&
        col("_g").isNotNull && col("_w").isNotNull && col("_w") > 0L)
      .select(col("_g"), col("_s"), col("_w"),
        when(col("_y").isin(0L, 1L), col("_y")).otherwise(raise_error(
          concat(lit(s"ModelEval: label '$labelCol' must be 0/1, got "),
            col("_y").cast("string")))).as("_y"))
    val g = base.groupBy("_g", "_s")
      .agg(sum(col("_w") * col("_y")).as("pos_g"),
        sum(col("_w")).as("tot_g"))
      .withColumn("neg_g", col("tot_g") - col("pos_g"))
      .localCheckpoint() // see rocAuc: cuts + totals + final each re-read
    val (cuts, bucketOf) = scoreBuckets(g, buckets)
    val gb = g.withColumn("_b", bucketOf)
    val totals = gb.groupBy("_g", "_b").agg(sum("neg_g").as("_t"))
    val offDf = groupOffsets(totals, "rocAucBy",
      offNames = Seq("_off"), totNames = Seq("_negTot"))
    val joined = gb.join(broadcast(offDf), Seq("_g", "_b"))
    val w = Window.partitionBy("_g", "_b").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cnb = (col("_off") + coalesce(sum(col("neg_g")).over(w), lit(0L)))
      .cast("decimal(38,0)")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    joined
      .select(col("_g"), col("pos_g"), col("neg_g"),
        (dec(col("pos_g")) * (dec(lit(2)) * cnb + dec(col("neg_g"))))
          .as("_u2g"))
      .groupBy("_g")
      .agg(sum(col("pos_g")).as("n_pos"), sum(col("neg_g")).as("n_neg"),
        sum(col("_u2g")).cast("decimal(38,0)").as("u2"))
      .select(col("_g").as(groupCol), col("n_pos"), col("n_neg"),
        col("u2"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast(DoubleType) /
            (lit(2.0) * col("n_pos") * col("n_neg"))).as("auc"))
  }

  /** Per-group [[averagePrecision]] — the slice audit of ranking
    * quality on imbalanced classes (AP weights the head of the
    * ranking, so a source whose positives sit under a pile of
    * high-scoring negatives craters its slice AP long before the
    * pooled number moves — the PR-space twin of the [[rocAucBy]]
    * Simpson's argument). Output one row per group:
    * `(groupCol, n_pos, n_neg, ap)` with ap null when the slice has
    * no positives.
    *
    * Same two-phase shape as [[rocAucBy]]: cuts computed ONCE on the
    * global distinct-score frame (placement is value-invariant, so
    * sharing across groups is free); ONE driver collect of the
    * (group × occupied-bucket) totals — capped at 4096 — comes back
    * as a broadcast join carrying per-group running offsets AND the
    * per-group grand totals; descending "thru" prefixes derive from
    * total − strictly-below inside (group, bucket) windows. Term
    * arithmetic is byte-identical to the pooled [[averagePrecision]]
    * (two divisions + one multiply on exact integers, DECIMAL(28,9)
    * fold, round 6). */
  def averagePrecisionBy(df: DataFrame, groupCol: String,
      labelCol: String, scoreCol: String, buckets: Int = 64): DataFrame =
    averagePrecisionByFromCounts(
      scoredBy(df, groupCol, labelCol, scoreCol)
        .select(col("_g").as(groupCol), col("_s"), col("_y"))
        .groupBy(groupCol, "_s")
        .agg(sum("_y").as("pos_g"), count(lit(1)).as("tot_g")),
      groupCol, buckets)

  /** [[averagePrecisionBy]] from a pre-aggregated per-(group, score)
    * frame `(groupCol, _s, pos_g, tot_g)` — the incremental entry
    * point: the SAME (group, score)-keyed [[graft.ops.IncrementalAgg]]
    * state that feeds the per-slice AUC serves the per-slice AP, so
    * one state maintenance cost covers the whole threshold-free slice
    * family. Duplicate-score rows are merged defensively (the
    * rocAucFromCounts posture). */
  def averagePrecisionByFromCounts(counts: DataFrame, groupCol: String,
      buckets: Int = 64): DataFrame = {
    require(buckets >= 1 && buckets <= 4096,
      "buckets must be in [1, 4096] (per-bucket totals are collected)")
    val g = counts
      .select(col(groupCol).as("_g"), col("_s"),
        col("pos_g").cast("long").as("pos_g"),
        col("tot_g").cast("long").as("tot_g"))
      .groupBy("_g", "_s")
      .agg(sum("pos_g").as("pos_g"), sum("tot_g").as("tot_g"))
      .localCheckpoint() // see rocAuc: cuts + totals + final each re-read
    val (cuts, bucketOf) = scoreBuckets(g, buckets)
    val gb = g.withColumn("_b", bucketOf)
    val totals = gb.groupBy("_g", "_b")
      .agg(sum("pos_g").as("_p"), sum("tot_g").as("_t"))
    val offDf = groupOffsets(totals, "averagePrecisionBy",
      offNames = Seq("_offp", "_offt"), totNames = Seq("_np", "_nt"))
    val joined = gb.join(broadcast(offDf), Seq("_g", "_b"))
    val w = Window.partitionBy("_g", "_b").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumPosThru = col("_np") -
      (col("_offp") + coalesce(sum(col("pos_g")).over(w), lit(0L)))
    val cumTotThru = col("_nt") -
      (col("_offt") + coalesce(sum(col("tot_g")).over(w), lit(0L)))
    // a no-positive slice contributes null terms (never a 0-division)
    val term = when(col("_np") > 0L,
      (col("pos_g").cast(DoubleType) / col("_np").cast(DoubleType)) *
        (cumPosThru.cast(DoubleType) / cumTotThru.cast(DoubleType)))
    joined
      .select(col("_g"), col("pos_g"), col("tot_g"),
        term.cast("decimal(28,9)").as("_c"))
      .groupBy("_g")
      .agg(sum(col("pos_g")).as("n_pos"),
        sum(col("tot_g") - col("pos_g")).as("n_neg"),
        round(sum(col("_c")).cast(DoubleType), 6).as("ap"))
      .select(col("_g").as(groupCol), col("n_pos"), col("n_neg"),
        col("ap"))
  }

  /** Cumulative Poisson(1) thresholds in 60-bit hash space:
    * a uniform draw h ∈ [0, 2^60) maps to multiplicity k where
    * T(k−1) ≤ h < T(k), capped at 8 (P(X>8) ≈ 1e-6). Baked integer
    * literals — the SAME longs interpolate into the DuckDB oracle, so
    * the draw is cross-engine exact with no float compare. */
  private[graft] val PoissonCdf60: Seq[Long] = {
    val e1 = math.exp(-1.0)
    (0 to 7)
      .map(k => (0 to k).map(j => e1 / (1 to j).product).sum)
      .map(c => (c * math.pow(2.0, 60)).toLong)
  }

  /** Poisson(1) multiplicity of `i` under `seed` — the bootstrap
    * resampling weight (Chamandy et al., "Estimating uncertainty for
    * massive data streams", Google TR 2012: the Poisson bootstrap
    * replaces sampling-with-replacement, which needs global
    * coordination, with an independent per-row draw). */
  private def poissonWeight(tag: String, seed: Long,
      i: Column): Column = {
    val h = graft.functions.PortableHash.h60(tag, seed, i)
    PoissonCdf60.zipWithIndex.foldRight(lit(8L): Column) {
      case ((t, k), rest) => when(h < t, k.toLong).otherwise(rest)
    }
  }

  /** Poisson-bootstrap confidence interval for [[rocAuc]]: each of
    * `replicates` resamples draws every unit (row of `idCol`) with an
    * independent Poisson(1) multiplicity — the coordination-free
    * equivalent of sampling-with-replacement — and the weighted
    * Mann–Whitney runs per replicate through the [[rocAucBy]]
    * machinery (replicate = the group; weighted counts stay exact
    * integers, so every per-replicate AUC is one division of exact
    * operands). One row:
    * `(n_replicates, auc_lo, auc_med, auc_hi)` — exact order
    * statistics of the replicate AUCs at ranks
    * max(1, ⌈0.025·B⌉) / ⌈0.5·B⌉ / ⌈0.975·B⌉ over the non-null
    * replicates.
    *
    * Scale: the explode multiplies the (score, label, id) projection
    * by B BEFORE the group-by — one pass, map-side combined into a
    * B×distinct-scores frame; the final order-statistics window runs
    * on ≤ B rows. */
  def bootstrapAuc(df: DataFrame, labelCol: String, scoreCol: String,
      idCol: String, replicates: Int = 32, seed: Long = 42L,
      buckets: Int = 64): DataFrame = {
    require(replicates >= 2 && replicates <= 256,
      "replicates must be in [2, 256]")
    val expanded = df.select(col(idCol).cast("long").as("_id"),
        col(labelCol).as("_y0"), col(scoreCol).as("_s0"))
      .withColumn("_b", explode(array(
        (0 until replicates).map(b => lit(b.toLong)): _*)))
      .withColumn("_w", poissonWeight("boot", seed,
        col("_id") * replicates + col("_b")))
    val per = rocAucBy(expanded, "_b", "_y0", "_s0", buckets,
      weightCol = Some("_w"))
    val wr = Window.orderBy(col("auc")) // ≤ B rows — bounded by contract
    val ranked = per.filter(col("auc").isNotNull)
      .select(col("auc"))
      .withColumn("_r", row_number().over(wr))
      .withColumn("_nb", count(lit(1)).over(
        Window.partitionBy(lit(1))))
    val rank = (p: Double) =>
      greatest(lit(1L), ceil(lit(p) * col("_nb")).cast("long"))
    ranked.agg(
      max(col("_nb")).as("n_replicates"),
      max(when(col("_r") === rank(0.025), col("auc"))).as("auc_lo"),
      max(when(col("_r") === rank(0.5), col("auc"))).as("auc_med"),
      max(when(col("_r") === rank(0.975), col("auc"))).as("auc_hi"))
  }

  /** Average precision (PR-AUC, sklearn step convention): with
    * thresholds at the distinct scores descending,
    * AP = Σ_g (pos_g / n_pos) · (cumPos_thru_g / cumTot_thru_g).
    * The descending prefixes derive from the SAME ascending two-phase
    * machinery as [[rocAuc]] (thru = total − strictly-below, with the
    * totals baked as literals from the offsets collect), so again no
    * single-partition window. Each term is three IEEE ops on exact
    * integer operands (two divisions, one multiply — identical
    * operand order cross-engine), folded through DECIMAL(28,9) — the
    * BM25 order-independence posture. One row:
    * `(n_pos, n_neg, ap)` with ap = round(Σ, 6), null when no
    * positives exist. */
  def averagePrecision(df: DataFrame, labelCol: String, scoreCol: String,
      buckets: Int = 256): DataFrame =
    averagePrecisionFromCounts(
      scored(df, labelCol, scoreCol)
        .groupBy("_s")
        .agg(sum("_y").as("pos_g"), count(lit(1)).as("tot_g")),
      buckets)

  /** [[averagePrecision]] from a pre-aggregated distinct-score frame
    * `(_s, pos_g, tot_g)` — the incremental-monitoring entry point
    * (the SAME score-grouped [[graft.ops.IncrementalAgg]] state that
    * feeds [[rocAucFromCounts]] feeds this). */
  def averagePrecisionFromCounts(counts: DataFrame,
      buckets: Int = 256): DataFrame = {
    require(buckets >= 1 && buckets <= 4096,
      "buckets must be in [1, 4096] (per-bucket totals are collected)")
    val g = counts
      .select(col("_s"), col("pos_g").cast("long").as("pos_g"),
        col("tot_g").cast("long").as("tot_g"))
      // defensive merge of duplicate-score rows (see rocAucFromCounts)
      .groupBy("_s")
      .agg(sum("pos_g").as("pos_g"), sum("tot_g").as("tot_g"))
      .localCheckpoint() // see rocAuc: cuts + totals + final each re-read
    val (cuts, bucketOf) = scoreBuckets(g, buckets)
    val gb = g.withColumn("_b", bucketOf)
    val totals = gb.groupBy("_b")
      .agg(sum("pos_g").as("_p"), sum("tot_g").as("_t"))
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    var accP = 0L; var accT = 0L
    val offP = scala.collection.mutable.Map.empty[Int, Long]
    val offT = scala.collection.mutable.Map.empty[Int, Long]
    (0 to cuts.length).foreach { b =>
      offP(b) = accP; offT(b) = accT
      val (p, t) = totals.getOrElse(b, (0L, 0L))
      accP += p; accT += t
    }
    val (nPos, nTot) = (accP, accT)
    val w = Window.partitionBy("_b").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cumPosThru = lit(nPos) -
      (element_at(typedLit(offP.toMap), col("_b")) +
        coalesce(sum(col("pos_g")).over(w), lit(0L)))
    val cumTotThru = lit(nTot) -
      (element_at(typedLit(offT.toMap), col("_b")) +
        coalesce(sum(col("tot_g")).over(w), lit(0L)))
    val term = (col("pos_g").cast(DoubleType) / lit(nPos.toDouble)) *
      (cumPosThru.cast(DoubleType) / cumTotThru.cast(DoubleType))
    // materialize the windowed term first (window and aggregate
    // functions cannot share a stage), then fold
    val perScore = gb.select(col("pos_g"), col("tot_g"),
      term.cast("decimal(28,9)").as("_c"))
    val apCol =
      if (nPos == 0L) max(lit(null).cast(DoubleType))
      else round(sum(col("_c")).cast(DoubleType), 6)
    perScore.agg(sum(col("pos_g")).as("n_pos"),
      sum(col("tot_g") - col("pos_g")).as("n_neg"),
      apCol.as("ap"))
  }

  /** Downsampled ROC curve: one point per kept distinct-score
    * threshold, `(thr, n_at_or_above, fpr, tpr)` with
    * tpr = (pos at score ≥ thr)/n_pos and fpr likewise — the
    * visualization/report face of [[rocAuc]]. Descending "at or
    * above" prefixes derive from the SAME ascending two-phase
    * machinery (total − strictly-below), so no single-partition
    * window at any score cardinality; each rate is ONE division of
    * exact integers. Downsampling keeps every `step`-th distinct
    * score in ascending rank order (step = ⌈G/maxPoints⌉) plus the
    * top score, a rule the oracle replays verbatim — deterministic,
    * not a sample. */
  def rocCurve(df: DataFrame, labelCol: String, scoreCol: String,
      maxPoints: Int = 512, buckets: Int = 256): DataFrame =
    rocCurveFromCounts(
      scored(df, labelCol, scoreCol)
        .groupBy("_s")
        .agg(sum("_y").as("pos_g"), count(lit(1)).as("tot_g")),
      maxPoints, buckets)

  /** [[rocCurve]] from a pre-aggregated distinct-score frame
    * `(_s, pos_g, tot_g)` — the incremental entry point: the SAME
    * score-grouped [[graft.ops.IncrementalAgg]] state that feeds
    * [[rocAucFromCounts]] and [[averagePrecisionFromCounts]] redraws
    * the monitoring curve at O(increment), so ONE state maintenance
    * cost serves the entire threshold-free eval family. Duplicate-
    * score rows are merged defensively (the rocAucFromCounts
    * posture). */
  def rocCurveFromCounts(counts: DataFrame, maxPoints: Int = 512,
      buckets: Int = 256): DataFrame = {
    require(maxPoints >= 2, "at least two curve points")
    require(buckets >= 1 && buckets <= 4096,
      "buckets must be in [1, 4096] (per-bucket totals are collected)")
    val g = counts
      .select(col("_s"), col("pos_g").cast("long").as("pos_g"),
        col("tot_g").cast("long").as("tot_g"))
      .groupBy("_s")
      .agg(sum("pos_g").as("pos_g"), sum("tot_g").as("tot_g"))
      .localCheckpoint() // cuts + totals + final each re-read (rocAuc)
    val (cuts, bucketOf) = scoreBuckets(g, buckets)
    val gb = g.withColumn("_b", bucketOf)
    // per-bucket (pos, tot, distinct-score row count) -> driver
    // prefix offsets; metadata-sized (≤ buckets rows)
    val totals = gb.groupBy("_b")
      .agg(sum("pos_g").as("_p"), sum("tot_g").as("_t"),
        count(lit(1)).as("_r"))
      .collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    var accP = 0L; var accT = 0L; var accR = 0L
    val offP = scala.collection.mutable.Map.empty[Int, Long]
    val offT = scala.collection.mutable.Map.empty[Int, Long]
    val offR = scala.collection.mutable.Map.empty[Int, Long]
    (0 to cuts.length).foreach { b =>
      offP(b) = accP; offT(b) = accT; offR(b) = accR
      val (p, t, r) = totals.getOrElse(b, (0L, 0L, 0L))
      accP += p; accT += t; accR += r
    }
    val (nPos, nTot, nScores) = (accP, accT, accR)
    val nNeg = nTot - nPos
    val step = math.max(1L, (nScores + maxPoints - 1) / maxPoints)
    val w = Window.partitionBy("_b").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val posBelow = element_at(typedLit(offP.toMap), col("_b")) +
      coalesce(sum(col("pos_g")).over(w), lit(0L))
    val totBelow = element_at(typedLit(offT.toMap), col("_b")) +
      coalesce(sum(col("tot_g")).over(w), lit(0L))
    val ascIdx = element_at(typedLit(offR.toMap), col("_b")) +
      count(lit(1)).over(w) + lit(1L)
    val curve = gb.select(col("_s").as("thr"),
      (lit(nTot) - totBelow).as("n_at_or_above"),
      (lit(nPos) - posBelow).as("_posAbove"),
      ascIdx.as("_i"))
    curve
      .filter(col("_i") % step === 0L || col("_i") === nScores)
      .select(col("thr"), col("n_at_or_above"),
        when(lit(nNeg) > 0,
          (col("n_at_or_above") - col("_posAbove")).cast(DoubleType) /
            lit(nNeg.toDouble)).as("fpr"),
        when(lit(nPos) > 0,
          col("_posAbove").cast(DoubleType) / lit(nPos.toDouble))
          .as("tpr"))
  }

  /** Per-group [[rocCurve]] — one downsampled ROC polyline per slice
    * (the drift dashboard's per-source panel: a pooled curve hides a
    * source whose operating point collapsed). Same deterministic
    * step-rank rule per group (step = ⌈G_g/maxPoints⌉ over the
    * group's OWN distinct-score count, plus its top score), same
    * two-phase machinery as [[averagePrecisionBy]]: shared global
    * cuts, ONE capped (group × bucket) totals collect returning
    * per-group offsets (pos/tot/row-rank) and grand totals as a
    * broadcast join, windows inside (group, bucket). Output one row
    * per kept (group, threshold):
    * `(groupCol, thr, n_at_or_above, fpr, tpr)`. */
  def rocCurveBy(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, maxPoints: Int = 512,
      buckets: Int = 256): DataFrame = {
    require(maxPoints >= 2, "at least two curve points")
    require(buckets >= 1 && buckets <= 4096,
      "buckets must be in [1, 4096] (per-bucket totals are collected)")
    val g = scoredBy(df, groupCol, labelCol, scoreCol)
      .groupBy("_g", "_s")
      .agg(sum("_y").as("pos_g"), count(lit(1)).as("tot_g"))
      .localCheckpoint() // cuts + totals + final each re-read (rocAuc)
    val (cuts, bucketOf) = scoreBuckets(g, buckets)
    val gb = g.withColumn("_b", bucketOf)
    val totals = gb.groupBy("_g", "_b")
      .agg(sum("pos_g").as("_p"), sum("tot_g").as("_t"),
        count(lit(1)).as("_r"))
    val offDf = groupOffsets(totals, "rocCurveBy",
      offNames = Seq("_offp", "_offt", "_offr"),
      totNames = Seq("_np", "_nt", "_nr"))
    val joined = gb.join(broadcast(offDf), Seq("_g", "_b"))
    val w = Window.partitionBy("_g", "_b").orderBy("_s")
      .rowsBetween(Window.unboundedPreceding, -1)
    val posBelow = col("_offp") + coalesce(sum(col("pos_g")).over(w), lit(0L))
    val totBelow = col("_offt") + coalesce(sum(col("tot_g")).over(w), lit(0L))
    val ascIdx = col("_offr") + count(lit(1)).over(w) + lit(1L)
    // Spark's `/` on integers yields DOUBLE — `div` keeps the step an
    // exact LONG so the `%` downsample test stays integer arithmetic
    val step = greatest(lit(1L),
      expr(s"(_nr + ${maxPoints - 1}L) div ${maxPoints}L"))
    joined
      .select(col("_g"), col("_s").as("thr"),
        (col("_nt") - totBelow).as("n_at_or_above"),
        (col("_np") - posBelow).as("_posAbove"),
        ascIdx.as("_i"), step.as("_step"), col("_nr"), col("_np"),
        (col("_nt") - col("_np")).as("_nn"))
      .filter(col("_i") % col("_step") === 0L || col("_i") === col("_nr"))
      .select(col("_g").as(groupCol), col("thr"), col("n_at_or_above"),
        when(col("_nn") > 0,
          (col("n_at_or_above") - col("_posAbove")).cast(DoubleType) /
            col("_nn").cast(DoubleType)).as("fpr"),
        when(col("_np") > 0,
          col("_posAbove").cast(DoubleType) /
            col("_np").cast(DoubleType)).as("tpr"))
  }

  /** Per-group confusion report at `score >= threshold` — the slice
    * view of [[confusionAt]] (one map-side-combinable groupBy; a
    * pooled-acceptable threshold can have pathological per-source
    * precision). One row per group. */
  def confusionAtBy(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, threshold: Double): DataFrame = {
    val cell = (p: Column) => sum(when(p, 1L).otherwise(0L))
    val pred = col("_s") >= threshold
    val ratio = (num: Column, den: Column) =>
      when(den > 0, num.cast(DoubleType) / den)
    scoredBy(df, groupCol, labelCol, scoreCol)
      .groupBy("_g")
      .agg(cell(col("_y") === 1L && pred).as("tp"),
        cell(col("_y") === 0L && pred).as("fp"),
        cell(col("_y") === 1L && !pred).as("fn"),
        cell(col("_y") === 0L && !pred).as("tn"))
      .select(col("_g").as(groupCol), col("tp"), col("fp"), col("fn"),
        col("tn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(col("tp") + col("tn"),
          col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"),
        ratio(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
  }

  /** Confusion report at `score >= threshold`. One row:
    * `(tp, fp, fn, tn, precision, recall, accuracy, f1)` — each rate
    * a single integer division (F1 = 2tp/(2tp+fp+fn)), null when its
    * denominator is zero. */
  def confusionAt(df: DataFrame, labelCol: String, scoreCol: String,
      threshold: Double): DataFrame = {
    val cell = (p: Column) => sum(when(p, 1L).otherwise(0L))
    val pred = col("_s") >= threshold
    val ratio = (num: Column, den: Column) =>
      when(den > 0, num.cast(DoubleType) / den)
    scored(df, labelCol, scoreCol)
      .agg(cell(col("_y") === 1L && pred).as("tp"),
        cell(col("_y") === 0L && pred).as("fp"),
        cell(col("_y") === 1L && !pred).as("fn"),
        cell(col("_y") === 0L && !pred).as("tn"))
      .select(col("tp"), col("fp"), col("fn"), col("tn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(col("tp") + col("tn"),
          col("tp") + col("fp") + col("fn") + col("tn")).as("accuracy"),
        ratio(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
  }

  /** Expected calibration error over the same fixed grid as
    * [[calibration]]: ECE = Σ_b (n_b/N) · |pos_rate_b − conf_b| with
    * conf_b the bin's mean score (sum through DECIMAL(28,9) — exact).
    * Each bin term is a fixed IEEE op sequence on exact operands,
    * rounded to 9 decimals and folded through DECIMAL(28,9) (the BM25
    * posture) so the bins-sized sum is order-independent. One row:
    * `(n, ece)` with ece = round(Σ, 6). */
  def ece(df: DataFrame, labelCol: String, scoreCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins >= 2, "at least two bins")
    require(hi > lo, "hi must exceed lo")
    eceFromCounts(scored(df, labelCol, scoreCol)
      .select(gridBin(bins, lo, hi), col("_y"), col("_s"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"),
        sum(col("_s").cast("decimal(28,9)")).as("sum_s")))
  }

  /** [[ece]] from a PRE-AGGREGATED per-bin frame
    * `(bin, n, n_pos, sum_s)` — the entry point for incrementally
    * maintained calibration counts (two [[graft.ops.IncrementalAgg]]
    * state tables grouped by bin — label sums and DECIMAL(28,9) score
    * sums, both exactly mergeable — ARE this frame), so calibration
    * drift monitoring refreshes at O(increment) with the report
    * recomputed from the bins-sized state. */
  def eceFromCounts(counts: DataFrame): DataFrame = {
    val tot = broadcast(counts.agg(sum(col("n")).as("_N")))
    val term = ((col("n").cast(DoubleType) / col("_N")) *
      abs(col("n_pos").cast(DoubleType) / col("n") -
        col("sum_s").cast(DoubleType) / col("n")))
    // plain agg (no groupBy): empty/all-null input still yields the
    // documented ONE-row report (null cells) — the rocAuc convention
    counts.crossJoin(tot)
      .select(col("_N"), round(term, 9).cast("decimal(28,9)").as("_t"))
      .agg(max(col("_N")).as("n"),
        round(sum(col("_t")).cast(DoubleType), 6).as("ece"))
  }

  /** Per-group (group, score, label) projection with the same null /
    * binary-label discipline as [[scored]]; a null group is not a
    * slice (the [[rocAucBy]] convention). */
  private def scoredBy(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String): DataFrame = {
    val y = col(labelCol).cast("long")
    df.select(col(groupCol).as("_g"),
        col(scoreCol).cast(DoubleType).as("_s"), y.as("_y"))
      .filter(col("_s").isNotNull && col("_y").isNotNull &&
        col("_g").isNotNull)
      .select(col("_g"), col("_s"),
        when(col("_y").isin(0L, 1L), col("_y")).otherwise(raise_error(
          concat(lit(s"ModelEval: label '$labelCol' must be 0/1, got "),
            col("_y").cast("string")))).as("_y"))
  }

  /** Fixed-grid bin of a NON-NULL score column: clamp on the LONG
    * floor BEFORE narrowing (the psiDrift posture — a non-ANSI
    * long->int cast wraps, so a far-out-of-range score could
    * otherwise land in an interior bin). Public so ingest paths that
    * maintain per-bin state (incremental ECE) bin with the exact same
    * arithmetic. NOTE Spark's greatest/least SKIP nulls — guard null
    * scores before calling. */
  def binOf(score: Column, bins: Int, lo: Double, hi: Double): Column =
    least(lit((bins - 1).toLong), greatest(lit(0L),
      floor((score - lit(lo)) / lit((hi - lo) / bins))))
      .cast("int")

  private def gridBin(bins: Int, lo: Double, hi: Double): Column =
    binOf(col("_s"), bins, lo, hi).as("bin")

  /** Per-group [[ece]] — the slice audit of calibration drift. The
    * same Simpson's-reversal argument as [[rocAucBy]] applies to
    * calibration: a score calibrated on the pooled corpus can be
    * systematically over-confident inside one source, and a
    * pooled-calibrated threshold then gates that source wrong. One
    * row per group: `(groupCol, n, ece)`.
    *
    * Scale: ONE map-side-combinable groupBy(group, bin) touches the
    * rows; everything after runs on the groups × bins frame (per-group
    * totals via a window partitioned by group over that small frame —
    * no driver collect, no group-count cap). Term arithmetic is the
    * pooled [[ece]] posture exactly (round(…,9) per term, DECIMAL(28,9)
    * fold) so the per-group sums stay order-independent. */
  def eceBy(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins >= 2, "at least two bins")
    require(hi > lo, "hi must exceed lo")
    val counts = scoredBy(df, groupCol, labelCol, scoreCol)
      .select(col("_g").as(groupCol), gridBin(bins, lo, hi),
        col("_y"), col("_s"))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"),
        sum(col("_s").cast("decimal(28,9)")).as("sum_s"))
    eceByFromCounts(counts, groupCol)
  }

  /** [[eceBy]] from a pre-aggregated per-(group, bin) frame
    * `(groupCol, bin, n, n_pos, sum_s)` — the incremental-monitoring
    * entry point (two [[graft.ops.IncrementalAgg]] states keyed by
    * (group, bin) — label sums and DECIMAL(28,9) score sums — ARE
    * this frame), so per-source calibration drift refreshes at
    * O(increment) and the slice report is recomputed from the
    * groups × bins-sized state, never by rescanning the corpus.
    * Term arithmetic is byte-identical to [[eceBy]] (round(…,9) per
    * term, DECIMAL(28,9) fold, per-group totals via one window over
    * the small frame — no driver collect, no group cap). */
  def eceByFromCounts(countsIn: DataFrame, groupCol: String): DataFrame = {
    // defensive merge of duplicate (group, bin) rows — the
    // rocAucFromCounts posture (the ECE term is nonlinear in n, so
    // unmerged per-batch counts would silently skew the sum)
    val counts = countsIn.groupBy(groupCol, "bin")
      .agg(sum("n").as("n"), sum("n_pos").as("n_pos"),
        sum("sum_s").as("sum_s"))
    val nTot = sum(col("n")).over(Window.partitionBy(groupCol))
    val term = ((col("n").cast(DoubleType) / col("_N")) *
      abs(col("n_pos").cast(DoubleType) / col("n") -
        col("sum_s").cast(DoubleType) / col("n")))
    counts.withColumn("_N", nTot)
      .select(col(groupCol), col("_N"),
        round(term, 9).cast("decimal(28,9)").as("_t"))
      .groupBy(groupCol)
      .agg(max(col("_N")).as("n"),
        round(sum(col("_t")).cast(DoubleType), 6).as("ece"))
  }

  /** Per-group [[calibration]] (reliability) table: one row per
    * (group, bin) with empty bins kept visible per group via a
    * distinct-groups × range spine — so a slice with NO mass in a
    * score band shows up as n = 0 rather than silently missing, which
    * is exactly the signature of a source the calibrator never saw. */
  def calibrationBy(df: DataFrame, groupCol: String, labelCol: String,
      scoreCol: String, bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins >= 2, "at least two bins")
    require(hi > lo, "hi must exceed lo")
    // materialize the groups × bins frame ONCE: the spine's distinct
    // and the join probe would otherwise each re-run the corpus
    // aggregation (measured: 4 parquet scans instead of 2 — Spark's
    // ReuseExchange does not fire across the distinct branch)
    val counts = scoredBy(df, groupCol, labelCol, scoreCol)
      .select(col("_g").as(groupCol), gridBin(bins, lo, hi), col("_y"))
      .groupBy(groupCol, "bin")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"))
      .localCheckpoint()
    calibrationByFromCounts(counts, groupCol, bins)
  }

  /** [[calibrationBy]] from a pre-aggregated per-(group, bin) frame
    * `(groupCol, bin, n, n_pos)` — the incremental-monitoring entry
    * point (the label-sum [[graft.ops.IncrementalAgg]] state keyed by
    * (group, bin) IS this frame, and the SAME state that feeds
    * [[eceByFromCounts]]), so the per-source reliability table —
    * empty bins kept visible per group — refreshes at O(increment).
    * The caller's counts frame must already be metadata-sized
    * (groups × occupied bins); the spine distinct and probe join run
    * on it directly. */
  def calibrationByFromCounts(countsIn: DataFrame, groupCol: String,
      bins: Int): DataFrame = {
    require(bins >= 2, "at least two bins")
    // defensive merge of duplicate (group, bin) rows (rocAucFromCounts
    // posture) — unmerged rows would duplicate spine output rows
    val counts = countsIn.groupBy(groupCol, "bin")
      .agg(sum("n").as("n"), sum("n_pos").as("n_pos"))
    val spine = counts.select(groupCol).distinct()
      .crossJoin(broadcast(counts.sparkSession.range(0, bins)
        .select(col("id").cast("int").as("bin"))))
    spine.join(counts, Seq(groupCol, "bin"), "left")
      .na.fill(0L, Seq("n", "n_pos"))
      .select(col(groupCol), col("bin"), col("n"), col("n_pos"),
        when(col("n") > 0, col("n_pos").cast(DoubleType) / col("n"))
          .as("pos_rate"))
  }

  /** Isotonic (PAV) calibration over the fixed bin grid — the
    * standard post-hoc calibrator next to the reliability table: the
    * monotone-non-decreasing step function minimizing weighted squared
    * error to the per-bin positive rates. Computed NOT by the
    * sequential pool-adjacent-violators sweep but by its exact minimax
    * closed form (Barlow–Bartholomew–Bremner–Brunk 1972; Robertson–
    * Wright–Dykstra 1988, Thm 1.4.4):
    *   fit_k = max_{i ≤ k} min_{j ≥ k} (Σ_{i..j} n_pos) / (Σ_{i..j} n)
    * over the OBSERVED bins — which is order-free, distributable, and
    * SQL-replayable, so the operator is value-oracled like the rest of
    * the family instead of needing an iterative-algorithm waiver.
    * Every interval average is ONE IEEE division of two exact BIGINT
    * sums (bit-stable cross-engine); max/min over bit-identical
    * doubles are bit-identical.
    *
    * Output: one row per observed bin,
    * `(bin, n, n_pos, pos_rate, iso_rate)` with iso_rate monotone
    * non-decreasing in bin.
    *
    * Scale: the only row-sized stage is the map-side-combinable
    * groupBy(bin); everything after runs on the bins-sized frame
    * (prefix window, an i ≤ j interval self-join of ≤ bins² ≤ 2^20
    * rows, a suffix-min window, a max groupBy). `bins` is capped so
    * the quadratic interval frame stays metadata-sized. */
  def isotonicCalibration(df: DataFrame, labelCol: String,
      scoreCol: String, bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins >= 2 && bins <= 1024,
      "bins must be in [2, 1024] (the interval frame is bins²-sized)")
    require(hi > lo, "hi must exceed lo")
    val counts = scored(df, labelCol, scoreCol)
      .select(gridBin(bins, lo, hi), col("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"))
    isotonicCalibrationFromCounts(counts) // checkpoints internally
  }

  /** [[isotonicCalibration]] from a pre-aggregated per-bin frame
    * `(bin, n, n_pos)` — the incremental-recalibration entry point:
    * the SAME (bin)-keyed label-sum [[graft.ops.IncrementalAgg]]
    * state that feeds [[eceFromCounts]] refits the monotone
    * calibrator at O(increment), so the serving step function can be
    * refreshed per commit without rescanning the corpus (the
    * calibrate→apply loop at feed latency). The minimax closed form
    * is computed on the counts frame exactly as the full fit would —
    * the full recompute IS the incremental oracle. */
  def isotonicCalibrationFromCounts(countsIn: DataFrame): DataFrame = {
    // defensive merge of duplicate bin rows (rocAucFromCounts posture)
    // — a split bin would corrupt the prefix sums AND emit twice
    val counts = countsIn.groupBy("bin")
      .agg(sum("n").as("n"), sum("n_pos").as("n_pos"))
      .localCheckpoint() // feeds the prefix frame AND the final join
    // inclusive prefix sums over the observed bins — a ≤ bins-row
    // frame, so the global-order window is bounded by contract
    val wOrd = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = counts.select(col("bin"), col("n"), col("n_pos"),
      sum("n").over(wOrd).as("cn"), sum("n_pos").over(wOrd).as("cp"))
    val li = cum.select(col("bin").as("i"),
      (col("cn") - col("n")).as("cn0"), (col("cp") - col("n_pos")).as("cp0"))
    val rj = cum.select(col("bin").as("j"), col("cn").as("cnj"),
      col("cp").as("cpj"))
    val pairs = li.join(rj, col("i") <= col("j"))
      .select(col("i"), col("j"),
        ((col("cpj") - col("cp0")).cast(DoubleType) /
          (col("cnj") - col("cn0"))).as("a"))
    val wSuf = Window.partitionBy("i").orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fit = pairs
      .select(col("i"), col("j").as("bin"), min("a").over(wSuf).as("sm"))
      .groupBy("bin").agg(max("sm").as("iso_rate"))
    counts.join(fit, Seq("bin"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n")).as("pos_rate"),
        col("iso_rate"))
  }

  /** Apply an [[isotonicCalibration]] fit: map each row's score
    * through the fitted monotone step function, appending `outCol` —
    * the serving half of the calibrate→apply loop (threshold in
    * PROBABILITY space, not raw-score space, when gating a corpus).
    * The fit is first densified over the full grid (LOCF across
    * unobserved interior bins, first observed value extended to bins
    * below — the standard step-function extension), then applied as
    * one broadcast join on the bin: zero shuffles over the scored
    * rows. A null score yields a null `outCol`. */
  def applyIsotonic(df: DataFrame, fit: DataFrame, scoreCol: String,
      bins: Int, lo: Double, hi: Double,
      outCol: String = "calibrated"): DataFrame = {
    require(bins >= 2 && bins <= 1024, "bins must be in [2, 1024]")
    require(hi > lo, "hi must exceed lo")
    val wLocf = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // bins-sized frame: the global-order windows are bounded by the cap
    val dense = df.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
      .join(broadcast(fit.select("bin", "iso_rate")), Seq("bin"), "left")
      .select(col("bin"),
        coalesce(last("iso_rate", ignoreNulls = true).over(wLocf),
          first("iso_rate", ignoreNulls = true).over(wAll)).as(outCol))
    // guard BEFORE binning: Spark's greatest/least SKIP nulls, so an
    // unguarded gridBin would clamp a null score into bin 0 instead of
    // propagating the null (every other caller filters nulls first)
    df.withColumn("_s", col(scoreCol).cast(DoubleType))
      .withColumn("bin",
        when(col("_s").isNotNull, gridBin(bins, lo, hi)))
      .join(broadcast(dense), Seq("bin"), "left")
      .drop("bin", "_s")
  }

  /** Per-group [[isotonicCalibration]]: an independent PAV fit inside
    * every slice, via the same exact minimax closed form
    * (iso(k) = max_{i≤k} min_{j≥k} rate(i..j), Robertson–Wright–
    * Dykstra) with every window and the interval join partitioned by
    * the group — the calibration answer to the same Simpson's-
    * reversal argument as [[rocAucBy]]/[[eceBy]]: a pooled fit is
    * systematically wrong inside a source whose score distribution
    * the calibrator never saw (exactly the sources [[calibrationBy]]
    * surfaces with empty-bin rows). Output one row per observed
    * (group, bin): `(groupCol, bin, n, n_pos, pos_rate, iso_rate)`.
    *
    * Scale: ONE map-side-combinable groupBy(group, bin) touches the
    * rows; the interval frame is groups × bins² and every window
    * partitions by group (no global-order window at any group
    * count), so the fit is metadata-sized end to end. */
  def isotonicCalibrationBy(df: DataFrame, groupCol: String,
      labelCol: String, scoreCol: String, bins: Int, lo: Double,
      hi: Double): DataFrame = {
    require(bins >= 2 && bins <= 1024,
      "bins must be in [2, 1024] (the interval frame is bins²-sized)")
    require(hi > lo, "hi must exceed lo")
    isotonicCalibrationByFromCounts(
      scoredBy(df, groupCol, labelCol, scoreCol)
        .select(col("_g").as(groupCol), gridBin(bins, lo, hi), col("_y"))
        .groupBy(groupCol, "bin")
        .agg(count(lit(1)).as("n"), sum("_y").as("n_pos")),
      groupCol)
  }

  /** [[isotonicCalibrationBy]] from a pre-aggregated per-(group, bin)
    * frame `(groupCol, bin, n, n_pos)` — the incremental entry point:
    * the SAME (group, bin)-keyed label-sum state that feeds
    * [[eceByFromCounts]] and [[calibrationByFromCounts]] refits every
    * slice's monotone calibrator at O(increment), completing the
    * incremental slice-calibration matrix off ONE state. */
  def isotonicCalibrationByFromCounts(countsIn: DataFrame,
      groupCol: String): DataFrame = {
    val counts = countsIn
      .select(col(groupCol).as("_g"), col("bin"),
        col("n").cast("long").as("n"),
        col("n_pos").cast("long").as("n_pos"))
      // defensive merge of duplicate (group, bin) rows
      // (rocAucFromCounts posture) — a split bin would corrupt the
      // per-group prefix sums AND emit twice
      .groupBy("_g", "bin")
      .agg(sum("n").as("n"), sum("n_pos").as("n_pos"))
      .localCheckpoint() // feeds the prefix frame AND the final join
    val wOrd = Window.partitionBy("_g").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = counts.select(col("_g"), col("bin"), col("n"), col("n_pos"),
      sum("n").over(wOrd).as("cn"), sum("n_pos").over(wOrd).as("cp"))
    val li = cum.select(col("_g"), col("bin").as("i"),
      (col("cn") - col("n")).as("cn0"), (col("cp") - col("n_pos")).as("cp0"))
    val rj = cum.select(col("_g").as("_g2"), col("bin").as("j"),
      col("cn").as("cnj"), col("cp").as("cpj"))
    val pairs = li.join(rj, col("_g") === col("_g2") && col("i") <= col("j"))
      .select(col("_g"), col("i"), col("j"),
        ((col("cpj") - col("cp0")).cast(DoubleType) /
          (col("cnj") - col("cn0"))).as("a"))
    val wSuf = Window.partitionBy("_g", "i").orderBy(col("j").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val fit = pairs
      .select(col("_g"), col("i"), col("j").as("bin"),
        min("a").over(wSuf).as("sm"))
      .groupBy("_g", "bin").agg(max("sm").as("iso_rate"))
    counts.join(fit, Seq("_g", "bin"))
      .select(col("_g").as(groupCol), col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast(DoubleType) / col("n")).as("pos_rate"),
        col("iso_rate"))
  }

  /** Apply a per-group [[isotonicCalibrationBy]] fit: each row's
    * score maps through ITS group's fitted step function. The fit is
    * densified per group (groups × bins spine, LOCF within the group,
    * first observed value extended below — [[applyIsotonic]]'s
    * extension, partitioned by group) and applied as one broadcast
    * join on (group, bin): zero shuffles over the scored rows. Rows
    * with a null score, a null group, or a group the fit never saw
    * (every score null inside it) get a null `outCol` — the honest
    * answer, not a silent pooled fallback. */
  def applyIsotonicBy(df: DataFrame, fit: DataFrame, groupCol: String,
      scoreCol: String, bins: Int, lo: Double, hi: Double,
      outCol: String = "calibrated"): DataFrame = {
    require(bins >= 2 && bins <= 1024, "bins must be in [2, 1024]")
    require(hi > lo, "hi must exceed lo")
    val wLocf = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(groupCol).orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // groups × bins frame, windows partitioned by group — bounded by
    // the fit's own group count (a slice report, not a per-key fit)
    val dense = fit.select(col(groupCol)).distinct()
      .crossJoin(df.sparkSession.range(0, bins)
        .select(col("id").cast("int").as("bin")))
      .join(fit.select(groupCol, "bin", "iso_rate"),
        Seq(groupCol, "bin"), "left")
      .select(col(groupCol), col("bin"),
        coalesce(last("iso_rate", ignoreNulls = true).over(wLocf),
          first("iso_rate", ignoreNulls = true).over(wAll)).as(outCol))
    // null-score guard before binning (greatest/least skip nulls); a
    // null group joins nothing, so its outCol is null by the left join
    df.withColumn("_s", col(scoreCol).cast(DoubleType))
      .withColumn("bin",
        when(col("_s").isNotNull, gridBin(bins, lo, hi)))
      .join(broadcast(dense), Seq(groupCol, "bin"), "left")
      .drop("bin", "_s")
  }

  /** Calibration (reliability) table over `bins` equal-width score
    * bins on the caller-fixed [lo, hi): per-bin `(bin, n, n_pos,
    * pos_rate)` with out-of-range scores clamped to the edge bins and
    * empty bins kept visible (n = 0, pos_rate null) via a range spine
    * — a calibrated score has pos_rate tracking the bin midpoint. */
  def calibration(df: DataFrame, labelCol: String, scoreCol: String,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins >= 2, "at least two bins")
    require(hi > lo, "hi must exceed lo")
    val counts = scored(df, labelCol, scoreCol)
      .select(gridBin(bins, lo, hi), col("_y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("_y").as("n_pos"))
    df.sparkSession.range(0, bins)
      .select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("n", "n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        when(col("n") > 0, col("n_pos").cast(DoubleType) / col("n"))
          .as("pos_rate"))
  }
}
