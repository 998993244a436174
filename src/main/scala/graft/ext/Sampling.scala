package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic sampling / splitting primitives for training-data
  * pipelines. Everything here is a pure function of the record id and a
  * seed — replayable across runs and cluster layouts (no RNG state, no
  * partition-order dependence), which is what makes a 100 TB pipeline's
  * train/val/test assignment reproducible and joinable.
  */
object Sampling {

  private val Buckets = 1000000

  /** Stable per-row bucket in [0, Buckets): seed FIRST in the hash
    * chain (Spark's XxHash64 folds left-to-right with the running hash
    * as seed — a trailing constant would be a no-op reshuffle of the
    * same hash).
    */
  private def bucket(idCol: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), idCol), lit(Buckets))

  /** Assign every row to exactly one named split by hashed-id ranges —
    * the train/val/test split primitive. `weights` need not sum to 1
    * (they are normalized); assignment is map-only (no shuffle), and a
    * row's split never changes as the corpus grows (it depends only on
    * the id and seed).
    */
  def hashSplit(df: DataFrame, idCol: String,
      weights: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0)(_ + _._2 / total).tail
      .map(f => math.round(f * Buckets))
    val b = bucket(col(idCol), seed)
    val expr = weights.zip(cuts).reverse.tail.foldLeft(
      lit(weights.last._1)) { case (acc, ((name, _), cut)) =>
      when(b < lit(cut), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Leakage-safe train/test split: a near-duplicate CLUSTER never
    * straddles splits. A plain per-doc [[hashSplit]] leaks — two
    * near-identical documents can land in train and test, and the test
    * metric silently measures memorization (the contamination problem
    * benchmark-decontamination papers flag for eval sets applies to
    * held-out splits too). Here every doc draws its split from its
    * duplicate-cluster representative (`clusters` as produced by
    * [[Dedup.connectedComponents]]: `(id, comp)`; docs absent from it
    * are singletons and use their own id) — the whole cluster moves as
    * one unit, by construction.
    *
    * Cost: one equi-join against the cluster map (pair-derived, orders
    * of magnitude smaller than the corpus — AQE broadcasts it when it
    * fits) plus the map-only draw. The draw is the portable md5-60
    * hash, so the assignment is value-level replayable cross-engine,
    * stable as the corpus grows (depends only on rep id and seed), and
    * deterministic across layouts.
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, clusters: DataFrame,
      weights: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    val total = weights.map(_._2).sum
    val cuts = weights.scanLeft(0.0)(_ + _._2 / total).tail
      .map(f => math.round(f * Buckets))
    // the cluster map's columns join under RESERVED names — a caller df
    // that already carries a `comp` column must neither make the
    // coalesce ambiguous nor lose its column to the cleanup drop
    val joined = df.join(
      clusters.select(col("id").as("__cid"), col("comp").as("__comp")),
      df(idCol) === col("__cid"), "left_outer")
    val key = coalesce(col("__comp"), df(idCol))
    val draw = pmod(graft.functions.PortableHash.h60("lsplit", seed, key),
      lit(Buckets.toLong))
    val expr = weights.zip(cuts).reverse.tail.foldLeft(
      lit(weights.last._1)) { case (acc, ((name, _), cut)) =>
      when(draw < lit(cut), lit(name)).otherwise(acc)
    }
    joined.withColumn("split_key", key).withColumn("split", expr)
      .drop("__cid", "__comp")
  }

  /** Exact-size stratified sample: from each stratum, the ⌈frac·n⌉ rows
    * with the smallest hashed ids (deterministic, unbiased w.r.t. any
    * column correlated with neither hash nor id). One shuffle on the
    * stratum key; per-stratum sizes are exact — the property the count
    * oracle checks — unlike `df.sampleBy`, whose Bernoulli draw only
    * hits the fraction in expectation.
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
      frac: Double, seed: Long = 42L): DataFrame = {
    require(frac > 0 && frac <= 1, "frac must be in (0, 1]")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(bucket(col(idCol), seed), col(idCol))
    val n = Window.partitionBy(col(strataCol))
    // the epsilon keeps ceil exact when n*frac lands on an integer that
    // IEEE rounds up past (100 * 0.07 = 7.000000000000001 → must be 7,
    // not 8); oracles should compute ceil the same double way or use
    // exact decimal fractions
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(n))
      .filter(col("_rn") <= ceil(col("_n") * lit(frac) - lit(1e-9)))
      .drop("_rn", "_n")
  }

  /** Per-group quota cap: keep at most `cap` rows from each group,
    * deterministically the first by `orderCol` — the "at most N docs
    * per domain" rule that stops a handful of giant sources from
    * dominating a training mix.
    *
    * One shuffle on the group key. The `row_number() <= cap` filter is
    * recognized by Spark's `InferWindowGroupLimit` rule, which inserts
    * a PARTIAL WindowGroupLimit before the exchange — each mapper
    * forwards only its own first `cap` rows per group, so a skewed
    * 10⁹-row group ships O(mappers × cap) rows, not the group.
    */
  def quotaPerGroup(df: DataFrame, groupCol: String, orderCol: String,
      cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= cap)
      .drop("_rn")
  }

  /** Deterministic per-group-rate Bernoulli sampling — the
    * quality/temperature reweighting step of a training mix ("keep
    * 100% of tier-0, 25% of tier-3, 5% of everything else"): a row
    * survives iff its [[graft.functions.PortableHash]] draw falls
    * under its group's rate. Map-only (the rate table compiles into a
    * literal CASE chain — no join), replayable (pure function of id
    * and seed), and value-level verifiable cross-engine (the oracle
    * recomputes the identical md5-60 arithmetic).
    */
  def sampleByRates(df: DataFrame, groupCol: String, idCol: String,
      rates: Seq[(Any, Double)], defaultRate: Double,
      seed: Long = 42L): DataFrame = {
    require((defaultRate +: rates.map(_._2)).forall(r => r >= 0 && r <= 1),
      "rates must be in [0, 1]")
    val draw = pmod(graft.functions.PortableHash.h60("rate", seed,
      col(idCol)), lit(Buckets.toLong))
    val cut = rates.foldLeft(lit(math.round(defaultRate * Buckets))) {
      case (acc, (k, r)) =>
        when(col(groupCol) === lit(k), lit(math.round(r * Buckets)))
          .otherwise(acc)
    }
    df.filter(draw < cut)
  }

  /** Epoch-based upsampling: replicate each row `w_g` times in
    * expectation, where `w_g` is its group's (possibly fractional)
    * repeat factor — the mixture-amplification step of pretraining
    * data recipes (LLaMA's per-source epoch counts, DoReMi domain
    * reweighting): a row emits `floor(w)` guaranteed copies plus one
    * more with probability `frac(w)`, decided by its portable-hash
    * draw. Output = input columns + `epoch` (0-based copy index), so
    * downstream packing/shuffling treats copies as distinct rows in a
    * replayable order.
    *
    * Exactness discipline: `floor(w)` and `round(frac(w)·10⁶)` are
    * computed HERE, driver-side, and baked as integer literals — the
    * per-row plan never touches fractional doubles, so any engine
    * (the DuckDB oracle included) reproduces the copy set exactly.
    * Map-only + explode: no shuffle, no join; output size is the only
    * cost (Σ w_g · n_g rows), which is the operator's purpose. A
    * weight of 0 drops the group (explode of an empty sequence).
    */
  def upsampleEpochs(df: DataFrame, groupCol: String, idCol: String,
      weights: Seq[(Any, Double)], defaultWeight: Double,
      seed: Long = 42L): DataFrame = {
    require((defaultWeight +: weights.map(_._2)).forall(_ >= 0),
      "weights must be non-negative")
    def baseOf(w: Double) = math.floor(w).toLong
    def cutOf(w: Double) = math.round((w - math.floor(w)) * Buckets)
    val base = weights.foldLeft(lit(baseOf(defaultWeight))) {
      case (acc, (k, w)) =>
        when(col(groupCol) === lit(k), lit(baseOf(w))).otherwise(acc)
    }
    val cut = weights.foldLeft(lit(cutOf(defaultWeight))) {
      case (acc, (k, w)) =>
        when(col(groupCol) === lit(k), lit(cutOf(w))).otherwise(acc)
    }
    val draw = pmod(graft.functions.PortableHash.h60("epoch", seed,
      col(idCol)), lit(Buckets.toLong))
    // filter BEFORE sequence: Spark's sequence(0, -1) counts DOWN
    // ([0, -1]), it is not empty — zero-epoch rows must not reach it
    df.withColumn("_ne", base + when(draw < cut, 1L).otherwise(0L))
      .filter(col("_ne") > 0L)
      .withColumn("epoch",
        explode(sequence(lit(0L), col("_ne") - lit(1L))))
      .drop("_ne")
  }

  /** Per-group integer draw cuts for temperature-flattened mixture
    * sampling (the multilingual-pretraining resampling rule of
    * XLM-R / mT5): target group shares `q_g ∝ p_g^α` with `α ∈ (0,1]`,
    * realized by pure DOWNSAMPLING with keep rate `r_g =
    * (n_min / n_g)^(1−α)` — the smallest group is kept whole, the
    * flattening never upsamples, and `α = 1` keeps everything.
    * Output `(groupCol, n_docs, cut)` with `cut = round(r_g · 10⁶)`,
    * the same integer draw space [[sampleByRates]] uses.
    *
    * Cross-engine exactness: division and `sqrt` are IEEE-correctly-
    * rounded, so `α = 0.5` (the common flattening) reproduces
    * bit-identical cuts on any engine; other `α` go through `pow`,
    * which Java only bounds to 1 ulp — a cut can differ by 1 in the
    * last integer digit across engines, moving a ~10⁻⁶ sliver of
    * draws. One shuffle to group cardinality plus a 1-row broadcast
    * scalar for `n_min`.
    */
  def temperatureCuts(df: DataFrame, groupCol: String,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    val counts = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_docs"))
    val minN = counts.agg(min("n_docs").as("_minN"))
    val ratio = col("_minN").cast("double") / col("n_docs").cast("double")
    val r =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, lit(1.0 - alpha))
    counts.crossJoin(broadcast(minN))
      .withColumn("cut", round(r * lit(Buckets)).cast("long"))
      .select(col(groupCol), col("n_docs"), col("cut"))
  }

  /** Temperature-flattened mixture sample: every row of `df` whose
    * md5-60 draw falls under its group's [[temperatureCuts]] cut,
    * with the `cut` column retained for auditability. Deterministic
    * (pure function of id, seed, and group counts) and replayable;
    * the cut table is group-cardinality, applied with one equi-join
    * (AQE broadcasts it when it fits — at web scale group counts are
    * thousands of times smaller than the corpus).
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String,
      alpha: Double, seed: Long = 42L): DataFrame = {
    // NULL-SAFE cut application: groupBy counts a NULL group like any
    // other, so the join back must match it too (`<=>`) — a plain
    // equi-join would silently drop every NULL-key row AFTER letting
    // that group's count drive n_min (the repo-wide null-safe-join
    // rule, same as Upsert key matching).
    val cuts = temperatureCuts(df, groupCol, alpha)
      .select(col(groupCol).as("_cut_grp"), col("cut"))
    val draw = pmod(graft.functions.PortableHash.h60("temp", seed,
      col(idCol)), lit(Buckets.toLong))
    df.join(cuts, col(groupCol) <=> col("_cut_grp"))
      .drop("_cut_grp")
      .filter(draw < col("cut"))
  }

  /** Deterministic seeded global shuffle into training shards — the
    * data-ordering step of a training pipeline (examples must reach
    * the trainer in a fixed pseudorandom order, reproducibly): every
    * row draws the portable 60-bit hash of (seed, id), its shard is
    * the draw mod `nShards`, and `pos` orders rows WITHIN the shard
    * by the draw (id tiebreak for duplicate-hash safety). Together
    * (shard, pos) is a replayable global permutation.
    *
    * Scale shape: NO global sort anywhere — shard assignment is
    * map-only, and the within-shard ordering is a window partitioned
    * by shard, so the permutation parallelizes across `nShards` tasks;
    * pick `nShards` so a shard's rows fit a task sort (the same knob a
    * trainer's shard reader wants anyway). Compare [[graft.ext.Packing
    * .assignShards]], which packs CONTIGUOUS token-budget shards via
    * prefix sums; this op is its order-randomizing complement.
    */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
      seed: Long = 42L): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val draw = graft.functions.PortableHash.h60("shuffle", seed, col(idCol))
    val w = Window.partitionBy("shard").orderBy(col("_draw"), col(idCol))
    df.withColumn("_draw", draw)
      .withColumn("shard", pmod(col("_draw"), lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w) - 1)
      .drop("_draw")
  }

  /** EXACTLY-n uniform sample without replacement, seeded — the
    * reservoir-sampling contract ("give me exactly 100k eval docs")
    * expressed as a deterministic top-n: every row gets the portable
    * md5-60 draw of (seed, id) and the n smallest draws win (id
    * tiebreak, so duplicate-free even under the 2^-60 draw collision).
    * Unlike [[hashSplit]]/[[sampleByRates]] (fixed RATE, binomial
    * count) the output size is exact; unlike `df.orderBy(rand())
    * .limit(n)` it is replayable and grow-stable in distribution
    * (each row's draw never changes; a grown corpus re-competes the
    * SAME draws, which is precisely uniform-without-replacement over
    * the new population).
    *
    * Scale shape: `orderBy(...).limit(n)` compiles to
    * TakeOrderedAndProject — per-partition top-n heaps then a driver
    * merge of n×partitions candidates, NO global sort. The plan gate
    * in the driver query pins that. Keep n driver-sized (it is a
    * SAMPLE — n ≫ 10⁷ wants [[hashSplit]] rates instead).
    */
  def sampleExactN(df: DataFrame, idCol: String, n: Int,
      seed: Long = 42L): DataFrame = {
    require(n > 0, "n must be positive")
    val draw = graft.functions.PortableHash.h60("exactn", seed, col(idCol))
    df.withColumn("draw", draw)
      .orderBy(col("draw").asc, col(idCol).asc)
      .limit(n)
  }

  /** k-fold cross-validation assignment: every row gets a stable fold
    * in [0, k) from its portable seeded draw — map-only, replayable,
    * grow-stable (a row's fold never changes as the corpus grows), and
    * value-level verifiable cross-engine. Train/eval split for fold f
    * is then `fold =!= f` / `fold === f`.
    */
  def kfold(df: DataFrame, idCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    require(k >= 2, "k must be at least 2")
    df.withColumn("fold",
      pmod(graft.functions.PortableHash.h60("kfold", seed, col(idCol)),
        lit(k.toLong)))
  }

  /** Weighted sampling WITHOUT replacement, exactly n rows
    * (Efraimidis–Spirakis 2006, exponential-jumps formulation): each
    * row draws `key = −ln(u)/w` from its seeded uniform `u ∈ (0,1]`
    * and the n SMALLEST keys win — provably equivalent to sequential
    * weighted draws without replacement (the A-ES reservoir scheme),
    * but expressed as a deterministic top-n: same
    * TakeOrderedAndProject shape as [[sampleExactN]] (per-partition
    * heaps + driver merge of n×partitions candidates, no global sort),
    * map-only otherwise. Rows with non-positive or null weight are
    * excluded.
    *
    * Cross-engine replay: `u` is the portable md5-60 draw scaled by
    * 2⁶⁰ (a power of two — exact), so the oracle recomputes the
    * identical key up to the ≤1-ulp `ln` libm difference; a selection
    * flip would need two keys within 1 ulp OF THE CUTOFF — the same
    * accepted risk class as the 6-decimal LM-score parity.
    */
  def sampleWeightedN(df: DataFrame, idCol: String, weightCol: String,
      n: Int, seed: Long = 42L): DataFrame = {
    require(n > 0, "n must be positive")
    val u = (graft.functions.PortableHash.h60("wsample", seed, col(idCol))
      .cast("double") + lit(1.0)) / lit(math.pow(2, 60))
    val key = -log(u) / col(weightCol).cast("double")
    df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("_wkey", key)
      .orderBy(col("_wkey").asc, col(idCol).asc)
      .limit(n)
      .drop("_wkey")
  }
}
