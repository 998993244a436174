package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Sequence packing for LM training: assign every document to a
  * (bucket, sequence) slot under a token budget — the
  * concat-then-chunk scheme (documents are laid end-to-end in a
  * deterministic order; a sequence boundary falls every `budget`
  * tokens; a document belongs to the sequence its FIRST token lands
  * in). This is the standard streaming packing used to build
  * fixed-length training batches; it wastes no tokens to bin-packing
  * fragmentation because documents may straddle boundaries.
  *
  * Determinism and scale:
  *   - the layout order is (bucket, id): bucket =
  *     [[graft.functions.PortableHash]] of the id mod `buckets`, so
  *     the assignment is a pure function of (id, seed, buckets,
  *     budget) — independent of cluster layout, replayable, and
  *     value-level verifiable cross-engine (the oracle recomputes the
  *     same window arithmetic);
  *   - one shuffle on the bucket key; within a bucket the running
  *     token sum is a codegen'd window cumsum. At 100 TB, size
  *     `buckets` ≈ a few × total cores so each bucket's sort fits an
  *     executor (buckets are equal-sized by hash construction — no
  *     skew);
  *   - a document longer than `budget` simply spans several chunk
  *     lengths; the next document starts in the chunk where the long
  *     one ended.
  */
object Packing {

  /** Per-document assignment `(id, bucket, seq_id, n_tokens)`:
    * `seq_id` = floor(prev_cumsum / budget) within the document's
    * bucket, prev_cumsum = tokens of all earlier docs in the bucket
    * (by id order).
    */
  def assignSequences(docs: DataFrame, idCol: String, tokenCol: Column,
      budget: Int, buckets: Int, seed: Long = 42L): DataFrame = {
    require(budget > 0 && buckets > 0, "budget and buckets must be positive")
    val b = pmod(graft.functions.PortableHash.h60("pack", seed, col(idCol)),
      lit(buckets.toLong)).cast("int")
    val w = Window.partitionBy(col("bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.select(col(idCol), tokenCol.cast("long").as("n_tokens"))
      .withColumn("bucket", b)
      .withColumn("_prev", sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("bucket"),
        floor(col("_prev") / lit(budget)).as("seq_id"), col("n_tokens"))
  }

  /** Convenience: token counts from whitespace tokenization of
    * `textCol` (the [[TextStats.tokenCounts]] `ws_tokens` measure).
    */
  def assignSequencesByText(docs: DataFrame, idCol: String,
      textCol: String, budget: Int, buckets: Int,
      seed: Long = 42L): DataFrame =
    assignSequences(docs, idCol,
      size(split(trim(lower(col(textCol))), "\\s+")), budget, buckets, seed)

  /** Fill report per packed sequence: `(bucket, seq_id, n_docs,
    * sum_tokens)` — the audit a pipeline runs to check budget
    * utilization (mean fill ≈ budget except each bucket's tail).
    */
  def packStats(assigned: DataFrame): DataFrame =
    assigned.groupBy("bucket", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))

  /** GLOBAL token-budget shard assignment — lay the corpus end-to-end
    * in ONE deterministic total order `(orderKey, id)` and cut a shard
    * boundary every `budget` tokens: `shard_id = floor(tok_start /
    * budget)` where `tok_start` is the global running token sum of
    * all earlier documents. This is the export layout for training
    * shards that must be equal-token AND order-faithful (length-
    * sorted batching, curriculum order, or — with a seeded
    * [[graft.functions.PortableHash]] order key — a deterministic
    * epoch shuffle), which [[assignSequences]]'s bucketed layout
    * deliberately does not give.
    *
    * A global running sum is the textbook global-Window anti-pattern
    * (one partition sorts the corpus), so this uses the two-phase
    * distributed prefix sum instead:
    *
    *   1. sample `buckets − 1` approximate quantile cuts of the
    *      (numeric) order key and BAKE them into the plan as
    *      literals: `bucket = #cuts below my key` is then a pure,
    *      re-computation-stable function of the row — no
    *      `spark_partition_id()` capture, no persist needed for
    *      determinism (sampled RangePartitioner boundaries would
    *      change on recompute; baked literals cannot);
    *   2. one tiny job collects per-bucket token totals (≤ `buckets`
    *      rows) and prefix-sums them on the driver;
    *   3. the final plan windows WITHIN each bucket (shuffle on the
    *      bucket key, per-bucket sort) and adds the bucket's literal
    *      offset — `tok_start` is exact and globally consistent
    *      because bucket assignment is monotone in the order key, so
    *      bucket-concatenated order IS the global order.
    *
    * Cuts being approximate skews only bucket BALANCE, never values.
    * Cost: two narrow passes over `(id, orderKey, weight)` (quantile
    * sample + totals) plus the windowed pass. At 100 TB size
    * `buckets` ≈ a few × total cores so each per-bucket sort fits an
    * executor; a hash order key (epoch shuffle) makes buckets
    * near-equal by construction.
    *
    * The order key must be numeric (quantile cuts) and should be
    * near-unique — ties share a bucket by construction (correct, but
    * a single massively-repeated key value concentrates its rows in
    * one bucket's sort). Output: `(id, n_tokens, tok_start,
    * shard_id)`.
    */
  def assignShards(docs: DataFrame, idCol: String, tokenCol: Column,
      budget: Long, orderKey: Column, buckets: Int = 64): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(buckets > 0 && buckets <= 4096,
      "buckets must be in [1, 4096] (per-bucket totals are collected)")
    val base = docs.select(col(idCol), orderKey.as("_ord"),
      tokenCol.cast("long").as("n_tokens"))
    // Phase 1: approximate quantile cuts, baked as literals. relativeError
    // 0.001 keeps the sample summary small; precision only moves bucket
    // boundaries. distinct+sorted guards degenerate key distributions.
    val cuts: Seq[Double] =
      if (buckets == 1) Nil
      else base.stat.approxQuantile("_ord",
        (1 until buckets).map(_.toDouble / buckets).toArray, 0.001)
        .toSeq.distinct.sorted
    val bucketOf: Column =
      if (cuts.isEmpty) lit(0)
      else aggregate(array(cuts.map(lit): _*), lit(0),
        (acc, c) => acc + when(col("_ord").cast("double") > c, 1)
          .otherwise(0))
    val withB = base.withColumn("_b", bucketOf)
    // Phase 2: per-bucket totals -> driver prefix sums (metadata-sized).
    val totals = withB.groupBy("_b").agg(sum("n_tokens").as("_t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets: Map[Int, Long] = {
      var acc = 0L
      (0 to cuts.length).map { b =>
        val o = b -> acc; acc += totals.getOrElse(b, 0L); o
      }.toMap
    }
    // Phase 3: within-bucket cumsum + literal offset = exact global sum.
    val w = Window.partitionBy(col("_b"))
      .orderBy(col("_ord"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB
      .withColumn("tok_start",
        element_at(typedLit(offsets), col("_b")) +
          sum(col("n_tokens")).over(w) - col("n_tokens"))
      .select(col(idCol), col("n_tokens"), col("tok_start"),
        floor(col("tok_start") / lit(budget)).cast("long").as("shard_id"))
  }

  /** Length-bucketed batching (padding-efficient batch layout): group
    * documents of similar token length into fixed-size batches so the
    * per-batch pad-to-max waste stays small — the standard
    * dynamic-padding / length-grouped sampler used when variable-length
    * sequences are batched without packing (HF `group_by_length`,
    * fairseq's length-bucketed iterators).
    *
    * Layout is a pure function of `(id, seed, boundaries, batchSize,
    * shards)` — deterministic, replayable, value-level verifiable
    * cross-engine:
    *   - `bucket` = number of `boundaries` ≤ the doc's token count (a
    *     chain of CASE sums — identical arithmetic in SQL);
    *   - `shard` = portable hash of the id mod `shards` — bounds the
    *     per-window sort AND breaks length-bucket skew (a corpus where
    *     90% of docs share one length bucket still sorts in
    *     shards-many independent windows);
    *   - within `(bucket, shard)`, docs order by id; `batch_id` =
    *     0-based rank / batchSize; `batch_max` (the padded length) and
    *     `pad_waste` come from a second window over the batch.
    *
    * One shuffle on `(bucket, shard)`; both windows share that
    * partitioning, so the second window is sort-only, no re-exchange.
    * At 100 TB size `shards` ≈ a few × total cores.
    */
  def lengthBatches(docs: DataFrame, idCol: String, tokenCol: Column,
      boundaries: Seq[Int], batchSize: Int, shards: Int,
      seed: Long = 42L): DataFrame = {
    require(boundaries.nonEmpty && boundaries == boundaries.sorted,
      "boundaries must be non-empty and ascending")
    require(batchSize > 0 && shards > 0, "batchSize and shards must be positive")
    val bucket = boundaries.foldLeft(lit(0))((acc, b) =>
      acc + when(col("n_tokens") >= b, 1).otherwise(0))
    val shard = pmod(graft.functions.PortableHash.h60("lenbatch", seed,
      col(idCol)), lit(shards.toLong)).cast("int")
    val wRank = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col(idCol))
    val base = docs
      .select(col(idCol), tokenCol.cast("long").as("n_tokens"))
      .withColumn("bucket", bucket).withColumn("shard", shard)
      .withColumn("batch_id",
        ((row_number().over(wRank) - lit(1)) / lit(batchSize))
          .cast("long"))
    val wBatch = Window.partitionBy(col("bucket"), col("shard"),
      col("batch_id"))
    base
      .withColumn("batch_max", max(col("n_tokens")).over(wBatch))
      .withColumn("pad_waste", col("batch_max") - col("n_tokens"))
  }

  /** Packing's dual — context-window CHUNKING of long documents:
    * one output row per (doc, chunk), chunk i covering whitespace
    * tokens `[i·step, min(i·step + window, n))` with `step = window −
    * overlap` (each chunk re-reads the previous chunk's last `overlap`
    * tokens — the standard sliding-window split used to fit documents
    * into a model's context length for training or embedding).
    *
    * Map-only: token array, chunk count, and slices are all computed
    * in the scan-side Project (one HOF pass per doc, like the shingle
    * formulation); the explode multiplies rows, never a shuffle. All
    * boundary arithmetic is INTEGER (no float ceil), so the output —
    * including the chunk text itself — is bit-reproducible and
    * value-level oracle-able cross-engine.
    *
    * Every token is covered (last chunk ends at n); a doc with ≤
    * window tokens yields exactly one chunk; token positions are
    * 0-based, `tok_end` exclusive.
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
      window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      "need 0 <= overlap < window")
    val step = window - overlap
    val t = split(trim(lower(col(textCol))), "\\s+")
    val n = size(col("w"))
    // integer ceil((n - window) / step) + 1 for n > window, else 1
    val nChunks = when(n <= window, lit(1))
      .otherwise(((n - window + step - 1) / step).cast("int") + 1)
    docs.select(col(idCol).as("doc_id"), t.as("w"))
      .select(col("doc_id"), col("w"),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        (col("chunk_id") * step).as("tok_start"),
        least(col("chunk_id") * step + window, size(col("w")))
          .as("tok_end"),
        concat_ws(" ", slice(col("w"), col("chunk_id") * step + 1,
          least(col("chunk_id") * step + window, size(col("w"))) -
            col("chunk_id") * step)).as("chunk_text"))
  }
}
