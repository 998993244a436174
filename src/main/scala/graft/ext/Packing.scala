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
