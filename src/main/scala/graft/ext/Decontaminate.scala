package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Benchmark decontamination for training corpora: flag (and drop)
  * documents that share a word n-gram with an evaluation/benchmark set,
  * so test data cannot leak into training data — the standard n-gram
  * overlap procedure (GPT-3 appendix C / PaLM-style 13-gram collision
  * check), expressed as a Spark plan.
  *
  * Shape at 100 TB:
  *   - the benchmark side is reduced ONCE to a distinct 8-byte n-gram
  *     hash set ([[benchmarkIndex]]) — benchmarks are MB-scale against
  *     a TB-scale corpus, so this index is tiny and persistable (write
  *     it out and reuse it across every training run);
  *   - the corpus side explodes its n-gram hashes (the codegen'd
  *     [[graft.functions.ShingleKernel]] — longs, never strings) and
  *     LEFT SEMI joins the index: Spark/AQE broadcasts the index when
  *     it fits (the common case — force with `broadcastIndex=true`),
  *     otherwise it degrades to a hash shuffle on the 8-byte gram key.
  *     Cost is one pass over the corpus either way; no corpus×bench
  *     pair formation anywhere;
  *   - [[removeContaminated]] is a LEFT ANTI join of the corpus against
  *     the flagged id set — the id set is O(contaminated docs), again
  *     broadcastable.
  *
  * A document with fewer than n tokens contributes its whole token
  * sequence as one gram (the [[graft.functions.ShingleKernel]]
  * convention) — a short doc exactly equal to a short benchmark doc
  * still collides.
  */
object Decontaminate {

  private def grams(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.shingleHashes(
        df.sparkSession, col(textCol), n)).as("g"))

  /** The distinct n-gram hash set of the benchmark corpus — the
    * reusable contamination index (single `g: Long` column).
    */
  def benchmarkIndex(bench: DataFrame, textCol: String,
      n: Int = 13): DataFrame =
    bench.select(explode(graft.functions.TextFunctions.shingleHashes(
      bench.sparkSession, col(textCol), n)).as("g")).distinct()

  /** Per-document contamination report against a prebuilt
    * [[benchmarkIndex]]: `(doc_id, n_hits)` for every document sharing
    * ≥ 1 distinct n-gram with the benchmark set (clean documents are
    * absent — at corpus scale the overwhelming majority). `n_hits` is
    * the count of DISTINCT overlapping grams (the kernel de-dups grams
    * per document), a useful severity signal for audit thresholds.
    */
  def flag(docs: DataFrame, idCol: String, textCol: String,
      index: DataFrame, n: Int = 13,
      broadcastIndex: Boolean = false): DataFrame = {
    val idx = if (broadcastIndex) broadcast(index) else index
    grams(docs, idCol, textCol, n)
      .join(idx, Seq("g"), "left_semi")
      .groupBy(col("id").as(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** The corpus minus every contaminated document — the training-side
    * output. One anti-join on the id column; the flagged set rides the
    * join as ids only.
    */
  def removeContaminated(docs: DataFrame, idCol: String, textCol: String,
      index: DataFrame, n: Int = 13,
      broadcastIndex: Boolean = false): DataFrame =
    docs.join(
      flag(docs, idCol, textCol, index, n, broadcastIndex)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
