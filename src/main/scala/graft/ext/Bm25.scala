package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** BM25 full-text retrieval (Robertson–Spärck Jones probabilistic
  * weighting, the Lucene-default variant) — the TERM-side sibling of
  * the ANN surfaces in [[Similarity]]: top-k documents per query by
  *
  *   score(q,d) = Σ_{t ∈ q∩d} ln(1 + (N−df+0.5)/(df+0.5))
  *                · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
  *
  * Shape at scale: an inverted-index equi-join — postings
  * `(term, doc, tf)` built with one tokenize-and-count pass, query
  * terms joined on `term` (the same skew-aware shape as the n-gram
  * Jaccard index; `maxDfFrac` drops degenerate stop-terms whose idf
  * is ≈0 anyway, bounding any term's posting fan-out), then one
  * (query, doc) aggregation and a per-query top-k window
  * (`row_number ≤ k` → partial window-group-limit before the
  * exchange). No crossJoin, no per-doc vocabulary materialization.
  *
  * Cross-engine float discipline: each per-term contribution is a
  * pure double expression (ln is the accepted ≤1-ulp class) CAST TO
  * DECIMAL(28,9) before summing — decimal addition is exact and
  * order-independent, so the (query, doc) score is reproducible on
  * any engine and any layout; ranking orders by the ROUNDED score
  * (6 dp) with doc-id tiebreak, making the emitted top-k set and
  * ranks deterministic cross-engine.
  */
object Bm25 {

  private def terms(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Top-k docs per query. `queries(qidCol, qtextCol)` is typically a
    * small frame (interactive queries / eval set); `docs` is the
    * corpus. Returns `(query_id, doc_id, score_r, rank)`.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, qtextCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75,
      maxDfFrac: Double = 0.5): DataFrame = {
    require(k > 0, "k must be positive")
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(terms(col(textCol))).as("term"))
    val postings = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val dfT = postings.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val qterms = queries.select(col(qidCol).as("query_id"),
      explode(array_distinct(terms(col(qtextCol)))).as("term"))
    val joined = qterms
      .join(dfT, Seq("term")) // vocabulary-sized side; AQE broadcasts
      .join(postings, Seq("term"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .filter(col("df") <= col("n_docs") * maxDfFrac)
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = log(lit(1.0) +
      (col("n_docs").cast("double") - col("df") + lit(0.5)) /
        (col("df") + lit(0.5)))
    val tfn = col("tf").cast("double") * (k1 + 1) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / avgdl))
    val contrib = (idf * tfn).cast("decimal(28,9)")
    val scored = joined
      .groupBy(col("query_id"), col("doc_id"))
      .agg(round(sum(contrib).cast("double"), 6).as("score_r"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_r").desc, col("doc_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
