package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.DataFrame

/** Hybrid-retrieval fusion: combine ranked lists from INCOMMENSURABLE
  * scorers (BM25 log-weights, ANN cosines, recency boosts …) into one
  * ranking using only the RANKS — reciprocal-rank fusion (Cormack,
  * Clarke, Büttcher, "Reciprocal rank fusion outperforms Condorcet and
  * individual rank learning methods", SIGIR 2009). RRF is the standard
  * first fusion in hybrid lexical+vector search (it needs no score
  * normalization and no tuning beyond k₀), and it composes exactly the
  * two retrieval families this library already ships: [[Bm25.topK]]
  * and the [[Similarity]] ANN surfaces.
  *
  * Score: `Σ_lists 1/(k₀ + rank)` — here in FIXED-POINT integer form,
  * `Σ (10¹⁵ div (k₀ + rank))`, so the fused score is a pure function
  * of the input ranks: bit-identical across engines, layouts and list
  * order (the [[Graph.pageRankFixed]] determinism trick; truncation
  * perturbs each reciprocal by < 10⁻¹⁵, far below any rank-flip).
  *
  * Scale: each list arrives already top-k-per-query (the upstream
  * retrievers' partial window group-limit), so the fusion sees
  * O(queries × k × lists) rows — one union, one aggregation, one
  * per-query window on the same query key. Nothing here touches the
  * corpora.
  */
object Hybrid {

  /** 1 RRF unit = 10⁻¹⁵ of a reciprocal rank; 64 lists × rank 1 at
    * k₀ = 1 stays ≪ 2⁶³.
    */
  val RrfScale: Long = 1000000000000000L

  /** Fuse ranked lists, each `(query_id, item_id, rank)` with rank
    * 1-based. Returns `(query_id, item_id, rrf_score_u, n_lists,
    * rank)` — `rrf_score_u` the fixed-point fused score, `n_lists`
    * how many input lists carried the item (fusion-evidence count),
    * `rank` the fused 1-based position (score desc, item asc
    * tiebreak), cut at `topK`.
    */
  def rrf(lists: Seq[DataFrame], k0: Int = 60, topK: Int = 10): DataFrame = {
    require(lists.nonEmpty, "at least one ranked list")
    require(k0 >= 1, "k0 must be positive")
    require(topK >= 1, "topK must be positive")
    val contribs = lists.map(_.select(col("query_id"), col("item_id"),
      call_function("div", lit(RrfScale),
        lit(k0.toLong) + col("rank").cast(LongType)).as("c")))
      .reduce(_.unionByName(_))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score_u").desc, col("item_id").asc)
    contribs.groupBy("query_id", "item_id")
      .agg(sum(col("c")).as("rrf_score_u"), count(lit(1)).as("n_lists"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
