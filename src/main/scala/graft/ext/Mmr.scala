package graft.ext

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Maximal-marginal-relevance diverse rerank (Carbonell & Goldstein,
  * SIGIR 1998): greedily select k of each query's candidates, each
  * pick maximizing `λ·rel − (1−λ)·max_{s∈selected} cos(item, s)` —
  * the diversity-aware selection between retrieval and consumption
  * (RAG context assembly, near-dup-free few-shot pools, diverse
  * hard-negative sets). Pure top-k relevance ships k near-copies of
  * the same best document; MMR charges every candidate for what the
  * selection already covers.
  *
  * Determinism: the first pick is argmax rel; ties break on the item
  * id everywhere. Scores stay RAW doubles — the ascending-index
  * cosine fold is the bit-stable construction every ranking oracle in
  * the similarity family orders by — and the output carries only
  * (query, item, mmr_rank): selection, not scores, is the contract
  * (the `sim_cosine_topk` rank-only posture).
  *
  * Scale: candidates arrive pre-cut to top-C per query by a retriever
  * (ANN/BM25), so every frame here is O(queries × C). The greedy loop
  * is k−1 rounds of [remaining ⋈ selected] per-query joins — all
  * keyed on the query column, selected side ≤ k rows per query —
  * with the union checkpointed each round so the plan stays
  * round-sized. Nothing ever touches the corpus.
  */
object Mmr {

  def rerank(cands: DataFrame, queryCol: String, itemCol: String,
      relCol: String, vecCol: String, k: Int,
      lambda: Double = 0.7): DataFrame = {
    require(k >= 1 && k <= 100, "k must be in [1, 100]")
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0, 1]")
    VectorFunctions.register(cands.sparkSession)
    val base = cands.select(col(queryCol).as("q"), col(itemCol).as("i"),
        col(relCol).cast(DoubleType).as("rel"), col(vecCol).as("v"))
      .localCheckpoint() // candidates may be an expensive retriever plan:
                         // materialize once, the loop re-reads blocks
    val w1 = Window.partitionBy("q").orderBy(col("rel").desc, col("i").asc)
    var sel = base.withColumn("_rn", row_number().over(w1))
      .filter(col("_rn") === 1)
      .select(col("q"), col("i"), col("v"), lit(1).as("mmr_rank"))
      .localCheckpoint()
    for (r <- 2 to k) {
      val rem = base.join(sel.select("q", "i"), Seq("q", "i"), "left_anti")
      val maxSim = rem.select(col("q"), col("i"), col("v"))
        .join(sel.select(col("q"), col("v").as("sv")), Seq("q"))
        // zero-norm guard: 0/0 = NaN would otherwise WIN every argmax
        // (Spark orders NaN above every double) — a degenerate vector's
        // similarity is conventionally 0
        .withColumn("_np", VectorFunctions.normF(col("v")) *
          VectorFunctions.normF(col("sv")))
        .withColumn("sim", when(col("_np") > 0.0,
          VectorFunctions.dotF(col("v"), col("sv")) / col("_np"))
          .otherwise(lit(0.0)))
        .groupBy("q", "i").agg(max(col("sim")).as("maxsim"))
      val wr = Window.partitionBy("q")
        .orderBy((lit(lambda) * col("rel") -
          lit(1.0 - lambda) * col("maxsim")).desc, col("i").asc)
      val pick = rem.join(maxSim, Seq("q", "i"))
        .withColumn("_rn", row_number().over(wr))
        .filter(col("_rn") === 1)
        .select(col("q"), col("i"), col("v"), lit(r).as("mmr_rank"))
      // checkpoint per round: k unions of lazy joins would otherwise
      // compound into a 2^k-shaped plan re-deriving every prior round
      sel = sel.unionByName(pick).localCheckpoint()
    }
    sel.select(col("q").as(queryCol), col("i").as(itemCol), col("mmr_rank"))
  }
}
