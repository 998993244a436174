package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranked-retrieval evaluation: per-query recall / MRR / nDCG@k of a
  * run (ranked (query, item) lists — BM25, ANN, or the RRF fusion)
  * against binary qrels — the measurement half of the retrieval
  * family, the operator a corpus pipeline runs after every index or
  * fusion change (BEIR/MTEB-style evaluation at corpus scale).
  *
  * Cross-engine exactness, the fixed-point posture of
  * [[Hybrid.rrf]]: every rank-derived weight is a DRIVER-BAKED 64-bit
  * integer — MRR contributions are `10^15 div rank` (exact integer
  * division) and DCG gains are `⌊10^15 / log2(rank+1)⌋` computed ONCE
  * here and injected as literals into both the Spark plan and the SQL
  * oracle, so per-query sums are bit-identical across engines and
  * layouts; no libm call happens per row. The only double is the
  * final `ndcg_r = round(dcg_u / idcg_u, 9)` ratio of two exact
  * integers (both < 2^53, so the division itself is one IEEE op on
  * identical operands).
  *
  * Scale: the run is O(queries × k) rows and qrels are label-sized —
  * both dwarfed by the retriever that produced the run. One equi-join
  * on (query, item), one aggregation keyed on the query column, a
  * broadcast-literal weight lookup per row; never touches the corpus.
  */
object RetrievalEval {

  private val Scale = 1000000000000000L // 10^15, the RRF fixed point

  /** `10^15 div r` for r = 1..k — exact integer reciprocals (rank 0
    * of the array is rank 1).
    */
  def mrrWeightsU(k: Int): Seq[Long] = (1 to k).map(Scale / _)

  /** `⌊10^15 / log2(r+1)⌋` for r = 1..k — the binary-gain DCG weight
    * table, baked once on the driver so no per-row libm call and no
    * cross-engine ulp drift can perturb a sum.
    */
  def dcgWeightsU(k: Int): Seq[Long] =
    (1 to k).map(r => math.floor(Scale / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /** Prefix sums of [[dcgWeightsU]] — `idcg_u` for a query with n
    * relevant items is the (min(n, k))-th entry (ideal ranking puts
    * every relevant item first).
    */
  def idcgPrefixU(k: Int): Seq[Long] = dcgWeightsU(k).scanLeft(0L)(_ + _).tail

  /** Per-query metrics of `run` against `qrels`, at cutoff `k`.
    *
    * @param run   ranked results; `rankCol` is 1-based and dense per
    *              query (rows with rank > k are ignored)
    * @param qrels binary relevance labels (one row per relevant
    *              (query, item); duplicates collapse)
    * @return one row per query appearing in the run OR the qrels:
    *         (query, n_rel, n_ret, n_hit, first_rel_rank [0 = none],
    *         mrr_u, dcg_u, idcg_u, ndcg_r) — integer fixed-point
    *         except the final rounded ratio; a query with no
    *         relevant items reports idcg_u = 0 and ndcg_r = 0.0.
    */
  def evaluate(run: DataFrame, queryCol: String, itemCol: String,
      rankCol: String, qrels: DataFrame, qrelQueryCol: String,
      qrelItemCol: String, k: Int): DataFrame = {
    require(k >= 1 && k <= 1000, "cutoff k must be in [1, 1000]")
    val mrrW = mrrWeightsU(k)
    val dcgW = dcgWeightsU(k)
    val idcgP = idcgPrefixU(k)
    val qr = qrels
      .select(col(qrelQueryCol).as(queryCol), col(qrelItemCol).as(itemCol))
      .distinct()
    val relCounts = qr.groupBy(queryCol).agg(count(lit(1)).as("n_rel"))
    val topk = run.select(col(queryCol), col(itemCol),
        col(rankCol).cast("int").as("_rank"))
      .filter(col("_rank") >= 1 && col("_rank") <= k)
    val marked = topk.join(qr.withColumn("_rel", lit(1L)),
      Seq(queryCol, itemCol), "left")
    val perQuery = marked.groupBy(queryCol).agg(
      count(lit(1)).as("n_ret"),
      coalesce(sum(col("_rel")), lit(0L)).as("n_hit"),
      coalesce(min(when(col("_rel").isNotNull, col("_rank"))), lit(0))
        .as("first_rel_rank"),
      coalesce(sum(when(col("_rel").isNotNull,
        element_at(array(dcgW.map(lit): _*), col("_rank")))), lit(0L))
        .as("dcg_u"))
    // full outer on the query grain: a query with zero retrieved rows
    // (or zero qrels) still reports, with its absences visible
    perQuery.join(relCounts, Seq(queryCol), "full_outer")
      .na.fill(0L, Seq("n_ret", "n_hit", "first_rel_rank", "dcg_u", "n_rel"))
      .withColumn("mrr_u", when(col("first_rel_rank") >= 1,
        element_at(array(mrrW.map(lit): _*), col("first_rel_rank")))
        .otherwise(lit(0L)))
      .withColumn("idcg_u", when(col("n_rel") >= 1,
        element_at(array(idcgP.map(lit): _*),
          least(col("n_rel"), lit(k)).cast("int")))
        .otherwise(lit(0L)))
      .withColumn("ndcg_r", when(col("idcg_u") > 0,
        round(col("dcg_u").cast("double") / col("idcg_u").cast("double"), 9))
        .otherwise(lit(0.0)))
      .select(col(queryCol), col("n_rel"), col("n_ret"), col("n_hit"),
        col("first_rel_rank"), col("mrr_u"), col("dcg_u"), col("idcg_u"),
        col("ndcg_r"))
  }
}
