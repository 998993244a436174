package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Multi-annotator label aggregation — the curation step between raw
  * judge/annotator output and a training label: per-item MAJORITY
  * VERDICT with deterministic tie-breaks, per-item observed pairwise
  * agreement, and corpus-level Fleiss' kappa (chance-corrected
  * agreement). The shape of RLHF preference aggregation, LLM-judge
  * ensembling, and crowd-label QC: many (item, annotator, label)
  * rows in, one trusted verdict + a reliability report out.
  *
  * Determinism discipline: an annotator who somehow labeled the same
  * item twice contributes their lexicographically SMALLEST label (a
  * defined collapse, not an error); the winning label breaks vote
  * ties lexicographically; agreement cells are integer pair counts.
  * Kappa's only doubles divide identical integers (< 2^53, one IEEE
  * op) and the per-item/per-label contributions are summed through
  * DECIMAL(28,9) — the BM25 posture — so the fold is
  * order-independent and cross-engine replayable.
  *
  * Scale: every stage is keyed on the item column (two aggregations +
  * one window = one partitioning reused); kappa folds label-sized and
  * item-sized frames to a 1-row report. Label data is annotation-
  * sized, never corpus-sized.
  */
object Labels {

  /** One row per (item, annotator): the annotator's collapsed label. */
  private def perAnnotator(df: DataFrame, itemCol: String,
      annotatorCol: String, labelCol: String): DataFrame =
    df.select(col(itemCol).as("item"), col(annotatorCol).as("annot"),
        col(labelCol).cast("string").as("label"))
      .filter(col("label").isNotNull)
      .groupBy("item", "annot").agg(min("label").as("label"))

  /** Per-item majority verdict + agreement: (item, label, votes,
    * n_annot, agree_pairs, total_pairs, agreement_r) — `label` is the
    * most-voted (smallest on ties), `agree_pairs` counts annotator
    * pairs that agree (Σ over labels of C(votes, 2)), `total_pairs` =
    * C(n_annot, 2), and `agreement_r` their rounded ratio (defined
    * 1.0 for a single-annotator item: nothing disagrees).
    */
  def majorityVote(df: DataFrame, itemCol: String, annotatorCol: String,
      labelCol: String): DataFrame = {
    val pa = perAnnotator(df, itemCol, annotatorCol, labelCol)
    val votes = pa.groupBy("item", "label").agg(count(lit(1)).as("votes"))
    val w = Window.partitionBy("item")
      .orderBy(col("votes").desc, col("label").asc)
    votes
      .withColumn("n_annot", sum(col("votes")).over(Window.partitionBy("item")))
      .withColumn("agree_pairs", sum(col("votes") * (col("votes") - 1) / 2)
        .over(Window.partitionBy("item")).cast("long"))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .withColumn("total_pairs",
        (col("n_annot") * (col("n_annot") - 1) / 2).cast("long"))
      .withColumn("agreement_r", when(col("total_pairs") > 0,
        round(col("agree_pairs").cast(DoubleType) /
          col("total_pairs").cast(DoubleType), 9)).otherwise(lit(1.0)))
      .select(col("item").as(itemCol), col("label"), col("votes"),
        col("n_annot"), col("agree_pairs"), col("total_pairs"),
        col("agreement_r"))
  }

  /** Corpus-level Fleiss' kappa over items with ≥ 2 annotators (pairs
    * are undefined below that): one row — (n_items, n_labels,
    * total_votes, po_r, pe_r, kappa_r). P̄_o is the mean per-item
    * pairwise agreement, P̄_e = Σ_j p_j² the chance agreement from the
    * label marginals, κ = (P̄_o − P̄_e) / (1 − P̄_e); κ_r is 0.0 when
    * every vote lands on one label (P̄_e = 1 — agreement
    * indistinguishable from chance).
    */
  def fleissKappa(df: DataFrame, itemCol: String, annotatorCol: String,
      labelCol: String): DataFrame = {
    val pa = perAnnotator(df, itemCol, annotatorCol, labelCol)
    val counts = pa.groupBy("item", "label").agg(count(lit(1)).as("v"))
    val items = counts.groupBy("item").agg(
        sum(col("v")).as("n"),
        sum(col("v") * (col("v") - 1)).as("a2"))
      .filter(col("n") >= 2)
      .select(col("item"), col("n"),
        // per-item agreement a2 / (n·(n−1)) through DECIMAL(28,9) so
        // the corpus mean is an order-independent decimal fold
        (col("a2").cast(DoubleType) /
          (col("n") * (col("n") - 1)).cast(DoubleType))
          .cast(DecimalType(28, 9)).as("po_i"))
    val eligible = counts.join(items.select("item"), Seq("item"), "left_semi")
    val marg = eligible.groupBy("label").agg(sum(col("v")).as("vj"))
    val totals = broadcast(marg.agg(sum(col("vj")).as("t"),
      count(lit(1)).as("n_labels")))
    val pe = marg.crossJoin(totals)
      .select(col("n_labels"), col("t"),
        ((col("vj").cast(DoubleType) / col("t").cast(DoubleType)) *
          (col("vj").cast(DoubleType) / col("t").cast(DoubleType)))
          .cast(DecimalType(28, 9)).as("pe_j"))
      .groupBy("n_labels", "t").agg(sum(col("pe_j")).as("pe"))
    // mean = exact decimal sum, then ONE double division (avg over
    // DECIMAL is engine-specific: DuckDB returns DOUBLE, Spark widens
    // the scale — the sum/divide split is replayable on both)
    val po = items.agg(count(lit(1)).as("n_items"),
      sum(col("po_i")).as("po_sum"))
    val poD = col("po_sum").cast(DoubleType) / col("n_items").cast(DoubleType)
    val peD = col("pe").cast(DoubleType)
    po.crossJoin(broadcast(pe))
      .select(col("n_items"), col("n_labels"),
        col("t").as("total_votes"),
        round(poD, 9).as("po_r"),
        round(peD, 9).as("pe_r"),
        when(peD < 1, round((poD - peD) / (lit(1.0) - peD), 9))
          .otherwise(lit(0.0)).as("kappa_r"))
  }
}
