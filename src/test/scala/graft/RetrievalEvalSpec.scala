package graft

import graft.ext.RetrievalEval
import org.apache.spark.sql.functions._

/** Retrieval eval: fixed-point MRR/DCG cells against hand-computed
  * values, perfect/absent/unjudged-query edges, and the full-outer
  * query grain.
  */
class RetrievalEvalSpec extends SparkSuite {
  import spark.implicits._

  private val S = 1000000000000000L

  test("weight tables: exact reciprocals, floor-log gains, prefix sums") {
    assert(RetrievalEval.mrrWeightsU(4) === Seq(S, S / 2, S / 3, S / 4))
    val wd = RetrievalEval.dcgWeightsU(4)
    assert(wd.head === S) // log2(2) = 1 exactly
    // gains strictly decrease; every gain positive
    assert(wd === wd.sorted(Ordering[Long].reverse) && wd.distinct == wd)
    assert(wd.forall(_ > 0))
    // rank-3 gain: floor(1e15 / log2(4)) = 1e15 / 2 exactly
    assert(wd(2) === S / 2)
    assert(RetrievalEval.idcgPrefixU(4) ===
      wd.scanLeft(0L)(_ + _).tail)
  }

  test("per-query metrics: hit/miss/perfect/unjudged, hand-checked cells") {
    val run = Seq(
      // q1: [10, 11, 12], only 11 relevant (rank 2)
      (1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3),
      // q2: retrieved but nothing judged relevant
      (2L, 20L, 1), (2L, 21L, 2),
      // q4: perfect two-of-two
      (4L, 40L, 1), (4L, 41L, 2)
    ).toDF("qid", "item", "rank")
    val qrels = Seq(
      (1L, 11L), (1L, 99L), // 99 never retrieved
      (3L, 30L),            // q3 judged but never ran
      (4L, 40L), (4L, 41L)
    ).toDF("qid", "item")
    val out = RetrievalEval.evaluate(run, "qid", "item", "rank",
      qrels, "qid", "item", k = 10)
      .orderBy("qid")
      .select("qid", "n_rel", "n_ret", "n_hit", "first_rel_rank",
        "mrr_u", "dcg_u", "idcg_u", "ndcg_r")
      .as[(Long, Long, Long, Long, Int, Long, Long, Long, Double)]
      .collect().toSeq
    val wd = RetrievalEval.dcgWeightsU(10)
    val wp = RetrievalEval.idcgPrefixU(10)
    assert(out.map(_._1) === Seq(1L, 2L, 3L, 4L))
    // q1: first relevant at rank 2 → mrr exactly S/2; dcg = gain(2);
    // idcg = prefix(2) (2 relevant, both inside the cutoff)
    assert(out(0) === ((1L, 2L, 3L, 1L, 2, S / 2, wd(1), wp(1),
      BigDecimal(wd(1).toDouble / wp(1).toDouble)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)))
    // q2: no relevant items at all → everything zero
    assert(out(1) === ((2L, 0L, 2L, 0L, 0, 0L, 0L, 0L, 0.0)))
    // q3: judged but zero retrieved → dcg 0 against a well-defined
    // positive ideal (one relevant item ⇒ idcg = gain(1)), ndcg 0
    assert(out(2) === ((3L, 1L, 0L, 0L, 0, 0L, 0L, wp(0), 0.0)))
    // q4: perfect ranking → ndcg exactly 1.0
    assert(out(3) === ((4L, 2L, 2L, 2L, 1, S, wp(1), wp(1), 1.0)))
  }

  test("rows past the cutoff are ignored; duplicate qrels collapse") {
    val run = Seq((1L, 10L, 1), (1L, 11L, 2), (1L, 12L, 3)).toDF("q", "i", "r")
    val qrels = Seq((1L, 12L), (1L, 12L)).toDF("q", "i")
    val out = RetrievalEval.evaluate(run, "q", "i", "r",
      qrels, "q", "i", k = 2)
      .select("n_rel", "n_ret", "n_hit", "first_rel_rank")
      .as[(Long, Long, Long, Int)].head()
    // rank-3 hit is outside k=2: counted in neither n_ret nor n_hit
    assert(out === ((1L, 2L, 0L, 0)))
  }
}
