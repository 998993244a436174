package graft

import graft.ext.Labels

/** Label aggregation: majority verdicts with deterministic ties and
  * collapse, pair-count agreement cells, and Fleiss' kappa against a
  * hand-computed rational value.
  */
class LabelsSpec extends SparkSuite {
  import spark.implicits._

  // items: 1 unanimous, 2 majority, 3 three-way tie, 4 single
  // annotator, 5 one annotator self-contradicting (collapses to min)
  private def df = Seq(
    (1L, 1, "a"), (1L, 2, "a"), (1L, 3, "a"),
    (2L, 1, "a"), (2L, 2, "a"), (2L, 3, "b"),
    (3L, 1, "a"), (3L, 2, "b"), (3L, 3, "c"),
    (4L, 1, "b"),
    (5L, 1, "b"), (5L, 1, "a"), (5L, 2, "b")
  ).toDF("item", "annot", "label")

  test("majority vote: winners, ties, pair counts, collapse") {
    val out = Labels.majorityVote(df, "item", "annot", "label")
      .orderBy("item")
      .select("item", "label", "votes", "n_annot", "agree_pairs",
        "total_pairs", "agreement_r")
      .as[(Long, String, Long, Long, Long, Long, Double)]
      .collect().toSeq
    assert(out(0) === ((1L, "a", 3L, 3L, 3L, 3L, 1.0)))
    assert(out(1) === ((2L, "a", 2L, 3L, 1L, 3L, 0.333333333)))
    // three-way tie: smallest label wins
    assert(out(2) === ((3L, "a", 1L, 3L, 0L, 3L, 0.0)))
    // single annotator: trivially agreed
    assert(out(3) === ((4L, "b", 1L, 1L, 0L, 0L, 1.0)))
    // annotator 1's (b, a) collapses to 'a' → 1-1 tie → 'a' wins
    assert(out(4) === ((5L, "a", 1L, 2L, 0L, 1L, 0.0)))
  }

  test("fleiss kappa: hand-computed rational; degenerate chance guard") {
    // eligible items (≥2 annotators): 1, 2, 3, 5.
    // po_i = 1, 1/3, 0, 0 → po = 1/3
    // marginals: a 3+2+1+1=7, b 1+1+1=3, c 1 → t=11
    // pe = (49+9+1)/121 = 59/121; kappa = (1/3 − 59/121)/(1 − 59/121)
    val (nItems, nLabels, t, po, pe, kappa) =
      Labels.fleissKappa(df, "item", "annot", "label")
        .as[(Long, Long, Long, Double, Double, Double)].head()
    assert((nItems, nLabels, t) === ((4L, 3L, 11L)))
    assert(math.abs(po - 1.0 / 3) < 1e-6)
    assert(math.abs(pe - 59.0 / 121) < 1e-6)
    val expected = (1.0 / 3 - 59.0 / 121) / (1 - 59.0 / 121)
    assert(math.abs(kappa - expected) < 1e-6)
    // unanimous single-label corpus: pe = 1 → defined kappa 0.0
    val mono = Seq((1L, 1, "x"), (1L, 2, "x"), (2L, 1, "x"), (2L, 2, "x"))
      .toDF("item", "annot", "label")
    val k0 = Labels.fleissKappa(mono, "item", "annot", "label")
      .select("kappa_r").as[Double].head()
    assert(k0 === 0.0)
  }
}
