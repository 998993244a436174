package graft

import graft.ext.Mmr

/** MMR rerank: diversity beats raw relevance on a constructed
  * near-duplicate, ties and short candidate lists behave, and the
  * greedy recurrence matches a hand-run of the definition.
  */
class MmrSpec extends SparkSuite {
  import spark.implicits._

  test("near-duplicate of the first pick loses to an orthogonal doc") {
    // a: best rel; b: near-copy of a, second-best rel; c: orthogonal,
    // weak rel. Top-2 by relevance ships (a, b); MMR at λ=0.5 charges
    // b for its ~1.0 similarity to a and picks c instead.
    val cands = Seq(
      (1L, 10L, 0.90, Array(1f, 0f)),
      (1L, 11L, 0.89, Array(0.9998f, 0.02f)),
      (1L, 12L, 0.50, Array(0f, 1f))
    ).toDF("q", "i", "rel", "v")
    val out = Mmr.rerank(cands, "q", "i", "rel", "v", k = 2, lambda = 0.5)
      .orderBy("mmr_rank").select("i", "mmr_rank")
      .as[(Long, Int)].collect().toSeq
    assert(out === Seq((10L, 1), (12L, 2)))
  }

  test("λ = 1 reduces to pure relevance order; ties break on item id") {
    val cands = Seq(
      (1L, 20L, 0.8, Array(1f, 0f)),
      (1L, 21L, 0.8, Array(0f, 1f)), // same rel: id tiebreak
      (1L, 22L, 0.9, Array(1f, 1f))
    ).toDF("q", "i", "rel", "v")
    val out = Mmr.rerank(cands, "q", "i", "rel", "v", k = 3, lambda = 1.0)
      .orderBy("mmr_rank").select("i").as[Long].collect().toSeq
    assert(out === Seq(22L, 20L, 21L))
  }

  test("a zero-norm candidate cannot hijack the argmax via NaN") {
    // the zero vector's cosine to anything is undefined (0/0): without
    // the guard its NaN MMR score outranks every real candidate (Spark
    // orders NaN above all doubles — even 0·NaN at λ=1 poisons). With
    // the guard its similarity is 0 and it competes on λ·rel honestly:
    // 51 at cos 0.5 to the pick scores 0.5·0.8 − 0.5·0.5 = 0.15 > the
    // zero vector's 0.5·0.1 = 0.05.
    val cands = Seq(
      (1L, 50L, 0.9, Array(1f, 0f)),
      (1L, 51L, 0.8, Array(0.5f, 0.866f)),
      (1L, 52L, 0.1, Array(0f, 0f)) // zero norm, weak relevance
    ).toDF("q", "i", "rel", "v")
    val out = Mmr.rerank(cands, "q", "i", "rel", "v", k = 2, lambda = 0.5)
      .orderBy("mmr_rank").select("i").as[Long].collect().toSeq
    assert(out === Seq(50L, 51L))
  }

  test("short candidate lists stop early; queries stay independent") {
    val cands = Seq(
      (1L, 30L, 0.9, Array(1f, 0f)), // q1 has a single candidate
      (2L, 40L, 0.9, Array(1f, 0f)),
      (2L, 41L, 0.5, Array(0f, 1f))
    ).toDF("q", "i", "rel", "v")
    val out = Mmr.rerank(cands, "q", "i", "rel", "v", k = 3, lambda = 0.7)
      .orderBy("q", "mmr_rank").select("q", "i", "mmr_rank")
      .as[(Long, Long, Int)].collect().toSeq
    assert(out === Seq((1L, 30L, 1), (2L, 40L, 1), (2L, 41L, 2)))
  }
}
