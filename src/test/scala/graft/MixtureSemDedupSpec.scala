package graft

import graft.ext.{Dedup, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Temperature-flattened mixture sampling (XLM-R/mT5 resampling rule)
  * and SemDeDup-style semantic dedup — hand-computed cut expectations,
  * determinism, and in-engine equivalence against the exact quadratic
  * baseline.
  */
class MixtureSemDedupSpec extends SparkSuite {
  import spark.implicits._

  // ———————————————————————————————————— temperature mixture

  private def mixCorpus = {
    // group sizes 1 / 4 / 16: exact powers of four make the α=0.5
    // cuts exact integers (1e6, 5e5, 2.5e5) with no rounding ambiguity
    val rows =
      Seq.tabulate(1)(i => (s"a$i", "small")) ++
      Seq.tabulate(4)(i => (s"b$i", "mid")) ++
      Seq.tabulate(16)(i => (s"c$i", "big"))
    rows.toDF("id", "grp")
  }

  test("temperatureCuts: α=0.5 cuts are exact √(n_min/n) integers") {
    val cuts = Sampling.temperatureCuts(mixCorpus, "grp", alpha = 0.5)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(cuts("small") === ((1L, 1000000L)))
    assert(cuts("mid") === ((4L, 500000L)))
    assert(cuts("big") === ((16L, 250000L)))
  }

  test("temperatureSample: α=1 keeps every row, cut 1e6 everywhere") {
    val got = Sampling.temperatureSample(mixCorpus, "grp", "id",
      alpha = 1.0)
    assert(got.count() === 21)
    assert(got.select("cut").distinct().as[Long].collect().toSeq
      === Seq(1000000L))
  }

  test("temperatureSample keeps the smallest group whole and is replayable") {
    val a = Sampling.temperatureSample(mixCorpus, "grp", "id",
      alpha = 0.5, seed = 3)
      .select("id").as[String].collect().toSet
    val b = Sampling.temperatureSample(mixCorpus, "grp", "id",
      alpha = 0.5, seed = 3)
      .select("id").as[String].collect().toSet
    assert(a === b, "same seed must reproduce the same kept set")
    assert(a.contains("a0"), "the n_min group has cut 1e6: always kept")
  }

  test("temperatureSample keeps NULL-group rows (null-safe cut join)") {
    val rows = Seq(("a0", Some("grp")), ("a1", Some("grp")),
      ("n0", None), ("n1", None), ("n2", None))
      .toDF("id", "grp")
    val got = Sampling.temperatureSample(rows, "grp", "id", alpha = 1.0)
    // α=1 keeps everything — INCLUDING the null-key group, which a
    // non-null-safe join would silently drop
    assert(got.count() === 5)
    assert(got.filter(col("grp").isNull).count() === 3)
  }

  test("temperatureSample flattens a skewed corpus toward the target shares") {
    // 10 vs 1000: α=0.5 keeps all 10 of the small group and ~√(10/1000)
    // = ~10% of the big one — expected kept ≈ 100, a 10:100 mix where
    // the raw corpus was 10:1000
    val rows = Seq.tabulate(10)(i => (s"s$i", "rare")) ++
      Seq.tabulate(1000)(i => (s"g$i", "common"))
    val kept = Sampling.temperatureSample(rows.toDF("id", "grp"),
      "grp", "id", alpha = 0.5, seed = 11)
      .groupBy("grp").count().as[(String, Long)].collect().toMap
    assert(kept("rare") === 10L)
    // md5 draws are uniform: binomial(1000, 0.1) stays within ±5σ ≈ ±47
    assert(kept("common") > 50 && kept("common") < 150,
      s"expected ~100 kept, got ${kept("common")}")
  }

  // ———————————————————————————————————— mix-building funnel

  test("mixturePipeline: output survives every stage, tokens account exactly") {
    import graft.ext.Domains
    import graft.queries.ExtQueries
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = ExtQueries.mixturePipeline(spark, sfDir)
      .as[(Long, Long, Long, Long)].collect()
    assert(out.nonEmpty, "funnel must not be vacuous on the spec corpus")
    val ids = out.map(_._1).toSet
    // stage 1: every output doc passed the domain gates
    val gated = Domains.filterByStats(docs, "source", "text", "lang",
      minDocs = 10, minAvgTokens = 53.0, maxDupRate = 0.5,
      blocklist = Seq("src1", "src11"))
      .select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(gated))
    // stage 2: no two output docs share a normalized text
    val texts = docs.filter(col("doc_id").isin(ids.toSeq: _*))
      .select(lower(trim(col("text")))).as[String].collect()
    assert(texts.distinct.length === texts.length,
      "exact dedup must leave one representative per normalized text")
    // stage 4: global token accounting — sorted by tok_start, each doc
    // starts exactly where the previous ended; shard = tok_start/512
    val byStart = out.sortBy(_._3)
    byStart.sliding(2).foreach {
      case Array((_, n, s, _), (_, _, s2, _)) => assert(s2 === s + n)
      case _ =>
    }
    assert(byStart.head._3 === 0L)
    out.foreach { case (_, _, s, sh) => assert(sh === s / 512) }
  }

  test("qualityMixture keeps the whole head band and thins the tail") {
    import graft.ext.{Domains, TextStats}
    import graft.queries.ExtQueries
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = ExtQueries.qualityMixture(spark, sfDir)
      .select("doc_id", "band").as[(Long, Int)].collect()
    assert(out.nonEmpty)
    // recompute the banded (pre-thinning) frame with the operators
    val scored = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val banded = Domains.rankBands(scored, "lang", "lm_score", "doc_id")
      .select("doc_id", "band").as[(Long, Int)].collect()
    val nBand = banded.groupBy(_._2).view.mapValues(_.length).toMap
    val oBand = out.groupBy(_._2).view.mapValues(_.length).toMap
    // band 3 rate is 1.0: every head doc survives
    assert(oBand.getOrElse(3, 0) === nBand(3))
    // tail rate 0.1: kept fraction must actually thin (binomial slack)
    assert(oBand.getOrElse(0, 0) < nBand(0) * 0.3,
      s"tail barely thinned: ${oBand.getOrElse(0, 0)} of ${nBand(0)}")
    // survivors are a subset of the banded frame with matching bands
    val bmap = banded.toMap
    out.foreach { case (id, b) => assert(bmap(id) === b) }
  }

  // ———————————————————————————————————— semantic dedup

  test("semanticDedup collapses transitive near-dup clusters to min id") {
    // two clusters {1,2} and {3,4} plus singleton 5, dim 4
    val emb = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.99f, 0.05f, 0f, 0f)),
      (3L, Array(0f, 1f, 0f, 0f)),
      (4L, Array(0f, 0.995f, 0.05f, 0f)),
      (5L, Array(0f, 0f, 0f, 1f))).toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.9, dim = 4)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === Set(
      (1L, 1L, true), (2L, 1L, false),
      (3L, 3L, true), (4L, 3L, false),
      (5L, 5L, true)))
  }

  test("semanticDedup matches the exact quadratic baseline on the corpus") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // tables=30: this 500-vector corpus's adaptive default (5 planes ×
    // 10 tables) misses two pairs barely over the threshold; the spec
    // pins a recall-1.0 operating point, which is also what the sf0.01
    // driver oracle holds the DEFAULT operating point to continuously
    // (sim_neardup_pairs value-matches brute force there)
    val got = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.35, tables = 30)
      .as[(Long, Long, Boolean)].collect().toSet
    // independent construction: exact all-pairs cosine → components →
    // min-id canonicals → singletons via left join
    val pairs = Similarity.exactCosinePairs(emb, "vec_id", "embedding",
      threshold = 0.35).select("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs)
    val want = emb.select(col("vec_id").as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("cluster"),
        (coalesce(col("comp"), col("id")) === col("id"))
          .as("is_canonical"))
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got === want)
    assert(got.exists(!_._3), "corpus should contain semantic dups")
  }

  test("semanticDedup emits exactly one canonical per cluster") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val v = Similarity.semanticDedup(emb, "vec_id", "embedding",
      threshold = 0.35)
    val perCluster = v.groupBy("cluster")
      .agg(sum(when(col("is_canonical"), 1).otherwise(0)).as("n_canon"))
      .select("n_canon").distinct().as[Long].collect().toSeq
    assert(perCluster === Seq(1L))
    assert(v.count() === emb.count(), "verdict covers the whole corpus")
  }
}
