package graft

import graft.ext.{Dedup, Domains, Packing}
import org.apache.spark.sql.functions._

/** Duplicated-span dedup (Lee et al. 2021 substring semantics),
  * global token-budget shard assignment, and domain-level curation —
  * hand-computed expectations on constructed corpora plus the
  * plan-shape guarantees the scale story rests on.
  */
class SpanPackDomainsSpec extends SparkSuite {
  import spark.implicits._

  // ———————————————————————————————————————— duplicated spans

  test("duplicatedSpans finds maximal cross-document spans exactly") {
    // doc 1 IS the 7-token run; doc 3 embeds it at token offset 3.
    val docs = Seq(
      (1L, "d1 d2 d3 d4 d5 d6 d7"),
      (3L, "p q r d1 d2 d3 d4 d5 d6 d7 s")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text",
      window = 3, minDf = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc1 windows 0..4 all shared; doc3 windows 3..7 shared.
    assert(got === Set((1L, 0L, 7L, 5L), (3L, 3L, 10L, 5L)))
  }

  test("duplicatedSpans counts self-repetition inside one document") {
    val docs = Seq((7L, "z z z z z z")).toDF("doc_id", "text")
    val got = Dedup.duplicatedSpans(docs, "doc_id", "text",
      window = 3, minDf = 2)
      .as[(Long, Long, Long, Long)].collect().toSet
    // "z z z" occurs at starts 0..3 (df=4): one maximal span.
    assert(got === Set((7L, 0L, 6L, 4L)))
  }

  test("duplicatedSpans hashed and text key modes agree on the corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val h = Dedup.duplicatedSpans(docs, "doc_id", "text",
      window = 15, minDf = 2, hashed = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    val t = Dedup.duplicatedSpans(docs, "doc_id", "text",
      window = 15, minDf = 2, hashed = false)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(h === t)
    assert(h.nonEmpty, "corpus should contain duplicated spans")
  }

  test("stripDuplicatedSpans keeps the canonical copy, strips the echo") {
    val docs = Seq(
      (1L, "d1 d2 d3 d4 d5 d6 d7"),
      (3L, "p q r d1 d2 d3 d4 d5 d6 d7 s")).toDF("doc_id", "text")
    val got = Dedup.stripDuplicatedSpans(docs, "doc_id", "text",
      window = 3, minDf = 2)
      .as[(Long, String, Long)].collect().toMap2
    // doc1 owns every duplicated window: untouched.
    assert(got(1L) === ("d1 d2 d3 d4 d5 d6 d7", 0L))
    // doc3: interior of the echoed run goes; tokens border-protected
    // by a kept (unique) window survive — documented semantics.
    assert(got(3L) === ("p q r d1 d2 d6 d7 s", 3L))
  }

  test("stripDuplicatedSpans collapses self-repetition to one window") {
    val docs = Seq((7L, "z z z z z z")).toDF("doc_id", "text")
    val got = Dedup.stripDuplicatedSpans(docs, "doc_id", "text",
      window = 3, minDf = 2)
      .as[(Long, String, Long)].collect().toMap2
    assert(got(7L) === ("z z z", 3L))
  }

  test("stripDuplicatedSpans leaves short and unique documents intact") {
    val docs = Seq(
      (1L, "only two"), // shorter than the window: no windows at all
      (2L, "an entirely unique sentence with no repeats anywhere")
    ).toDF("doc_id", "text")
    val got = Dedup.stripDuplicatedSpans(docs, "doc_id", "text",
      window = 3, minDf = 2)
      .as[(Long, String, Long)].collect().toMap2
    assert(got(1L) === ("only two", 0L))
    assert(got(2L) ===
      ("an entirely unique sentence with no repeats anywhere", 0L))
  }

  test("span window functions are document-partitioned, never global") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Dedup.duplicatedSpans(docs, "doc_id", "text",
      window = 15, minDf = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global (single-partition) stage in span plan:\n$plan")
  }

  // ———————————————————————————————————————— global shard layout

  test("assignShards computes the exact global running token sum") {
    val docs = (1L to 100L).map(i => (i, "t " * (i % 7 + 1).toInt))
      .toDF("id", "text")
    val got = Packing.assignShards(docs, "id",
      size(split(trim(col("text")), "\\s+")),
      budget = 10, orderKey = col("id"), buckets = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // oracle: sequential cumsum in id order
    var acc = 0L
    val want = (1L to 100L).map { i =>
      val n = i % 7 + 1
      val r = (i, n, acc, acc / 10); acc += n; r
    }
    assert(got.toSeq === want)
  }

  test("assignShards is bucket-count invariant (1 == 4 == 64)") {
    val docs = (1L to 200L).map(i => (i, ((i * 31) % 13 + 1).toInt))
      .toDF("id", "n")
    def run(b: Int) = Packing.assignShards(docs, "id", col("n"),
      budget = 50, orderKey = col("id"), buckets = b)
      .as[(Long, Long, Long, Long)].collect().toSet
    val base = run(1)
    assert(run(4) === base)
    assert(run(64) === base)
  }

  test("assignShards honors a hash order key as a deterministic shuffle") {
    val docs = (1L to 50L).map(i => (i, 3)).toDF("id", "n")
    val ord = graft.functions.PortableHash.h60("ep0", 1, col("id"))
    val a = Packing.assignShards(docs, "id", col("n"), budget = 30,
      orderKey = ord, buckets = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = Packing.assignShards(docs, "id", col("n"), budget = 30,
      orderKey = ord, buckets = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a === b, "same epoch seed must reproduce the same layout")
    // equal weights: tok_start values are exactly 0,3,6,... regardless
    // of which permutation the hash picked
    assert(a.map(_._3) === (0L until 50L).map(_ * 3).toSet)
  }

  test("assignShards plan has no single-partition global window") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Packing.assignShards(docs, "doc_id",
      size(split(trim(lower(col("text"))), "\\s+")),
      budget = 512,
      orderKey = graft.functions.PortableHash.h60("shard", 42,
        col("doc_id")),
      buckets = 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global window leaked into shard plan:\n$plan")
  }

  // ———————————————————————————————————————— domain curation

  private def corpus = Seq(
    // good.com: 4 docs, 6 tokens each, all distinct
    (1L, "good.com", "en", "alpha beta gamma delta epsilon zeta"),
    (2L, "good.com", "en", "one two three four five six"),
    (3L, "good.com", "fr", "un deux trois quatre cinq six"),
    (4L, "good.com", "en", "red orange yellow green blue violet"),
    // spam.com: 4 docs but only 2 tokens each (fails minAvgTokens 5)
    (5L, "spam.com", "en", "buy now"),
    (6L, "spam.com", "en", "click here"),
    (7L, "spam.com", "en", "free money"),
    (8L, "spam.com", "en", "act fast"),
    // dup.com: 4 long docs, all the same text (dup rate 0.75 > 0.5)
    (9L, "dup.com", "en", "same boilerplate text repeated every page x"),
    (10L, "dup.com", "en", "same boilerplate text repeated every page x"),
    (11L, "dup.com", "en", "same boilerplate text repeated every page x"),
    (12L, "dup.com", "en", "same boilerplate text repeated every page x"),
    // tiny.com: 2 docs (fails minDocs 3)
    (13L, "tiny.com", "en", "perfectly fine long document body here"),
    (14L, "tiny.com", "en", "another perfectly fine long document body"),
    // blocked.com: passes every stats gate, dies on the blocklist
    (15L, "blocked.com", "en", "statistically excellent but blocked a"),
    (16L, "blocked.com", "en", "statistically excellent but blocked b"),
    (17L, "blocked.com", "en", "statistically excellent but blocked c"),
    (18L, "blocked.com", "en", "statistically excellent but blocked d")
  ).toDF("doc_id", "domain", "lang", "text")

  test("Domains.profile computes exact per-domain counters") {
    val p = Domains.profile(corpus, "domain", "text", "lang")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(p("good.com") === ((4L, 24L, 4L, 2L)))
    assert(p("spam.com") === ((4L, 8L, 4L, 1L)))
    assert(p("dup.com") === ((4L, 28L, 1L, 1L)))
    assert(p("tiny.com") === ((2L, 12L, 2L, 1L)))
  }

  test("Domains.filterByStats applies every gate and the blocklist") {
    val kept = Domains.filterByStats(corpus, "domain", "text", "lang",
      minDocs = 3, minAvgTokens = 5.0, maxDupRate = 0.5,
      blocklist = Seq("blocked.com"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 2L, 3L, 4L))
  }

  test("Domains blocklist is a map-side filter, never a join") {
    // parquet-backed corpus: over a LocalRelation the optimizer folds
    // the literal filter into the relation itself, hiding the shape
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Domains.filterByStats(docs, "source", "text", "lang",
      minDocs = 0, minAvgTokens = 0.0, maxDupRate = 1.0,
      blocklist = Seq("src1", "src11"))
      .queryExecution.optimizedPlan.toString
    // exactly one join (the kept-domain semi); the blocklist shows up
    // as a literal predicate (NOT IN), not a second join
    assert(plan.split("Join", -1).length - 1 === 1,
      s"expected exactly one join:\n$plan")
    assert(plan.contains("NOT") && plan.contains("src1"),
      s"expected a literal blocklist filter:\n$plan")
  }

  test("Domains approx mode plans without the multi-distinct Expand") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val exactPlan = Domains.profile(docs, "source", "text", "lang")
      .queryExecution.executedPlan.toString
    val approxPlan = Domains.profile(docs, "source", "text", "lang",
      exact = false).queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"),
      "exact multi-distinct is expected to plan through Expand")
    assert(!approxPlan.contains("Expand"),
      s"approx profile must not Expand:\n$approxPlan")
    // gates far from the thresholds: approx verdict matches exact
    val e = Domains.filterByStats(corpus, "domain", "text", "lang",
      minDocs = 3, minAvgTokens = 5.0, maxDupRate = 0.5)
      .select("doc_id").as[Long].collect().toSet
    val a = Domains.filterByStats(corpus, "domain", "text", "lang",
      minDocs = 3, minAvgTokens = 5.0, maxDupRate = 0.5, exact = false)
      .select("doc_id").as[Long].collect().toSet
    assert(a === e)
  }

  test("stripDuplicatedSpans plans a single island pass (3 scans)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val plan = Dedup.stripDuplicatedSpans(docs, "doc_id", "text",
      window = 15, minDf = 2)
      .queryExecution.executedPlan.toString
    val scans = "Scan parquet".r.findAllIn(plan).size
    assert(scans <= 3,
      s"expected ≤3 source scans (keyed, own, docs), got $scans:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"global stage leaked into strip plan:\n$plan")
  }

  test("scoreBands: hand-computed quartile bands in one domain") {
    // scores 10,20,30,40,50,60,70,80 → type-7 quartiles at
    // pos p·7: q1=27.5, q2=45, q3=62.5
    val scored = (1 to 8).map(i => (i.toLong, "d", i * 10)).toDF(
      "id", "domain", "score")
    val got = Domains.scoreBands(scored, "domain", "score")
      .select("id", "band").as[(Long, Int)].collect().toMap
    assert(got === Map(1L -> 0, 2L -> 0, 3L -> 1, 4L -> 1,
      5L -> 2, 6L -> 2, 7L -> 3, 8L -> 3))
  }

  test("scoreBands bands NULL-domain rows instead of dropping them") {
    val scored = Seq((1L, Some("d"), 10), (2L, Some("d"), 20),
      (3L, None, 5), (4L, None, 50)).toDF("id", "domain", "score")
    val got = Domains.scoreBands(scored, "domain", "score",
      cuts = Seq(0.5))
      .select("id", "band").as[(Long, Int)].collect().toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L),
      "null-domain rows must survive the cut join")
    // within the null domain: median 27.5 → 5 below, 50 above
    assert(got(3L) === 0 && got(4L) === 1)
  }

  test("scoreBands: a single-doc domain lands in band 0") {
    val scored = Seq((1L, "solo", 42)).toDF("id", "domain", "score")
    val got = Domains.scoreBands(scored, "domain", "score")
      .select("band").as[Int].collect().toSeq
    assert(got === Seq(0))
  }

  test("scoreBands exact and high-accuracy approx agree on nearly all docs") {
    // approx_percentile returns MEMBER values (no interpolation), so a
    // cut that interpolates between two adjacent member values can
    // shift the boundary doc by one band — agreement is near-total,
    // not guaranteed-total; the gate below pins the operating envelope
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).as("ws_tokens"))
    def run(exact: Boolean) =
      Domains.scoreBands(docs, "source", "ws_tokens", exact = exact,
        accuracy = 100000)
        .select("doc_id", "band").as[(Long, Int)].collect().toMap
    val e = run(exact = true); val a = run(exact = false)
    assert(e.keySet === a.keySet)
    val agree = e.count { case (k, v) => a(k) == v }
    assert(agree.toDouble / e.size >= 0.9,
      s"approx bands diverged on ${e.size - agree} of ${e.size} docs")
  }

  test("rankBands: exact ntile quarters, null domains banded in place") {
    // 8 rows in domain d → exactly 2 per band; 2 null-domain rows
    // band within their own partition (ntile(4) of 2 rows → tiles 1,2)
    val scored = ((1 to 8).map(i => (i.toLong, Some("d"), i * 1.5)) ++
      Seq((9L, None, 1.0), (10L, None, 2.0)))
      .toDF("id", "domain", "score")
    val got = Domains.rankBands(scored, "domain", "score", "id")
      .select("id", "band").as[(Long, Int)].collect().toMap
    assert((1 to 8).map(i => got(i.toLong)) === Seq(0, 0, 1, 1, 2, 2, 3, 3))
    assert(got(9L) === 0 && got(10L) === 1,
      "null-domain rows must band within their own partition")
  }

  test("scoreBands quartiles split each domain roughly into quarters") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).as("ws_tokens"))
    val dist = Domains.scoreBands(docs, "source", "ws_tokens")
      .groupBy("band").count().as[(Int, Long)].collect().toMap
    val n = dist.values.sum.toDouble
    assert(dist.keySet === Set(0, 1, 2, 3))
    // integer score ties make bands uneven, but no band may collapse
    dist.values.foreach(c => assert(c / n > 0.05 && c / n < 0.6,
      s"degenerate band distribution: $dist"))
  }

  /** collect().toMap for 3-tuples keyed on _1. */
  implicit private class Tup3Ops[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
