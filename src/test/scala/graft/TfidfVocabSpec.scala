package graft

import graft.ext.TextStats
import org.apache.spark.sql.functions._

/** TF-IDF keyword extraction and vocabulary-coverage profile —
  * hand-computed expectations on a toy corpus plus structural
  * invariants on the test corpus.
  */
class TfidfVocabSpec extends SparkSuite {
  import spark.implicits._

  // doc1: apple×2 banana — doc2: banana cherry — doc3: cherry×3 date
  private def corpus = Seq(
    (1L, "apple banana apple"),
    (2L, "banana cherry"),
    (3L, "cherry cherry cherry date")).toDF("doc_id", "text")

  private def r6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("tfidfKeywords: hand-computed scores, ranks, and tiebreak") {
    val got = TextStats.tfidfKeywords(corpus, "doc_id", "text", topN = 2)
      .as[(Long, Int, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // N=3; df: apple 1, banana 2, cherry 2, date 1
    val ln3 = math.log(3.0); val ln15 = math.log(1.5)
    assert(got((1L, 1)) === (("apple", 2L, 1L, r6(2 * ln3))))
    assert(got((1L, 2)) === (("banana", 1L, 2L, r6(ln15))))
    // doc2: banana and cherry score EXACTLY equal (tf=1, df=2 both) —
    // the term tiebreak must order banana first, deterministically
    assert(got((2L, 1)) === (("banana", 1L, 2L, r6(ln15))))
    assert(got((2L, 2)) === (("cherry", 1L, 2L, r6(ln15))))
    assert(got((3L, 1)) === (("cherry", 3L, 2L, r6(3 * ln15))))
    assert(got((3L, 2)) === (("date", 1L, 1L, r6(ln3))))
    assert(got.size === 6)
  }

  test("vocabulary: counts, rank order, and cumulative shares") {
    // totals: cherry 4, apple 2, banana 2, date 1 (9 tokens)
    val got = TextStats.vocabulary(corpus, "text", topK = 3)
      .as[(Int, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1, "cherry", 4L, r6(4.0 / 9)),
      (2, "apple", 2L, r6(6.0 / 9)),
      (3, "banana", 2L, r6(8.0 / 9))))
  }

  test("vocabulary covers the whole corpus when topK >= vocab size") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val v = TextStats.vocabulary(docs, "text", topK = 10000)
      .orderBy(col("vocab_rank").desc)
    val last = v.select("cum_share").as[Double].head()
    assert(last === 1.0, "full-vocab cumulative share must close at 1.0")
  }

  test("tfidfKeywords on the corpus: bounded rank, df consistency") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val kw = TextStats.tfidfKeywords(docs, "doc_id", "text", topN = 3)
    assert(kw.groupBy("doc_id").count()
      .filter(col("count") > 3).isEmpty, "at most topN rows per doc")
    assert(kw.filter(col("kw_rank") < 1 || col("kw_rank") > 3).isEmpty)
    // a term's df must be consistent across every row it appears in
    assert(kw.groupBy("term")
      .agg(countDistinct("df_docs").as("n")).filter(col("n") > 1).isEmpty)
    // scores non-negative (df <= N ⇒ idf >= 0)
    assert(kw.filter(col("tfidf") < 0).isEmpty)
  }

  test("releasable variants free their pinned index blocks") {
    // start from a clean cache: an identical (doc, term) plan pinned
    // by an earlier test would otherwise share the cache entry and
    // make the size deltas vacuous
    spark.catalog.clearCache()
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val before = spark.sparkContext.getPersistentRDDs.size
    val (kw, release) = TextStats.tfidfKeywordsReleasable(
      docs, "doc_id", "text", topN = 2)
    assert(kw.count() > 0)
    assert(spark.sparkContext.getPersistentRDDs.size > before,
      "the (doc, term) aggregate must be pinned while in use")
    release()
    assert(spark.sparkContext.getPersistentRDDs.size === before,
      "release() must drop the pinned blocks")
    val (pairs, release2) = graft.ext.Dedup.winnowPairsReleasable(
      docs, "doc_id", "text")
    pairs.count()
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    release2()
    assert(spark.sparkContext.getPersistentRDDs.size === before)
  }
}
