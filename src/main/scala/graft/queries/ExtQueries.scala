package graft.queries

import graft.ext.{Dedup, EventWindows, Multimodal, Similarity, TextStats}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** LLM-data-pipeline extension queries (SURVEY.md §7 `ext/` layer):
  * dedup, similarity search, text analysis, multimodal, event-time
  * windows — each over the driver corpus, with DuckDB oracles where the
  * semantics are SQL-expressible (approximate families — LSH, SimHash —
  * get rows-only checks plus ScalaTest recall assertions against the
  * exact variants).
  */
object ExtQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  // ———————————————————————————————————————— dedup

  /** Exact dedup, SQL-oracle form: representative (min id) + dup count
    * per distinct normalized text. ([[Dedup.exact]] is the hash-keyed
    * scale variant of the same plan; asserted equivalent in tests.)
    */
  def dedupExact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy(lower(trim(col("text"))).as("norm_text"))
      .agg(min(col("doc_id")).as("representative_id"),
        count(lit(1)).as("n_dups"))
      .select("representative_id", "n_dups")
      .orderBy("representative_id")

  /** Exact word-3-gram Jaccard pairs ≥ 0.5 — inverted-index join, no
    * cross join; bit-exact against the SQL oracle.
    */
  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** MinHash+LSH near-dup candidates (approximate — rows-only check;
    * recall vs [[dedupNgramJaccard]] asserted in DedupSpec).
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
      k = 64, bands = 16, n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** SimHash hamming-≤3 near-dup pairs (approximate — rows-only). */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", maxDist = 3)
      .orderBy("id_a", "id_b")

  // ———————————————————————————————————————— similarity

  /** Brute-force cosine top-5 for query vectors vec_id < 20. Output is
    * rank-only (ids + rank): ranking is stable because cosine gaps in
    * this corpus are ≫ double rounding, and rank-only sidesteps
    * engine-specific float formatting.
    */
  def simCosineTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** Sign-LSH approximate top-5 (rows-only; recall vs brute force
    * asserted in SimilaritySpec).
    */
  def simLshTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.lshTopK(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** IVF (inverted-file) approximate top-5 (rows-only; recall vs brute
    * force asserted in ExtSpec).
    */
  def simIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** Embedding-cosine near-duplicate pairs via multi-table LSH buckets
    * (rows-only; recall vs exact pairs asserted in SimilaritySpec).
    */
  def simCosineNeardup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id",
      "embedding", threshold = 0.35)
      .select("id_a", "id_b")
      .orderBy("id_a", "id_b")

  /** Per-dimension embedding statistics by label (posexplode over the
    * vector column + grouped aggregates — the feature-statistics pass an
    * embedding pipeline runs before normalization). Rounded to 6
    * decimals for cross-engine float parity.
    */
  def simVectorDimStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .filter(col("dim") < 8)
      .groupBy("label", "dim")
      .agg(round(avg(col("v").cast("double")), 6).as("mean_v"),
        round(max(col("v").cast("double")), 6).as("max_v"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")

  // ———————————————————————————————————————— text analysis

  def textStats(s: SparkSession, dir: String): DataFrame =
    TextStats.stats(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  def textQuality(s: SparkSession, dir: String): DataFrame =
    TextStats.qualityScore(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  def textTokenCounts(s: SparkSession, dir: String): DataFrame =
    TextStats.tokenCounts(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Rolling-hash fingerprint (xxhash64-based — rows-only; dup-detection
    * property asserted in TextStatsSpec).
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextStats.fingerprint(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Heuristic language ID (rows-only; accuracy asserted in tests). */
  def textLangid(s: SparkSession, dir: String): DataFrame =
    TextStats.languageId(t(s, dir, "documents"), "doc_id", "text")
      .select("doc_id", "predicted_lang")
      .orderBy("doc_id")

  // ———————————————————————————————————————— multimodal

  /** Declarative multimodal metadata stats (SQL-oracle-able subset). */
  def multimodalStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Multimodal.fromDocuments(t(s, dir, "documents")))
      .select("doc_id", "media_type", "payload_bytes", "n_pixels")
      .orderBy("doc_id")

  /** Batched feature extraction through mapPartitions (decode stubbed —
    * rows-only; Spark-side plumbing is the thing under test).
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s,
      Multimodal.fromDocuments(t(s, dir, "documents")))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("payload_bytes"),
        element_at(col("features"), 1).as("f0"))
      .orderBy("doc_id")

  /** Frame sampling plumbing (every 2nd 64-byte frame; rows-only —
    * frame_bytes content asserted in ExtSpec).
    */
  def multimodalFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.fromDocuments(t(s, dir, "documents")),
      frameBytes = 64, stride = 2)
      .select(col("doc_id"), col("frame_idx"),
        length(col("frame_bytes")).as("frame_len"))
      .orderBy("doc_id", "frame_idx")

  /** Aspect-preserving resize metadata (oracled — pure arithmetic). */
  def multimodalResize(s: SparkSession, dir: String): DataFrame =
    Multimodal.resizeMeta(
      Multimodal.fromDocuments(t(s, dir, "documents")), maxSide = 512)
      .orderBy("doc_id")

  // ———————————————————————————————————————— event-time windows

  def eventsTumbling(s: SparkSession, dir: String): DataFrame =
    EventWindows.tumbling(CoreQueries.events(s, dir))
      .orderBy("window_start", "event_type")

  def eventsSliding(s: SparkSession, dir: String): DataFrame =
    EventWindows.sliding(CoreQueries.events(s, dir))
      .orderBy("window_start", "event_type")

  def eventsSessions(s: SparkSession, dir: String): DataFrame =
    EventWindows.sessions(CoreQueries.events(s, dir), "30 minutes")
      .orderBy("user_id", "session_start")
}
