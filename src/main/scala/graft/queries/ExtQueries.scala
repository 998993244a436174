package graft.queries

import graft.ext.{Bmp, Bpe, Classifier, Decontaminate, Dedup, Domains, EventWindows, Expectations, Graph, Multimodal, Packing, Pii, Sampling, Similarity, TextStats, Wav}
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

  /** Fresh scratch dir for reliable connected-components checkpoints
    * (keeps the query surface free of BlockManager storage blocks —
    * no localCheckpoint leak survives a query's return). Local-FS temp
    * is right for this driver-contract/test surface; cluster callers
    * use the `Dedup` API directly and pass a durable `checkpointDir`.
    * The returned frame reads these files LAZILY, so the dir cannot be
    * deleted at query return — a JVM shutdown hook reclaims every
    * scratch dir this process created (bounded by invocation count;
    * abandoned dirs fall to normal /tmp hygiene).
    */
  private val ccScratchDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      scala.jdk.CollectionConverters.IteratorHasAsScala(
        ccScratchDirs.iterator()).asScala.foreach { p =>
        try {
          import scala.jdk.CollectionConverters._
          if (java.nio.file.Files.exists(p))
            java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverse
              .foreach(java.nio.file.Files.deleteIfExists(_))
        } catch { case _: Exception => () }
      }))
  }

  private def ccScratchDir(): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempDirectory("graft-cc-")
    ccScratchDirs.add(p)
    p
  }

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

  /** Asymmetric CONTAINMENT near-dup pairs ([[Dedup.containmentPairs]])
    * — catches sub-document duplication (a short doc quoted inside a
    * long one) that symmetric Jaccard under-scores. Fully value-oracled
    * like the Jaccard twin.
    */
  def dedupContainment(s: SparkSession, dir: String): DataFrame =
    Dedup.containmentPairs(t(s, dir, "documents"), "doc_id", "text",
      n = 3, threshold = 0.6)
      .orderBy("id_a", "id_b")

  /** Duplicate-cluster resolution: connected components over the exact
    * Jaccard pair set (A~B, B~C ⇒ one {A,B,C} cluster labeled by its
    * min member), verified against a DuckDB recursive-CTE reachability
    * oracle. The pruning step a training pipeline runs on top is
    * [[Dedup.pruneDuplicates]].
    */
  /** Keep-best-per-cluster dedup ([[Dedup.pruneDuplicatesByScore]]):
    * near-dup clusters from the exact Jaccard pairs, each keeping its
    * LONGEST member (`n_chars`, id tiebreak) — quality-aware
    * canonical selection, not min-id. Oracle: recursive reachability +
    * per-component ranking.
    */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Dedup.pruneDuplicatesByScore(docs,
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5),
      "doc_id", col("n_chars"),
      checkpointDir = Some(ccScratchDir().toString))
      .select("doc_id", "n_chars")
      .orderBy("doc_id")
  }

  /** Leakage-safe split over the near-dup clusters of the 3-gram
    * Jaccard graph (θ=0.5): every doc's split is drawn from its
    * cluster representative, so no near-dup pair straddles train/test.
    * Fully value-oracled: the oracle recomputes the clusters
    * (recursive reachability) and replays the identical md5-60 draw.
    */
  def sampleLeakageSafe(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val clusters = Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5),
      checkpointDir = Some(ccScratchDir().toString))
    Sampling.leakageSafeSplit(docs.select("doc_id"), "doc_id", clusters,
      Seq("train" -> 0.8, "test" -> 0.2))
      .select("doc_id", "split_key", "split")
      .orderBy("doc_id")
  }

  def dedupClusters(s: SparkSession, dir: String): DataFrame =
    // reliable checkpoints when the DISTRIBUTED star loop runs (the
    // returned frame then reads from checkpoint files, zero storage
    // blocks); at test scale the metadata-sized edge set takes the
    // driver union-find fast path and never touches the dir
    Dedup.connectedComponents(
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        n = 3, threshold = 0.5),
      checkpointDir = Some(ccScratchDir().toString))
      .select(col("id").as("doc_id"), col("comp").as("cluster_rep"))
      .orderBy("doc_id")

  // ——— verification gates (VERDICT r1 #2): every approximate family
  // emits ONE deterministic row — the exact reference is recomputed
  // INSIDE the query, recall/precision are compared against fixed
  // thresholds chosen with a wide margin below the measured values
  // (the algorithms are seeded ⇒ the booleans are deterministic at a
  // given corpus), and the DuckDB oracle independently recomputes the
  // exact side's size and states the expected invariant outcome. The
  // raw candidate outputs stay available (and benched) as `*_pairs` /
  // `*_raw` entries.

  /** Single-row recall/precision gate over candidate-pair sets. The
    * four counts are EAGERLY computed (each a driver-sized scalar, by
    * design) inside try/finally so the materialized sides — the exact
    * side can be the most expensive lineage in the query, e.g. the
    * quadratic cosine baseline — are unpersisted before the gate
    * returns: no storage blocks survive the call, and the returned
    * frame is a self-contained literal row.
    */
  private def pairGate(family: String, exact: DataFrame, approx: DataFrame,
      keys: Seq[String], recallMin: Double, maxFpFrac: Double): DataFrame = {
    val spark = exact.sparkSession
    import spark.implicits._
    // persist (not localCheckpoint): the SQL cache is the one
    // materialization Dataset.unpersist actually releases
    val e = exact.select(keys.map(col): _*).distinct().persist()
    val a = approx.select(keys.map(col): _*).distinct().persist()
    try {
      val nExact = e.count()
      val nCaught = e.join(a, keys, "left_semi").count()
      val nFp = a.join(e, keys, "left_anti").count()
      val nApprox = a.count()
      Seq((family, nExact,
        nCaught.toDouble >= nExact.toDouble * recallMin,
        nFp.toDouble <= nApprox.toDouble * maxFpFrac))
        .toDF("family", "n_exact", "recall_pass", "precision_pass")
    } finally {
      e.unpersist(blocking = false)
      a.unpersist(blocking = false)
    }
  }

  /** Recall-only gate for top-k families (a top-k list has no false
    * positives, only misses). Same eager-scalar + unpersist discipline
    * as [[pairGate]].
    */
  private def topkGate(family: String, exact: DataFrame, approx: DataFrame,
      keys: Seq[String], recallMin: Double): DataFrame = {
    val spark = exact.sparkSession
    import spark.implicits._
    val e = exact.select(keys.map(col): _*).distinct().persist()
    val a = approx.select(keys.map(col): _*).distinct().persist()
    try {
      val nExact = e.count()
      val nCaught = e.join(a, keys, "left_semi").count()
      Seq((family, nExact, nCaught.toDouble >= nExact.toDouble * recallMin))
        .toDF("family", "n_exact", "recall_pass")
    } finally {
      e.unpersist(blocking = false)
      a.unpersist(blocking = false)
    }
  }

  /** MinHash+LSH gate: recall ≥ 0.7 vs exact 3-gram Jaccard (measured
    * 1.0 at sf0.01) and zero false positives — BY CONSTRUCTION:
    * [[Dedup.minhashLsh]] verifies every band-collision candidate
    * against the true n-gram Jaccard (same shingle space and `maxDf`
    * cap as the exact side), so its output is a subset of the exact
    * pair set.
    */
  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    pairGate("minhash_lsh",
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5),
      Dedup.minhashLsh(docs, "doc_id", "text",
        k = 64, bands = 16, n = 3, threshold = 0.5),
      Seq("id_a", "id_b"), recallMin = 0.7, maxFpFrac = 0.0)
  }

  /** Raw MinHash+LSH verified pairs (bench surface of the gated family
    * above) — `(id_a, id_b, jaccard)` with TRUE Jaccard values, which
    * is what lets this surface carry the full exact-pair DuckDB oracle:
    * at sf0.01 banding recall is 1.0 (measured, seed-deterministic), so
    * verified-candidates == the exact ≥ 0.5 pair set, value for value.
    */
  def dedupMinhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(t(s, dir, "documents"), "doc_id", "text",
      k = 64, bands = 16, n = 3, threshold = 0.5)
      .orderBy("id_a", "id_b")

  /** Incremental near-dup — the per-ingest-batch shape: docs ≥ 400 are
    * the "new batch", the rest the existing corpus whose persisted band
    * store is probed (never re-shingled corpus-wide). True-Jaccard
    * verified like the full variant, so the exact pair recomputation
    * restricted to batch-touching pairs is the value-level oracle
    * (banding recall 1.0 at sf0.01, seed-deterministic).
    */
  def dedupMinhashIncremental(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    // the "new batch" is the top 20% of doc ids at ANY scale factor
    // (cutoff mirrored by integer arithmetic in the DuckDB oracle:
    // sf0.01 → 400 of 0..499); a fixed cutoff would degenerate to
    // batch≈corpus at larger SFs and stop measuring the incremental
    // shape
    val maxId = docs.agg(max(col("doc_id"))).head().getLong(0)
    val cutoff = (maxId + 1L) * 4L / 5L
    val corpus = docs.filter(col("doc_id") < cutoff)
    val fresh = docs.filter(col("doc_id") >= cutoff)
    // the band store is PERSISTED state in a real ingest pipeline —
    // materialize it once (parquet scratch) so the probe measures the
    // incremental shape (store scan + batch banding), not a corpus
    // re-banding per candidate evaluation
    val store = s"${ccScratchDir()}/bands"
    Dedup.minhashBands(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(store)
    Dedup.minhashLshIncremental(fresh, corpus, s.read.parquet(store),
      "doc_id", "text", threshold = 0.5)
      .orderBy("id_a", "id_b")
  }

  /** SimHash gate vs exact 3-gram Jaccard: hamming-≤3 on a
    * [[Dedup.SimhashBits]]-bit SimHash is a coarser similarity than
    * Jaccard ≥ 0.5, so the thresholds are looser — recall ≥ 0.4
    * (measured 0.52 at sf0.01 with the md5-based 60-bit hash), false
    * positives ≤ 30% of candidates (measured 0%).
    */
  def dedupSimhash(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    pairGate("simhash",
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.5),
      Dedup.simhashPairs(docs, "doc_id", "text", maxDist = 3),
      Seq("id_a", "id_b"), recallMin = 0.4, maxFpFrac = 0.3)
  }

  /** Raw SimHash hamming-≤3 pairs (bench surface) — fully oracled: the
    * md5-based token hash is replicated digit-for-digit in DuckDB SQL
    * and the pigeonhole banding emits the EXACT hamming-ball pair set,
    * so a brute-force DuckDB recomputation matches value for value.
    */
  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame =
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

  /** Hard-negative mining ([[Similarity.hardNegatives]]): for each of
    * the 20 anchor vectors, the 5 most-similar corpus vectors BELOW
    * cosine 0.5 — the contrastive-training negatives that carry
    * gradient without being false negatives. Exact band + rank; the
    * oracle replays the cosine band and per-anchor ordering in DuckDB
    * (`list_cosine_similarity` — both engines fold the dot ascending).
    */
  def simHardNegatives(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.hardNegatives(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", k = 5, maxCos = 0.5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** Sign-LSH top-5 gate: recall@5 ≥ 0.8 vs brute force over the 20
    * query vectors (measured 0.95 at sf0.01).
    */
  def simLshTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("lsh_topk",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.lshTopK(q, emb, "vec_id", "embedding", k = 5),
      Seq("query_id", "neighbor_id"), recallMin = 0.8)
  }

  /** Per-row exactness invariant for the ANN raw surfaces: re-derives
    * every emitted cosine from the base embeddings through an
    * INDEPENDENT join (the same codegen'd kernel, fresh lineage) and
    * fails the whole query loudly on any deviation. The row SET of an
    * approximate index is not SQL-expressible (it depends on seeded
    * hyperplanes / trained centroids), which is why these surfaces are
    * formally waived from the DuckDB oracle ([[SparkEntry
    * .rowsOnlyWaivers]]) — but each row's VALUE is exact and this
    * check enforces that on every run EXCEPT inside Bench's timed
    * loop (`graft.bench.timing`): the verification joins rescan the
    * embeddings corpus twice, a cost the historical bench artifacts
    * never paid — leaving it on would make the "raw index probe"
    * timing incomparable across rounds and mask real probe
    * regressions behind fixed check cost. Verify — the correctness
    * gate — always runs it. The invariant joins broadcast the
    * k×|queries|-row result, never the corpus.
    */
  private def requireExactCosines(emb: DataFrame, raw: DataFrame): DataFrame = {
    if (sys.props.get("graft.bench.timing").contains("true"))
      return raw.select("query_id", "neighbor_id", "rank")
    val qv = emb.select(col("vec_id").as("query_id"),
      col("embedding").as("_qv"))
    val nv = emb.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("_nv"))
    val joined = qv.join(broadcast(raw), Seq("query_id"))
    nv.join(broadcast(joined), Seq("neighbor_id"))
      .withColumn("_exact", Similarity.cosine(col("_qv"), col("_nv")))
      .filter(when(abs(col("cos") - col("_exact")) <= lit(1e-6), lit(true))
        .otherwise(raise_error(format_string(
          "ANN raw surface emitted a non-exact cosine for (%s, %s): %s != %s",
          col("query_id"), col("neighbor_id"), col("cos"), col("_exact")))))
      .select("query_id", "neighbor_id", "rank")
  }

  /** Raw sign-LSH top-5 (bench surface; invariant-checked — see
    * [[requireExactCosines]]).
    */
  def simLshTopkRaw(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    requireExactCosines(emb,
      Similarity.lshTopK(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", k = 5))
      .orderBy("query_id", "rank")
  }

  /** IVF top-5 gate: 2 Lloyd training iterations + nprobe 6/16 lift
    * recall@5 to a gateable level (untrained nprobe=4 measured 0.42).
    */
  def simIvfTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("ivf_topk",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.ivfTopK(q, emb, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 6, trainIters = 2),
      Seq("query_id", "neighbor_id"), recallMin = 0.6)
  }

  /** Incremental index maintenance gate: the IVF index is built on
    * 90% of the corpus, the held-out 10% is [[Similarity.ivfAppend]]ed
    * without retraining, and the appended index must still hit
    * recall@5 ≥ 0.6 against brute force over the FULL corpus — i.e.
    * appended vectors are genuinely retrievable through the stale
    * centroids (FAISS's add-after-train contract).
    */
  def simIvfAppend(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val base = emb.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val batch = emb.filter(pmod(col("vec_id"), lit(10)) === 0)
    val (asg, cents) = Similarity.ivfBuild(base, "vec_id", "embedding",
      nlist = 16, trainIters = 2)
    val appended = Similarity.ivfAppend(asg, cents, batch,
      "vec_id", "embedding")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("ivf_append",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.ivfTopKWithIndex(q, appended, cents,
        "vec_id", "embedding", k = 5, nprobe = 6),
      Seq("query_id", "neighbor_id"), recallMin = 0.6)
  }

  /** Approximate kNN graph over ALL embeddings (k=5): recall gate vs
    * the brute-force kNN graph. Candidates are LSH-bucket-restricted,
    * so the gate measures what the multi-probe table layout actually
    * buys on this corpus (measured 0.98 at sf0.01; gate 0.6 —
    * worst-case-random vectors, seed-deterministic).
    */
  def simKnnGraph(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // The graph builds over ALL nodes (the operator under test); the
    // exact side is sampled to 100 nodes so the gate's quadratic
    // verification baseline doesn't dominate the measurement — the
    // same queries-restricted shape as the other ANN gates.
    topkGate("knn_graph",
      Similarity.bruteForceTopK(emb.filter(col("vec_id") < 100), emb,
        "vec_id", "embedding", k = 5),
      Similarity.knnGraph(emb, "vec_id", "embedding", k = 5)
        .filter(col("src") < 100)
        .select(col("src").as("query_id"), col("dst").as("neighbor_id")),
      Seq("query_id", "neighbor_id"), recallMin = 0.6)
  }

  /** Raw IVF top-5 (bench surface; same tuned parameters as the gate;
    * invariant-checked — see [[requireExactCosines]]).
    */
  def simIvfTopkRaw(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    requireExactCosines(emb,
      Similarity.ivfTopK(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", k = 5, nlist = 16, nprobe = 6, trainIters = 2))
      .orderBy("query_id", "rank")
  }

  /** IVF×SQ8 composed gate (FAISS `IVF,SQ8` shape): recall@5 ≥ 0.6 vs
    * brute force — bounded by the IVF probe exactly like `sim_ivf_topk`
    * (the quantized shard holds every vector; the 4× oversampled
    * int8 coarse cut plus exact rerank does not measurably cost recall
    * at this scale).
    */
  def simIvfQ8Topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("ivf_q8_topk",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.ivfQ8TopK(q, emb, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 6, trainIters = 2),
      Seq("query_id", "neighbor_id"), recallMin = 0.6)
  }

  /** int8-quantized retrieve-and-rerank gate: recall@5 ≥ 0.9 vs brute
    * force (measured 1.0 at sf0.01 — the 4× oversampled coarse stage
    * has to mis-rank a true neighbor past rank 20 to lose it, far
    * beyond SQ8's ~0.4% dot-product rounding error at dim 64).
    */
  def simQ8Topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("q8_topk",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.q8TopK(q, emb, "vec_id", "embedding", k = 5),
      Seq("query_id", "neighbor_id"), recallMin = 0.9)
  }

  /** Raw quantized top-5 (bench surface). Value-level oracled by the
    * SAME exact top-k SQL as `sim_cosine_topk`: the rerank stage scores
    * survivors with the exact cosine, and at sf0.01 coarse recall is
    * 1.0 (seed-free and deterministic), so output == exact top-5, rank
    * for rank.
    */
  def simQ8TopkRaw(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    Similarity.q8TopK(emb.filter(col("vec_id") < 20), emb,
      "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank")
      .orderBy("query_id", "rank")
  }

  /** PQ (product-quantization) retrieve-and-rerank gate: recall@5 ≥
    * 0.7 vs brute force at the m=8 × ksub=64 × 8-oversample operating
    * point (measured 0.85 at sf0.01 via `tools/PqProbe` — the driver's
    * random synthetic embeddings are PQ's WORST case, no cluster
    * structure for the codebooks to exploit; real embedding corpora
    * sit well above). The codes are 32× narrower than float32.
    */
  def simPqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("pq_topk",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.pqTopK(q, emb, "vec_id", "embedding", k = 5,
        m = 8, ksub = 64, trainIters = 2, oversample = 8),
      Seq("query_id", "neighbor_id"), recallMin = 0.7)
  }

  /** Raw PQ top-5 (bench surface; same operating point as the gate;
    * invariant-checked — see [[requireExactCosines]]).
    */
  def simPqTopkRaw(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    requireExactCosines(emb,
      Similarity.pqTopK(emb.filter(col("vec_id") < 20), emb,
        "vec_id", "embedding", k = 5, m = 8, ksub = 64, trainIters = 2,
        oversample = 8))
      .orderBy("query_id", "rank")
  }

  /** IVF-PQ composed gate (FAISS `IVF,PQ` — the standard billion-scale
    * index shape): recall@5 ≥ 0.5 vs brute force. Recall is bounded by
    * the IVF probe (~0.7 at 16/6 on this corpus) and the DIRECT
    * (non-residual) encoding gives a little more back than IVF×SQ8
    * does (measured 0.66 at sf0.01, `tools/PqProbe`); the exact-cosine
    * rerank keeps every emitted value exact.
    */
  def simIvfPqTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("ivf_pq_topk",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", k = 5,
        nlist = 16, nprobe = 6, m = 8, ksub = 64, trainIters = 2,
        oversample = 8),
      Seq("query_id", "neighbor_id"), recallMin = 0.5)
  }

  /** Embedding near-dup gate: recall ≥ 0.7 vs the exact quadratic
    * cosine pair set (measured 1.0 at sf0.01 with the 5-plane ×
    * 10-table defaults) and zero false positives (the LSH variant
    * scores candidates with the true cosine). The 0.35 threshold sits
    * 2.9e-5 away from the nearest corpus pair while the cross-engine
    * cosine deviation is ≤ 2.4e-7, so the exact count is engine-stable.
    */
  def simCosineNeardup(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    pairGate("cosine_neardup",
      Similarity.exactCosinePairs(emb, "vec_id", "embedding", threshold = 0.35),
      Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
        threshold = 0.35),
      Seq("id_a", "id_b"), recallMin = 0.7, maxFpFrac = 0.0)
  }

  /** Raw LSH-bucketed near-dup pairs (bench surface). */
  def simNeardupPairs(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupPairs(t(s, dir, "embeddings"), "vec_id",
      "embedding", threshold = 0.35)
      .select("id_a", "id_b")
      .orderBy("id_a", "id_b")

  /** SemDeDup verdict over the embedding corpus: near-dup components
    * (cosine ≥ 0.35 — the operating point the sf0.01 driver oracle
    * holds to recall 1.0 continuously; recall is corpus-dependent, not
    * a property of the threshold — see MixtureSemDedupSpec, where the
    * 500-vector corpus needs `tables=30`) collapsed to min-id
    * canonicals; singleton docs are their own cluster. Full verdict
    * value-oracled against brute-force pairs + recursive reachability.
    */
  def simSemdedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id",
      "embedding", threshold = 0.35)
      .orderBy("id")

  /** Per-dimension embedding statistics by label (posexplode over the
    * vector column + grouped aggregates — the feature-statistics pass an
    * embedding pipeline runs before normalization). Rounded to 6
    * decimals for cross-engine float parity.
    */
  /** Seeded JL random projection ([[Similarity.randomProject]]) as a
    * driver query: the 64-d float embeddings shrink to 16 dims via the
    * Achlioptas ±1/0 matrix drawn from the md5-60 portable hash.
    * Emitted EXPLODED — (vec_id, k, val rounded to 6) — so the oracle
    * compares scalars; DuckDB rebuilds the identical matrix from the
    * same hash arithmetic and refolds the same ascending-j double sum.
    */
  def simRproj(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    // posexplode_OUTER: plain posexplode makes Spark guard the
    // Generate with a `size(proj)>0 AND isnotnull(proj)` filter that
    // re-evaluates the whole mat-vec a second time; proj is never
    // null/empty by construction, so outer is row-identical and keeps
    // the kernel single-shot in the plan.
    Similarity.randomProject(emb, "embedding", dim = 64, k = 16)
      .select(col("vec_id"), posexplode_outer(col("proj")).as(Seq("k", "val")))
      .withColumn("val", round(col("val"), 6))
      .orderBy("vec_id", "k")
  }

  /** Cluster-balanced sampling: at most 12 vectors kept per sign-bit
    * cluster of the seeded 4-d JL projection (16 SimHash-style
    * direction cones — few enough that the per-cone cap BINDS at the
    * test scales, so the lottery's drop path is exercised, not just
    * the pass-through). Everything — the projection matrix, the sign
    * folds, the per-cluster lottery ranks — is a pure portable-hash
    * function of the data, so the DuckDB oracle recomputes EVERY kept
    * row; no k-means/raw-centroid waiver.
    */
  def simClusterBalanced(s: SparkSession, dir: String): DataFrame = {
    val out = Similarity.clusterBalancedSample(t(s, dir, "embeddings"),
      "vec_id", "embedding", dim = 64, cap = 12, bits = 4)
    // plan gate: projection + sign fold are map-side; the only data
    // shuffle is the per-cluster rank window — no join, no k-means
    val plan = out.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    require(nEx == 1 && !plan.contains("Join"),
      s"clusterBalancedSample must shuffle once on the cluster id, " +
        s"found $nEx Exchanges:\n$plan")
    out.orderBy("vec_id")
  }

  /** JL retrieve-and-rerank gate: coarse candidates in 48-d projected
    * space, exact-cosine rerank; recall@5 ≥ 0.8 vs brute force over
    * the 20 query vectors (measured 0.91 at sf0.01 — the isotropic
    * synthetic embeddings are JL's worst case, see
    * [[Similarity.rprojTopK]]'s scaladoc; deterministic, so the gate
    * cannot flap).
    */
  def simRprojTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") < 20)
    topkGate("rproj_topk",
      Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", k = 5),
      Similarity.rprojTopK(q, emb, "vec_id", "embedding", k = 5,
        dim = 64),
      Seq("query_id", "neighbor_id"), recallMin = 0.8)
  }

  /** PCA over the embedding column ([[graft.ext.Pca]]) as a gate-style
    * driver query (an eigendecomposition has no SQL oracle — the
    * IN-QUERY invariants do the verifying, the oracle pins the corpus
    * size and the expected gate outcomes): orthonormal components,
    * sorted nonnegative eigenvalues, top-p variance ≥ the uniform
    * share, and — the one that pins the DISTRIBUTED transform against
    * the driver-side eigensolve — the per-component variance of the
    * actual projected column equals its eigenvalue, with mean ≈ 0
    * (centering worked).
    */
  def simPca(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = t(s, dir, "embeddings")
    val (dim, p) = (64, 8)
    val m = graft.ext.Pca.fit(emb, "embedding", dim, p)
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val orthoErr = (for (i <- 0 until p; j <- i until p) yield
      math.abs(dot(m.components(i), m.components(j)) -
        (if (i == j) 1.0 else 0.0))).max
    val orthonormalPass = orthoErr < 1e-8
    val eigsPass =
      m.eigenvalues.sliding(2).forall(w => w(0) >= w(1) - 1e-12) &&
        m.eigenvalues.last >= -1e-9
    val varPass =
      m.eigenvalues.sum >= m.totalVariance * p / dim - 1e-9
    val proj = graft.ext.Pca.transform(emb, "embedding", m)
    val stats = proj
      .select(posexplode_outer(col("pc")).as(Seq("r", "x")))
      .groupBy("r")
      .agg(avg(col("x")).as("mu"), avg(col("x") * col("x")).as("m2"))
      .collect()
      .map(row => row.getInt(0) ->
        (row.getDouble(1), row.getDouble(2) -
          row.getDouble(1) * row.getDouble(1)))
      .toMap
    val projVarPass = (0 until p).forall { r =>
      val (mu, v) = stats(r)
      math.abs(mu) < 1e-6 &&
        math.abs(v - m.eigenvalues(r)) <=
          1e-6 * math.max(m.eigenvalues(r), 1e-9)
    }
    Seq(("pca", emb.count(), orthonormalPass, eigsPass, varPass,
      projVarPass))
      .toDF("family", "n_vecs", "orthonormal_pass", "eigs_sorted_pass",
        "var_explained_pass", "proj_var_pass")
  }

  def simVectorDimStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
      .filter(col("dim") < 8)
      .groupBy("label", "dim")
      .agg(round(avg(col("v").cast("double")), 6).as("mean_v"),
        round(max(col("v").cast("double")), 6).as("max_v"),
        count(lit(1)).as("n"))
      .orderBy("label", "dim")

  /** End-to-end corpus curation — the composed pipeline a training-data
    * run executes: language-ID filter (en) → quality filter (≥ 0.5) →
    * duplicate-cluster pruning over the survivors. The DuckDB oracle
    * recomputes ALL THREE stages (marker-count langid, quality formula,
    * recursive-CTE components over the filtered pair set), so the
    * funnel counts are verified stage by stage across engines. The 0.5
    * threshold is safe at the boundary because `quality` itself is
    * hash-matched per doc (rounded to 6 decimals identically).
    */
  def curationPipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    // ONE corpus scan computes language + quality together
    // (TextStats.profile); materialized once (SQL cache — releasable)
    // because the funnel reads it for n_en, the kept join, and n_kept
    val prof = TextStats.profile(docs, "doc_id", "text").persist()
    val en = prof.filter(col("predicted_lang") === "en").select("doc_id")
    val kept = docs.join(
      prof.filter(col("predicted_lang") === "en" && col("quality") >= 0.5)
        .select("doc_id"), "doc_id")
      .select("doc_id", "text").persist()
    val pairs = Dedup.ngramJaccardPairs(kept, "doc_id", "text",
      n = 3, threshold = 0.5)
    // local-checkpoint CC (fastest mode) — safe to release
    // deterministically here because the funnel counts are consumed
    // eagerly below, so no lazy lineage escapes the query
    val comps = Dedup.connectedComponents(pairs)
    try {
      val losers = comps.filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      val fin = kept.join(losers, Seq("doc_id"), "left_anti")
      // the funnel counts are driver-sized scalars by design — computed
      // eagerly so every materialized stage is released before the
      // query returns
      Seq((docs.count(), en.count(), kept.count(), fin.count()))
        .toDF("n_docs", "n_en", "n_kept", "n_final")
    } finally {
      prof.unpersist(blocking = false)
      kept.unpersist(blocking = false)
      Dedup.releaseLocalCheckpoint(comps)
    }
  }

  /** The FULL curation funnel — every curation family composed the way
    * a production pre-training pipeline runs them, each stage count
    * independently recomputed by the oracle:
    *
    *   corpus (minus the benchmark slice) → language ID (en) → quality
    *   ≥ 0.5 → repetition filter (top-2-gram ≤ 0.10, top-3-gram ≤
    *   0.08) → benchmark decontamination (8-gram overlap) → duplicate-
    *   cluster pruning (exact 3-gram Jaccard ≥ 0.5 + connected
    *   components) → PII audit of the survivors.
    *
    * Scan economy: profile computes language+quality in one pass;
    * repetition is map-only on the kept set; decontam is one semi-join
    * against the broadcast benchmark index; dedup runs on the
    * post-filter survivors only (the funnel ORDER is the optimization
    * — each stage shrinks the set the expensive pair stage sees).
    */
  def curationFull(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = t(s, dir, "documents")
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    val prof = TextStats.profile(corpus, "doc_id", "text").persist()
    val keptQ = corpus.join(
      prof.filter(col("predicted_lang") === "en" && col("quality") >= 0.5)
        .select("doc_id"), "doc_id")
      .select("doc_id", "text").persist()
    val keptR = TextStats.repetitionFilter(keptQ, "doc_id", "text",
      maxTop2 = 0.10, maxTop3 = 0.08)
    val clean = Decontaminate.removeContaminated(keptR, "doc_id", "text",
      Decontaminate.benchmarkIndex(bench, "text", n = 8),
      n = 8, broadcastIndex = true).persist()
    val pairs = Dedup.ngramJaccardPairs(clean, "doc_id", "text",
      n = 3, threshold = 0.5)
    val comps = Dedup.connectedComponents(pairs)
    try {
      val losers = comps.filter(col("id") =!= col("comp"))
        .select(col("id").as("doc_id"))
      val fin = clean.join(losers, Seq("doc_id"), "left_anti").persist()
      try {
        val piiClean = fin
          .filter(Pii.redactedCol(col("text")) === col("text")).count()
        Seq((corpus.count(),
          prof.filter(col("predicted_lang") === "en").count(),
          keptQ.count(), keptR.count(), clean.count(), fin.count(),
          piiClean))
          .toDF("n_corpus", "n_en", "n_quality", "n_repetition",
            "n_decontam", "n_final", "n_pii_clean")
      } finally fin.unpersist(blocking = false)
    } finally {
      prof.unpersist(blocking = false)
      keptQ.unpersist(blocking = false)
      clean.unpersist(blocking = false)
      Dedup.releaseLocalCheckpoint(comps)
    }
  }

  // ———————————————————————————————————————— sampling / splits

  /** Exact-size stratified sample: per-stratum sampled counts are
    * ⌈frac·n⌉ BY CONSTRUCTION (hash-ordered take, not Bernoulli), so
    * DuckDB verifies them exactly from the group sizes.
    */
  def sampleStratified(s: SparkSession, dir: String): DataFrame =
    Sampling.stratifiedSample(t(s, dir, "embeddings"), "label", "vec_id",
      frac = 0.1)
      .groupBy("label").agg(count(lit(1)).as("n_sampled"))
      .orderBy("label")

  /** Train/val/test hash-split gate: every doc lands in exactly one
    * split (coverage is checked via the split counts summing to the
    * oracle-counted total) and each split's realized fraction sits
    * within ±5 pp of its weight (hash uniformity at 500 docs; the gate is
    * deterministic at a fixed corpus — measured 0.776/0.136/0.088 at
    * sf0.01, i.e. binomial noise, shrinking as 1/√n at scale).
    */
  def sampleSplit(s: SparkSession, dir: String): DataFrame = {
    val split = Sampling.hashSplit(t(s, dir, "documents"), "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    split.agg(
      count(lit(1)).as("n_total"),
      count(when(col("split") === "train", 1)).as("n_train"),
      count(when(col("split") === "val", 1)).as("n_val"),
      count(when(col("split") === "test", 1)).as("n_test"))
      .select(lit("hash_split").as("family"),
        col("n_total"),
        (col("n_train") + col("n_val") + col("n_test") === col("n_total"))
          .as("coverage_pass"),
        (abs(col("n_train") / col("n_total") - 0.8) < 0.05).as("train_pass"),
        (abs(col("n_val") / col("n_total") - 0.1) < 0.05).as("val_pass"),
        (abs(col("n_test") / col("n_total") - 0.1) < 0.05).as("test_pass"))
  }

  /** Per-group quota cap over orders (≤ 3 per customer, first by
    * order key) — fully oracled against the SQL window form; the
    * Spark plan additionally runs the partial WindowGroupLimit
    * (asserted in PackingSamplingSpec).
    */
  def sampleQuota(s: SparkSession, dir: String): DataFrame =
    Sampling.quotaPerGroup(
      t(s, dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice"),
      "o_custkey", "o_orderkey", cap = 3)
      .orderBy("o_orderkey")

  /** Deterministic per-label-rate sampling over embeddings (the
    * temperature-mix shape); every kept row is value-level verified —
    * the oracle recomputes the md5-60 draw and the rate CASE.
    */
  def sampleRates(s: SparkSession, dir: String): DataFrame =
    Sampling.sampleByRates(
      t(s, dir, "embeddings").select("vec_id", "label"),
      "label", "vec_id",
      rates = Seq(0 -> 1.0, 1 -> 0.75, 2 -> 0.5, 3 -> 0.25, 4 -> 0.1),
      defaultRate = 0.05)
      .orderBy("vec_id")

  /** Temperature-flattened domain mixture at α=0.5 (the common
    * multilingual flattening): per-source keep cuts r = √(n_min/n) in
    * the md5-60 draw space — division and sqrt are IEEE-correctly-
    * rounded, so the oracle reproduces cuts and kept set bit-exactly.
    */
  def sampleTemperature(s: SparkSession, dir: String): DataFrame =
    Sampling.temperatureSample(t(s, dir, "documents"), "source",
      "doc_id", alpha = 0.5, seed = 7)
      .select("doc_id", "source", "cut")
      .orderBy("doc_id")

  /** Epoch upsampling with fractional per-language repeat factors
    * (en 0.8 / de 1.5 / es 2.25 / fr 3.0 / zh 2.5): each doc emits
    * floor(w) copies plus a hash-lottery extra — 20% of `en` docs
    * drop entirely (the zero-epoch path), `fr` is a pure integer
    * repeat. The oracle replays the same integer base/cut literals
    * and lottery, so every (doc, epoch) row is recomputed exactly.
    */
  def sampleEpochs(s: SparkSession, dir: String): DataFrame = {
    val out = Sampling.upsampleEpochs(
      t(s, dir, "documents").select("doc_id", "lang"), "lang", "doc_id",
      weights = Seq("en" -> 0.8, "de" -> 1.5, "es" -> 2.25,
        "fr" -> 3.0, "zh" -> 2.5),
      defaultWeight = 1.0)
    // plan gate: upsampling is map-only + Generate — no shuffle, no join
    val plan = out.queryExecution.executedPlan.toString
    require(!plan.contains("Exchange") && !plan.contains("Join"),
      s"upsampleEpochs must be map-only + explode, got:\n$plan")
    out.orderBy("doc_id", "epoch")
  }

  /** Concat-then-chunk sequence packing of the corpus (budget 256
    * whitespace tokens, 8 hash buckets); the full per-doc assignment
    * is recomputed by the oracle's window cumsum.
    */
  def packSequences(s: SparkSession, dir: String): DataFrame =
    Packing.assignSequencesByText(t(s, dir, "documents"), "doc_id", "text",
      budget = 256, buckets = 8)
      .orderBy("doc_id")

  /** Length-bucketed batch layout (boundaries 16/32/64/128 whitespace
    * tokens, batches of 8, 4 hash shards) — the padding-efficient
    * batching next to [[packSequences]]'s packing; every row including
    * the per-batch padded length recomputed by the oracle's identical
    * window arithmetic.
    */
  def packLengthBatches(s: SparkSession, dir: String): DataFrame = {
    val out = Packing.lengthBatches(t(s, dir, "documents"), "doc_id",
      size(split(trim(lower(col("text"))), "\\s+")),
      boundaries = Seq(16, 32, 64, 128), batchSize = 8, shards = 4)
    // plan gate: ONE data shuffle — both windows must share the
    // (bucket, shard) partitioning (the rank window's Exchange), with
    // only a Sort between them
    val plan = out.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    require(nEx == 1,
      s"lengthBatches must shuffle once on (bucket, shard), found " +
        s"$nEx Exchanges:\n$plan")
    out.orderBy("doc_id")
  }

  /** BPE tokenizer training over the corpus (24 merges, Sennrich-style
    * word-histogram loop). The summary row carries two value-oracled
    * fields (`n_words`, `first_pair` — the first merge IS
    * SQL-expressible as an adjacent-char-pair argmax) and two in-query
    * gates: the selected pair count is non-increasing in rank
    * (guaranteed by the merge algebra — a new symbol's pairs can't
    * exceed the count that created it), and symbol conservation — the
    * DISTRIBUTED re-segmentation of the histogram ([[Bpe.segmentWords]],
    * the regex path) must shrink the corpus by exactly the driver-path
    * trainer's Σ appliedFreq, cross-checking the two implementations.
    */
  def textBpe(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hist = Bpe.wordHistogram(t(s, dir, "documents"), "text").cache()
    try {
      val (merges, _) = Bpe.train(hist, numMerges = 24)
      require(merges.nonEmpty, "text_bpe: no merges learned")
      val nonIncreasing = merges.sliding(2)
        .forall(p => p.length < 2 || p(1).pairCount <= p(0).pairCount)
      val seg = Bpe.segmentWords(hist.select("word", "cnt"), merges)
      val before = hist.agg(sum(col("cnt") * length(col("word"))))
        .head().getLong(0)
      val after = seg.agg(sum(col("cnt") * size(split(col("sym"), " "))))
        .head().getLong(0)
      val conservation =
        before - after == merges.map(_.appliedFreq).sum
      val nWords = hist.count()
      Seq(("text_bpe", nWords, merges.length, merges.head.pair,
        nonIncreasing, conservation))
        .toDF("family", "n_words", "n_merges", "first_pair",
          "merges_nonincreasing", "conservation_ok")
    } finally hist.unpersist()
  }

  /** Sliding-window chunking (window 32, overlap 8) — every chunk row
    * including its text recomputed exactly by the DuckDB oracle.
    */
  def packChunks(s: SparkSession, dir: String): DataFrame =
    Packing.chunkDocs(t(s, dir, "documents"), "doc_id", "text",
      window = 32, overlap = 8)
      .orderBy("doc_id", "chunk_id")

  /** Data-quality expectation gate over lineitem: four single-scan
    * rules (one deliberately failing — `qty_under_25` — so nonzero
    * violation counting is exercised) plus the orders referential-
    * integrity check; every count recomputed by the oracle.
    */
  def dqExpectations(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    Expectations.check(li, Seq(
      "qty_range" -> col("l_quantity").between(1, 50),
      "qty_under_25" -> (col("l_quantity") <= 25),
      "price_positive" -> (col("l_extendedprice") > 0),
      "returnflag_domain" -> col("l_returnflag").isin("A", "N", "R")))
      .unionByName(Expectations.orphans(li, "l_orderkey",
        t(s, dir, "orders"), "o_orderkey", rule = "fk_orders"))
      .orderBy("rule")
  }

  /** Single-scan column profile of orders (nulls, exact distincts,
    * min/max as strings) — every cell recomputed by the oracle. The
    * query GATES on the plan: exactly ONE FileScan (the whole profile —
    * all columns, all aggregates — is one pass over the table; a
    * per-column scan would multiply the dominant cost at scale).
    * Verification runs `exactDistinct=true` so the DuckDB oracle can
    * recompute the cells; at 100 TB the default to run is
    * `exactDistinct=false` (HLL partials — no Expand row replication,
    * same single scan, gate-verified identically in ExpectationsSpec).
    */
  def dqProfile(s: SparkSession, dir: String): DataFrame = {
    val out = Expectations.profile(t(s, dir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"))
      .orderBy("column")
    val plan = out.queryExecution.executedPlan.toString
    val nScans = "FileScan".r.findAllIn(plan).length
    require(nScans == 1,
      s"profile must be a single pass over the table, found $nScans " +
        s"FileScans:\n$plan")
    out
  }

  /** IQR outlier report over lineitem prices per return flag — the
    * numeric-anomaly sibling of the rule gate. Rank-exact quartiles
    * (see [[Expectations.iqrOutliers]]) make every fence a real data
    * value, so the DuckDB oracle replays fences AND flags bit-exact.
    */
  def dqOutliers(s: SparkSession, dir: String): DataFrame =
    Expectations.iqrOutliers(t(s, dir, "lineitem"),
      Seq("l_returnflag"), "l_extendedprice")
      .orderBy("l_returnflag")

  /** Rank-exact per-group quantile profile (p50/p90/p99 of extended
    * price per return flag) — real data values, no interpolation, so
    * the oracle replays them bit-exact.
    */
  def dqGroupQuantiles(s: SparkSession, dir: String): DataFrame =
    Expectations.quantileReport(t(s, dir, "lineitem"),
      Seq("l_returnflag"), "l_extendedprice", Seq(0.5, 0.9, 0.99))
      .orderBy("l_returnflag")

  /** The SCALE path of [[dqOutliers]]: `approx = true` swaps the
    * rank-exact per-group window (a serial sort per group — the sf1
    * board's worst non-output-bound ratio) for a mergeable
    * `percentile_approx` sketch with map-side partials. Sketch outputs
    * are implementation-defined, so — the `a_approx_agg` posture — the
    * query runs BOTH paths and gates the approx fences against the
    * rank-exact ones in-query (|Δq| ≤ 2% of the exact IQR; outlier
    * count within max(10, 1% of n)), while the oracle recomputes the
    * exact group sizes and states the bounds hold.
    */
  def dqOutliersApprox(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val exact = Expectations.iqrOutliers(li,
      Seq("l_returnflag"), "l_extendedprice")
    val approx = Expectations.iqrOutliers(li,
      Seq("l_returnflag"), "l_extendedprice", approx = true)
      .select(col("l_returnflag"), col("q1").as("a_q1"),
        col("q3").as("a_q3"), col("n_outliers").as("a_out"))
    val tol = (col("q3") - col("q1")) * 0.02
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_rows"),
        (abs(col("a_q1") - col("q1")) <= tol).as("q1_pass"),
        (abs(col("a_q3") - col("q3")) <= tol).as("q3_pass"),
        (abs(col("a_out") - col("n_outliers")).cast("double") <=
          greatest(lit(10.0), col("n_rows") * 0.01)).as("outliers_pass"))
      .orderBy("l_returnflag")
  }

  /** The scale path of [[dqGroupQuantiles]], gated the same way: the
    * approx p50/p90/p99 must sit within 2% of the rank-exact values
    * (lineitem prices are bounded away from zero, so relative error is
    * meaningful).
    */
  def dqGroupQuantilesApprox(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val ps = Seq(0.5, 0.9, 0.99)
    val exact = Expectations.quantileReport(li,
      Seq("l_returnflag"), "l_extendedprice", ps)
    val approx = Expectations.quantileReport(li,
      Seq("l_returnflag"), "l_extendedprice", ps, approx = true)
      .select(col("l_returnflag"), col("p50").as("a_p50"),
        col("p90").as("a_p90"), col("p99").as("a_p99"))
    exact.join(approx, Seq("l_returnflag"))
      .select(col("l_returnflag"), col("n_rows"),
        (abs(col("a_p50") - col("p50")) <= col("p50") * 0.02).as("p50_pass"),
        (abs(col("a_p90") - col("p90")) <= col("p90") * 0.02).as("p90_pass"),
        (abs(col("a_p99") - col("p99")) <= col("p99") * 0.02).as("p99_pass"))
      .orderBy("l_returnflag")
  }

  /** PSI distribution-drift report ([[Expectations.psiDrift]]) between
    * the even- and odd-id document halves over text length, 16 bins of
    * width 256: exact per-bin counts value-oracled; the PSI term
    * rounded to 9 decimals (the sim_rproj posture for the ≤1-ulp libm
    * `ln` divergence class). Integer-friendly bin params (width 256 =
    * 2⁸) keep the binning arithmetic IEEE-exact on both engines.
    */
  def dqDrift(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Expectations.psiDrift(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1),
      value = length(col("text")), bins = 16, lo = 0.0, hi = 4096.0)
      .orderBy("bin")
  }

  /** Per-source PSI drift report ([[Expectations.psiDriftBy]]) between
    * the even- and odd-id document halves over text length — the slice
    * matrix a multi-source ingestion pipeline monitors (aggregate
    * drift can hide one source drifting against another). Same
    * integer-friendly bin params and round-9 term posture as
    * [[dqDrift]], one report row per (source, bin).
    */
  def dqDriftBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    Expectations.psiDriftBy(
      docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1),
      groupCol = "source",
      value = length(col("text")), bins = 16, lo = 0.0, hi = 4096.0)
      .orderBy("source", "bin")
  }

  /** Hybrid lexical+vector retrieval via reciprocal-rank fusion
    * ([[graft.ext.Hybrid.rrf]]): BM25 top-10 and exact-cosine ANN
    * top-10 for the same 5 query ids, fused with k₀=60 in fixed-point
    * integer reciprocals — the fused score is a pure function of the
    * two rank lists, so the oracle replays BOTH retrievers and the
    * fusion bit-exact.
    */
  def textHybridRrf(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    val bm = graft.ext.Bm25.topK(docs, "doc_id", "text", queries,
      "qid", "text", k = 10, maxDfFrac = 1.0)
      .select(col("query_id"), col("doc_id").as("item_id"), col("rank"))
    val emb = t(s, dir, "embeddings")
    val ann = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 5), emb,
      "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id").as("item_id"), col("rank"))
    graft.ext.Hybrid.rrf(Seq(bm, ann), k0 = 60, topK = 10)
      .select("query_id", "item_id", "rrf_score_u", "n_lists", "rank")
      .orderBy("query_id", "rank")
  }

  /** k-fold assignment over documents (k=5), every row's fold replayed
    * by the oracle from the identical portable draw.
    */
  def sampleKfold(s: SparkSession, dir: String): DataFrame =
    Sampling.kfold(t(s, dir, "documents"), "doc_id", k = 5)
      .select("doc_id", "fold")
      .orderBy("doc_id")

  /** Edit-distance pairs over distinct part names (Ed-Join prefix
    * filtering + banded levenshtein verify); the oracle brute-forces
    * the same pair set with DuckDB's levenshtein — recall 1.0 means
    * the filtered plan must reproduce it exactly.
    */
  def dedupEditPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.editDistancePairs(t(s, dir, "part"), "p_name",
      maxDist = 2, q = 2)
      .orderBy("s_a", "s_b")

  /** PageRank (3 fixed iterations, δ=0.85) over the supplier
    * co-occurrence graph: suppliers sharing an order, both directions —
    * symmetric, so the dangling term is exactly zero and the oracle
    * replays the rounds with order-independent decimal sums.
    */
  def graphPagerank(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .distinct()
    val e = li.toDF("ok", "src").join(li.toDF("ok", "dst"), Seq("ok"))
      .filter(col("src") =!= col("dst"))
      .select("src", "dst")
    // the FIXED-POINT variant: BIGINT micro-rank units make the result
    // a pure function of the edge set — bit-identical in any engine, so
    // the DuckDB oracle replays it digit-for-digit (the double variant
    // hash-diverged at the 1e-12 digit through double→decimal casts)
    Graph.pageRankFixed(e, "src", "dst", iters = 3, dampingPct = 85)
      .select(col("node").as("l_suppkey"), col("rank_u"), col("rank"))
      .orderBy("l_suppkey")
  }

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

  /** Fingerprint gate: the rolling hash must be consistent (equal
    * normalized token streams ⇒ one fingerprint per group) and
    * collision-free on this corpus (distinct streams ⇒ distinct
    * fingerprints); the oracle independently counts docs and distinct
    * token streams in DuckDB.
    */
  def textFingerprint(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val fp = TextStats.fingerprint(docs, "doc_id", "text")
    val norm = docs.select(col("doc_id"),
      split(trim(lower(col("text"))), "\\s+").as("w"))
    fp.join(norm, "doc_id")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("w")).as("n_groups"),
        countDistinct(col("fingerprint")).as("n_fp"),
        countDistinct(struct(col("w"), col("fingerprint"))).as("n_wfp"))
      .select(lit("fingerprint").as("family"), col("n_docs"), col("n_groups"),
        (col("n_fp") === col("n_groups")).as("injective_pass"),
        (col("n_wfp") === col("n_groups")).as("consistent_pass"))
  }

  /** Raw per-doc fingerprints (bench surface). */
  def textFingerprintRaw(s: SparkSession, dir: String): DataFrame =
    TextStats.fingerprint(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Heuristic language ID — fully oracled: the marker-count scoring
    * and (score, lang)-max tie-break are replicated verbatim in DuckDB
    * SQL, so every per-doc prediction is hash-checked.
    */
  def textLangid(s: SparkSession, dir: String): DataFrame =
    TextStats.languageId(t(s, dir, "documents"), "doc_id", "text")
      .select("doc_id", "predicted_lang")
      .orderBy("doc_id")

  /** Corpus-trained bigram LM score per doc (CCNet-style quality
    * signal) — fully deterministic (exact counts, one ln per distinct
    * bigram, round 6), recomputed value-for-value by the DuckDB oracle.
    */
  def textLmScore(s: SparkSession, dir: String): DataFrame =
    TextStats.lmScore(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** CCNet end-to-end quality mixture (Wenzek et al. 2020): corpus
    * bigram-LM scoring → per-language quartile RANK bands
    * (head/middle/tail via [[Domains.rankBands]] — integer ntile
    * arithmetic, no float quantile interpolation, so the float-score
    * banding is bit-exact cross-engine on any corpus) → band-rate
    * thinning (head kept whole, middle bands 50%/20%, tail 10%).
    * Every stage is an already-oracled operator; the oracle
    * recomputes all three in one statement over the shared lm CTE
    * fragment.
    */
  def qualityMixture(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scored = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val banded = Domains.rankBands(scored, "lang", "lm_score", "doc_id")
    Sampling.sampleByRates(banded, "band", "doc_id",
      rates = Seq(3 -> 1.0, 2 -> 0.5, 1 -> 0.2), defaultRate = 0.1,
      seed = 11)
      .select("doc_id", "lang", "lm_score", "band")
      .orderBy("doc_id")
  }

  /** Top-3 TF-IDF keywords per document (rank over the rounded score
    * with term tiebreak — cross-engine deterministic).
    */
  def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextStats.tfidfKeywords(t(s, dir, "documents"), "doc_id", "text",
      topN = 3)
      .orderBy("doc_id", "kw_rank")

  /** Corpus vocabulary head: top-20 terms by token count with
    * cumulative coverage share (tokenizer-prep profile).
    */
  def textVocab(s: SparkSession, dir: String): DataFrame =
    TextStats.vocabulary(t(s, dir, "documents"), "text", topK = 20)
      .orderBy("vocab_rank")

  /** Gopher-style repetition signals per doc. The dup-line signal runs
    * on a line-ified view of the corpus (the single-line test docs have
    * no '\n'; replacing the ' table ' delimiter with newlines exercises
    * the line splitter with the same deterministic text both engines
    * see). All four fractions are value-level hash-checked.
    */
  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextStats.repetitionStatsOn(t(s, dir, "documents"), "doc_id", "text",
      replace(col("text"), lit(" table "), lit("\n")))
      .orderBy("doc_id")

  /** PII scrub surface: the corpus is deterministically salted with
    * synthetic PII (an email / phone / IPv4 by doc_id residue — the raw
    * corpus contains none, which would make the gate vacuous), then
    * detection counts and the redacted text are computed in one scan.
    * The oracle rebuilds the same salted text and recomputes every
    * count and replacement in DuckDB (both engines run the identical
    * portable-regex patterns).
    */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val salted = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        when(pmod(col("doc_id"), lit(4)) === 0,
          concat(lit(" contact user"), col("doc_id").cast("string"),
            lit("@example.com")))
          .when(pmod(col("doc_id"), lit(4)) === 1,
            concat(lit(" call 555-867-"),
              lpad(col("doc_id").cast("string"), 4, "0")))
          .when(pmod(col("doc_id"), lit(4)) === 2,
            concat(lit(" host 10.0."),
              pmod(col("doc_id"), lit(256)).cast("string"), lit(".7 up")))
          .otherwise(lit(""))).as("text"))
    Pii.report(salted, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Benchmark decontamination: every 10th doc plays the benchmark set;
    * the rest are the training corpus. 8-gram overlap (partial at this
    * corpus: the exact-duplicate docs collide, everything else is
    * clean) with the tiny index broadcast. The oracle recomputes the
    * string-level n-gram overlap in DuckDB, whole-doc gram for short
    * docs included.
    */
  def decontamOverlap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val bench = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
    Decontaminate.flag(corpus, "doc_id", "text",
      Decontaminate.benchmarkIndex(bench, "text", n = 8),
      n = 8, broadcastIndex = true)
      .orderBy("doc_id")
  }

  // ———————————————————————————————————————— multimodal

  /** Declarative multimodal metadata stats (SQL-oracle-able subset). */
  def multimodalStats(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaStats(Multimodal.fromDocuments(t(s, dir, "documents")))
      .select("doc_id", "media_type", "payload_bytes", "n_pixels")
      .orderBy("doc_id")

  /** Batched feature-extraction gate: the decode is an honest stub, so
    * the driver-visible invariants are the PLUMBING's — one feature row
    * per document, fixed dimensionality, values in the documented
    * [0, 1) range; the oracle counts documents and states them.
    */
  def multimodalFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s,
      Multimodal.fromDocuments(t(s, dir, "documents")))
      .toDF()
      .agg(count(lit(1)).as("n_rows"),
        count(when(size(col("features")) === 8, 1)).as("n_dim_ok"),
        min(array_min(col("features"))).as("f_min"),
        max(array_max(col("features"))).as("f_max"))
      .select(lit("media_features").as("family"), col("n_rows"),
        (col("n_dim_ok") === col("n_rows")).as("dims_pass"),
        (col("f_min") >= 0f && col("f_max") < 1f).as("range_pass"))

  /** Raw per-doc stub features (bench surface of the gated family). */
  def multimodalFeaturesRaw(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(s,
      Multimodal.fromDocuments(t(s, dir, "documents")))
      .toDF()
      .select(col("doc_id"), col("media_type"), col("payload_bytes"),
        element_at(col("features"), 1).as("f0"))
      .orderBy("doc_id")

  /** Frame sampling (every 2nd 64-byte frame) — fully oracled: frame
    * indices and lengths are pure stride/ceil arithmetic over the
    * payload length, recomputed in DuckDB; the frame BYTES (not
    * SQL-comparable) are asserted against hand-sliced payloads in
    * ExtSpec.
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

  /** Deterministic per-document test image for the REAL-decode queries:
    * tiny (4–7 × 3–5) with every channel a closed-form function of
    * (doc_id, x, y) — so the DuckDB oracle can recompute exact pixel
    * aggregates without ever seeing the bytes.
    */
  private[queries] def synthBmp(id: Long): Bmp.Image = {
    val w = (4 + id % 4).toInt
    val h = (3 + id % 3).toInt
    val rgb = Array.tabulate(w * h) { i =>
      val x = i % w
      val y = i / w
      val base = id * 31 + x * 7 + y * 13
      val r = (base % 256).toInt
      val g = ((base + 85) % 256).toInt
      val b = ((base + 170) % 256).toInt
      (r << 16) | (g << 8) | b
    }
    Bmp.Image(w, h, rgb)
  }

  /** REAL media decode ([[Bmp]], pure JVM, no deps): synthesize a
    * physical 24-bit BMP per document, push the BYTES through the
    * parser, and emit integer pixel aggregates the oracle recomputes
    * from the generating formula. Row padding, BGR byte order and
    * bottom-up row storage all sit between encode and the emitted
    * numbers — the position-WEIGHTED green sum pins row/column order,
    * so a decoder that mis-parses any of them cannot match. `bmp_bytes`
    * additionally oracles the container arithmetic (header + padded
    * rows).
    */
  /** (continued) r14: the encoded bytes go THROUGH a stored
    * `BinaryType` parquet column — encode once into a bytes table,
    * read it back, decode from the COLUMN — so parquet binary
    * round-tripping (page encoding, byte-array materialization) sits
    * inside the checked loop instead of synthesizing bytes in the same
    * task that decodes them. The in-query gate pins the returned
    * frame's plan to a parquet scan whose ReadSchema carries the
    * binary column.
    */
  def multimodalBmpStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val store = s"${ccScratchDir()}/bmp_store"
    t(s, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map(id => (id, Bmp.encode(synthBmp(id)))))
      .toDF("doc_id", "img")
      .write.parquet(store)
    val res = s.read.parquet(store).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val dec = Bmp.decode(bytes)
        var sumR = 0L
        var wsumG = 0L
        var y = 0
        while (y < dec.height) {
          var x = 0
          while (x < dec.width) {
            val p = dec(x, y)
            sumR += (p >> 16) & 0xff
            wsumG += (x + y.toLong * dec.width) * ((p >> 8) & 0xff)
            x += 1
          }
          y += 1
        }
        (id, bytes.length.toLong, dec.width, dec.height, sumR, wsumG,
          (dec(0, 0) & 0xff).toLong)
      })
      .toDF("doc_id", "bmp_bytes", "bmp_w", "bmp_h", "sum_r", "wsum_g",
        "corner_b")
      .orderBy("doc_id")
    require(res.queryExecution.executedPlan.toString.linesIterator
        .exists(l => l.contains("ReadSchema") && l.contains("img:binary")),
      "multimodal_bmp_stats: decode is not reading a stored binary column")
    res
  }

  /** REAL pixel resize: nearest-neighbor downscale to maxSide 3
    * ([[Bmp.resizeNearest]] — integer source-index arithmetic the
    * oracle recomputes), re-encoded and re-decoded so the emitted sums
    * come off a second physical roundtrip of the RESIZED bytes.
    */
  /** (continued) r14: source bytes come off a stored `BinaryType`
    * parquet column (same store-and-decode shape as
    * [[multimodalBmpStats]]); the resize output is re-encoded and
    * re-decoded in-task, so BOTH a physical parquet roundtrip and a
    * second in-memory container roundtrip guard the emitted sums.
    */
  def multimodalBmpResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val store = s"${ccScratchDir()}/bmp_resize_store"
    t(s, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map(id => (id, Bmp.encode(synthBmp(id)))))
      .toDF("doc_id", "img")
      .write.parquet(store)
    val res = s.read.parquet(store).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val dec = Bmp.decode(bytes)
        val out = Bmp.decode(Bmp.encode(Bmp.resizeNearest(dec, 3)))
        var sumR = 0L
        var y = 0
        while (y < out.height) {
          var x = 0
          while (x < out.width) {
            sumR += (out(x, y) >> 16) & 0xff
            x += 1
          }
          y += 1
        }
        (id, out.width, out.height, sumR)
      })
      .toDF("doc_id", "out_w", "out_h", "sum_r")
      .orderBy("doc_id")
    require(res.queryExecution.executedPlan.toString.linesIterator
        .exists(l => l.contains("ReadSchema") && l.contains("img:binary")),
      "multimodal_bmp_resize: decode is not reading a stored binary column")
    res
  }

  /** REAL audio decode ([[Wav]], RIFF/PCM16): synthesize a physical
    * WAV per document from a closed-form integer waveform, decode the
    * BYTES back through the chunk-walking parser, and emit integer
    * sample aggregates the oracle recomputes — little-endian int16
    * packing and chunk traversal sit inside the checked path; the
    * position-weighted sum pins sample order, the sum of squares the
    * signal energy.
    */
  /** (continued) r14: the RIFF bytes go through a stored `BinaryType`
    * parquet column (same store-and-decode shape as
    * [[multimodalBmpStats]]) — the chunk walker parses what parquet
    * hands back, not what the same task just built.
    */
  def multimodalWavStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val store = s"${ccScratchDir()}/wav_store"
    t(s, dir, "documents").select("doc_id").as[Long]
      .mapPartitions(_.map { id =>
        val n = (16 + id % 16).toInt
        val samples = Array.tabulate(n)(i =>
          (((id * 37 + i.toLong * 101) % 4001) - 2000).toShort)
        (id, Wav.encode(Wav.Audio(8000 + (id % 3).toInt * 4000, samples)))
      })
      .toDF("doc_id", "wav")
      .write.parquet(store)
    val res = s.read.parquet(store).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        val dec = Wav.decode(bytes)
        var sum = 0L
        var wsum = 0L
        var sumsq = 0L
        var i = 0
        while (i < dec.samples.length) {
          val v = dec.samples(i).toLong
          sum += v
          wsum += i * v
          sumsq += v * v
          i += 1
        }
        (id, bytes.length.toLong, dec.sampleRate, dec.samples.length,
          sum, wsum, sumsq)
      })
      .toDF("doc_id", "wav_bytes", "sample_rate", "n_samples",
        "sum_s", "wsum_s", "sumsq_s")
      .orderBy("doc_id")
    require(res.queryExecution.executedPlan.toString.linesIterator
        .exists(l => l.contains("ReadSchema") && l.contains("wav:binary")),
      "multimodal_wav_stats: decode is not reading a stored binary column")
    res
  }

  // ———————————————————————————————————————— domain curation

  /** Per-source domain profile of the corpus — exact integer counters
    * only (doc/token/distinct-text/language counts), every cell
    * recomputed by the DuckDB oracle.
    */
  def domainsProfile(s: SparkSession, dir: String): DataFrame =
    Domains.profile(t(s, dir, "documents"), "source", "text", "lang")
      .orderBy("domain")

  /** Domain-level curation verdict applied back to documents: sources
    * need ≥10 docs, a mean whitespace-token length ≥53, an exact-dup
    * rate ≤0.5, and must not be on the two-entry blocklist (both
    * blocked sources pass the stats gates, so the literal path is
    * genuinely exercised). Thresholds picked to split the sf corpus's
    * 45–62 avg-token source spread roughly in half.
    */
  def domainsFilter(s: SparkSession, dir: String): DataFrame =
    Domains.filterByStats(t(s, dir, "documents"), "source", "text", "lang",
      minDocs = 10, minAvgTokens = 53.0, maxDupRate = 0.5,
      blocklist = Seq("src1", "src11"))
      .select("doc_id", "source")
      .orderBy("doc_id")

  /** CCNet-style per-source quartile banding of the corpus by
    * whitespace token count (band 0–3). Integer scores + quarter cut
    * fractions make the interpolated percentiles exact binary
    * arithmetic — the bit-exact cross-engine operating point.
    */
  def domainsBands(s: SparkSession, dir: String): DataFrame =
    Domains.scoreBands(
      t(s, dir, "documents").select(col("doc_id"), col("source"),
        size(split(trim(lower(col("text"))), "\\s+")).as("ws_tokens")),
      "source", "ws_tokens")
      .select("doc_id", "source", "ws_tokens", "band")
      .orderBy("doc_id")

  // ———————————————————————————————————————— global shard layout

  /** Global token-budget shard assignment (budget 512 tokens) in a
    * deterministic epoch-shuffle order (portable md5-60 hash of
    * doc_id) — the two-phase distributed prefix sum; the oracle
    * recomputes `tok_start` with one global window cumsum over the
    * same `(hash, doc_id)` order.
    */
  def packShards(s: SparkSession, dir: String): DataFrame =
    Packing.assignShards(t(s, dir, "documents"), "doc_id",
      size(split(trim(lower(col("text"))), "\\s+")),
      budget = 512,
      orderKey = graft.functions.PortableHash.h60("shard", 42, col("doc_id")),
      buckets = 8)
      .orderBy("doc_id")

  /** End-to-end training-mix build — the funnel a mix-shaping pass
    * runs after content curation: domain stats gates + blocklist →
    * corpus-wide exact dedup (min-id representative per normalized
    * text) → temperature-flattened source resampling (α = 0.5) →
    * global token-budget shard layout. Every stage is an
    * already-oracled operator; the oracle recomputes the whole funnel
    * stage by stage in one SQL statement.
    *
    * The persist covers [[Packing.assignShards]]' two eager internal
    * jobs (quantile-cut sample + bucket totals) so the funnel runs
    * once for them, and is released before return — the final
    * materialization recomputes the (cheap, shrink-first) funnel
    * lineage once more rather than leaking a cached frame past the
    * query boundary.
    */
  def mixturePipeline(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val gated = Domains.filterByStats(docs, "source", "text", "lang",
      minDocs = 10, minAvgTokens = 53.0, maxDupRate = 0.5,
      blocklist = Seq("src1", "src11"))
    val reps = gated.groupBy(lower(trim(col("text"))))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val deduped = gated.join(reps, Seq("doc_id"), "left_semi")
    val mixed = Sampling.temperatureSample(deduped, "source", "doc_id",
      alpha = 0.5, seed = 7).persist()
    try {
      Packing.assignShards(mixed, "doc_id",
        size(split(trim(lower(col("text"))), "\\s+")),
        budget = 512,
        orderKey = graft.functions.PortableHash.h60("shard", 42,
          col("doc_id")),
        buckets = 8)
        .orderBy("doc_id")
    } finally mixed.unpersist(blocking = false)
  }

  // ———————————————————————————————————————— duplicated spans

  /** Exact duplicated-span inventory (window 15 tokens, df ≥ 2) —
    * every maximal span all of whose 15-token windows repeat
    * corpus-wide, positions and window counts value-oracled.
    */
  def dedupSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
      window = 15, minDf = 2)
      .orderBy("doc_id", "span_start")

  /** Span-level dedup applied: redundant duplicated spans removed
    * keeping the global-first canonical occurrence, text rebuilt from
    * surviving tokens — output text recomputed exactly by the oracle.
    */
  def dedupStripSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.stripDuplicatedSpans(t(s, dir, "documents"), "doc_id", "text",
      window = 15, minDf = 2)
      .orderBy("doc_id")

  /** Seeded deterministic shuffle-to-shards ([[Sampling
    * .shuffleShards]]): the replayable global permutation a trainer's
    * data-ordering step needs — shard by portable hash mod 16, order
    * within shards by the draw. Fully value-oracled (the oracle
    * recomputes the md5-60 draw and the per-shard ranking).
    */
  def sampleShuffle(s: SparkSession, dir: String): DataFrame =
    Sampling.shuffleShards(t(s, dir, "documents"), "doc_id",
      nShards = 16, seed = 42L)
      .select("doc_id", "shard", "pos")
      .orderBy("shard", "pos")

  /** EXACTLY-100 seeded uniform sample ([[Sampling.sampleExactN]]) —
    * the reservoir-sampling contract as a deterministic top-n over
    * the portable draw; every (doc_id, draw) row replayed by the
    * oracle's ORDER BY + LIMIT. Plan-gated: the top-n must compile to
    * TakeOrderedAndProject (per-partition heaps), NOT a global Sort.
    */
  def sampleExactN(s: SparkSession, dir: String): DataFrame = {
    val out = Sampling.sampleExactN(t(s, dir, "documents"), "doc_id",
      n = 100, seed = 42L)
      .select("doc_id", "draw")
    val physical = out.queryExecution.executedPlan.toString()
    require(physical.contains("TakeOrderedAndProject"),
      "sample_exact_n must plan as TakeOrderedAndProject, not a global sort")
    require(!physical.contains("Sort ["),
      s"sample_exact_n planned a full Sort:\n$physical")
    out.orderBy("doc_id")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis) with
    * `n_chars` as the weight — longer docs proportionally likelier,
    * never twice. Same TakeOrderedAndProject plan gate as
    * [[sampleExactN]]; the oracle replays the −ln(u)/w key ordering.
    */
  def sampleWeighted(s: SparkSession, dir: String): DataFrame = {
    val out = Sampling.sampleWeightedN(t(s, dir, "documents"), "doc_id",
      "n_chars", n = 100, seed = 42L)
      .select("doc_id", "n_chars")
    val physical = out.queryExecution.executedPlan.toString()
    require(physical.contains("TakeOrderedAndProject"),
      "sample_weighted must plan as TakeOrderedAndProject, not a global sort")
    require(!physical.contains("Sort ["),
      s"sample_weighted planned a full Sort:\n$physical")
    out.orderBy("doc_id")
  }

  /** Model-based quality filtering ([[Classifier]], the
    * fastText/FineWeb-Edu classifier-filter shape): a logistic
    * regression over the [[TextStats.stats]] features learns a weak
    * "long document" label on a hash-split train fold and is gated on
    * the holdout — training loss must fall monotonically and holdout
    * accuracy must clear 0.85. Deterministic (zero init, fixed lr and
    * iterations, exact-moment standardization), so the emitted gate
    * row is stable; weights themselves are float-summation-order
    * sensitive and deliberately NOT emitted.
    */
  def textClassifier(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val feats = TextStats.stats(t(s, dir, "documents"), "doc_id", "text")
    val labeled = feats.withColumn("label",
      (col("n_tokens") >= 64).cast("double"))
    // persisted: FOUR separate actions consume this lineage (the
    // train-fold moment aggregate, the training projection
    // materialization inside Classifier.train, the holdout scoring
    // pass, and the corpus count below) — cross-action repeats are
    // invisible to ReuseExchange, so each would re-run the stats
    // tokenization without a materialization
    val split = Sampling.hashSplit(labeled, "doc_id",
      Seq("train" -> 0.8, "eval" -> 0.2)).persist()
    try {
      val trainFold = split.filter(col("split") === "train")
      val evalFold = split.filter(col("split") === "eval")
      val featureCols = Seq("n_tokens", "n_uniq_tokens", "uniq_ratio",
        "stopword_ratio", "mean_token_len")
      val m = Classifier.train(trainFold, featureCols, "label")
      val lossMono = m.losses.sliding(2)
        .forall(p => p.length < 2 || p(1) <= p(0) + 1e-12)
      val acc = Classifier.score(evalFold, m)
        .agg(avg(when((col("score") >= 0.5) === (col("label") === 1.0),
          1.0).otherwise(0.0)))
        .head().getDouble(0)
      // hashSplit is a pure projection (adds the split column, drops
      // nothing), so the corpus count reads the persisted frame
      Seq(("text_classifier", split.count(), lossMono, acc >= 0.85))
        .toDF("family", "n_docs", "loss_monotone", "holdout_acc_pass")
    } finally split.unpersist(blocking = false)
  }

  /** The documents corpus re-wrapped into 10-token physical lines —
    * the line-structure fixture for the line-level dedup queries (the
    * synthetic corpus is single-line; the wrap is deterministic and
    * the oracle recomputes it identically). Duplicated token runs at
    * aligned offsets become duplicated LINES, exercising the operator
    * with real cross-document repetition.
    */
  private def linedDocs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        split(trim(lower(col("text"))), "\\s+").as("_w"))
      .select(col("doc_id"), concat_ws("\n",
        transform(
          sequence(lit(0), ((size(col("_w")) - lit(1)) / lit(10)).cast("int")),
          i => concat_ws(" ", slice(col("_w"), i * 10 + 1, lit(10)))))
        .as("text"))

  /** Trigram stupid-backoff LM scoring: the model trains on the EVEN
    * doc_ids and scores the whole corpus, so held-out odd docs
    * genuinely exercise the bigram/unigram backoff stages (self-scored
    * corpora never back off — every trigram is its own evidence).
    * Every score, backoff count, and OOV count replayed by the oracle.
    */
  def textLmBackoff(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    TextStats.lmBackoffScore(docs.filter(col("doc_id") % 2 === 0), docs,
      "doc_id", "text")
      .orderBy("doc_id")
  }

  /** C4-style heuristic cleaning over the lined corpus ([[linedDocs]]
    * — the same 10-token wrap the line-dedup family uses): min 6
    * words per line, banned-substring line drops ("javascript" plus
    * the corpus word "spark" so the rule genuinely bites here),
    * doc-level "lorem ipsum"/brace gates, and a ≥3-surviving-lines
    * doc gate. Terminal-punctuation is off for this corpus (the
    * synthetic text carries no punctuation — the rule is exercised in
    * ExtSpec on a hand fixture). Every surviving doc's rebuilt text
    * is replayed exactly by the oracle.
    */
  def textC4Clean(s: SparkSession, dir: String): DataFrame =
    TextStats.c4Clean(linedDocs(s, dir), "doc_id", "text",
      minWordsPerLine = 6, minLinesPerDoc = 3,
      requireTerminalPunct = false,
      bannedLineWords = Seq("javascript", "spark"),
      bannedDocSubstrings = Seq("lorem ipsum", "{"))
      .orderBy("doc_id")

  /** Winnowing fingerprints over the corpus (word 3-grams, window 4):
    * the MOSS guaranteed selection, every (doc, pos, fp) row replayed
    * exactly by the oracle's identical frame minima.
    */
  def textWinnow(s: SparkSession, dir: String): DataFrame =
    TextStats.winnowing(t(s, dir, "documents"), "doc_id", "text",
      k = 3, w = 4)
      .orderBy("doc_id", "pos")

  /** MOSS match step: pairs sharing ≥ 2 distinct winnowing
    * fingerprints (word 3-grams, window 4, df>1000 hot drop) — the
    * guaranteed-recall candidate generator next to the MinHash family;
    * every (pair, shared count) replayed by the oracle.
    */
  def dedupWinnowPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowPairs(t(s, dir, "documents"), "doc_id", "text",
      k = 3, w = 4, minShared = 2)
      .orderBy("id_a", "id_b")

  /** PPJoin-style prefix-filtered EXACT Jaccard pairs at θ=0.4
    * ([[Dedup.prefixJaccardPairs]]): rarest-first prefix index +
    * length filter + array-intersect verify. The oracle recomputes
    * the full uncapped Jaccard join in SQL — candidate pruning must
    * be invisible in the output (recall 1.0 by the prefix-filtering
    * principle, zero FPs by the exact verify). θ differs from
    * `dedup_ngram_jaccard`'s 0.5 so the two boards pin different
    * result sets.
    */
  def dedupPrefixJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.prefixJaccardPairs(t(s, dir, "documents"), "doc_id", "text",
      n = 3, threshold = 0.4)
      .orderBy("id_a", "id_b")

  /** Corpus-duplicated line inventory over the lined corpus (CCNet /
    * RefinedWeb line-level boilerplate detection).
    */
  def dedupLines(s: SparkSession, dir: String): DataFrame =
    Dedup.duplicatedLines(linedDocs(s, dir), "doc_id", "text",
      minDf = 2, minChars = 5)
      .orderBy("line")

  /** Line-level dedup applied: every occurrence of a corpus-duplicated
    * line removed, docs rebuilt — output text recomputed exactly by
    * the oracle.
    */
  def dedupStripLines(s: SparkSession, dir: String): DataFrame =
    Dedup.stripDuplicatedLines(linedDocs(s, dir), "doc_id", "text",
      minDf = 2, minChars = 5)
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

  /** First-order Markov transition matrix of event types per user —
    * the every-path session-flow summary next to the one-path funnel.
    */
  def eventsTransitions(s: SparkSession, dir: String): DataFrame =
    EventWindows.transitions(CoreQueries.events(s, dir), "user_id",
      Seq(col("ts"), col("event_id")), "event_type")
      .orderBy("from_state", "to_state")

  /** Two-chunk streaming replay harness: write the events projection
    * to a temp source dir, run the streaming query over it, then push
    * the GLOBAL watermark twice with sentinel rows under a reserved
    * key (first push advances the watermark past the real data, second
    * fires the armed event-time timeouts) so every real event
    * finalizes. Returns the memory-sink table, sentinel key filtered
    * out. The finalize-on-watermark contract makes the result
    * row-equal to the batch operator — so the streaming operators are
    * value-oracled against the SAME DuckDB SQL as their batch twins.
    */
  private def replayEventsStream(s: SparkSession, proj: DataFrame,
      tag: String, marginSec: Long = 3600L,
      fetch: Option[() => DataFrame] = None)(
      start: (String, String, String) =>
        org.apache.spark.sql.streaming.StreamingQuery): DataFrame = {
    val tmpPath = java.nio.file.Files
      .createTempDirectory(s"graft-replay-$tag")
    ccScratchDirs.add(tmpPath) // the JVM shutdown hook reclaims it;
                               // the memory sink holds the rows, so
                               // the files are not read after return
    val tmp = tmpPath.toString
    val src = s"$tmp/src"; val chk = s"$tmp/chk"
    val qname = tag + "_" + java.util.UUID.randomUUID.toString
      .replace("-", "")
    proj.write.mode("overwrite").parquet(src)
    // sentinel timestamps on whole seconds beyond the real max — the
    // sentinel rows themselves may or may not finalize (we never push
    // a watermark past THEM); the reserved key keeps them out of the
    // result either way
    val maxRow = proj.agg(max(unix_micros(col("ts")))).head()
    require(!maxRow.isNullAt(0),
      s"replayEventsStream($tag): events projection is empty or all-null" +
        " ts — cannot derive sentinel watermark timestamps")
    val maxSec = maxRow.getLong(0) / 1000000L + 1L
    // No-data micro-batches add one empty batch after every data batch
    // (planning + 32-partition state commit, zero rows) purely to move
    // the watermark forward — but this harness moves the watermark
    // EXPLICITLY with the two sentinel pushes below (the finalize
    // design never relied on empty batches: "first push advances the
    // watermark past the real data, second fires the armed timeouts").
    // Disabling them halves the micro-batch count per replay (6 → 3)
    // at identical output — measured ~1.5-2 s/replay at sf0.1 (r15
    // board pair in OPTIMIZATION_r15.md); every replay stays
    // value-oracled against its batch twin, which is the proof the
    // empty batches contributed nothing.
    val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prevNoData = s.conf.getOption(noDataKey)
    s.conf.set(noDataKey, "false")
    val q = start(src, chk, qname)
    try {
      q.processAllAvailable()
      (1 to 2).foreach { i =>
        s.range(1).select(proj.schema.fields.toIndexedSeq.map(f => (f.name match {
          case "user_id" => lit(-1L)
          case "event_id" => lit(-i.toLong)
          case "ts" => timestamp_micros(lit((maxSec + i * marginSec) * 1000000L))
          case "value" => lit(0.0)
          case "event_type" => lit("sentinel")
        }).as(f.name)): _*).write.mode("append").parquet(src)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      prevNoData match {
        case Some(v) => s.conf.set(noDataKey, v)
        case None    => s.conf.unset(noDataKey)
      }
    }
    // default result = the memory sink; a caller whose sink is a side
    // effect (foreachBatch into a keyed table) supplies its own fetch
    fetch.map(_.apply()).getOrElse(s.table(qname))
      .filter(col("user_id") =!= -1L)
  }

  /** Streaming replay of `events_rolling`: the live-feature-store face
    * of the trailing 1-hour window, finalized at the watermark and
    * value-oracled against the batch SQL (stream ≡ batch row
    * equality).
    */
  def streamRollingReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value")
    replayEventsStream(s, proj, "streamroll") { (src, chk, qname) =>
      val in = s.readStream.schema(proj.schema).parquet(src)
        .as[graft.streaming.StreamingFeatures.RollEvent]
      graft.streaming.StreamingFeatures
        .rollingRange(in, 3600L * 1000000L, "0 seconds")
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select("event_id", "user_id", "roll_cnt", "roll_sum")
      .orderBy("event_id")
  }

  /** Streaming tumbling-window aggregation: the SAME `window`
    * expression as the batch operator run as a streaming aggregation
    * (append mode emits a window once the watermark passes its end).
    * Value-oracled against the batch tumbling SQL literally.
    */
  def streamTumblingReplay(s: SparkSession, dir: String): DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value", "event_type")
    replayEventsStream(s, proj, "streamtumb") { (src, chk, qname) =>
      // NO pre-aggregation sentinel filter: Catalyst pushes a
      // non-event-time filter BELOW the EventTimeWatermark node, so
      // filtered sentinel rows would never reach the watermark
      // tracker and the final windows would never close (measured:
      // watermark frozen at the real max). Sentinel rows instead form
      // their own 'sentinel'-typed windows, dropped from the OUTPUT.
      s.readStream.schema(proj.schema).parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(25, 6))).cast("double").as("sum_value"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value"),
          // the harness filters on user_id; windows span users, so a
          // constant real key stands in
          lit(0L).as("user_id"))
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.filter(col("event_type") =!= "sentinel")
      .select("window_start", "event_type", "n", "sum_value")
      .orderBy("window_start", "event_type")
  }

  /** Streaming sliding-window aggregation (1 h length, 30 min slide —
    * every event lands in 2 windows), value-oracled against the batch
    * sliding SQL literally.
    */
  def streamSlidingReplay(s: SparkSession, dir: String): DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value", "event_type")
    replayEventsStream(s, proj, "streamslid") { (src, chk, qname) =>
      // sentinels kept in-stream (see streamTumblingReplay), dropped
      // from the output by type
      s.readStream.schema(proj.schema).parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
          col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("event_type"),
          col("n"), lit(0L).as("user_id"))
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.filter(col("event_type") =!= "sentinel")
      .select("window_start", "event_type", "n")
      .orderBy("window_start", "event_type")
  }

  /** Streaming sessionization: the SAME `session_window` expression
    * as the batch operator ([[graft.ext.EventWindows.sessions]]) run
    * as a streaming aggregation — append mode emits a session once
    * the watermark passes its close (last event + gap), Spark's
    * native merging-session state. Value-oracled against the batch
    * sessions SQL literally.
    */
  def streamSessionsReplay(s: SparkSession, dir: String): DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value")
    replayEventsStream(s, proj, "streamsess") { (src, chk, qname) =>
      s.readStream.schema(proj.schema).parquet(src)
        .withWatermark("ts", "0 seconds")
        .groupBy(session_window(col("ts"), "30 minutes").as("w"),
          col("user_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(org.apache.spark.sql.types
            .DecimalType(25, 6))).cast("double").as("sum_value"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("n"), col("sum_value"))
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select("user_id", "session_start", "n", "sum_value")
      .orderBy("user_id", "session_start")
  }

  /** Streaming ingestion dedup — the at-least-once-delivery guard:
    * the events stream delivered TWICE (the union simulates duplicate
    * redelivery), deduplicated on event_id by Spark's
    * `dropDuplicatesWithinWatermark` (state evicted once the
    * watermark passes a key — bounded by the delivery-disorder
    * horizon, never corpus-sized). Every copy of an exact duplicate
    * is identical, so first-wins is deterministic; the output is
    * value-oracled against the ONCE-delivered events projection.
    */
  def streamDedupReplay(s: SparkSession, dir: String): DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value")
    replayEventsStream(s, proj.unionAll(proj), "streamdedup") {
      (src, chk, qname) =>
        s.readStream.schema(proj.schema).parquet(src)
          .withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", chk)
          .outputMode("append").start()
    }.select(col("user_id"), col("event_id"),
        // µs epoch, not raw ts: the parquet is TIMESTAMP(NANOS) and
        // DuckDB reads it as TIMESTAMP_NS — the integer epoch is the
        // cross-engine-stable surface (the eventsRollingSql posture)
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .orderBy("event_id")
  }

  /** The full feature-store composition, driver-visible: stream →
    * finalized rolling features → per-batch EXACTLY-ONCE upsert into
    * a keyed table (batch-id idempotency keys) → snapshot. The
    * snapshot is value-oracled against the batch rolling SQL — the
    * end-to-end contract a live feature store depends on (generation
    * ≡ batch AND landing ≡ generation), previously pinned spec-only
    * in StreamingFeaturesSpec.
    */
  def streamFeatureStoreReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value")
    val base = ccScratchDir().toString
    val table = graft.tables.KeyedTable("featstore_replay",
      s"$base/table", Seq("event_id"), precombineKey = "roll_cnt")
    replayEventsStream(s, proj, "streamfeat",
      fetch = Some(() => graft.ops.TableOps.snapshot(s, table))) {
      (src, chk, qname) =>
        val in = s.readStream.schema(proj.schema).parquet(src)
          .as[graft.streaming.StreamingFeatures.RollEvent]
        graft.streaming.StreamingFeatures
          .rollingRange(in, 3600L * 1000000L, "0 seconds")
          .writeStream.queryName(qname)
          .option("checkpointLocation", chk)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[
              graft.streaming.StreamingFeatures.RollEmit], batchId: Long) =>
            graft.ops.TableOps.upsert(s, table, batch.toDF(),
              idempotencyKey = Some(s"featstore-replay-$batchId")): Unit
          }
          .outputMode("append").start()
    }.select("event_id", "user_id", "roll_cnt", "roll_sum")
      .orderBy("event_id")
  }

  /** Streaming replay of `events_gapfill`: the daily LOCF spine
    * emitted as slots close at the watermark; sentinel margin exceeds
    * the slot step so the last real day-slot conclusively closes.
    * Value-oracled against the batch SQL.
    */
  def streamGapfillReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value")
    replayEventsStream(s, proj, "streamgap",
      marginSec = 2L * 86400L) { (src, chk, qname) =>
      val in = s.readStream.schema(proj.schema).parquet(src)
        .as[graft.streaming.StreamingFeatures.RollEvent]
      graft.streaming.StreamingFeatures
        .gapFillLocf(in, 86400L * 1000000L, "0 seconds")
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select("user_id", "slot_ts", "value", "is_observed")
      .orderBy("user_id", "slot_ts")
  }

  /** Streaming replay of `events_funnel`: greedy-earliest chain
    * advances emitted append-only as the watermark finalizes events
    * (each (user, stage) at most once, ever), aggregated to the same
    * per-stage counts report and value-oracled against the batch SQL.
    */
  def streamFunnelReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    val adv = replayEventsStream(s, proj, "streamfunnel") {
      (src, chk, qname) =>
        val in = s.readStream.schema(proj.schema).parquet(src)
          .as[graft.streaming.StreamingFeatures.TransEvent]
        graft.streaming.StreamingFeatures
          .funnel(in, Seq("signup", "view", "purchase"), "0 seconds")
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", chk)
          .outputMode("append").start()
    }
    adv.agg(
      sum(when(col("stage") === 1, 1L).otherwise(0L)).as("n_stage1"),
      sum(when(col("stage") === 2, 1L).otherwise(0L)).as("n_stage2"),
      sum(when(col("stage") === 3, 1L).otherwise(0L)).as("n_stage3"))
      .select(lit("funnel").as("family"), col("n_stage1"),
        col("n_stage2"), col("n_stage3"))
  }

  /** Streaming replay of `events_retention`: emit-once (user, active
    * week) observations tagged with the user's cohort, aggregated to
    * the retention triangle (pairs are unique, so count(*) IS the
    * distinct-user count) and value-oracled against the batch SQL.
    */
  def streamRetentionReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    val obs = replayEventsStream(s, proj, "streamret") {
      (src, chk, qname) =>
        val in = s.readStream.schema(proj.schema).parquet(src)
          .as[graft.streaming.StreamingFeatures.TransEvent]
        graft.streaming.StreamingFeatures
          .cohortRetention(in, "0 seconds")
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", chk)
          .outputMode("append").start()
    }
    obs.groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("cohort_week", "week_offset")
  }

  /** The three as-of implementations under one oracle (batch window
    * carry, DuckDB ASOF, streaming carry) agree on everything EXCEPT
    * ties between two reference rows at one (key, ts): the stream
    * pins greatest-id, the batch window and DuckDB ASOF are
    * engine-arbitrary. The corpus has no such ties today; this gate
    * makes a future generator change fail LOUDLY here instead of as
    * an inscrutable hash-red on the driver board. Skipped inside
    * Bench's timed loop (fixed-cost scan the historical artifacts
    * never paid); Verify — the correctness gate — always runs it.
    */
  private def requireNoRefTsTies(views: DataFrame, tag: String,
      keyCols: Seq[String] = Seq("user_id")): Unit =
    if (!sys.props.get("graft.bench.timing").contains("true")) {
      val gcols = keyCols :+ "ts"
      val dup = views.groupBy(gcols.map(col): _*)
        .agg(count(lit(1)).as("n")).filter(col("n") > 1L).count()
      require(dup == 0L,
        s"$tag: $dup duplicate (${gcols.mkString(", ")}) view pairs — " +
          "the as-of tie rule is engine-arbitrary in the batch/DuckDB " +
          "twins, so this corpus would make the oracle comparison " +
          "nondeterministic")
    }

  /** Streaming replay of `j_asof_join`: purchases enriched with the
    * most recent prior view per user by the streaming as-of operator
    * ([[graft.streaming.StreamingAsOf.asOfEnrich]]), finalized at the
    * watermark and value-oracled against the SAME DuckDB ASOF SQL as
    * the batch query — the stream ≡ batch contract for the
    * feature-store consumption path.
    */
  def streamAsofReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    requireNoRefTsTies(proj.filter(col("event_type") === "view"),
      "stream_asof_replay")
    replayEventsStream(s, proj, "streamasof") { (src, chk, qname) =>
      val in = s.readStream.schema(proj.schema).parquet(src)
        .as[graft.streaming.StreamingFeatures.TransEvent]
      graft.streaming.StreamingAsOf
        .asOfEnrich(in, refType = "view", probeType = "purchase",
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select(col("event_id"), col("user_id"),
        col("ref_event_id").as("view_event_id"))
      .orderBy("event_id")
  }

  /** Streaming replay of `j_asof_tolerance`: the same enrichment with
    * the 30-minute staleness TTL (match-then-null), value-oracled
    * against the batch tolerance SQL literally.
    */
  def streamAsofToleranceReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    requireNoRefTsTies(proj.filter(col("event_type") === "view"),
      "stream_asof_tolerance_replay")
    replayEventsStream(s, proj, "streamasoftol") { (src, chk, qname) =>
      val in = s.readStream.schema(proj.schema).parquet(src)
        .as[graft.streaming.StreamingFeatures.TransEvent]
      graft.streaming.StreamingAsOf
        .asOfEnrich(in, refType = "view", probeType = "purchase",
          watermarkDelay = "0 seconds",
          toleranceMicros = Some(1800L * 1000000L))
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select(col("event_id"), col("user_id"),
        col("ref_event_id").as("view_event_id"))
      .orderBy("event_id")
  }

  /** Streaming replay of the COMPOSITE-KEY trailing rolling window
    * ([[graft.streaming.StreamingFeatures.rollingRangeRows]]): the
    * 1-hour count+sum computed per (user_id, region) — region derived
    * deterministically from event_id so neither key column alone
    * determines the group — value-oracled against the batch SQL with
    * the composite PARTITION BY. The multi-tenant feature-generation
    * face: one entity's events in different shards never share a
    * window.
    */
  def streamRollingCompositeReplay(s: SparkSession, dir: String): DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value")
    replayEventsStream(s, proj, "streamrollcomp") { (src, chk, qname) =>
      val in = s.readStream.schema(proj.schema).parquet(src)
        .withColumn("region", pmod(col("event_id"), lit(3L)))
      graft.streaming.StreamingFeatures
        .rollingRangeRows(in, keys = Seq("user_id", "region"),
          trailingMicros = 3600L * 1000000L,
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select("event_id", "user_id", "region", "roll_cnt", "roll_sum")
      .orderBy("event_id")
  }

  /** Streaming replay of the COMPOSITE-KEY as-of enrichment
    * ([[graft.streaming.StreamingAsOf.asOfEnrichRows]]): purchases
    * enriched with the most recent prior view under a TWO-column key
    * (user_id, region) — region derived deterministically from
    * event_id so neither key column alone determines the group (a
    * user's events scatter across regions; a user-only grouping would
    * wrongly enrich across them). Value-oracled against the DuckDB
    * ASOF SQL with the composite equality, literally — the
    * multi-tenant feature-consumption contract.
    */
  def streamAsofCompositeReplay(s: SparkSession, dir: String): DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    requireNoRefTsTies(
      proj.filter(col("event_type") === "view")
        .withColumn("region", pmod(col("event_id"), lit(3L))),
      "stream_asof_composite_replay", keyCols = Seq("user_id", "region"))
    replayEventsStream(s, proj, "streamasofcomp") { (src, chk, qname) =>
      val in = s.readStream.schema(proj.schema).parquet(src)
        .withColumn("region", pmod(col("event_id"), lit(3L)))
      graft.streaming.StreamingAsOf
        .asOfEnrichRows(in, keys = Seq("user_id", "region"),
          refType = "view", probeType = "purchase",
          watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select(col("event_id"), col("user_id"), col("region"),
        col("ref_event_id").as("view_event_id"))
      .orderBy("event_id")
  }

  /** Streaming replay of `events_transitions`: finalized pair stream
    * aggregated to the same (from_state, to_state, n, p) report and
    * value-oracled against the batch SQL.
    */
  def streamTransitionsReplay(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    val pairs = replayEventsStream(s, proj, "streamtrans") {
      (src, chk, qname) =>
        val in = s.readStream.schema(proj.schema).parquet(src)
          .as[graft.streaming.StreamingFeatures.TransEvent]
        graft.streaming.StreamingFeatures.transitions(in, "0 seconds")
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", chk)
          .outputMode("append").start()
    }
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy("from_state")
    pairs.groupBy("from_state", "to_state").agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(wf))
      .orderBy("from_state", "to_state")
  }

  /** Streaming replay of the COMPOSITE-KEY funnel
    * ([[graft.streaming.StreamingFeatures.funnelRows]]): the
    * signup→view→purchase greedy-earliest chain advanced per
    * (user_id, region) — the same user funnels independently per
    * region — aggregated to per-region stage counts and value-oracled
    * against the batch SQL with the composite key in every stage CTE.
    */
  def streamFunnelCompositeReplay(s: SparkSession, dir: String)
      : DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    val adv = replayEventsStream(s, proj, "streamfunnelcomp") {
      (src, chk, qname) =>
        val in = s.readStream.schema(proj.schema).parquet(src)
          .withColumn("region", pmod(col("event_id"), lit(3L)))
        graft.streaming.StreamingFeatures
          .funnelRows(in, keys = Seq("user_id", "region"),
            steps = Seq("signup", "view", "purchase"),
            watermarkDelay = "0 seconds")
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", chk)
          .outputMode("append").start()
    }
    adv.groupBy("region").agg(
        sum(when(col("stage") === 1, 1L).otherwise(0L)).as("n_stage1"),
        sum(when(col("stage") === 2, 1L).otherwise(0L)).as("n_stage2"),
        sum(when(col("stage") === 3, 1L).otherwise(0L)).as("n_stage3"))
      .orderBy("region")
  }

  /** Streaming replay of the COMPOSITE-KEY cohort retention
    * ([[graft.streaming.StreamingFeatures.cohortRetentionRows]]):
    * emit-once (key, active week) observations per (user_id, region),
    * cohorted by the KEY's own first event, aggregated to per-region
    * retention triangles and value-oracled against the batch SQL.
    */
  def streamRetentionCompositeReplay(s: SparkSession, dir: String)
      : DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    val obs = replayEventsStream(s, proj, "streamretcomp") {
      (src, chk, qname) =>
        val in = s.readStream.schema(proj.schema).parquet(src)
          .withColumn("region", pmod(col("event_id"), lit(3L)))
        graft.streaming.StreamingFeatures
          .cohortRetentionRows(in, keys = Seq("user_id", "region"),
            watermarkDelay = "0 seconds")
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", chk)
          .outputMode("append").start()
    }
    obs.groupBy("region", "cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
      .orderBy("region", "cohort_week", "week_offset")
  }

  /** Streaming replay of the COMPOSITE-KEY transitions
    * ([[graft.streaming.StreamingFeatures.transitionsRows]]):
    * per-(user_id, region) Markov chains — one user's events in
    * different regions never chain together — aggregated to the
    * per-region transition report and value-oracled against the batch
    * SQL with the composite PARTITION BY.
    */
  def streamTransitionsCompositeReplay(s: SparkSession, dir: String)
      : DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "event_type")
    val pairs = replayEventsStream(s, proj, "streamtranscomp") {
      (src, chk, qname) =>
        val in = s.readStream.schema(proj.schema).parquet(src)
          .withColumn("region", pmod(col("event_id"), lit(3L)))
        graft.streaming.StreamingFeatures
          .transitionsRows(in, keys = Seq("user_id", "region"),
            watermarkDelay = "0 seconds")
          .writeStream.format("memory").queryName(qname)
          .option("checkpointLocation", chk)
          .outputMode("append").start()
    }
    val wf = org.apache.spark.sql.expressions.Window
      .partitionBy("region", "from_state")
    pairs.groupBy("region", "from_state", "to_state")
      .agg(count(lit(1)).as("n"))
      .withColumn("p", col("n").cast("double") / sum(col("n")).over(wf))
      .orderBy("region", "from_state", "to_state")
  }

  /** Streaming replay of the COMPOSITE-KEY gap-fill
    * ([[graft.streaming.StreamingFeatures.gapFillLocfRows]]): the
    * dense daily LOCF spine per (user_id, region) — one region's value
    * never fills another region's gap — value-oracled against the
    * batch SQL with the composite key in every partition/spine CTE.
    */
  def streamGapfillCompositeReplay(s: SparkSession, dir: String)
      : DataFrame = {
    val proj = CoreQueries.events(s, dir)
      .select("user_id", "event_id", "ts", "value")
    replayEventsStream(s, proj, "streamgapcomp") { (src, chk, qname) =>
      val in = s.readStream.schema(proj.schema).parquet(src)
        .withColumn("region", pmod(col("event_id"), lit(3L)))
      graft.streaming.StreamingFeatures
        .gapFillLocfRows(in, keys = Seq("user_id", "region"),
          stepMicros = 86400L * 1000000L, watermarkDelay = "0 seconds")
        .writeStream.format("memory").queryName(qname)
        .option("checkpointLocation", chk)
        .outputMode("append").start()
    }.select("user_id", "region", "slot_ts", "value", "is_observed")
      .orderBy("user_id", "region", "slot_ts")
  }

  /** Trailing 1-hour time-RANGE rolling count + sum per user — the
    * feature-generation window a ROWS frame cannot express on a
    * sparse stream.
    */
  def eventsRolling(s: SparkSession, dir: String): DataFrame =
    graft.ext.TimeSeries.rollingRange(CoreQueries.events(s, dir),
      "user_id", "ts", "value", trailingMicros = 3600L * 1000000L)
      .select("event_id", "user_id", "roll_cnt", "roll_sum")
      .orderBy("event_id")

  /** Daily gap-fill with LOCF per user: one row per day from each
    * user's first to last event, latest value carried forward.
    */
  def eventsGapfill(s: SparkSession, dir: String): DataFrame =
    graft.ext.TimeSeries.gapFillLocf(CoreQueries.events(s, dir),
      "user_id", "ts", "value", stepMicros = 86400L * 1000000L)
      .orderBy("user_id", "slot_ts")

  /** Conversion funnel signup → view → purchase, per-stage user
    * counts; the oracle replays the greedy-earliest chain stage by
    * stage.
    */
  def eventsFunnel(s: SparkSession, dir: String): DataFrame =
    EventWindows.funnel(CoreQueries.events(s, dir), "user_id",
      "event_type", "ts", Seq("signup", "view", "purchase"))
      .agg(
        count(lit(1)).as("n_stage1"),
        sum(when(col("stage_reached") >= 2, 1L).otherwise(0L))
          .as("n_stage2"),
        sum(when(col("stage_reached") >= 3, 1L).otherwise(0L))
          .as("n_stage3"))
      .select(lit("funnel").as("family"), col("n_stage1"),
        col("n_stage2"), col("n_stage3"))

  /** BM25 top-10 retrieval with the first 5 docs' texts as queries —
    * the term-side retrieval surface next to the ANN family. Fully
    * value-oracled: per-term contributions go through DECIMAL(28,9)
    * so the score sum is order-independent, and ranking is over the
    * rounded score with doc-id tiebreak.
    */
  def textBm25(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    // maxDfFrac = 1.0: the synthetic corpus has a ~31-term vocabulary
    // where every term's df is ≥ 5% of docs — a stop-term cut keyed to
    // web-text df shapes would empty it. The cap is exercised on
    // constructed data in ExtSpec instead.
    graft.ext.Bm25.topK(docs, "doc_id", "text", queries, "qid", "text",
      k = 10, maxDfFrac = 1.0)
      .orderBy("query_id", "rank")
  }

  /** Retrieval evaluation of the BM25 run (the `text_bm25` retriever
    * verbatim) against deterministic qrels — a doc is relevant to a
    * query doc iff it shares the query's (source, lang) cell. Per
    * query: recall counts, fixed-point MRR and nDCG@10 with
    * driver-baked integer weights, so every cell is oracle-replayable.
    */
  def textRetrievalEval(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val queries = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("qid"), col("text"))
    val run = graft.ext.Bm25.topK(docs, "doc_id", "text", queries, "qid",
      "text", k = 10, maxDfFrac = 1.0)
    val qrels = docs.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("source"), col("lang"))
      .join(docs.select(col("doc_id"), col("source"), col("lang")),
        Seq("source", "lang"))
      .filter(col("doc_id") =!= col("query_id"))
      .select("query_id", "doc_id")
    graft.ext.RetrievalEval.evaluate(run, "query_id", "doc_id", "rank",
      qrels, "query_id", "doc_id", k = 10)
      .orderBy("query_id")
  }

  /** Synthesized 3-annotator labels over the documents: annotator a's
    * label for doc d is the doc's lang with probability 0.8 and the
    * noise label 'zz' otherwise, decided by the portable md5-60 draw
    * of (3·doc_id + a) — digit-for-digit replayable by the oracle.
    */
  private def annotations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("lang"))
      .withColumn("annot", explode(array(lit(0L), lit(1L), lit(2L))))
      .withColumn("label",
        when(pmod(graft.functions.PortableHash.h60("lab", 42,
          col("doc_id") * 3 + col("annot")), lit(10L)) < 8, col("lang"))
          .otherwise(lit("zz")))
      .select("doc_id", "annot", "label")

  /** Majority verdict + per-item agreement over the synthesized
    * 3-annotator labels.
    */
  def labelsVote(s: SparkSession, dir: String): DataFrame =
    graft.ext.Labels.majorityVote(annotations(s, dir),
      "doc_id", "annot", "label").orderBy("doc_id")

  /** Corpus Fleiss' kappa over the same synthesized labels — one-row
    * reliability report.
    */
  def labelsKappa(s: SparkSession, dir: String): DataFrame =
    graft.ext.Labels.fleissKappa(annotations(s, dir),
      "doc_id", "annot", "label")

  /** ROC-AUC of the corpus-bigram LM score as a predictor of
    * `lang = 'en'` — the measurement half of the model-based
    * quality-filter loop (how well does the score separate the
    * dominant language the LM was implicitly trained toward?).
    * Tie-corrected Mann–Whitney over distinct-score groups; u2 is
    * exact DECIMAL(38,0) internally, emitted as BIGINT.
    */
  def evalAuc(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scoredDocs = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    // u2 is DECIMAL(38,0) internally (exact at 100 TB class counts);
    // the OUTPUT casts to BIGINT — exact up to ~10^8 rows/class, far
    // beyond any verify scale — because decimal128 serialization
    // trips the driver's hash compare (round-9 red).
    graft.ext.ModelEval.rocAuc(scoredDocs, "is_en", "lm_score")
      .withColumn("u2", col("u2").cast("long"))
  }

  /** Per-source slice AUC of the same score/label — the Simpson's-
    * reversal audit (a pooled-corpus AUC can hide an anti-predictive
    * slice). One row per source.
    */
  def evalAucBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scoredDocs = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    // Same BIGINT output cast as evalAuc (decimal128 hash artifact).
    graft.ext.ModelEval.rocAucBy(scoredDocs, "source", "is_en", "lm_score")
      .withColumn("u2", col("u2").cast("long"))
      .orderBy("source")
  }

  /** Average precision (PR-AUC, sklearn step convention) of the LM
    * score vs the `lang = 'en'` label.
    */
  def evalAvgPrecision(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scoredDocs = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.averagePrecision(scoredDocs, "is_en", "lm_score")
  }

  /** Per-source average precision of the LM score — the PR-space
    * slice audit next to `eval_auc_by` ([[graft.ext.ModelEval
    * .averagePrecisionBy]]): a source whose positives rank under
    * high-scoring negatives craters its slice AP before the pooled
    * number moves.
    */
  def evalApBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scoredDocs = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval
      .averagePrecisionBy(scoredDocs, "source", "is_en", "lm_score")
      .orderBy("source")
  }

  /** Poisson-bootstrap 95% CI for the LM-score AUC: 16 replicates,
    * deterministic per-(doc, replicate) Poisson(1) multiplicities.
    */
  def evalAucBootstrap(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scoredDocs = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.bootstrapAuc(scoredDocs, "is_en", "lm_score",
      "doc_id", replicates = 16, seed = 7)
  }

  /** Confusion report of `stopword_ratio >= 0.0625` predicting
    * `lang = 'en'` — every rate one division of exact integer cells.
    */
  def evalConfusion(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.confusionAt(st, "is_en", "stopword_ratio",
      threshold = 0.0625)
  }

  /** Calibration (reliability) table of stopword_ratio vs the
    * `lang = 'en'` label over 10 fixed-grid bins on [0, 0.25).
    */
  def evalCalibration(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.calibration(st, "is_en", "stopword_ratio",
      bins = 10, lo = 0.0, hi = 0.25)
      .orderBy("bin")
  }

  /** Expected calibration error of stopword_ratio vs `lang = 'en'`
    * over the same 10-bin grid as `eval_calibration`.
    */
  def evalEce(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.ece(st, "is_en", "stopword_ratio",
      bins = 10, lo = 0.0, hi = 0.25)
  }

  /** Downsampled ROC curve of the LM score vs `lang = 'en'` — ≤64
    * deterministic threshold points over the full distinct-score set
    * (every step-th ascending rank plus the top score).
    */
  def evalRocCurve(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scoredDocs = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.rocCurve(scoredDocs, "is_en", "lm_score",
      maxPoints = 64)
      .orderBy("thr")
  }

  /** Per-source downsampled ROC curve of the LM score — the drift
    * dashboard's per-source panel ([[graft.ext.ModelEval.rocCurveBy]],
    * 16 points per source over the shared corpus ranking).
    */
  def evalRocCurveBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val scoredDocs = TextStats.lmScore(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    // buckets = 64: cut placement is value-invariant (spec-pinned),
    // and 20 sources x 64 buckets stays under the 4096 collect cap at
    // ANY corpus scale (the default 256 tripped it at sf1)
    graft.ext.ModelEval.rocCurveBy(scoredDocs, "source", "is_en",
      "lm_score", maxPoints = 16, buckets = 64)
      .orderBy("source", "thr")
  }

  /** Per-source confusion at the pooled threshold — the slice view of
    * `eval_confusion` (a pooled-acceptable threshold can have
    * pathological per-source precision).
    */
  def evalConfusionBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.confusionAtBy(st, "source", "is_en",
      "stopword_ratio", threshold = 0.0625)
      .orderBy("source")
  }

  /** Isotonic (PAV) calibration of stopword_ratio vs `lang = 'en'`
    * over the same 10-bin grid — the monotone post-hoc calibrator next
    * to the reliability table, computed via the exact minimax closed
    * form so it is value-oracled rather than waived.
    */
  def evalIsotonic(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.isotonicCalibration(st, "is_en",
      "stopword_ratio", bins = 10, lo = 0.0, hi = 0.25)
      .orderBy("bin")
  }

  /** The calibrate→apply loop closed: fit isotonic on the corpus, map
    * every document's stopword_ratio through the fitted step function
    * (unobserved interior bins LOCF-filled, the first observed value
    * extended below). One corpus pass materializes the tiny fit; the
    * apply is a broadcast join — zero shuffles over the scored rows.
    */
  def evalCalibrated(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    val fit = graft.ext.ModelEval.isotonicCalibration(st, "is_en",
      "stopword_ratio", bins = 10, lo = 0.0, hi = 0.25)
    graft.ext.ModelEval.applyIsotonic(st, fit, "stopword_ratio",
      bins = 10, lo = 0.0, hi = 0.25, outCol = "p_en")
      .select("doc_id", "p_en")
      .orderBy("doc_id")
  }

  /** Per-source isotonic calibrate→apply: every document's stopword
    * ratio mapped through ITS source's PAV step function
    * ([[graft.ext.ModelEval.isotonicCalibrationBy]] +
    * [[graft.ext.ModelEval.applyIsotonicBy]]) — the slice answer to
    * `eval_calibrated`'s pooled fit, value-oracled per document by
    * the oracle's identical per-source minimax + dense-LOCF replay.
    */
  def evalCalibratedBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    val fit = graft.ext.ModelEval.isotonicCalibrationBy(st, "source",
      "is_en", "stopword_ratio", bins = 10, lo = 0.0, hi = 0.25)
    graft.ext.ModelEval.applyIsotonicBy(st, fit, "source",
      "stopword_ratio", bins = 10, lo = 0.0, hi = 0.25, outCol = "p_en")
      .select("doc_id", "p_en")
      .orderBy("doc_id")
  }

  /** Per-source isotonic FIT surface (the step functions
    * `eval_calibrated_by` applies, exposed as a report): one row per
    * observed (source, bin) with the slice's raw and isotonic rates.
    */
  def evalIsotonicBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.isotonicCalibrationBy(st, "source", "is_en",
      "stopword_ratio", bins = 10, lo = 0.0, hi = 0.25)
      .orderBy("source", "bin")
  }

  /** Per-source reliability table on the same grid — the slice view
    * of `eval_calibration` (a source with zero mass in a score band
    * surfaces as an n = 0 row, not a missing one).
    */
  def evalCalibrationBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.calibrationBy(st, "source", "is_en",
      "stopword_ratio", bins = 10, lo = 0.0, hi = 0.25)
      .orderBy("source", "bin")
  }

  /** Per-source ECE on the same grid — calibration drift by slice
    * (the Simpson's-reversal audit applied to calibration: pooled ECE
    * can look fine while one source is systematically over-confident).
    */
  def evalEceBy(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val st = TextStats.stats(docs, "doc_id", "text")
      .join(docs.select("doc_id", "lang", "source"), Seq("doc_id"))
      .withColumn("is_en", (col("lang") === "en").cast("int"))
    graft.ext.ModelEval.eceBy(st, "source", "is_en", "stopword_ratio",
      bins = 10, lo = 0.0, hi = 0.25)
      .orderBy("source")
  }

  /** MMR diverse rerank of the exact-cosine top-20 candidates for the
    * first 8 query vectors: k = 8 greedy picks at λ = 0.7. Rank-only
    * output (the sim_cosine_topk posture); the oracle unrolls the
    * same greedy recurrence stage by stage.
    */
  def simMmrRerank(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val queries = emb.filter(col("vec_id") < 8)
    val cands = graft.ext.Similarity
      .bruteForceTopK(queries, emb, "vec_id", "embedding", k = 20)
      .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding")),
        Seq("neighbor_id"))
    graft.ext.Mmr.rerank(cands, "query_id", "neighbor_id", "cos",
      "embedding", k = 8, lambda = 0.7)
      .orderBy("query_id", "mmr_rank")
  }

  /** Weekly cohort retention triangle (integer epoch-week arithmetic —
    * bit-exact cross-engine, no calendar truncation).
    */
  def eventsRetention(s: SparkSession, dir: String): DataFrame =
    EventWindows.cohortRetention(CoreQueries.events(s, dir), "user_id", "ts")
      .orderBy("cohort_week", "week_offset")
}
