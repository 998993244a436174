package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Document deduplication for training-data pipelines, over a
  * `(doc_id: Long, text: String)` corpus (the driver's `documents`
  * table). Four families, all expressed as declarative DataFrame plans —
  * no crossJoin anywhere, so every method scales by shuffle keys rather
  * than pairs:
  *
  *   - [[exact]]: hash-groupBy on normalized text — one shuffle of
  *     O(docs), map-side combined.
  *   - [[minhashLsh]]: shingle → k-minhash signature → band-bucket join.
  *     Candidate generation cost is O(docs × bands) shuffle keys; only
  *     colliding docs are ever paired (the Broder MinHash / LSH banding
  *     scheme, as in Spark MLlib's MinHashLSH but with deterministic
  *     seeds and no ML pipeline dependency).
  *   - [[simhashPairs]]: 60-bit SimHash + Manku-style permuted-block
  *     probing for the exact hamming-distance ≤ d pair set (Charikar
  *     SimHash with the WWW'07 blocking, the Google near-dup scheme).
  *   - [[ngramJaccardPairs]]: EXACT word-n-gram Jaccard via an inverted
  *     shingle index self-join — the verification oracle for the
  *     approximate families.
  *
  * All hashing is seed-deterministic so results are replayable (and
  * ANSI-mode-safe: intermediate products stay < 2^62).
  */
object Dedup {

  /** Normalized whitespace tokens. */
  private def tokens(text: Column): Column =
    split(trim(lower(text)), "\\s+")

  /** Word n-gram shingles (distinct), declarative formulation — kept
    * as the semantic reference for [[graft.functions.TextShingles]]
    * (the codegen-friendly single-eval expression used in the hot
    * paths; equivalence asserted in ExtSpec).
    */
  def shinglesDeclarative(text: Column, n: Int): Column = {
    val t = tokens(text)
    array_distinct(
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => concat_ws(" ", (0 until n).map(j => element_at(t, i + j + 1)): _*)))
        .otherwise(array(concat_ws(" ", t))))
  }

  /** Exact dedup: one representative (min id) per distinct normalized
    * text, with the duplicate count. At 100 TB, group on text HASHES so
    * the shuffle carries 16 bytes per doc, not documents. Collision
    * safety comes from the group key being TWO independently-seeded
    * 64-bit hashes: merging two distinct texts requires a simultaneous
    * collision in both (~2⁻¹²⁸ per pair, ~10⁻¹⁵ expected merges even at
    * 10¹² docs) — the full text never rides through the shuffle.
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    // Seed constant FIRST: Spark's XxHash64 folds children left-to-right
    // with the running hash as seed, so xxhash64(n, c) would be a pure
    // function of xxhash64(n) (an h1 collision would imply an h2
    // collision — zero extra safety). xxhash64(c, n) re-hashes the text
    // under a different effective seed, making the pair independent.
    exactBy(docs, idCol,
      n => xxhash64(n), n => xxhash64(lit(0x9e3779b97f4a7c15L), n))(textCol)

  /** [[exact]] with injectable hash functions over the normalized text —
    * lets tests substitute a deliberately-colliding first hash and
    * observe the second one keeping distinct texts apart.
    */
  private[graft] def exactBy(docs: DataFrame, idCol: String,
      h1: Column => Column, h2: Column => Column)(textCol: String): DataFrame = {
    val norm = lower(trim(col(textCol)))
    docs
      .groupBy(h1(norm).as("text_hash"), h2(norm).as("text_hash2"))
      .agg(min(col(idCol)).as("representative_id"),
        count(lit(1)).as("n_dups"))
      .select("representative_id", "text_hash", "n_dups")
  }

  /** Release the BlockManager blocks behind a `localCheckpoint`ed frame.
    * `Dataset.unpersist` only evicts SQL-cache entries; a local
    * checkpoint persists the underlying internal RDD, reachable through
    * the returned frame's `LogicalRDD` plan node — that RDD is what
    * must be unpersisted. (After release the frame is UNRECOMPUTABLE:
    * lineage was truncated — only call once fully consumed.)
    */
  private[graft] def releaseLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Drop shingles whose document frequency exceeds the cap from an
    * `(id, g)` shingle stream — the f² hot-key guard shared by
    * [[ngramJaccardPairs]] and [[verifiedJaccard]]. The broadcast side
    * is the HOT set (df > cap) anti-joined away: by construction it is
    * tiny (a corpus has few ubiquitous shingles), whereas the
    * complement — every discriminating shingle — is O(corpus) and must
    * never be broadcast.
    */
  private def dropStopShingles(sh: DataFrame, maxDf: Option[Int]): DataFrame =
    maxDf match {
      case Some(cap) =>
        val hot = sh.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("g")
        sh.join(broadcast(hot), Seq("g"), "left_anti")
      case None => sh
    }

  /** Corpus-level shingle document frequencies `(g, df)` — the
    * persistable companion of the band store ([[minhashBands]]):
    * an ingest pipeline keeps it beside the bands and maintains it
    * incrementally (union the batch's table, sum `df` per `g` — each
    * doc contributes each shingle once, so the sums compose exactly).
    * `filter(df > cap)` of this table is the CORPUS-level stop-shingle
    * list [[minhashLshIncremental]] accepts, which pre-filters shingle
    * streams against corpus-wide frequencies instead of recomputing
    * `maxDf` over whatever restricted doc set a batch happens to touch.
    */
  def shingleDocFreq(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    docs.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.shingleHashes(
        docs.sparkSession, col(textCol), n)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("df"))

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** Deterministic minhash coefficient streams (seeded LCG, like the
    * coefficient choice in public MinHashLSH implementations).
    */
  private def coeffs(k: Int, seed: Long): IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    IndexedSeq.fill(k)((1L + rnd.nextInt(Int.MaxValue - 1).toLong,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** Per-doc minhash signatures: `(id, mh_0..mh_{k-1})`.
    *
    * Shape: explode shingles once, then k `min` aggregates over
    * codegen'd scalar hash expressions — a single hash aggregation with
    * map-side partial combine (shuffle carries one k-wide row per doc
    * per mapper). The alternative — k `array_min(transform(...))`
    * columns — walks k interpreted HOF trees per doc (HOFs are
    * CodegenFallback) and is an order of magnitude slower. The base
    * hash is folded to 31 bits so `a*h + b` stays < 2^62 (ANSI-safe).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, n: Int = 3, seed: Long = 42L): DataFrame = {
    // hashes straight from the kernel: the exploded stream carries
    // 8-byte longs, never shingle strings
    val sh = docs.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.shingleHashes(docs.sparkSession,
        col(textCol), n)).as("g"))
      .withColumn("h", pmod(col("g"), lit(MersennePrime)))
    val aggs = coeffs(k, seed).zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("h") + lit(b), lit(MersennePrime))).as(s"mh_$i")
    }
    sh.groupBy("id").agg(aggs.head, aggs.tail: _*)
  }

  /** Per-doc LSH band rows `(id, band_id, band_hash)` — ~24 bytes/row,
    * the k-wide signature never leaves the signature aggregate (letting
    * it ride the explode multiplies the dominant shuffle ~k/3× and was
    * the slowest query on the whole bench board). Band hashes are
    * computed straight off the signature columns (static codegen'd
    * expressions — no interpreted HOF lambda).
    *
    * This is also the SIGNATURE STORE an incremental ingest pipeline
    * persists (e.g. as a [[graft.tables.KeyedTable]] keyed on
    * (id, band_id)): [[minhashLshIncremental]] dedups a new batch
    * against it without ever re-banding the corpus.
    */
  def minhashBands(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, n: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sig = minhashSignatures(docs, idCol, textCol, k, n, seed)
    val bandHashes = array((0 until bands).map { b =>
      xxhash64(lit(b) +: (b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*)
    }: _*)
    sig.select(col("id"), posexplode(bandHashes))
      .withColumnRenamed("pos", "band_id")
      .withColumnRenamed("col", "band_hash")
  }

  /** LSH band-collision candidate pairs (`id_a < id_b`, deduped). */
  private[graft] def minhashCandidates(docs: DataFrame, idCol: String,
      textCol: String, k: Int, bands: Int, n: Int, seed: Long): DataFrame = {
    val banded = minhashBands(docs, idCol, textCol, k, bands, n, seed)
    val l = banded.select(col("band_id"), col("band_hash"), col("id").as("id_a"))
    val r = banded.select(col("band_id"), col("band_hash"), col("id").as("id_b"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** INCREMENTAL near-dup: verified pairs between a NEW batch and an
    * existing corpus (new↔corpus and new↔new; corpus↔corpus pairs were
    * found when those docs were ingested). The shape a production
    * ingest pipeline runs per batch:
    *
    *   - the corpus side arrives as its persisted band rows
    *     (`corpusBands` = [[minhashBands]] output, maintained
    *     incrementally) — the corpus is NEVER re-shingled or re-banded;
    *   - only the new batch is banded (O(batch) work), then one
    *     equi-join against the store on (band_id, band_hash) — at
    *     100 TB the join cost is O(batch × bands) probe rows against a
    *     bucketed store, not O(corpus);
    *   - candidates are verified against TRUE n-gram Jaccard (the
    *     shingle streams of only the docs actually involved), same
    *     zero-FP construction as [[minhashLsh]].
    *
    * `corpusDocs` supplies the text of corpus docs for verification —
    * only corpus docs sharing a band with the batch are ever shingled
    * (the verification set restricts by id before any text work).
    *
    * Stop-shingle handling: without `stopShingles`, the `maxDf` cap is
    * computed over the RESTRICTED doc set the batch happens to touch —
    * a corpus-ubiquitous boilerplate shingle that appears only a few
    * times WITHIN that set escapes the cap and inflates the verified
    * Jaccard (the restricted-set df artifact). A production pipeline
    * instead persists the corpus-level `(g, df)` table
    * ([[shingleDocFreq]], maintained incrementally beside the band
    * store) and passes `filter(df > cap)` of it here: batch and
    * matched-corpus shingle streams are then pre-filtered against
    * CORPUS frequencies (broadcast anti-join — the hot set is tiny by
    * construction) and `maxDf` is not consulted at all.
    * Returns `(id_a, id_b, jaccard)`, `id_a < id_b`, jaccard ≥
    * threshold, with at least one side in the new batch.
    */
  def minhashLshIncremental(newDocs: DataFrame, corpusDocs: DataFrame,
      corpusBands: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, n: Int = 3, threshold: Double = 0.7,
      seed: Long = 42L, maxDf: Option[Int] = Some(DefaultMaxDf),
      stopShingles: Option[DataFrame] = None): DataFrame = {
    val newBands = minhashBands(newDocs, idCol, textCol, k, bands, n, seed)
    val l = newBands.select(col("band_id"), col("band_hash"),
      col("id").as("id_l"))
    val r = corpusBands.unionByName(newBands)
      .select(col("band_id"), col("band_hash"), col("id").as("id_r"))
    val cand = l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_l") =!= col("id_r"))
      .select(least(col("id_l"), col("id_r")).as("id_a"),
        greatest(col("id_l"), col("id_r")).as("id_b"))
      .distinct()
    // Verification doc set: the batch plus every corpus doc sharing ≥1
    // band with it — a SUPERSET of the candidate ids, obtained from a
    // cheap band SEMI-JOIN against the store (no pair formation), so
    // the expensive candidate pair join is evaluated exactly ONCE (by
    // the intersection join inside verifiedJaccard). Superfluous docs
    // just contribute unused shingle rows to the size table.
    val matchedCorpusIds = corpusBands
      .join(newBands, Seq("band_id", "band_hash"), "left_semi")
      .select(col("id").as(idCol)).distinct()
    val verifyDocs = newDocs.select(col(idCol), col(textCol))
      .unionByName(corpusDocs.select(col(idCol), col(textCol))
        .join(matchedCorpusIds, Seq(idCol), "left_semi"))
    verifiedJaccard(verifyDocs, idCol, textCol, n, cand, maxDf, stopShingles)
      .filter(col("jaccard") >= threshold)
  }

  /** TRUE word-n-gram Jaccard for an explicit candidate pair set:
    * `(id_a, id_b, jaccard)`. The candidate frame — typically the
    * EXPENSIVE lineage (a signature + band self-join) — is referenced
    * exactly ONCE: the intersection join restricts the shingle streams
    * to candidate docs implicitly (an equi-join on `id_a`/`id_b` IS the
    * restriction), and per-doc sizes come from one corpus-wide narrow
    * aggregate (the shingle stream is being computed anyway; a
    * candidate-restricted size table would cost a second evaluation of
    * `cand`). Pairs with zero shingle overlap are not emitted (their
    * Jaccard is 0 — below any meaningful threshold). The same `maxDf`
    * stop-shingle cap as [[ngramJaccardPairs]] applies, so a verified
    * candidate set is a subset of the exact pair set BY CONSTRUCTION.
    */
  private[graft] def verifiedJaccard(docs: DataFrame, idCol: String,
      textCol: String, n: Int, cand: DataFrame,
      maxDf: Option[Int],
      stopShingles: Option[DataFrame] = None): DataFrame = {
    val raw = docs.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.shingleHashes(
        docs.sparkSession, col(textCol), n)).as("g"))
    // A precomputed (corpus-level) stop list REPLACES the per-call df
    // computation: the hot set is tiny by construction, broadcastable.
    val sh = stopShingles match {
      case Some(stop) =>
        raw.join(broadcast(stop.select("g")), Seq("g"), "left_anti")
      case None => dropStopShingles(raw, maxDf)
    }
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("sz"))
    val inter = cand
      .join(sh.select(col("id").as("id_a"), col("g")), Seq("id_a"))
      .join(sh.select(col("id").as("id_b"), col("g")), Seq("id_b", "g"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("id_a"), col("sz").as("sz_a")), Seq("id_a"))
      .join(sizes.select(col("id").as("id_b"), col("sz").as("sz_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType))
          .as("jaccard"))
  }

  /** Near-duplicate pairs via LSH banding (bands × rowsPerBand = k),
    * each candidate VERIFIED against the true n-gram Jaccard (computed
    * from the shingle-hash sets, restricted to candidate docs). Returns
    * `(id_a, id_b, jaccard)` with `id_a < id_b`, true Jaccard ≥
    * threshold, among pairs that collided in ≥ 1 band — so false
    * positives are impossible by construction (signature-estimate
    * thresholds admit hash-coincidence FPs; true-Jaccard verification
    * does not), while recall stays that of the banding scheme.
    *
    * Scale: the only shuffles are (1) explode to (band_hash → id) — a
    * key-value stream of O(docs × bands) 24-byte rows; (2) the
    * equi-self-join on band_hash — skew-safe because a band bucket only
    * contains near-identical docs; (3) pair dedup; (4) the verification
    * joins, restricted to candidate docs. No pairwise scan of the
    * corpus ever happens.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, n: Int = 3, threshold: Double = 0.7,
      seed: Long = 42L, maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame =
    verifiedJaccard(docs, idCol, textCol, n,
      minhashCandidates(docs, idCol, textCol, k, bands, n, seed), maxDf)
      .filter(col("jaccard") >= threshold)

  /** SimHash signature width in bits. 60 rather than 64: the per-token
    * hash is the top 15 hex digits of md5(token) — a construction BOTH
    * engines compute identically (DuckDB has md5 but not Spark's
    * xxhash64), which is what lets the raw pair surface
    * `dedup_simhash_pairs` carry a full value-level DuckDB oracle
    * instead of a rows-only check. 60 bits divide evenly into the
    * (maxDist+1)=4 pigeonhole chunks, and the 4-bit narrowing is
    * immaterial to the similarity semantics.
    */
  val SimhashBits = 60

  /** 60-bit per-token hash: top 15 hex digits of md5, parsed base-16.
    * Stays < 2^60, so ANSI-safe in a signed long on both engines.
    */
  private def tokenHash60(tok: Column): Column =
    conv(substring(md5(tok.cast("binary")), 1, 15), 16, 10).cast(LongType)

  /** [[SimhashBits]]-bit SimHash per doc: bit i is the sign of the sum
    * over tokens (with multiplicity) of (2·bit_i(hash(token)) − 1).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", tokenHash60(col("tok")))
    val bitSums = (0 until SimhashBits).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1L) * 2 - 1).as(s"bs_$i"))
    tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until SimhashBits).map(i =>
          when(col(s"bs_$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Cap on probe combinations per doc for the auto-chosen SimHash
    * block count: bounds the explode fan-out (probe rows per doc) while
    * the auto-chooser maximizes block count — and thereby join-key
    * width — under it.
    */
  private val MaxProbeCombos = 20

  private def choose(n: Int, k: Int): Long =
    (1 to k).foldLeft(1L)((acc, i) => acc * (n - i + 1) / i)

  /** Auto block count for [[simhashPairs]]: the largest m ≤
    * [[SimhashBits]] with m > maxDist and C(m, m−maxDist) ≤
    * [[MaxProbeCombos]] (blocks need not divide the signature evenly —
    * [[simhashCandidates]] splits 60 bits into m near-equal blocks).
    * For the default maxDist=3 this picks m=6 (10-bit blocks,
    * C(6,3)=20 probes, 30-bit join keys); maxDist=6 picks m=7. When
    * even the minimal pigeonhole m = maxDist+1 exceeds the combo cap
    * (maxDist ≥ [[MaxProbeCombos]]), fall back to it rather than
    * reject: C(d+1, 1) = d+1 probes is linear and every maxDist <
    * [[SimhashBits]] stays expressible, at minimal-key-width cost.
    */
  private[graft] def simhashBlockCount(maxDist: Int): Int = {
    require(maxDist >= 0 && maxDist < SimhashBits,
      s"maxDist=$maxDist must be in [0, $SimhashBits)")
    val fits = (maxDist + 1 to SimhashBits)
      .filter(m => choose(m, m - maxDist) <= MaxProbeCombos)
    if (fits.nonEmpty) fits.max else maxDist + 1
  }

  /** Candidate pairs BEFORE dedup and the hamming filter — exposed so
    * tests can assert the fan-out bound directly. `sig` is
    * `(id, simhash)` as produced by [[simhash]]. One output row per
    * (pair, colliding probe combination). See [[simhashPairs]] for the
    * blocking scheme.
    */
  private[graft] def simhashCandidates(sig: DataFrame, maxDist: Int,
      blocks: Int = 0): DataFrame = {
    val m = if (blocks > 0) blocks else simhashBlockCount(maxDist)
    require(m > maxDist && m <= SimhashBits,
      s"blocks=$m must exceed maxDist=$maxDist and not exceed $SimhashBits")
    // m near-equal blocks (sizes differ by ≤1 — m need not divide 60:
    // the pigeonhole argument only needs m disjoint blocks covering the
    // signature). The first (60 mod m) blocks carry the extra bit.
    val base = SimhashBits / m
    val rem = SimhashBits % m
    val sizes = Array.tabulate(m)(i => base + (if (i < rem) 1 else 0))
    val offsets = sizes.scanLeft(0)(_ + _)
    def block(i: Int): Column =
      shiftright(col("simhash"), offsets(i)).bitwiseAND((1L << sizes(i)) - 1)
    // One probe key per (m−maxDist)-subset of blocks: the subset's
    // block values packed big-endian into one long (< 60 bits: the
    // subset omits maxDist ≥ 1 blocks of ≥ 1 bit each; for maxDist=0
    // the full 60-bit signature itself is the key).
    val keys = (0 until m).combinations(m - maxDist).toSeq.map(s =>
      s.map(i => (block(i), sizes(i))).reduce[(Column, Int)] {
        case ((acc, _), (b, w)) => (shiftleft(acc, w).bitwiseOR(b), w)
      }._1)
    val banded = sig.select(col("id"), col("simhash"),
      posexplode(array(keys: _*)))
      .withColumnRenamed("pos", "probe_id")
      .withColumnRenamed("col", "probe_key")
    val l = banded.select(col("probe_id"), col("probe_key"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("probe_id"), col("probe_key"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("probe_id", "probe_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
  }

  /** All pairs with hamming(simhash) ≤ maxDist — the EXACT hamming-ball
    * pair set, `(id_a, id_b, hamming)` — via Manku-style permuted-block
    * probing (Manku, Jain & Das Sarma, "Detecting Near-Duplicates for
    * Web Crawling", WWW'07): split the signature into m > maxDist
    * blocks and equi-join once per (m−maxDist)-subset of blocks on the
    * subset's concatenated value. A pair within distance maxDist has at
    * most maxDist dirty blocks, hence at least one all-clean subset —
    * so recall is total, without a cross join.
    *
    * Scale — why m > maxDist+1 blocks: the minimal pigeonhole
    * (maxDist+1 chunks of 15 bits) joins on 15-bit keys, and candidate
    * generation is Σ f² over key frequencies f ≈ docs/2^15 — quadratic
    * in bucket occupancy, ~4×10⁸ pair-rows per bucket per chunk at 10⁹
    * docs with no guard. The default here (m=6 for maxDist=3) joins on
    * 30-bit keys instead: expected occupancy falls 2^15× (to ~docs/2^30
    * per key), at the price of C(6,3)=20 probe rows per doc instead
    * of 4 — fan-out linear and explicit, collision cost exponentially
    * smaller. Residual hot keys are genuine near-duplicate clusters
    * (docs agreeing on ≥30 signature bits), whose pair output is the
    * answer itself, plus AQE-handled random skew. `blocks` overrides m
    * (any value in (maxDist, [[SimhashBits]]] — blocks need not divide
    * the signature evenly); larger m widens keys further at
    * combinatorial probe cost.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3, blocks: Int = 0): DataFrame =
    simhashPairsFromSignatures(simhash(docs, idCol, textCol), maxDist, blocks)

  /** [[simhashPairs]] over precomputed `(id, simhash)` signatures. */
  def simhashPairsFromSignatures(sig: DataFrame, maxDist: Int = 3,
      blocks: Int = 0): DataFrame =
    simhashCandidates(sig, maxDist, blocks)
      .distinct()
      .filter(col("hamming") <= maxDist)

  /** EXACT word-n-gram Jaccard similarity for every pair sharing at
    * least one shingle, thresholded. Inverted-index self-join: explode
    * distinct shingles, equi-join on the shingle, count intersections,
    * then |A∪B| = |A|+|B|−|A∩B|. Integer arithmetic until the final
    * division, so the result is bit-exact against a SQL oracle.
    *
    * Scale: the join key is the shingle hash; a stop-shingle appearing
    * in f docs costs f² pair-rows for that key — capped ON BY DEFAULT by
    * dropping shingles with document frequency above `maxDf` (standard
    * trick; such shingles carry no discriminating signal). The cap
    * changes the SEMANTICS at scale: each doc's shingle set is
    * restricted to shingles appearing in ≤ maxDf docs, for BOTH the
    * intersection and the union, so two docs sharing only
    * corpus-ubiquitous boilerplate score 0 rather than melting the
    * shuffle. Pass `None` for the literal uncapped Jaccard (safe only
    * when no shingle is hot — e.g. verification-scale corpora; at
    * sf0.01's 500 docs the default cap filters nothing, which is why
    * the DuckDB oracle — which computes the uncapped form — still
    * hash-matches).
    */
  val DefaultMaxDf = 1000

  /** Shared inverted-index core of [[ngramJaccardPairs]] and
    * [[containmentPairs]]: one row per doc pair sharing ≥ 1 surviving
    * shingle — (id_a, id_b, inter, sz_a, sz_b), id_a < id_b. Any fix
    * to the candidate generator (maxDf semantics, hash keying, the
    * pair normalization) lands once, for both measures.
    *
    * Joins on the 64-bit shingle hash, not the shingle string: the
    * self-join shuffle then carries 8-byte keys instead of ~n-word
    * strings. A 2^-64 hash collision could overcount one intersection
    * cell — immaterial against exact-set semantics at any real scale.
    */
  private def shingleIntersections(docs: DataFrame, idCol: String,
      textCol: String, n: Int, maxDf: Option[Int]): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.shingleHashes(
        docs.sparkSession, col(textCol), n)).as("g"))
    val withDf = dropStopShingles(sh, maxDf)
    val sizes = withDf.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = withDf.select(col("g"), col("id").as("id_a"))
    val b = withDf.select(col("g"), col("id").as("id_b"))
    a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sz", "sz_b"), Seq("id_b"))
  }

  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    shingleIntersections(docs, idCol, textCol, n, maxDf)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** EXACT n-gram CONTAINMENT join — the asymmetric sibling of
    * [[ngramJaccardPairs]]: `C(A→B) = |A∩B| / |A|`, thresholded on the
    * LARGER direction. Containment is the measure for SUB-DOCUMENT
    * duplication — a short document wholly quoted inside a long one
    * scores C(short→long) ≈ 1 while its Jaccard (|A∩B|/|A∪B| ≈
    * |A|/|B|) can sit far below any usable threshold, so Jaccard-only
    * dedup ships the quote twice (the failure mode containment-based
    * corpus dedup à la CCNet/Dolma targets). Same inverted-index
    * self-join core, same hash-keyed shuffle, same `maxDf` stop-shingle
    * posture and semantics caveat as [[ngramJaccardPairs]]; integer
    * arithmetic until the final divisions, so bit-exact against a SQL
    * oracle.
    *
    * @return (id_a, id_b, cont_a, cont_b, containment): containment =
    *         max(cont_a, cont_b) ≥ threshold, id_a < id_b.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8,
      maxDf: Option[Int] = Some(DefaultMaxDf)): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    shingleIntersections(docs, idCol, textCol, n, maxDf)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast(DoubleType) / col("sz_a").cast(DoubleType))
          .as("cont_a"),
        (col("inter").cast(DoubleType) / col("sz_b").cast(DoubleType))
          .as("cont_b"))
      .withColumn("containment", greatest(col("cont_a"), col("cont_b")))
      .filter(col("containment") >= threshold)
  }

  /** Prefix-filtered exact Jaccard join — PPJoin-style (Xiao, Wang,
    * Lin, Yu, "Efficient Similarity Joins for Near Duplicate
    * Detection", WWW 2008). Same EXACT output as
    * [[ngramJaccardPairs]], different candidate generator: instead of
    * indexing every shingle of every doc, each doc indexes only its
    * PREFIX — the first `|x| − ⌈θ·|x|⌉ + 1` shingles under a global
    * rarest-first ordering (ascending corpus document frequency, hash
    * tiebreak). The prefix-filtering principle guarantees recall 1.0:
    * two sets with Jaccard ≥ θ must overlap in ≥ θ·max(|x|,|y|)
    * elements, so they cannot BOTH push their entire shared region
    * past a prefix of that length.
    *
    * Why this is the scale path next to the maxDf cap: the inverted
    * index shrinks to a (1−θ) fraction of positions, and — because
    * the ordering is rarest-first — the positions that survive are
    * precisely the LOW-df shingles, so hot boilerplate shingles land
    * at the back of every doc and almost never enter the index at
    * all. Candidate volume per shingle is df_prefix², which the
    * ordering drives toward 1, without changing the SEMANTICS the
    * way a df cap does (capped docs lose hot shingles from the union
    * too; here the final Jaccard is computed over the FULL sets).
    * The length filter (θ·|x| ≤ |y| ≤ |x|/θ) prunes candidates at
    * join time before the verify stage ever sees them.
    *
    * Verification joins candidates back to per-doc shingle-set
    * arrays (`collect_set` — bounded by doc length, not corpus size)
    * and scores `array_intersect` inside codegen; no second inverted
    * index pass. Float guard: prefix length and length filter use a
    * 1e-9 slack so an exact θ·|x| landing on an ulp never SHORTENS a
    * prefix or drops a legal candidate (slack only ever admits an
    * extra candidate, which verify then scores exactly).
    */
  def prefixJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Int] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      "threshold must be in (0, 1]")
    val sh = docs.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.shingleHashes(
        docs.sparkSession, col(textCol), n)).as("g"))
    val kept = dropStopShingles(sh, maxDf)
    val dfs = kept.groupBy("g").agg(count(lit(1)).as("df"))
    val byDoc = Window.partitionBy("id")
    val ranked = kept.join(dfs, Seq("g"))
      .withColumn("sz", count(lit(1)).over(byDoc))
      .withColumn("rk", row_number().over(
        byDoc.orderBy(col("df").asc, col("g").asc)))
    val prefix = ranked
      .filter(col("rk") <=
        col("sz") - ceil(lit(threshold) * col("sz") - lit(1e-9)) + 1)
      .select(col("g"), col("id"), col("sz"))
    val a = prefix.toDF("g", "id_a", "sz_a")
    val b = prefix.toDF("g", "id_b", "sz_b")
    val cands = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .filter(col("sz_b") >= lit(threshold) * col("sz_a") - lit(1e-9) &&
        col("sz_a") >= lit(threshold) * col("sz_b") - lit(1e-9))
      .select("id_a", "id_b").distinct()
    val sets = kept.groupBy("id")
      .agg(collect_set(col("g")).as("gs"), count(lit(1)).as("sz"))
    cands
      .join(sets.toDF("id_a", "gs_a", "sz_a"), Seq("id_a"))
      .join(sets.toDF("id_b", "gs_b", "sz_b"), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("gs_a"), col("gs_b")))
        .cast(LongType))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Edit-distance similarity join — ALL pairs of distinct values of
    * `strCol` within Levenshtein distance `maxDist`, EXACT (recall
    * 1.0), via Ed-Join-style prefix filtering (Xiao, Wang, Lin,
    * "Ed-Join: an efficient algorithm for similarity joins with edit
    * distance constraints", VLDB 2008). The typo/near-spelling dedup
    * for keys, names, and titles, next to the token-set families
    * ([[ngramJaccardPairs]]) that can't see character-level edits.
    *
    * Why it scales: `ed(x,y) ≤ d` implies the q-gram multisets share
    * ≥ max(|Gx|,|Gy|) − q·d entries (one edit destroys ≤ q grams), so
    * under ANY common total order the first `q·d + 1` grams of each
    * string must intersect (prefix-filtering principle). Each string
    * therefore indexes only its `q·d + 1` RAREST grams (ascending
    * corpus frequency, hash tiebreak) — a constant-width inverted
    * index regardless of string length, with exactly the low-df grams
    * surviving, so candidate volume per gram stays near 1. The length
    * filter `||x|−|y|| ≤ d` prunes at join time; every candidate is
    * verified with the banded `levenshtein(x, y, maxDist)` (O(len·d),
    * −1 above the threshold — never the full DP matrix).
    *
    * Strings shorter than `q·(d+1)` can fall below the count bound
    * (they may share ZERO grams with a legal partner of similar
    * length), so short×short pairs route through a length-banded
    * equi-join instead (bands of width d+1; a legal pair's bands differ
    * by ≤ 1) — shuffle-partitioned, never driver-broadcast, so millions
    * of distinct short values cannot OOM the build side — and are still
    * levenshtein-verified. Short×long pairs are safe in the index path:
    * the length filter forces the short side to `≥ q(d+1) − d ≥ q`,
    * where the bound gives ≥ 1 shared gram.
    *
    * @return (s_a, s_b, dist) with s_a < s_b and 1 ≤ dist ≤ maxDist.
    */
  def editDistancePairs(df: DataFrame, strCol: String, maxDist: Int = 2,
      q: Int = 2): DataFrame = {
    require(maxDist >= 1, "maxDist must be at least 1")
    require(q >= 1, "q must be at least 1")
    val strs = df.select(col(strCol).cast(StringType).as("s"))
      .filter(col("s").isNotNull).distinct()
      .withColumn("len", length(col("s")))
    val shortBound = q * (maxDist + 1)
    val short = strs.filter(col("len") < shortBound)
    // short×short routes through a LENGTH-BANDED equi-join, not a
    // broadcast nested loop: "constant-sized under a fixed alphabet"
    // fails on real key/name columns (millions of distinct short values
    // → broadcast OOM). Bands of width maxDist+1 mean a legal pair
    // (||a|−|b|| ≤ maxDist) has band ids differing by ≤ 1; the right
    // side indexes under band−1, band, AND band+1, so EITHER orientation
    // of a pair meets on the left string's own band — required because
    // the s_a < s_b normalization below keeps only one orientation and
    // it is not always the one with the larger band. The residual cost
    // is the true short×short candidate volume itself — irreducible at
    // recall 1.0, since ed ≤ d guarantees no shared q-gram below
    // q·(d+1).
    val band = (col("len") / lit(maxDist + 1)).cast(LongType)
    val shortA = short.select(col("s").as("s_a"), col("len").as("len_a"),
      band.as("bk"))
    val shortB = short.select(col("s").as("s_b"), col("len").as("len_b"),
      explode(array(band - lit(1L), band, band + lit(1L))).as("bk"))
    val shortPairs = shortA.join(shortB, Seq("bk"))
      .filter(col("s_a") < col("s_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist)
      .select("s_a", "s_b").distinct()
    // positional gram multiset (occurrences, not distinct — the q·d+1
    // prefix is over multiset entries), hashed to 8-byte join keys
    val grams = strs.filter(col("len") >= q)
      .select(col("s"), col("len"), explode(expr(
        s"transform(sequence(1, len - ${q - 1}), p -> substring(s, p, $q))"))
        .as("gram"))
      .select(col("s"), col("len"), xxhash64(col("gram")).as("g"))
    val dfs = grams.groupBy("g").agg(count(lit(1)).as("df"))
    val pref = grams.join(dfs, Seq("g"))
      .withColumn("rk", row_number().over(
        Window.partitionBy("s").orderBy(col("df").asc, col("g").asc)))
      .filter(col("rk") <= q * maxDist + 1)
      .select("g", "s", "len")
    val longPairs = pref.toDF("g", "s_a", "len_a")
      .join(pref.toDF("g", "s_b", "len_b"), Seq("g"))
      .filter(col("s_a") < col("s_b") &&
        abs(col("len_a") - col("len_b")) <= maxDist &&
        greatest(col("len_a"), col("len_b")) >= shortBound)
      .select("s_a", "s_b").distinct()
    // the two candidate sets are disjoint by the max-length split
    shortPairs.union(longPairs)
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b"), maxDist).cast(IntegerType))
      .filter(col("dist") >= 1)
  }

  /** MOSS match step over [[TextStats.winnowing]] fingerprints:
    * candidate pairs sharing at least `minShared` DISTINCT selected
    * fingerprints — the GUARANTEED near-dup candidate generator next
    * to the probabilistic MinHash family: any two documents sharing a
    * run of ≥ w+k−1 words share ≥ 1 fingerprint by construction, so
    * `minShared = 1` has perfect recall above that run length, while
    * the winnowing thinning (expected 2/(w+1) of gram positions)
    * shrinks the inverted-index join ~(w+1)/2 × on BOTH sides vs the
    * all-gram index of [[ngramJaccardPairs]]. `maxDf` drops
    * corpus-ubiquitous fingerprints (boilerplate headers) exactly as
    * the n-gram index does — same hot-key posture, same broadcast
    * anti-join.
    */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      maxDf: Option[Int] = Some(DefaultMaxDf),
      seed: Long = 42L): DataFrame =
    winnowPairsReleasable(docs, idCol, textCol, k, w, minShared, maxDf,
      seed)._1

  /** [[winnowPairs]] plus a RELEASE HANDLE for the persisted
    * fingerprint index — for library callers outside the
    * harness's `clearCache()` discipline (the Verify/Bench mains clear
    * between queries; a long-lived session calling the bare operator
    * would otherwise pin the MEMORY_AND_DISK blocks for its lifetime).
    * Consume the result, then `release()`: the frame stays valid and
    * recomputes from source if re-executed afterwards.
    */
  def winnowPairsReleasable(docs: DataFrame, idCol: String,
      textCol: String,
      k: Int = 3, w: Int = 4, minShared: Int = 2,
      maxDf: Option[Int] = Some(DefaultMaxDf),
      seed: Long = 42L): (DataFrame, () => Unit) = {
    require(minShared >= 1, "minShared must be at least 1")
    // PERSIST the fingerprint index: three downstream branches consume
    // it (the hot-fp df aggregate, and both self-join sides), and
    // without a materialization each re-runs the full corpus
    // fingerprint pipeline (gram build + hash + window) — a 3× corpus
    // scan that IS the scale bug at 100 TB. The index is the small
    // artifact here: winnowing thins to ~2/(w+1) of gram positions and
    // the distinct collapses repeats, so it is orders of magnitude
    // under the exploded gram set (the thing one must NOT persist).
    // MEMORY_AND_DISK: spills, never recomputes. Blocks are released
    // by clearCache()/unpersist like any cached index; an ingest
    // pipeline would keep this index as a table instead (see
    // [[shingleDocFreq]]'s incremental-maintenance note).
    // One explicit exchange on the JOIN key before the distinct: a
    // hash partitioning on g satisfies the (id, g) distinct (subset
    // rule), the hot-fp df aggregate (on g), AND both self-join sides
    // (on g) — so the cached index is shuffled ONCE and every
    // downstream consumer reads it co-partitioned, where the naive
    // plan pays four index-sized exchanges. Explicit count for the
    // same AQE-coalesce reason as in [[TextStats.winnowing]].
    val fp = TextStats.winnowing(docs, idCol, textCol, k, w, seed)
      .select(col(idCol).as("id"), col("fp").as("g"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col("g"))
      .distinct() // a fp selected at several positions counts once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val kept = dropStopShingles(fp, maxDf)
    val a = kept.select(col("g"), col("id").as("id_a"))
    val b = kept.select(col("g"), col("id").as("id_b"))
    val pairs = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared_fps"))
      .filter(col("shared_fps") >= minShared)
    (pairs, () => fp.unpersist(blocking = false): Unit)
  }

  /** Connected components over a duplicate-pair set — the alternating
    * LARGE-STAR / SMALL-STAR algorithm (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14): each round rewires
    * the edge set toward a forest of stars rooted at component minima;
    * at the fixpoint every node points directly at its component's
    * minimum member (the natural representative). A training-data
    * pipeline prunes by CLUSTER, not by pair list — A~B and B~C must
    * collapse to one surviving document even though (A,C) was never
    * emitted as a pair.
    *
    * Why star-contraction rather than hash-min label propagation (the
    * round-≤4 internals): propagation needs one round PER HOP of
    * component diameter — an adversarially chained near-dup corpus
    * (doc₁~doc₂~…~docₙ, common with templated spam) needs n rounds or
    * dies on the iteration budget. Star contraction halves path
    * lengths every alternation, converging in O(log n) rounds on ANY
    * graph shape, with the same per-round cost profile: two grouped
    * min-aggregates + two equi-joins, all hash-partitioned on node id,
    * map-side combined.
    *
    * Edges are kept in canonical (larger, smaller) orientation:
    *   - large-star: for each node u over its full neighborhood N(u),
    *     m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
    *   - small-star: for each node a over its SMALLER neighbors
    *     N⁻(a), m = min(N⁻(a)); emit (a, m) and (b, m) for
    *     b ∈ N⁻(a) − {m}.
    * Convergence = the canonical edge set reaches a fixpoint; each
    * round's frame is checkpointed to truncate the growing lineage
    * (the classic iterative-Spark trap).
    *
    * Checkpoint mode — `checkpointDir`:
    *   - `Some(dir)`: RELIABLE checkpoints under `dir` (the cluster
    *     setting): every round survives executor loss, and NO
    *     BlockManager storage blocks are held at any point — the frames
    *     read back from checkpoint files. The caller owns `dir`'s
    *     lifecycle (delete it once the result is consumed).
    *   - `None` (default, interactive/local): `localCheckpoint` —
    *     fastest, but executor-loss-fragile, so not for long cluster
    *     jobs. Every intermediate round's blocks are unpersisted before
    *     returning; the blocks backing the RETURNED frame are released
    *     by the context cleaner once the frame is unreferenced
    *     (`Dataset.unpersist` only touches the SQL cache, not
    *     checkpoint blocks — callers needing a block-free session at a
    *     deterministic point should pass `checkpointDir`).
    *
    * Returns `(id, comp)` for every node appearing in a non-self pair
    * (a pair (x, x) carries no connectivity and is ignored).
    *
    * Small graphs — `localEdgeLimit`: when the canonical edge set is
    * metadata-sized (≤ the cap, default [[LocalEdgeLimit]]) and ids
    * are atomically ordered, the labels come from a driver union-find
    * instead — identical output (ExtSpec asserts both paths), none of
    * the checkpoint machinery. Pass 0 to force the distributed loop.
    */
  // —————————————————————————— duplicated spans (substring-level dedup)

  /** Every `window`-token sliding window of every document, keyed for
    * frequency counting: `(doc_id, i, k)` with `i` the 0-based token
    * position and `k` either a 60-bit portable md5 hash of the window
    * text (`hashed=true` — 8-byte shuffle keys, the at-scale default)
    * or the window text itself (`hashed=false` — collision-free
    * verification mode; asserted equivalent on the test corpus).
    * Positions are NOT distinct-ed: self-repetition inside one
    * document is duplication evidence too (Lee et al.'s definition).
    */
  private def windowKeys(docs: DataFrame, idCol: String, textCol: String,
      window: Int, hashed: Boolean): DataFrame = {
    val pos = docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_toks"))
      .filter(size(col("_toks")) >= window)
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(0), size(col("_toks")) - window)).as("i"))
      .select(col("doc_id"), col("i"),
        concat_ws(" ", slice(col("_toks"), col("i") + 1, lit(window))).as("_wt"))
    pos
      .withColumn("k",
        if (hashed) graft.functions.PortableHash.h60("span", 0, col("_wt"))
        else col("_wt"))
      .select("doc_id", "i", "k")
  }

  /** Merge window START positions into maximal spans per document
    * (gaps-and-islands over `[i, i+window)` intervals): input
    * `(doc_id, i)` plus any `extraKeys`, output `(doc_id,
    * extraKeys…, span_start, span_end, n_windows)` with `span_end`
    * exclusive. The window function is partitioned by `(doc_id,
    * extraKeys…)` — never a global sort.
    */
  private def windowSpans(hits: DataFrame, window: Int,
      extraKeys: Seq[String] = Nil): DataFrame = {
    val keys = "doc_id" +: extraKeys
    val ws = Window.partitionBy(keys.map(col): _*).orderBy("i")
    val prevEnd = max(col("i") + window)
      .over(ws.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("_new",
        when(prevEnd.isNull || col("i") > prevEnd, 1).otherwise(0))
      .withColumn("_isl",
        sum(col("_new")).over(ws.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy((keys :+ "_isl").map(col): _*)
      .agg(min("i").as("span_start"),
        (max(col("i")) + lit(window)).as("span_end"),
        count(lit(1)).as("n_windows"))
      .select((keys ++ Seq("span_start", "span_end", "n_windows"))
        .map(col): _*)
  }

  /** Duplicated-span inventory — the distributed analog of EXACT
    * SUBSTRING deduplication (Lee et al. 2021, "Deduplicating Training
    * Data Makes Language Models Better"): every maximal token span all
    * of whose `window`-token substrings occur at least `minDf` times
    * corpus-wide, as `(doc_id, span_start, span_end, n_windows)`
    * (token positions, `span_end` exclusive). Spans of length ≥
    * `window` tokens are found exactly; shorter repeats are invisible
    * by construction (the paper's min-match-length parameter).
    *
    * Where the paper builds a monolithic suffix array, the distributed
    * formulation is rolling windows + a frequency SEMI-join — strictly
    * linear, no pair formation anywhere (contrast the pairwise dedup
    * families above): window keys (≈ one per corpus token, 8-byte
    * hashes) → hash-aggregate df counts → semi-join positions against
    * the `df ≥ minDf` keys → per-document island merge. The heaviest
    * stage shuffles O(corpus tokens) × 16 B, the same budget class as
    * the shingle index; hot boilerplate windows cost their occurrence
    * count, never occurrence². With `hashed=true` a 60-bit collision
    * can only ADD a false duplicated window (~N²/2⁶¹ expected colliding
    * pairs — ~0.4 at 10⁹ distinct windows); `hashed=false` removes
    * even that at ~8× shuffle width.
    */
  def duplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 15, minDf: Int = 2,
      hashed: Boolean = true): DataFrame = {
    require(window > 0, "window must be positive")
    require(minDf >= 2, "minDf < 2 would mark every window duplicated")
    val keyed = windowKeys(docs, idCol, textCol, window, hashed)
    val dup = keyed.groupBy("k").agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf).select("k")
    windowSpans(keyed.join(dup, Seq("k"), "left_semi")
      .select("doc_id", "i"), window)
  }

  /** Remove duplicated spans, keeping one canonical occurrence (Lee
    * et al.'s dedup step): a window occurrence is REDUNDANT when its
    * key is duplicated and its `(doc_id, i)` is not the key's global
    * minimum; a token is dropped iff every window covering it is
    * redundant (so canonical copies, unique text, and span borders
    * covered by any kept window all survive). Output `(doc_id, text,
    * n_tokens_removed)` with `text` rebuilt from surviving whitespace
    * tokens (inner whitespace normalized to single spaces — the same
    * normalization every hash in this module applies).
    *
    * Plan shape: the same linear window/df stages as
    * [[duplicatedSpans]]; kept and redundant occurrences are
    * island-merged in ONE `(doc_id, keep)`-partitioned window pass
    * and pivoted into two per-document interval lists (bounded by
    * document length) in ONE aggregation, joined back once and
    * applied with a codegen'd higher-order `filter` over the token
    * array — three source scans total, no explode of (token × window)
    * pairs, no driver participation.
    */
  def stripDuplicatedSpans(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 15, minDf: Int = 2,
      hashed: Boolean = true): DataFrame = {
    require(window > 0, "window must be positive")
    require(minDf >= 2, "minDf < 2 would mark every window duplicated")
    val keyed = windowKeys(docs, idCol, textCol, window, hashed)
    val own = keyed.groupBy("k").agg(count(lit(1)).as("_df"),
      min(struct(col("doc_id"), col("i"))).as("_o"))
    val st = keyed.join(own, Seq("k"))
      .withColumn("_keep", col("_df") < minDf ||
        (col("_o.doc_id") === col("doc_id") && col("_o.i") === col("i")))
    // one island pass partitioned by (doc_id, _keep); collect_list
    // skips the null branch of `when`, so one aggregation yields both
    // interval lists
    val se = struct(col("span_start").as("s"), col("span_end").as("e"))
    val iv = windowSpans(st.select("doc_id", "i", "_keep"), window,
        extraKeys = Seq("_keep"))
      .groupBy("doc_id")
      .agg(collect_list(when(!col("_keep"), se)).as("_red"),
        collect_list(when(col("_keep"), se)).as("_kep"))
    val covers = (arr: Column, j: Column) =>
      coalesce(exists(arr, iv => j >= iv("s") && j < iv("e")), lit(false))
    docs.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("_w"))
      .join(iv, Seq("doc_id"), "left")
      .withColumn("_w2", filter(col("_w"), (_, j) =>
        !(covers(col("_red"), j) && !covers(col("_kep"), j))))
      .select(col("doc_id"), concat_ws(" ", col("_w2")).as("text"),
        (size(col("_w")) - size(col("_w2"))).as("n_tokens_removed"))
  }

  // ——————————————————————— line-level exact dedup (CCNet / RefinedWeb)

  /** Line occurrences of a corpus: one row per physical line with its
    * 0-based position and whitespace-trimmed form — shared plumbing of
    * [[duplicatedLines]] / [[stripDuplicatedLines]].
    */
  private def lineOccurrences(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "_raw")))
      .withColumn("line", trim(col("_raw")))

  /** Corpus-duplicated line inventory — LINE-level exact deduplication
    * (the boilerplate detector of CCNet's paragraph/line hashing and
    * RefinedWeb's line-wise filtering): every trimmed line of at least
    * `minChars` characters occurring in at least `minDf` DISTINCT
    * documents, with its document frequency and total occurrence
    * count. The line-structured complement of [[duplicatedSpans]]
    * (which needs no line structure but pays a rolling window per
    * token): the unit here is the physical line and the whole op is
    * one explode + one two-phase hash aggregate — no window
    * functions, no pair formation; the shuffle carries each line once
    * per occurrence, the same budget class as writing the corpus.
    */
  def duplicatedLines(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 2, minChars: Int = 5): DataFrame = {
    require(minDf >= 2, "minDf < 2 would mark every line duplicated")
    lineOccurrences(docs, idCol, textCol)
      .filter(length(col("line")) >= minChars)
      .groupBy("line")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDf)
  }

  /** Line-level dedup applied — remove EVERY occurrence of each
    * corpus-duplicated line (boilerplate semantics: a nav bar
    * repeated across a site should vanish everywhere — deliberately
    * unlike the keep-one-canonical contract of
    * [[stripDuplicatedSpans]], whose unit is content, not chrome).
    * Lines shorter than `minChars` after trimming never count toward
    * duplication and never drop. Output `(doc_id, text,
    * n_lines_removed)`, `text` rebuilt from surviving lines in order
    * (intra-line whitespace preserved — only whole lines are
    * removed).
    *
    * Plan: explode → distinct-doc df count on the 60-bit portable
    * line hash (8-byte shuffle keys; `hashed=false` shuffles the full
    * line text and removes even the ~N²/2⁶¹ false-drop chance) →
    * semi-join occurrences against the duplicated key set → per-doc
    * drop-position collect (bounded by lines-per-doc) → one codegen'd
    * higher-order `filter` rebuild. Same linear budget class as the
    * span strip.
    */
  def stripDuplicatedLines(docs: DataFrame, idCol: String, textCol: String,
      minDf: Int = 2, minChars: Int = 5,
      hashed: Boolean = true): DataFrame = {
    require(minDf >= 2, "minDf < 2 would mark every line duplicated")
    val occ = lineOccurrences(docs, idCol, textCol)
      .filter(length(col("line")) >= minChars)
      .withColumn("k",
        if (hashed) graft.functions.PortableHash.h60("line", 0, col("line"))
        else col("line"))
    val dup = occ.groupBy("k")
      .agg(countDistinct(col("doc_id")).as("_df"))
      .filter(col("_df") >= minDf).select("k")
    val drops = occ.join(dup, Seq("k"), "left_semi")
      .groupBy("doc_id").agg(collect_list(col("pos")).as("_drop"))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("_text"))
      .join(drops, Seq("doc_id"), "left")
      .withColumn("_ls", split(col("_text"), "\n"))
      .withColumn("_kept", filter(col("_ls"), (_, j) =>
        !coalesce(array_contains(col("_drop"), j), lit(false))))
      .select(col("doc_id"),
        concat_ws("\n", col("_kept")).as("text"),
        (size(col("_ls")) - size(col("_kept"))).as("n_lines_removed"))
  }

  /** Edge-count cutoff below which [[connectedComponents]] solves on
    * the driver: 100k canonical edges ≈ a few MB collected — firmly in
    * the metadata-sized-collect regime (same budget class as the
    * affected-partition and centroid collects), where ~10 distributed
    * star rounds of 4 shuffles each are pure scheduling overhead. A
    * 100 TB dedup pass whose pair set exceeds this stays on the
    * distributed path automatically; the count that decides is
    * computed on the CANONICAL DISTINCT edge set, which the loop needs
    * anyway for its first fixpoint test.
    */
  val LocalEdgeLimit = 100000L

  /** Driver union-find (path-halving + union-by-attachment, then
    * per-component min labeling — the same (node → component-min)
    * contract as the distributed fixpoint).
    */
  private def localComponents(edges: Array[(Any, Any)]): Seq[(Any, Any)] = {
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) {
        parent(r) = parent(parent(r)) // path halving
        r = parent(r)
      }
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    // label every component by its MINIMUM member, under the SAME
    // ordering least()/min use: for strings that is UTF-8 BINARY
    // order, which diverges from String.compareTo's UTF-16 code-unit
    // order on supplementary characters — compare bytes, or the two
    // execution paths could pick different representatives
    val cmp = (x: Any, y: Any) => (x, y) match {
      case (a: String, b: String) =>
        java.util.Arrays.compareUnsigned(
          a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
      case _ => x.asInstanceOf[Comparable[Any]].compareTo(y) < 0
    }
    val minOf = scala.collection.mutable.HashMap.empty[Any, Any]
    parent.keys.foreach { n =>
      val r = find(n)
      minOf.get(r) match {
        case Some(m) => if (cmp(n, m)) minOf(r) = n
        case None    => minOf(r) = n
      }
    }
    parent.keys.map(n => n -> minOf(find(n))).toSeq
  }

  def connectedComponents(pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 64, checkpointDir: Option[String] = None,
      localEdgeLimit: Long = LocalEdgeLimit): DataFrame = {
    val sc = pairs.sparkSession.sparkContext
    val reliable = checkpointDir.isDefined
    // setCheckpointDir is session-global state: remember the previous
    // dir and restore it on exit so this call doesn't silently redirect
    // unrelated rdd.checkpoint() users to our scratch dir
    val prevCheckpointDir = sc.getCheckpointDir
    checkpointDir.foreach(sc.setCheckpointDir)
    // local-checkpointed frames whose blocks this call must release
    val tracked = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def cp(df: DataFrame): DataFrame =
      if (reliable) {
        // eager checkpoint runs a SECOND job to write the files; a
        // transient persist makes that job read the first job's cache
        // instead of recomputing the round, and is dropped immediately
        val cached = df.persist()
        try cached.checkpoint() finally cached.unpersist(blocking = false)
      } else { val c = df.localCheckpoint(); tracked += c; c }
    // the cp'd frame backing the returned labels — excluded from release
    var keep: DataFrame = null
    try {
      // the pair lineage (often an expensive dedup join) appears twice
      // in the canonicalized edge list — cache it for the one job that
      // materializes the edge checkpoint, then drop it
      val pairsCached = pairs.persist()
      // canonical orientation (big, small); self-pairs dropped
      var edgesCp =
        try cp(pairsCached.select(
          greatest(col(aCol), col(bCol)).as("big"),
          least(col(aCol), col(bCol)).as("small"))
          .filter(col("big") =!= col("small"))
          .distinct())
        finally pairsCached.unpersist(blocking = false)
      var edges = edgesCp

      // Small-graph fast path: the canonical edge count is needed for
      // the first fixpoint test anyway; when it is metadata-sized and
      // the id type is atomic (natural ordering == least()/greatest()),
      // solve with a driver union-find instead of ~log2(n) rounds of
      // 4 shuffles each. The distributed star loop below is byte-for-
      // byte the same result (asserted in ExtSpec) and takes over
      // automatically the moment a corpus's pair set outgrows the cap.
      val initialCount = edges.count()
      val idType = edges.schema("small").dataType
      val localizable = initialCount <= localEdgeLimit && (idType match {
        case _: org.apache.spark.sql.types.NumericType => true
        case org.apache.spark.sql.types.StringType     => true
        case _                                          => false
      })
      if (localizable) {
        val collected = edges.collect().map(r => (r.get(0), r.get(1)))
        if (!reliable) { releaseLocalCheckpoint(edgesCp); tracked -= edgesCp }
        val labels = localComponents(collected)
        val schema = StructType(Seq(
          StructField("id", idType), StructField("comp", idType)))
        import scala.jdk.CollectionConverters._
        return pairs.sparkSession.createDataFrame(
          labels.map { case (n, m) =>
            org.apache.spark.sql.Row(n, m) }.asJava, schema)
      }

      def largeStar(e: DataFrame): DataFrame = {
        val sym = e.select(col("big").as("u"), col("small").as("v"))
          .union(e.select(col("small").as("u"), col("big").as("v")))
        val m = sym.groupBy("u")
          .agg(least(min(col("v")), col("u")).as("m"))
        // v > u ≥ m ⇒ output is canonical (big=v, small=m)
        sym.join(m, Seq("u"))
          .filter(col("v") > col("u"))
          .select(col("v").as("big"), col("m").as("small"))
          .distinct()
      }

      def smallStar(e: DataFrame): DataFrame = {
        // canonical edges already orient big → strictly-smaller nbrs
        val m = e.groupBy("big").agg(min(col("small")).as("m"))
        val withM = e.join(m, Seq("big"))
        withM.select(col("big"), col("m").as("small"))
          .union(withM.filter(col("small") =!= col("m"))
            .select(col("small").as("big"), col("m").as("small")))
          .distinct()
      }

      var iter = 0
      var converged = false
      var prevCount = initialCount // carried across rounds: next.count()
                                   // becomes the next edges.count()
      while (iter < maxIter && !converged) {
        val next = cp(smallStar(largeStar(edges)))
        // fixpoint test: equal cardinality + no edge outside the old
        // set ⇒ identical sets (both sides are distinct)
        val edgeCount = if (prevCount >= 0) prevCount else edges.count()
        val nextCount = next.count()
        converged = nextCount == edgeCount &&
          next.exceptAll(edges).limit(1).isEmpty
        prevCount = nextCount
        // the superseded round's blocks are dead the moment `next` is
        // materialized (checkpointing is eager) — release them now
        // rather than accumulating one round-sized block set per
        // iteration for the life of the loop
        if (!reliable) {
          releaseLocalCheckpoint(edgesCp)
          tracked -= edgesCp
        }
        edgesCp = next
        edges = next
        iter += 1
      }
      // Silent unconvergence would under-merge clusters (multiple
      // "representatives" per true component) — fail loudly instead.
      // Measured composite rounds to convergence on path graphs (the
      // worst case): ~log2(n) + 2 — 501 nodes → 10, 100k → 18,
      // 1M → 21 — so the 64 default covers components beyond 2^60
      // nodes; hitting it means something is genuinely wrong.
      if (!converged)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter star " +
            "rounds; raise maxIter")
      // fixpoint edges are (node → component-min); add the roots
      val labels = cp(edges.select(col("big").as("id"), col("small").as("comp"))
        .union(edges.select(col("small").as("id"), col("small").as("comp")))
        .distinct())
      if (!reliable) {
        releaseLocalCheckpoint(edgesCp)
        tracked -= edgesCp
      }
      keep = labels
      labels
    } finally {
      // releases edges and, on an exception path, every surviving round
      tracked.foreach(f => if (f ne keep) releaseLocalCheckpoint(f))
      if (reliable) prevCheckpointDir.foreach(sc.setCheckpointDir)
    }
  }

  /** Cluster-prune a corpus: keep each duplicate cluster's
    * representative (minimum id) plus every document that belongs to no
    * pair. The standard final step of a dedup pass — `pairs` typically
    * comes from [[ngramJaccardPairs]] or a verified approximate family.
    */
  def pruneDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "id_a", bCol: String = "id_b",
      checkpointDir: Option[String] = None): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol,
      checkpointDir = checkpointDir)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Quality-aware cluster pruning — keep each duplicate cluster's
    * BEST member by `score` instead of [[pruneDuplicates]]'s arbitrary
    * minimum id (the SlimPajama/FineWeb keep-one-per-cluster step with
    * a selection function: longest document, highest quality score,
    * freshest crawl…). Ties break on smallest id, so the survivor set
    * is deterministic. Documents in no pair always survive.
    *
    * Plan shape: the same star-contraction components as every cluster
    * consumer, one inner join to attach scores to CLUSTERED docs only
    * (singletons — the overwhelming majority of a deduped corpus —
    * never enter the shuffle), a per-component window (partitioned by
    * cluster label, never global), and one anti-join back.
    */
  def pruneDuplicatesByScore(docs: DataFrame, pairs: DataFrame,
      idCol: String, score: Column,
      aCol: String = "id_a", bCol: String = "id_b",
      checkpointDir: Option[String] = None): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol,
      checkpointDir = checkpointDir)
    val scored = docs.select(col(idCol), score.as("_score"))
      .join(comps.withColumnRenamed("id", idCol), Seq(idCol))
    val w = Window.partitionBy("comp")
      .orderBy(col("_score").desc, col(idCol).asc)
    val losers = scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") =!= 1).select(col(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
