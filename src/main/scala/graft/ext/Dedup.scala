package graft.ext

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
  *   - [[simhashPairs]]: 64-bit SimHash + pigeonhole banding on 16-bit
  *     chunks for hamming-distance ≤ 3 candidate pairs (Charikar
  *     SimHash, the Google near-dup scheme).
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

  /** Near-duplicate candidate pairs via LSH banding (bands × rowsPerBand
    * = k), each verified with the signature-agreement estimate.
    * Returns `(id_a, id_b, est_jaccard)` with id_a < id_b and
    * est_jaccard ≥ threshold.
    *
    * Scale: the only shuffles are (1) explode to (band_hash → id) — a
    * key-value stream of O(docs × bands) small rows; (2) the
    * equi-self-join on band_hash — skew-safe because a band bucket only
    * contains near-identical docs; (3) pair dedup. No pairwise scan of
    * the corpus ever happens.
    */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 64, bands: Int = 16, n: Int = 3, threshold: Double = 0.7,
      seed: Long = 42L): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val rows = k / bands
    val sig = minhashSignatures(docs, idCol, textCol, k, n, seed)
      .withColumn("sig", array((0 until k).map(i => col(s"mh_$i")): _*))
      .select("id", "sig")
    val banded = sig.select(col("id"), col("sig"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(concat_ws("_",
          b +: (0 until rows).map(r => element_at(col("sig"), b * rows + r + 1)): _*)))))
      .withColumnRenamed("col", "band_hash")
      .withColumnRenamed("pos", "band_id")
    val l = banded.select(col("band_id"), col("band_hash"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val r = banded.select(col("band_id"), col("band_hash"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("band_id", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1).otherwise(null)).cast(ArrayType(IntegerType)))
          .cast(DoubleType) / lit(k.toDouble)).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash per doc: bit i is the sign of the sum over tokens of
    * (2·bit_i(hash(token)) − 1).
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("id"),
      explode(tokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(1L) * 2 - 1).as(s"bs_$i"))
    tok.groupBy("id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until 64).map(i =>
          when(col(s"bs_$i") > 0, shiftleft(lit(1L), i)).otherwise(0L))
          .reduce(_.bitwiseOR(_)).as("simhash"))
  }

  /** Candidate near-dup pairs with hamming(simhash) ≤ maxDist, via
    * pigeonhole banding: split 64 bits into (maxDist+1) chunks — any
    * pair within distance maxDist must agree on at least one full chunk,
    * so an equi-join per chunk finds all of them without a cross join.
    * Returns `(id_a, id_b, hamming)`.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks
    val sh = simhash(docs, idCol, textCol)
    val banded = sh.select(col("id"), col("simhash"),
      posexplode(array((0 until chunks).map(cI =>
        shiftright(col("simhash"), cI * bitsPer)
          .bitwiseAND((1L << bitsPer) - 1)): _*)))
      .withColumnRenamed("pos", "chunk_id")
      .withColumnRenamed("col", "chunk_val")
    val l = banded.select(col("chunk_id"), col("chunk_val"),
      col("id").as("id_a"), col("simhash").as("sh_a"))
    val r = banded.select(col("chunk_id"), col("chunk_val"),
      col("id").as("id_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk_id", "chunk_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** EXACT word-n-gram Jaccard similarity for every pair sharing at
    * least one shingle, thresholded. Inverted-index self-join: explode
    * distinct shingles, equi-join on the shingle, count intersections,
    * then |A∪B| = |A|+|B|−|A∩B|. Integer arithmetic until the final
    * division, so the result is bit-exact against a SQL oracle.
    *
    * Scale: the join key is the shingle hash; a stop-shingle appearing
    * in f docs costs f² pair-rows for that key — cap it by dropping
    * shingles with document frequency above `maxDf` (standard trick;
    * such shingles carry no discriminating signal).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5,
      maxDf: Option[Int] = None): DataFrame = {
    // Join on the 64-bit shingle hash, not the shingle string: the
    // self-join shuffle then carries 8-byte keys instead of ~n-word
    // strings. A 2^-64 hash collision could overcount one intersection
    // cell — immaterial against exact-set semantics at any real scale.
    val sh = docs.select(col(idCol).as("id"),
      explode(graft.functions.TextFunctions.shingleHashes(
        docs.sparkSession, col(textCol), n)).as("g"))
    val withDf = maxDf match {
      case Some(cap) =>
        // df per shingle is a tiny aggregate; broadcast it back.
        val df = sh.groupBy("g").agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap).select("g")
        sh.join(broadcast(df), Seq("g"), "left_semi")
      case None => sh
    }
    val sizes = withDf.groupBy("id").agg(count(lit(1)).as("sz"))
    val a = withDf.select(col("g"), col("id").as("id_a"))
    val b = withDf.select(col("g"), col("id").as("id_b"))
    val inter = a.join(b, Seq("g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("id", "id_a")
        .withColumnRenamed("sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("id", "id_b")
        .withColumnRenamed("sz", "sz_b"), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast(DoubleType) /
          (col("sz_a") + col("sz_b") - col("inter")).cast(DoubleType))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Connected components over a duplicate-pair set — iterative
    * hash-min label propagation: every node starts labeled with itself;
    * each round a node adopts the minimum label in its neighborhood;
    * fixpoint = components, and each component's label IS its minimum
    * member (the natural representative). A training-data pipeline
    * prunes by CLUSTER, not by pair list — A~B and B~C must collapse to
    * one surviving document even though (A,C) was never emitted as a
    * pair.
    *
    * Scale shape: per round, one join of the (symmetrized, distinct)
    * edge list against current labels + one min-aggregate — all
    * hash-partitioned on node id, map-side combined; `localCheckpoint`
    * each round truncates the growing lineage (the classic iterative-
    * Spark trap). Rounds needed = component diameter (near-dup clusters
    * are shallow; for adversarially long chains the alternating
    * large-star/small-star variant reduces rounds to O(log n) — the
    * loop converges-and-stops either way). Labels only ever decrease,
    * so the early-exit check (`limit(1)` on changed rows) is cheap and
    * convergence is guaranteed.
    *
    * Returns `(id, comp)` for every node appearing in `pairs`.
    */
  def connectedComponents(pairs: DataFrame,
      aCol: String = "id_a", bCol: String = "id_b",
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(pairs.select(col(bCol).as("src"), col(aCol).as("dst")))
      .distinct()
      .localCheckpoint()
    var labels = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val nbrMin = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("dst_comp")),
          Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_comp")).as("nbr_comp"))
      val next = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nbr_comp"), col("comp")))
            .as("comp"),
          (col("nbr_comp") < col("comp")).as("_changed"))
        .localCheckpoint()
      converged = next.filter(col("_changed")).limit(1).isEmpty
      labels = next.drop("_changed")
      iter += 1
    }
    // Silent unconvergence would under-merge clusters (multiple
    // "representatives" per true component) — fail loudly instead. The
    // loop may have CONVERGED on its very last round without a quiet
    // round to observe it, so probe once more before throwing.
    if (!converged) {
      val pending = edges
        .join(labels.select(col("id").as("dst"), col("comp").as("dst_comp")),
          Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("dst_comp")).as("nbr_comp"))
        .join(labels, Seq("id"))
        .filter(col("nbr_comp") < col("comp"))
      if (!pending.limit(1).isEmpty)
        throw new IllegalStateException(
          s"connectedComponents did not converge in $maxIter rounds " +
            "(component diameter exceeds the budget); raise maxIter")
    }
    labels
  }

  /** Cluster-prune a corpus: keep each duplicate cluster's
    * representative (minimum id) plus every document that belongs to no
    * pair. The standard final step of a dedup pass — `pairs` typically
    * comes from [[ngramJaccardPairs]] or a verified approximate family.
    */
  def pruneDuplicates(docs: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "id_a", bCol: String = "id_b"): DataFrame = {
    val comps = connectedComponents(pairs, aCol, bCol)
    val losers = comps.filter(col("id") =!= col("comp"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }
}
