package graft.ext

import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Similarity search over an embedding column (`Array[Float]`) — the
  * driver's `embeddings(vec_id, embedding, label)` table.
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small)
  *     query set against the full corpus; one scan, no shuffle of the
  *     corpus. This is the correctness baseline.
  *   - [[lshTopK]]: multi-table random-hyperplane (sign-LSH) bucketing —
  *     candidates are only same-bucket pairs, so the pair count scales
  *     with bucket occupancy, not corpus². This is the 100 TB path: the
  *     bucket id is a shuffle key and each bucket is a tiny local top-k.
  *
  * Dot products use the codegen'd [[graft.functions.DotProductF]]
  * kernel (Spark's `zip_with`/`aggregate` HOFs are CodegenFallback —
  * interpreted with per-element boxing; on a million-candidate join
  * that is the difference between seconds and tens of minutes). Norms
  * are precomputed per row BEFORE any join, so each candidate pair
  * costs exactly one dot product.
  */
object Similarity {

  /** Exact cosine similarity between two float-array columns — HOF
    * reference implementation (interpreted; kept as the cross-check
    * oracle for the codegen kernel in ExtSpec). Use
    * [[graft.functions.VectorFunctions.cosineF]] in hot paths.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Exact top-k nearest neighbors (cosine) for each query vector.
    * `queries` and `corpus` both carry (`idCol`, `vecCol`); a query is
    * never matched to itself. Output: (query_id, neighbor_id, cos)
    * with rank ≤ k per query.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", VectorFunctions.normF(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", VectorFunctions.normF(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        VectorFunctions.dotF(col("qv"), col("cv")) / (col("qn") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Hard-negative mining for contrastive / embedding training: for
    * each anchor, the k corpus vectors that are MOST similar while
    * staying BELOW the positive threshold `maxCos` — the negatives
    * that actually carry gradient (random negatives are trivially
    * separable; near-dups above `maxCos` are false negatives that
    * poison the loss). Exact brute-force band: same broadcast-anchors
    * × corpus-scan shape as [[bruteForceTopK]] (anchors are a small
    * curated set; the corpus is scanned once, map-only, then one
    * per-anchor top-k window), with the band filter applied BEFORE
    * the rank so the window never buffers the near-dup head. For
    * corpus-scale anchor sets swap the scorer for [[ivfTopK]]
    * oversampled then band-filtered; this exact form is the oracle
    * of that path.
    */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      maxCos: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", VectorFunctions.normF(col("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", VectorFunctions.normF(col("cv")))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        VectorFunctions.dotF(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .filter(col("cos") < maxCos)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Corpus-adaptive index sizing, used wherever a caller leaves the
    * knob at 0: a FIXED sizing parameter is a scale bug — bucket/shard
    * occupancy would grow linearly with the corpus, and the candidate
    * join quadratically in occupancy (measured: see
    * [[cosineNearDupPairs]]). One cheap `count()` job per auto-sized
    * build; pass the knob explicitly to skip it. The floors reproduce
    * the verification-scale operating points exactly, so ≤2k-vector
    * corpora (the oracle/test scale) behave identically to the
    * historical fixed defaults.
    */
  private def autoPlanes(n: Long, floor: Int): Int =
    math.max(floor,
      math.ceil(math.log(math.max(1L, n) / 64.0) / math.log(2)).toInt)

  /** FAISS guidance: nlist ≈ 4·√n (shard size ~√n/4 — both the shard
    * scan and the centroid argmin stay sublinear). Centroid collect is
    * O(nlist·dim) driver bytes — ~65 MB at 10⁹ vectors, still
    * metadata-scale.
    */
  private def autoNlist(n: Long): Int =
    math.max(16, math.ceil(4 * math.sqrt(math.max(1L, n).toDouble)).toInt)

  /** nprobe companion to [[autoNlist]]: ~1/16 of the lists, floor 4 —
    * keeps probe coverage (nprobe/nlist) constant as nlist scales.
    */
  private def autoNprobe(nlist: Int): Int =
    math.max(4, math.ceil(nlist / 16.0).toInt)

  /** Deterministic random hyperplanes: `planes` × `dim` doubles. */
  private def hyperplanes(planes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(planes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-LSH bucket id of a vector: bit p = sign(v · plane_p) — one
    * codegen'd mixed dot per plane.
    */
  def bucketOf(vec: Column, planes: Seq[Seq[Double]]): Column =
    planes.zipWithIndex.map { case (plane, p) =>
      when(VectorFunctions.dotFD(vec, lit(plane.toArray)) >= 0,
        shiftleft(lit(1), p)).otherwise(lit(0))
    }.reduce(_.bitwiseOR(_))

  /** Approximate top-k via multi-table sign-LSH (`tables` independent
    * hash tables of `planes` bits, query side additionally probing every
    * hamming-1 bucket per table). Same output shape as
    * [[bruteForceTopK]]; recall < 1 by construction (measured ≈0.7–0.9
    * on the test corpus — ExtSpec). `planes` bounds per-bucket candidate
    * cost (n/2^planes corpus rows per bucket per table); the defaults
    * are corpus-adaptive ([[autoPlanes]] with floor 6 — identical to
    * the historical 6×8 point at ≤2k vectors; extra tables buy back
    * the per-table recall each extra plane halves).
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planes: Int = 0, tables: Int = 0, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(corpus.sparkSession)
    val p = if (planes > 0) planes else autoPlanes(corpus.count(), 6)
    val t = if (tables > 0) tables else math.min(16, 8 + (p - 6))
    val allPlanes = hyperplanes(p * t, dim, seed)
    def buckets(v: Column): Column = array((0 until t).map { tI =>
      bucketOf(v, allPlanes.slice(tI * p, (tI + 1) * p))
        .bitwiseOR(lit(tI << p))
    }: _*)
    // Norms computed BEFORE the bucket explode — once per vector, not
    // once per (table × probe) replica.
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", VectorFunctions.normF(col("cv")))
      .select(col("neighbor_id"), col("cv"), col("cn"),
        explode(buckets(col("cv"))).as("bucket"))
    // Query side multi-probes each table's bucket + hamming-1 neighbors.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", VectorFunctions.normF(col("qv")))
      .select(col("query_id"), col("qv"), col("qn"),
        explode(flatten(transform(buckets(col("qv")), b =>
          array(b +: (0 until p).map(i =>
            b.bitwiseXOR(shiftleft(lit(1), i))): _*)))).as("bucket"))
    val scored = c.join(q, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        VectorFunctions.dotF(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .select("query_id", "neighbor_id", "cos").distinct()
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  /** Build a PERSISTABLE int8-quantized index over the corpus:
    * `(neighbor_id, qv: binary, q_scale: float, qn: double)` — one row
    * per vector, 4× narrower than the float column (64 bytes vs 256 at
    * dim 64), plain parquet-writable. The 100 TB shape: the float
    * embedding table is scanned ONCE to build this; every subsequent
    * coarse search scans only the quantized sidecar — a 4× cut in scan
    * IO and shuffle width for the candidate-generation stage. `qn` is
    * the norm in quantized units (scales cancel in cosine, see
    * [[graft.functions.VectorOps.dotI8]]); `q_scale` is kept for
    * callers that reconstruct raw dot products or dequantize.
    */
  def q8Build(corpus: DataFrame, idCol: String, vecCol: String): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    corpus.select(col(idCol).as("neighbor_id"),
      VectorFunctions.q8(col(vecCol)).as("qv"),
      VectorFunctions.q8Scale(col(vecCol)).as("q_scale"))
      .withColumn("qn", VectorFunctions.normI8(col("qv")))
  }

  /** Quantized retrieve-and-rerank top-k (the FAISS SQ8 flat pattern):
    *
    *   1. COARSE: score every (query, corpus) pair on int8 vectors —
    *      integer dot kernel over the 4×-narrower quantized index,
    *      keep the top `k × oversample` per query. Only ids + the
    *      coarse score ride the top-k shuffle.
    *   2. RERANK: join the surviving candidate ids back to the FLOAT
    *      corpus (touches k·oversample·|Q| rows, not the corpus) and
    *      re-score with the exact cosine; emit the exact-scored top k.
    *
    * With `oversample` ≥ 2 the int8 rounding error (≤ scale/2 per
    * element, ~0.4% of the dot at dim 64) has to push a true neighbor
    * below rank k·oversample to cost recall — measured recall 1.0 at
    * sf0.01 (ExtSpec), which is what lets the raw surface carry the
    * same value-level oracle as the exact brute-force query. Output
    * shape matches [[bruteForceTopK]]: (query_id, neighbor_id, cos,
    * rank) with the EXACT cosine.
    */
  /** Keep the per-query top `limit` by the int8 coarse score — only
    * ids + the score ride the rank exchange.
    */
  private def coarseTopIds(scored: DataFrame, limit: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("qcos").desc, col("neighbor_id").asc)
    scored.withColumn("crank", row_number().over(w))
      .filter(col("crank") <= limit)
      .select("query_id", "neighbor_id")
  }

  /** Exact-cosine rerank of `(query_id, neighbor_id)` candidates: join
    * back to the FLOAT corpus (touches only candidate rows), broadcast
    * the float queries, emit the exact-scored top k — the shared
    * second stage of every retrieve-and-rerank path.
    */
  private def rerankExact(cand: DataFrame, q: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cFloat = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("cv"))
      .withColumn("cn", VectorFunctions.normF(col("cv")))
    val qFloat = q.withColumn("qn_f", VectorFunctions.normF(col("qv_f")))
    val rescored = cand
      .join(cFloat, Seq("neighbor_id"))
      .join(broadcast(qFloat), Seq("query_id"))
      .withColumn("cos",
        VectorFunctions.dotF(col("qv_f"), col("cv")) /
          (col("qn_f") * col("cn")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  def q8TopKWithIndex(queries: DataFrame, qIndex: DataFrame,
      corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      oversample: Int = 4): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv_f"))
    val qq = q.select(col("query_id"),
      VectorFunctions.q8(col("qv_f")).as("q_qv"))
      .withColumn("q_qn", VectorFunctions.normI8(col("q_qv")))
    val coarse = qIndex.join(broadcast(qq),
      col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos",
        VectorFunctions.dotI8(col("q_qv"), col("qv")).cast("double") /
          (col("q_qn") * col("qn")))
    rerankExact(coarseTopIds(coarse, k * oversample), q, corpus,
      idCol, vecCol, k)
  }

  /** [[q8TopKWithIndex]] with the index built inline (one extra corpus
    * scan; persist [[q8Build]]'s output to amortize it across query
    * batches).
    */
  def q8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, oversample: Int = 4): DataFrame =
    q8TopKWithIndex(queries, q8Build(corpus, idCol, vecCol), corpus,
      idCol, vecCol, k, oversample)

  /** IVF (inverted-file) approximate top-k — the other scale path from
    * the brief. Coarse quantizer: `nlist` centroids picked
    * deterministically from the corpus (seeded hash order — for random
    * synthetic embeddings a k-means refinement changes recall little;
    * swap `centroids` for trained ones when the corpus has real
    * cluster structure). Corpus rows are assigned to their nearest
    * centroid (one pass, `nlist` codegen'd dots per row); queries probe
    * the `nprobe` nearest lists. Candidate cost ≈ corpus × nprobe /
    * nlist per query — the shuffle key is the list id, exactly like an
    * IVF index shard.
    */
  /** Deterministic centroid sample: nlist corpus vectors with the
    * smallest seeded hash of their id (a driver-side collect of nlist
    * small arrays — metadata-sized).
    */
  def sampleCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, seed: Long = 42L): Seq[Seq[Double]] =
    corpus
      .select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("r", pmod(xxhash64(concat(col("id").cast("string"),
        lit(s"#$seed"))), lit(1000003L)))
      .orderBy("r", "id").limit(nlist)
      .select("v").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq

  /** Rank the `n` nearest centroid list ids for a vector column (by
    * dot(v, c)/|c| — v's own norm is rank-invariant).
    */
  private def nearestLists(v: Column, n: Int,
      centroids: Seq[Seq[Double]]): Column = {
    val scored = centroids.zipWithIndex.map { case (c, i) =>
      val norm = math.sqrt(c.map(x => x * x).sum)
      struct((VectorFunctions.dotFD(v, lit(c.toArray)) / norm).as("s"),
        lit(i).as("i"))
    }
    slice(reverse(array_sort(array(scored: _*))), 1, n).getField("i")
  }

  /** Lloyd-iteration centroid training: assign each corpus vector to
    * its nearest centroid, recompute each list's element-wise mean with
    * the [[graft.functions.VectorMean]] typed Aggregator (distributed,
    * map-side combined — one groupBy per iteration), repeat. Per-iter
    * driver traffic is nlist small arrays. Lists that attract no
    * vectors keep their previous centroid.
    */
  def trainCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int, iters: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    VectorFunctions.register(corpus.sparkSession)
    val vmean = udaf(graft.functions.VectorMean,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    var cents = sampleCentroids(corpus, idCol, vecCol, nlist, seed)
    // each Lloyd iteration re-reads the vectors; cache once for the
    // training loop (released before returning)
    val vecs = corpus.select(col(vecCol).as("v")).persist()
    try for (_ <- 0 until iters) {
      val means = vecs
        .withColumn("list", element_at(nearestLists(col("v"), 1, cents), 1))
        .groupBy("list").agg(vmean(col("v")).as("m"))
        .collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq)
        .toMap
      cents = cents.zipWithIndex.map { case (old, i) =>
        means.getOrElse(i, old)
      }
    } finally vecs.unpersist()
    cents
  }

  /** Build a PERSISTABLE IVF index: `(assignments, centroids)` — both
    * plain DataFrames, so the whole index round-trips through parquet
    * (the shape an embedding pipeline maintains: build once per corpus
    * version, probe per query batch via [[ivfTopKWithIndex]] without
    * re-assigning the corpus).
    *
    *   - assignments: `(list, neighbor_id, cv, cn)` — one row per
    *     corpus vector, norm precomputed, hash-partitionable by `list`
    *     (= an IVF shard);
    *   - centroids: `(list, centroid: array<double>)` — nlist rows of
    *     driver-metadata size.
    */
  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 0, trainIters: Int = 0,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    VectorFunctions.register(spark)
    val nl = if (nlist > 0) nlist else autoNlist(corpus.count())
    val cents =
      if (trainIters > 0)
        trainCentroids(corpus, idCol, vecCol, nl, trainIters, seed)
      else sampleCentroids(corpus, idCol, vecCol, nl, seed)
    val centDf = cents.zipWithIndex
      .map { case (c, i) => (i, c.toArray) }.toDF("list", "centroid")
    val assignments = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", VectorFunctions.normF(col("cv")))
      .withColumn("list", element_at(nearestLists(col("cv"), 1, cents), 1))
    (assignments, centDf)
  }

  /** Probe a prebuilt IVF index (see [[ivfBuild]]): assigns only the
    * QUERY batch to its `nprobe` nearest lists (the centroid table is a
    * metadata-sized driver collect) and equi-joins the index on the
    * list id — per-batch cost ≈ index/nlist × nprobe rows scored,
    * independent of how the corpus was built.
    */
  /** Name-addressed, value-keyed centroid collect: a reloaded or
    * reprojected centroid table may arrive with reordered columns or
    * non-contiguous list ids (a compacted list, a SQL SELECT with
    * another column order) — positional reads would then probe the
    * WRONG shards silently. `nearestLists` ranks by POSITION in the
    * collected seq; callers map positions back through the returned
    * list ids before any join.
    */
  private def collectCentroids(
      centroidTable: DataFrame): (Seq[Int], Seq[Seq[Double]]) = {
    val rows = centroidTable.collect()
      .map(r => (r.getAs[Int]("list"),
        r.getAs[scala.collection.Seq[Double]]("centroid")))
      .sortBy(_._1)
    (rows.map(_._1).toSeq, rows.map(_._2.toSeq).toSeq)
  }

  /** Append a batch to a prebuilt IVF index WITHOUT retraining —
    * FAISS's add-after-train contract: each new vector routes to its
    * nearest EXISTING centroid (metadata-sized centroid collect +
    * map-only scoring of the batch) and the rows union onto the
    * assignment table; the centroid table is untouched. This is the
    * per-batch index maintenance an append-mostly embedding pipeline
    * runs at 100 TB — no corpus re-assignment, no Lloyd job, one
    * map-only pass over the batch. Centroids drift only if the
    * DISTRIBUTION shifts; the cadence is FAISS's build-rarely /
    * add-often: periodic [[ivfBuild]] on a corpus version bump,
    * [[ivfAppend]] in between. Routing uses the same name-addressed
    * position→list-id mapping as the probe path, so appends to a
    * RELOADED index (reordered columns, compacted list ids) route
    * identically to build-time assignment.
    *
    * Replay safety: [[ivfTopKWithIndex]] relies on each corpus row
    * living in exactly ONE list (its join skips the dedup shuffle on
    * that invariant), so a replayed batch must not duplicate ids.
    * `dedupIds=true` (default) anti-joins the batch against the index
    * on the id — a replayed append is then a no-op; the cost is one
    * id-keyed anti-join (shuffle ∝ index ids, AQE broadcasts the
    * batch side). Pass `dedupIds=false` to keep the append strictly
    * map-only when the pipeline already guarantees fresh ids (e.g.
    * ids minted from a commit sequence).
    */
  def ivfAppend(assignments: DataFrame, centroidTable: DataFrame,
      batch: DataFrame, idCol: String, vecCol: String,
      dedupIds: Boolean = true): DataFrame = {
    VectorFunctions.register(batch.sparkSession)
    val (listIds, cents) = collectCentroids(centroidTable)
    val fresh =
      if (dedupIds)
        batch.join(assignments.select(col("neighbor_id").as(idCol)),
          Seq(idCol), "left_anti")
      else batch
    val assigned = fresh
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("cn", VectorFunctions.normF(col("cv")))
      .withColumn("pos", element_at(nearestLists(col("cv"), 1, cents), 1))
      .withColumn("list", element_at(lit(listIds.toArray), col("pos") + 1))
      .drop("pos")
    assignments.unionByName(
      assigned.select(assignments.columns.toIndexedSeq.map(col): _*))
  }

  def ivfTopKWithIndex(queries: DataFrame, assignments: DataFrame,
      centroidTable: DataFrame, idCol: String, vecCol: String, k: Int,
      nprobe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    VectorFunctions.register(queries.sparkSession)
    val (listIds, cents) = collectCentroids(centroidTable)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
      .withColumn("qn", VectorFunctions.normF(col("qv")))
      .withColumn("pos", explode(nearestLists(col("qv"), nprobe, cents)))
      .withColumn("list", element_at(lit(listIds.toArray), col("pos") + 1))
      .drop("pos")
    val scored = assignments.join(q, Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos",
        VectorFunctions.dotF(col("qv"), col("cv")) / (col("qn") * col("cn")))
      // no distinct: each corpus row lives in exactly ONE list, so the
      // join cannot duplicate (query, neighbor) pairs (unlike lshTopK's
      // multi-table probing) - a dedup shuffle here would be dead work
      .select("query_id", "neighbor_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cos", "rank")
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 0, nprobe: Int = 0, trainIters: Int = 0,
      seed: Long = 42L): DataFrame = {
    val nl = if (nlist > 0) nlist else autoNlist(corpus.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val (assignments, centDf) =
      ivfBuild(corpus, idCol, vecCol, nl, trainIters, seed)
    ivfTopKWithIndex(queries, assignments, centDf, idCol, vecCol, k, np)
  }

  // ——— IVF × SQ8 composition (the FAISS `IVF…,SQ8` index shape):
  // shard by nearest-centroid list AND store int8-quantized vectors in
  // the shards — a probe reads nprobe/nlist of a 4×-narrower index,
  // the two scan-cost levers multiply. Recall is bounded by the IVF
  // probe (the quantized index holds every sharded vector); the rerank
  // emits exact cosines.

  /** Build the PERSISTABLE IVF-SQ8 index: `(qAssignments, centroids)`
    * where qAssignments = `(list, neighbor_id, qv: binary, qn)` — the
    * IVF shard layout with int8 vectors (4× narrower than
    * [[ivfBuild]]'s float shard), same parquet-roundtrip contract as
    * every other index here. Build once per corpus version, probe per
    * query batch with [[ivfQ8TopKWithIndex]].
    */
  def ivfQ8Build(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 0, trainIters: Int = 0,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    VectorFunctions.register(corpus.sparkSession)
    val (assignments, centDf) =
      ivfBuild(corpus, idCol, vecCol, nlist, trainIters, seed)
    val qAssign = assignments.select(col("list"), col("neighbor_id"),
      VectorFunctions.q8(col("cv")).as("qv"))
      .withColumn("qn", VectorFunctions.normI8(col("qv")))
    (qAssign, centDf)
  }

  /** Probe a prebuilt IVF-SQ8 index: the query batch is quantized and
    * assigned to its `nprobe` nearest lists, the quantized shards are
    * int8-coarse-scored, and the per-query top `k × oversample` ids
    * rerank against the FLOAT corpus ([[rerankExact]] — shared with
    * [[q8TopKWithIndex]]). Per-batch cost ≈ index/nlist × nprobe rows
    * int8-scored + k·oversample·|Q| float dots.
    */
  def ivfQ8TopKWithIndex(queries: DataFrame, qAssignments: DataFrame,
      centroidTable: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, nprobe: Int = 4,
      oversample: Int = 4): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    val (listIds, cents) = collectCentroids(centroidTable)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv_f"))
    val qProbe = q
      .withColumn("q_qv", VectorFunctions.q8(col("qv_f")))
      .withColumn("q_qn", VectorFunctions.normI8(col("q_qv")))
      .withColumn("pos", explode(nearestLists(col("qv_f"), nprobe, cents)))
      .withColumn("list", element_at(lit(listIds.toArray), col("pos") + 1))
      .select("query_id", "q_qv", "q_qn", "list")
    val coarse = qAssignments.join(broadcast(qProbe), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos",
        VectorFunctions.dotI8(col("q_qv"), col("qv")).cast("double") /
          (col("q_qn") * col("qn")))
    rerankExact(coarseTopIds(coarse, k * oversample), q, corpus,
      idCol, vecCol, k)
  }

  /** [[ivfQ8TopKWithIndex]] with the index built inline. */
  def ivfQ8TopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 0, nprobe: Int = 0, trainIters: Int = 0,
      oversample: Int = 4, seed: Long = 42L): DataFrame = {
    val nl = if (nlist > 0) nlist else autoNlist(corpus.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val (qAssign, centDf) =
      ivfQ8Build(corpus, idCol, vecCol, nl, trainIters, seed)
    ivfQ8TopKWithIndex(queries, qAssign, centDf, corpus, idCol, vecCol,
      k, np, oversample)
  }

  // ——— Product quantization (the FAISS `PQ` / `IVF…,PQ` family;
  // Jégou et al., TPAMI 2011). The vector is cut into `m` subspaces
  // and each subspace is vector-quantized against its own `ksub`-entry
  // codebook — a corpus vector compresses to `m` small codes (m bytes
  // of information at ksub ≤ 256: 32× smaller than float32 at dim 64 /
  // m 8) and coarse-scoring a candidate is `m` lookup-table reads
  // (asymmetric distance, [[graft.functions.PqOps.adcDot]]) instead of
  // a `d`-element dot product. This is the billion-scale memory shape:
  // the SQ8 index above is 4× smaller than float, PQ is 32×.

  /** Default subspace count: the largest divisor of `dim` that is ≤ 8
    * (dsub ≥ 8 keeps per-subspace quantization error low; FAISS's
    * common operating point for dim 64 is m=8 × dsub=8).
    */
  private def autoM(dim: Int): Int =
    (math.min(8, dim) to 1 by -1).find(dim % _ == 0).getOrElse(1)

  /** Default per-subspace codebook size: 256 (the byte-code classic),
    * clamped to n/4 so k-means has ≥4 training points per code.
    */
  private def autoKsub(n: Long): Int =
    math.min(256L, math.max(4L, n / 4)).toInt

  /** Train the PQ codebook with distributed Lloyd iterations, jointly
    * over all `m` subspaces: one [[graft.functions.PqOps.encode]] pass
    * assigns every (row, subspace) to its nearest code, a single
    * `groupBy(sub, code)` recomputes all m×ksub sub-centroid means
    * ([[graft.functions.VectorMean]], map-side combined), repeat.
    * Initialization slices `ksub` seeded-hash-sampled corpus vectors
    * (the classic data-point init, shared across subspaces). Codes
    * that attract no vectors keep their previous centroid. Per-iter
    * driver traffic is m×ksub small arrays — metadata-sized.
    *
    * Returns `(m, ksub, codebook)` with `codebook(s·ksub + c)` the
    * dsub-element sub-centroid — the layout the kernels flatten.
    */
  def pqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int, ksub: Int, iters: Int,
      seed: Long = 42L): (Int, Int, Seq[Seq[Double]]) = {
    VectorFunctions.register(corpus.sparkSession)
    val sample = sampleCentroids(corpus, idCol, vecCol, ksub, seed)
    require(sample.nonEmpty, "pqCodebook: empty corpus")
    val dim = sample.head.length
    val mm = if (m > 0) m else autoM(dim)
    require(dim % mm == 0, s"pqCodebook: dim $dim not divisible by m $mm")
    val kk = math.min(ksub, sample.length)
    val dsub = dim / mm
    var cb: IndexedSeq[Seq[Double]] =
      (0 until mm).flatMap { s =>
        (0 until kk).map(c => sample(c).slice(s * dsub, (s + 1) * dsub))
      }
    if (iters > 0) {
      val vmean = udaf(graft.functions.VectorMean,
        org.apache.spark.sql.catalyst.encoders
          .ExpressionEncoder[Array[Float]]())
      val vecs = corpus.select(col(vecCol).as("v")).persist()
      try for (_ <- 0 until iters) {
        val means = vecs
          .withColumn("codes", VectorFunctions.pqEncode(col("v"),
            lit(cb.flatten.toArray), lit(mm)))
          .select(col("v"), posexplode(col("codes")).as(Seq("sub", "code")))
          .withColumn("sv",
            slice(col("v"), col("sub") * lit(dsub) + lit(1), lit(dsub)))
          .groupBy("sub", "code").agg(vmean(col("sv")).as("mvec"))
          .collect()
          .map(r => (r.getInt(0) * kk + r.getInt(1)) ->
            r.getSeq[Float](2).map(_.toDouble).toSeq)
          .toMap
        cb = cb.zipWithIndex.map { case (old, i) => means.getOrElse(i, old) }
      } finally vecs.unpersist()
    }
    (mm, kk, cb)
  }

  /** Build the PERSISTABLE PQ index: `(codes, codebook)` — both plain
    * DataFrames, parquet-roundtrippable like every other index here.
    *
    *   - codes: `(neighbor_id, pq: array<int>, cn: double)` — m codes
    *     per corpus vector plus the EXACT float norm (8 extra bytes
    *     that anchor the ADC cosine's denominator; the numerator is
    *     the reconstruction dot product);
    *   - codebook: `(sub, code, centroid: array<double>)` — m×ksub
    *     rows of driver-metadata size.
    */
  def pqBuild(corpus: DataFrame, idCol: String, vecCol: String,
      m: Int = 0, ksub: Int = 0, trainIters: Int = 2,
      seed: Long = 42L): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    VectorFunctions.register(spark)
    val kk0 = if (ksub > 0) ksub else autoKsub(corpus.count())
    val (mm, kk, cb) =
      pqCodebook(corpus, idCol, vecCol, m, kk0, trainIters, seed)
    val cbDf = cb.zipWithIndex
      .map { case (c, i) => (i / kk, i % kk, c.toArray) }
      .toDF("sub", "code", "centroid")
    val codes = corpus
      .select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
      .withColumn("pq", VectorFunctions.pqEncode(col("cv"),
        lit(cb.flatten.toArray), lit(mm)))
      .withColumn("cn", VectorFunctions.normF(col("cv")))
      .select("neighbor_id", "pq", "cn")
    (codes, cbDf)
  }

  /** Name-addressed, value-keyed codebook collect (same reload
    * contract as [[collectCentroids]]): rows are keyed by (sub, code),
    * so a reloaded table with reordered rows or columns reconstructs
    * the identical flat layout. Refuses a sparse grid loudly — a
    * missing (sub, code) row would silently shift every later
    * sub-centroid.
    */
  private def collectCodebook(
      codebookDf: DataFrame): (Int, Int, Array[Double]) = {
    val rows = codebookDf.collect()
      .map(r => ((r.getAs[Int]("sub"), r.getAs[Int]("code")),
        r.getAs[scala.collection.Seq[Double]]("centroid")))
      .sortBy(_._1)
    val m = rows.map(_._1._1).max + 1
    val ksub = rows.map(_._1._2).max + 1
    require(rows.length == m * ksub &&
      rows.map(_._1).distinct.length == m * ksub,
      s"collectCodebook: sparse or duplicated codebook grid " +
        s"(${rows.length} rows for m=$m × ksub=$ksub)")
    (m, ksub, rows.flatMap(_._2).map(d => d: Double))
  }

  /** Probe a prebuilt PQ index — retrieve-and-rerank like the SQ8
    * path: per query, one [[graft.functions.PqOps.lut]] builds the
    * m×ksub ADC table; the coarse stage scores every code row with `m`
    * table reads and keeps the top `k × oversample`; survivors rerank
    * against the FLOAT corpus with exact cosines ([[rerankExact]]).
    * The broadcast side is |Q| × (m·ksub doubles) — e.g. 2k queries ×
    * 16 KB at the 8×256 operating point, comfortably under the
    * broadcast ceiling; batch larger query sets.
    */
  def pqTopKWithIndex(queries: DataFrame, codes: DataFrame,
      codebookDf: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, oversample: Int = 4): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    val (m, _, flat) = collectCodebook(codebookDf)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv_f"))
    val qLut = q.select(col("query_id"),
      VectorFunctions.pqLut(col("qv_f"), lit(flat), lit(m)).as("lut"),
      VectorFunctions.normF(col("qv_f")).as("q_qn"))
    val coarse = codes.join(broadcast(qLut),
      col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos",
        VectorFunctions.pqAdc(col("pq"), col("lut")) /
          (col("q_qn") * col("cn")))
    rerankExact(coarseTopIds(coarse, k * oversample), q, corpus,
      idCol, vecCol, k)
  }

  /** [[pqTopKWithIndex]] with the index built inline (persist
    * [[pqBuild]]'s output to amortize across query batches).
    */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, m: Int = 0, ksub: Int = 0,
      trainIters: Int = 2, oversample: Int = 4,
      seed: Long = 42L): DataFrame = {
    val (codes, cbDf) =
      pqBuild(corpus, idCol, vecCol, m, ksub, trainIters, seed)
    pqTopKWithIndex(queries, codes, cbDf, corpus, idCol, vecCol, k,
      oversample)
  }

  /** Build the PERSISTABLE IVF-PQ index (the FAISS `IVF…,PQ` shape —
    * the standard billion-scale index): corpus rows shard by nearest
    * IVF centroid AND store PQ codes in the shards, so a probe reads
    * `nprobe/nlist` of a 32×-narrower index. Encoding is DIRECT (no
    * residual): codes quantize the vector itself, not `v − centroid` —
    * one shared codebook, reconstruction error higher than residual
    * PQ but the exact-cosine rerank absorbs it (measured: same recall
    * gate as the flat PQ path at the verification scale).
    * Returns `(pqAssignments, centroids, codebook)`:
    * pqAssignments = `(list, neighbor_id, pq, cn)`.
    */
  def ivfPqBuild(corpus: DataFrame, idCol: String, vecCol: String,
      nlist: Int = 0, m: Int = 0, ksub: Int = 0, trainIters: Int = 2,
      seed: Long = 42L): (DataFrame, DataFrame, DataFrame) = {
    VectorFunctions.register(corpus.sparkSession)
    val (assignments, centDf) =
      ivfBuild(corpus, idCol, vecCol, nlist, trainIters, seed)
    val (codes, cbDf) =
      pqBuild(corpus, idCol, vecCol, m, ksub, trainIters, seed)
    val pqAssign = assignments.select("list", "neighbor_id")
      .join(codes, Seq("neighbor_id"))
      .select("list", "neighbor_id", "pq", "cn")
    (pqAssign, centDf, cbDf)
  }

  /** Probe a prebuilt IVF-PQ index: the query batch routes to its
    * `nprobe` nearest lists, carries its ADC table into the shard
    * join, coarse-scores with `m` lookups per candidate, and reranks
    * survivors against the FLOAT corpus. The two scan-cost levers
    * multiply: nprobe/nlist of the corpus × m lookups per row.
    */
  def ivfPqTopKWithIndex(queries: DataFrame, pqAssignments: DataFrame,
      centroidTable: DataFrame, codebookDf: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, nprobe: Int = 4,
      oversample: Int = 4): DataFrame = {
    VectorFunctions.register(queries.sparkSession)
    val (listIds, cents) = collectCentroids(centroidTable)
    val (m, _, flat) = collectCodebook(codebookDf)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv_f"))
    val qProbe = q
      .withColumn("lut", VectorFunctions.pqLut(col("qv_f"), lit(flat), lit(m)))
      .withColumn("q_qn", VectorFunctions.normF(col("qv_f")))
      .withColumn("pos", explode(nearestLists(col("qv_f"), nprobe, cents)))
      .withColumn("list", element_at(lit(listIds.toArray), col("pos") + 1))
      .select("query_id", "lut", "q_qn", "list")
    val coarse = pqAssignments.join(broadcast(qProbe), Seq("list"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos",
        VectorFunctions.pqAdc(col("pq"), col("lut")) /
          (col("q_qn") * col("cn")))
    rerankExact(coarseTopIds(coarse, k * oversample), q, corpus,
      idCol, vecCol, k)
  }

  /** [[ivfPqTopKWithIndex]] with the index built inline. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      nlist: Int = 0, nprobe: Int = 0, m: Int = 0, ksub: Int = 0,
      trainIters: Int = 2, oversample: Int = 4,
      seed: Long = 42L): DataFrame = {
    val nl = if (nlist > 0) nlist else autoNlist(corpus.count())
    val np = if (nprobe > 0) nprobe else autoNprobe(nl)
    val (pqAssign, centDf, cbDf) =
      ivfPqBuild(corpus, idCol, vecCol, nl, m, ksub, trainIters, seed)
    ivfPqTopKWithIndex(queries, pqAssign, centDf, cbDf, corpus,
      idCol, vecCol, k, np, oversample)
  }

  /** Embedding-cosine near-duplicate pairs: pairs with cosine ≥
    * threshold, found through multi-table LSH buckets (no corpus², same
    * contract as [[Dedup.minhashLsh]] but in embedding space).
    *
    * Recall comes from `tables` independent hash tables (standard
    * multi-table LSH) plus hamming-1 multi-probe on the left side;
    * candidates are scored with the TRUE cosine, so false positives are
    * impossible by construction. `planes` trades bucket occupancy
    * (candidate-pair cost, ∝ tables·n²/2^planes) against recall, so a
    * FIXED plane count is a scale bug: occupancy — and with it the
    * candidate join — grows linearly with the corpus (measured: 20k
    * vectors at 5 planes = 625/bucket ⇒ ~750M candidate rows, 53 s;
    * auto-scaled ⇒ 39/bucket). The defaults are therefore E2LSH-style
    * corpus-adaptive (one cheap `count()` job; pass explicit values to
    * skip it): planes = max(5, ⌈log2(n/64)⌉) targets ~64 rows/bucket,
    * and tables = min(20, 10 + planes−5) buys back the per-table
    * recall each extra plane halves. At ≤2k vectors that is the
    * verification-scale 5×10 operating point — measured recall 1.0 at
    * sf0.01, which is what lets the raw pair surface carry the full
    * exact-pair DuckDB oracle — and at 10⁹ docs it lands at 24×20,
    * where true near-dups (cos ≥ 0.9) keep ~0.9 recall; pairs barely
    * over a LOW threshold lose recall first — raise `tables` if those
    * matter.
    */
  /** EXACT cosine pair set — the quadratic reference the approximate
    * families are verified against. Deliberately all-pairs
    * (`crossJoin`): this is a VERIFICATION-scale baseline for recall
    * gates and tests, never a production path — at corpus scale use
    * [[cosineNearDupPairs]].
    */
  def exactCosinePairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        VectorFunctions.cosineF(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, tables: Int = 0, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    val p =
      if (planes > 0) planes
      else {
        val n = math.max(1L, corpus.count())
        math.max(5, math.ceil(math.log(n / 64.0) / math.log(2)).toInt)
      }
    val t = if (tables > 0) tables else math.min(20, 10 + (p - 5))
    val allPlanes = hyperplanes(p * t, dim, seed)
    val bucketCols = (0 until t).map { tI =>
      bucketOf(col("v"), allPlanes.slice(tI * p, (tI + 1) * p))
        .bitwiseOR(lit(tI << p)) // disjoint key space per table
    }
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), array(bucketCols: _*).as("buckets"))
      .withColumn("nrm", VectorFunctions.normF(col("v")))
    // Left side multi-probes each table's bucket plus its hamming-1
    // neighbors; right side sits in its exact buckets only.
    val probes = c.select(col("id"), col("v"), col("nrm"),
      explode(flatten(transform(col("buckets"), b =>
        array(b +: (0 until p).map(i =>
          b.bitwiseXOR(shiftleft(lit(1), i))): _*)))).as("bucket"))
    val exact = c.select(explode(col("buckets")).as("bucket"),
      col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    probes
      .select(col("bucket"), col("id").as("id_a"), col("v").as("va"),
        col("nrm").as("na"))
      .join(exact, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      // score before distinct: the dedup shuffle then carries 3 scalars
      // per candidate pair instead of two 64-float vectors, and the
      // threshold filter shrinks it first (cosine is deterministic, so
      // duplicates collapse exactly).
      .select(col("id_a"), col("id_b"),
        (VectorFunctions.dotF(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("cos"))
      .filter(col("cos") >= threshold)
      .distinct()
  }

  /** Approximate kNN GRAPH: for EVERY corpus vector, its k most
    * similar neighbors by true cosine, candidates restricted to shared
    * sign-LSH buckets (multi-probe, hamming-1, same table layout as
    * [[cosineNearDupPairs]]) — the all-nodes generalization of top-k
    * search that feeds HNSW/NSG index construction, label propagation,
    * and graph-based dedup. Never a pairwise corpus scan: candidate
    * cost is bucket-collision-bound, every candidate is scored with
    * the exact cosine, and the per-node top-k is a `row_number ≤ k`
    * window — Spark's `InferWindowGroupLimit` inserts a PARTIAL group
    * limit before the exchange, so a hot node ships O(mappers × k)
    * candidates, not its whole bucket neighborhood.
    *
    * Output `(src, dst, cos, rank)`, directed (dst ranked per src;
    * edges are not symmetric — mutual-kNN is a self-join away).
    * Deterministic: seeded hyperplanes, cosine-then-id ordering.
    */
  def knnGraph(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 0, tables: Int = 0, dim: Int = 64,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, "k must be positive")
    VectorFunctions.register(corpus.sparkSession)
    val p =
      if (planes > 0) planes
      else {
        val n = math.max(1L, corpus.count())
        math.max(5, math.ceil(math.log(n / 64.0) / math.log(2)).toInt)
      }
    val t = if (tables > 0) tables else math.min(20, 10 + (p - 5))
    val allPlanes = hyperplanes(p * t, dim, seed)
    val bucketCols = (0 until t).map { tI =>
      bucketOf(col("v"), allPlanes.slice(tI * p, (tI + 1) * p))
        .bitwiseOR(lit(tI << p))
    }
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"))
      .select(col("id"), col("v"), array(bucketCols: _*).as("buckets"))
      .withColumn("nrm", VectorFunctions.normF(col("v")))
    val probes = c.select(col("id"), col("v"), col("nrm"),
      explode(flatten(transform(col("buckets"), b =>
        array(b +: (0 until p).map(i =>
          b.bitwiseXOR(shiftleft(lit(1), i))): _*)))).as("bucket"))
    val exact = c.select(explode(col("buckets")).as("bucket"),
      col("id").as("dst"), col("v").as("vb"), col("nrm").as("nb"))
    val cand = probes
      .select(col("bucket"), col("id").as("src"), col("v").as("va"),
        col("nrm").as("na"))
      .join(exact, Seq("bucket"))
      .filter(col("src") =!= col("dst"))
      // score before distinct, same rationale as cosineNearDupPairs:
      // the multi-table dedup shuffle carries 3 scalars, not vectors
      .select(col("src"), col("dst"),
        (VectorFunctions.dotF(col("va"), col("vb")) / (col("na") * col("nb")))
          .as("cos"))
      .distinct()
    val w = Window.partitionBy(col("src"))
      .orderBy(col("cos").desc, col("dst").asc)
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-level SEMANTIC dedup (the SemDeDup recipe, Abbas et
    * al. 2023, arXiv:2303.09540): documents whose embeddings are
    * near-duplicates — cosine ≥ `threshold`, transitively — collapse
    * to one canonical representative. Output is a full-corpus verdict
    * `(id, cluster, is_canonical)`: `cluster` is the component's
    * minimum id, singletons are their own canonical cluster, and
    * downstream keeps the `is_canonical` rows (or re-joins the
    * verdict to route losers into an audit table).
    *
    * Composition, all previously-audited pieces: candidate pairs from
    * the LSH-bucketed near-dup join ([[cosineNearDupPairs]] — true
    * cosine scored, no pairwise corpus scan), components from
    * [[Dedup.connectedComponents]] (driver union-find under the edge
    * cap, star contraction above it — pass `checkpointDir` for
    * reliable checkpoints at scale), then one left join back to the
    * corpus for singletons. Where the paper k-means-clusters first
    * and dedups within clusters, the LSH tables play the same
    * candidate-restriction role with a deterministic, seed-replayable
    * partition — which is what lets the whole verdict carry a
    * value-level oracle (the paper's k-means assignment is
    * init-order-dependent and cross-engine unverifiable).
    */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      threshold: Double, planes: Int = 0, tables: Int = 0, dim: Int = 64,
      seed: Long = 42L, checkpointDir: Option[String] = None): DataFrame = {
    val pairs = cosineNearDupPairs(corpus, idCol, vecCol, threshold,
      planes, tables, dim, seed).select("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs,
      checkpointDir = checkpointDir)
    corpus.select(col(idCol).as("id"))
      .join(comp, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("comp"), col("id")).as("cluster"),
        (coalesce(col("comp"), col("id")) === col("id"))
          .as("is_canonical"))
  }

  /** The seeded sparse Johnson–Lindenstrauss matrix (Achlioptas 2003):
    * entries ∈ {+1, 0, −1} with probabilities 1/6, 2/3, 1/6, drawn
    * from the md5-60 portable hash of the flat index `r*dim + j` — so
    * executors (as a plan literal), unit tests, and the DuckDB oracle
    * all reconstruct the identical matrix. Flattened row-major
    * (k rows × dim), ±1 exact in double.
    */
  private[graft] def jlMatrix(dim: Int, k: Int, seed: Long): Array[Double] =
    Array.tabulate(k * dim) { i =>
      graft.functions.PortableHash.h60Jvm("rproj", seed, i) % 6 match {
        case 0 => 1.0
        case 5 => -1.0
        case _ => 0.0
      }
    }

  /** Random-projection dimensionality reduction (Johnson–Lindenstrauss
    * with the sparse Achlioptas matrix): `vecCol` (dim floats) →
    * `outCol` (k doubles), scaled by sqrt(3/k) so expected norms are
    * preserved (the 1/6 density puts 2/3 zeros in the matrix — 3× the
    * variance of dense Rademacher, hence the √3).
    *
    * The 100 TB shape: MAP-ONLY. The matrix rides the plan as an
    * 8·k·dim-byte literal (no broadcast round-trip, no shuffle), the
    * mat-vec is the codegen'd [[graft.functions.MatVecOps]] kernel
    * inside whole-stage codegen, and downstream ANN/clustering/dedup
    * runs on k dims instead of dim — the standard pre-shrink before
    * sign-LSH or IVF on a trillion-embedding corpus (SemDeDup-style
    * pipelines PCA/JL-reduce before clustering for exactly this
    * reason). Deterministic by construction: same seed → same
    * projection on any cluster layout, and the DuckDB oracle
    * recomputes it value-for-value (driver query `sim_rproj`).
    */
  def randomProject(df: DataFrame, vecCol: String, dim: Int, k: Int,
      seed: Long = 42L, outCol: String = "proj"): DataFrame = {
    require(k > 0 && dim > 0, "randomProject: dim and k must be positive")
    VectorFunctions.register(df.sparkSession)
    val scale = math.sqrt(3.0 / k)
    df.withColumn(outCol,
      transform(
        VectorFunctions.matVecFD(col(vecCol),
          typedLit(jlMatrix(dim, k, seed).toSeq)),
        x => x * lit(scale)))
  }

  /** Projection-space retrieve-and-rerank top-k — the JL analog of the
    * SQ8 pattern ([[q8TopK]]): coarse-score every (query, corpus) pair
    * on the `kProj`-dim PROJECTED vectors (a dim/kProj cut in coarse
    * flops and shuffle width; the projection itself is the map-only
    * [[randomProject]] kernel), keep the top k×oversample per query,
    * then join only the survivors back to the float corpus and emit
    * the exact-cosine top k. JL preserves angles in expectation, so
    * with enough oversampling the exact reranker recovers brute-force
    * recall — gated in the `sim_rproj_topk` driver query; output shape
    * matches [[bruteForceTopK]] with EXACT cosines.
    *
    * Parameter honesty: the synthetic test embeddings are ISOTROPIC —
    * every cosine near 0, neighbor gaps within the JL distortion
    * ε ≈ √(ln n / kProj) — which is the projection's worst case, hence
    * the heavy defaults (kProj 48/64 dims, oversample 32 → measured
    * recall@5 0.91 at sf0.01, 0.93 at sf0.001). On clustered real
    * corpora the same machinery earns its keep at far smaller kProj;
    * its primary scale role there is SemDeDup-style candidate
    * generation, where a verify pass (here: the exact rerank) backs
    * every output anyway.
    */
  def rprojTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int, dim: Int, kProj: Int = 48,
      oversample: Int = 32, seed: Long = 42L): DataFrame = {
    VectorFunctions.register(corpus.sparkSession)
    def toF(c: Column): Column = transform(c, x => x.cast(FloatType))
    val cp = randomProject(
        corpus.select(col(idCol), col(vecCol)), vecCol, dim, kProj, seed)
      .select(col(idCol).as("neighbor_id"), toF(col("proj")).as("pv"))
      .withColumn("pn", VectorFunctions.normF(col("pv")))
    val qp = randomProject(
        queries.select(col(idCol), col(vecCol)), vecCol, dim, kProj, seed)
      .select(col(idCol).as("query_id"), toF(col("proj")).as("q_pv"))
      .withColumn("q_pn", VectorFunctions.normF(col("q_pv")))
    val coarse = cp.join(broadcast(qp),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("qcos",
        VectorFunctions.dotF(col("q_pv"), col("pv")) /
          (col("q_pn") * col("pn")))
    val cand = coarseTopIds(coarse, k * oversample)
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv_f"))
    rerankExact(cand, q, corpus, idCol, vecCol, k)
  }

  /** Cluster-balanced (diversity-preserving) sampling: cap the number
    * of rows drawn from each region of embedding space, so a corpus
    * dominated by one dense topic cannot crowd the sample — the
    * cluster-then-quota selection step of diversity-aware curation
    * (SemDeDup §5 / DiverseEvol-style pruning), with the cluster
    * assignment made CHEAP and PORTABLE instead of a k-means job:
    *
    *   - cluster id = the `bits` sign bits of the seeded JL projection
    *     ([[randomProject]] — the Achlioptas matrix both executors and
    *     the DuckDB oracle rebuild from the md5-60 portable hash).
    *     Sign-random-projection buckets are exactly the SimHash of the
    *     embedding: nearby vectors share buckets with probability
    *     1 − θ/π per bit, so capping per bucket caps per direction
    *     cone. Both engines fold the SAME ascending-j double sum, so
    *     the sign — hence the cluster, hence every output row — is
    *     bit-exact cross-engine (no k-means raw-centroid waiver
    *     needed);
    *   - within a cluster, survivors are the `cap` lowest portable-
    *     hash draws (tie-broken by id) — a seeded lottery, replayable
    *     on any cluster layout.
    *
    * One shuffle (the per-cluster rank window). 2^bits clusters bound
    * the window sorts at corpus/2^bits expected rows (sign bits of an
    * isotropic projection are balanced by construction); at 100 TB
    * raise `bits` — the projection is map-only and its cost is linear
    * in `bits` — or pre-thin with [[Sampling.sampleByRates]] before
    * the rank. Output: `(idCol, cluster, c_rank)` for the kept rows.
    */
  def clusterBalancedSample(corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, cap: Int, bits: Int = 8,
      seed: Long = 42L): DataFrame = {
    require(bits > 0 && bits <= 30, "bits must be in [1, 30]")
    require(cap > 0, "cap must be positive")
    val proj = randomProject(corpus.select(col(idCol), col(vecCol)),
      vecCol, dim, bits, seed)
    val cluster = (0 until bits).map(r =>
      when(element_at(col("proj"), r + 1) >= 0, 1 << r).otherwise(0))
      .reduce(_ + _)
    val draw = graft.functions.PortableHash.h60("cbal", seed, col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster")).orderBy(col("_draw"), col(idCol))
    proj.withColumn("cluster", cluster)
      .withColumn("_draw", draw)
      .withColumn("c_rank", row_number().over(w))
      .filter(col("c_rank") <= cap)
      .select(col(idCol), col("cluster"), col("c_rank"))
  }
}
