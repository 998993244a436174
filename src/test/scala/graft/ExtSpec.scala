package graft

import graft.ext.{Dedup, Multimodal, Similarity, TextStats}
import graft.queries.CoreQueries
import org.apache.spark.sql.functions._

/** Extension-layer behavior tests: approximate families measured against
  * their exact counterparts (recall), determinism, stub plumbing.
  */
class ExtSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("exact dedup: hash-keyed variant groups identically to text groupBy") {
    val byHash = Dedup.exact(docs, "doc_id", "text")
      .select("representative_id", "n_dups")
      .as[(Long, Long)].collect().toSet
    val byText = docs.groupBy(lower(trim($"text")))
      .agg(min($"doc_id").as("r"), count(lit(1)).as("n"))
      .select("r", "n").as[(Long, Long)].collect().toSet
    assert(byHash === byText)
  }

  test("minhash LSH recall ≥ 0.8 vs exact jaccard at 0.5") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", 64, 16, 3, 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty, "corpus should contain near-dups")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall=$recall exact=${exact.size} lsh=${lsh.size}")
  }

  test("incremental minhash == full dedup restricted to batch-touching pairs") {
    val cut = 250L
    val corpus = docs.filter($"doc_id" < cut)
    val fresh = docs.filter($"doc_id" >= cut)
    // the band store is PERSISTABLE state: round-trip through parquet
    // like an ingest pipeline would
    val store = tmpDir("graft-bands")
    Dedup.minhashBands(corpus, "doc_id", "text")
      .write.mode("overwrite").parquet(store)
    val incr = Dedup.minhashLshIncremental(fresh, corpus,
      spark.read.parquet(store), "doc_id", "text", threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
    val full = Dedup.minhashLsh(docs, "doc_id", "text",
      k = 64, bands = 16, n = 3, threshold = 0.5)
      .select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSet
      .filter(p => p._2 >= cut) // id_b = max ⇒ touches the batch
    assert(incr === full,
      "incremental dedup must find exactly the full variant's batch-touching pairs")
    assert(incr.forall(p => p._1 >= cut || p._2 >= cut))
  }

  test("corpus stop-shingle list removes the restricted-set df artifact") {
    // Boilerplate "B" rides in EVERY corpus doc (df=20 > cap=5), but the
    // verification set of this batch only holds the two batch docs — so
    // the restricted-set maxDf path sees df(B)=2, keeps B, and B inflates
    // the verified Jaccard. The persisted corpus-level list drops it.
    val corpus = (0L until 20L)
      .map(i => (i, s"B u${i}a u${i}b u${i}c")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, "B w1 w2 w3 w4 w5 w6 w7"),
      (101L, "B w1 w2 w3 w4 w5 w6 w8")).toDF("doc_id", "text")
    val bands = Dedup.minhashBands(corpus, "doc_id", "text", n = 1)
    def run(stop: Option[org.apache.spark.sql.DataFrame]) =
      Dedup.minhashLshIncremental(batch, corpus, bands, "doc_id", "text",
        n = 1, threshold = 0.5, maxDf = Some(5), stopShingles = stop)
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
    val artifact = run(None)
    val stopList = Dedup.shingleDocFreq(corpus, "doc_id", "text", n = 1)
      .filter($"df" > 5)
    val clean = run(Some(stopList))
    // restricted-set path: B survives ⇒ inter 7 of union 9
    assert(artifact((100L, 101L)) === 7.0 / 9.0)
    // corpus-level path: B dropped ⇒ inter 6 of union 8
    assert(clean((100L, 101L)) === 6.0 / 8.0)
  }

  test("minhash LSH filters signature-collision false positives via true Jaccard") {
    // ADVERSARIAL construction: docs 1/2 share one 1-gram shingle ("x");
    // with k=4, bands=4, rows=1 and seed 42 the shared shingle is the
    // signature minimum in ≥1 band for both docs, so the pair IS a band
    // collision — but its true Jaccard is 1/2, below the 0.6 threshold.
    // A signature-agreement estimate would emit it; the true-Jaccard
    // verification must filter it while keeping the genuine duplicate.
    val adv = Seq((1L, "x"), (2L, "x y"), (3L, "a b"), (4L, "a b"))
      .toDF("doc_id", "text")
    val cand = Dedup.minhashCandidates(adv, "doc_id", "text",
      k = 4, bands = 4, n = 1, seed = 42L)
      .as[(Long, Long)].collect().toSet
    assert(cand.contains((1L, 2L)),
      "construction must produce the band collision (seed-deterministic)")
    val out = Dedup.minhashLsh(adv, "doc_id", "text",
      k = 4, bands = 4, n = 1, threshold = 0.6, seed = 42L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out === Set((3L, 4L)),
      "collision pair filtered by true Jaccard; real duplicate kept")
  }

  test("ngram Jaccard maxDf cap drops stop-shingles (and defaults ON)") {
    val two = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    // the single shingle "a b c" has df=2: a cap of 1 removes it from
    // both docs' shingle sets, so no pair survives
    assert(Dedup.ngramJaccardPairs(two, "doc_id", "text", n = 3,
      threshold = 0.1, maxDf = Some(1)).count() === 0)
    // the default cap (1000) filters nothing here — exact pair intact
    assert(Dedup.ngramJaccardPairs(two, "doc_id", "text", n = 3,
      threshold = 0.1).select("id_a", "id_b", "jaccard")
      .as[(Long, Long, Double)].collect().toSeq === Seq((1L, 2L, 1.0)))
  }

  test("connected components + gates hold no storage blocks after consumption") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    // eager gates: a full gate query leaves the block set untouched
    graft.queries.ExtQueries.dedupMinhashLsh(spark, sfDir).collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "gate queries must unpersist their materialized sides")
    // the composed curation pipeline (persist + local-mode CC) too
    graft.queries.ExtQueries.curationPipeline(spark, sfDir).collect()
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "curation must release every materialized stage")
    // reliable-checkpoint mode: zero blocks at ANY point, files under
    // dir (localEdgeLimit = 0 forces the distributed star loop — the
    // property under test is ITS checkpoint hygiene)
    val ccDir = tmpDir("graft-cc-test")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs,
      checkpointDir = Some(ccDir), localEdgeLimit = 0)
      .as[(Long, Long)].collect().toMap
    assert(comps === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
    assert(spark.sparkContext.getPersistentRDDs.keySet === before,
      "reliable CC must not register persistent RDDs")
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(ccDir))
      .count() > 0, "reliable checkpoints must land under the given dir")
    // localCheckpoint mode (still forced distributed): only the
    // returned frame's blocks may remain (released by the context
    // cleaner once unreferenced); every intermediate round and the
    // edge frame must already be gone
    val local = Dedup.connectedComponents(pairs, localEdgeLimit = 0)
    assert(local.as[(Long, Long)].collect().toMap === comps)
    assert(spark.sparkContext.getPersistentRDDs.keySet.size <= before.size + 1,
      "intermediate rounds must be unpersisted eagerly")
    // small-graph fast path (the default at this size): same labels,
    // and it adds NO storage blocks of its own (the one surviving
    // block above belongs to the localCheckpoint-mode RETURNED frame,
    // released by the context cleaner — documented behavior)
    val afterLocal = spark.sparkContext.getPersistentRDDs.keySet
    val fast = Dedup.connectedComponents(pairs)
    assert(fast.as[(Long, Long)].collect().toMap === comps)
    // subsetOf, not equality: the ContextCleaner may release `local`'s
    // returned-frame block at any GC point in between
    assert(spark.sparkContext.getPersistentRDDs.keySet
      .subsetOf(afterLocal),
      "fast-path CC must add no storage blocks")
  }

  test("exact dedup survives a first-hash collision via the second hash") {
    // craft a guaranteed h1 collision (hash = text length) between two
    // DISTINCT texts; the independent second hash must keep them apart,
    // while true duplicates still merge
    val docs = Seq((1L, "aaaa"), (2L, "bbbb"), (3L, "aaaa"))
      .toDF("doc_id", "text")
    val groups = graft.ext.Dedup.exactBy(docs, "doc_id",
      n => org.apache.spark.sql.functions.length(n).cast("long"),
      n => org.apache.spark.sql.functions.xxhash64(n))("text")
      .select("representative_id", "n_dups")
      .as[(Long, Long)].collect().toSet
    assert(groups === Set((1L, 2L), (2L, 1L)),
      "distinct texts colliding on h1 must stay separate groups")
  }

  test("connected components: chains merge, singletons keep, representatives are min ids") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (7L, 3L))
      .toDF("id_a", "id_b")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      10L -> 10L, 11L -> 10L)
    // both execution paths must produce identical labels
    val comps = graft.ext.Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps === expected)
    val dist = graft.ext.Dedup.connectedComponents(pairs,
      localEdgeLimit = 0).as[(Long, Long)].collect().toMap
    assert(dist === expected)
    // cluster pruning keeps the representative + unpaired docs
    val docs = (1L to 12L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val kept = graft.ext.Dedup.pruneDuplicates(docs, pairs, "doc_id")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 10L, 4L, 5L, 6L, 8L, 9L, 12L))
  }

  test("connected components: 500-deep chain converges in O(log n) star rounds") {
    // a diameter-500 chain would need 500 label-propagation rounds;
    // star contraction must finish inside the default 20-round budget
    val pairs = (1L until 501L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    // localEdgeLimit = 0: the star loop's convergence behavior is the
    // property under test, so the fast path must not short-circuit it
    val comps = graft.ext.Dedup.connectedComponents(pairs,
      localEdgeLimit = 0).as[(Long, Long)].collect()
    assert(comps.length === 501)
    assert(comps.forall(_._2 === 1L))
  }

  test("connected components: random graphs match a union-find ground truth") {
    // ground truth computed by an INDEPENDENT driver-side union-find —
    // not by another Spark formulation of the same algorithm
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(x => x -> find(x)).toMap
    }
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 30
      val edges = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      val expected = unionFind(n, edges)
      // exercise the DISTRIBUTED star loop against the independent
      // ground truth, and the default fast path against both
      val got = graft.ext.Dedup.connectedComponents(
        edges.toDF("id_a", "id_b"), localEdgeLimit = 0)
        .as[(Long, Long)].collect().toMap
      assert(got === expected, s"trial $trial (n=$n, ${edges.size} edges)")
      val fast = graft.ext.Dedup.connectedComponents(
        edges.toDF("id_a", "id_b")).as[(Long, Long)].collect().toMap
      assert(fast === expected, s"fast trial $trial")
    }
  }

  test("hash split: disjoint exact cover, replay-deterministic, near weights") {
    val split = graft.ext.Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    val total = docs.count()
    assert(counts.values.sum === total, "every doc lands in exactly one split")
    assert(counts.keySet === Set("train", "val", "test"))
    val fracs = counts.view.mapValues(_.toDouble / total).toMap
    assert(math.abs(fracs("train") - 0.8) < 0.05, s"fracs=$fracs")
    // determinism: identical assignment on replay
    val again = graft.ext.Sampling.hashSplit(docs, "doc_id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(again === split.select("doc_id", "split")
      .as[(Long, String)].collect().toSet)
    // membership is stable under corpus growth: the half-corpus
    // assignment agrees with the full-corpus one
    val half = graft.ext.Sampling.hashSplit(docs.filter($"doc_id" % 2 === 0),
      "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(half.subsetOf(again))
  }

  test("stratified sample: exact ceil(frac*n) rows per stratum, deterministic") {
    val sampled = graft.ext.Sampling.stratifiedSample(emb, "label", "vec_id",
      frac = 0.1)
    val got = sampled.groupBy("label").count().as[(String, Long)].collect().toMap
    val want = emb.groupBy("label").count().as[(String, Long)].collect().toMap
      .view.mapValues(n => math.ceil(n * 0.1).toLong).toMap
    assert(got === want)
    // sampled rows are real rows of the corpus
    assert(sampled.join(emb, Seq("vec_id"), "left_anti").count() === 0)
  }

  test("simhash: identical docs collide; pair list is deterministic") {
    // duplicated normalized text ⇒ identical simhash (hamming 0)
    val sh = Dedup.simhash(docs, "doc_id", "text")
    val withNorm = docs.select($"doc_id".as("id"), lower(trim($"text")).as("norm"))
      .join(sh, "id")
    val perText = withNorm.groupBy("norm")
      .agg(countDistinct("simhash").as("nsh"))
    assert(perText.filter($"nsh" =!= 1).count() === 0)
    val p1 = Dedup.simhashPairs(docs, "doc_id", "text").collect().toSet
    val p2 = Dedup.simhashPairs(docs, "doc_id", "text").collect().toSet
    assert(p1 === p2)
    assert(sh.select("id").distinct().count() === docs.count())
  }

  test("simhash blocking: exact hamming-ball pair set vs brute force") {
    val rnd = new scala.util.Random(7)
    val sig = (0L until 200L).map(i =>
      (i, rnd.nextLong() & ((1L << Dedup.SimhashBits) - 1))).toDF("id", "simhash")
    // plant some near pairs: ids 1000+i = id i with ≤3 bits flipped
    val planted = (0 until 20).map { i =>
      val base = sig.filter($"id" === i.toLong).head().getLong(1)
      val flipped = (0 until 1 + rnd.nextInt(3)).foldLeft(base)((s, _) =>
        s ^ (1L << rnd.nextInt(Dedup.SimhashBits)))
      (1000L + i, flipped)
    }.toDF("id", "simhash")
    val all = sig.union(planted)
    val got = Dedup.simhashPairsFromSignatures(all, maxDist = 3)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val brute = all.as[(Long, Long)].collect()
    val want = (for {
      (a, sa) <- brute; (b, sb) <- brute if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("simhash blocking: non-divisor block counts stay exact (maxDist=6)") {
    // m=7 does not divide 60 — uneven blocks (4×9 bits + 3×8 bits)
    assert(Dedup.simhashBlockCount(6) === 7)
    // past the combo cap the chooser falls back to the minimal
    // pigeonhole rather than rejecting the maxDist outright
    assert(Dedup.simhashBlockCount(25) === 26)
    val rnd = new scala.util.Random(13)
    val sig = (0L until 150L).map(i =>
      (i, rnd.nextLong() & ((1L << Dedup.SimhashBits) - 1))).toDF("id", "simhash")
    val planted = (0 until 15).map { i =>
      val base = sig.filter($"id" === i.toLong).head().getLong(1)
      val flipped = (0 until 1 + rnd.nextInt(6)).foldLeft(base)((s, _) =>
        s ^ (1L << rnd.nextInt(Dedup.SimhashBits)))
      (1000L + i, flipped)
    }.toDF("id", "simhash")
    val all = sig.union(planted)
    val got = Dedup.simhashPairsFromSignatures(all, maxDist = 6)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect().toSet
    val brute = all.as[(Long, Long)].collect()
    val want = (for {
      (a, sa) <- brute; (b, sb) <- brute if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 6
    } yield (a, b, h)).toSet
    assert(want.nonEmpty)
    assert(got === want)
  }

  test("simhash blocking: hot 15-bit chunk does not explode candidates") {
    // Adversary for the minimal (maxDist+1)-chunk pigeonhole: 600 sigs
    // share the low 15 bits (one full old-scheme chunk ⇒ C(600,2) ≈
    // 180k candidate rows there) but are random above ⇒ none is a real
    // near-dup. The Manku blocking joins on 30-bit keys, so collisions
    // need 2 more matching 10-bit blocks — candidates stay ~1e-3 of old.
    val rnd = new scala.util.Random(11)
    val hot = (0L until 600L).map(i =>
      (i, (rnd.nextLong() << 15) & ((1L << Dedup.SimhashBits) - 1) | 0x5A5AL))
      .toDF("id", "simhash")
    val nCand = Dedup.simhashCandidates(hot, maxDist = 3).count()
    assert(nCand < 2000, s"candidate fan-out not bounded: $nCand")
    // sharing 15 bits is nowhere near hamming ≤ 3 on 60: no real pairs
    assert(Dedup.simhashPairsFromSignatures(hot, maxDist = 3).count() <= 2)
  }

  test("int8 quantization rejects null vector elements loudly") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val withNull = new GenericArrayData(Array[Any](1.0f, null, 3.0f))
    val e = intercept[IllegalArgumentException] {
      graft.functions.VectorOps.i8Scale(withNull)
    }
    assert(e.getMessage.contains("null element"))
    intercept[IllegalArgumentException] {
      graft.functions.VectorOps.quantizeI8(withNull)
    }
    // null-free vectors are unaffected
    val ok = new GenericArrayData(Array[Any](1.0f, -2.0f, 3.0f))
    assert(graft.functions.VectorOps.quantizeI8(ok).length === 3)
  }

  test("IVF top-k recall ≥ 0.3 vs brute force (approximate by design)") {
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall=$recall")
    // every query still gets k results (lists are never empty at nprobe=4)
    assert(ivf.size === bf.size)
  }

  test("trained IVF centroids: VectorMean aggregator + Lloyd iterations work") {
    // aggregator correctness on a known input
    import org.apache.spark.sql.functions.udaf
    val vmean = udaf(graft.functions.VectorMean,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val mean = Seq(Array(1f, 3f), Array(3f, 5f)).toDF("v")
      .agg(vmean($"v")).as[Array[Float]].head()
    assert(mean.toSeq === Seq(2f, 4f))
    // training converges to usable centroids; recall holds
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4, trainIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect ivf).size.toDouble / bf.size
    assert(recall >= 0.3, s"trained recall=$recall")
  }

  test("IVF index round-trips through parquet and probes identically") {
    val q = emb.filter($"vec_id" < 20)
    // build ONCE; the property under test is the round-trip, so the
    // in-memory index and its parquet reload must probe identically
    // (no dependence on repeated distributed training being bit-stable)
    val (assignments, centroids) = Similarity.ivfBuild(emb, "vec_id",
      "embedding", nlist = 16, trainIters = 2)
    val direct = Similarity.ivfTopKWithIndex(q, assignments, centroids,
      "vec_id", "embedding", 5, nprobe = 6)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val dir = tmpDir("graft-ivf")
    assignments.write.mode("overwrite").parquet(s"$dir/assignments")
    centroids.write.mode("overwrite").parquet(s"$dir/centroids")
    // reload with a REPROJECTED column order — the probe must address
    // columns by name and key shards by list value, not position
    val probed = Similarity.ivfTopKWithIndex(q,
      spark.read.parquet(s"$dir/assignments"),
      spark.read.parquet(s"$dir/centroids").select("centroid", "list"),
      "vec_id", "embedding", 5, nprobe = 6)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(probed === direct)
    assert(direct.nonEmpty)
  }

  test("ivfAppend routes like build-time assignment and retrieves the batch") {
    val base = emb.filter(pmod($"vec_id", lit(10)) =!= 0)
    val batch = emb.filter(pmod($"vec_id", lit(10)) === 0)
    val (asg, cents) = Similarity.ivfBuild(base, "vec_id", "embedding",
      nlist = 16, trainIters = 2)
    val appended = Similarity.ivfAppend(asg, cents, batch,
      "vec_id", "embedding")
    // counts and schema preserved
    assert(appended.count() === emb.count())
    assert(appended.columns.sorted === asg.columns.sorted)
    // appended rows landed in existing lists with non-null norms
    val lists = cents.select("list").as[Int].collect().toSet
    val got = appended.join(batch.select($"vec_id".as("neighbor_id")),
      Seq("neighbor_id"))
    assert(got.filter(!$"list".isin(lists.toSeq: _*)).isEmpty)
    assert(got.filter($"cn".isNull || $"cn" <= 0).isEmpty)
    // a probe IDENTICAL to an appended vector must retrieve it at
    // rank 1 with cos ≈ 1 when probing every list (fixed id — limit
    // without orderBy is not deterministic across executions)
    val want = batch.orderBy("vec_id").select("vec_id").as[Long].head()
    val probe = batch.filter($"vec_id" === want)
      .select(($"vec_id" + 1000000L).as("vec_id"), $"embedding")
    val top = Similarity.ivfTopKWithIndex(probe, appended, cents,
      "vec_id", "embedding", k = 1, nprobe = 16)
      .select("neighbor_id", "cos").as[(Long, Double)].head()
    assert(top._1 === want)
    assert(math.abs(top._2 - 1.0) < 1e-6)
    // append is deterministic: same batch twice → identical frames
    val again = Similarity.ivfAppend(asg, cents, batch,
      "vec_id", "embedding")
    assert(again.select("neighbor_id", "list").as[(Long, Int)]
      .collect().sorted.toSeq ===
      appended.select("neighbor_id", "list").as[(Long, Int)]
        .collect().sorted.toSeq)
    // a REPLAYED append is a no-op under the default dedupIds guard —
    // the one-list-per-row invariant the probe's no-distinct relies on
    val replayed = Similarity.ivfAppend(appended, cents, batch,
      "vec_id", "embedding")
    assert(replayed.count() === appended.count())
    assert(replayed.groupBy("neighbor_id").count()
      .filter($"count" > 1).isEmpty, "no id may appear in two lists")
  }

  test("IVF×SQ8 composed top-k: recall holds, every query served k rows") {
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfQ8TopK(q, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 4, trainIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall=$recall")
    assert(got.size === bf.size)
    // the composed path cannot beat its own IVF probe: every returned
    // neighbor must live in a probed list, i.e. appear among plain
    // IVF's candidates (same nlist/nprobe/seed; k wide enough to
    // cover the whole probed candidate set at this corpus size)
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 1000,
      nlist = 16, nprobe = 4, trainIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((got -- ivf).isEmpty,
      "IVF×SQ8 returned a neighbor outside its probed shards")
  }

  test("PQ kernels: encode picks nearest sub-centroids; ADC == exact " +
      "dot against the reconstruction") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import graft.functions.PqOps
    // m=2 subspaces × ksub=2 codes × dsub=2: sub0 centroids
    // {[1,0],[0,1]}, sub1 centroids {[2,0],[0,2]} — flattened row-major
    val cb = new GenericArrayData(
      Array[Any](1.0, 0.0, 0.0, 1.0, 2.0, 0.0, 0.0, 2.0))
    val v = new GenericArrayData(Array[Any](0.9f, 0.1f, 0.1f, 1.9f))
    val codes = PqOps.encode(v, cb, 2)
    assert((0 until 2).map(codes.getInt) === Seq(0, 1))
    val q = new GenericArrayData(Array[Any](1.0f, 1.0f, 1.0f, 1.0f))
    val lut = PqOps.lut(q, cb, 2)
    assert((0 until 4).map(lut.getDouble) === Seq(1.0, 1.0, 2.0, 2.0))
    // reconstruction of v is [1,0,0,2]; dot(q, v̂) = 3 — ADC must match
    assert(PqOps.adcDot(codes, lut) === 3.0)
    // ties break to the lowest code, deterministically
    val mid = new GenericArrayData(Array[Any](0.5f, 0.5f, 1.0f, 1.0f))
    assert(PqOps.encode(mid, cb, 2).getInt(0) === 0)
    assert(PqOps.encode(mid, cb, 2).getInt(1) === 0)
  }

  test("PQ top-k: recall holds vs brute force; codes carry m small ints") {
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(q, emb, "vec_id", "embedding", 5,
      m = 8, ksub = 32, trainIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect pq).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall=$recall")
    assert(pq.size === bf.size)
    val (codes, cbDf) = Similarity.pqBuild(emb, "vec_id", "embedding",
      m = 8, ksub = 32, trainIters = 0)
    val row = codes.select("pq").head.getSeq[Int](0)
    assert(row.length === 8)
    assert(row.forall(c => c >= 0 && c < 32))
    assert(cbDf.count() === 8L * 32)
  }

  test("PQ index round-trips through parquet; codebook collect is " +
      "value-keyed, refuses a sparse grid") {
    val q = emb.filter($"vec_id" < 20)
    val (codes, cbDf) = Similarity.pqBuild(emb, "vec_id", "embedding",
      m = 8, ksub = 32, trainIters = 2)
    val direct = Similarity.pqTopKWithIndex(q, codes, cbDf, emb,
      "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val dir = tmpDir("graft-pq")
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    cbDf.write.mode("overwrite").parquet(s"$dir/codebook")
    // reprojected column order + shuffled row order on reload: the
    // collect must address by (sub, code) value, not position
    val probed = Similarity.pqTopKWithIndex(q,
      spark.read.parquet(s"$dir/codes"),
      spark.read.parquet(s"$dir/codebook")
        .select("centroid", "code", "sub").orderBy($"code".desc),
      emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(probed === direct)
    assert(direct.nonEmpty)
    val sparse = cbDf.filter(!($"sub" === 3 && $"code" === 7))
    val ex = intercept[Exception] {
      Similarity.pqTopKWithIndex(q, codes, sparse, emb,
        "vec_id", "embedding", 5).count()
    }
    assert(ex.getMessage.contains("sparse"))
  }

  test("IVF-PQ composed top-k: recall holds; neighbors stay inside " +
      "probed shards") {
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = Similarity.ivfPqTopK(q, emb, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 6, m = 8, ksub = 32, trainIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect got).size.toDouble / bf.size
    assert(recall >= 0.3, s"recall=$recall")
    assert(got.size === bf.size)
    // bounded by its own IVF probe, like IVF×SQ8
    val ivf = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 1000,
      nlist = 16, nprobe = 6, trainIters = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    assert((got -- ivf).isEmpty,
      "IVF-PQ returned a neighbor outside its probed shards")
  }

  test("IVF-SQ8 index round-trips through parquet and probes identically") {
    val q = emb.filter($"vec_id" < 20)
    val (qAssign, cents) = Similarity.ivfQ8Build(emb, "vec_id",
      "embedding", nlist = 16, trainIters = 2)
    val direct = Similarity.ivfQ8TopKWithIndex(q, qAssign, cents, emb,
      "vec_id", "embedding", 5, nprobe = 6)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val dir = tmpDir("graft-ivfq8")
    qAssign.write.mode("overwrite").parquet(s"$dir/assign")
    cents.write.mode("overwrite").parquet(s"$dir/cents")
    val probed = Similarity.ivfQ8TopKWithIndex(q,
      spark.read.parquet(s"$dir/assign"),
      spark.read.parquet(s"$dir/cents").select("centroid", "list"),
      emb, "vec_id", "embedding", 5, nprobe = 6)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(probed === direct)
    assert(direct.nonEmpty)
  }

  test("LSH top-k recall ≥ 0.4 vs brute force (approximate by design)") {
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf intersect lsh).size.toDouble / bf.size
    assert(recall >= 0.4, s"recall=$recall")
  }

  test("bigram LM score: hand-computed values, coverage, typicality order") {
    val tiny = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c"))
      .toDF("doc_id", "text")
    val got = graft.ext.TextStats.lmScore(tiny, "doc_id", "text")
      .as[(Long, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    // corpus model: uni a:3 b:3 c:1, V=3; bi (a,b):3 (b,a):1; α=0.4
    def p(n2: Long, n1: Long) = math.log((n2 + 0.4) / (n1 + 0.4 * 3))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = r6((p(3, 3) + p(1, 3) + p(3, 3)) / 3)
    val d2 = r6(p(3, 3))
    assert(math.abs(got(1L)._1 - d1) < 1e-9, s"got ${got(1L)._1}, want $d1")
    assert(math.abs(got(2L)._1 - d2) < 1e-9, s"got ${got(2L)._1}, want $d2")
    assert(got(1L)._2 === 3L && got(2L)._2 === 1L)
    // single-token doc has no bigram evidence — not scored
    assert(!got.contains(3L))
    // the doc made only of the corpus's most common bigram scores
    // higher than the one that also contains the rare (b, a)
    assert(got(2L)._1 > got(1L)._1)
    // corpus-level coverage: every multi-token document is scored,
    // n_bigrams = whitespace tokens − 1
    val scored = graft.ext.TextStats.lmScore(docs, "doc_id", "text")
    val toks = graft.ext.TextStats.tokenCounts(docs, "doc_id", "text")
    val joined = scored.join(toks, "doc_id")
    assert(joined.filter($"n_bigrams" =!= $"ws_tokens" - 1).count() === 0)
    assert(scored.count() ===
      toks.filter($"ws_tokens" >= 2).count())
  }

  test("stupid-backoff LM: each stage fires with hand-computed values") {
    val train = Seq((0L, "a b c a b c")).toDF("doc_id", "text")
    // train counts: tri (a,b,c):2 (b,c,a):1 (c,a,b):1;
    // bi (a,b):2 (b,c):2 (c,a):1; uni a:2 b:2 c:2; N=6
    val score = Seq(
      (1L, "a b c"),   // trigram stage: ln(2/2)
      (2L, "b b c"),   // (b,b,c) unseen, (b,c) seen: ln(0.4*2/2)
      (3L, "a a b"),   // (a,a,b) unseen, (a,b) seen: ln(0.4*2/2)
      (4L, "a b z"),   // (b,z) unseen, z OOV: ln(0.16*(0+0.5)/6.5)
      (5L, "c c b")    // (c,b) unseen, b known: ln(0.16*(2+0.5)/6.5)
    ).toDF("doc_id", "text")
    val got = graft.ext.TextStats.lmBackoffScore(train, score,
      "doc_id", "text")
      .as[(Long, Double, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val lam = 0.4
    assert(got(1L)._2 === r6(math.log(2.0 / 2)))
    assert(got(1L)._4 === 0L && got(1L)._5 === 0L)
    assert(got(2L)._2 === r6(math.log(lam * 2 / 2)))
    assert(got(2L)._4 === 1L)
    assert(got(3L)._2 === r6(math.log(lam * 2 / 2)))
    assert(got(4L)._2 === r6(math.log(lam * lam * 0.5 / 6.5)))
    assert(got(4L)._5 === 1L)
    assert(got(5L)._2 === r6(math.log(lam * lam * 2.5 / 6.5)))
    assert(got(5L)._5 === 0L)
    // self-scored train corpus never backs off
    val self = graft.ext.TextStats.lmBackoffScore(train, train,
      "doc_id", "text").select("n_backoff").as[Long].head()
    assert(self === 0L)
  }

  test("int8 quantization: error bound, exact integer dot, zero vector") {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val vecs = Seq(
      Array(0.5f, -1.25f, 3.75f, -0.001f),
      Array(0f, 0f, 0f, 0f), // zero vector → zero bytes, no NaN
      Array(127f, -127f, 1f, -1f)).toDF("v")
    val rows = vecs.select($"v", VectorFunctions.q8($"v").as("qv"),
      VectorFunctions.q8Scale($"v").as("s"))
      .as[(Array[Float], Array[Byte], Float)].collect()
    rows.foreach { case (v, qv, s) =>
      assert(qv.length === v.length)
      v.zip(qv).foreach { case (x, q) =>
        // dequantization error ≤ scale/2 per element
        assert(math.abs(q * s - x) <= s / 2 + 1e-7, s"x=$x q=$q s=$s")
      }
    }
    // integer dot matches a plain Scala reference, exactly
    val (_, qa, _) = rows(0)
    val (_, qb, _) = rows(2)
    val expected = qa.zip(qb).map { case (x, y) => x.toLong * y.toLong }.sum
    val got = Seq((qa, qb)).toDF("a", "b")
      .select(VectorFunctions.dotI8($"a", $"b")).as[Long].head()
    assert(got === expected)
  }

  test("q8 retrieve-and-rerank == brute-force top-k, exactly") {
    val q = emb.filter($"vec_id" < 20)
    val bf = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val q8 = Similarity.q8TopK(q, emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    // rerank emits exact cosines; coarse recall is 1.0 on this corpus,
    // so the quantized path reproduces the exact top-k rank for rank —
    // the property the sim_q8_topk_raw driver oracle relies on
    assert(q8 === bf)
    assert(bf.nonEmpty)
  }

  test("q8 index round-trips through parquet and probes identically") {
    val q = emb.filter($"vec_id" < 20)
    val idx = Similarity.q8Build(emb, "vec_id", "embedding")
    val direct = Similarity.q8TopKWithIndex(q, idx, emb,
      "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    val dir = tmpDir("graft-q8")
    idx.write.mode("overwrite").parquet(s"$dir/q8")
    val probed = Similarity.q8TopKWithIndex(q,
      spark.read.parquet(s"$dir/q8"), emb, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect().toSet
    assert(probed === direct)
    assert(direct.nonEmpty)
  }

  test("TextShingles expression == declarative shingles formulation") {
    // corpus + adversarial whitespace/case rows (tabs/newlines around
    // text are NOT trimmed by Spark's trim; trailing whitespace keeps an
    // empty token under split limit -1)
    val tricky = Seq((9001L, "\tThe  Fast\nkey "), (9002L, " a b c"),
      (9003L, "UPPER lower MiXeD case x"), (9004L, "one two"))
      .toDF("doc_id", "text")
    val all = docs.select($"doc_id", $"text").unionByName(tricky)
    val a = all.select($"doc_id",
      array_sort(graft.functions.TextFunctions.shingles(spark, $"text", 3))
        .as("g"))
    val b = all.select($"doc_id",
      array_sort(Dedup.shinglesDeclarative($"text", 3)).as("g"))
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("TextShingleHashes == xxhash64 over TextShingles, multiset-exact") {
    val tricky = Seq((9001L, "\tThe  Fast\nkey "), (9002L, " a b c"),
      (9003L, "one two"), (9004L, ""))
      .toDF("doc_id", "text")
    val all = docs.select($"doc_id", $"text").unionByName(tricky)
    val viaStrings = all.select($"doc_id",
      explode(graft.functions.TextFunctions.shingles(spark, $"text", 3)).as("g"))
      .select($"doc_id", xxhash64($"g").as("h"))
    val viaKernel = all.select($"doc_id",
      explode(graft.functions.TextFunctions.shingleHashes(spark, $"text", 3)).as("h"))
    assert(viaStrings.exceptAll(viaKernel).count() === 0)
    assert(viaKernel.exceptAll(viaStrings).count() === 0)
  }

  test("custom expressions are SQL-visible (registry + extensions object)") {
    graft.functions.VectorFunctions.register(spark)
    graft.functions.TextFunctions.registerShingles(spark, 3)
    val dot = spark.sql(
      "SELECT graft_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT))," +
        " array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS d")
      .as[Double].head()
    assert(dot === 11.0)
    val sh = spark.sql(
      "SELECT graft_shingles_3('a b c d') AS g").as[Seq[String]].head()
    assert(sh === Seq("a b c", "b c d"))
    // extensions object wires the same functions without throwing
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("codegen dot kernel == HOF fold, bit-exact") {
    graft.functions.VectorFunctions.register(spark)
    val pairs = emb.limit(50).select($"vec_id".as("id_a"), $"embedding".as("va"))
      .crossJoin(emb.limit(50).select($"vec_id".as("id_b"), $"embedding".as("vb")))
    val diff = pairs.select(
      Similarity.cosine($"va", $"vb").as("hof"),
      graft.functions.VectorFunctions.cosineF($"va", $"vb").as("gen"))
      .filter($"hof" =!= $"gen")
    assert(diff.count() === 0)
  }

  test("cosine near-dup LSH recall ≥ 0.7 vs exact pairs at 0.35") {
    graft.functions.VectorFunctions.register(spark)
    val ids = emb.select($"vec_id".as("id_a"), $"embedding".as("va"))
    val ids2 = emb.select($"vec_id".as("id_b"), $"embedding".as("vb"))
    val exact = ids.join(ids2, $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        graft.functions.VectorFunctions.cosineF($"va", $"vb").as("cos"))
      .filter($"cos" >= 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding", 0.35)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(exact.nonEmpty)
    assert((lsh -- exact).isEmpty, "LSH must not invent pairs (it verifies exactly)")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall=$recall exact=${exact.size} lsh=${lsh.size}")
  }

  test("fingerprint: equal for duplicate normalized text, stable across runs") {
    val fp1 = TextStats.fingerprint(docs, "doc_id", "text")
    val joined = docs.select($"doc_id", lower(trim($"text")).as("norm"))
      .join(fp1, "doc_id")
    val groups = joined.groupBy("norm")
      .agg(countDistinct("fingerprint").as("nfp"))
    assert(groups.filter($"nfp" =!= 1).count() === 0,
      "same normalized text must fingerprint identically")
    assert(fp1.collect().toSet ===
      TextStats.fingerprint(docs, "doc_id", "text").collect().toSet)
  }

  test("language ID predicts a declared language label per doc") {
    val out = TextStats.languageId(docs, "doc_id", "text")
    assert(out.count() === docs.count())
    val langs = out.select("predicted_lang").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "de", "fr", "es", "zh")))
    // the single-scan profile equals the two-scan composition, value
    // for value (shared column expressions cannot drift)
    val composed = out.join(
      TextStats.qualityScore(docs, "doc_id", "text"), "doc_id")
      .select("doc_id", "predicted_lang", "score", "quality")
      .as[(Long, String, Double, Double)].collect().toSet
    val single = TextStats.profile(docs, "doc_id", "text")
      .as[(Long, String, Double, Double)].collect().toSet
    assert(single === composed)
  }

  test("multimodal: batched feature extraction preserves rows, is deterministic") {
    val media = Multimodal.fromDocuments(docs)
    val f1 = Multimodal.extractFeatures(spark, media, batchSize = 7)
    assert(f1.count() === docs.count())
    val r1 = f1.collect().map(m => (m.doc_id, m.features.toSeq)).toMap
    val r2 = Multimodal.extractFeatures(spark, media, batchSize = 64)
      .collect().map(m => (m.doc_id, m.features.toSeq)).toMap
    assert(r1 === r2, "batch size must not affect features")
    assert(r1.values.head.length === 8)
  }

  test("frame sampling slices payload at the right offsets with stride") {
    val media = Multimodal.fromDocuments(docs.limit(5))
    val payloads = media.select("doc_id", "payload")
      .as[(Long, Array[Byte])].collect().toMap
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 2)
      .select("doc_id", "frame_idx", "frame_bytes")
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.nonEmpty)
    frames.foreach { case (id, idx, bytes) =>
      assert(idx % 2 === 0, "stride must skip odd frames")
      val expected = payloads(id).slice(idx * 64, idx * 64 + 64)
      assert(bytes.toSeq === expected.toSeq, s"doc $id frame $idx")
    }
    // every sampled frame index present: 0, 2, ... < ceil(len/64)
    val byDoc = frames.groupBy(_._1)
    byDoc.foreach { case (id, fs) =>
      val n = math.ceil(payloads(id).length / 64.0).toInt
      assert(fs.map(_._2).sorted.toSeq === (0 until n by 2).toSeq)
    }
    // empty payload ⇒ zero frames, not a phantom frame 0
    val empty = Seq((1L, "image", Array.emptyByteArray))
      .toDF("doc_id", "media_type", "payload")
    assert(Multimodal.sampleFrames(empty, 64, 2).count() === 0)
  }

  test("resize metadata preserves aspect ratio and never upscales") {
    val out = Multimodal.resizeMeta(Multimodal.fromDocuments(docs), 512)
      .as[(Long, Int, Int, Int, Int)].collect()
    out.foreach { case (_, w, h, ow, oh) =>
      assert(ow <= 512 && oh <= 512)
      assert(ow <= w && oh <= h)
      if (w > 512 || h > 512)
        assert(math.max(ow, oh) === 512 ||
          math.abs(math.max(ow, oh) - 512) <= 1)
    }
  }

  test("streaming incremental source delivers exactly each commit's change records") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmpDir("graft-incsrc")
    val t = graft.tables.KeyedTable("cdc", s"$base/cdc", Seq("id"), "ver",
      Seq("part"))
    def up(rs: (String, Int, String)*) =
      graft.ops.TableOps.upsert(spark, t, rs.toDF("id", "ver", "part"))
    up(("a", 1, "p1"), ("b", 1, "p2"))
    val ckpt = tmpDir("graft-incsrc-ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, String)]()
    def drain(): Set[(String, Int, String)] = {
      got.clear()
      val q = graft.streaming.IncrementalSource.changes(spark, t)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id", "ver", "part")
            .collect().foreach(r =>
              got.add((r.getString(0), r.getInt(1), r.getString(2))))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      scala.jdk.CollectionConverters.IteratorHasAsScala(got.iterator()).asScala.toSet
    }
    // bootstrap: every live commit streams in
    assert(drain() === Set(("a", 1, "p1"), ("b", 1, "p2")))
    // second commit rewrites p1 (carrying 'a' over) and adds 'c'; only
    // the CHANGE records may arrive on the same checkpoint
    up(("c", 1, "p1"))
    assert(drain() === Set(("c", 1, "p1")),
      "carried-over rows of the rewritten partition must be filtered")
    // an update is a change record; compaction emits nothing
    up(("a", 2, "p1"))
    graft.ops.TableOps.compactPartitions(spark, t, Seq("part=p1"))
    assert(drain() === Set(("a", 2, "p1")))
  }

  test("streaming source is manifest-gated: unpublished commit dir emits zero rows") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmpDir("graft-unpub")
    val t = graft.tables.KeyedTable("unpub", s"$base/unpub", Seq("id"), "ver",
      Seq("part"))
    graft.ops.TableOps.upsert(spark, t, Seq(("a", 1, "p1"))
      .toDF("id", "ver", "part"))
    val ckpt = tmpDir("graft-unpub-ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, String)]()
    def drain(): Set[(String, Int, String)] = {
      got.clear()
      val q = graft.streaming.IncrementalSource.changes(spark, t)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("id", "ver", "part").collect().foreach(r =>
            got.add((r.getString(0), r.getInt(1), r.getString(2))))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      scala.jdk.CollectionConverters.IteratorHasAsScala(got.iterator()).asScala.toSet
    }
    assert(drain() === Set(("a", 1, "p1")))
    // STAGE a crashed writer's commit: data files on disk, NO manifest —
    // invisible to batch readers, and it must be invisible to the stream
    // too (no phantom rows)
    val ts = graft.tables.CommitLog.newCommitTs()
    Seq(("ghost", 1, ts)).toDF("id", "ver", graft.tables.KeyedTable.CommitCol)
      .write.parquet(s"${t.dataPath}/$ts/part=p1")
    assert(drain() === Set.empty,
      "unpublished commit dir must emit zero rows")
    // PUBLISH the manifest: the same rows must now arrive, whole
    val schemaJson = graft.ops.TableOps.latestSchema(spark, t).get.json
    graft.tables.CommitLog(t, spark).logCommit(ts, Map(
      "table" -> t.name, "schema" -> schemaJson,
      "parts" -> s"""{"part=p1": "$ts"}"""))
    assert(drain() === Set(("ghost", 1, "p1")),
      "the commit becomes visible atomically with its manifest")
  }

  test("streaming source rate limit: maxCommitsPerTrigger splits the backlog") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmpDir("graft-rate")
    val t = graft.tables.KeyedTable("rate", s"$base/rate", Seq("id"), "ver")
    def up(id: String, ver: Int) = graft.ops.TableOps.upsert(spark, t,
      Seq((id, ver)).toDF("id", "ver"))
    up("a", 1)
    // first AvailableNow run initializes the limiter's baseline
    val ckpt = tmpDir("graft-rate-ckpt")
    val batches =
      new java.util.concurrent.ConcurrentLinkedQueue[Set[String]]()
    def drain(): Seq[Set[String]] = {
      batches.clear()
      val q = graft.streaming.IncrementalSource.changes(spark, t,
        Map("maxCommitsPerTrigger" -> "1"))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val ids = b.select("id").collect().map(_.getString(0)).toSet
          if (ids.nonEmpty) { batches.add(ids); () }
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      scala.jdk.CollectionConverters.IteratorHasAsScala(batches.iterator())
        .asScala.toSeq
    }
    assert(drain() === Seq(Set("a")))
    // three more commits: the limiter must deliver them as THREE
    // micro-batches of one commit each (in order), not one big batch
    up("b", 1); up("c", 1); up("d", 1)
    assert(drain() === Seq(Set("b"), Set("c"), Set("d")))
  }

  test("streaming source with explicit schema starts before the first commit") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val base = tmpDir("graft-prestart")
    val t = graft.tables.KeyedTable("ps0", s"$base/ps0", Seq("id"), "ver")
    val sch = StructType(Seq(StructField("id", StringType),
      StructField("ver", IntegerType),
      StructField(graft.tables.KeyedTable.CommitCol, StringType)))
    val ckpt = tmpDir("graft-prestart-ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    def drain(): Set[String] = {
      got.clear()
      val q = graft.streaming.IncrementalSource
        .changes(spark, t, schema = Some(sch))
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => got.add(r.getString(0)))
        }
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      scala.jdk.CollectionConverters.IteratorHasAsScala(got.iterator())
        .asScala.toSet
    }
    // no commits yet: the stream must start, emit nothing, and stop
    assert(drain() === Set.empty)
    // after the first commit the same checkpoint picks it up
    graft.ops.TableOps.upsert(spark, t, Seq(("a", 1)).toDF("id", "ver"))
    assert(drain() === Set("a"))
  }

  test("streaming source skips commits cleaned beyond retention") {
    import org.apache.spark.sql.streaming.Trigger
    val base = tmpDir("graft-cleanskip")
    val t = graft.tables.KeyedTable("cs", s"$base/cs", Seq("id"), "ver")
    graft.ops.TableOps.upsert(spark, t, Seq(("a", 1)).toDF("id", "ver"))
    graft.ops.TableOps.upsert(spark, t, Seq(("b", 1)).toDF("id", "ver"))
    graft.ops.TableOps.upsert(spark, t, Seq(("c", 1)).toDF("id", "ver"))
    // retain only the newest commit: older change records are gone
    graft.ops.TableOps.clean(spark, t, retainCommits = 1)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val q = graft.streaming.IncrementalSource.changes(spark, t)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        b.select("id").collect().foreach(r => got.add(r.getString(0)))
      }
      .option("checkpointLocation", tmpDir("graft-cleanskip-ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // only the retained commit's change records stream; the stream does
    // not crash on the two cleaned commit dirs
    assert(scala.jdk.CollectionConverters.IteratorHasAsScala(got.iterator())
      .asScala.toSet === Set("c"))
  }

  test("streaming table-to-table CDC: gold table tracks silver through commits") {
    val base = tmpDir("graft-t2t")
    val silver = graft.tables.KeyedTable("silver", s"$base/silver",
      Seq("id"), "ver")
    val gold = graft.tables.KeyedTable("gold", s"$base/gold",
      Seq("id"), "ver")
    val ckpt = tmpDir("graft-t2t-ckpt")
    def run(): Unit = {
      val q = graft.streaming.StreamingEtl.tableToTable(spark, silver, gold, ckpt)
      q.awaitTermination(60000)
    }
    graft.ops.TableOps.upsert(spark, silver,
      Seq(("a", 1, "x"), ("b", 1, "y")).toDF("id", "ver", "payload"))
    run()
    assert(graft.ops.TableOps.snapshot(spark, gold)
      .select("id", "ver").as[(String, Int)].collect().toSet ===
      Set(("a", 1), ("b", 1)))
    // a second silver commit flows through on the same checkpoint
    graft.ops.TableOps.upsert(spark, silver,
      Seq(("a", 2, "x2"), ("c", 1, "z")).toDF("id", "ver", "payload"))
    run()
    assert(graft.ops.TableOps.snapshot(spark, gold)
      .select("id", "ver").as[(String, Int)].collect().toSet ===
      Set(("a", 2), ("b", 1), ("c", 1)))
  }

  test("streaming dedup: duplicates within the watermark are dropped, state bounded") {
    import org.apache.spark.sql.streaming.Trigger
    val srcDir = tmpDir("graft-sdedup-src")
    val rows = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "a"),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 10:05:00"), "a-dup"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:10:00"), "b"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 10:12:00"), "b-dup"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 11:30:00"), "c"))
      .toDF("event_id", "ts", "payload")
    rows.write.mode("overwrite").parquet(srcDir)
    val ckpt = tmpDir("graft-sdedup-ckpt")
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    def drain(): Seq[Long] = {
      val q = graft.streaming.StreamingEtl.dedupStream(spark, srcDir,
        rows.schema, Seq("event_id"), "ts", watermark = "1 hour")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          batch.select("event_id").collect().foreach(r => got.add(r.getLong(0)))
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      scala.jdk.CollectionConverters.IteratorHasAsScala(got.iterator())
        .asScala.toSeq.sorted
    }
    assert(drain() === Seq(1L, 2L, 3L), "one survivor per key in batch 1")
    // a SECOND batch on the same checkpoint: an in-watermark duplicate
    // of key 3 must still be dropped (cross-batch state), a new key
    // flows, and state for long-expired keys has been evicted
    Seq((3L, java.sql.Timestamp.valueOf("2024-01-01 11:40:00"), "c-dup"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 11:45:00"), "d"))
      .toDF("event_id", "ts", "payload")
      .write.mode("append").parquet(srcDir)
    assert(drain() === Seq(1L, 2L, 3L, 4L),
      "cross-batch duplicate dropped, new key emitted")
  }

  test("streaming: windowed counts over file stream match batch windows") {
    import org.apache.spark.sql.streaming.Trigger
    val events = CoreQueries.events(spark, sfDir)
    val srcDir = tmpDir("graft-stream-src")
    events.write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val q = graft.streaming.StreamingEtl
      .windowedCounts(spark, srcDir, schema, "1 hour", "10 hours")
      .writeStream.format("memory").queryName("wc")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("wc")
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    val batch = graft.ext.EventWindows.tumbling(events)
      .select("window_start", "event_type", "n")
      .as[(java.sql.Timestamp, String, Long)].collect().toSet
    // append mode only emits windows the watermark has passed; all
    // closed windows must agree with batch, and most windows close
    assert(streamed.nonEmpty && streamed.subsetOf(batch))
    assert(streamed.size >= batch.size / 2)
  }

  test("streaming: foreachBatch upsert into a keyed table") {
    import graft.tables.KeyedTable
    import graft.ops.TableOps
    val base = tmpDir("graft-stream-upsert")
    val srcDir = s"$base/src"
    val target = KeyedTable("ev", s"$base/ev", Seq("event_id"), "ts")
    val events = CoreQueries.events(spark, sfDir).limit(200)
    events.write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val q = graft.streaming.StreamingEtl.parquetToTable(
      spark, srcDir, schema, target, s"$base/ckpt")
    q.awaitTermination(60000)
    assert(TableOps.snapshot(spark, target).count() === 200)
  }

  test("streaming: CDC-apply sink routes I/U/D batches through applyChanges") {
    import graft.tables.KeyedTable
    import graft.ops.TableOps
    val base = tmpDir("graft-stream-cdc")
    val srcDir = s"$base/src"
    val target = KeyedTable("cdct", s"$base/cdct", Seq("id"), "ver")
    TableOps.upsert(spark, target,
      Seq(("a", 1, "x"), ("b", 1, "y")).toDF("id", "ver", "payload"))
    // the change stream: delete a, update b, insert c
    Seq(("a", 2, "x", "D"), ("b", 2, "y2", "U"), ("c", 2, "z", "I"))
      .toDF("id", "ver", "payload", "_op")
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val q = graft.streaming.StreamingEtl.changesToTable(
      spark, srcDir, schema, target, s"$base/ckpt")
    q.awaitTermination(60000)
    assert(TableOps.snapshot(spark, target)
      .select("id", "payload").as[(String, String)].collect().toSet
      === Set(("b", "y2"), ("c", "z")))
  }

  // ---- random projection (JL) ----

  test("h60Jvm replicates the Spark-column md5-60 hash") {
    import graft.functions.PortableHash
    val sparkSide = spark.range(100)
      .select(PortableHash.h60("rproj", 42L, $"id").as("h"))
      .as[Long].collect().toSeq
    val jvmSide = (0L until 100L).map(PortableHash.h60Jvm("rproj", 42L, _))
    assert(sparkSide === jvmSide)
  }

  test("matVecFD kernel == interpreted HOF reference on embeddings") {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val mat = Similarity.jlMatrix(64, 8, seed = 7L)
    val kernel = emb.limit(50).select($"vec_id",
      VectorFunctions.matVecFD($"embedding", typedLit(mat.toSeq)).as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    // reference: per-row Scala loop over the collected floats
    val ref = emb.limit(50).select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
      .map { case (id, v) =>
        id -> (0 until 8).map { r =>
          (0 until 64).foldLeft(0.0)((acc, j) => acc + mat(r * 64 + j) * v(j))
        }
      }
    assert(kernel === ref)
  }

  test("rprojTopK: exact cosines in output, recall ≥ 0.8 vs brute force") {
    val q = emb.filter($"vec_id" < 20)
    val exact = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.rprojTopK(q, emb, "vec_id", "embedding", 5,
      dim = 64)
    val aPairs = approx.select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().toSet
    val recall = (exact & aPairs).size.toDouble / exact.size
    info(f"rproj recall@5 = $recall%.3f")
    assert(recall >= 0.8, f"recall $recall%.3f")
    // emitted cosines are EXACT (rerank on original floats): a caught
    // pair's cos must equal the brute-force cos for that pair
    val exactCos = Similarity.bruteForceTopK(q, emb, "vec_id", "embedding", 5)
      .select($"query_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    approx.select($"query_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect()
      .filter(r => exactCos.contains((r._1, r._2)))
      .foreach { r =>
        assert(math.abs(r._3 - exactCos((r._1, r._2))) < 1e-12) }
  }

  test("randomProject: deterministic, and JL preserves norms loosely") {
    val a = Similarity.randomProject(emb, "embedding", 64, 32, seed = 42L)
      .select($"vec_id", $"proj").as[(Long, Seq[Double])].collect().toMap
    val b = Similarity.randomProject(emb, "embedding", 64, 32, seed = 42L)
      .select($"vec_id", $"proj").as[(Long, Seq[Double])].collect().toMap
    assert(a === b)
    // E[||Rx||²] = ||x||² under the Achlioptas scaling; with k=32 the
    // per-vector distortion is loose but the mean must be near 1
    val orig = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val ratios = a.toSeq.map { case (id, p) =>
      val n2 = p.map(x => x * x).sum
      val o2 = orig(id).map(x => x.toDouble * x).sum
      n2 / o2
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    assert(ratios.count(r => r > 0.3 && r < 3.0) >= (ratios.size * 0.95).toInt,
      "JL distortion tail too heavy")
  }

  test("cluster-balanced sample: cap binds, lottery is the lowest draws") {
    import org.apache.spark.sql.functions._
    val out = Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
      dim = 64, cap = 5, bits = 3).cache()
    // never more than cap per cluster; ranks are 1..n contiguous
    val per = out.groupBy("cluster")
      .agg(count(lit(1)).as("n"), max("c_rank").as("mx")).collect()
    assert(per.nonEmpty)
    per.foreach { r =>
      assert(r.getLong(1) <= 5L)
      assert(r.getInt(2) === r.getLong(1).toInt, "ranks not contiguous")
    }
    // survivors are exactly the cap lowest portable-hash draws of each
    // cluster: recompute draws for the full corpus and cross-check
    val draws = Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
      dim = 64, cap = Int.MaxValue, bits = 3)
    val keptIds = out.select("vec_id").collect().map(_.getLong(0)).toSet
    val expect = draws.collect().filter(_.getInt(2) <= 5)
      .map(_.getLong(0)).toSet
    assert(keptIds === expect)
    // deterministic across runs
    val again = Similarity.clusterBalancedSample(emb, "vec_id", "embedding",
      dim = 64, cap = 5, bits = 3)
      .collect().map(_.getLong(0)).toSet
    assert(again === keptIds)
    out.unpersist()
  }

  test("c4Clean: every line and doc rule fires; survivors rebuilt in order") {
    val docs = Seq(
      // doc 1: mixed lines — keeps exactly the two compliant ones
      (1L, "This line has enough words here.\nshort one.\n" +
        "No terminal punctuation at all\n" +
        "Enable javascript to view this page.\n" +
        "A second fully compliant line survives!\n" +
        "Third compliant line keeps the doc alive?"),
      // doc 2: lorem ipsum anywhere kills the whole doc
      (2L, "A perfectly good long line stays here.\n" +
        "But Lorem Ipsum dolor sits in this doc.\n" +
        "Another good long line would survive."),
      // doc 3: a curly brace kills the whole doc
      (3L, "function() { return 1; } is code-like.\n" +
        "Good long line one lives right here.\n" +
        "Good long line two lives right here."),
      // doc 4: lines pass but too few survive the line gate
      (4L, "Only one line is long enough to survive this.\ntiny.\nnope.")
    ).toDF("doc_id", "text")
    val out = TextStats.c4Clean(docs, "doc_id", "text",
      minWordsPerLine = 3, minLinesPerDoc = 3,
      requireTerminalPunct = true)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._1).toSeq === Seq(1L))
    val (_, nLines, nKept, clean) = out.head
    assert(nLines === 6 && nKept === 3)
    assert(clean === "This line has enough words here.\n" +
      "A second fully compliant line survives!\n" +
      "Third compliant line keeps the doc alive?")
    // punctuation off: the bare line is admitted, javascript still drops
    val noPunct = TextStats.c4Clean(docs.filter($"doc_id" === 1), "doc_id",
      "text", minWordsPerLine = 3, minLinesPerDoc = 1,
      requireTerminalPunct = false)
      .select("n_kept").as[Long].head()
    assert(noPunct === 4)
  }

  test("c4Clean on the corpus: kept lines obey every gate") {
    val lined = docs.select($"doc_id",
      concat_ws("\n", transform(
        sequence(lit(0),
          ((size(split(trim(lower($"text")), "\\s+")) - lit(1)) / lit(10))
            .cast("int")),
        i => concat_ws(" ",
          slice(split(trim(lower($"text")), "\\s+"), i * 10 + 1, lit(10)))))
        .as("text"))
    val out = TextStats.c4Clean(lined, "doc_id", "text",
      minWordsPerLine = 6, minLinesPerDoc = 3,
      requireTerminalPunct = false,
      bannedLineWords = Seq("javascript", "spark"))
    assert(out.count() > 0)
    assert(out.filter($"n_kept" < 3 || $"n_kept" > $"n_lines").count() === 0)
    val badLine = out.select(explode(split($"clean_text", "\n")).as("l"))
      .filter(size(split($"l", "\\s+")) < 6 || lower($"l").contains("spark"))
    assert(badLine.count() === 0)
  }

  test("winnowing: window guarantee, shared-run guarantee, density, replay") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val (k, w) = (3, 4)
    val fp = TextStats.winnowing(docs, "doc_id", "text", k, w).cache()
    // THE winnowing guarantee: every window of w consecutive gram
    // positions contains at least one selected fingerprint
    val nGrams = docs.select(col("doc_id"),
        (size(split(trim(lower(col("text"))), "\\s+")) - lit(k - 1)).as("n"))
      .filter(col("n") >= w)
    val sel = fp.groupBy("doc_id")
      .agg(collect_list("pos").as("ps"))
    val holes = nGrams.join(sel, "doc_id")
      .select(col("doc_id"), col("n"), array_sort(col("ps")).as("ps"))
      .as[(Long, Int, Seq[Int])].collect()
      .flatMap { case (id, n, ps) =>
        val set = ps.toSet
        (0 to n - w).collectFirst {
          case i if !(i until i + w).exists(set.contains) => (id, i)
        }
      }
    assert(holes.isEmpty, s"uncovered windows: ${holes.take(5).toSeq}")
    // density ~ 2/(w+1)
    val total = nGrams.agg(sum("n")).head().getLong(0)
    val dens = fp.count().toDouble / total
    assert(dens > 0.25 && dens < 0.55, s"density $dens")
    // shared-run guarantee: two docs sharing >= w+k-1 words share a hash
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"  // 6 = w+k-1
    val pair = Seq((900001L, s"one two $shared x y"),
      (900002L, s"$shared p q r s t u v")).toDF("doc_id", "text")
    val pf = TextStats.winnowing(pair, "doc_id", "text", k, w)
      .select("doc_id", "fp").as[(Long, Long)].collect()
    val h1 = pf.filter(_._1 == 900001L).map(_._2).toSet
    val h2 = pf.filter(_._1 == 900002L).map(_._2).toSet
    assert((h1 & h2).nonEmpty, "shared run left no common fingerprint")
    // deterministic replay
    val again = TextStats.winnowing(docs, "doc_id", "text", k, w)
    assert(fp.exceptAll(again).count() === 0L)
    assert(again.exceptAll(fp).count() === 0L)
    fp.unpersist()
  }

  test("winnowPairs: shared-run pairs guaranteed, disjoint docs silent") {
    import spark.implicits._
    val run = (1 to 10).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha bravo charlie $run delta echo"),
      (2L, s"$run foxtrot golf hotel india juliet"),
      (3L, "kilo lima mike november oscar papa quebec romeo sierra"),
      (4L, "tango uniform victor whiskey xray yankee zulu able baker"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    // docs 1,2 share a 10-word run (>= w+k-1=6): guaranteed candidates
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L),
      s"shared-run pair missing from $pairs")
    // fully-disjoint vocab docs never pair
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L || p._1 == 4L
      || p._2 == 4L), s"spurious pair in $pairs")
    // shared count grows with minShared semantics: at minShared beyond
    // the overlap, the pair disappears
    val strict = Dedup.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 1000)
    assert(strict.count() === 0L)
  }

  test("prefixJaccardPairs == ngramJaccardPairs at θ 0.5 and 0.4") {
    for (theta <- Seq(0.5, 0.4)) {
      val full = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = theta, maxDf = None)
        .as[(Long, Long, Double)].collect().toSet
      val pp = Dedup.prefixJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = theta)
        .as[(Long, Long, Double)].collect().toSet
      assert(full.nonEmpty, "corpus should contain near-dups")
      assert(pp === full,
        s"θ=$theta: prefix join diverged (pp=${pp.size} full=${full.size})")
    }
  }

  test("prefixJaccardPairs: boilerplate shingle stays out of the index") {
    import spark.implicits._
    // 20 docs all sharing one hot 3-gram run; only 1,2 truly near-dup.
    val boiler = "terms of service apply here"
    val unique = (3 to 20).map(i =>
      (i.toLong, s"$boiler w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f"))
    val dup = Seq(
      (1L, s"$boiler same body text one two three four five six"),
      (2L, s"$boiler same body text one two three four five seven"))
    val corpus = (dup ++ unique).toDF("doc_id", "text")
    val pairs = Dedup.prefixJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.5).as[(Long, Long, Double)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 2L)),
      s"expected only (1,2), got $pairs")
    // jaccard is over the FULL sets (boilerplate in the union too) —
    // unlike the maxDf cap, prefix filtering never changes semantics
    val expected = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.5, maxDf = None)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs === expected)
  }

  test("sampleExactN: exact size, deterministic, draw-minimal") {
    import graft.ext.Sampling
    val s1 = Sampling.sampleExactN(docs, "doc_id", n = 37, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Sampling.sampleExactN(docs, "doc_id", n = 37, seed = 7L)
      .select("doc_id").as[Long].collect().toSet
    assert(s1.size === 37 && s1 === s2)
    // the winners are EXACTLY the n smallest draws
    val manual = docs
      .withColumn("d", graft.functions.PortableHash.h60("exactn", 7L, $"doc_id"))
      .orderBy($"d", $"doc_id").select("doc_id")
      .as[Long].collect().take(37).toSet
    assert(s1 === manual)
    // a different seed draws a different committee
    val s3 = Sampling.sampleExactN(docs, "doc_id", n = 37, seed = 8L)
      .select("doc_id").as[Long].collect().toSet
    assert(s3 !== s1)
  }

  test("MisraGries: exact below capacity, MG guarantees above it") {
    import graft.ext.HeavyHitters
    import spark.implicits._
    // distinct(8) < m(16): no eviction ever → sketch IS the count table;
    // null items (ADVICE r8: a null key kills the Map output encoder)
    // carry no frequency semantics and are dropped
    val small = (Seq.tabulate(400)(i => Option(s"w${i % 8}")) ++
      Seq(None, None)).toDF("item")
    val smallSk = HeavyHitters.frequentItems(small, $"item", m = 16)
      .as[(String, Long)].collect().toMap
    assert(smallSk === (0 until 8).map(i => s"w$i" -> 50L).toMap)

    // 2000 distinct cold + 3 hot items, m=16 (cap 64 ≪ distinct):
    // compaction must fire, guarantees must hold on ANY layout
    val rows = (1 to 3).flatMap(h => Seq.fill(500)(s"hot$h")) ++
      (1 to 2000).map(i => s"cold$i")
    val n = rows.size // 3500
    for (parts <- Seq(1, 7)) {
      val df = rows.toDF("item").repartition(parts)
      val sk = HeavyHitters.frequentItems(df, $"item", m = 16)
        .as[(String, Long)].collect().toMap
      assert(sk.size <= 16, s"summary overflow: ${sk.size}")
      val bound = n.toDouble / 17
      for (h <- 1 to 3) { // 500 > 3500/17 ≈ 206: guaranteed present
        val est = sk.getOrElse(s"hot$h",
          fail(s"hot$h evicted at parts=$parts: $sk"))
        assert(est <= 500L && 500L - est <= bound,
          s"hot$h est=$est outside [${500 - bound}, 500]")
      }
      // undercount-only: no estimate exceeds its true count
      sk.foreach { case (item, est) =>
        val truth = if (item.startsWith("hot")) 500L else 1L
        assert(est <= truth, s"$item overestimated: $est > $truth")
      }
    }
  }

  test("quantileReport: rank-exact values; kfold: stable partition of rows") {
    import graft.ext.{Expectations, Sampling}
    import spark.implicits._
    // 1..100 in one group: p50 = value at ceil(100*.5) = 50, p90 = 90,
    // p99 = 99 — real data values
    val df = (1 to 100).map(i => ("g", i.toDouble)).toDF("g", "v")
    val q = Expectations.quantileReport(df, Seq("g"), "v",
      Seq(0.5, 0.9, 0.99))
      .select("n_rows", "p50", "p90", "p99")
      .as[(Long, Double, Double, Double)].head()
    assert(q === ((100L, 50.0, 90.0, 99.0)))
    // fractional probabilities get collision-free labels (ADVICE r8:
    // round-to-percent made 0.005 and 0.01 both "p1")
    val qf = Expectations.quantileReport(df, Seq("g"), "v",
      Seq(0.005, 0.01, 0.995, 1.0))
    assert(qf.columns.toSeq ===
      Seq("g", "n_rows", "p0_5", "p1", "p99_5", "p100"))
    // label scaling is decimal-exact: 0.07*100 in double arithmetic is
    // 7.000000000000001, which must NOT leak into the column name
    assert(Expectations.quantileReport(df, Seq("g"), "v", Seq(0.07, 0.57))
      .columns.toSeq === Seq("g", "n_rows", "p7", "p57"))
    assert(qf.select("p0_5", "p1", "p99_5", "p100")
      .as[(Double, Double, Double, Double)].head() === ((1.0, 1.0, 100.0, 100.0)))
    intercept[IllegalArgumentException] {
      Expectations.quantileReport(df, Seq("g"), "v", Seq(0.5, 0.5))
    }

    val ids = (0L until 1000L).toDF("id")
    val folds = Sampling.kfold(ids, "id", k = 5)
    // total partition: every row exactly one fold in [0,5)
    assert(folds.filter($"fold" < 0 || $"fold" > 4).count() === 0)
    assert(folds.count() === 1000)
    // roughly balanced (hash-uniform: each fold 200 ± wide margin)
    val sizes = folds.groupBy("fold").count().select("count")
      .as[Long].collect()
    assert(sizes.length === 5 && sizes.forall(s => s > 120 && s < 280),
      s"unbalanced folds: ${sizes.toSeq}")
    // grow-stable: folds of the first 500 ids unchanged in a larger corpus
    val small = Sampling.kfold((0L until 500L).toDF("id"), "id", k = 5)
      .as[(Long, Long)].collect().toMap
    val large = folds.as[(Long, Long)].collect().toMap
    assert((0L until 500L).forall(i => small(i) === large(i)))
  }

  test("editDistancePairs: exact vs brute force incl. short strings") {
    import graft.ext.Dedup
    import spark.implicits._
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // short strings (< q·(d+1) = 6 chars) exercise the nested-loop
    // path; the rest the prefix index; cross pairs both
    val names = Seq("ab", "ba", "abc", "abcd", "bcd", "a",
      "red bolt", "red bolts", "hot bolt", "old bolt", "red gear",
      "big widget", "big widgets", "bag widget", "small gizmo",
      "entirely unrelated string", "red bol", "ed bolt")
    val got = Dedup.editDistancePairs(names.toDF("s"), "s",
      maxDist = 2, q = 2)
      .as[(String, String, Int)].collect().toSet
    val want = (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d >= 1 && d <= 2
    } yield (a, b, d)).toSet
    assert(got === want)
    // duplicate input values collapse (distinct semantics)
    val dup = Dedup.editDistancePairs(
      (names ++ names).toDF("s"), "s", maxDist = 1, q = 2)
      .as[(String, String, Int)].collect()
    assert(dup.length === dup.distinct.length)
  }

  test("pageRank: matches scalar reference, handles dangling mass") {
    import graft.ext.Graph
    import spark.implicits._
    // 4 has no out-edges: its mass redistributes uniformly
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 4L),
      (1L, 1L), (2L, 1L)) // self-loop + duplicate edge must collapse
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iters = 3, damping = 0.85)
      .as[(Long, BigDecimal)].collect().toMap.map { case (k, v) =>
        (k, v.toDouble) }
    val adj = Map(1L -> Seq(2L, 4L), 2L -> Seq(1L, 3L), 3L -> Seq(1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    var r = nodes.map(_ -> 0.25).toMap
    for (_ <- 1 to 3) {
      val dang = r.keys.filterNot(adj.contains).map(r).sum
      r = nodes.map { v =>
        val in = adj.toSeq.flatMap { case (u, outs) =>
          if (outs.contains(v)) Some(r(u) / outs.size) else None }.sum
        v -> (0.15 / 4 + 0.85 * (in + dang / 4))
      }.toMap
    }
    assert(got.keySet === nodes.toSet)
    nodes.foreach { v =>
      assert(math.abs(got(v) - r(v)) < 1e-9,
        s"node $v: got ${got(v)} want ${r(v)}") }
    // stochastic: total mass stays 1
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("Hybrid.rrf: exact fixed-point fusion, evidence counts, tiebreak") {
    import graft.ext.Hybrid
    import spark.implicits._
    val S = Hybrid.RrfScale
    val l1 = Seq((1L, "A", 1), (1L, "B", 2), (1L, "C", 3))
      .toDF("query_id", "item_id", "rank")
    val l2 = Seq((1L, "B", 1), (1L, "C", 2), (1L, "D", 3))
      .toDF("query_id", "item_id", "rank")
    val got = Hybrid.rrf(Seq(l1, l2), k0 = 1, topK = 10)
      .select("item_id", "rrf_score_u", "n_lists", "rank")
      .as[(String, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // k0=1: reciprocals are S/2, S/3, S/4 exactly (integer div)
    assert(got("B") === ((S / 3 + S / 2, 2L, 1)))
    assert(got("C") === ((S / 4 + S / 3, 2L, 2)))
    assert(got("A") === ((S / 2, 1L, 3)))
    assert(got("D") === ((S / 4, 1L, 4)))
    // equal scores break ties on item_id ascending: two single-list
    // rank-1 items tie exactly in fixed point
    val t1 = Seq((9L, "z", 1)).toDF("query_id", "item_id", "rank")
    val t2 = Seq((9L, "a", 1)).toDF("query_id", "item_id", "rank")
    val tie = Hybrid.rrf(Seq(t1, t2), k0 = 60, topK = 2)
      .orderBy("rank").select("item_id").as[String].collect().toSeq
    assert(tie === Seq("a", "z"))
    // topK cuts per query
    assert(Hybrid.rrf(Seq(l1, l2), k0 = 1, topK = 2).count() === 2)
  }

  test("psiDrift: zero on identical, fires on shift, clamps and floors") {
    import graft.ext.Expectations
    import spark.implicits._
    val ref = (0 until 1000).map(i => (i % 100).toDouble).toDF("v")
    // identical distribution → every term 0.0
    val same = Expectations.psiDrift(ref, ref, $"v", bins = 10,
      lo = 0.0, hi = 100.0)
      .select("n_ref", "n_cur", "psi_term_r")
      .as[(Long, Long, Double)].collect()
    assert(same.length === 10)
    assert(same.forall { case (r, c, t) => r === c && t === 0.0 })
    // shifted distribution → PSI well above the 0.25 drift bar, terms
    // finite even where one side's bin is empty (eps floor)
    val cur = (0 until 1000).map(i => 150.0 + (i % 100)).toDF("v")
    val drift = Expectations.psiDrift(ref, cur, $"v", bins = 10,
      lo = 0.0, hi = 100.0)
      .select("psi_term_r").as[Double].collect()
    assert(drift.forall(t => !t.isNaN && !t.isInfinite))
    assert(drift.sum > 0.25, s"PSI ${drift.sum} did not flag the shift")
    // out-of-range values clamp into the edge bin (cur is all ≥ hi)
    val binned = Expectations.psiDrift(ref, cur, $"v", bins = 10,
      lo = 0.0, hi = 100.0)
      .filter($"bin" === 9).select("n_cur").as[Long].head()
    assert(binned === 1000L)
    // FAR out-of-range values clamp too: the long bin index 2^32+7
    // would wrap to interior bin 7 under a narrowing int cast — it must
    // land in edge bin 9, not bin 7
    val far = Seq(10.0 * (math.pow(2, 32) + 7)).toDF("v")
    val farBins = Expectations.psiDrift(ref, far, $"v", bins = 10,
      lo = 0.0, hi = 100.0)
      .filter($"n_cur" > 0).select("bin").as[Int].collect().toSeq
    assert(farBins === Seq(9), s"far value mis-binned: $farBins")
    // psiDriftFromCounts on the same histograms reproduces the direct
    // report (the incremental state entry point)
    def hist(df: org.apache.spark.sql.DataFrame, out: String) = df
      .select(graft.ext.ModelEval.binOf($"v", 10, 0.0, 100.0).as("bin"))
      .groupBy("bin").agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as(out))
    val direct = Expectations.psiDrift(ref, cur, $"v", bins = 10,
        lo = 0.0, hi = 100.0)
      .as[(Int, Long, Long, Double)].collect().toSet
    val fromCounts = Expectations.psiDriftFromCounts(
        hist(ref, "n_ref"), hist(cur, "n_cur"), bins = 10)
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(fromCounts === direct)
  }

  test("Kmv: layout-independent sketch, exact path, calibrated overlap") {
    import graft.ext.Kmv
    import spark.implicits._
    val k = 256
    // layout independence: same value set, different partitioning →
    // identical sketch (it's the k smallest distinct hashes)
    val vals = (0L until 10000L).toDF("v")
    val s1 = Kmv.sketch(vals.repartition(1), $"v", k).as[Long].collect().toSeq
    val s7 = Kmv.sketch(vals.repartition(7), $"v", k).as[Long].collect().toSeq
    assert(s1 === s7 && s1.length === k && s1 === s1.sorted)
    // duplicates don't perturb the sketch (distinct-value semantics)
    val dup = vals.union(vals.filter($"v" % 3 === 0))
    assert(Kmv.sketch(dup, $"v", k).as[Long].collect().toSeq === s1)
    // non-full sketch = exact distinct count
    val tiny = (0L until 40L).toDF("v")
    val (nEst, nSk) = Kmv.distinctEstimate(Kmv.sketch(tiny, $"v", k), k)
      .as[(Double, Long)].head()
    assert(nSk === 40L && nEst === 40.0)
    // full sketch: estimator within 5σ ≈ 31% at k=256 (deterministic,
    // so this either always passes or the estimator is wrong)
    val (bigEst, _) = Kmv.distinctEstimate(Kmv.sketch(vals, $"v", k), k)
      .as[(Double, Long)].head()
    assert(math.abs(bigEst - 10000.0) < 10000.0 * 5.0 / math.sqrt(k),
      s"distinct estimate $bigEst far from 10000")
    // overlap: A = 0..5999, B = 4000..9999 → union 10000, inter 2000,
    // jaccard 0.2
    val a = (0L until 6000L).toDF("v")
    val b = (4000L until 10000L).toDF("v")
    val (uEst, jEst, iEst) = Kmv.overlapEstimate(
      Kmv.sketch(a, $"v", k), Kmv.sketch(b, $"v", k), k)
      .as[(Double, Double, Double)].head()
    assert(math.abs(uEst - 10000.0) < 10000.0 * 5.0 / math.sqrt(k))
    assert(math.abs(jEst - 0.2) < 5.0 * math.sqrt(0.2 * 0.8 / k),
      s"jaccard estimate $jEst far from 0.2")
    assert(math.abs(iEst - 2000.0) < 2000.0 * 0.5, s"intersection $iEst")
    // disjoint sets estimate zero overlap exactly
    val c = (100000L until 106000L).toDF("v")
    val (_, jd, id) = Kmv.overlapEstimate(
      Kmv.sketch(a, $"v", k), Kmv.sketch(c, $"v", k), k)
      .as[(Double, Double, Double)].head()
    assert(jd === 0.0 && id === 0.0)
  }

  test("containmentPairs: quoted sub-document scores 1.0 where Jaccard fails") {
    import graft.ext.Dedup
    import spark.implicits._
    val quote = "the quick brown fox jumps over the lazy dog tonight"
    val filler = (1 to 40).map(i => s"filler$i word$i token$i").mkString(" ")
    val docs = Seq(
      1L -> quote,                    // short doc
      2L -> s"$filler $quote",        // long doc quoting it wholly
      3L -> filler,                   // the filler alone
      4L -> "entirely different text about something else entirely here"
    ).toDF("doc_id", "text")
    val pairs = Dedup.containmentPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8)
      .select("id_a", "id_b", "containment")
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // 1 ⊂ 2: every trigram of the quote appears in doc 2 → containment 1.0
    assert(pairs.get((1L, 2L)).contains(1.0), s"pairs: $pairs")
    // 3 ⊂ 2 likewise (the filler is the doc's prefix; id_a < id_b)
    assert(pairs.get((2L, 3L)).contains(1.0))
    assert(!pairs.keySet.exists(p => p._1 == 4L || p._2 == 4L))
    // ...and Jaccard at the same θ misses the quote inclusion
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)),
      "jaccard should under-score the sub-document pair")
  }

  test("pageRankFixed: exact integer replay of the scalar reference") {
    import graft.ext.Graph
    import spark.implicits._
    val S = Graph.FixedScale
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 4L),
      (1L, 1L), (2L, 1L)) // self-loop + duplicate edge must collapse
    val got = Graph.pageRankFixed(edges.toDF("src", "dst"), "src", "dst",
      iters = 3, dampingPct = 85)
      .select("node", "rank_u", "rank")
      .as[(Long, Long, Double)].collect()
    // scalar reference: the exact same truncating-integer recurrence
    val adj = Map(1L -> Seq(2L, 4L), 2L -> Seq(1L, 3L), 3L -> Seq(1L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val n = nodes.size.toLong
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to 3) {
      val dang = r.keys.filterNot(adj.contains).map(r).sum
      r = nodes.map { v =>
        val in = adj.toSeq.flatMap { case (u, outs) =>
          if (outs.contains(v)) Some(r(u) / outs.size) else None }.sum
        v -> ((15L * S / 100L) / n + 85L * (in + dang / n) / 100L)
      }.toMap
    }
    assert(got.map(t => t._1 -> t._2).toMap === r,
      "fixed-point ranks must be BIT-IDENTICAL to the scalar replay")
    // the double rendering is exactly rank_u / 1e12
    got.foreach { case (_, u, d) => assert(d === u.toDouble / S.toDouble) }
    // and it tracks the float pageRank semantics to ~1e-10
    val float = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst",
      iters = 3, damping = 0.85)
      .as[(Long, BigDecimal)].collect().toMap
    got.foreach { case (k, _, d) =>
      assert(math.abs(d - float(k).toDouble) < 1e-9,
        s"node $k: fixed $d vs float ${float(k)}") }
  }

  test("pageRankFixed: no-sinks short-circuit matches the scalar reference") {
    import graft.ext.Graph
    import spark.implicits._
    val S = Graph.FixedScale
    // symmetric triangle: every node has out-edges, so the r15
    // short-circuit (dangling ≡ 0, per-iteration dangling job skipped)
    // takes effect — the ranks must still replay the scalar recurrence
    // with a zero dangling term, bit-identically
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (3L, 1L))
    val got = Graph.pageRankFixed(edges.toDF("src", "dst"), "src", "dst",
      iters = 3, dampingPct = 85)
      .select("node", "rank_u").as[(Long, Long)].collect().toMap
    val adj = Map(1L -> Seq(2L, 3L), 2L -> Seq(1L, 3L), 3L -> Seq(1L, 2L))
    val nodes = Seq(1L, 2L, 3L)
    val n = nodes.size.toLong
    var r = nodes.map(_ -> S / n).toMap
    for (_ <- 1 to 3) {
      r = nodes.map { v =>
        val in = adj.toSeq.flatMap { case (u, outs) =>
          if (outs.contains(v)) Some(r(u) / outs.size) else None }.sum
        v -> ((15L * S / 100L) / n + 85L * (in + 0L / n) / 100L)
      }.toMap
    }
    assert(got === r,
      "no-sink ranks must be bit-identical to the zero-dangling replay")
  }

  test("Bm25: rare terms outrank common, self-retrieval wins, maxDf cut") {
    import graft.ext.Bm25
    import spark.implicits._
    // "zebra" appears in exactly one doc; "the" in all. A query for
    // "zebra the" must rank the zebra doc first.
    val docs = Seq(
      (1L, "the zebra grazes quietly"),
      (2L, "the cat sits on the mat"),
      (3L, "the dog chases the cat"),
      (4L, "the bird sings the song"),
      (5L, "the fish swims the sea")
    ).toDF("doc_id", "text")
    val q = Seq((100L, "zebra the")).toDF("qid", "qtext")
    val top = Bm25.topK(docs, "doc_id", "text", q, "qid", "qtext",
      k = 5, maxDfFrac = 1.0)
      .orderBy("rank").select("doc_id", "rank").as[(Long, Int)].collect()
    assert(top.head._1 === 1L, s"zebra doc not first: ${top.toSeq}")

    // self-retrieval: querying with a doc's own text ranks it first
    val q2 = Seq((2L, "the cat sits on the mat")).toDF("qid", "qtext")
    val self = Bm25.topK(docs, "doc_id", "text", q2, "qid", "qtext",
      k = 3, maxDfFrac = 1.0).orderBy("rank")
      .select("doc_id").as[Long].head()
    assert(self === 2L)

    // maxDf cut: at 0.5, "the" (df=5/5) is dropped — a the-only query
    // returns nothing
    val qThe = Seq((200L, "the")).toDF("qid", "qtext")
    assert(Bm25.topK(docs, "doc_id", "text", qThe, "qid", "qtext",
      k = 5, maxDfFrac = 0.5).count() === 0)
    // ...while "zebra" (df=1) survives the same cut
    val qZ = Seq((300L, "zebra")).toDF("qid", "qtext")
    assert(Bm25.topK(docs, "doc_id", "text", qZ, "qid", "qtext",
      k = 5, maxDfFrac = 0.5).select("doc_id").as[Long].collect().toSeq ===
      Seq(1L))
  }

  test("funnel: order matters, greedy-earliest is complete; retention weeks") {
    import graft.ext.EventWindows
    import spark.implicits._
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2020-01-01 00:$min%02d:00")
    val ev = Seq(
      // u1: full ordered funnel
      (1L, "signup", ts(1)), (1L, "view", ts(2)), (1L, "purchase", ts(3)),
      // u2: purchase BEFORE view — must stop at stage 2
      (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "view", ts(3)),
      // u3: never signed up — absent from output
      (3L, "view", ts(1)), (3L, "purchase", ts(2)),
      // u4: greedy trap — earliest view precedes signup, but a later
      // view exists; greedy takes first view AFTER signup → stage 3
      (4L, "view", ts(1)), (4L, "signup", ts(2)), (4L, "view", ts(3)),
      (4L, "purchase", ts(4)),
      // u5: simultaneous timestamps do not count (strictly after)
      (5L, "signup", ts(1)), (5L, "view", ts(1))
    ).toDF("user_id", "event_type", "ts")
    val f = EventWindows.funnel(ev, "user_id", "event_type", "ts",
      Seq("signup", "view", "purchase"))
      .select("user_id", "stage_reached").as[(Long, Int)].collect().toMap
    assert(f === Map(1L -> 3, 2L -> 2, 4L -> 3, 5L -> 1))

    // retention: cross-check the distributed impl against a plain-Scala
    // replay of the integer epoch-week arithmetic
    def wts(day: Int) = java.sql.Timestamp.valueOf(f"2020-01-$day%02d 12:00:00")
    val rows = Seq((1L, wts(1)), (1L, wts(2)), (1L, wts(9)),
      (2L, wts(9)), (2L, wts(23)))
    val ev2 = rows.toDF("user_id", "ts")
    def week(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime / 1000, 604800L)
    val cohorts = rows.groupBy(_._1).view.mapValues(_.map(r => week(r._2)).min)
    val expected = rows.map { case (u, t) =>
      (cohorts(u), week(t) - cohorts(u), u) }
      .groupBy(p => (p._1, p._2)).map { case ((c, o), ps) =>
        (c, o, ps.map(_._3).distinct.size.toLong) }.toSet
    val r = EventWindows.cohortRetention(ev2, "user_id", "ts")
      .select("cohort_week", "week_offset", "n_active")
      .as[(Long, Long, Long)].collect().toSet
    assert(r === expected)
  }

  test("transitions: per-key lead pairs, row-normalized, tie-safe order") {
    import graft.ext.EventWindows
    import spark.implicits._
    // u1: a -> b -> a -> c ; u2: b -> a. Transitions: a->b, b->a (x2),
    // a->c. Row a: {b: 1/2, c: 1/2}; row b: {a: 1}.
    val ev = Seq(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "a"),
      (4L, 1L, 40L, "c"), (5L, 2L, 10L, "b"), (6L, 2L, 20L, "a"))
      .toDF("event_id", "user_id", "t", "event_type")
    val out = EventWindows.transitions(ev, "user_id",
      Seq(col("t"), col("event_id")), "event_type")
      .orderBy("from_state", "to_state")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "b", 1L, 0.5), ("a", "c", 1L, 0.5), ("b", "a", 2L, 1.0)))
    // tied timestamps: the event_id tiebreak makes the order total —
    // both orderings of the input rows give the same matrix
    val tied = Seq(
      (1L, 1L, 10L, "a"), (2L, 1L, 10L, "b"), (3L, 1L, 10L, "c"))
    val m1 = EventWindows.transitions(tied.toDF("event_id", "user_id", "t",
        "event_type"), "user_id", Seq(col("t"), col("event_id")),
        "event_type")
      .orderBy("from_state").as[(String, String, Long, Double)]
      .collect().toSeq
    val m2 = EventWindows.transitions(tied.reverse.toDF("event_id",
        "user_id", "t", "event_type"), "user_id",
        Seq(col("t"), col("event_id")), "event_type")
      .orderBy("from_state").as[(String, String, Long, Double)]
      .collect().toSeq
    assert(m1 === Seq(("a", "b", 1L, 1.0), ("b", "c", 1L, 1.0)))
    assert(m1 === m2)
  }

  test("knnGraph: at most k per node, exact cosines, planted clusters found") {
    import graft.ext.Similarity
    import spark.implicits._
    // 10 planted clusters of 8 near-identical vectors (dim 64)
    val rnd = new scala.util.Random(7)
    val centers = Array.fill(10)(Array.fill(64)(rnd.nextGaussian().toFloat))
    val vecs = for (c <- 0 until 10; i <- 0 until 8) yield {
      val v = centers(c).map(x => x + 0.01f * rnd.nextGaussian().toFloat)
      ((c * 8 + i).toLong, v.toSeq)
    }
    val emb = vecs.toDF("vec_id", "embedding")
    val k = 3
    val g = Similarity.knnGraph(emb, "vec_id", "embedding", k).persist()
    try {
      // degree cap + dense rank ordering per construction
      assert(g.groupBy("src").count().filter($"count" > k).count() === 0)
      // within-cluster neighbors dominate: with 0.01 jitter vs random
      // centers, a neighbor from another cluster would be a bug
      val cross = g.filter(($"src" / 8).cast("int") =!= ($"dst" / 8).cast("int"))
        .count()
      assert(cross === 0, s"$cross cross-cluster edges")
      // every node found its k in-cluster neighbors (recall 1.0 here)
      assert(g.count() === 80L * k)
      // emitted cosines are exact (recompute via brute force join)
      val exact = Similarity.bruteForceTopK(emb, emb, "vec_id", "embedding", k)
      val mismatch = g.select($"src".as("query_id"), $"dst".as("neighbor_id"),
          $"cos".as("g_cos"))
        .join(exact, Seq("query_id", "neighbor_id"))
        .filter(abs($"g_cos" - $"cos") > 1e-6).count()
      assert(mismatch === 0)
    } finally g.unpersist()
  }

  test("sampleWeightedN: exact n, weight-monotone inclusion, deterministic") {
    import graft.ext.Sampling
    import spark.implicits._
    // 200 light rows (w=1) + 10 heavy rows (w=1000)
    val df = ((0L until 200L).map(i => (i, 1L)) ++
      (1000L until 1010L).map(i => (i, 1000L))).toDF("id", "w")
    val s1 = Sampling.sampleWeightedN(df, "id", "w", n = 50, seed = 7L)
      .select("id").as[Long].collect().toSet
    assert(s1.size === 50) // exactly n, no replacement possible
    // determinism across layouts
    val s2 = Sampling.sampleWeightedN(df.repartition(7), "id", "w", n = 50,
      seed = 7L).select("id").as[Long].collect().toSet
    assert(s1 === s2)
    // heavy rows are ~1000x likelier: all 10 must be in a 50-of-210
    // draw (P(miss one) ~ exp(-1000*E[key cutoff]) ~ 0) across seeds
    (1L to 5L).foreach { seed =>
      val s = Sampling.sampleWeightedN(df, "id", "w", n = 50, seed = seed)
        .select("id").as[Long].collect().toSet
      assert((1000L until 1010L).forall(s.contains),
        s"heavy row missing at seed=$seed")
    }
    // zero/null weights are excluded
    val withZero = ((0L until 5L).map(i => (i, 0L)) ++
      (5L until 10L).map(i => (i, 2L))).toDF("id", "w")
    val s3 = Sampling.sampleWeightedN(withZero, "id", "w", n = 10, seed = 1L)
      .select("id").as[Long].collect().toSet
    assert(s3 === (5L until 10L).toSet)
  }

  test("leakageSafeSplit: clusters never straddle, singletons use own id") {
    import graft.ext.{Dedup, Sampling}
    import spark.implicits._
    // 3 clusters of near-identical docs + singletons
    val docs = (
      (0 until 3).flatMap(c => (0 until 4).map(i =>
        (c * 10 + i).toLong -> s"cluster $c shared shingle text body $i")) ++
      (100 until 120).map(i => i.toLong ->
        s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f") // zero shared shingles
    ).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2,
      threshold = 0.3)
    val clusters = Dedup.connectedComponents(pairs)
    val split = Sampling.leakageSafeSplit(docs, "doc_id", clusters,
      Seq("train" -> 0.8, "test" -> 0.2)).cache()
    try {
      // every doc assigned exactly once
      assert(split.count() === docs.count())
      // the leakage invariant: both ends of every near-dup pair share a split
      val straddle = pairs
        .join(split.select($"doc_id".as("id_a"), $"split".as("sa")), "id_a")
        .join(split.select($"doc_id".as("id_b"), $"split".as("sb")), "id_b")
        .filter($"sa" =!= $"sb").count()
      assert(straddle === 0, s"$straddle near-dup pairs straddle splits")
      // same invariant at cluster granularity
      val perKey = split.groupBy("split_key")
        .agg(countDistinct("split").as("n")).filter($"n" > 1).count()
      assert(perKey === 0)
      // singletons drew from their own id (split_key == doc_id)
      val singles = split.filter($"doc_id" >= 100)
      assert(singles.filter($"split_key" =!= $"doc_id").count() === 0)
      // both splits non-empty on the singleton population (sanity that
      // the cut actually splits)
      assert(singles.select("split").distinct().count() === 2)
      // a caller df that already carries a `comp` column must neither
      // break the join (ambiguous reference) nor lose its column
      // (ADVICE r8) — and the assignment is unchanged
      val withComp = docs.withColumn("comp", lit("user-data"))
      val split2 = Sampling.leakageSafeSplit(withComp, "doc_id", clusters,
        Seq("train" -> 0.8, "test" -> 0.2))
      assert(split2.columns.contains("comp"))
      assert(split2.filter($"comp" =!= "user-data").count() === 0)
      assert(split2.select("doc_id", "split").except(
        split.select("doc_id", "split")).count() === 0)
    } finally split.unpersist()
  }

  test("Bloom: no false negatives, bounded FPs, layout-independent bits") {
    import graft.ext.Bloom
    import spark.implicits._
    val memberKeys = (0L until 2000L by 2).toSeq // evens
    val members = memberKeys.toDF("k")
    val m1 = Bloom.build(members.repartition(1), $"k", 1000, fpp = 0.01)
    val m7 = Bloom.build(members.repartition(7), $"k", 1000, fpp = 0.01)
    // OR-fold determinism: identical words regardless of layout
    assert(m1.words.toSeq === m7.words.toSeq)
    assert(m1.k >= 1 && m1.numBits >= 1000)

    // hard guarantee: every inserted key passes the declarative probe
    // (this is also the JVM-builder / codegen-probe bit-parity check)
    val missed = members.filter(!Bloom.mightContain(m1, $"k")).count()
    assert(missed === 0, s"$missed false negatives")

    // disjoint probe set (odds): FP rate within 3x design
    val odds = (1L until 2000L by 2).toDF("k")
    val fps = odds.filter(Bloom.mightContain(m1, $"k")).count()
    assert(fps <= 30, s"fp rate ${fps / 1000.0} > 3x design 0.01")

    // prune: keeps all members, drops guaranteed non-members only
    val mixed = (0L until 2000L).toDF("k")
    val kept = Bloom.prune(mixed, $"k", m1).select("k").as[Long].collect().toSet
    assert(memberKeys.forall(kept.contains))
    assert((kept -- memberKeys).size.toLong === fps)
  }

  test("CountMin: overestimate-only, error-bounded, layout-independent grid") {
    import graft.ext.CountMin
    import spark.implicits._
    // 3 hot items (500 each) + 2000 singletons, like the MG spec
    val rows = (1 to 3).flatMap(h => Seq.fill(500)(s"hot$h")) ++
      (1 to 2000).map(i => s"cold$i")
    val n = rows.size.toLong // 3500
    val m1 = CountMin.build(rows.toDF("item").repartition(1), $"item",
      eps = 0.01, delta = 0.05)
    val m7 = CountMin.build(rows.toDF("item").repartition(7), $"item",
      eps = 0.01, delta = 0.05)
    // SUM-fold determinism: identical grid regardless of layout
    assert(m1.grid.toSeq === m7.grid.toSeq)
    assert(m1.n === n) // every row's mass is the stream length

    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probed = rows.distinct.toDF("item")
      .withColumn("est", CountMin.estimate(m1, $"item"))
      .as[(String, Long)].collect()
    val epsEff = math.E / m1.width
    probed.foreach { case (item, est) =>
      assert(est >= truth(item), s"$item underestimated: $est < ${truth(item)}")
    }
    val within = probed.count { case (item, est) =>
      est - truth(item) <= epsEff * n }
    assert(within >= 0.9 * probed.length,
      s"only $within/${probed.length} probes within eps*N")
    // hot items stand far above the noise floor
    (1 to 3).foreach { h =>
      val est = probed.find(_._1 == s"hot$h").get._2
      assert(est >= 500L && est <= 500L + (epsEff * n).toLong * 3)
    }
  }

  test("hardNegatives: band respected, equals filtered brute force") {
    val anchors = emb.filter($"vec_id" < 10)
    val hn = Similarity.hardNegatives(anchors, emb,
      "vec_id", "embedding", k = 5, maxCos = 0.5)
    val rows = hn.as[(Long, Long, Double, Int)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 < 0.5), "a negative crossed the cosine band")
    assert(rows.groupBy(_._1).values.forall(_.length <= 5))
    // equals the exact scorer band-filtered then re-ranked
    val brute = Similarity.bruteForceTopK(anchors, emb,
      "vec_id", "embedding", k = Int.MaxValue >> 1)
      .filter($"cos" < 0.5)
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cos".desc, $"neighbor_id".asc)))
      .filter($"rk" <= 5)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    assert(rows.map(r => (r._1, r._2)).toSet === brute)
  }
}
