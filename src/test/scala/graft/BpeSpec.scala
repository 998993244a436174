package graft

import graft.ext.{Bpe, Packing}
import org.apache.spark.sql.functions._

/** BPE trainer: hand-computed merges on the classic Sennrich-style
  * word histogram, driver-vs-distributed path equality, greedy
  * overlap semantics, conservation, encode round-trip; plus the
  * length-bucketed batching layout laws.
  */
class BpeSpec extends SparkSuite {
  import spark.implicits._

  // low×5 lower×2 newest×6 widest×3 — pair counts:
  //   es 9, st 9 (tie → "e s" wins lexicographically), lo 7, ow 7,
  //   we 8, ne 6, ew 6, wi 3, id 3, de 3, er 2
  private def sennrich = Seq(
    ("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    .toDF("word", "cnt")

  test("driver path learns the hand-computed merge sequence") {
    val (merges, seg) = Bpe.train(sennrich, numMerges = 4)
    assert(merges.map(m => (m.left, m.right, m.pairCount)) === Seq(
      ("e", "s", 9L),   // es/st tie at 9, pair-asc tiebreak
      ("es", "t", 9L),  // newest+widest
      ("l", "o", 7L),   // lo/ow tie at 7
      ("lo", "w", 7L)))
    val segMap = seg.collect().map(r =>
      r.getString(0) -> r.getString(2)).toMap
    assert(segMap("newest") === "n e w est")
    assert(segMap("low") === "low")
    assert(segMap("lower") === "low e r")
    assert(segMap("widest") === "w i d est")
  }

  test("distributed path matches the driver path merge-for-merge") {
    val (dMerges, dSeg) = Bpe.train(sennrich, numMerges = 6)
    val (xMerges, xSeg) =
      Bpe.train(sennrich, numMerges = 6, maxDriverWords = 0)
    assert(xMerges === dMerges)
    assert(xSeg.select("word", "sym").collect().map(r =>
        r.getString(0) -> r.getString(1)).toMap ===
      dSeg.select("word", "sym").collect().map(r =>
        r.getString(0) -> r.getString(1)).toMap)
  }

  test("overlapping pairs counted, greedy non-overlapping application") {
    val hist = Seq(("aaa", 4L), ("aa", 1L)).toDF("word", "cnt")
    for (cap <- Seq(1 << 16, 0)) {
      val (merges, seg) = Bpe.train(hist, numMerges = 1,
        maxDriverWords = cap)
      // overlapping count: aaa has two (a,a) pairs ×4 + aa has one ×1
      assert(merges.head.pairCount === 9L)
      // greedy: each aaa applies ONE merge, aa applies one
      assert(merges.head.appliedFreq === 5L)
      val m = seg.collect().map(r => r.getString(0) -> r.getString(2)).toMap
      assert(m("aaa") === "aa a")
      assert(m("aa") === "aa")
    }
  }

  test("symbol conservation: reduction equals sum of applied freqs") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hist = Bpe.wordHistogram(docs, "text").cache()
    val (merges, _) = Bpe.train(hist, numMerges = 12)
    val seg = Bpe.segmentWords(hist.select("word", "cnt"), merges)
    val before = hist.agg(sum(col("cnt") * length(col("word"))))
      .head().getLong(0)
    val after = seg.agg(sum(col("cnt") * size(split(col("sym"), " "))))
      .head().getLong(0)
    assert(before - after === merges.map(_.appliedFreq).sum)
    assert(merges.map(_.pairCount) === merges.map(_.pairCount)
      .sorted(Ordering[Long].reverse))
    hist.unpersist()
  }

  test("randomized histograms: driver and distributed paths agree") {
    val rng = new scala.util.Random(1234)
    for (c <- 0 until 8) {
      val n = 3 + rng.nextInt(6)
      val hist = Seq.fill(n) {
        val len = 1 + rng.nextInt(6)
        val w = Seq.fill(len)(('a' + rng.nextInt(3)).toChar).mkString
        (w, (1 + rng.nextInt(5)).toLong)
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }
        .toSeq.toDF("word", "cnt")
      val (d, dSeg) = Bpe.train(hist, numMerges = 4, minCount = 1)
      val (x, xSeg) = Bpe.train(hist, numMerges = 4, minCount = 1,
        maxDriverWords = 0)
      assert(x === d, s"case $c: merge lists diverge")
      assert(xSeg.select("word", "sym").collect().map(r =>
          r.getString(0) -> r.getString(1)).toMap ===
        dSeg.select("word", "sym").collect().map(r =>
          r.getString(0) -> r.getString(1)).toMap, s"case $c: segmentation")
    }
  }

  test("encode reassembles in word order and falls back on OOV") {
    val (_, seg) = Bpe.train(sennrich, numMerges = 4)
    val docs = Seq((1L, "newest low abc"), (2L, "lower widest"))
      .toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "doc_id", "text", seg)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[String](1)).toMap
    assert(enc(1L) === Seq("n", "e", "w", "est", "low", "a", "b", "c"))
    assert(enc(2L) === Seq("low", "e", "r", "w", "i", "d", "est"))
  }

  test("model persistence: merges and segment map round-trip via parquet") {
    val (merges, seg) = Bpe.train(sennrich, numMerges = 4)
    val dir = tmpDir("graft-bpe")
    Bpe.mergesToDf(spark, merges).write.parquet(s"$dir/merges")
    seg.write.parquet(s"$dir/segments")
    val merges2 = Bpe.mergesFromDf(spark.read.parquet(s"$dir/merges"))
    assert(merges2 === merges)
    val seg2 = spark.read.parquet(s"$dir/segments")
    val docs = Seq((1L, "newest low"), (2L, "lower widest"))
      .toDF("doc_id", "text")
    val a = Bpe.encode(docs, "doc_id", "text", seg)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = Bpe.encode(docs, "doc_id", "text", seg2)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(a === b)
    // OOV on new data segments identically through the reloaded merges
    val oov = Seq((3L, "lowest")).toDF("doc_id", "text")
      .select(explode(split(col("text"), " ")).as("word")).distinct()
    val segOov = Bpe.segmentWords(oov, merges2)
    assert(segOov.collect().map(r => r.getString(0) -> r.getString(1))
      .toMap === Map("lowest" -> "low est"))
  }

  test("length batches: batch size cap, padded length, bucket law") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = Packing.lengthBatches(docs, "doc_id",
      size(split(trim(lower(col("text"))), "\\s+")),
      boundaries = Seq(16, 32, 64, 128), batchSize = 8, shards = 4)
      .cache()
    // every batch holds at most batchSize docs
    val oversize = out.groupBy("bucket", "shard", "batch_id")
      .agg(count(lit(1)).as("n")).filter(col("n") > 8).count()
    assert(oversize === 0L)
    // batch_max is the max token count of the batch; waste non-negative
    assert(out.filter(col("pad_waste") < 0).count() === 0L)
    val bad = out.groupBy("bucket", "shard", "batch_id")
      .agg(max("n_tokens").as("m"), first("batch_max").as("bm"))
      .filter(col("m") =!= col("bm")).count()
    assert(bad === 0L)
    // bucket law: bucket == number of boundaries <= n_tokens
    val law = out.filter(col("bucket") =!=
      (when(col("n_tokens") >= 16, 1).otherwise(0)
        + when(col("n_tokens") >= 32, 1).otherwise(0)
        + when(col("n_tokens") >= 64, 1).otherwise(0)
        + when(col("n_tokens") >= 128, 1).otherwise(0))).count()
    assert(law === 0L)
    // bucketed batching wastes no more padding than id-ordered batching
    val naive = Packing.lengthBatches(docs, "doc_id",
      size(split(trim(lower(col("text"))), "\\s+")),
      boundaries = Seq(0), batchSize = 8, shards = 1)
    val wB = out.agg(sum("pad_waste")).head().getLong(0)
    val wN = naive.agg(sum("pad_waste")).head().getLong(0)
    assert(wB <= wN, s"bucketed padding waste $wB > naive $wN")
    out.unpersist()
  }

  test("encode emits a row with empty tokens for whitespace-only docs") {
    val (_, seg) = Bpe.train(sennrich, numMerges = 2)
    val docs = Seq((1L, "low"), (2L, "   "), (3L, ""))
      .toDF("doc_id", "text")
    val enc = Bpe.encode(docs, "doc_id", "text", seg)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[String](1), r.getInt(2))).toMap
    assert(enc.keySet === Set(1L, 2L, 3L))
    assert(enc(2L) === (Seq.empty[String], 0))
    assert(enc(3L) === (Seq.empty[String], 0))
    assert(enc(1L)._2 > 0)
  }
}
