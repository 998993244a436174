package graft.ext

import java.util.regex.{Matcher, Pattern}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Distributed byte-pair-encoding tokenizer training (Sennrich et al.
  * 2016, "Neural Machine Translation of Rare Words with Subword
  * Units") — the tokenizer-prep step next to [[TextStats.vocabulary]]:
  * learn the `numMerges` most frequent adjacent-symbol merges over a
  * corpus, then segment text with them.
  *
  * Scale design — the whole point of the classic algorithm survives
  * 100 TB because training NEVER iterates over the corpus:
  *
  *   1. '''One corpus pass''' builds the distinct-word histogram
  *      `(word, cnt)` ([[wordHistogram]]) — a single
  *      explode→groupBy shuffle that shrinks 100 TB of text to a
  *      vocabulary-sized table (natural-language corpora plateau at
  *      millions of distinct words; Heaps' law).
  *   2. '''Every merge iteration runs over the histogram''', not the
  *      corpus. Below `maxDriverWords` distinct words the histogram is
  *      collected and the loop runs driver-side (the same fast-path
  *      pattern as the ≤100k-edge union-find in
  *      [[Dedup.connectedComponents]]); above it, each iteration is
  *      one adjacent-pair explode→groupBy over the words table plus a
  *      1-row argmax collect — metadata-sized driver traffic either
  *      way, with `localCheckpoint` every few iterations to keep the
  *      lineage flat.
  *   3. '''Encoding is a broadcast join''', not per-row regex: the
  *      trained segmentation of every histogram word is itself a
  *      table ([[train]] returns it); [[encode]] explodes a document
  *      into positioned words and joins the (small, broadcast)
  *      segment map. Unseen words fall back to [[segmentWords]] —
  *      the merge loop applied to just the new batch's distinct
  *      words — so no code path ever regexes the full corpus.
  *
  * Semantics pinned down (both paths implement exactly these, and the
  * `text_bpe` driver query cross-checks them against each other):
  *   - pair statistics count '''overlapping''' occurrences ("aaa" has
  *     two "aa" pairs), as in the reference implementation;
  *   - merge application is greedy left-to-right '''non-overlapping'''
  *     ("aaa" + merge (a,a) → "aa a");
  *   - argmax tiebreak is (count desc, left asc, right asc) so
  *     training is a pure function of the histogram;
  *   - no end-of-word marker: merges act within words only (the
  *     GPT-2-style space-free variant); a marker is one
  *     `concat(word, lit(marker))` away if a caller wants it.
  */
object Bpe {

  /** One learned merge: `pairCount` is the (overlapping) adjacent-pair
    * count that won the argmax at selection time; `appliedFreq` is the
    * number of greedy non-overlapping replacements actually performed
    * (== the corpus-wide symbol-count reduction this merge caused).
    * The two differ only on self-overlapping runs like "aaa".
    */
  final case class Merge(rank: Int, left: String, right: String,
      pairCount: Long, appliedFreq: Long) {
    def pair: String = s"$left $right"
    def merged: String = left + right
  }

  /** Character split of a word column WITHOUT the trailing empty
    * element Spark's `split(_, "(?!^)")` keeps (limit −1 semantics —
    * Java's default split strips trailing empties, Spark's does not).
    */
  private def charSyms(c: Column): Column =
    filter(split(c, "(?!^)"), x => x =!= lit(""))

  /** Corpus → distinct-word histogram `(word, cnt)` — the one corpus
    * pass. Tokenization matches the house convention
    * (trim/lower/split on whitespace, as in [[TextStats]]).
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  /** Train `numMerges` merges over a `(word, cnt)` histogram. Returns
    * the ordered merge list and the segmented histogram
    * `(word, cnt, sym)` where `sym` is the word's final segmentation,
    * space-joined. Stops early when no adjacent pair reaches
    * `minCount`. `maxDriverWords` gates the driver fast path; pass 0
    * to force the distributed loop (tests do, to cross-check paths).
    */
  def train(hist: DataFrame, numMerges: Int, minCount: Long = 2L,
      maxDriverWords: Int = 1 << 16,
      checkpointEvery: Int = 8): (Seq[Merge], DataFrame) = {
    require(numMerges >= 0, "numMerges must be non-negative")
    require(minCount >= 1, "minCount must be at least 1")
    val probe =
      if (maxDriverWords <= 0) Array.empty[org.apache.spark.sql.Row]
      else hist.select("word", "cnt").limit(maxDriverWords + 1).collect()
    if (maxDriverWords > 0 && probe.length <= maxDriverWords)
      trainDriver(hist.sparkSession, probe, numMerges, minCount)
    else trainDistributed(hist, numMerges, minCount, checkpointEvery)
  }

  /** Merge list → DataFrame `(rank, left, right, pair_count,
    * applied_freq)` — the persistable model form: write it (and the
    * segment map [[train]] returns) to parquet next to the corpus, as
    * with the IVF centroid table or the MinHash band store, and any
    * later job reloads with [[mergesFromDf]].
    */
  def mergesToDf(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.pairCount, m.appliedFreq))
      .toDF("rank", "left", "right", "pair_count", "applied_freq")
  }

  /** Reload a merge list persisted via [[mergesToDf]] (rank order
    * restored; the collect is merge-list-sized — metadata, not data).
    */
  def mergesFromDf(df: DataFrame): Seq[Merge] =
    df.select("rank", "left", "right", "pair_count", "applied_freq")
      .orderBy("rank").collect().toSeq
      .map(r => Merge(r.getInt(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))

  /** Apply an ordered merge list to a space-joined symbol column —
    * the shared application kernel (greedy left-to-right via
    * zero-width word-boundary lookarounds, so consecutive matches
    * don't eat each other's delimiter). Expression depth grows with
    * `merges.size`; [[segmentWords]] is the loop-with-checkpoint form
    * for large merge lists.
    */
  def applyMergesCol(sym: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(sym)((c, m) =>
      regexp_replace(c,
        "(?<!\\S)" + Pattern.quote(m.left + " " + m.right) + "(?!\\S)",
        Matcher.quoteReplacement(m.merged)))

  /** Segment an arbitrary word set with a trained merge list:
    * `(word, ...)` → plus `sym`. Merges are applied in rank order in
    * blocks of 16 (one projection per block; `localCheckpoint` every
    * 8 blocks caps plan depth for thousand-merge vocabularies). This
    * is the OOV path — run it over a NEW batch's distinct words, then
    * [[encode]] via the extended segment map.
    */
  def segmentWords(words: DataFrame, merges: Seq[Merge],
      blockSize: Int = 16, checkpointBlocks: Int = 8): DataFrame = {
    var out = words.withColumn("sym",
      concat_ws(" ", charSyms(col("word"))))
    var blocks = 0
    merges.grouped(blockSize).foreach { g =>
      out = out.withColumn("sym", applyMergesCol(col("sym"), g))
      blocks += 1
      if (blocks % checkpointBlocks == 0)
        out = out.localCheckpoint(eager = true)
    }
    out
  }

  /** Encode documents with a segment map `(word, sym)`: explode into
    * positioned words, broadcast-join the map, re-assemble in order.
    * Output: `(idCol, bpe_tokens: Array[String], n_bpe_tokens)`.
    * Words absent from the map keep a per-character fallback — at
    * scale, pre-extend the map with [[segmentWords]] over the batch's
    * new words instead of relying on the fallback.
    */
  def encode(docs: DataFrame, idCol: String, textCol: String,
      segments: DataFrame): DataFrame = {
    val words = docs.select(col(idCol),
        posexplode(split(trim(lower(col(textCol))), "\\s+")))
      .filter(col("col") =!= "")
      .withColumnRenamed("col", "word")
    val encoded = words
      .join(broadcast(segments.select(col("word"),
        split(col("sym"), " ").as("_seg"))), Seq("word"), "left")
      .withColumn("_seg", coalesce(col("_seg"), charSyms(col("word"))))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("_seg"))))
        .getField("_seg")).as("bpe_tokens"))
    // empty / whitespace-only docs vanish in the explode — join back so
    // every input doc gets a row (empty token array), not a silent drop
    docs.select(col(idCol))
      .join(encoded, Seq(idCol), "left")
      .withColumn("bpe_tokens",
        coalesce(col("bpe_tokens"),
          array().cast(org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.StringType, containsNull = false))))
      .withColumn("n_bpe_tokens", size(col("bpe_tokens")))
  }

  // ---------------------------------------------------------------- driver

  /** UTF-8 byte-wise string ordering — matches Spark's UTF8String
    * binary comparison, so the driver argmax tiebreak agrees with the
    * distributed `orderBy` even on supplementary-plane symbols (plain
    * Java `compareTo` is UTF-16 code-unit order and disagrees there).
    */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }
  private val utf8Ordering: Ordering[String] = utf8Compare(_, _)

  /** Code-POINT split (surrogate pairs stay whole) — the driver twin
    * of [[charSyms]]'s regex split, which Java regex also performs at
    * code-point granularity.
    */
  private def codePointSyms(w: String): Array[String] =
    w.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  private def trainDriver(spark: org.apache.spark.sql.SparkSession,
      rows: Array[org.apache.spark.sql.Row], numMerges: Int,
      minCount: Long): (Seq[Merge], DataFrame) = {
    // mutable word list: (symbols, cnt)
    val words = rows.map(r => (codePointSyms(r.getString(0)), r.getLong(1)))
      .map { case (syms, cnt) => (scala.collection.mutable.ArrayBuffer(
        syms.toIndexedSeq: _*), cnt) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      words.foreach { case (syms, cnt) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + cnt
          i += 1
        }
      }
      implicit val ord: Ordering[String] = utf8Ordering
      val best = counts.toSeq
        .sortBy { case ((l, r), c) => (-c, l, r) }.headOption
      best match {
        case Some(((l, r), c)) if c >= minCount =>
          var applied = 0L
          words.foreach { case (syms, cnt) =>
            var i = 0
            while (i < syms.length - 1) {
              if (syms(i) == l && syms(i + 1) == r) {
                syms(i) = l + r
                syms.remove(i + 1)
                applied += cnt
              }
              i += 1 // greedy: the merged symbol is not re-paired leftward
            }
          }
          merges += Merge(rank, l, r, c, applied)
          rank += 1
        case _ => done = true
      }
    }
    import spark.implicits._
    val seg = words.map { case (syms, cnt) =>
      (syms.mkString(""), cnt, syms.mkString(" "))
    }.toSeq.toDF("word", "cnt", "sym")
    (merges.toSeq, seg)
  }

  // ----------------------------------------------------------- distributed

  /** Adjacent (overlapping) pair counts of a space-joined symbol
    * column, weighted by `cnt`.
    */
  private def pairCounts(words: DataFrame): DataFrame = {
    val arr = split(col("sym"), " ")
    words
      .select(col("cnt"), explode(transform(
        sequence(lit(0), size(arr) - lit(2)),
        i => struct(element_at(arr, i + 1).as("l"),
          element_at(arr, i + 2).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum(col("cnt")).as("c"))
  }

  private def trainDistributed(hist: DataFrame, numMerges: Int,
      minCount: Long, checkpointEvery: Int): (Seq[Merge], DataFrame) = {
    var words = hist.select(col("word"), col("cnt"),
      concat_ws(" ", charSyms(col("word"))).as("sym"))
      .localCheckpoint(eager = true)
    // each iteration's merged frame is CACHED before its two consumers
    // (the appliedFreq aggregate, then the next iteration's pair
    // counts) — without this every iteration re-executes the whole
    // uncheckpointed regex lineage once per consumer
    var cached: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      // words with a single symbol have sequence(0,-1) = empty — fine
      val best = pairCounts(words.filter(size(split(col("sym"), " ")) > 1))
        .orderBy(col("c").desc, col("l"), col("r")).limit(1).collect()
      best.headOption match {
        case Some(row) if row.getLong(2) >= minCount =>
          val (l, r, c) = (row.getString(0), row.getString(1), row.getLong(2))
          val m = Merge(rank, l, r, c, 0L)
          val next = words.withColumn("_n0", size(split(col("sym"), " ")))
            .withColumn("sym", applyMergesCol(col("sym"), Seq(m)))
            .withColumn("_n1", size(split(col("sym"), " ")))
            .persist()
          val applied = next
            .agg(sum(col("cnt") * (col("_n0") - col("_n1")))).head().getLong(0)
          cached.foreach(_.unpersist()) // next is materialized; prior frame free
          cached = Some(next)
          words = next.drop("_n0", "_n1")
          if ((rank + 1) % checkpointEvery == 0) {
            words = words.localCheckpoint(eager = true)
            cached.foreach(_.unpersist())
            cached = None
          }
          merges += m.copy(appliedFreq = applied)
          rank += 1
        case _ => done = true
      }
    }
    val out = words.select("word", "cnt", "sym").localCheckpoint(eager = true)
    cached.foreach(_.unpersist())
    (merges.toSeq, out)
  }
}
