package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Text analysis for training-data pipelines over the `documents`
  * table: quality stats, language ID, token counting, fingerprinting.
  * Everything is built-in-function Spark (codegen'd, no UDFs), so the
  * whole module rides whole-stage codegen and pushes column pruning to
  * the scan.
  */
object TextStats {

  private def toks(text: Column): Column = split(trim(lower(text)), "\\s+")

  private val stopwords = Seq("the", "a", "an", "and", "or", "of", "to",
    "in", "is", "it", "for", "on", "with", "as", "at", "by")

  /** Per-document quality stats: char/token counts, distinct-token
    * ratio, stopword ratio, mean token length, punctuation count, and a
    * deterministic composite quality score (all exact integer/double
    * arithmetic — SQL-oracle-able).
    */
  def stats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = toks(col(textCol))
    val nTok = size(t).cast(DoubleType)
    docs.select(
      col(idCol).as("doc_id"),
      length(col(textCol)).as("n_chars"),
      size(t).as("n_tokens"),
      size(array_distinct(t)).as("n_uniq_tokens"),
      (size(array_distinct(t)).cast(DoubleType) / nTok).as("uniq_ratio"),
      (size(filter(t, tk => tk.isin(stopwords: _*))).cast(DoubleType) / nTok)
        .as("stopword_ratio"),
      ((length(col(textCol)) - (size(t) - 1)).cast(DoubleType) / nTok)
        .as("mean_token_len"),
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), "[.,!?;:]", "")))
        .as("n_punct"))
  }

  /** The composite-quality column expression (shared by [[qualityScore]]
    * and [[profile]] so the two can never drift).
    */
  private def qualityExpr(textCol: Column): Column = {
    val t = toks(textCol)
    val nTok = size(t).cast(DoubleType)
    round(
      least(lit(1.0), nTok / lit(64.0)) * lit(0.4)
        + (size(array_distinct(t)).cast(DoubleType) / nTok) * lit(0.4)
        + least(lit(1.0),
          (size(filter(t, tk => tk.isin(stopwords: _*))).cast(DoubleType)
            / nTok) * lit(4.0)) * lit(0.2),
      6)
  }

  /** Composite quality score in [0,1]: rewards lexical diversity and a
    * sane stopword rate, penalizes very short docs. Deterministic
    * double arithmetic.
    */
  def qualityScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      qualityExpr(col(textCol)).as("quality"))

  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of ", " is ", " to "),
    "de" -> Seq(" der ", " und ", " die ", " ist ", " das "),
    "fr" -> Seq(" le ", " la ", " et ", " est ", " les "),
    "es" -> Seq(" el ", " los ", " es ", " y ", " las "),
    "zh" -> Seq("的", "是", "了", "在", "不"))

  private def langScored(docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, Seq[Column]) = {
    val padded = concat(lit(" "), lower(col(textCol)), lit(" "))
    def score(ms: Seq[String]): Column =
      ms.map(m => when(padded.contains(m),
        (length(padded) - length(regexp_replace(padded, java.util.regex.Pattern.quote(m), "")))
          / length(lit(m))).otherwise(lit(0)))
        .reduce(_ + _).cast(DoubleType)
    val scored = langMarkers.foldLeft(
      docs.select(col(idCol).as("doc_id"), col(textCol))) {
      case (d, (lang, ms)) => d.withColumn(s"sc_$lang", score(ms))
    }
    val best = langMarkers.map { case (lang, _) =>
      struct(col(s"sc_$lang").as("score"), lit(lang).as("lang"))
    }
    (scored, best)
  }

  /** Language ID by character/stopword heuristics — an n-gram-profile
    * classifier over tiny built-in profiles (public langid approach,
    * scoring per-language marker hits; no model artifacts). Returns
    * (doc_id, predicted_lang, score).
    */
  def languageId(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (scored, best) = langScored(docs, idCol, textCol)
    scored.select(col("doc_id"),
      greatest(best: _*).getField("lang").as("predicted_lang"),
      greatest(best: _*).getField("score").as("score"))
  }

  /** SINGLE-SCAN doc profile: language prediction + quality together —
    * what the curation funnel consumes (computing them via
    * [[languageId]] + [[qualityScore]] separately scans the corpus
    * twice and joins; identical values, asserted in ExtSpec).
    */
  def profile(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (scored, best) = langScored(docs, idCol, textCol)
    scored.select(col("doc_id"),
      greatest(best: _*).getField("lang").as("predicted_lang"),
      greatest(best: _*).getField("score").as("score"),
      qualityExpr(col(textCol)).as("quality"))
  }

  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * lexer (`\w+` runs and single non-space symbols — the
    * pre-tokenization split most BPE vocabularies use), plus a
    * chars-per-token estimate of ~4 chars/token.
    */
  def tokenCounts(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      size(toks(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]"), lit(0)))
        .as("bpeish_tokens"),
      ceil(length(col(textCol)).cast(DoubleType) / 4.0).cast(IntegerType)
        .as("est_tokens_4cpt"))

  /** Gopher-style repetition signals per document (Rae et al. 2021,
    * Table A1): fraction of n-gram occurrences held by the top word
    * n-gram (n = 2, 3), fraction of line characters in exactly-repeated
    * lines, and the duplicate-token fraction. Each n-gram/line signal
    * is ONE codegen'd kernel call per document
    * ([[graft.functions.RepetitionKernel]]) — the whole operator is
    * map-only (no explode, no shuffle), so at 100 TB it costs exactly
    * one corpus scan. Values rounded to 6 dp (SQL-oracle-able).
    */
  def repetitionStats(docs: DataFrame, idCol: String,
      textCol: String): DataFrame =
    repetitionStatsOn(docs, idCol, textCol, col(textCol))

  /** [[repetitionStats]] with the duplicate-line signal computed over
    * an arbitrary line-carrying expression (e.g. a delimiter-to-'\n'
    * rewrite of the same text) — still ONE projection over ONE scan.
    */
  def repetitionStatsOn(docs: DataFrame, idCol: String, textCol: String,
      lineText: Column): DataFrame = {
    val s = docs.sparkSession
    val t = toks(col(textCol))
    val nTok = size(t).cast(DoubleType)
    docs.select(
      col(idCol).as("doc_id"),
      round(graft.functions.TextFunctions.topNgramFrac(s, col(textCol), 2), 6)
        .as("top2gram_frac"),
      round(graft.functions.TextFunctions.topNgramFrac(s, col(textCol), 3), 6)
        .as("top3gram_frac"),
      round(graft.functions.TextFunctions.dupLineFrac(s, lineText), 6)
        .as("dup_line_frac"),
      round((nTok - size(array_distinct(t)).cast(DoubleType)) / nTok, 6)
        .as("dup_token_frac"))
  }

  /** Keep only documents below the repetition thresholds — the Gopher
    * repetition filter (defaults in the ballpark of the published
    * cutoffs). Composes as a semi-join-free filter: the stats are
    * computed inline on the same scan, so the filter pushes down to a
    * single map-only pass.
    */
  def repetitionFilter(docs: DataFrame, idCol: String, textCol: String,
      maxTop2: Double = 0.20, maxTop3: Double = 0.18,
      maxDupLine: Double = 0.30): DataFrame = {
    val s = docs.sparkSession
    docs.filter(
      graft.functions.TextFunctions.topNgramFrac(s, col(textCol), 2) <= maxTop2 &&
        graft.functions.TextFunctions.topNgramFrac(s, col(textCol), 3) <= maxTop3 &&
        graft.functions.TextFunctions.dupLineFrac(s, col(textCol)) <= maxDupLine)
  }

  /** Rolling polynomial fingerprint of the normalized token stream
    * (Karp-Rabin style: acc = (acc*31 + tokenHash) mod (2^31−1), folded
    * left-to-right — deterministic, order-sensitive, ANSI-safe since
    * acc*31 < 2^36). Equal fingerprints ⇒ near-certainly identical
    * normalized content; cheaper than carrying full text through a
    * shuffle.
    *
    * The per-token hash is the md5-60-bit construction (top 15 hex
    * digits of md5, parsed base-16) rather than xxhash64 — BOTH engines
    * compute it identically, which is what lets the raw per-doc
    * fingerprint surface carry a full value-level DuckDB oracle
    * (list_reduce over the same digits) instead of a rows-only check.
    */
  /** Corpus-trained bigram language-model scoring — the CCNet/KenLM
    * quality-signal shape, Spark-first: train the model ON the corpus
    * with one shuffle, score every document with one equi-join.
    *
    *   score(d) = mean over d's bigrams of
    *              ln( (c(w1,w2) + α) / (c(w1) + α·V) )
    *
    * — the Laplace-smoothed bigram log-likelihood per token (higher =
    * more typical of the corpus; gibberish and boilerplate-free outlier
    * text scores low). A curation pipeline thresholds low-percentile
    * scores the way CCNet buckets wiki-LM perplexity.
    *
    * Scale shape (100 TB):
    *   - TRAIN: bigram and unigram counts are two hash aggregates over
    *     the exploded token stream — map-side combined, shuffle carries
    *     O(distinct n-grams per mapper), exactly the exact-dedup
    *     profile. V (vocab size) is a lazy 1-row broadcast scalar, so
    *     the whole operator is one plan with no eager driver job.
    *   - SCORE: each document bigram matches EXACTLY ONE model row, so
    *     the join cannot blow up (unlike a pair self-join, there is no
    *     f² term); hot bigrams skew partitions, which AQE skew-join
    *     splits. With a frequency-pruned model (top-K n-grams) the
    *     model side broadcasts and the score pass is map-only.
    *   - Docs with fewer than 2 tokens have no bigram evidence and are
    *     not scored (mirrored by the oracle).
    *
    * Bigram extraction is one HOF eval per document (like
    * [[Dedup.shinglesDeclarative]] — per-doc, not per-pair, so the
    * interpreted HOF is off every hot loop). Exact integer counts +
    * one `ln` per distinct bigram; `round(…, 6)` absorbs cross-engine
    * libm ulp drift, so the surface is value-level oracle-able.
    */
  def lmScore(docs: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.4): DataFrame = {
    val t = toks(col(textCol))
    // (id, w1, w2) with multiplicity, docs with ≥ 2 tokens only
    val bg = docs.select(col(idCol).as("doc_id"), t.as("w"))
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("w1"),
          element_at(col("w"), i + 1).as("w2")))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
    val uni = docs.select(explode(t).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("n1"))
    // vocab size as a LAZY broadcast scalar (crossJoin of a 1-row
    // aggregate) — an eager uni.count() here would run a separate
    // tokenize+aggregate job before the plan even executes; this way
    // the whole operator is ONE plan (callers can persist `docs` or
    // let AQE's runtime stage reuse share the identical uni shuffle
    // between the scalar and the n1 join)
    val vocab = uni.agg(count(lit(1)).as("vs"))
    val bi = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
    bg
      .join(bi, Seq("w1", "w2"))
      .join(uni.withColumnRenamed("tk", "w1"), Seq("w1"))
      .crossJoin(broadcast(vocab))
      .groupBy("doc_id")
      .agg(round(avg(log((col("n2") + lit(alpha)) /
        (col("n1") + lit(alpha) * col("vs")))), 6).as("lm_score"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Trigram stupid-backoff LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation" — the deliberately
    * unnormalized backoff score built FOR distributed count-based
    * training, which is why it is the web-scale sibling of
    * [[lmScore]]'s Laplace bigram):
    *
    *   S(w₃|w₁w₂) = c(w₁w₂w₃)/c(w₁w₂)            if the trigram was seen
    *              = λ · c(w₂w₃)/c(w₂)             else if the bigram was
    *              = λ² · (c(w₃)+0.5)/(N+0.5)      else (unigram floor —
    *                the +0.5 keeps an OOV token finite instead of ln 0)
    *
    * with λ = 0.4 (the paper's value). `score(d)` = mean ln S over the
    * doc's trigram positions, `round(…, 6)` for cross-engine parity.
    *
    * TRAIN and SCORE are separate inputs — scoring a corpus with its
    * own counts never backs off (every trigram is its own evidence);
    * the CCNet-style use trains on a reference corpus and scores the
    * crawl. Counts are three hash aggregates over the train stream
    * (map-side combined); each scored position LEFT-joins its ≤1 model
    * row per stage, so the join cannot blow up and hot n-grams are
    * AQE-skew-split, exactly the [[lmScore]] scale shape. N rides as a
    * lazy 1-row broadcast scalar. Docs with < 3 tokens emit nothing.
    *
    * Output: `(doc_id, lm_score, n_trigrams, n_backoff, n_oov)` —
    * backoff = positions that left the trigram stage, oov = positions
    * whose w₃ the train corpus never saw.
    */
  def lmBackoffScore(train: DataFrame, docs: DataFrame, idCol: String,
      textCol: String, lambda: Double = 0.4): DataFrame = {
    val tTr = toks(col(textCol))
    def grams(src: DataFrame, n: Int): DataFrame =
      src.select(tTr.as("w"))
        .filter(size(col("w")) >= n)
        .select(explode(transform(
          sequence(lit(1), size(col("w")) - (n - 1)),
          i => struct((0 until n).map(j =>
            element_at(col("w"), i + j).as(s"g$j")): _*))).as("g"))
        .select((0 until n).map(j => col(s"g.g$j").as(s"g$j")): _*)
    val tri = grams(train, 3).groupBy("g0", "g1", "g2")
      .agg(count(lit(1)).as("n3"))
    val bi = grams(train, 2).groupBy("g0", "g1")
      .agg(count(lit(1)).as("n2"))
    val uni = train.select(explode(tTr).as("tk"))
      .groupBy("tk").agg(count(lit(1)).as("n1"))
    val total = uni.agg(sum("n1").as("nn"))
    val tg = docs.select(col(idCol).as("doc_id"), tTr.as("w"))
      .filter(size(col("w")) >= 3)
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), size(col("w")) - 2),
        i => struct(element_at(col("w"), i).as("w1"),
          element_at(col("w"), i + 1).as("w2"),
          element_at(col("w"), i + 2).as("w3")))).as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"),
        col("g.w2").as("w2"), col("g.w3").as("w3"))
    val scored = tg
      .join(tri.select(col("g0").as("w1"), col("g1").as("w2"),
        col("g2").as("w3"), col("n3")), Seq("w1", "w2", "w3"), "left")
      .join(bi.select(col("g0").as("w1"), col("g1").as("w2"),
        col("n2").as("n12")), Seq("w1", "w2"), "left")
      .join(bi.select(col("g0").as("w2"), col("g1").as("w3"),
        col("n2").as("n23")), Seq("w2", "w3"), "left")
      .join(uni.select(col("tk").as("w2"), col("n1").as("n1w2")),
        Seq("w2"), "left")
      .join(uni.select(col("tk").as("w3"), col("n1").as("n1w3")),
        Seq("w3"), "left")
      .crossJoin(broadcast(total))
      .withColumn("s",
        when(col("n3").isNotNull,
          log(col("n3").cast(DoubleType) / col("n12")))
          .when(col("n23").isNotNull,
            log(lit(lambda) * col("n23") / col("n1w2")))
          .otherwise(log(lit(lambda * lambda) *
            (coalesce(col("n1w3"), lit(0L)) + lit(0.5)) /
            (col("nn") + lit(0.5)))))
    scored.groupBy("doc_id")
      .agg(round(avg(col("s")), 6).as("lm_score"),
        count(lit(1)).as("n_trigrams"),
        count(when(col("n3").isNull, lit(1))).as("n_backoff"),
        count(when(col("n1w3").isNull, lit(1))).as("n_oov"))
  }

  def fingerprint(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      aggregate(toks(col(textCol)), lit(0L),
        (acc, tk) => pmod(acc * 31L +
          pmod(conv(substring(md5(tk.cast("binary")), 1, 15), 16, 10)
            .cast(LongType), lit(2147483647L)),
          lit(2147483647L))).as("fingerprint"))

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken 2003, the MOSS
    * selection): from each document's word k-gram hash sequence, keep
    * the rightmost-minimal hash of every length-`w` window — the
    * fingerprint family's GUARANTEED selection (any shared run of
    * ≥ w+k−1 words between two documents shares at least one selected
    * fingerprint; expected density 2/(w+1)), next to [[fingerprint]]'s
    * single whole-doc hash.
    *
    * Formulation chosen for the engine: position `p` is selected iff
    * its (hash, −pos) key equals the key-minimum of SOME w-window
    * containing it — tested directly as `w` bounded-frame window
    * minima over the same (doc, pos) sort: ONE Exchange on the doc
    * id, one sort, `w` frame passes, no self-join (the run-length
    * formulation needs a band self-join; the aligned-frame OR is
    * equivalent and stays in window land). Frames clamp at document
    * edges, which degrades gracefully (a doc shorter than w+k−1
    * words still yields its global minimum). Everything is md5-60
    * integer arithmetic on the gram text — the DuckDB oracle replays
    * every selected row exactly.
    *
    * Output: `(idCol, pos, fp)` for selected gram positions; docs
    * with fewer than k words emit nothing.
    */
  def winnowing(docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3, w: Int = 4, seed: Long = 42L): DataFrame = {
    require(k > 0 && w > 0, "k and w must be positive")
    val tk = toks(col(textCol))
    // Shuffle BEFORE the explode, on the window's own key: the gram
    // build + md5 dominate the query, and placing the doc_id exchange
    // first (a) ships compact docs instead of exploded grams and
    // (b) satisfies the window's partitioning, so the heavy projection
    // runs post-shuffle on every core with NO second exchange. (Guard
    // BEFORE sequence: size<k would make sequence(0, size-k) count
    // DOWN, not empty.)
    val grams = docs
      .filter(size(tk) >= k)
      .select(col(idCol), col(textCol))
      // explicit count: a bare repartition(col) is AQE-coalesced back
      // to one partition on a small doc table, single-tasking the
      // dominant stage
      .repartition(docs.sparkSession.sparkContext.defaultParallelism,
        col(idCol))
      .select(col(idCol), posexplode(
        transform(sequence(lit(0), size(tk) - lit(k)),
          i => concat_ws(" ", slice(tk, i + 1, lit(k))))))
      .withColumnRenamed("col", "gram")
    val h = graft.functions.PortableHash.h60("wfp", seed, col("gram"))
    val keyed = grams
      .select(col(idCol), col("pos"), h.as("fp"),
        (-col("pos")).cast("long").as("_np"))
      .withColumn("_key", struct(col("fp").as("h"), col("_np").as("np")))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
    val selected = (0 until w).map { a =>
      col("_key") === min(col("_key")).over(
        win.rowsBetween(-a.toLong, (w - 1 - a).toLong))
    }.reduce(_ || _)
    // window exprs must live in a projection, not the filter itself
    keyed.withColumn("_sel", selected)
      .filter(col("_sel"))
      .select(col(idCol), col("pos"), col("fp"))
  }

  /** Per-document TF-IDF keyword extraction: the `topN` terms of each
    * document by tf·idf with idf = ln(N / df) (raw document-frequency
    * idf; terms present in every document score 0 and sink to the
    * bottom). The standard cheap relevance signal a curation pipeline
    * uses for topic tagging and domain-classifier features.
    *
    * Scale shape (100 TB):
    *   - Per-(doc, term) counts are ONE exploded-token hash aggregate
    *     (map-side combined — the exact-dedup shuffle profile). The
    *     (doc, term) aggregate is PERSISTED before the fan-out (it is
    *     per-doc-vocab-sized, orders of magnitude smaller than the
    *     corpus): document frequency and the scoring join both read
    *     the materialized index, collapsing the operator to one corpus
    *     scan (r14; the one-shot two-scan shape measured 7.4× for 10×
    *     data on the sf1 board).
    *   - N is a lazy 1-row broadcast scalar over a COLUMNLESS count
    *     scan (parquet metadata counting, ReadSchema struct<>); the
    *     idf join keys on term, where the vocab side is
    *     corpus-vocabulary-sized — AQE broadcasts it when it fits, and
    *     hot terms (stopwords) are skew-split otherwise.
    *   - The ranking window partitions by doc_id — never global — and
    *     Spark's WindowGroupLimit pushes the `topN` cut below the full
    *     window (partial group-limits before the shuffle).
    *
    * Ranking is over the ROUNDED (6 dp) score with the term string as
    * tiebreak, so rank order is cross-engine deterministic despite
    * `ln`'s 1-ulp libm drift (same discipline as [[lmScore]]).
    */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
      topN: Int = 3): DataFrame =
    tfidfKeywordsReleasable(docs, idCol, textCol, topN)._1

  /** [[tfidfKeywords]] plus a RELEASE HANDLE for the persisted
    * (doc, term) aggregate — same contract as
    * [[Dedup.winnowPairsReleasable]]: library callers outside the
    * harness's clearCache() discipline consume the result, then
    * `release()` to free the pinned blocks (the frame stays valid and
    * recomputes from source afterwards).
    */
  def tfidfKeywordsReleasable(docs: DataFrame, idCol: String,
      textCol: String, topN: Int = 3): (DataFrame, () => Unit) = {
    // PERSIST the (doc, term) aggregate — the scaladoc's 100 TB note,
    // now done by the operator itself: tf feeds BOTH the df branch and
    // the scoring join, and without a materialization each re-tokenizes
    // the corpus (the r14 sf1 board measured the two-scan shape at
    // 7.4× for 10× data). The persisted artifact is per-doc-VOCAB
    // sized (post map-side combine), orders of magnitude under the
    // exploded token stream; deliberately NOT pre-partitioned by term —
    // an explicit term exchange below the aggregate would ship raw
    // hot-term occurrences without map-side combine (stopword skew).
    val tf = docs
      .select(col(idCol).as("doc_id"), explode(toks(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // tf is already distinct per (doc, term): its per-term row count IS
    // the document frequency — reuses the shuffle, no count_distinct
    val dfq = tf.groupBy("term").agg(count(lit(1)).as("df_docs"))
    val nDocs = docs.agg(count(lit(1)).as("_n_docs"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("tfidf").desc, col("term").asc)
    val ranked = tf.join(dfq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", round(col("tf") *
        log(col("_n_docs").cast(DoubleType) / col("df_docs").cast(DoubleType)),
        6))
      .withColumn("kw_rank", row_number().over(w))
      .filter(col("kw_rank") <= topN)
      .select("doc_id", "kw_rank", "term", "tf", "df_docs", "tfidf")
    (ranked, () => tf.unpersist(blocking = false): Unit)
  }

  /** Corpus vocabulary head: the `topK` terms by total token count with
    * cumulative coverage share — the profile a tokenizer-training or
    * stopword-curation pass reads first (how much of the corpus do the
    * top-K terms cover?).
    *
    * Scale shape (100 TB): one exploded-token hash aggregate (map-side
    * combined) to term counts; top-K selects via TakeOrderedAndProject
    * (never a global sort of the vocabulary); the total-token
    * denominator is a lazy 1-row broadcast scalar computed as a
    * MAP-ONLY sum of per-doc `size()` counts — it re-scans the text
    * column but never re-runs the explode+aggregate. The ONLY
    * unpartitioned window runs over the K already-selected rows —
    * bounded by `topK`, not by the corpus, which is what makes a global
    * cumulative sum admissible here.
    */
  def vocabulary(docs: DataFrame, textCol: String,
      topK: Int = 100): DataFrame = {
    val tc = docs.select(explode(toks(col(textCol))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("n_tokens"))
    // total tokens WITHOUT re-running the vocab aggregate: a map-only
    // sum of per-doc token counts (size() never explodes into rows)
    val total = docs.agg(
      sum(size(toks(col(textCol))).cast(LongType)).as("_total"))
    def ord = Seq(col("n_tokens").desc, col("term").asc)
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(ord: _*)
    tc.orderBy(ord: _*).limit(topK)
      .crossJoin(broadcast(total))
      .select(
        row_number().over(w).as("vocab_rank"),
        col("term"), col("n_tokens"),
        round(sum("n_tokens").over(w.rowsBetween(W.unboundedPreceding,
            W.currentRow)).cast(DoubleType) /
          col("_total").cast(DoubleType), 6).as("cum_share"))
  }

  /** C4-style heuristic cleaning (Raffel et al. 2020, "Exploring the
    * Limits of Transfer Learning…" §2.2 — the public rule set behind
    * the C4 corpus), line level then document level:
    *
    *   - a LINE survives iff it has ≥ `minWordsPerLine` whitespace
    *     words, (optionally) ends in terminal punctuation
    *     (`. ! ? "`), and contains no banned substring
    *     (case-insensitive; C4 drops lines with the word
    *     "javascript");
    *   - a DOCUMENT survives iff its full text contains none of
    *     `bannedDocSubstrings` (C4: "lorem ipsum", a curly brace) and
    *     ≥ `minLinesPerDoc` lines survived.
    *
    * Output: one row per SURVIVING doc — `(doc_id, n_lines, n_kept,
    * clean_text)` with the surviving lines rejoined in order. Lines
    * are `\n`-split and space-trimmed before any rule (the same
    * convention as the line-dedup family, so the two compose).
    *
    * Scale: one map-only pass, no shuffle — the array lambdas are
    * interpreted (Spark HOFs are CodegenFallback) but the work is
    * O(chars) per row with no join; at 100 TB this is scan-bound like
    * every other map-only text kernel here. C4's remaining rule —
    * dropping any three-sentence span seen twice — is the span-dedup
    * operator ([[Dedup.duplicatedSpans]]); run it downstream.
    */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
      minWordsPerLine: Int = 3, minLinesPerDoc: Int = 3,
      requireTerminalPunct: Boolean = true,
      bannedLineWords: Seq[String] = Seq("javascript"),
      bannedDocSubstrings: Seq[String] = Seq("lorem ipsum", "{"))
      : DataFrame = {
    def lineOk(l: Column): Column = {
      val wc = size(split(l, "\\s+"))
      val base = wc >= lit(minWordsPerLine) && length(l) > 0
      val punct =
        if (requireTerminalPunct) l.rlike("[.!?\"]$") else lit(true)
      bannedLineWords.foldLeft(base && punct)((acc, w) =>
        acc && !lower(l).contains(lit(w)))
    }
    val trimmedLines = transform(split(col(textCol), "\n"), l => trim(l))
    val docOk = bannedDocSubstrings.foldLeft(lit(true))((acc, sub) =>
      acc && !lower(col(textCol)).contains(lit(sub)))
    docs
      .withColumn("_lines", trimmedLines)
      .withColumn("_kept", filter(col("_lines"), lineOk _))
      .filter(docOk && size(col("_kept")) >= lit(minLinesPerDoc))
      .select(col(idCol).as("doc_id"),
        size(col("_lines")).cast(LongType).as("n_lines"),
        size(col("_kept")).cast(LongType).as("n_kept"),
        array_join(col("_kept"), "\n").as("clean_text"))
  }
}
