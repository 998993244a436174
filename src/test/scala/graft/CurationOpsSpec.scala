package graft

import graft.ext.{Decontaminate, Pii, TextStats}
import org.apache.spark.sql.functions._

/** Curation-operator behavior: PII detect/redact, benchmark
  * decontamination, Gopher repetition signals — constructed inputs with
  * hand-computed expectations (the driver's DuckDB oracles cover the
  * corpus-scale recomputation; these pin the operator semantics).
  */
class CurationOpsSpec extends SparkSuite {
  import spark.implicits._

  // ———————————————————————————————————————— PII

  private val piiDocs = Seq(
    (1L, "reach me at alice.smith+work@example.co.uk or bob@x.io today"),
    (2L, "call 555-867-5309 or 555.123.4567 now"),
    (3L, "server 192.168.0.1 and 10.0.255.7 are up"),
    (4L, "ssn 123-45-6789 on file"),
    (5L, "nothing sensitive here at all"),
    (6L, "mix: a@b.com 555-111-2222 127.0.0.1 999-88-7777"))

  test("pii detect: per-family counts and has_pii") {
    val got = Pii.detect(piiDocs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, Int, Int, Int, Int, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) === ((1L, 2, 0, 0, 0, true)))
    assert(got(2L) === ((2L, 0, 0, 2, 0, true)))
    assert(got(3L) === ((3L, 0, 0, 0, 2, true)))
    assert(got(4L) === ((4L, 0, 1, 0, 0, true)))
    assert(got(5L) === ((5L, 0, 0, 0, 0, false)))
    assert(got(6L) === ((6L, 1, 1, 1, 1, true)))
  }

  test("pii redact: placeholders substituted, clean text untouched") {
    val got = Pii.redact(piiDocs.toDF("doc_id", "text"), "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(got(1L) === "reach me at [EMAIL] or [EMAIL] today")
    assert(got(2L) === "call [PHONE] or [PHONE] now")
    assert(got(3L) === "server [IP] and [IP] are up")
    assert(got(4L) === "ssn [SSN] on file")
    assert(got(5L) === "nothing sensitive here at all")
    assert(got(6L) === "mix: [EMAIL] [PHONE] [IP] [SSN]")
  }

  test("pii report == detect + redact in one scan") {
    val df = piiDocs.toDF("doc_id", "text")
    val rep = Pii.report(df, "doc_id", "text")
    val det = Pii.detect(df, "doc_id", "text")
    val red = Pii.redact(df, "doc_id", "text")
      .withColumnRenamed("text", "text_redacted")
    assert(rep.join(det, Seq("doc_id", "n_email", "n_ssn", "n_phone",
      "n_ipv4", "has_pii")).count() === 6)
    assert(rep.select("doc_id", "text_redacted")
      .exceptAll(red).isEmpty)
  }

  test("pii redaction is idempotent: placeholders never re-match") {
    val once = Pii.redact(piiDocs.toDF("doc_id", "text"), "doc_id", "text")
    val twice = Pii.redact(once, "doc_id", "text")
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  // ———————————————————————————————————————— decontamination

  private val benchDocs = Seq(
    (100L, "the quick brown fox jumps over the lazy dog"),
    (101L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")

  test("decontam: overlapping doc flagged with distinct-gram hit count") {
    val corpus = Seq(
      // contains bench 5-grams "quick brown fox jumps over" and
      // "brown fox jumps over the" and "fox jumps over the lazy"
      (1L, "she saw the quick brown fox jumps over the lazy dog run"),
      (2L, "completely unrelated training text about nothing in particular"),
      // short doc (< n tokens) exactly equal to a short bench doc
      (3L, "tiny snippet")).toDF("doc_id", "text")
    val bench = benchDocs.unionByName(
      Seq((102L, "tiny snippet")).toDF("doc_id", "text"))
    val idx = Decontaminate.benchmarkIndex(bench, "text", n = 5)
    val flagged = Decontaminate.flag(corpus, "doc_id", "text", idx, n = 5)
      .as[(Long, Long)].collect().toMap
    // doc 1 shares exactly the 5 five-grams of the 9-token bench
    // sentence that survive inside its own text: positions covering
    // "the quick … lazy dog" → 5 distinct overlapping grams
    assert(flagged(1L) === 5L)
    // whole-doc gram convention: the 2-token doc collides as one gram
    assert(flagged(3L) === 1L)
    assert(!flagged.contains(2L))
  }

  test("decontam: removeContaminated keeps exactly the clean docs") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog indeed"),
      (2L, "clean document one"),
      (3L, "clean document two")).toDF("doc_id", "text")
    val idx = Decontaminate.benchmarkIndex(benchDocs, "text", n = 5)
    val kept = Decontaminate.removeContaminated(
      corpus, "doc_id", "text", idx, n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 3L))
  }

  test("decontam: broadcastIndex pins a broadcast join") {
    val corpus = Seq((1L, "some training doc text here")).toDF("doc_id", "text")
    val idx = Decontaminate.benchmarkIndex(benchDocs, "text", n = 5)
    val plan = Decontaminate.flag(corpus, "doc_id", "text", idx,
      n = 5, broadcastIndex = true)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"))
  }

  test("decontam: flag/remove partition the corpus exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val bench = docs.filter(pmod($"doc_id", lit(10)) === 0)
    val corpus = docs.filter(pmod($"doc_id", lit(10)) =!= 0)
    val idx = Decontaminate.benchmarkIndex(bench, "text", n = 8)
    val flagged = Decontaminate.flag(corpus, "doc_id", "text", idx, n = 8)
      .select("doc_id").as[Long].collect().toSet
    val kept = Decontaminate.removeContaminated(
      corpus, "doc_id", "text", idx, n = 8)
      .select("doc_id").as[Long].collect().toSet
    val all = corpus.select("doc_id").as[Long].collect().toSet
    assert((flagged & kept).isEmpty && (flagged | kept) === all)
  }

  test("decontam: benchmark index round-trips through parquet unchanged") {
    // the index is the persistable artifact a pipeline builds once per
    // benchmark release — flagging from the stored frame must equal
    // flagging from the freshly built one
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again"),
      (2L, "nothing shared with any benchmark")).toDF("doc_id", "text")
    val fresh = Decontaminate.benchmarkIndex(benchDocs, "text", n = 5)
    val dir = tmpDir("graft-decontam-idx")
    fresh.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val a = Decontaminate.flag(corpus, "doc_id", "text", fresh, n = 5)
      .as[(Long, Long)].collect().toSet
    val b = Decontaminate.flag(corpus, "doc_id", "text", stored, n = 5)
      .as[(Long, Long)].collect().toSet
    assert(a === b && a.map(_._1) === Set(1L))
  }

  // ———————————————————————————————————————— repetition signals

  test("repetition: top-n-gram occupancy with multiplicity") {
    // "a b a b a": 2-grams (a b)(b a)(a b)(b a) → max 2 / 4 = 0.5
    //              3-grams (a b a)(b a b)(a b a) → 2 / 3
    val docs = Seq(
      (1L, "a b a b a"),
      (2L, "w x y z"), // all 2-grams unique → 1/3
      (3L, "solo")) // < n tokens → 0.0
      .toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "top2gram_frac", "top3gram_frac")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((0.5, 0.666667)))
    assert(got(2L) === ((0.333333, 0.5)))
    assert(got(3L) === ((0.0, 0.0)))
  }

  test("repetition: duplicate-line char fraction is char-weighted") {
    // lines: "xx" ×2 (4 chars dup), "y" ×1 → 4/5
    val docs = Seq(
      (1L, "xx\ny\nxx"),
      (2L, "unique\nlines\nonly"),
      (3L, "no newline at all")).toDF("doc_id", "text")
    val got = TextStats.repetitionStats(docs, "doc_id", "text")
      .select("doc_id", "dup_line_frac").as[(Long, Double)].collect().toMap
    assert(got(1L) === 0.8)
    assert(got(2L) === 0.0)
    assert(got(3L) === 0.0)
  }

  test("repetition filter drops boilerplate, keeps diverse docs") {
    val docs = Seq(
      (1L, "spam spam spam spam spam spam spam spam"),
      (2L, "a genuinely varied sentence with many different words in it"))
      .toDF("doc_id", "text")
    val kept = TextStats.repetitionFilter(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L))
  }

  test("curation stack is streaming-parity: pii redact + repetition filter on a stream") {
    // the whole scrub pipeline is map-only, so it must run UNCHANGED
    // under Structured Streaming — same Columns, same kernels, no
    // state, no watermark needed
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val srcDir = tmpDir("graft-curation-stream")
    docs.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
    val scrubbed = TextStats.repetitionFilter(
      Pii.redact(stream, "doc_id", "text"), "doc_id", "text")
    val q = scrubbed.writeStream.format("memory").queryName("curated")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("curated").select("doc_id")
      .as[Long].collect().toSet
    val batch = TextStats.repetitionFilter(
      Pii.redact(docs, "doc_id", "text"), "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("chunking is streaming-parity: map-only split runs unchanged on a stream") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val srcDir = tmpDir("graft-chunk-stream")
    docs.write.mode("overwrite").parquet(srcDir)
    val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
    val q = graft.ext.Packing.chunkDocs(stream, "doc_id", "text",
      window = 32, overlap = 8)
      .writeStream.format("memory").queryName("chunked")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val streamed = spark.table("chunked")
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().toSet
    val batch = graft.ext.Packing.chunkDocs(docs, "doc_id", "text",
      window = 32, overlap = 8)
      .select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Int, String)].collect().toSet
    assert(streamed === batch && batch.nonEmpty)
  }

  test("repetition kernels match the declarative recomputation on corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // declarative top-2-gram frac: explode with multiplicity + 2 aggs
    val toks = docs.select($"doc_id",
      split(trim(lower($"text")), "\\s+").as("w"))
    val g2 = toks.select($"doc_id",
      explode(expr("transform(sequence(0, size(w) - 2), " +
        "i -> concat_ws(' ', w[i], w[i+1]))")).as("g"))
    val decl = g2.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(round(max($"c").cast("double") / sum($"c").cast("double"), 6)
        .as("f"))
    val kern = TextStats.repetitionStats(docs, "doc_id", "text")
      .select($"doc_id", $"top2gram_frac".as("f"))
    assert(kern.exceptAll(decl).isEmpty && decl.exceptAll(kern).isEmpty)
  }
}
