package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{FloatType, IntegerType, LongType}

/** Deterministic large-scale test-data generator — produces an
  * sfN-shaped dataset from an existing sf directory for stress
  * benching (`BENCH_sf1.json`), fully distributed (`spark.range` +
  * hash-derived columns, no driver-side data).
  *
  * Shapes are chosen so per-operator COST SCALES HONESTLY instead of
  * measuring generator artifacts:
  *
  *   - `documents` is generated FRESH (never replicated from the
  *     source): replicating text 10× would plant 10-doc near-identical
  *     clusters for every source doc and grow dedup pair output
  *     quadratically — a corpus 10× bigger has ~10× the dups, not 45×.
  *     Dup structure mirrors the driver's corpus: ~5% near-dup pairs
  *     (every 20th doc mutates its predecessor) and ~0.2% exact dups
  *     (every 500th doc copies its predecessor), lengths 10–100.
  *     Each doc opens with one of 4 shared 8-token boilerplate
  *     headers (the web header/footer analog — their shingles have
  *     df ≈ docs/4, far over the `maxDf` cap at sf1, so the
  *     stop-shingle guard is EXERCISED at stress scale, not idle)
  *     while the body draws from a 4096-token long-tail vocabulary
  *     whose shingle df stays roughly flat as the corpus grows, the
  *     way real vocabularies behave. (A fixed 26-word vocabulary —
  *     the first cut — made every trigram's df grow linearly with
  *     the corpus, turning the exact inverted-index Jaccard join
  *     into a Σ df² quadratic that measured the generator, not the
  *     operator.)
  *   - `embeddings` are cluster + noise with FIXED cluster size (20),
  *     so near-dup pair output grows linearly with the corpus — the
  *     at-scale shape (dup clusters don't widen with corpus size).
  *   - TPC-H fact tables replicate the source `factor`× with
  *     per-replica key shifts (FK-consistent: the same shift applies
  *     to both sides of every join key); dimension tables (`region`,
  *     `nation`) copy once.
  *
  * Usage: `runMain graft.tools.StressGen <srcSfDir> <outDir> <factor>`
  * then e.g. `SPARK_GRAFT_SF_DIR=<outDir> SPARK_GRAFT_BENCH_QUERIES=
  * curation_full,... runMain graft.Bench`.
  */
object StressGen {

  private val Vocab = Seq("batch", "part", "spark", "line", "column",
    "order", "small", "sort", "fast", "value", "scan", "hash", "slow",
    "group", "agg", "filter", "query", "big", "key", "window", "row",
    "table", "stream", "merge", "data", "vector")

  // key shifts per replica — far above each source table's max key
  private val OrderShift = 10000000L
  private val CustShift = 1000000L
  private val PartShift = 1000000L
  private val SuppShift = 100000L

  def main(args: Array[String]): Unit = {
    val Array(srcDir, outDir, factorS) = args
    val factor = factorS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    writeDocuments(spark, srcDir, outDir, factor)
    writeEmbeddings(spark, srcDir, outDir, factor)
    replicate(spark, srcDir, outDir, "customer", factor,
      Map("c_custkey" -> CustShift))
    replicate(spark, srcDir, outDir, "orders", factor,
      Map("o_orderkey" -> OrderShift, "o_custkey" -> CustShift))
    replicate(spark, srcDir, outDir, "lineitem", factor,
      Map("l_orderkey" -> OrderShift, "l_partkey" -> PartShift,
        "l_suppkey" -> SuppShift))
    replicate(spark, srcDir, outDir, "supplier", factor,
      Map("s_suppkey" -> SuppShift))
    replicate(spark, srcDir, outDir, "part", factor,
      Map("p_partkey" -> PartShift))
    replicate(spark, srcDir, outDir, "region", 1, Map.empty)
    replicate(spark, srcDir, outDir, "nation", 1, Map.empty)
    writeEvents(spark, srcDir, outDir, factor)
    spark.stop()
  }

  private val EventShift = 100000000L
  private val UserShift = 1000000L

  /** `events` replicates with event/user id shifts and UNSHIFTED
    * timestamps: factor× more users at the source's per-user event
    * density over the same time span — the honest scaling shape for
    * per-key windows (rolling, gap-fill, sessions, funnel, retention):
    * their cost grows with users × per-user series, never with an
    * artificially stretched timeline. Read through
    * [[graft.queries.CoreQueries.events]] (the TIMESTAMP(NANOS)
    * rebuild), written back as plain µs timestamps.
    */
  private def writeEvents(spark: SparkSession, srcDir: String,
      outDir: String, factor: Int): Unit = {
    val src = graft.queries.CoreQueries.events(spark, srcDir)
    val maxes = src.agg(max(col("event_id")), max(col("user_id"))).head()
    require(!maxes.isNullAt(0) && !maxes.isNullAt(1),
      "source events table is empty — nothing to replicate")
    require(maxes.getLong(0) < EventShift && maxes.getLong(1) < UserShift,
      s"events id range (${maxes.getLong(0)}, ${maxes.getLong(1)}) " +
        "reaches the replica shifts — raise EventShift/UserShift")
    val out = (0 until factor).map { r =>
      src.select(
        (col("event_id") + lit(r * EventShift)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r * UserShift)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_.unionByName(_))
    out.write.mode("overwrite").parquet(s"$outDir/events.parquet")
  }

  private def writeDocuments(spark: SparkSession, srcDir: String,
      outDir: String, factor: Int): Unit = {
    val n = spark.read.parquet(s"$srcDir/documents.parquet").count() * factor
    val vocab = array(Vocab.map(lit): _*)
    val v = Vocab.size
    val id = col("id")
    // exact-dup rule wins over near-dup where both fire (i%500==499)
    val isExact = pmod(id, lit(500)) === 499
    val isNear = !isExact && pmod(id, lit(20)) === 19
    val contentSeed = when(isExact || isNear, id - 1).otherwise(id)
    val len = pmod(xxhash64(lit("len"), contentSeed), lit(91)) + 10
    // body tokens from a 4096-token long-tail vocabulary: content
    // shingle df stays roughly flat as the corpus grows (see scaladoc)
    def tok(seedTag: String, seed: org.apache.spark.sql.Column,
        j: org.apache.spark.sql.Column) =
      concat(lit("w"),
        pmod(xxhash64(lit(seedTag), seed, j), lit(4096)))
    // one of 4 shared 8-token boilerplate headers per doc (keyed on
    // contentSeed, so exact/near dups keep their predecessor's header):
    // header shingles have df ≈ docs/4 — the hot, over-maxDf-cap
    // boilerplate real corpora carry
    val hdrId = pmod(xxhash64(lit("hdr"), contentSeed), lit(4))
    val hdr = transform(sequence(lit(0), lit(7)), j =>
      element_at(vocab,
        (pmod(xxhash64(lit("h"), hdrId, j), lit(v)) + 1).cast(IntegerType)))
    // near dups mutate every 17th body token against their OWN id —
    // high but sub-1.0 Jaccard vs the predecessor
    val body = transform(sequence(lit(0), (len - 1).cast(IntegerType)),
      j => when(isNear && pmod(j, lit(17)) === 5, tok("mut", id, j))
        .otherwise(tok("tok", contentSeed, j)))
    val text = concat_ws(" ", concat(hdr, body))
    val langBucket = pmod(xxhash64(lit("lang"), contentSeed), lit(20))
    spark.range(n)
      .select(
        id.as("doc_id"),
        text.as("text"),
        when(langBucket < 8, "en").when(langBucket < 11, "zh")
          .when(langBucket < 14, "es").when(langBucket < 17, "fr")
          .otherwise("de").as("lang"),
        concat(lit("src"), pmod(id, lit(20))).as("source"),
        length(text).as("n_chars"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  private def writeEmbeddings(spark: SparkSession, srcDir: String,
      outDir: String, factor: Int): Unit = {
    val n = spark.read.parquet(s"$srcDir/embeddings.parquet").count() * factor
    val id = col("id")
    val cluster = (id / 20).cast(LongType)
    // per-dim value = cluster center (weight .15) + per-vector noise
    // (weight .12) → within-cluster cosine ≈ 0.6, cross-cluster ≈ 0
    def unit(tag: String, seed: org.apache.spark.sql.Column,
        d: org.apache.spark.sql.Column) =
      (pmod(xxhash64(lit(tag), seed, d), lit(2001)) - 1000) / lit(1000.0)
    val vec = transform(sequence(lit(0), lit(63)), d =>
      (unit("c", cluster, d) * 0.15 + unit("n", id, d) * 0.12)
        .cast(FloatType))
    spark.range(n)
      .select(id.as("vec_id"), vec.as("embedding"),
        pmod(cluster, lit(10)).cast(IntegerType).as("label"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  private def replicate(spark: SparkSession, srcDir: String, outDir: String,
      name: String, factor: Int, shifts: Map[String, Long]): Unit = {
    val src = spark.read.parquet(s"$srcDir/$name.parquet")
    // the per-replica shift must clear the source's actual key range, or
    // replicas silently collide (duplicate keys, cross-replica joins) and
    // the bench runs on corrupted data with no error — validate, don't trust
    if (factor > 1 && shifts.nonEmpty) {
      val maxes = src.agg(
        max(col(shifts.keys.head)), shifts.keys.toSeq.tail.map(c => max(col(c))): _*)
        .head()
      shifts.keys.toSeq.zipWithIndex.foreach { case (c, i) =>
        val m = maxes.getLong(i)
        require(m < shifts(c),
          s"$name.$c max $m >= replica shift ${shifts(c)} — shifted replicas " +
            "would collide; raise the shift constant for this source scale")
      }
    }
    val out = (0 until factor).map { r =>
      src.select(src.columns.toSeq.map { c =>
        shifts.get(c).map(s => (col(c) + lit(r * s)).as(c))
          .getOrElse(col(c))
      }: _*)
    }.reduce(_.unionByName(_))
    out.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
  }
}
