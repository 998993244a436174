package graft.ext

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** Bloom-filter membership pruning (Bloom 1970; k-probe layout per
  * Kirsch–Mitzenmacher 2006 double hashing) — the broadcast answer to
  * "is this key in the corpus" when the corpus is too large to ship
  * through a shuffle but its KEY SET compresses to bits: at 10⁹ member
  * keys and 1% target FP rate the filter is ~1.2 GB of bits versus an
  * 8 GB+ exchange of the raw key column, and the probe side never
  * shuffles at all (map-only filter). The canonical 100 TB uses are
  * new-vs-returning key detection and pre-filtering a huge probe table
  * before an expensive exact join — every probe the filter rejects is
  * a guaranteed non-member (no false negatives), so the exact join
  * only pays for probable members.
  *
  * Determinism: the bit array is a pure OR-fold of per-key bit sets
  * under fixed seeds, so the built filter is IDENTICAL regardless of
  * partitioning or row order — which is what lets the driver gate
  * check exact containment and a fixed measured FP rate.
  *
  * Scale posture: [[build]] reduces to ONE aggregated row (the word
  * array) — a metadata-sized collect like the IVF centroid tables, and
  * [[mightContain]] embeds the words as a plan literal (a codegen
  * reference object, not inlined source). That is the right shape up
  * to filters of a few hundred MB; past that (≥ ~10⁹ members) swap the
  * literal for a `SparkContext.broadcast` of the same word array read
  * inside a custom Expression — the bit math below is unchanged. The
  * probe path is built-ins only (xxhash64 / shiftleft / element_at),
  * fully inside whole-stage codegen, k static conjuncts, no HOF.
  *
  * Hash layout (identical in the JVM builder and the declarative
  * probe, asserted by ExtSpec): h1/h2 = xxhash64 under two fixed
  * seeds, both masked to 36 bits (h2 forced odd, coprime with the
  * power-of-two width so the k probes are distinct); probe i tests bit
  * (h1 + i·h2) & (numBits−1). Masking keeps every intermediate
  * < 2⁴¹ — ANSI-mode-safe, no overflow path.
  */
object Bloom {

  /** Second xxhash64 seed offset (golden-ratio constant, same role as
    * in [[Dedup.exact]]'s independent second hash).
    */
  private val Seed2Offset = 0x9e3779b97f4a7c15L
  private val HashMask = 0xFFFFFFFFFL // low 36 bits

  /** A built filter: `words(i)` holds bits [64i, 64i+64). */
  final case class BloomModel(words: Array[Long], numBits: Long, k: Int,
      seed: Long) {
    require(java.lang.Long.bitCount(numBits) == 1, "numBits must be a power of 2")
    def sizeBytes: Long = words.length.toLong * 8
  }

  /** Standard sizing: bits m = −n·ln p/(ln 2)², rounded UP to a power
    * of two (so positions are mask extractions, and the probe-side mod
    * is exactly reproducible in plain bit math); k = round(m/n·ln 2)
    * clamped to [1, 16].
    */
  def params(expectedItems: Long, fpp: Double): (Long, Int) = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    val ln2 = math.log(2)
    val mIdeal = math.ceil(-expectedItems * math.log(fpp) / (ln2 * ln2)).toLong
    var m = 64L
    while (m < mIdeal) m <<= 1 // ≥ 64 so the word array is non-empty
    val k = math.max(1, math.min(16, math.round(m.toDouble / expectedItems * ln2).toInt))
    (m, k)
  }

  private def hashCols(key: Column, seed: Long): (Column, Column) = {
    val h1 = xxhash64(lit(seed), key).bitwiseAND(lit(HashMask))
    val h2 = xxhash64(lit(seed + Seed2Offset), key).bitwiseAND(lit(HashMask))
      .bitwiseOR(lit(1L))
    (h1, h2)
  }

  /** Mergeable bit-array aggregator over pre-hashed (h1, h2) rows.
    * The buffer is the word array itself; reduce sets k bits, merge is
    * elementwise OR — associative, commutative, idempotent, hence the
    * layout-independence the scaladoc promises.
    */
  private final class BloomAgg(numBits: Long, k: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    private val mask = numBits - 1
    override def zero: Array[Long] = new Array[Long]((numBits >>> 6).toInt)
    override def reduce(w: Array[Long], h: (Long, Long)): Array[Long] = {
      var i = 0
      while (i < k) {
        val pos = (h._1 + i * h._2) & mask
        w((pos >>> 6).toInt) |= 1L << pos // JVM shift uses pos mod 64
        i += 1
      }
      w
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(w: Array[Long]): Array[Long] = w
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build a filter over `key` (duplicates are harmless — OR is
    * idempotent). One aggregation job, map-side-combined partials of
    * `numBits/8` bytes each, one word-array row collected.
    */
  def build(df: DataFrame, key: Column, expectedItems: Long,
      fpp: Double = 0.01, seed: Long = 42): BloomModel = {
    val (numBits, k) = params(expectedItems, fpp)
    val (h1, h2) = hashCols(key, seed)
    val agg = udaf(new BloomAgg(numBits, k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val words = df.select(h1.as("h1"), h2.as("h2"))
      .agg(agg(col("h1"), col("h2")).as("w"))
      .head().getSeq[Long](0).toArray
    BloomModel(words, numBits, k, seed)
  }

  /** Probe predicate: true iff all k probe bits are set. False ⇒ the
    * key was NEVER inserted (the hard guarantee); true ⇒ member with
    * probability ≥ 1 − fpp. `key` must have the same Spark type the
    * filter was built over (xxhash64 is type-sensitive).
    */
  def mightContain(m: BloomModel, key: Column): Column = {
    val wordsLit = typedlit(m.words.toSeq)
    val mask = m.numBits - 1
    val (h1, h2) = hashCols(key, m.seed)
    (0 until m.k).map { i =>
      val pos = (h1 + lit(i.toLong) * h2).bitwiseAND(lit(mask))
      val word = element_at(wordsLit, shiftright(pos, 6).cast("int") + 1)
      word.bitwiseAND(
        call_function("shiftleft", lit(1L), pos.bitwiseAND(lit(63L)).cast("int"))
      ) =!= lit(0L)
    }.reduce(_ && _)
  }

  /** The pruning use: keep only rows whose `key` might be a member —
    * a map-only pre-filter in front of an exact semi-join (sound
    * because rejects are guaranteed non-members).
    */
  def prune(df: DataFrame, key: Column, m: BloomModel): DataFrame =
    df.filter(mightContain(m, key))
}
