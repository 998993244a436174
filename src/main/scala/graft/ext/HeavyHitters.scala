package graft.ext

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** Misra–Gries frequent-items sketch (Misra & Gries 1982; merge rule
  * from Agarwal et al., "Mergeable Summaries", PODS 2012) — the
  * bounded-memory answer to "which items exceed an ε fraction of a
  * stream" when the item domain is too large to `groupBy` (URL hosts,
  * shingles, user agents at 100 TB: a full count table is itself a
  * giant shuffle; the sketch is one map-side-combined aggregation with
  * an O(m) buffer).
  *
  * Guarantee (order- and partitioning-independent, which is what makes
  * the driver gate deterministic even though the summary's exact
  * contents are not): with summary size m over a stream of N items,
  * every estimate undercounts by at most N/(m+1) —
  * `c(x) − N/(m+1) ≤ ĉ(x) ≤ c(x)` with `ĉ(x) = 0` for evicted items —
  * so every item with true count > N/(m+1) is guaranteed present.
  * Proof shape: each compaction subtracts its δ from ≥ m+1 entries, so
  * Σδ ≤ N/(m+1); an item loses at most δ per compaction.
  *
  * Buffering: the classic algorithm decrements on EVERY overflowing
  * insert (O(m) per row). This implementation lets the buffer grow to
  * 4m and then compacts by subtracting the (m+1)-th largest count from
  * everything (dropping non-positives) — ≥ 3m inserts between
  * compactions amortize each O(4m log 4m) sort to O(log m) per row,
  * and the error argument above is unchanged (each unit of δ removes
  * ≥ m+1 units of mass). Merges concatenate-and-compact, which the
  * PODS'12 result shows preserves the summed bound — this is what
  * makes the sketch safe under Spark's arbitrary partial-aggregation
  * tree shape.
  */
final class MisraGries(m: Int)
    extends Aggregator[String, java.util.HashMap[String, Long],
      Map[String, Long]] {
  require(m > 0, "summary size must be positive")
  private val cap = 4 * m

  override def zero: java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  private def compact(h: java.util.HashMap[String, Long]): Unit = {
    if (h.size <= m) return
    val counts = new Array[Long](h.size)
    val it0 = h.values().iterator()
    var i = 0
    while (it0.hasNext) { counts(i) = it0.next(); i += 1 }
    java.util.Arrays.sort(counts)
    val delta = counts(counts.length - 1 - m) // (m+1)-th largest
    val it = h.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue - delta
      if (c <= 0L) it.remove() else e.setValue(c)
    }
  }

  override def reduce(h: java.util.HashMap[String, Long],
      x: String): java.util.HashMap[String, Long] = {
    h.merge(x, 1L, (a, b) => a + b)
    if (h.size > cap) compact(h)
    h
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val (big, small) = if (a.size >= b.size) (a, b) else (b, a)
    val it = small.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      big.merge(e.getKey, e.getValue, (x, y) => x + y)
    }
    if (big.size > cap) compact(big)
    big
  }

  override def finish(h: java.util.HashMap[String, Long]): Map[String, Long] = {
    compact(h)
    var out = Map.empty[String, Long]
    val it = h.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out = out.updated(e.getKey, e.getValue)
    }
    out
  }

  override def bufferEncoder: Encoder[java.util.HashMap[String, Long]] =
    Encoders.kryo[java.util.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {
  /** Frequent items of `itemCol` as `(item, est_count)` rows, ≤ m of
    * them. One aggregation job (map-side partial summaries, one final
    * merge) — the whole reduction is m-sized, never a per-item count
    * table. Estimates UNDERCOUNT by ≤ N/(m+1); containment of every
    * item above that threshold is guaranteed, membership below it is
    * best-effort (the driver gate checks exactly these two clauses).
    */
  def frequentItems(df: DataFrame, itemCol: Column, m: Int): DataFrame = {
    val sketch = udaf(new MisraGries(m), Encoders.STRING)
    // nulls carry no frequency semantics, and a null key would reach the
    // MisraGries HashMap and blow up the Map output encoder at finish
    // ("Cannot use null as map key") — drop them before aggregating
    df.select(itemCol.cast("string").as("item"))
      .filter(col("item").isNotNull)
      .agg(sketch(col("item")).as("sk"))
      .select(explode(col("sk")).as(Seq("item", "est_count")))
  }
}
