package graft.ext

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}

/** Count-Min sketch (Cormode & Muthukrishnan 2005) — point-frequency
  * estimates over item domains too large to count exactly: a d×w grid
  * of counters where row j increments cell h_j(x), and the estimate is
  * the MIN over rows. The complement of [[HeavyHitters]]: Misra–Gries
  * answers "which items are frequent" (undercount-only, m survivors),
  * Count-Min answers "how frequent is THIS item" for arbitrary probe
  * keys (overestimate-only — collisions only ever add) — together the
  * standard pair for frequency questions at 100 TB (per-host rate
  * limiting, hot-shingle thresholds, join-skew detection).
  *
  * Guarantees with w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉:
  *   - hard, always: ĉ(x) ≥ c(x);
  *   - per probe, w.p. ≥ 1−δ: ĉ(x) − c(x) ≤ ε·N.
  *
  * Determinism: counter cells are a pure SUM-fold under fixed seeds —
  * the grid is identical regardless of partitioning or row order (sums
  * of longs commute), so driver gates over a fixed probe set are
  * stable. Same scale posture as [[Bloom]]: build is ONE aggregation
  * (map-side-combined d×w-long partials), the grid collects as one
  * metadata-sized row, and the probe embeds it as a plan literal — all
  * built-ins, k static terms, no HOF, no UDF on the probe path.
  */
object CountMin {

  final case class CmModel(grid: Array[Long], width: Int, depth: Int,
      seed: Long) {
    require(java.lang.Integer.bitCount(width) == 1, "width must be a power of 2")
    require(grid.length == width.toLong * depth, "grid size mismatch")
    /** Total stream mass N (any row's sum — they all equal N). */
    def n: Long = grid.view.slice(0, width).sum
  }

  /** Sizing for target (ε, δ): width ⌈e/ε⌉ rounded up to a power of
    * two (mask extraction, like [[Bloom.params]]), depth ⌈ln(1/δ)⌉.
    */
  def params(eps: Double, delta: Double): (Int, Int) = {
    require(eps > 0 && eps < 1 && delta > 0 && delta < 1)
    val wIdeal = math.ceil(math.E / eps).toLong
    var w = 16L
    while (w < wIdeal) w <<= 1
    require(w <= (1L << 24), s"width $w too large for a literal-embedded grid")
    (w.toInt, math.max(1, math.ceil(math.log(1 / delta)).toInt))
  }

  /** Row-j bucket of `key`: independent xxhash64 per row, masked to
    * the power-of-two width (identical arithmetic JVM-side and
    * declaratively — the hash happens HERE, in codegen, both ways).
    */
  private def bucketCol(key: Column, seed: Long, j: Int, width: Int): Column =
    xxhash64(lit(seed + j), key).bitwiseAND(lit(width.toLong - 1))

  /** Mergeable grid aggregator over pre-computed bucket arrays. */
  private final class CmAgg(width: Int, depth: Int)
      extends Aggregator[Seq[Long], Array[Long], Array[Long]] {
    override def zero: Array[Long] = new Array[Long](width * depth)
    override def reduce(g: Array[Long], buckets: Seq[Long]): Array[Long] = {
      var j = 0
      while (j < depth) { g(j * width + buckets(j).toInt) += 1L; j += 1 }
      g
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(g: Array[Long]): Array[Long] = g
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Build the sketch over `key` occurrences (each row counts once).
    * One aggregation job, one grid row collected.
    */
  def build(df: DataFrame, key: Column, eps: Double = 0.003,
      delta: Double = 0.02, seed: Long = 42): CmModel = {
    val (width, depth) = params(eps, delta)
    val buckets = array((0 until depth).map(bucketCol(key, seed, _, width)): _*)
    val agg = udaf(new CmAgg(width, depth), ExpressionEncoder[Seq[Long]]())
    val grid = df.select(buckets.as("b"))
      .agg(agg(col("b")).as("g"))
      .head().getSeq[Long](0).toArray
    CmModel(grid, width, depth, seed)
  }

  /** Point estimate ĉ(key): min over the d probed cells. Overestimates
    * only; `key` must have the Spark type the sketch was built over.
    */
  def estimate(m: CmModel, key: Column): Column = {
    val gridLit = typedlit(m.grid.toSeq)
    val cells = (0 until m.depth).map { j =>
      element_at(gridLit,
        (lit(j * m.width) + bucketCol(key, m.seed, j, m.width)).cast("int") + 1)
    }
    if (cells.size == 1) cells.head else least(cells: _*)
  }
}
