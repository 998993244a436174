package graft

import graft.ops.Hilbert
import org.apache.spark.sql.functions._

/** Hilbert index: exhaustive equality with an independent reference
  * implementation of Skilling's transform, the curve's defining
  * adjacency property (consecutive indices are ALWAYS grid
  * neighbors — ground truth no shared transcription error can fake),
  * bijectivity, and the clustering layout contract.
  */
class HilbertSpec extends SparkSuite {
  import spark.implicits._

  /** Independent scalar reference (Skilling 2004, axes → transpose →
    * interleave) — written against the paper, not the Column code. */
  private def ref(coords: Array[Long], bits: Int): Long = {
    val n = coords.length
    val x = coords.clone()
    var q = 1L << (bits - 1)
    while (q > 1) {
      val p = q - 1
      for (i <- 0 until n) {
        if ((x(i) & q) != 0) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
      }
      q >>= 1
    }
    for (i <- 1 until n) x(i) ^= x(i - 1)
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1) { if ((x(n - 1) & q) != 0) t ^= q - 1; q >>= 1 }
    for (i <- 0 until n) x(i) ^= t
    (0 until bits).flatMap { b =>
      (0 until n).map(i => ((x(i) >> b) & 1L) << (b * n + (n - 1 - i)))
    }.reduce(_ | _)
  }

  /** All grid points of an n-dim, bits-wide cube with ranges pinned to
    * the exact grid so ranks == coordinates. */
  private def grid(n: Int, bits: Int) = {
    val side = 1 << bits
    val pts = (0 until math.pow(side, n).toInt).map { v =>
      (0 until n).map(d => ((v >> (d * bits)) & (side - 1)).toLong)
    }
    val cols = (0 until n).map(d => s"c$d")
    val df0 = pts.map {
      case Seq(a, b) => (a, b, 0L)
      case Seq(a, b, c) => (a, b, c)
    }.toDF("c0", "c1", "c2").select(cols.map(col): _*)
    val ranges = cols.map(_ -> (0.0, (side - 1).toDouble)).toMap
    (pts, Hilbert.withIndex(df0, cols, bits, ranges, "h")
      .select(cols.map(col) :+ col("h"): _*))
  }

  test("2D bits=3: matches the reference exhaustively; bijective") {
    val (_, df) = grid(2, 3)
    val rows = df.as[(Long, Long, Long)].collect()
    rows.foreach { case (a, b, h) =>
      assert(h === ref(Array(a, b), 3), s"at ($a,$b)") }
    assert(rows.map(_._3).sorted.toSeq === (0L until 64L))
  }

  test("3D bits=2: matches the reference exhaustively; bijective") {
    val (_, df) = grid(3, 2)
    val rows = df.as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (a, b, c, h) =>
      assert(h === ref(Array(a, b, c), 2), s"at ($a,$b,$c)") }
    assert(rows.map(_._4).sorted.toSeq === (0L until 64L))
  }

  test("defining property: consecutive indices are grid neighbors") {
    // independent ground truth — a transcription error shared by the
    // impl and the reference could not produce a curve where EVERY
    // consecutive pair differs by exactly 1 in exactly one coordinate
    val (_, df) = grid(2, 4) // 256 cells
    val byH = df.as[(Long, Long, Long)].collect().sortBy(_._3)
    byH.sliding(2).foreach { case Array((x1, y1, h1), (x2, y2, h2)) =>
      assert(h2 === h1 + 1)
      val d = math.abs(x1 - x2) + math.abs(y1 - y2)
      assert(d === 1L, s"jump of $d between h=$h1 ($x1,$y1) and ($x2,$y2)")
    }
  }

  test("cluster: values survive, files range-partition along the curve") {
    val df = (0L until 256L).map(i => (i % 16, i / 16, i))
      .toDF("x", "y", "payload")
    val out = Hilbert.cluster(df, Seq("x", "y"), bits = 4,
      numPartitions = Some(4))
    assert(out.columns.toSeq === Seq("x", "y", "payload"))
    assert(out.select("payload").as[Long].collect().sorted.toSeq ===
      (0L until 256L))
  }
}
