package graft

import graft.ext.ModelEval
import org.apache.spark.sql.functions._

/** ModelEval: AUC against hand-computed Mann–Whitney values (ties,
  * perfect and inverted rankings, degenerate classes), confusion-cell
  * arithmetic, calibration binning with clamps and empty bins, and
  * the bucket-count invariance that justifies the two-phase prefix.
  */
class ModelEvalSpec extends SparkSuite {
  import spark.implicits._

  private def auc(rows: Seq[(Double, Int)], buckets: Int = 256): (Long, Long, BigDecimal, Option[Double]) = {
    val df = rows.toDF("s", "y")
    val r = ModelEval.rocAuc(df, "y", "s", buckets).head()
    (r.getLong(0), r.getLong(1), BigDecimal(r.getDecimal(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  test("perfect, inverted, and interleaved rankings") {
    // perfect: all positives above all negatives
    assert(auc(Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)))._4 === Some(1.0))
    // inverted
    assert(auc(Seq((0.9, 0), (0.8, 0), (0.2, 1), (0.1, 1)))._4 === Some(0.0))
    // interleaved: pairs won = {(.8>.7),(.8>.3),(.4>.3)} = 3 of 4 -> 0.75
    val (np, nn, u2, a) = auc(Seq((0.8, 1), (0.7, 0), (0.4, 1), (0.3, 0)))
    assert((np, nn) === (2L, 2L))
    assert(u2 === BigDecimal(6)) // 2U = 2*3
    assert(a === Some(0.75))
  }

  test("ties count half (tie-corrected U)") {
    // one positive and one negative share score 0.5; the other positive
    // is above everything: U = 1*2 (top pos beats both negs) + 1*(1/2 tie)
    // + 1*1 (tied pos beats the 0.1 neg) = 3.5 -> 2U = 7, AUC = 7/8
    val (_, _, u2, a) =
      auc(Seq((0.9, 1), (0.5, 1), (0.5, 0), (0.1, 0)))
    assert(u2 === BigDecimal(7))
    assert(a === Some(0.875))
  }

  test("degenerate single-class input yields null auc, exact counts") {
    val (np, nn, u2, a) = auc(Seq((0.9, 1), (0.8, 1)))
    assert((np, nn, u2, a) === (2L, 0L, BigDecimal(0), None))
  }

  test("auc is invariant to the bucket count (cut-invariance)") {
    val rows = (1 to 400).map { i =>
      // heavy ties: only 13 distinct scores across 400 rows
      (((i * 7919) % 13).toDouble / 13.0, (i * 2654435761L % 5 < 2).compare(false))
    }.map { case (s, y) => (s, if (y > 0) 1 else 0) }
    val one = auc(rows, buckets = 1)
    assert(auc(rows, buckets = 4) === one)
    assert(auc(rows, buckets = 256) === one)
  }

  test("rocAucFromCounts over merged batch counts equals the pooled auc") {
    import spark.implicits._
    val b1 = Seq((0.9, 1), (0.7, 0), (0.4, 1))
    val b2 = Seq((0.9, 0), (0.4, 1), (0.3, 0), (0.7, 1))
    // incrementally merged distinct-score counts (what an
    // IncrementalAgg state table holds after folding both batches)
    val counts = (b1 ++ b2).groupBy(_._1).map { case (s, rs) =>
      (s, rs.map(_._2.toLong).sum, rs.size.toLong)
    }.toSeq.toDF("_s", "pos_g", "tot_g")
    val fromCounts = ModelEval.rocAucFromCounts(counts).head()
    val full = ModelEval.rocAuc((b1 ++ b2).toDF("s", "y"), "y", "s")
      .head()
    assert(fromCounts === full)
  }

  test("per-group auc matches per-group runs of the pooled auc") {
    val gA = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)) // perfect
    val gB = Seq((0.8, 1), (0.7, 0), (0.4, 1), (0.3, 0)) // 0.75
    val df = (gA.map { case (s, y) => ("a", s, y) } ++
      gB.map { case (s, y) => ("b", s, y) }).toDF("grp", "s", "y")
    val out = ModelEval.rocAucBy(df, "grp", "y", "s", buckets = 4)
      .orderBy("grp")
      .select("grp", "n_pos", "n_neg", "auc")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("a", 2L, 2L, 1.0), ("b", 2L, 2L, 0.75)))
    // identical scores across groups must not leak between prefixes
    val dup = Seq(("a", 0.5, 1), ("a", 0.4, 0), ("b", 0.5, 0), ("b", 0.4, 1))
      .toDF("grp", "s", "y")
    val d = ModelEval.rocAucBy(dup, "grp", "y", "s", buckets = 2)
      .orderBy("grp").select("grp", "auc")
      .as[(String, Double)].collect().toSeq
    assert(d === Seq(("a", 1.0), ("b", 0.0)))
  }

  test("weighted auc equals the row-duplicated auc") {
    val weighted = Seq(
      ("g", 0.9, 1, 3L), ("g", 0.7, 0, 2L), ("g", 0.4, 1, 1L))
      .toDF("grp", "s", "y", "w")
    val duplicated = Seq.fill(3)(("g", 0.9, 1)) ++
      Seq.fill(2)(("g", 0.7, 0)) ++ Seq(("g", 0.4, 1))
    val a = ModelEval.rocAucBy(weighted, "grp", "y", "s", buckets = 2,
      weightCol = Some("w")).select("n_pos", "n_neg", "auc")
      .as[(Long, Long, Double)].head()
    val b = ModelEval.rocAucBy(duplicated.toDF("grp", "s", "y"),
      "grp", "y", "s", buckets = 2).select("n_pos", "n_neg", "auc")
      .as[(Long, Long, Double)].head()
    assert(a === b)
    assert(a._1 === 4L && a._2 === 2L)
  }

  test("bootstrapAuc: deterministic, ordered bounds, replicate cap") {
    val rows = (1L to 200L).map { i =>
      (i, ((i * 7919) % 100).toDouble / 100.0,
        if ((i * 2654435761L) % 3 == 0) 1 else 0)
    }
    val df = rows.toDF("id", "s", "y")
    val r1 = ModelEval.bootstrapAuc(df, "y", "s", "id",
      replicates = 16, seed = 7).head()
    val r2 = ModelEval.bootstrapAuc(df, "y", "s", "id",
      replicates = 16, seed = 7).head()
    assert(r1 === r2) // same seed -> bit-identical report
    val (nb, lo, med, hi) =
      (r1.getLong(0), r1.getDouble(1), r1.getDouble(2), r1.getDouble(3))
    assert(nb >= 2L && nb <= 16L)
    assert(lo <= med && med <= hi)
    // the point estimate sits inside the interval
    val point = ModelEval.rocAuc(df, "y", "s").head().getDouble(3)
    assert(lo <= point && point <= hi)
    // a different seed moves the draw
    val r3 = ModelEval.bootstrapAuc(df, "y", "s", "id",
      replicates = 16, seed = 8).head()
    assert(r3 !== r1)
  }

  test("average precision matches the hand-computed step sum") {
    // desc order: .8(+) .7(-) .4(+) .3(-): thresholds at .8 -> P=1, R=.5;
    // .4 -> P=2/3, R=1 => AP = .5*1 + .5*2/3 = 5/6
    val df = Seq((0.8, 1), (0.7, 0), (0.4, 1), (0.3, 0)).toDF("s", "y")
    val r = ModelEval.averagePrecision(df, "y", "s").head()
    assert((r.getLong(0), r.getLong(1)) === (2L, 2L))
    assert(r.getDouble(2) === 0.833333)
    // perfect ranking -> AP = 1
    val p = ModelEval.averagePrecision(
      Seq((0.9, 1), (0.8, 1), (0.2, 0)).toDF("s", "y"), "y", "s").head()
    assert(p.getDouble(2) === 1.0)
    // no positives -> null ap
    val z = ModelEval.averagePrecision(
      Seq((0.9, 0), (0.8, 0)).toDF("s", "y"), "y", "s").head()
    assert(z.isNullAt(2))
    // tie block: both scores equal, one pos one neg -> single threshold,
    // P = 1/2, R jumps 0 -> 1 => AP = 0.5
    val t = ModelEval.averagePrecision(
      Seq((0.5, 1), (0.5, 0)).toDF("s", "y"), "y", "s").head()
    assert(t.getDouble(2) === 0.5)
  }

  test("averagePrecision is invariant to the bucket count") {
    val rows = (1 to 300).map { i =>
      (((i * 7919) % 17).toDouble / 17.0, if (i * 2654435761L % 3 == 0) 1 else 0)
    }
    val df = rows.toDF("s", "y")
    val one = ModelEval.averagePrecision(df, "y", "s", buckets = 1).head()
    val many = ModelEval.averagePrecision(df, "y", "s", buckets = 256).head()
    assert(one.getDouble(2) === many.getDouble(2))
  }

  test("non-binary label fails fast; null labels/scores are dropped") {
    val df = Seq((0.9, 2), (0.8, 0)).toDF("s", "y")
    val e = intercept[Exception] {
      ModelEval.rocAuc(df, "y", "s").collect()
    }
    assert(e.getMessage.contains("must be 0/1"))
    // null labels and scores drop silently (never a null-message raise)
    val withNulls = Seq(
      (Some(0.9), Some(1)), (Some(0.8), None),
      (None, Some(0)), (Some(0.2), Some(0)))
      .toDF("s", "y")
    val r = ModelEval.rocAuc(withNulls, "y", "s").head()
    assert((r.getLong(0), r.getLong(1)) === (1L, 1L))
    assert(r.getDouble(3) === 1.0)
  }

  test("ece on empty input still emits its one-row report") {
    val empty = Seq.empty[(Double, Int)].toDF("s", "y")
    val r = ModelEval.ece(empty, "y", "s", bins = 4, lo = 0.0, hi = 1.0)
      .collect()
    assert(r.length === 1 && r.head.isNullAt(0) && r.head.isNullAt(1))
  }

  test("confusion cells and single-division rates") {
    val df = Seq((0.9, 1), (0.8, 0), (0.6, 1), (0.4, 1), (0.2, 0))
      .toDF("s", "y")
    val r = ModelEval.confusionAt(df, "y", "s", threshold = 0.5).head()
    // tp=2 (0.9,0.6), fp=1 (0.8), fn=1 (0.4), tn=1 (0.2)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      (2L, 1L, 1L, 1L))
    assert(r.getDouble(4) === 2.0 / 3.0)       // precision
    assert(r.getDouble(5) === 2.0 / 3.0)       // recall
    assert(r.getDouble(6) === 3.0 / 5.0)       // accuracy
    assert(r.getDouble(7) === 4.0 / 6.0)       // f1 = 2tp/(2tp+fp+fn)
  }

  test("ece matches the hand-computed bin sum") {
    // bin 0 (scores .1, .2): conf = .15, pos_rate = .5, n=2
    // bin 3 (scores .8, .9): conf = .85, pos_rate = 1.0, n=2
    // ECE = .5*|.5-.15| + .5*|1-.85| = .175 + .075 = .25
    val df = Seq((0.1, 0), (0.2, 1), (0.8, 1), (0.9, 1)).toDF("s", "y")
    val r = ModelEval.ece(df, "y", "s", bins = 4, lo = 0.0, hi = 1.0).head()
    assert(r.getLong(0) === 4L)
    assert(r.getDouble(1) === 0.25)
  }

  test("calibration clamps out-of-range scores and keeps empty bins") {
    val df = Seq((-0.5, 0), (0.05, 0), (0.05, 1), (0.95, 1), (1.7, 1))
      .toDF("s", "y")
    val out = ModelEval.calibration(df, "y", "s", bins = 4, lo = 0.0, hi = 1.0)
      .orderBy("bin")
      .as[(Int, Long, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      (0, 3L, 1L, Some(1.0 / 3.0)), // -0.5 clamped down + the two 0.05s
      (1, 0L, 0L, None),            // empty bin stays visible
      (2, 0L, 0L, None),
      (3, 2L, 2L, Some(1.0))))      // 0.95 + 1.7 clamped up
  }

  test("rocCurve points match hand-computed rates; downsample + buckets invariant") {
    import spark.implicits._
    // scores .9(+) .7(-) .4(+) .3(-): thresholds ascending
    val df = Seq((0.9, 1), (0.7, 0), (0.4, 1), (0.3, 0)).toDF("s", "y")
    val out = ModelEval.rocCurve(df, "y", "s", maxPoints = 512)
      .orderBy("thr")
      .as[(Double, Long, Double, Double)].collect().toSeq
    assert(out === Seq(
      (0.3, 4L, 1.0, 1.0), (0.4, 3L, 0.5, 1.0),
      (0.7, 2L, 0.5, 0.5), (0.9, 1L, 0.0, 0.5)))
    // bucket count cannot move values
    val many = ModelEval.rocCurve(df, "y", "s", maxPoints = 512,
      buckets = 3).orderBy("thr")
      .as[(Double, Long, Double, Double)].collect().toSeq
    assert(many === out)
    // maxPoints = 2 -> step 2: ascending ranks 2 and 4 plus top (4)
    val down = ModelEval.rocCurve(df, "y", "s", maxPoints = 2)
      .orderBy("thr").as[(Double, Long, Double, Double)].collect().toSeq
    assert(down.map(_._1) === Seq(0.4, 0.9))
    // degenerate one-class input: the absent class's rate is null
    val oneClass = ModelEval.rocCurve(
      Seq((0.9, 1), (0.4, 1)).toDF("s", "y"), "y", "s")
    assert(oneClass.collect().forall(_.isNullAt(2))) // fpr null
  }

  test("confusionAtBy matches per-group runs of the pooled confusion") {
    import spark.implicits._
    val gA = Seq((0.9, 1), (0.8, 0), (0.6, 1), (0.4, 1), (0.2, 0))
    val gB = Seq((0.7, 0), (0.55, 1), (0.1, 1))
    val df = (gA.map { case (s, y) => ("a", s, y) } ++
      gB.map { case (s, y) => ("b", s, y) }).toDF("grp", "s", "y")
    val out = ModelEval.confusionAtBy(df, "grp", "y", "s", 0.5)
      .orderBy("grp").collect().toSeq
    val pooledA = ModelEval.confusionAt(gA.toDF("s", "y"), "y", "s", 0.5)
      .head()
    val pooledB = ModelEval.confusionAt(gB.toDF("s", "y"), "y", "s", 0.5)
      .head()
    assert(out.size === 2)
    (0 until pooledA.length).foreach { i =>
      assert(out(0).get(i + 1) === pooledA.get(i), s"col $i group a")
      assert(out(1).get(i + 1) === pooledB.get(i), s"col $i group b")
    }
  }

  test("isotonicCalibration equals the sequential PAV fit") {
    import spark.implicits._
    // independent ground truth: the classic pool-adjacent-violators
    // sweep (merge while the previous block's rate exceeds the
    // current's; compare p1/n1 > p2/n2 by exact cross-multiplication)
    def pav(binsNP: Seq[(Long, Long)]): Seq[Double] = {
      val blocks = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Int)] // (n, n_pos, merged bin count)
      binsNP.foreach { case (n, p) =>
        var cur = (n, p, 1)
        while (blocks.nonEmpty &&
            blocks.last._2 * cur._1 > cur._2 * blocks.last._1) {
          val l = blocks.remove(blocks.size - 1)
          cur = (l._1 + cur._1, l._2 + cur._2, l._3 + cur._3)
        }
        blocks += cur
      }
      blocks.toSeq.flatMap { case (n, p, c) =>
        Seq.fill(c)(p.toDouble / n) }
    }
    val rng = new scala.util.Random(1234)
    (0 until 5).foreach { trial =>
      // random per-bin (n, n_pos) with some empty bins
      val binsNP = (0 until 10).flatMap { b =>
        if (rng.nextInt(5) == 0) None
        else {
          val n = 1 + rng.nextInt(20)
          Some((b, n.toLong, rng.nextInt(n + 1).toLong))
        }
      }
      // materialize rows: score at the bin midpoint of a [0,1) 10-grid
      val rows = binsNP.flatMap { case (b, n, p) =>
        (0L until n).map(i => ((b + 0.5) / 10.0, if (i < p) 1 else 0))
      }
      val out = ModelEval.isotonicCalibration(rows.toDF("s", "y"),
          "y", "s", bins = 10, lo = 0.0, hi = 1.0)
        .orderBy("bin")
        .as[(Int, Long, Long, Double, Double)].collect().toSeq
      assert(out.map(r => (r._1, r._2, r._3)) ===
        binsNP.map(t => (t._1, t._2, t._3)), s"counts, trial $trial")
      val expected = pav(binsNP.map(t => (t._2, t._3)))
      assert(out.map(_._5) === expected, s"fit, trial $trial")
      // defining property: monotone non-decreasing
      assert(out.map(_._5).sliding(2).forall(s =>
        s.size < 2 || s(0) <= s(1)))
    }
  }

  test("slice-eval plans touch the corpus exactly once") {
    import spark.implicits._
    val dir = tmpDir("graft-evalplan")
    (1 to 500).map(i => (("s" + i % 7), i / 500.0, i % 2))
      .toDF("src", "s", "y").write.mode("overwrite").parquet(dir)
    val corpus = spark.read.parquet(dir)
    def scans(df: org.apache.spark.sql.DataFrame): Int =
      "Scan parquet".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    // eceBy: ONE corpus scan feeding the (group, bin) aggregate;
    // totals window + final agg run on the groups×bins frame
    assert(scans(ModelEval.eceBy(corpus, "src", "y", "s",
      bins = 8, lo = 0.0, hi = 1.0)) === 1)
    // confusionAtBy: one scan, one map-combinable aggregate
    assert(scans(ModelEval.confusionAtBy(corpus, "src", "y", "s",
      0.5)) === 1)
    // calibrationBy / isotonic localCheckpoint the bins frame: the
    // executed plan reads the checkpoint, not the corpus — the single
    // corpus pass happened at checkpoint materialization
    assert(scans(ModelEval.calibrationBy(corpus, "src", "y", "s",
      bins = 8, lo = 0.0, hi = 1.0)) === 0)
    assert(scans(ModelEval.isotonicCalibration(corpus, "y", "s",
      bins = 8, lo = 0.0, hi = 1.0)) === 0)
  }

  test("applyIsotonic: step extension across unobserved bins, null score") {
    import spark.implicits._
    // observed bins 1 and 3 only (of 4): bin 0 takes bin 1's value
    // (below-first extension), bin 2 carries bin 1 (LOCF)
    val train = Seq((0.3, 0), (0.35, 1), (0.9, 1), (0.95, 1))
      .toDF("s", "y")
    val fit = ModelEval.isotonicCalibration(train, "y", "s",
      bins = 4, lo = 0.0, hi = 1.0)
    val apply = Seq((Some(0.1), "b0"), (Some(0.3), "b1"),
      (Some(0.6), "b2"), (Some(0.9), "b3"), (None, "null_s"))
      .toDF("s", "tag")
    val out = ModelEval.applyIsotonic(apply, fit, "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .select("tag", "calibrated")
      .as[(String, Option[Double])].collect().toMap
    assert(out("b1") === Some(0.5))    // observed bin 1: rate 1/2
    assert(out("b0") === out("b1"))    // extended below first observed
    assert(out("b2") === out("b1"))    // LOCF across the gap
    assert(out("b3") === Some(1.0))    // observed bin 3
    assert(out("null_s") === None)     // null score -> null calibration
  }

  test("averagePrecisionBy matches per-group runs of the pooled ap") {
    import spark.implicits._
    val gA = Seq((0.9, 1), (0.8, 0), (0.7, 1), (0.6, 0), (0.5, 1))
    val gB = Seq((0.9, 0), (0.8, 0), (0.7, 1), (0.3, 1))
    val gC = Seq((0.4, 0), (0.2, 0)) // no positives -> null ap
    val df = (gA.map { case (s, y) => ("a", s, y) } ++
      gB.map { case (s, y) => ("b", s, y) } ++
      gC.map { case (s, y) => ("c", s, y) }).toDF("grp", "s", "y")
    val out = ModelEval.averagePrecisionBy(df, "grp", "y", "s")
      .orderBy("grp")
      .as[(String, Long, Long, Option[Double])].collect().toSeq
    val expected = Seq("a" -> gA, "b" -> gB, "c" -> gC).map {
      case (g, rows) =>
        val r = ModelEval.averagePrecision(rows.toDF("s", "y"), "y", "s")
          .head()
        (g, r.getLong(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }
    assert(out === expected)
    assert(out.find(_._1 == "c").get._4.isEmpty,
      "a slice with no positives reports null ap")
    // bucket-count invariance carries over from the pooled operator
    val b1 = ModelEval.averagePrecisionBy(df, "grp", "y", "s", buckets = 1)
      .orderBy("grp").as[(String, Long, Long, Option[Double])].collect()
    assert(b1.toSeq === out)
  }

  test("rocCurveBy matches per-group runs of the pooled curve") {
    import spark.implicits._
    val gA = (1 to 9).map(i => ("a", i / 10.0, i % 2))
    val gB = (1 to 5).map(i => ("b", i / 6.0, if (i > 3) 1 else 0))
    val df = (gA ++ gB).toDF("grp", "s", "y")
    val out = ModelEval.rocCurveBy(df, "grp", "y", "s", maxPoints = 4)
      .orderBy("grp", "thr")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    val expected = Seq("a" -> gA, "b" -> gB).flatMap { case (g, rows) =>
      ModelEval.rocCurve(rows.map(r => (r._2, r._3)).toDF("s", "y"),
          "y", "s", maxPoints = 4)
        .orderBy("thr")
        .as[(Double, Long, Double, Double)].collect()
        .map { case (t, n, f, p) => (g, t, n, f, p) }
    }
    assert(out === expected)
    // per-group downsample: each group keeps <= maxPoints + 1 points
    assert(out.groupBy(_._1).values.forall(_.size <= 5))
  }

  test("isotonicCalibrationFromCounts reproduces the full fit from state counts") {
    import spark.implicits._
    val train = Seq((0.05, 1), (0.3, 0), (0.35, 1), (0.9, 1), (0.95, 0))
      .toDF("s", "y")
    val direct = ModelEval.isotonicCalibration(train, "y", "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .as[(Int, Long, Long, Double, Double)].collect().toSet
    val counts = train.select(
        ModelEval.binOf(col("s"), 4, 0.0, 1.0).as("bin"),
        col("y").cast("long").as("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    val fromCounts = ModelEval.isotonicCalibrationFromCounts(counts)
      .as[(Int, Long, Long, Double, Double)].collect().toSet
    assert(fromCounts === direct)
  }

  test("isotonicCalibrationBy equals independent per-group fits") {
    import spark.implicits._
    val gA = Seq((0.05, 1), (0.3, 0), (0.35, 1), (0.9, 1), (0.95, 0))
    val gB = Seq((0.1, 0), (0.6, 1), (0.65, 0), (0.7, 1))
    val df = (gA.map { case (s, y) => ("a", s, y) } ++
      gB.map { case (s, y) => ("b", s, y) }).toDF("grp", "s", "y")
    val out = ModelEval.isotonicCalibrationBy(df, "grp", "y", "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .select("grp", "bin", "n", "n_pos", "iso_rate")
      .as[(String, Int, Long, Long, Double)].collect().toSet
    val expected = Seq("a" -> gA, "b" -> gB).flatMap { case (g, rows) =>
      ModelEval.isotonicCalibration(rows.toDF("s", "y"), "y", "s",
          bins = 4, lo = 0.0, hi = 1.0)
        .select("bin", "n", "n_pos", "iso_rate")
        .as[(Int, Long, Long, Double)].collect()
        .map { case (b, n, p, r) => (g, b, n, p, r) }
    }.toSet
    assert(out === expected)
    // a fit is monotone within its group
    val byGroup = out.groupBy(_._1).view.mapValues(
      _.toSeq.sortBy(_._2).map(_._5)).toMap
    byGroup.values.foreach { rates =>
      assert(rates.zip(rates.tail).forall { case (x, y) => x <= y }) }
  }

  test("applyIsotonicBy routes each row through its own group's fit") {
    import spark.implicits._
    // group a observes bins 1,3; group b observes bin 2 only — the
    // dense extensions differ per group, so cross-routing would show
    val train = Seq(("a", 0.3, 0), ("a", 0.35, 1), ("a", 0.9, 1),
      ("b", 0.6, 1)).toDF("grp", "s", "y")
    val fit = ModelEval.isotonicCalibrationBy(train, "grp", "y", "s",
      bins = 4, lo = 0.0, hi = 1.0)
    val apply = Seq((Some("a"), Some(0.1), "a_b0"),
      (Some("a"), Some(0.6), "a_b2"), (Some("a"), Some(0.9), "a_b3"),
      (Some("b"), Some(0.1), "b_b0"), (Some("b"), Some(0.9), "b_b3"),
      (Some("a"), None, "null_s"), (None, Some(0.5), "null_g"),
      (Some("zzz"), Some(0.5), "unseen_g"))
      .toDF("grp", "s", "tag")
    val out = ModelEval.applyIsotonicBy(apply, fit, "grp", "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .select("tag", "calibrated")
      .as[(String, Option[Double])].collect().toMap
    assert(out("a_b0") === Some(0.5))  // a: extended below bin 1 (1/2)
    assert(out("a_b2") === Some(0.5))  // a: LOCF from bin 1
    assert(out("a_b3") === Some(1.0))  // a: observed bin 3
    assert(out("b_b0") === Some(1.0))  // b: extension from its ONLY bin
    assert(out("b_b3") === Some(1.0))  // b: LOCF from bin 2
    assert(out("null_s") === None)     // null score
    assert(out("null_g") === None)     // null group joins nothing
    assert(out("unseen_g") === None)   // group the fit never saw
  }

  test("isotonicCalibrationByFromCounts reproduces the per-group fits from state counts") {
    import spark.implicits._
    val df = Seq(("a", 0.05, 1), ("a", 0.3, 0), ("a", 0.35, 1),
      ("a", 0.9, 1), ("b", 0.1, 0), ("b", 0.6, 1), ("b", 0.65, 0))
      .toDF("grp", "s", "y")
    val direct = ModelEval.isotonicCalibrationBy(df, "grp", "y", "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .as[(String, Int, Long, Long, Double, Double)].collect().toSet
    val counts = df.select(col("grp"),
        ModelEval.binOf(col("s"), 4, 0.0, 1.0).as("bin"),
        col("y").cast("long").as("y"))
      .groupBy("grp", "bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"))
    val fromCounts = ModelEval
      .isotonicCalibrationByFromCounts(counts, "grp")
      .as[(String, Int, Long, Long, Double, Double)].collect().toSet
    assert(fromCounts === direct)
  }

  test("eceByFromCounts reproduces eceBy from its own counts frame") {
    import spark.implicits._
    val df = Seq(("a", 0.1, 0), ("a", 0.2, 1), ("a", 0.8, 1),
      ("b", 0.3, 0), ("b", 0.6, 1), ("b", 0.95, 1))
      .toDF("grp", "s", "y")
    val direct = ModelEval.eceBy(df, "grp", "y", "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .as[(String, Long, Double)].collect().toSet
    // rebuild the (group, bin) counts exactly as an IncrementalAgg
    // state pair would hold them, then recompute from counts
    val counts = df.select(col("grp"),
        ModelEval.binOf(col("s"), 4, 0.0, 1.0).as("bin"),
        col("y").cast("long").as("y"),
        col("s").cast("decimal(28,9)").as("sd"))
      .groupBy("grp", "bin")
      .agg(count(lit(1)).as("n"), sum("y").as("n_pos"),
        sum("sd").as("sum_s"))
    val fromCounts = ModelEval.eceByFromCounts(counts, "grp")
      .as[(String, Long, Double)].collect().toSet
    assert(fromCounts === direct)
  }

  test("eceBy matches per-group runs of the pooled ece") {
    import spark.implicits._
    val gA = Seq((0.1, 0), (0.2, 1), (0.8, 1), (0.9, 1))
    val gB = Seq((0.3, 0), (0.4, 0), (0.6, 1), (0.7, 0), (0.95, 1))
    val df = (gA.map { case (s, y) => ("a", s, y) } ++
      gB.map { case (s, y) => ("b", s, y) }).toDF("grp", "s", "y")
    val out = ModelEval.eceBy(df, "grp", "y", "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .orderBy("grp").as[(String, Long, Double)].collect().toSeq
    val pooledA = ModelEval.ece(gA.toDF("s", "y"), "y", "s",
      bins = 4, lo = 0.0, hi = 1.0).head()
    val pooledB = ModelEval.ece(gB.toDF("s", "y"), "y", "s",
      bins = 4, lo = 0.0, hi = 1.0).head()
    assert(out === Seq(
      ("a", pooledA.getLong(0), pooledA.getDouble(1)),
      ("b", pooledB.getLong(0), pooledB.getDouble(1))))
    // null group is not a slice; empty input -> empty report
    val withNull = df.union(Seq((null: String, 0.5, 1)).toDF("grp", "s", "y"))
    assert(ModelEval.eceBy(withNull, "grp", "y", "s",
      bins = 4, lo = 0.0, hi = 1.0).count() === 2L)
    assert(ModelEval.eceBy(df.filter("false"), "grp", "y", "s",
      bins = 4, lo = 0.0, hi = 1.0).count() === 0L)
  }

  test("calibrationBy keeps empty bins visible per group") {
    import spark.implicits._
    val df = Seq(("a", 0.05, 1), ("a", 0.95, 0),
      ("b", 0.3, 1), ("b", 0.35, 1)).toDF("grp", "s", "y")
    val out = ModelEval.calibrationBy(df, "grp", "y", "s",
        bins = 4, lo = 0.0, hi = 1.0)
      .orderBy("grp", "bin")
      .as[(String, Int, Long, Long, Option[Double])].collect().toSeq
    assert(out === Seq(
      ("a", 0, 1L, 1L, Some(1.0)), ("a", 1, 0L, 0L, None),
      ("a", 2, 0L, 0L, None), ("a", 3, 1L, 0L, Some(0.0)),
      ("b", 0, 0L, 0L, None), ("b", 1, 2L, 2L, Some(1.0)),
      ("b", 2, 0L, 0L, None), ("b", 3, 0L, 0L, None)))
  }
}
