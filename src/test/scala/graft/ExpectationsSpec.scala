package graft

import graft.ext.Expectations
import org.apache.spark.sql.functions._

/** Expectation-gate semantics: null-as-violation, quarantine
  * annotation, orphan counting, and the one-scan cost claim.
  */
class ExpectationsSpec extends SparkSuite {
  import spark.implicits._

  private lazy val rows = Seq(
    (1L, Some(10.0), "A"),
    (2L, Some(-5.0), "B"),
    (3L, None, "A"),
    (4L, Some(99.0), "Z"))
    .toDF("id", "amount", "flag")

  private val rules = Seq(
    "amount_positive" -> (col("amount") > 0),
    "flag_domain" -> col("flag").isin("A", "B"))

  test("check: per-rule counts, NULL predicate counts as violation") {
    val got = Expectations.check(rows, rules)
      .as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // amount_positive: -5 fails, NULL fails → 2 violations
    assert(got("amount_positive") === ((4L, 2L, false)))
    // flag_domain: Z fails → 1
    assert(got("flag_domain") === ((4L, 1L, false)))
  }

  test("check runs ONE scan regardless of rule count") {
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val plan = Expectations.check(df, Seq(
      "a" -> (col("l_quantity") > 0),
      "b" -> (col("l_extendedprice") > 0),
      "c" -> col("l_returnflag").isNotNull))
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 === 1,
      s"expected exactly one scan in:\n$plan")
  }

  test("violations: quarantine rows annotated with the rules they broke") {
    val got = Expectations.violations(rows, rules)
      .select("id", "violated_rules")
      .as[(Long, Seq[String])].collect().toMap
    assert(got === Map(
      2L -> Seq("amount_positive"),
      3L -> Seq("amount_positive"),
      4L -> Seq("flag_domain")))
    // clean rows flow through untouched
    assert(!got.contains(1L))
  }

  test("profile: nulls, distincts, min/max per column in one scan") {
    val got = Expectations.profile(rows, Seq("amount", "flag"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("amount") === (("amount", 4L, 1L, 3L, "-5.0", "99.0")))
    assert(got("flag") === (("flag", 4L, 0L, 3L, "A", "Z")))
    val plan = Expectations.profile(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      Seq("o_orderkey", "o_custkey"))
      .queryExecution.executedPlan.toString
    assert(plan.split("FileScan").length - 1 === 1,
      s"expected exactly one scan in:\n$plan")
    // approx mode keeps the same schema and lands near the exact counts
    val approx = Expectations.profile(rows, Seq("flag"),
      exactDistinct = false)
      .as[(String, Long, Long, Long, String, String)].head()
    assert(approx._4 >= 2L && approx._4 <= 4L)
    // approx mode (the at-scale default): still ONE scan, and the
    // Expand row replication of multi-column exact distincts is gone
    val approxPlan = Expectations.profile(
      spark.read.parquet(s"$sfDir/orders.parquet"),
      Seq("o_orderkey", "o_custkey"), exactDistinct = false)
      .queryExecution.executedPlan.toString
    assert(approxPlan.split("FileScan").length - 1 === 1,
      s"expected exactly one scan in:\n$approxPlan")
    assert(!approxPlan.contains("Expand"),
      s"approx-distinct profile must not plan through Expand:\n$approxPlan")
  }

  test("orphans: FK violations counted; null child keys are orphans") {
    val parent = Seq(10L, 20L).toDF("pk")
    val child = Seq(Some(10L), Some(10L), Some(30L), None)
      .toDF("fk")
    val got = Expectations.orphans(child, "fk", parent, "pk")
      .as[(String, Long, Long, Boolean)].head()
    assert(got === (("referential_integrity", 4L, 2L, false)))
    val clean = Expectations.orphans(
      Seq(10L, 20L).toDF("fk"), "fk", parent, "pk")
      .as[(String, Long, Long, Boolean)].head()
    assert(clean._4 === true)
  }

  test("iqrOutliers: rank-exact quartiles, fences, flags; nulls dropped") {
    // group a: 1..8 plus a wild 100 — n=9, q1 at rank ceil(2.25)=3 → 3,
    // q3 at rank ceil(6.75)=7 → 7; IQR 4, fences [-3, 13] → one outlier
    val rows = ((1 to 8).map(v => ("a", Some(v.toDouble))) :+
      ("a", Some(100.0)) :+ ("a", None) :+
      ("b", Some(5.0)) :+ ("b", Some(6.0))).toDF("g", "v")
    val out = Expectations.iqrOutliers(rows, Seq("g"), "v")
      .orderBy("g")
      .as[(String, Long, Double, Double, Double, Double, Long)]
      .collect()
    val a = out(0)
    assert(a === (("a", 9L, 3.0, 7.0, -3.0, 13.0, 1L)))
    // group b: n=2, q1 rank ceil(0.5)=1 → 5, q3 rank ceil(1.5)=2 → 6;
    // fences [3.5, 7.5] → no outliers (null row in a was dropped)
    val b = out(1)
    assert(b === (("b", 2L, 5.0, 6.0, 3.5, 7.5, 0L)))
  }

  test("iqrOutliers/quantileReport approx=true: same shape, no window") {
    val rows = (1 to 1000).map(v => ("a", v.toDouble)) ++
      (1 to 500).map(v => ("b", v * 2.0))
    val df = rows.toDF("g", "v")
    // at accuracy 10000 over 1000 rows the sketch is rank-exact, so
    // the approx report must EQUAL the rank-exact one cell for cell
    val exact = Expectations.iqrOutliers(df, Seq("g"), "v")
      .orderBy("g").collect().toSeq
    val approx = Expectations.iqrOutliers(df, Seq("g"), "v",
      approx = true).orderBy("g").collect().toSeq
    assert(approx === exact)
    val qe = Expectations.quantileReport(df, Seq("g"), "v",
      Seq(0.5, 0.9)).orderBy("g").collect().toSeq
    val qa = Expectations.quantileReport(df, Seq("g"), "v",
      Seq(0.5, 0.9), approx = true).orderBy("g").collect().toSeq
    assert(qa === qe)
    // the scale contract: the approx plan carries NO per-group sort
    // window (objectHashAggregate over the sketch instead) and keeps
    // map-side partial aggregation
    val plan = Expectations.iqrOutliers(df, Seq("g"), "v",
      approx = true).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"approx path must not plan a window:\n$plan")
    val planQ = Expectations.quantileReport(df, Seq("g"), "v",
      Seq(0.5), approx = true).queryExecution.executedPlan.toString
    assert(!planQ.contains("Window"),
      s"approx quantile path must not plan a window:\n$planQ")
  }

  test("psiDriftBy: per-group spines/totals; one-sided group reports NULL term") {
    val ref = Seq(
      ("s1", 0.0), ("s1", 0.0), ("s1", 300.0),
      ("s2", 0.0), ("s2", 300.0),
      ("gone", 0.0)) // present ONLY on the reference side
      .toDF("source", "v")
    val cur = Seq(
      ("s1", 0.0), ("s1", 300.0), ("s1", 300.0),
      ("s2", 0.0), ("s2", 300.0),
      ("new", 300.0)) // present ONLY on the current side
      .toDF("source", "v")
    val rep = Expectations.psiDriftBy(ref, cur, "source",
        value = col("v"), bins = 2, lo = 0.0, hi = 512.0)
      .orderBy("source", "bin").collect()
    // group universe = union of both sides, dense 2-bin spine each
    assert(rep.map(_.getString(0)).toSeq ===
      Seq("gone", "gone", "new", "new", "s1", "s1", "s2", "s2"))
    val bySrc = rep.groupBy(_.getString(0))
    // one-sided groups keep their counts but a NULL term (0/0 side)
    assert(bySrc("gone").forall(_.isNullAt(4)))
    assert(bySrc("gone").map(r => (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet === Set((0, 1L, 0L), (1, 0L, 0L)))
    assert(bySrc("new").forall(_.isNullAt(4)))
    // two-sided groups: per-GROUP totals (s1: 2/3 vs 1/3 in bin 0 --
    // a global total would dilute it), symmetric PSI term, both bins
    val s1b0 = bySrc("s1").find(_.getInt(1) == 0).get
    assert((s1b0.getLong(2), s1b0.getLong(3)) === ((2L, 1L)))
    val p = 2.0 / 3; val q = 1.0 / 3
    val expected = BigDecimal((p - q) * math.log(p / q))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(s1b0.getDouble(4) === expected)
    // s2 is identical on both sides: zero drift in every bin
    assert(bySrc("s2").forall(_.getDouble(4) == 0.0))
  }
}
