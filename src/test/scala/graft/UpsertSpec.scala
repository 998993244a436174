package graft

import graft.ops.Upsert
import org.apache.spark.sql.DataFrame

import scala.util.Random

/** Merge semantics unit + property tests (SURVEY.md §5 items 2–3):
  * insert / update / precombine resolution / tie-break / idempotency,
  * plus the max_by formulation cross-checked against the window
  * formulation, over seeded random batches.
  */
class UpsertSpec extends SparkSuite {
  import spark.implicits._

  private def df(rows: Seq[(String, Int, String)]): DataFrame =
    rows.toDF("id", "ver", "payload")

  private def toSet(d: DataFrame): Set[(String, Int, String)] =
    d.as[(String, Int, String)].collect().toSet

  test("insert: new keys are added") {
    val out = Upsert.merge(df(Seq(("a", 1, "x"))), df(Seq(("b", 1, "y"))),
      Seq("id"), Seq("ver"))
    assert(toSet(out) === Set(("a", 1, "x"), ("b", 1, "y")))
  }

  test("update: greater precombine wins regardless of batch side") {
    val newer = Upsert.merge(df(Seq(("a", 1, "old"))), df(Seq(("a", 2, "new"))),
      Seq("id"), Seq("ver"))
    assert(toSet(newer) === Set(("a", 2, "new")))
    // incoming has LOWER precombine → existing row survives (Hudi
    // precombine semantics, create_hudi_tables.py:126)
    val older = Upsert.merge(df(Seq(("a", 5, "keep"))), df(Seq(("a", 2, "stale"))),
      Seq("id"), Seq("ver"))
    assert(toSet(older) === Set(("a", 5, "keep")))
  }

  test("tie on precombine: incoming wins") {
    val out = Upsert.merge(df(Seq(("a", 1, "old"))), df(Seq(("a", 1, "new"))),
      Seq("id"), Seq("ver"))
    assert(toSet(out) === Set(("a", 1, "new")))
  }

  test("within-batch dedup picks max precombine") {
    val out = Upsert.dedupBatch(
      df(Seq(("a", 1, "v1"), ("a", 3, "v3"), ("a", 2, "v2"))),
      Seq("id"), Seq("ver"))
    assert(toSet(out) === Set(("a", 3, "v3")))
  }

  test("untouched = existing keys absent from incoming") {
    val out = Upsert.untouched(df(Seq(("a", 1, "x"), ("b", 1, "y"))),
      df(Seq(("b", 9, "z"))), Seq("id"))
    assert(toSet(out) === Set(("a", 1, "x")))
  }

  /** Random batch with unique (id, ver) so merge winners are
    * well-defined.
    */
  private def randomBatch(rnd: Random): Seq[(String, Int, String)] =
    Seq.fill(20)((s"k${rnd.nextInt(9)}", rnd.nextInt(6),
      s"p${rnd.nextInt(1000)}"))
      .distinctBy(r => (r._1, r._2))
      .map(r => (r._1, r._2, s"${r._3}-${r._2}"))

  test("property: merge == windowed merge (same winners), 15 seeds") {
    for (seed <- 1 to 15) {
      val rnd = new Random(seed)
      val e = df(randomBatch(rnd)); val i = df(randomBatch(rnd))
      assert(toSet(Upsert.merge(e, i, Seq("id"), Seq("ver"))) ===
        toSet(Upsert.mergeWindowed(e, i, Seq("id"), Seq("ver"))),
        s"seed=$seed")
    }
  }

  test("property: key uniqueness after merge, 15 seeds") {
    for (seed <- 100 to 114) {
      val rnd = new Random(seed)
      val out = Upsert.merge(df(randomBatch(rnd)), df(randomBatch(rnd)),
        Seq("id"), Seq("ver"))
      val ids = out.select("id").as[String].collect()
      assert(ids.length === ids.distinct.length, s"seed=$seed")
    }
  }

  test("property: idempotence — re-applying a batch changes nothing") {
    for (seed <- 200 to 209) {
      val rnd = new Random(seed)
      val e = df(randomBatch(rnd)); val i = df(randomBatch(rnd))
      val once = Upsert.merge(e, i, Seq("id"), Seq("ver"))
      val twice = Upsert.merge(once, i, Seq("id"), Seq("ver"))
      assert(toSet(once) === toSet(twice), s"seed=$seed")
    }
  }

  // ---- partial-update payload (mergePartial / dedupBatchPartial) ----

  private def dfN(rows: Seq[(String, Int, Option[String], Option[Int])])
      : DataFrame = rows.toDF("id", "ver", "a", "b")

  private def toSetN(d: DataFrame)
      : Set[(String, Int, Option[String], Option[Int])] =
    d.select("id", "ver", "a", "b")
      .as[(String, Int, Option[String], Option[Int])].collect().toSet

  test("partial: null columns do not erase stored values") {
    val out = Upsert.mergePartial(
      dfN(Seq(("k", 1, Some("keep"), Some(7)))),
      dfN(Seq(("k", 2, None, Some(9)))),
      Seq("id"), Seq("ver"))
    assert(toSetN(out) === Set(("k", 2, Some("keep"), Some(9))))
  }

  test("partial: stale batch only fills columns null in newer state") {
    // existing is NEWER (ver 5) with a null in column b: the stale
    // incoming row must not override a or ver, but its non-null b is
    // the latest non-null version of b.
    val out = Upsert.mergePartial(
      dfN(Seq(("k", 5, Some("new"), None))),
      dfN(Seq(("k", 2, Some("old"), Some(3)))),
      Seq("id"), Seq("ver"))
    assert(toSetN(out) === Set(("k", 5, Some("new"), Some(3))))
  }

  test("partial: column null in every version stays null; inserts work") {
    val out = Upsert.mergePartial(
      dfN(Seq(("k", 1, None, None))),
      dfN(Seq(("k", 2, None, Some(1)), ("j", 1, Some("x"), None))),
      Seq("id"), Seq("ver"))
    assert(toSetN(out) ===
      Set(("k", 2, None, Some(1)), ("j", 1, Some("x"), None)))
  }

  test("partial: tie on precombine — incoming non-null wins") {
    val out = Upsert.mergePartial(
      dfN(Seq(("k", 1, Some("old"), Some(1)))),
      dfN(Seq(("k", 1, Some("new"), None))),
      Seq("id"), Seq("ver"))
    assert(toSetN(out) === Set(("k", 1, Some("new"), Some(1))))
  }

  test("partial: within-batch sparse updates to one key FOLD") {
    val out = Upsert.dedupBatchPartial(
      dfN(Seq(("k", 1, Some("a1"), None), ("k", 2, None, Some(2)),
        ("k", 3, None, None))),
      Seq("id"), Seq("ver"))
    assert(toSetN(out) === Set(("k", 3, Some("a1"), Some(2))))
  }

  test("partial: schema evolution — incoming-only column backfills null") {
    val existing = Seq(("k", 1, "x")).toDF("id", "ver", "a")
    val incoming = Seq(("k", 2, 42)).toDF("id", "ver", "extra")
    val out = Upsert.mergePartial(existing, incoming, Seq("id"), Seq("ver"))
    assert(out.columns.toSeq === Seq("id", "ver", "a", "extra"))
    assert(out.as[(String, Int, Option[String], Option[Int])]
      .collect().toSet === Set(("k", 2, Some("x"), Some(42))))
  }

  test("property: mergePartial == merge when no value is null, 10 seeds") {
    for (seed <- 300 to 309) {
      val rnd = new Random(seed)
      val e = df(randomBatch(rnd)); val i = df(randomBatch(rnd))
      assert(toSet(Upsert.mergePartial(e, i, Seq("id"), Seq("ver"))) ===
        toSet(Upsert.merge(e, i, Seq("id"), Seq("ver"))), s"seed=$seed")
    }
  }

  test("property: mergePartial == per-column Scala fold oracle, 10 seeds") {
    def randomSparse(rnd: Random): Seq[(String, Int, Option[String], Option[Int])] =
      Seq.fill(25)((s"k${rnd.nextInt(7)}", rnd.nextInt(9),
        Option.when(rnd.nextBoolean())(s"a${rnd.nextInt(50)}"),
        Option.when(rnd.nextBoolean())(rnd.nextInt(50))))
        .distinctBy(r => (r._1, r._2))
    for (seed <- 400 to 409) {
      val rnd = new Random(seed)
      val e = randomSparse(rnd); val i = randomSparse(rnd)
      // oracle: per key, rows ordered by (ver, src) ascending; each
      // column independently takes the last non-null; ver/src always
      // non-null so the winner row defines them
      val all = e.map(r => (r, 0)) ++ i.map(r => (r, 1))
      val expected = all.groupBy(_._1._1).map { case (id, rows) =>
        val sorted = rows.sortBy { case (r, src) => (r._2, src) }
        val ver = sorted.last._1._2
        val a = sorted.flatMap(_._1._3).lastOption
        val b = sorted.flatMap(_._1._4).lastOption
        (id, ver, a, b)
      }.toSet
      assert(toSetN(Upsert.mergePartial(dfN(e), dfN(i),
        Seq("id"), Seq("ver"))) === expected, s"seed=$seed")
    }
  }
}
