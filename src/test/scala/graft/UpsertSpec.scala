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
}
