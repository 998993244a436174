package graft

import graft.ops.AsOfJoin

/** As-of join semantics on hand-built rows: inclusive match, latest
  * prior wins, no-match → null, keys don't leak across groups.
  */
class AsOfJoinSpec extends SparkSuite {
  import spark.implicits._

  test("greatest right time ≤ left time per key; left-outer; inclusive") {
    val left = Seq(
      ("u1", 10L, "p1"), ("u1", 20L, "p2"), ("u1", 5L, "p0"),
      ("u2", 15L, "p3")
    ).toDF("user", "lt", "pid")
    val right = Seq(
      ("u1", 10L, "v10"), ("u1", 12L, "v12"), ("u1", 1L, "v1"),
      ("u3", 14L, "v14")
    ).toDF("user", "rt", "vid")
    val out = AsOfJoin.asOf(left, right, Seq("user"), "lt", "rt", Seq("vid"))
      .select("pid", "vid").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "p0" -> Some("v1"),   // 1 ≤ 5, latest prior
      "p1" -> Some("v10"),  // rt == lt is a match (inclusive)
      "p2" -> Some("v12"),  // greatest of {1,10,12}
      "p3" -> None))        // u2 has no right rows; u3's must not leak
  }

  test("tolerance nulls stale matches, keeps fresh ones and left rows") {
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)
    val left = Seq(
      ("u1", ts(1000), "p_fresh"),  // match at 950: 50 s old -> kept
      ("u1", ts(2000), "p_stale"),  // match at 950: 1050 s old -> null
      ("u1", ts(950), "p_exact"),   // rt == lt: 0 s old -> kept
      ("u2", ts(100), "p_none")     // no right rows at all
    ).toDF("user", "lt", "pid")
    val right = Seq(("u1", ts(950), "v950"))
      .toDF("user", "rt", "vid")
    val out = AsOfJoin.asOf(left, right, Seq("user"), "lt", "rt",
        Seq("vid"), toleranceMicros = Some(100L * 1000000L))
      .select("pid", "vid").as[(String, Option[String])].collect().toMap
    assert(out === Map(
      "p_fresh" -> Some("v950"), "p_stale" -> None,
      "p_exact" -> Some("v950"), "p_none" -> None))
    // boundary: staleness EXACTLY the tolerance is still fresh (<=)
    val b = AsOfJoin.asOf(Seq(("u1", ts(1050), "pb"))
        .toDF("user", "lt", "pid"), right, Seq("user"), "lt", "rt",
        Seq("vid"), toleranceMicros = Some(100L * 1000000L))
      .select("vid").as[Option[String]].head()
    assert(b === Some("v950"))
  }

  test("null right timestamps never match (SQL comparison semantics)") {
    val left = Seq(("k", 5L, "p")).toDF("key", "lt", "pid")
    val right = Seq(
      ("k", Option.empty[Long], "ghost"), ("k", Some(3L), "real")
    ).toDF("key", "rt", "vid")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "lt", "rt", Seq("vid"))
      .select("vid").as[String].collect()
    assert(out === Array("real"))
    // and with ONLY a null-ts right row: no match at all
    val onlyNull = Seq(("k", Option.empty[Long], "ghost"))
      .toDF("key", "rt", "vid")
    val out2 = AsOfJoin.asOf(left, onlyNull, Seq("key"), "lt", "rt", Seq("vid"))
      .select("vid").as[Option[String]].collect()
    assert(out2 === Array(None))
  }

  test("composite keys: the window partitions on ALL key columns") {
    // (entity, region) composite key: a right row matching on entity
    // alone must NOT enrich a left row from another region — the
    // multi-column feature-store key (user × market, symbol × venue)
    val left = Seq(
      ("e1", "us", 100L, "p1"), ("e1", "eu", 100L, "p2"),
      ("e2", "us", 100L, "p3")).toDF("ent", "reg", "lt", "pid")
    val right = Seq(
      ("e1", "us", 10L, "us_feat"), ("e1", "eu", 20L, "eu_feat"),
      ("e2", "eu", 5L, "wrong_reg")).toDF("ent", "reg", "rt", "feat")
    val out = AsOfJoin.asOf(left, right, Seq("ent", "reg"),
        "lt", "rt", Seq("feat"))
      .select("pid", "feat").as[(String, Option[String])]
      .collect().toMap
    assert(out("p1") === Some("us_feat"))
    assert(out("p2") === Some("eu_feat"))
    assert(out("p3") === None, "entity match alone must not enrich")
    // tolerance composes with composite keys unchanged (tolerance
    // requires TIMESTAMP time columns — µs-epoch conversion)
    import org.apache.spark.sql.functions.timestamp_micros
    val leftTs = left.withColumn("lt", timestamp_micros($"lt"))
    val rightTs = right.withColumn("rt", timestamp_micros($"rt"))
    val tol = AsOfJoin.asOf(leftTs, rightTs, Seq("ent", "reg"),
        "lt", "rt", Seq("feat"), toleranceMicros = Some(85L))
      .select("pid", "feat").as[(String, Option[String])]
      .collect().toMap
    assert(tol("p1") === None, "90-old us_feat exceeds the 85 TTL")
    assert(tol("p2") === Some("eu_feat"), "80-old eu_feat is fresh")
  }

  test("payload struct integrity: all payload columns from the same right row") {
    val left = Seq(("k", 100L, 1)).toDF("key", "lt", "id")
    val right = Seq(
      ("k", 10L, "a", 1.0), ("k", 50L, "b", 2.0)
    ).toDF("key", "rt", "name", "score")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "lt", "rt",
      Seq("name", "score")).select("name", "score")
      .as[(String, Double)].collect()
    assert(out === Array(("b", 2.0)))
  }
}
