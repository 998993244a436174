package graft

/** Driver-contract smoke: entry() on sf0.001 returns rows; every
  * oracleSql key has a matching query; bench set is a subset of the
  * query map.
  */
class EntrySpec extends SparkSuite {

  test("entry flagship returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("contract consistency: oracles and bench names resolve") {
    val qs = SparkEntry.queries.keySet
    val orphanOracles = SparkEntry.oracleSql.keySet -- qs
    assert(orphanOracles.isEmpty, s"oracles without queries: $orphanOracles")
    val orphanBench = SparkEntry.benchQueries.toSet -- qs
    assert(orphanBench.isEmpty, s"bench names without queries: $orphanBench")
  }

  test("cluster tuning profile applies (runtime confs set, static ones skipped)") {
    val profile = graft.conf.Tuning.clusterProfile(shufflePartitions = 7)
    // the session is shared across suites: snapshot every touched conf
    // and restore, or later plan-shape assertions go order-dependent
    val before = profile.keys.map(k =>
      k -> spark.conf.getOption(k)).toMap
    try {
      graft.conf.Tuning(spark, profile)
      assert(spark.conf.get("spark.sql.shuffle.partitions") === "7")
      assert(spark.conf.get("spark.sql.adaptive.skewJoin.enabled") === "true")
    } finally before.foreach {
      case (k, Some(v)) => try spark.conf.set(k, v) catch { case _: Throwable => () }
      case (k, None)    => try spark.conf.unset(k) catch { case _: Throwable => () }
    }
  }

  test("every query EXECUTES end-to-end at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sfDir)
      assert(df.schema.fields.nonEmpty, name)
      // noop write forces full execution (schema-only checks would let
      // runtime failures through for every lazy query)
      try df.write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => fail(s"query $name failed: ${e.getMessage}") }
    }
  }
}
