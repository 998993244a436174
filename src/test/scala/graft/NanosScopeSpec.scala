package graft

import graft.queries.CoreQueries

/** The events() reader needs the nanosAsLong legacy conf only during
  * schema resolution; it must not leak the setting into the session
  * (VERDICT r1 #10) and the restored conf must not break the lazy scan.
  */
class NanosScopeSpec extends SparkSuite {
  test("events() leaves no conf residue and still executes lazily") {
    val key    = "spark.sql.legacy.parquet.nanosAsLong"
    val before = spark.conf.getOption(key)
    val df     = CoreQueries.events(spark, sfDir)
    assert(spark.conf.getOption(key) === before)
    assert(df.count() > 0)
    assert(df.filter(org.apache.spark.sql.functions.col("ts").isNotNull).count() > 0)
  }
}
