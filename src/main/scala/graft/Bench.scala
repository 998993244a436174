package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline queries on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line.
  *
  * Methodology: each query is first executed once at sf0.001 (JVM/JIT/
  * codegen warm-up — measures the engine, not HotSpot), then timed on
  * the target scale factor with a `noop` sink so the FULL plan executes
  * (including final sorts that a bare count() would let the optimizer
  * elide) without measuring result serialization.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val warmDir = sys.env.getOrElse("SPARK_GRAFT_WARM_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def execute(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()

    val names = SparkEntry.benchQueries.filter(SparkEntry.queries.contains)
    // warm-up pass at the small scale factor
    names.foreach { n =>
      try execute(n, warmDir)
      catch { case _: Throwable => () }
    }
    // A query that fails must NOT report its time-to-crash as a valid
    // number (a regression would read as a speedup): failed queries get
    // sentinel -1 and an entry in "errors".
    val errors = scala.collection.mutable.ListBuffer.empty[String]
    val results = names.map { name =>
      val t0 = System.nanoTime()
      val ok =
        try { execute(name, sfDir); true }
        catch { case e: Throwable => errors += name; false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
