package graft

import graft.pipeline.Pipeline
import org.apache.spark.sql.SparkSession

/** `spark-submit` entry point (D2) — the packaged analog of the
  * reference's scheduled job submission (dag_incremental_etl.py:23-34
  * submits incremental_etl_orders.py via SparkSubmitOperator; the
  * scheduler cadence stays external, exactly as there):
  *
  * {{{
  * sbt package
  * /opt/spark/bin/spark-submit --master 'local[4]' \
  *   --class graft.Main \
  *   target/scala-2.13/learnhowtointegeratehudisparkjobwithairflowandminiospark_2.13-0.1.0.jar \
  *   /tmp/graft-flow
  * }}}
  *
  * Runs the reference's two DAGs end-to-end under `args(0)`: seed the
  * silver tables, then the checkpointed incremental gold ETL. Re-submit
  * to process the next increment (the checkpoint store makes each
  * submission consume exactly the new commits).
  */
object Main {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/tmp/graft-flow")
    val builder = SparkSession.builder()
      .appName("graft-reference-flow")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
    // spark-submit injects spark.master; default only when launched bare
    if (!sys.props.contains("spark.master")) builder.master("local[4]")
    val spark = builder.getOrCreate()
    try {
      val done = Pipeline.run(spark, Pipeline.referenceFlow(base))
      println(s"[graft] completed jobs: ${done.mkString(", ")}")
    } finally spark.stop()
  }
}
