package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Minimal ordered job runner — the in-engine stand-in for the
  * reference's Airflow DAG `start >> spark_job >> end` (D1/D2,
  * SURVEY.md §2k: dag_incremental_etl.py:8-43). Scheduling cadence
  * stays external (cron/Airflow submit `spark-submit` exactly as the
  * reference does); this runner owns intra-run ordering and
  * fail-fast semantics.
  */
final case class Job(name: String, run: SparkSession => Unit)

object Pipeline {

  /** Run jobs in order; stop at the first failure. Returns the names of
    * completed jobs (on failure the exception propagates after logging
    * which job failed — same observable behavior as a failed DAG task).
    */
  def run(spark: SparkSession, jobs: Seq[Job]): Seq[String] = {
    val done = Seq.newBuilder[String]
    jobs.foreach { job =>
      try {
        job.run(spark)
        done += job.name
      } catch {
        case e: Throwable =>
          System.err.println(s"[pipeline] job '${job.name}' failed: ${e.getMessage}")
          throw e
      }
    }
    done.result()
  }

  /** The reference's two DAGs as a pipeline: seed silver, then run the
    * incremental gold ETL (dag_create_hudi_tables.py +
    * dag_incremental_etl.py).
    */
  def referenceFlow(base: String): Seq[Job] = Seq(
    Job("create_tables", s => { SeedTables.seed(s, base); () }),
    Job("incremental_etl", s => { IncrementalEtl.run(s, base); () }))
}
