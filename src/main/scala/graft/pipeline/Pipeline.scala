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

  /** The bronze write smoke job (reference entry point:
    * Lab2/jobs/python/hudi_spark_minio.py:38-104 — two static customer
    * rows upserted into `bronze/database={db}/table_name={t}`), with the
    * reference's inferred-string schema corrected to typed columns.
    */
  def bronzeSmoke(spark: SparkSession, base: String,
      db: String = "demo"): graft.tables.KeyedTable = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("emp_id", IntegerType, nullable = false),
      StructField("employee_name", StringType),
      StructField("department", StringType),
      StructField("state", StringType),
      StructField("salary", LongType),
      StructField("age", IntegerType),
      StructField("bonus", LongType),
      StructField("ts", LongType)))
    val rows = Seq(
      Row(1, "employee_1", "Sales", "RJ", 100000L, 30, 50000L, 91234L),
      Row(2, "employee_2", "Engineering", "RJ", 120000L, 28, 60000L, 91235L))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows), schema)
    val t = graft.tables.KeyedTable("employees",
      s"$base/bronze/database=$db/table_name=employees",
      Seq("emp_id"), "ts")
    graft.ops.TableOps.upsert(spark, t, df)
    t
  }
}
