package graft.sources

import org.apache.spark.sql.SparkSession

/** Object-store (S3/MinIO) deployment configuration — the engine's
  * analog of the reference's hand-set Hadoop conf block
  * (AirflowHudiLabs/Lab2/jobs/python/incremental_etl_orders.py:56-63 and
  * hudi_spark_minio.py:24-35): endpoint + static credentials +
  * path-style access against a MinIO endpoint.
  *
  * The engine's commit protocol is object-store-safe BY CONSTRUCTION
  * (TableOps scaladoc): data dirs are immutable and append-only, the
  * only publish primitive is a single-file manifest PUT, and no
  * reader-visible path is ever produced by a directory rename — so no
  * S3A committer heroics are required for the ENGINE's metadata. For
  * the parquet task commits themselves, production S3 deployments
  * should additionally enable an S3-safe committer (the
  * `fs.s3a.committer.name=directory` staging committer ships with
  * hadoop-aws); the engine is agnostic to it.
  *
  * Settings go on `spark.sparkContext.hadoopConfiguration`, which Spark
  * propagates to executors — same mechanism the reference uses via
  * `spark._jsc.hadoopConfiguration()`.
  */
object S3Conf {

  /** Point every `s3a://` path of this session at an S3-compatible
    * endpoint. `ssl = false` + path-style mirrors the reference's
    * docker-compose MinIO (http://minio:9000, path-style buckets).
    */
  def apply(spark: SparkSession, endpoint: String,
      accessKey: String, secretKey: String,
      pathStyleAccess: Boolean = true, ssl: Boolean = false): Unit = {
    val c = spark.sparkContext.hadoopConfiguration
    c.set("fs.s3a.endpoint", endpoint)
    c.set("fs.s3a.access.key", accessKey)
    c.set("fs.s3a.secret.key", secretKey)
    c.set("fs.s3a.path.style.access", pathStyleAccess.toString)
    c.set("fs.s3a.connection.ssl.enabled", ssl.toString)
    c.set("fs.s3a.impl", "org.apache.hadoop.fs.s3a.S3AFileSystem")
    c.set("fs.s3a.aws.credentials.provider",
      "org.apache.hadoop.fs.s3a.SimpleAWSCredentialsProvider")
  }

  /** Convenience for the reference's env-var driven deployment:
    * MINIO_ENDPOINT / MINIO_ACCESS_KEY / MINIO_SECRET_KEY.
    */
  def fromEnv(spark: SparkSession,
      env: Map[String, String] = sys.env): Boolean =
    (env.get("MINIO_ENDPOINT"), env.get("MINIO_ACCESS_KEY"),
      env.get("MINIO_SECRET_KEY")) match {
      case (Some(e), Some(a), Some(s)) => apply(spark, e, a, s); true
      case _ => false
    }
}
