package graft.conf

import org.apache.spark.sql.SparkSession

/** Recommended session configuration at cluster scale. Local test mains
  * use small fixed values (cores, shuffle=cores); these are the knobs a
  * 1000-executor / 100 TB deployment sets instead — kept in code so the
  * recommendation is versioned with the operators it tunes.
  */
object Tuning {

  /** Cluster-scale profile. `targetPartitionBytes` sizes both scan
    * splits and (via AQE advisory) post-shuffle partitions so a
    * partition comfortably fits executor memory; shuffle.partitions is
    * only the pre-AQE upper bound — AQE coalesces to the advisory size.
    */
  def clusterProfile(
      shufflePartitions: Int = 4096,
      targetPartitionBytes: Long = 128L * 1024 * 1024,
      broadcastThresholdBytes: Long = 64L * 1024 * 1024): Map[String, String] = Map(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
      targetPartitionBytes.toString,
    "spark.sql.shuffle.partitions" -> shufflePartitions.toString,
    "spark.sql.files.maxPartitionBytes" -> targetPartitionBytes.toString,
    "spark.sql.autoBroadcastJoinThreshold" -> broadcastThresholdBytes.toString,
    "spark.sql.parquet.filterPushdown" -> "true",
    "spark.sql.parquet.aggregatePushdown" -> "true",
    "spark.serializer" -> "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.session.timeZone" -> "UTC")

  def apply(spark: SparkSession, profile: Map[String, String]): Unit =
    profile.foreach { case (k, v) =>
      try spark.conf.set(k, v)
      catch { case _: org.apache.spark.sql.AnalysisException => () } // static conf on a live session
    }
}
