package graft.tables

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.nio.charset.StandardCharsets
import scala.util.matching.Regex

/** Incremental-read checkpoint metadata (SURVEY.md §1 checkpoint model).
  *
  * Replaces the reference's boto3 `AWSS3` helper class
  * (incremental_etl_orders.py:66-166: put_files/item_exists/get_item/
  * find_one_update/delete_object/get_all_keys/find_one_similar_key) with
  * the Hadoop FileSystem API Spark already carries — same credentials and
  * endpoint config as the data path (incremental_etl_orders.py:56-63), no
  * second client stack, and it works identically on file://, hdfs:// and
  * s3a://.
  *
  * One JSON object per source table at `{root}/metadata/{table}.json`
  * holding `last_processed_commit`, `table_name`, `path`, `inserted_time`
  * (incremental_etl_orders.py:189,255-261). Single-encoded JSON — the
  * reference double-encodes (json.dumps of a json.dumps'ed dict,
  * :241,:255) and reads back via ast.literal_eval; we do not replicate
  * that quirk (SURVEY.md §4 anti-patterns).
  */
final class CheckpointStore(root: String, conf: Configuration) {
  private def fs: FileSystem = new Path(root).getFileSystem(conf)
  private def keyPath(table: String) = new Path(s"$root/metadata/$table.json")

  /** put_files analog (incremental_etl_orders.py:80-91). */
  def put(cp: Checkpoint): Unit = {
    val json = JsonMethods.compact(
      JObject(
        "last_processed_commit" -> JString(cp.lastProcessedCommit),
        "table_name"            -> JString(cp.tableName),
        "path"                  -> JString(cp.path),
        "inserted_time"         -> JString(cp.insertedTime)))
    AtomicFile.write(fs, keyPath(cp.tableName),
      json.getBytes(StandardCharsets.UTF_8))
  }

  /** item_exists analog (incremental_etl_orders.py:93-99). */
  def exists(table: String): Boolean = fs.exists(keyPath(table))

  /** get_item analog (incremental_etl_orders.py:101-111). */
  def get(table: String): Option[Checkpoint] = {
    val p = keyPath(table)
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val raw =
      try new String(org.apache.commons.io.IOUtils.toByteArray(in),
        StandardCharsets.UTF_8)
      finally in.close()
    try {
      val j = JsonMethods.parse(raw)
      def s(field: String): String = j \ field match {
        case JString(v) => v
        case _          => ""
      }
      Some(Checkpoint(s("last_processed_commit"), s("table_name"), s("path"),
        s("inserted_time")))
    } catch {
      case _: Exception =>
        System.err.println(s"graft: skipping unparseable checkpoint $p")
        None
    }
  }

  /** delete_object analog (incremental_etl_orders.py:130-133). */
  def delete(table: String): Boolean =
    fs.delete(keyPath(table), false)

  /** get_all_keys analog — list every checkpoint key under metadata/
    * (incremental_etl_orders.py:135-153; the paginated list_objects_v2
    * loop collapses to one listStatus call).
    */
  def listKeys(): Seq[String] = {
    val dir = new Path(s"$root/metadata")
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).iterator.map(_.getPath.getName).toSeq.sorted
  }

  /** find_one_similar_key analog — regex search over the listing
    * (incremental_etl_orders.py:161-163).
    */
  def findSimilarKeys(pattern: String): Seq[String] = {
    val re = new Regex(pattern)
    listKeys().filter(k => re.findFirstIn(k).isDefined)
  }
}

/** The checkpoint payload (incremental_etl_orders.py:255-261). */
final case class Checkpoint(
    lastProcessedCommit: String,
    tableName: String,
    path: String,
    insertedTime: String)

object CheckpointStore {
  def apply(root: String, spark: SparkSession): CheckpointStore =
    new CheckpointStore(root, spark.sparkContext.hadoopConfiguration)
}
