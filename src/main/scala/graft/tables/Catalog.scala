package graft.tables

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import java.nio.charset.StandardCharsets

/** Persistent file-based table catalog — the engine's hive-sync analog
  * (reference: `hoodie.datasource.hive_sync.*`, AirflowHudiLabs/Lab2/
  * jobs/python/create_hudi_tables.py:130-138 — configured but DISABLED
  * in every call, `:249,271`, so the reference itself never gets
  * cross-session table discovery; this closes that gap the way a
  * metastore would).
  *
  * One JSON descriptor per table at `{root}/{name}.json`, published
  * with the same [[AtomicFile]] discipline as every other metadata
  * write. A new session, job, or cluster points at the catalog root
  * and recovers every [[KeyedTable]] descriptor — then
  * [[syncViews]] registers each table's CURRENT snapshot as a SQL
  * temp view (the after-commit sync shape Hudi's hive sync performs).
  *
  * Metadata-only: kilobyte files, driver-side listing — never a data
  * scan. Descriptor updates are last-writer-wins (table identity
  * lives in the commit log, not here).
  */
final class Catalog(root: String, spark: SparkSession) {
  private val dir = new Path(root)
  private def fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def descPath(name: String): Path = {
    require(name.nonEmpty && !name.contains("/") && !name.contains(".."),
      s"illegal table name: $name")
    new Path(dir, s"$name.json")
  }

  /** Register (or update) a table descriptor. */
  def register(t: KeyedTable): Unit = register(t, None)

  /** Register with a DECLARED schema — the `CREATE TABLE` path: the
    * schema makes a commitless table readable (and gives the first
    * write something to align against). After the first commit the
    * manifest schema is authoritative, as everywhere else.
    */
  def register(t: KeyedTable,
      schema: Option[org.apache.spark.sql.types.StructType]): Unit = {
    import org.json4s.JsonDSL._
    import org.json4s.jackson.JsonMethods
    val json = ("name" -> t.name) ~ ("path" -> t.path) ~
      ("recordKey" -> t.recordKey) ~
      ("precombineKey" -> t.precombineKey) ~
      ("partitionBy" -> t.partitionBy) ~
      ("globalIndex" -> t.globalIndex) ~
      ("statsColumns" -> t.statsColumns) ~
      ("schemaJson" -> schema.map(_.json))
    AtomicFile.write(fs, descPath(t.name),
      JsonMethods.compact(JsonMethods.render(json))
        .getBytes(StandardCharsets.UTF_8))
  }

  /** The declared schema registered with `name`, if any. */
  def loadSchema(name: String)
      : Option[org.apache.spark.sql.types.StructType] =
    loadEntry(name).flatMap(_._2)

  /** The descriptor registered under `name`, if present and parseable. */
  def load(name: String): Option[KeyedTable] = loadEntry(name).map(_._1)

  /** Descriptor + declared schema in ONE read+parse — the SQL catalog
    * resolves tables per statement, and separate load/loadSchema calls
    * would pay repeated metadata round trips on an object store.
    */
  def loadEntry(name: String)
      : Option[(KeyedTable, Option[org.apache.spark.sql.types.StructType])] = {
    val p = descPath(name)
    if (!fs.exists(p)) return None
    try {
      import org.json4s._
      import org.json4s.jackson.JsonMethods
      implicit val fmts: Formats = DefaultFormats
      val j = {
        val in = fs.open(p)
        try JsonMethods.parse(new String(
          org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8))
        finally in.close()
      }
      val kt = KeyedTable(
        name = (j \ "name").extract[String],
        path = (j \ "path").extract[String],
        recordKey = (j \ "recordKey").extract[Seq[String]],
        precombineKey = (j \ "precombineKey").extract[String],
        partitionBy = (j \ "partitionBy").extract[Seq[String]],
        globalIndex = (j \ "globalIndex").extract[Boolean],
        statsColumns = (j \ "statsColumns").extract[Seq[String]])
      val schema = (j \ "schemaJson").extractOpt[String].flatMap(s =>
        scala.util.Try(org.apache.spark.sql.types.DataType.fromJson(s)
          .asInstanceOf[org.apache.spark.sql.types.StructType]).toOption)
      Some((kt, schema))
    } catch {
      case _: Exception =>
        System.err.println(s"graft: skipping unparseable catalog entry $p")
        None
    }
  }

  /** Registered table names, sorted. */
  def list(): Seq[String] = {
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).iterator
      .map(_.getPath.getName)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json"))
      .toSeq.sorted
  }

  /** Remove a registration (the table's data is untouched). */
  def drop(name: String): Boolean = fs.delete(descPath(name), false)

  /** Register every cataloged table's current snapshot as a SQL temp
    * view (Hudi's sync-after-commit shape: call again after writes so
    * SQL sees the new state). Returns the synced names. One broken
    * entry (registered before its first commit, or a stale descriptor
    * whose data is gone) is skipped with a warning — it must not stop
    * every other table from syncing.
    */
  def syncViews(): Seq[String] =
    list().flatMap(load).flatMap { t =>
      try { graft.ops.TableOps.syncView(spark, t); Some(t.name) }
      catch {
        case e: Exception =>
          System.err.println(
            s"graft: catalog sync skipping ${t.name}: ${e.getMessage}")
          None
      }
    }
}

object Catalog {
  def apply(root: String, spark: SparkSession): Catalog =
    new Catalog(root, spark)
}
