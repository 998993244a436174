package graft.sql

import graft.ops.TableOps
import graft.tables.{Catalog, KeyedTable}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.util
import scala.jdk.CollectionConverters._

/** Spark DataSourceV2 catalog over the engine's file-based
  * [[graft.tables.Catalog]] — the SQL-surface analog of the
  * reference's (declared but disabled) hive sync
  * (`hoodie.datasource.hive_sync.*`, AirflowHudiLabs/Lab2/jobs/python/
  * create_hudi_tables.py:130-138), expressed the Spark-native way: a
  * `CatalogPlugin` instead of a metastore daemon. An external SQL user
  * configures
  *
  * {{{
  *   spark.sql.extensions          = graft.sql.GraftSparkExtensions
  *   spark.sql.catalog.graft       = graft.sql.GraftCatalog
  *   spark.sql.catalog.graft.root  = /path/to/catalog
  * }}}
  *
  * and runs `spark.sql("SELECT * FROM graft.db.orders WHERE ...")` with
  * no Scala API in sight. Resolution goes through [[GraftTable]] +
  * [[GraftTableSubstitution]]: the analyzer swaps the relation for the
  * engine's full snapshot plan (manifest state, MOR merge, rename
  * mapping, bootstrap roots), so Catalyst optimizes the REAL plan —
  * filters and column pruning reach the parquet scans exactly as they
  * do for the Scala API. `VERSION AS OF '<commit_ts>'` time travel maps
  * to [[TableOps.snapshotAsOf]].
  *
  * Namespaces are subdirectories of the catalog root (`graft.db.t` →
  * `{root}/db/t.json`); the root itself is the empty namespace, so
  * two-part `graft.t` also resolves. Registration/drop are
  * metadata-only (the table's data is never touched) — writes go
  * through the Scala API, as in the reference where Hive sync is
  * likewise a read-surface.
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var root: String = _

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    root = Option(options.get("root")).getOrElse(throw new
      IllegalArgumentException(
        s"graft catalog '$name' needs spark.sql.catalog.$name.root"))
  }

  override def name(): String = catalogName

  private def spark: SparkSession = SparkSession.active

  private def nsPath(ns: Array[String]): String = {
    ns.foreach(part => require(
      part.nonEmpty && !part.contains("/") && !part.contains(".."),
      s"illegal namespace segment: $part"))
    (root +: ns).mkString("/")
  }

  private def fileCatalog(ns: Array[String]): Catalog =
    Catalog(nsPath(ns), spark)

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  // ————————————————————————————————————————————————— tables

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    fileCatalog(namespace).list()
      .map(n => Identifier.of(namespace, n)).toArray
  }

  override def loadTable(ident: Identifier): Table =
    loadGraft(ident, asOf = None)

  /** `VERSION AS OF '<commit_ts>'` — the engine's time-travel read. */
  override def loadTable(ident: Identifier, version: String): Table =
    loadGraft(ident, asOf = Some(version))

  private def loadGraft(ident: Identifier, asOf: Option[String]): Table = {
    val t = fileCatalog(ident.namespace).load(ident.name)
      .getOrElse(throw new NoSuchTableException(
        (catalogName +: ident.namespace.toSeq) :+ ident.name))
    GraftTable(t, asOf,
      (catalogName +: ident.namespace.toSeq :+ ident.name).mkString("."))
  }

  override def tableExists(ident: Identifier): Boolean =
    fileCatalog(ident.namespace).load(ident.name).isDefined

  override def invalidateTable(ident: Identifier): Unit = ()

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table =
    throw new UnsupportedOperationException(
      "graft catalog is a read surface — create tables with the Scala " +
        "API (TableOps.upsert) and register them via Catalog.register")

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table =
    throw new UnsupportedOperationException(
      "graft catalog: ALTER goes through TableOps (schema evolution / " +
        "renameColumn / dropColumn), not SQL DDL")

  /** Unregisters the descriptor only — the table's data and commit log
    * are untouched (same contract as [[graft.tables.Catalog.drop]]).
    */
  override def dropTable(ident: Identifier): Boolean =
    fileCatalog(ident.namespace).drop(ident.name)

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit =
    throw new UnsupportedOperationException(
      "graft catalog: table identity lives in the commit log — " +
        "re-register under the new name instead")

  // ————————————————————————————————————————————————— namespaces

  override def listNamespaces(): Array[Array[String]] =
    listNamespaces(Array.empty)

  override def listNamespaces(namespace: Array[String])
      : Array[Array[String]] = {
    if (namespace.nonEmpty && !namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    val p = new Path(nsPath(namespace))
    if (!fs.exists(p)) return Array.empty
    fs.listStatus(p).iterator
      .filter(st => st.isDirectory && !st.getPath.getName.startsWith("."))
      .map(st => namespace :+ st.getPath.getName)
      .toArray
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || fs.exists(new Path(nsPath(namespace)))

  override def loadNamespaceMetadata(namespace: Array[String])
      : util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(catalogName +: namespace.toSeq)
    Map("location" -> nsPath(namespace)).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    fs.mkdirs(new Path(nsPath(namespace)))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "graft catalog namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace)) return false
    val p = new Path(nsPath(namespace))
    if (!cascade && fs.listStatus(p).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(p, cascade)
  }
}

/** A cataloged graft table as a DSv2 `Table`. Resolution-only: the
  * analyzer rule [[GraftTableSubstitution]] replaces its relation with
  * the engine's snapshot plan before planning, so Catalyst optimizes
  * real parquet scans (pushdown intact). `newScanBuilder` is never
  * reached when the extension is installed; reaching the capability
  * check without it produces the actionable error below rather than a
  * silently slower path.
  */
case class GraftTable(keyed: KeyedTable, asOf: Option[String],
    qualifiedName: String) extends Table {

  /** The engine's full read plan — manifest state, MOR merge, rename
    * mapping, bootstrap roots. Built lazily on the driver at
    * resolution time; both `schema()` and the substitution rule read
    * THIS, so the relation's resolved schema and the substituted plan
    * can never drift.
    */
  @transient lazy val snapshotDf: DataFrame = {
    val spark = SparkSession.active
    asOf match {
      case Some(v) => TableOps.snapshotAsOf(spark, keyed, v)
      case None => TableOps.snapshot(spark, keyed)
    }
  }

  override def name(): String = qualifiedName

  override def schema(): StructType = snapshotDf.schema

  override def partitioning(): Array[Transform] =
    keyed.partitionBy.map(Expressions.identity).toArray

  override def properties(): util.Map[String, String] =
    (Map("location" -> keyed.path,
      "recordKey" -> keyed.recordKey.mkString(","),
      "precombineKey" -> keyed.precombineKey) ++
      asOf.map("asOf" -> _)).asJava

  override def capabilities(): util.Set[TableCapability] =
    throw new UnsupportedOperationException(
      s"graft table $qualifiedName resolved without the substitution " +
        "rule — set spark.sql.extensions=graft.sql.GraftSparkExtensions")
}
