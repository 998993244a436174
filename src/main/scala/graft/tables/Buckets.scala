package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Writer-side hash bucketing — Spark's native co-located-join layout
  * (`DataFrameWriter.bucketBy`), wrapped so the bucket spec survives
  * sessions through a filesystem descriptor instead of a long-lived
  * metastore.
  *
  * WHY at 100 TB: two fact tables bucketed on their join key with the
  * same bucket count sort-merge-join with NO Exchange on either side —
  * the single biggest shuffle in a typical star-schema pipeline
  * (fact⋈fact re-keying) disappears from every downstream query that
  * joins or aggregates on the bucket key. The price is paid once at
  * write time (one hash shuffle into buckets); every read amortizes
  * it. This is the Spark-native equivalent of the reference's Hudi
  * bucket-index layout (SURVEY.md §2k — hoodie.index.type=BUCKET is
  * the same design: deterministic hash(key)→file routing).
  *
  * Spark only keeps bucket metadata in the session catalog, so a bare
  * `spark.read.parquet(path)` in a NEW session would forget the layout
  * and re-shuffle. [[write]] therefore drops a `_bucket_spec.json`
  * next to the data, and [[restore]] re-registers the table in any
  * later session via `CREATE TABLE … USING parquet CLUSTERED BY …
  * LOCATION …` DDL — after which reads are bucketed again, no data
  * rewrite. (Exactly-once/upsert tables belong to [[KeyedTable]];
  * bucketed tables are append/overwrite analytics layouts.)
  */
object Buckets {

  private val SpecFile = "_bucket_spec.json"

  /** Table name / bucket-key pattern admitted into interpolated DDL.
    * Strict by design: a backtick in a quoted identifier or a quote in
    * the LOCATION clause would silently produce malformed or
    * mis-addressed SQL — reject up front with a clear error instead.
    */
  private val IdentPattern = "[A-Za-z_][A-Za-z0-9_]*".r

  private def checkIdent(kind: String, s: String): Unit =
    require(IdentPattern.matches(s),
      s"$kind '$s' is not a plain identifier ([A-Za-z_][A-Za-z0-9_]*); " +
        "bucketed-table DDL interpolates it into SQL")

  private def checkPath(path: String): Unit =
    require(!path.contains("'"),
      s"path '$path' contains a single quote, which would break the " +
        "CREATE TABLE LOCATION clause")

  /** Write `df` as an EXTERNAL bucketed (+ per-bucket sorted) parquet
    * table at `path`, registered as `name` in the session catalog, and
    * persist the bucket spec beside the data. Overwrites both table
    * and files. Sorting by the bucket keys makes the bucket files
    * merge-join-ready (Spark skips the Sort too when each bucket holds
    * one file).
    */
  def write(spark: SparkSession, df: DataFrame, name: String, path: String,
      keys: Seq[String], buckets: Int): Unit = {
    require(keys.nonEmpty && buckets > 0)
    checkIdent("table name", name)
    keys.foreach(checkIdent("bucket key", _))
    checkPath(path)
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(name)
    // json4s round-trip (same idiom as Catalog) — hand-rolled string
    // parsing would misread names/keys containing JSON metacharacters
    val spec = {
      import org.json4s.JsonDSL._
      import org.json4s.jackson.JsonMethods
      JsonMethods.compact(JsonMethods.render(
        ("name" -> name) ~ ("keys" -> keys) ~ ("buckets" -> buckets)))
    }
    val specPath = new org.apache.hadoop.fs.Path(path, SpecFile)
    val fs = specPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    AtomicFile.write(fs, specPath,
      spec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Re-register a bucketed table written by [[write]] in THIS (or any
    * fresh) session from its on-disk spec — metadata-only, no data
    * movement. Returns the table name. Schema comes from the parquet
    * footers; bucket spec from `_bucket_spec.json`.
    */
  def restore(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path, SpecFile)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p))
      throw new IllegalStateException(s"no $SpecFile under $path")
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    implicit val fmts: Formats = DefaultFormats
    val j = {
      val in = fs.open(p)
      try JsonMethods.parse(new String(
        org.apache.commons.io.IOUtils.toByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8))
      finally in.close()
    }
    val name = (j \ "name").extract[String]
    val buckets = (j \ "buckets").extract[Int]
    val keys = (j \ "keys").extract[Seq[String]]
    checkIdent("table name", name)
    keys.foreach(checkIdent("bucket key", _))
    checkPath(path)
    val schema = spark.read.parquet(path).schema.toDDL
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    spark.sql(
      s"""CREATE TABLE `$name` ($schema) USING parquet
         | CLUSTERED BY (${keys.map(k => s"`$k`").mkString(", ")})
         | SORTED BY (${keys.map(k => s"`$k`").mkString(", ")})
         | INTO $buckets BUCKETS
         | LOCATION '$path'""".stripMargin)
    name
  }

}
