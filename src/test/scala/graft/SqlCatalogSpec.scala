package graft

import graft.ops.TableOps
import graft.tables.{Catalog, CommitLog, KeyedTable}
import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._

/** SQL-catalog surface ([[graft.sql.GraftCatalog]] +
  * [[graft.sql.GraftSparkExtensions]]): an external SQL user reaches
  * graft tables as `catalog.ns.table` with no Scala API call — the
  * reference's declared-but-disabled hive-sync surface
  * (create_hudi_tables.py:130-138) expressed as a Spark CatalogPlugin.
  * Pins: resolution through `spark.sql`/`spark.table`, parquet filter
  * pushdown THROUGH the substituted snapshot plan, `VERSION AS OF`
  * time travel, MOR/rename-era reads, namespace + DDL surface.
  */
class SqlCatalogSpec extends SparkSuite {
  import spark.implicits._

  /** Register a uniquely-named DSv2 catalog for `root` (CatalogManager
    * caches instances per name, so each root gets its own name).
    */
  private def mountCatalog(root: String): String = {
    val name = s"gcat${SqlCatalogSpec.next()}"
    spark.conf.set(s"spark.sql.catalog.$name",
      classOf[graft.sql.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$name.root", root)
    name
  }

  private def seed(base: String): (Catalog, KeyedTable) = {
    val cat = Catalog(s"$base/cat/db", spark)
    val t = KeyedTable("ords", s"$base/ords", Seq("id"), "ver")
    TableOps.upsert(spark, t,
      Seq(("a", 1, 10.0), ("b", 1, 20.0), ("c", 1, 30.0))
        .toDF("id", "ver", "amount"))
    cat.register(t)
    (cat, t)
  }

  test("SELECT through the catalog: resolution, values, spark.table") {
    val base = tmpDir("graft-sqlcat")
    val (_, t) = seed(base)
    val c = mountCatalog(s"$base/cat")
    val got = spark.sql(
      s"SELECT id, amount FROM $c.db.ords WHERE amount > 15.0 ORDER BY id")
    assert(got.as[(String, Double)].collect().toSeq
      === Seq(("b", 20.0), ("c", 30.0)))
    // spark.table and aggregate shapes resolve identically
    assert(spark.table(s"$c.db.ords").count() === 3)
    assert(spark.sql(s"SELECT sum(amount) s FROM $c.db.ords")
      .head.getDouble(0) === 60.0)
    // SQL sees post-commit state on the next query (no stale caching)
    TableOps.upsert(spark, t, Seq(("d", 1, 40.0)).toDF("id", "ver", "amount"))
    assert(spark.table(s"$c.db.ords").count() === 4)
  }

  test("filters cross the substituted plan down to the parquet scan") {
    val base = tmpDir("graft-sqlcat")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    val df = spark.sql(s"SELECT id FROM $c.db.ords WHERE amount > 15.0")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
        plan.contains("GreaterThan(amount,15.0)"),
      s"catalog read did not push the filter to parquet:\n$plan")
    // column pruning reaches ReadSchema too: amount+id only, no ver
    assert(plan.linesIterator.filter(_.contains("ReadSchema"))
      .forall(!_.contains("ver:")), s"ReadSchema not pruned:\n$plan")
  }

  test("VERSION AS OF maps to snapshotAsOf (time travel via SQL)") {
    val base = tmpDir("graft-sqlcat")
    val (_, t) = seed(base)
    val v1 = CommitLog(t, spark).latestCommit().get
    TableOps.upsert(spark, t, Seq(("a", 2, 99.0)).toDF("id", "ver", "amount"))
    val c = mountCatalog(s"$base/cat")
    assert(spark.sql(
      s"SELECT amount FROM $c.db.ords VERSION AS OF '$v1' WHERE id='a'")
      .head.getDouble(0) === 10.0)
    assert(spark.sql(s"SELECT amount FROM $c.db.ords WHERE id='a'")
      .head.getDouble(0) === 99.0)
  }

  test("MOR live deltas and rename eras read correctly through SQL") {
    val base = tmpDir("graft-sqlcat")
    val (cat, t) = seed(base)
    TableOps.renameColumn(spark, t, "amount", "total")
    TableOps.deltaCommit(spark, t,
      Seq(("a", 2, 11.0)).toDF("id", "ver", "total"))
    val c = mountCatalog(s"$base/cat")
    // pre-rename files + live delta, all through one SQL statement
    val got = spark.sql(
      s"SELECT id, total FROM $c.db.ords ORDER BY id")
    assert(got.as[(String, Double)].collect().toSeq
      === Seq(("a", 11.0), ("b", 20.0), ("c", 30.0)))
  }

  test("two-part names hit the catalog root; DDL surface behaves") {
    val base = tmpDir("graft-sqlcat")
    val rootCat = Catalog(s"$base/cat", spark)
    val t = KeyedTable("flat", s"$base/flat", Seq("id"), "ver")
    TableOps.upsert(spark, t, Seq(("x", 1)).toDF("id", "ver"))
    rootCat.register(t)
    seed(base) // also populate db namespace
    val c = mountCatalog(s"$base/cat")
    assert(spark.sql(s"SELECT id FROM $c.flat").head.getString(0) === "x")
    assert(spark.sql(s"SHOW TABLES IN $c.db").collect()
      .map(_.getString(1)).toSeq === Seq("ords"))
    assert(spark.sql(s"SHOW NAMESPACES IN $c").collect()
      .map(_.getString(0)).toSeq.contains("db"))
    // DROP TABLE unregisters without touching data
    spark.sql(s"DROP TABLE $c.flat")
    assert(intercept[AnalysisException] {
      spark.sql(s"SELECT * FROM $c.flat").collect()
    }.getMessage.toLowerCase.contains("table or view"))
    assert(spark.read.parquet(t.dataPath + "/*").count() === 1)
    // CREATE TABLE without the required key property fails actionably
    val ex = intercept[Exception] {
      spark.sql(s"CREATE TABLE $c.db.newt (id STRING) USING graft")
    }
    assert(ex.getMessage.contains("recordKey"))
  }

  // ——————————————————————————————————————————— SQL write surface

  test("INSERT INTO is a keyed upsert; read-your-writes via SQL") {
    val base = tmpDir("graft-sqlw")
    val (_, t) = seed(base)
    val c = mountCatalog(s"$base/cat")
    // by-name insert from a SELECT: new key d, updated key a (ver 2)
    spark.sql(
      s"""INSERT INTO $c.db.ords
         | SELECT id, ver, amount FROM VALUES
         |  ('d', 1, 40.0), ('a', 2, 99.0) AS v(id, ver, amount)"""
        .stripMargin)
    val got = spark.sql(
      s"SELECT id, ver, amount FROM $c.db.ords ORDER BY id")
    assert(got.as[(String, Int, Double)].collect().toSeq ===
      Seq(("a", 2, 99.0), ("b", 1, 20.0), ("c", 1, 30.0), ("d", 1, 40.0)))
    // positional VALUES insert (no column names)
    spark.sql(s"INSERT INTO $c.db.ords VALUES ('e', 1, 50.0)")
    assert(spark.table(s"$c.db.ords").count() === 5)
    // Scala API sees the same state: one engine underneath
    assert(TableOps.snapshot(spark, t).count() === 5)
  }

  test("INSERT refuses frames that align neither by name nor position") {
    val base = tmpDir("graft-sqlw")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    val ex = intercept[Exception] {
      spark.sql(s"INSERT INTO $c.db.ords VALUES ('x', 1)")
    }
    assert(ex.getMessage.contains("positional mapping"))
    // arity match with PARTIAL name overlap = a reordered/typo'd
    // SELECT — refused, never silently cross-assigned (review face)
    val ex2 = intercept[Exception] {
      spark.sql(s"INSERT INTO $c.db.ords " +
        s"SELECT id, ver, 9.9 AS total FROM $c.db.ords LIMIT 1")
    }
    assert(ex2.getMessage.contains("partial overlap") ||
      ex2.getMessage.contains("positional mapping"))
  }

  test("INSERT with an extra column evolves the schema additively on write") {
    val base = tmpDir("graft-sqlw")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    spark.sql(
      s"""INSERT INTO $c.db.ords
         | SELECT 'd' AS id, 1 AS ver, 40.0 AS amount,
         |   'fresh' AS note""".stripMargin)
    val got = spark.sql(
      s"SELECT id, amount, note FROM $c.db.ords ORDER BY id")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        Option(r.getString(2))))
    assert(got.toSeq === Seq(("a", 10.0, None), ("b", 20.0, None),
      ("c", 30.0, None), ("d", 40.0, Some("fresh"))))
  }

  test("INSERT OVERWRITE replaces the whole table in one commit") {
    val base = tmpDir("graft-sqlw")
    val (_, t) = seed(base)
    val before = CommitLog(t, spark).listCommits().size
    val c = mountCatalog(s"$base/cat")
    spark.sql(s"INSERT OVERWRITE $c.db.ords VALUES ('z', 1, 9.0)")
    assert(spark.sql(s"SELECT id, amount FROM $c.db.ords")
      .as[(String, Double)].collect().toSeq === Seq(("z", 9.0)))
    assert(CommitLog(t, spark).listCommits().size === before + 1)
  }

  test("MERGE INTO: update, conditional delete, insert — one statement") {
    val base = tmpDir("graft-sqlw")
    val (_, t) = seed(base)
    val c = mountCatalog(s"$base/cat")
    Seq(("a", 2, 11.0), ("b", 2, -1.0), ("d", 1, 40.0))
      .toDF("id", "ver", "amount").createOrReplaceTempView("src")
    spark.sql(
      s"""MERGE INTO $c.db.ords t USING src s ON t.id = s.id
         | WHEN MATCHED AND s.amount < 0 THEN DELETE
         | WHEN MATCHED THEN UPDATE SET amount = s.amount, ver = s.ver
         | WHEN NOT MATCHED THEN INSERT (id, ver, amount)
         |   VALUES (s.id, s.ver, s.amount)""".stripMargin)
    val got = spark.sql(
      s"SELECT id, ver, amount FROM $c.db.ords ORDER BY id")
    assert(got.as[(String, Int, Double)].collect().toSeq ===
      Seq(("a", 2, 11.0), ("c", 1, 30.0), ("d", 1, 40.0)))
    // unchanged row c kept its original commit stamp (merge touched
    // only what the clauses claimed)
    assert(TableOps.snapshot(spark, t)
      .filter($"id" === "c").select("_commit_ts").distinct().count() === 1)
  }

  test("MERGE UPDATE can reference target columns (t.col + s.col)") {
    val base = tmpDir("graft-sqlw")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    Seq(("a", 2, 5.0), ("c", 2, 7.0)).toDF("id", "ver", "delta")
      .createOrReplaceTempView("src")
    spark.sql(
      s"""MERGE INTO $c.db.ords t USING src s ON t.id = s.id
         | WHEN MATCHED THEN UPDATE
         |   SET amount = t.amount + s.delta, ver = s.ver"""
        .stripMargin)
    assert(spark.sql(s"SELECT id, amount FROM $c.db.ords ORDER BY id")
      .as[(String, Double)].collect().toSeq ===
      Seq(("a", 15.0), ("b", 20.0), ("c", 37.0)))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE deletes the unmentioned rows") {
    val base = tmpDir("graft-sqlw")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    Seq(("a", 2, 99.0)).toDF("id", "ver", "amount")
      .createOrReplaceTempView("src")
    spark.sql(
      s"""MERGE INTO $c.db.ords t USING src s ON t.id = s.id
         | WHEN MATCHED THEN UPDATE SET amount = s.amount, ver = s.ver
         | WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(spark.sql(s"SELECT id, amount FROM $c.db.ords")
      .as[(String, Double)].collect().toSeq === Seq(("a", 99.0)))
  }

  test("UPDATE and DELETE via SQL map onto updateWhere/deleteWhere") {
    val base = tmpDir("graft-sqlw")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    spark.sql(
      s"UPDATE $c.db.ords SET amount = amount * 2 WHERE amount > 15.0")
    assert(spark.sql(s"SELECT id, amount FROM $c.db.ords ORDER BY id")
      .as[(String, Double)].collect().toSeq ===
      Seq(("a", 10.0), ("b", 40.0), ("c", 60.0)))
    spark.sql(s"DELETE FROM $c.db.ords WHERE id = 'b'")
    assert(spark.sql(s"SELECT id FROM $c.db.ords ORDER BY id")
      .as[String].collect().toSeq === Seq("a", "c"))
  }

  test("pure-SQL lifecycle: CREATE TABLE, INSERT, MERGE, SELECT") {
    val base = tmpDir("graft-sqlw")
    val c = mountCatalog(s"$base/cat")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $c.db")
    spark.sql(
      s"""CREATE TABLE $c.db.fresh (id STRING, ver INT, amount DOUBLE)
         | USING graft LOCATION '$base/fresh'
         | TBLPROPERTIES ('recordKey'='id', 'precombine'='ver')"""
        .stripMargin)
    // empty table reads as its declared schema
    assert(spark.table(s"$c.db.fresh").count() === 0)
    assert(spark.table(s"$c.db.fresh").columns.toSeq ===
      Seq("id", "ver", "amount"))
    spark.sql(s"INSERT INTO $c.db.fresh VALUES ('a', 1, 1.5), ('b', 1, 2.5)")
    spark.sql(
      s"""MERGE INTO $c.db.fresh t
         | USING (SELECT 'b' AS id, 2 AS ver, 9.0 AS amount) s
         | ON t.id = s.id
         | WHEN MATCHED THEN UPDATE SET amount = s.amount, ver = s.ver
         | WHEN NOT MATCHED THEN INSERT (id, ver, amount)
         |   VALUES (s.id, s.ver, s.amount)""".stripMargin)
    assert(spark.sql(s"SELECT id, amount FROM $c.db.fresh ORDER BY id")
      .as[(String, Double)].collect().toSeq ===
      Seq(("a", 1.5), ("b", 9.0)))
    // time travel still works on the SQL-created table
    val kt = KeyedTable("fresh", s"$base/fresh", Seq("id"), "ver")
    val v1 = CommitLog(kt, spark).listCommits().head
    assert(spark.sql(
      s"SELECT amount FROM $c.db.fresh VERSION AS OF '$v1' WHERE id='b'")
      .head.getDouble(0) === 2.5)
  }

  test("writes to VERSION AS OF are refused") {
    val base = tmpDir("graft-sqlw")
    val (_, t) = seed(base)
    val v1 = CommitLog(t, spark).latestCommit().get
    val c = mountCatalog(s"$base/cat")
    val ex = intercept[Exception] {
      spark.sql(
        s"INSERT INTO $c.db.ords VERSION AS OF '$v1' VALUES ('x',1,1.0)")
    }
    assert(ex.getMessage.toLowerCase.contains("time travel") ||
      ex.getMessage.toLowerCase.contains("immutable") ||
      ex.getMessage.toLowerCase.contains("syntax"))
  }

  test("ALTER TABLE RENAME/DROP COLUMN map onto the engine's schema surgery") {
    val base = tmpDir("graft-sqlalter")
    val (_, t) = seed(base)
    val c = mountCatalog(s"$base/cat")
    spark.sql(s"ALTER TABLE $c.db.ords RENAME COLUMN amount TO total")
    // the pre-rename files resolve through the rename lineage
    assert(spark.sql(s"SELECT id, total FROM $c.db.ords ORDER BY id")
      .as[(String, Double)].collect().toSeq ===
      Seq(("a", 10.0), ("b", 20.0), ("c", 30.0)))
    // writes under the NEW name merge with pre-rename state
    spark.sql(s"INSERT INTO $c.db.ords VALUES ('a', 2, 99.0)")
    assert(spark.sql(s"SELECT total FROM $c.db.ords WHERE id='a'")
      .head.getDouble(0) === 99.0)
    spark.sql(s"ALTER TABLE $c.db.ords DROP COLUMN total")
    assert(!spark.table(s"$c.db.ords").columns.contains("total"))
    assert(spark.table(s"$c.db.ords").count() === 3)
    // ADD COLUMNS points at the on-write evolution contract
    val ex = intercept[Exception] {
      spark.sql(s"ALTER TABLE $c.db.ords ADD COLUMNS (note STRING)")
    }
    assert(ex.getMessage.contains("ON WRITE"))
    assert(TableOps.snapshot(spark, t).columns.toSeq
      .contains("ver")) // surgery never touched unrelated columns
  }

  test("TIMESTAMP AS OF resolves the latest commit at or before the wall time") {
    val base = tmpDir("graft-sqlts")
    val (_, t) = seed(base)
    Thread.sleep(5)
    val betweenMicros = System.currentTimeMillis() * 1000L
    Thread.sleep(5)
    TableOps.upsert(spark, t, Seq(("a", 2, 99.0)).toDF("id", "ver", "amount"))
    val c = mountCatalog(s"$base/cat")
    val tsLit = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
      .withZone(java.time.ZoneOffset.UTC)
      .format(java.time.Instant.ofEpochMilli(betweenMicros / 1000L))
    assert(spark.conf.get("spark.sql.session.timeZone") === "UTC")
    assert(spark.sql(
      s"SELECT amount FROM $c.db.ords TIMESTAMP AS OF '$tsLit' WHERE id='a'")
      .head.getDouble(0) === 10.0)
    assert(spark.sql(s"SELECT amount FROM $c.db.ords WHERE id='a'")
      .head.getDouble(0) === 99.0)
  }

  test("CREATE TABLE AS SELECT lands the query as the first commit") {
    val base = tmpDir("graft-sqlctas")
    val c = mountCatalog(s"$base/cat")
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $c.db")
    spark.sql(
      s"""CREATE TABLE $c.db.ctas
         | USING graft LOCATION '$base/ctas'
         | TBLPROPERTIES ('recordKey'='id', 'precombine'='ver')
         | AS SELECT id, ver, CAST(amount AS DOUBLE) AS amount
         |  FROM VALUES ('a', 1, 1.5), ('b', 1, 2.5)
         |   AS v(id, ver, amount)""".stripMargin)
    assert(spark.sql(s"SELECT id, amount FROM $c.db.ctas ORDER BY id")
      .as[(String, Double)].collect().toSeq ===
      Seq(("a", 1.5), ("b", 2.5)))
  }

  test("multi-match MERGE resolves by greatest precombine (Hudi shape)") {
    val base = tmpDir("graft-mm")
    val cat = Catalog(s"$base/cat/db", spark)
    val t = KeyedTable("mm", s"$base/mm", Seq("k"), "ln")
    TableOps.upsert(spark, t,
      Seq(("k1", 1, "old", 0.5), ("k2", 2, "keep", 0.6))
        .toDF("k", "ln", "pk", "q"))
    cat.register(t)
    val c = mountCatalog(s"$base/cat")
    // three source rows match k1 — the ln=5 row must win WHOLE-ROW
    // (no per-column mixing), k2 stays untouched
    Seq(("k1", 3, "A", 1.0), ("k1", 5, "C", 3.0), ("k1", 4, "B", 2.0))
      .toDF("k", "ln", "pk", "q").createOrReplaceTempView("mm_src")
    spark.sql(
      s"""MERGE INTO $c.db.mm t USING mm_src s ON t.k = s.k
         | WHEN MATCHED THEN UPDATE SET ln = s.ln, pk = s.pk, q = s.q
         | WHEN NOT MATCHED THEN INSERT (k, ln, pk, q)
         |   VALUES (s.k, s.ln, s.pk, s.q)""".stripMargin)
    assert(spark.sql(s"SELECT k, ln, pk, q FROM $c.db.mm ORDER BY k")
      .as[(String, Int, String, Double)].collect().toSeq ===
      Seq(("k1", 5, "C", 3.0), ("k2", 2, "keep", 0.6)))
  }

  test("MERGE into a partitioned table rewrites only the touched partitions") {
    val base = tmpDir("graft-mpart")
    val cat = Catalog(s"$base/cat/db", spark)
    val t = KeyedTable("mp", s"$base/mp", Seq("k"), "ver",
      partitionBy = Seq("region"))
    TableOps.upsert(spark, t,
      Seq(("k1", 1, "eu", 1.0), ("k2", 1, "us", 2.0), ("k3", 1, "ap", 3.0))
        .toDF("k", "ver", "region", "amount"))
    cat.register(t)
    val before = TableOps.partitionDirs(spark, t)
    val c = mountCatalog(s"$base/cat")
    // the merge touches ONLY the eu partition (k1 update, k9 insert)
    Seq(("k1", 2, "eu", 9.0), ("k9", 1, "eu", 5.0))
      .toDF("k", "ver", "region", "amount")
      .createOrReplaceTempView("mp_src")
    spark.sql(
      s"""MERGE INTO $c.db.mp t USING mp_src s
         | ON t.k = s.k AND t.region = s.region
         | WHEN MATCHED THEN UPDATE SET ver = s.ver, amount = s.amount
         | WHEN NOT MATCHED THEN INSERT (k, ver, region, amount)
         |   VALUES (s.k, s.ver, s.region, s.amount)""".stripMargin)
    val after = TableOps.partitionDirs(spark, t)
    val untouched = before.filterNot(_._1.contains("eu"))
    assert(untouched.forall { case (p, d) => after.get(p).contains(d) },
      "MERGE rewrote a partition its clauses never touched")
    assert(spark.sql(s"SELECT k, amount FROM $c.db.mp ORDER BY k")
      .as[(String, Double)].collect().toSeq ===
      Seq(("k1", 9.0), ("k2", 2.0), ("k3", 3.0), ("k9", 5.0)))
  }

  test("case-insensitive table resolution (SQL default)") {
    val base = tmpDir("graft-sqlcat")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    assert(spark.sql(s"SELECT count(*) FROM $c.db.ORDS").head.getLong(0)
      === 3)
  }

  test("self-join through the catalog: substituted relations deduplicate") {
    val base = tmpDir("graft-sqlcat")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    // both references resolve through the same catalog identifier; the
    // analyzer must end with distinct attribute ids per branch even
    // though each branch substitutes the same snapshot plan
    val got = spark.sql(
      s"""SELECT a.id, a.amount, b.amount AS amount_b
         | FROM $c.db.ords a JOIN $c.db.ords b ON a.id = b.id
         | WHERE a.amount > 15.0 ORDER BY a.id""".stripMargin)
    assert(got.as[(String, Double, Double)].collect().toSeq
      === Seq(("b", 20.0, 20.0), ("c", 30.0, 30.0)))
  }

  test("incremental read via SQL: _commit_ts predicate pushes to parquet") {
    val base = tmpDir("graft-sqlcat")
    val (_, t) = seed(base)
    val v1 = CommitLog(t, spark).latestCommit().get
    TableOps.upsert(spark, t, Seq(("d", 1, 40.0)).toDF("id", "ver", "amount"))
    val c = mountCatalog(s"$base/cat")
    // the reference's SQL incremental shape (filter on the commit
    // stamp, incremental_etl_orders.py:209-215) — through the catalog,
    // with the range predicate reaching the scan
    val df = spark.sql(
      s"SELECT id FROM $c.db.ords WHERE ${"_commit_ts"} > '$v1'")
    assert(df.as[String].collect().toSeq === Seq("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(_commit_ts"),
      s"commit-stamp predicate did not reach parquet:\n$plan")
  }

  test("readStream.table reaches the commit-offset source; restart is exactly-once") {
    val base = tmpDir("graft-sqlstream")
    val (_, t) = seed(base)
    val c = mountCatalog(s"$base/cat")
    val accDir = s"$base/acc"
    def run(): Unit = {
      val q = spark.readStream.table(s"$c.db.ords")
        .writeStream.option("checkpointLocation", s"$base/chk")
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select("id", "ver", "amount").write.mode("append").parquet(accDir)
        }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // batch 1: the seed commit's change rows
    assert(spark.read.parquet(accDir).count() === 3)
    TableOps.upsert(spark, t,
      Seq(("d", 1, 40.0)).toDF("id", "ver", "amount"))
    run() // restart from the checkpoint: ONLY the new commit streams
    val acc = spark.read.parquet(accDir)
    assert(acc.count() === 4)
    assert(acc.filter($"id" === "d").count() === 1)
    // a third restart with nothing new emits nothing (no replays)
    run()
    assert(spark.read.parquet(accDir).count() === 4)
  }

  test("streaming a VERSION AS OF read is refused") {
    val base = tmpDir("graft-sqlstream")
    val (_, t) = seed(base)
    val v1 = CommitLog(t, spark).latestCommit().get
    val c = mountCatalog(s"$base/cat")
    val ex = intercept[Exception] {
      spark.readStream.table(s"$c.db.ords VERSION AS OF '$v1'")
        .writeStream.format("noop").start()
    }
    assert(ex != null)
  }

  test("unknown table and missing root fail with clear errors") {
    val base = tmpDir("graft-sqlcat")
    seed(base)
    val c = mountCatalog(s"$base/cat")
    intercept[AnalysisException] {
      spark.sql(s"SELECT * FROM $c.db.nope").collect()
    }
    val bad = s"gcatbad${SqlCatalogSpec.next()}"
    spark.conf.set(s"spark.sql.catalog.$bad",
      classOf[graft.sql.GraftCatalog].getName)
    val ex = intercept[Exception] {
      spark.sql(s"SELECT * FROM $bad.db.x").collect()
    }
    assert(ex.getMessage.contains(s"spark.sql.catalog.$bad.root"))
  }
}

object SqlCatalogSpec {
  private val counter = new java.util.concurrent.atomic.AtomicInteger(0)
  def next(): Int = counter.incrementAndGet()
}
