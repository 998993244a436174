package graft.queries

import graft.ops.Upsert
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** The reference-surface operator queries (SURVEY.md §2), one named entry
  * per operator, each over the driver corpus at `{sfDir}/{table}.parquet`
  * (TESTDATA.md) with a DuckDB oracle in [[CoreQueries.oracleSql]].
  *
  * Float discipline for oracle parity: any SUM over non-integral doubles
  * goes through DECIMAL(18,2) casts (exact arithmetic in both engines,
  * order-independent) and is cast back to DOUBLE at the end — both
  * engines then produce the identical nearest-double. Plain double sums
  * are only used where values are integral (exact in double regardless
  * of order).
  */
object CoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** The events table's on-disk timestamp layout has shipped in two
    * generations: TIMESTAMP(NANOS) (which Spark 4 rejects by default —
    * read as int64 nanos and rebuild a µs timestamp, flooring) and
    * plain timestamp[us] (surfacing as TIMESTAMP_NTZ — normalized to
    * the session-zone TIMESTAMP the downstream window/session queries
    * expect; the session runs UTC, so the wall-clock values are
    * identical). Dispatch on the RESOLVED type, not the generation.
    */
  def events(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val raw = eventsRaw(s, dir)
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts",
        col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** The events scan BEFORE the µs rebuild (ts = raw int64 nanos on
    * nanos-generation files, native timestamp otherwise) — the layer to
    * apply range predicates at, so they reach the parquet scan (a
    * filter on a computed timestamp pushes nothing). The legacy conf is
    * scoped to schema resolution and restored; it is inert on µs files.
    */
  private def eventsRaw(s: SparkSession, dir: String): DataFrame = {
    val key  = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "true")
    try s.read.parquet(s"$dir/events.parquet")
    finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** Exact, order-independent monetary sum: SUM(CAST(x AS DEC(18,2))) cast
    * back to double.
    */
  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  // ———————————————————————————————————————— P: projections / filters

  /** P1 — SELECT * passthrough (incremental_etl_orders.py:225). */
  def p1SelectStar(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "nation").orderBy("n_nationkey")

  /** P2 — column projection + aliasing (incremental_etl_orders.py:467-478). */
  def p2ProjectionAlias(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice").as("order_value"),
        col("o_orderpriority").as("priority"))
      .orderBy("o_orderkey")

  /** P4 — emptiness guard as a row (create_hudi_tables.py:213 / df.isEmpty). */
  def p4NonEmptyGuard(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg((count(lit(1)) > 0).as("non_empty"))

  /** Filter pushdown: predicate + projection must reach the parquet scan
    * (PushedFilters in .explain — SURVEY.md §4 "built-in" row).
    */
  def pFilterPushdown(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_quantity") >= 45 && col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
      .orderBy("l_orderkey", "l_linenumber")

  // ———————————————————————————————————————— J: joins

  /** J1 — the flagship inner equi-join with aliased projection
    * (incremental_etl_orders.py:467-482), on the corpus star schema.
    * customer is the small side — Catalyst broadcasts it unhinted; the
    * explicit broadcast() pins the plan so a stats misestimate at 100 TB
    * can't flip it to a sort-merge.
    */
  def j1CustomersOrdersJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    o.join(broadcast(c), c("c_custkey") === o("o_custkey"), "inner")
      .select(c("c_custkey").as("customer_id"),
        c("c_name").as("customer_name"),
        c("c_mktsegment").as("segment"),
        o("o_orderkey").as("order_id"),
        o("o_orderpriority").as("order_priority"),
        o("o_totalprice").as("order_value"))
      .orderBy("order_id")
  }

  /** Left outer join + per-key aggregate (SURVEY.md §2c: left/semi/anti
    * come nearly free and the engine exposes them).
    */
  def jLeftJoinAgg(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(c("c_custkey").as("customer_id"))
      .agg(count(o("o_orderkey")).as("n_orders"),
        dsum(o("o_totalprice")).as("total_value"))
      .orderBy("customer_id")
  }

  /** Left-semi join — EXISTS. */
  def jSemiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_semi")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Left-anti join — NOT EXISTS (the upsert's untouched-rows shape,
    * [[graft.ops.Upsert.untouched]]).
    */
  def jAntiJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    c.join(o, Seq("c_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Full outer join: customers with no orders AND orphan order keys
    * both surface (nation as the small side keeps the result compact);
    * aggregated per side so null-side semantics are value-checked.
    */
  def jFullOuterJoin(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_name"))
    val o = t(s, dir, "orders")
      .groupBy(col("o_custkey").as("k"))
      .agg(count(lit(1)).as("n_orders"))
    c.join(o, Seq("k"), "full_outer")
      .select(col("k"), col("c_name"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        col("c_name").isNull.as("orphan_order"),
        col("n_orders").isNull.as("customer_without_orders"))
      .orderBy("k")
  }

  // ———————————————————————————————————————— A/O: aggregates, sort, limit

  /** A1+O1+O2 — the reference's commit-times query shape: DISTINCT,
    * ORDER BY asc, LIMIT 50 (incremental_etl_orders.py:209-211).
    */
  def a1DistinctSortLimit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderdate").as("commit_time")).distinct()
      .orderBy(col("commit_time").asc)
      .limit(50)

  /** A2 — COUNT total. */
  def a2Count(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** A3 — MAX (last-commit discovery done as an aggregate, not
    * collect()[-1] — SURVEY.md §4 anti-patterns).
    */
  def a3Max(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders").agg(max(col("o_orderdate")).as("last_commit"),
      min(col("o_orderdate")).as("first_commit"))

  /** Grouped aggregation (TPC-H Q1 shape) — the substrate A1–A3 reduce
    * to (SURVEY.md §2d). Partial (map-side) aggregation keeps shuffle
    * volume at O(groups), and every sum is decimal-exact.
    */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** ROLLUP — hierarchical subtotals (grouping-sets family; the
    * engine's groupBy substrate generalized, SURVEY.md §2d note).
    * Note the `grouping()` columns: rollup null markers must be
    * distinguishable from real nulls, and they also give the oracle a
    * deterministic sort (Spark and DuckDB disagree on default null
    * ordering).
    */
  def aRollup(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).as("g_rf"),
        grouping(col("l_linestatus")).as("g_ls"))
      .orderBy(col("g_rf"), col("g_ls"), col("l_returnflag"),
        col("l_linestatus"))

  /** PIVOT — wide aggregation (one column per l_linestatus value). */
  def aPivot(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(sum(col("l_quantity")))
      .withColumnRenamed("F", "qty_f")
      .withColumnRenamed("O", "qty_o")
      .orderBy("l_returnflag")

  /** Array/collection aggregation surface: collect_set → sorted →
    * joined string (the deterministic, oracle-portable form of a list
    * aggregate).
    */
  def aCollectAgg(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"), pmod(col("user_id"), lit(7)).as("u"))
      .groupBy("event_type")
      .agg(array_join(array_sort(collect_set(col("u").cast(StringType))), ",")
        .as("users"),
        countDistinct(col("u")).as("n_users"))
      .orderBy("event_type")

  /** Top-k after sort (O2's limit + ordering, on a revenue ranking).
    * Physically TakeOrderedAndProject — no global sort materialized.
    */
  def oTopkRevenue(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_orderkey").as("order_id"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("order_id").asc)
      .limit(10)
  }

  /** Multi-way join + aggregate (TPC-H Q5 shape) — the scale headline:
    * small dims broadcast, the lineitem↔orders join is the only real
    * shuffle, partial aggregation before the final group.
    */
  def q5MultiJoin(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem")
    val o = t(s, dir, "orders")
    val c = t(s, dir, "customer")
    val su = t(s, dir, "supplier")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(su), l("l_suppkey") === su("s_suppkey"))
      .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name").as("nation"), r("r_name").as("region"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("nation", "region")
  }

  // ———————————————————————————————————————— W: window functions

  /** Window ranking — top-2 orders per customer (SURVEY.md §2e: the
    * precombine rule's ranking shape exposed as API).
    */
  def wWindowRank(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
      .select(col("o_custkey").as("customer_id"),
        col("o_orderkey").as("order_id"), col("rn"))
      .orderBy("customer_id", "rn")
  }

  /** Running-total window (cumulative frame): per-customer cumulative
    * order value in order-key order plus lag-based delta — the
    * lag/lead + running-aggregate window family.
    */
  def wRunningTotal(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col("customer_id")).orderBy(col("order_id"))
    val cum = byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "orders")
      .select(col("o_custkey").as("customer_id"),
        col("o_orderkey").as("order_id"),
        col("o_totalprice").cast("decimal(18,2)").as("v"))
      .select(col("customer_id"), col("order_id"),
        sum(col("v")).over(cum).cast("double").as("running_value"),
        (col("v") - lag(col("v"), 1).over(byKey)).cast("double").as("delta_prev"))
      .orderBy("customer_id", "order_id")
  }

  // ———————————————————————————————————————— SET ops

  def setIntersect(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey").as("key"))
      .intersect(t(s, dir, "orders").select(col("o_custkey").as("key")))
      .orderBy("key")

  def setExcept(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_custkey").as("key"))
      .except(t(s, dir, "orders").select(col("o_custkey").as("key")))
      .orderBy("key")

  def setUnion(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("key"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("key")))
      .distinct()
      .orderBy("key")

  // ———————————————————————————————————————— F: scalar functions

  /** F2 — the declared datetime surface (create_hudi_tables.py:6 imports
    * col/when/to_date/to_timestamp — SURVEY.md §2h F2).
    */
  def f2Datetime(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        to_date(col("o_orderdate")).as("order_day"),
        when(col("o_orderpriority") === "1-URGENT", lit("URGENT"))
          .otherwise(lit("NORMAL")).as("urgency"))
      .orderBy("o_orderkey")

  /** F6 — JSON decode of the events `props` column
    * (checkpoint JSON analog, incremental_etl_orders.py:195,241).
    */
  def f6Json(s: SparkSession, dir: String): DataFrame =
    events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast(IntegerType).as("k"))
      .groupBy("event_type")
      .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("n"))
      .orderBy("event_type")

  // ———————————————————————————————————————— S: sources & upsert/incremental

  /** S2 — incremental read as a pushed-down commit-range predicate
    * (incremental_etl_orders.py:217-227), expressed on the events table
    * with a fixed checkpoint literal.
    *
    * The range predicate is applied to the RAW int64 nanos column
    * BEFORE the µs-timestamp rebuild: a filter on the computed column
    * cannot reach the scan, while the equivalent raw condition
    * (`ts_µs > T  ⟺  nanos ≥ (T+1)·1000` under floor-truncation) shows
    * up in `PushedFilters` and lets row-group stats skip untouched
    * files — the point of an incremental read at 100 TB.
    */
  def s2IncrementalRead(s: SparkSession, dir: String): DataFrame = {
    // Cutoff derived explicitly in UTC: the session and the oracle both
    // run UTC, and `Timestamp.valueOf` would parse in the JVM default
    // zone — correct on this container, silently shifted on any non-UTC
    // JVM.
    val cutoff = java.time.LocalDateTime.of(2024, 1, 25, 0, 0)
    val cutoffMicros =
      cutoff.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L
    val raw = eventsRaw(s, dir)
    // the pushed predicate must speak the scan's native type: int64
    // nanos on nanos-generation files, an NTZ/timestamp literal
    // otherwise (a LocalDateTime literal resolves to TIMESTAMP_NTZ and
    // coerces to TIMESTAMP when the column is session-zoned)
    val pred = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        col("ts") >= lit((cutoffMicros + 1L) * 1000L)
      case _ => col("ts") > lit(cutoff)
    }
    raw.filter(pred)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy("event_id")
  }

  /** S3/J2 — the upsert merge verified against SQL: existing = line
    * numbers ≤ 2, incoming = ≥ 3; merged = greatest precombine
    * (l_linenumber) per key (l_orderkey). The oracle is the equivalent
    * max-per-key join.
    */
  def s3UpsertMerge(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val existing = li.filter(col("l_linenumber") <= 2)
    val incoming = li.filter(col("l_linenumber") >= 3)
    Upsert.merge(existing, incoming, Seq("l_orderkey"),
      Seq("l_linenumber", "l_partkey", "l_quantity"))
      .orderBy("l_orderkey")
  }

  /** P5 — the arbitrary-SQL transformer hook
    * (create_hudi_tables.py:214-216): register view `temp`, apply user
    * SQL.
    */
  def sqlTransform(s: SparkSession, df: DataFrame, sql: String): DataFrame = {
    df.createOrReplaceTempView("temp")
    s.sql(sql)
  }

  def p5SqlTransformer(s: SparkSession, dir: String): DataFrame =
    sqlTransform(s, t(s, dir, "orders"),
      """SELECT o_orderpriority AS priority, count(*) AS n
        |FROM temp GROUP BY o_orderpriority ORDER BY priority""".stripMargin)
}
