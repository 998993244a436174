package graft.pipeline

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Deterministic synthetic customers/orders generator + silver seeding —
  * the reference's `create_hudi_tables.py` entry point (S5, SURVEY.md §2a:
  * Faker-driven `get_customer_data` :49-63 / `get_orders_data` :66-84,
  * volumes 50 & 100 at :87-90), with *corrected types* (the reference
  * generated `order_value` as a string of an int and dates as ISO
  * strings — SURVEY.md §1; here they are DecimalType(12,2) and
  * DateType).
  *
  * Two properties a Faker/`Random` generator cannot give:
  *
  *   - DISTRIBUTED: rows come from `spark.range(n)` + codegen'd column
  *     expressions — generation parallelizes across executors (a
  *     sequential driver-side RNG is a non-starter for seeding
  *     100 TB-scale fixtures).
  *   - CROSS-ENGINE RECOMPUTABLE: every value is a pure function of
  *     (field tag, seed, row index) through the md5-60-bit hash, so a
  *     DuckDB oracle regenerates the tables independently — the
  *     generator and the end-to-end pipeline summary are value-checked,
  *     not pinned (pinned literals only prove stability, VERDICT r3).
  */
object SeedTables {

  val customersSchema: StructType = StructType(Seq(
    StructField("customer_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("state", StringType),
    StructField("city", StringType),
    StructField("email", StringType),
    StructField("created_at", TimestampType),
    StructField("address", StringType)))

  val ordersSchema: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("order_value", DecimalType(12, 2)),
    StructField("priority", StringType),
    StructField("order_date", DateType),
    StructField("customer_id", StringType, nullable = false)))

  private val states =
    Vector("CA", "NY", "TX", "WA", "FL", "IL", "MA", "OR", "CO", "GA")
  private val priorities = Vector("LOW", "MEDIUM", "HIGH") // :76

  /** Deterministic uuid-shaped key from (seed, i) — replaces
    * `uuid.uuid4()` (create_hudi_tables.py:53,70) so runs are replayable.
    * [[uuidCol]] is the declarative twin (equality asserted in
    * PipelineSpec).
    */
  private[graft] def uuidOf(seed: Long, i: Int): String =
    new java.util.UUID(seed * 1000003L + i, i.toLong * 2654435761L).toString

  private def hexPad(c: Column): Column = lpad(lower(hex(c)), 16, "0")

  /** `java.util.UUID(hi, lo).toString`, declaratively (8-4-4-4-12 hex
    * groups of the 128 bits) — and replicable in DuckDB SQL.
    */
  private def uuidCol(hi: Column, lo: Column): Column = {
    val h = hexPad(hi)
    val l = hexPad(lo)
    concat_ws("-", substring(h, 1, 8), substring(h, 9, 4),
      substring(h, 13, 4), substring(l, 1, 4), substring(l, 5, 12))
  }

  /** The md5-60-bit field hash: a pure function of (tag, seed, row id),
    * identical on both engines — see [[graft.functions.PortableHash]].
    */
  private def h60(tag: String, seed: Long, i: Column): Column =
    graft.functions.PortableHash.h60(tag, seed, i)

  def customers(spark: SparkSession, n: Int, seed: Long,
      epochMillis: Long): DataFrame = {
    val i = col("id")
    spark.range(n).select(
      uuidCol(lit(seed * 1000003L) + i, i * 2654435761L).as("customer_id"),
      concat(lit("name_"),
        pmod(h60("name", seed, i), lit(100000L)).cast("string")).as("name"),
      element_at(array(states.map(lit): _*),
        (pmod(h60("state", seed, i), lit(states.size.toLong)) + 1)
          .cast(IntegerType)).as("state"),
      concat(lit("city_"),
        pmod(h60("city", seed, i), lit(1000L)).cast("string")).as("city"),
      concat(lit("user"), i.cast("string"), lit("@example.com")).as("email"),
      timestamp_millis(lit(epochMillis) + i).as("created_at"),
      concat(pmod(h60("addr", seed, i), lit(9999L)).cast("string"),
        lit(" Main St")).as("address"))
  }

  def orders(spark: SparkSession, n: Int, seed: Long, customerIds: Seq[String],
      epochDay: Long): DataFrame = {
    val i = col("id")
    val ids = array(customerIds.map(lit): _*)
    spark.range(n).select(
      uuidCol(lit((seed + 7) * 1000003L) + i, i * 2654435761L).as("order_id"),
      concat(lit("order text "),
        pmod(h60("otext", seed, i), lit(1000L)).cast("string")).as("name"),
      (lit(10L) + pmod(h60("oval", seed, i), lit(991L)))
        .cast(DecimalType(12, 2)).as("order_value"),
      element_at(array(priorities.map(lit): _*),
        (pmod(h60("oprio", seed, i), lit(3L)) + 1)
          .cast(IntegerType)).as("priority"),
      // date_between('-30d'), :77
      date_from_unix_date((lit(epochDay) -
        pmod(h60("odate", seed, i), lit(30L))).cast(IntegerType))
        .as("order_date"),
      element_at(ids,
        (pmod(h60("ocust", seed, i), lit(customerIds.size.toLong)) + 1)
          .cast(IntegerType)).as("customer_id"))
  }

  /** Silver-layer table descriptors under `base` — medallion layout
    * convention (SURVEY.md §1: `silver/table_name={t}`,
    * create_hudi_tables.py:255,276). Customers partitioned by state with
    * a global key index; orders unpartitioned — exactly the reference's
    * two upsert calls (:238-278).
    */
  def customersTable(base: String): KeyedTable =
    KeyedTable("customers", s"$base/silver/table_name=customers",
      Seq("customer_id"), "created_at", Seq("state"))

  def ordersTable(base: String): KeyedTable =
    KeyedTable("orders", s"$base/silver/table_name=orders",
      Seq("order_id"), "order_date")

  /** Entry point 2 re-expressed: generate + upsert both silver tables.
    * Returns (customers commit, orders commit).
    */
  def seed(spark: SparkSession, base: String, nCustomers: Int = 50,
      nOrders: Int = 100, seed: Long = 42L,
      epochMillis: Long = 1704067200000L): (String, String) = {
    val cust = customers(spark, nCustomers, seed, epochMillis)
    val custIds = (0 until nCustomers).map(i => uuidOf(seed, i))
    val ords = orders(spark, nOrders, seed, custIds,
      epochMillis / 86400000L)
    val cTs = TableOps.upsert(spark, customersTable(base), cust)
    val oTs = TableOps.upsert(spark, ordersTable(base), ords)
    (cTs, oTs)
  }
}
