package graft.pipeline

import graft.ops.TableOps
import graft.tables.KeyedTable
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.sql.{Date, Timestamp}
import scala.util.Random

/** Deterministic synthetic customers/orders generator + silver seeding —
  * the reference's `create_hudi_tables.py` entry point (S5, SURVEY.md §2a:
  * Faker-driven `get_customer_data` :49-63 / `get_orders_data` :66-84,
  * volumes 50 & 100 at :87-90), with a seeded Random instead of Faker and
  * *corrected types* (the reference generated `order_value` as a string
  * of an int and dates as ISO strings — SURVEY.md §1; here they are
  * DecimalType(12,2) and DateType).
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
    */
  private def uuidOf(seed: Long, i: Int): String =
    new java.util.UUID(seed * 1000003L + i, i.toLong * 2654435761L).toString

  def customers(spark: SparkSession, n: Int, seed: Long,
      epochMillis: Long): DataFrame = {
    val rnd = new Random(seed)
    val rows = (0 until n).map { i =>
      Row(uuidOf(seed, i), s"name_${rnd.nextInt(100000)}",
        states(rnd.nextInt(states.size)), s"city_${rnd.nextInt(1000)}",
        s"user$i@example.com", new Timestamp(epochMillis + i),
        s"${rnd.nextInt(9999)} Main St")
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), customersSchema)
  }

  def orders(spark: SparkSession, n: Int, seed: Long, customerIds: Seq[String],
      epochDay: Long): DataFrame = {
    val rnd = new Random(seed)
    val rows = (0 until n).map { i =>
      Row(uuidOf(seed + 7, i), s"order text ${rnd.nextInt(1000)}",
        new java.math.BigDecimal(10 + rnd.nextInt(991)).setScale(2),
        priorities(rnd.nextInt(3)),
        Date.valueOf(java.time.LocalDate.ofEpochDay(
          epochDay - rnd.nextInt(30))), // date_between('-30d'), :77
        customerIds(rnd.nextInt(customerIds.size)))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), ordersSchema)
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
