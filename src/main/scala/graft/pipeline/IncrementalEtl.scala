package graft.pipeline

import graft.loaders.{Loaders, SourceMode, SourceSpec}
import graft.ops.{IncrementalReader, TableOps}
import graft.tables.{CheckpointStore, KeyedTable}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The flagship pipeline — reference entry point 1
  * (incremental_etl_orders.py `main()`, :454-496): FULL-load customers +
  * INC-load orders, join, project, upsert the result into the gold
  * table, then (and only then) advance the orders checkpoint.
  *
  * The join SQL is the reference's verbatim query shape
  * (:467-478): inner equi-join on customer_id with aliased projection
  * (`c.name AS customer_name`, `o.name AS order_name`). Physically,
  * customers is the small build side — Catalyst broadcast-hash-joins it
  * without a hint at demo scale; at 100 TB-of-orders scale the join
  * stays a broadcast as long as the customer dimension fits
  * `spark.sql.autoBroadcastJoinThreshold`, otherwise AQE picks
  * sort-merge with the orders side already hash-partitioned by the
  * join key from the incremental scan's shuffle — either way the fact
  * table is never collected or re-read twice.
  */
object IncrementalEtl {

  val goldJoinSql: String =
    """SELECT
      |  c.customer_id,
      |  c.name  AS customer_name,
      |  c.email,
      |  o.order_id,
      |  o.name  AS order_name,
      |  o.order_value
      |FROM customers c
      |INNER JOIN orders o ON c.customer_id = o.customer_id
      |""".stripMargin

  def goldTable(base: String): KeyedTable =
    KeyedTable("gold_orders_with_customers",
      s"$base/gold/table_name=gold_orders_with_customers",
      Seq("order_id"), "order_id") // key & precombine both order_id (:489-490)

  /** One pipeline run. Returns the gold increment written (empty frame ⇒
    * nothing new, checkpoint untouched — I5).
    */
  def run(spark: SparkSession, base: String): DataFrame = {
    val store = CheckpointStore(s"$base/checkpoints", spark)
    val specs = Seq(
      SourceSpec(SeedTables.customersTable(base), "customers",
        SourceMode.FULL),
      SourceSpec(SeedTables.ordersTable(base), "orders", SourceMode.INC))
    val increments = Loaders.load(spark, specs, store)
    val gold = spark.sql(goldJoinSql)
    if (!gold.isEmpty) {
      TableOps.upsert(spark, goldTable(base), gold)
      // At-least-once: checkpoints advance only after the sink write
      // lands (incremental_etl_orders.py:253-264).
      val reader = new IncrementalReader(store)
      increments.flatMap(_.advanceTo).foreach(reader.commit)
    }
    gold
  }
}
