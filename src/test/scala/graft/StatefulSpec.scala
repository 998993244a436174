package graft

import graft.queries.CoreQueries
import graft.pipeline.{IncrementalEtl, Pipeline}
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.UserEvent
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** mapGroupsWithState custom state + the Pipeline runner. */
class StatefulSpec extends SparkSuite {
  import spark.implicits._

  test("mapGroupsWithState running totals converge to batch aggregates") {
    val events = CoreQueries.events(spark, sfDir)
      .select($"user_id", $"ts", $"value").as[UserEvent]
    val srcDir = tmpDir("graft-stateful")
    events.write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val stream = spark.readStream.schema(schema).parquet(srcDir)
      .as[UserEvent]
    val q = StatefulSessions.runningTotals(spark, stream)
      .writeStream.format("memory").queryName("totals")
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // update mode: keep the LAST snapshot per user
    val streamed = spark.table("totals")
      .groupBy($"user_id")
      .agg(max(struct($"n", $"sum")).as("s"))
      .select($"user_id", $"s.n".as("n"))
      .as[(Long, Long)].collect().toMap
    val batch = events.groupByKey(_.user_id).count().collect().toMap
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch interval join") {
    val events = CoreQueries.events(spark, sfDir)
      .select($"user_id", $"event_id", $"ts", $"event_type")
    val srcDir = tmpDir("graft-ssjoin")
    events.write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    def side(tpe: String, idAs: String, tsAs: String) =
      spark.readStream.schema(schema).parquet(srcDir)
        .filter($"event_type" === tpe)
        .select($"user_id", $"event_id".as(idAs), $"ts".as(tsAs))
    val joined = graft.streaming.StreamingEtl.intervalJoin(
      side("purchase", "p_id", "p_ts"),
      side("view", "v_id", "v_ts"),
      Seq("user_id"), "p_ts", "v_ts", within = "30 minutes")
      .select($"l.user_id", $"p_id", $"v_id")
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val streamed = spark.table("ssjoin")
      .as[(Long, Long, Long)].collect().toSet
    val p = events.filter($"event_type" === "purchase")
      .select($"user_id", $"event_id".as("p_id"), $"ts".as("p_ts"))
    val v = events.filter($"event_type" === "view")
      .select($"user_id".as("v_user"), $"event_id".as("v_id"),
        $"ts".as("v_ts"))
    val batch = p.join(v, $"user_id" === $"v_user" &&
        $"v_ts" <= $"p_ts" &&
        $"v_ts" >= $"p_ts" - expr("INTERVAL 30 minutes"))
      .select($"user_id", $"p_id", $"v_id")
      .as[(Long, Long, Long)].collect().toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("bronze smoke job: static typed rows land in the medallion bronze path") {
    val base = tmpDir("graft-bronze")
    val t = Pipeline.bronzeSmoke(spark, base)
    assert(t.path.contains("bronze/database=demo/table_name=employees"))
    val snap = graft.ops.TableOps.snapshot(spark, t)
    assert(snap.count() === 2)
    assert(snap.schema("salary").dataType.typeName === "long")
    // re-running the smoke upserts idempotently (same keys, same ts)
    Pipeline.bronzeSmoke(spark, base)
    assert(graft.ops.TableOps.snapshot(spark, t).count() === 2)
  }

  test("pipeline runner executes the reference flow in order, fail-fast") {
    val base = tmpDir("graft-dag")
    val done = Pipeline.run(spark, Pipeline.referenceFlow(base))
    assert(done === Seq("create_tables", "incremental_etl"))
    assert(graft.ops.TableOps.snapshot(spark,
      IncrementalEtl.goldTable(base)).count() === 100)
    val boom = intercept[RuntimeException] {
      Pipeline.run(spark, Seq(
        graft.pipeline.Job("ok", _ => ()),
        graft.pipeline.Job("bad", _ => throw new RuntimeException("x")),
        graft.pipeline.Job("never", _ => fail("must not run"))))
    }
    assert(boom.getMessage === "x")
  }
}
