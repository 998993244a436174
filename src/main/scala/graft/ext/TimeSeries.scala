package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series operators over an event stream: trailing time-RANGE
  * rolling aggregates and fixed-step gap-fill with last-observation-
  * carried-forward — the feature-generation primitives row-frame
  * windows cannot express (a ROWS frame counts events, not time; a
  * sparse stream has no row at the instants you need filled).
  *
  * Determinism: the rolling frame is a RANGE over integer epoch
  * micros — ties on the order key share a frame by range semantics,
  * so output is well-defined even with duplicate timestamps; sums
  * fold through DECIMAL(25,6) (exact, order-independent — the
  * events_tumbling posture) and return as one double cast. Gap-fill
  * slots are integer floor arithmetic on epoch micros; the
  * within-slot representative is picked by an explicit (ts, value)
  * descending rank, never an engine-specific arg_max tie rule.
  *
  * Scale: rolling shuffles ONCE on the key column — a single
  * per-key-sorted pass (Spark's sliding-range accumulation).
  * Gap-fill materializes its projection once (localCheckpoint), then
  * runs the per-slot rank on (key, slot), the spine aggregate on the
  * key, and the LOCF window on the key again; the spine explode is
  * linear in OUTPUT slots (span/step per key — the caller's step
  * bounds it). Hot-key skew is the caller's usual salting decision;
  * per-key state is O(1).
  */
object TimeSeries {

  /** Trailing time-range rolling count + sum per key: for each event,
    * aggregates over [ts − trailingMicros, ts] (inclusive both ends).
    * Adds `roll_cnt` and `roll_sum` to the input row. */
  def rollingRange(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, trailingMicros: Long): DataFrame = {
    require(trailingMicros > 0, "trailingMicros must be positive")
    val w = Window.partitionBy(keyCol)
      .orderBy(unix_micros(col(tsCol)))
      .rangeBetween(-trailingMicros, 0)
    // both frames in ONE projection: chained withColumn calls left an
    // intermediate Project that blocked CollapseWindow — two Window
    // execs and a redundant Sort for the same spec (caught in the
    // formatted-plan audit)
    df.select(col("*"),
      count(lit(1)).over(w).as("roll_cnt"),
      sum(col(valueCol).cast("decimal(25,6)")).over(w)
        .cast("double").as("roll_sum"))
  }

  /** Fixed-step gap-fill with LOCF: per key, emit one row per
    * `stepMicros` slot from the key's first observation to its last,
    * carrying the latest observed value forward across empty slots.
    * Output: `(keyCol, slot_ts, value, is_observed)` — `value` is the
    * LOCF value (never null: the first slot contains the key's first
    * observation by construction), `is_observed` marks slots with a
    * real event. Within a slot the representative observation is the
    * latest ts (ties broken on max value — an explicit rank, not an
    * engine arg-max rule). */
  def gapFillLocf(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, stepMicros: Long): DataFrame = {
    require(stepMicros > 0, "stepMicros must be positive")
    val slotOf = (unix_micros(col(tsCol)) -
      pmod(unix_micros(col(tsCol)), lit(stepMicros))).as("slot")
    val base = df.select(col(keyCol).as("_k"), slotOf,
      col(tsCol).as("_ts"), col(valueCol).as("_v"))
      .localCheckpoint() // base feeds BOTH the per-slot rank and the
                         // spine aggregate: materialize once, or an
                         // expensive caller plan executes twice
    // one representative observation per (key, slot)
    val wRep = Window.partitionBy("_k", "slot")
      .orderBy(col("_ts").desc, col("_v").desc)
    val obs = base.withColumn("_rn", row_number().over(wRep))
      .filter(col("_rn") === 1)
      .select(col("_k"), col("slot"), col("_v"))
    // dense per-key spine: first..last slot at stepMicros — explode is
    // linear in output slots
    val spine = base.groupBy("_k")
      .agg(min("slot").as("_lo"), max("slot").as("_hi"))
      .select(col("_k"), explode(sequence(col("_lo"), col("_hi"),
        lit(stepMicros))).as("slot"))
    val wFill = Window.partitionBy("_k").orderBy("slot")
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(obs, Seq("_k", "slot"), "left")
      .select(col("_k"), col("slot"), col("_v"),
        col("_v").isNotNull.as("is_observed"))
      .withColumn("value", last(col("_v"), ignoreNulls = true).over(wFill))
      .select(col("_k").as(keyCol),
        timestamp_micros(col("slot")).as("slot_ts"),
        col("value"), col("is_observed"))
  }
}
