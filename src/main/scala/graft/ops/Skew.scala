package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew mitigation for joins whose key distribution is too hot for a
  * plain shuffle (the 100 TB posture item from the build brief: "skewed
  * keys → salting or AQE skew-join").
  *
  * First line of defense is AQE's skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on by default) — it needs no
  * code. Salting is for the cases AQE can't fix: a *broadcast-sized*
  * build side joined against a monster key, or aggregation hot-keys.
  */
object Skew {

  /** Salted inner equi-join: the large (skewed) side gets a
    * deterministic salt in [0, buckets); the small side is replicated
    * `buckets` times; the join key becomes (key, salt), spreading each
    * hot key over `buckets` reducers. Result is row-identical to the
    * plain join (asserted in SkewSpec).
    *
    * The salt derives from a hash of the large side's whole row (not
    * rand() — replayable under task retry, which matters for
    * determinism at scale).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 0)
    val lCols = large.columns
    val salted = large.withColumn("_salt",
      pmod(xxhash64(lCols.toIndexedSeq.map(col): _*),
        lit(buckets.toLong)).cast("int"))
    val replicated = small.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }

  /** Two-phase (partial → final) aggregation with salt for hot group
    * keys: groupBy(key, salt) first, then re-aggregate by key. Spark's
    * hash aggregate already does map-side partial combine, which
    * resolves most hot keys; explicit salting helps when a single key's
    * partials still overwhelm one reducer (extreme cardinality skew).
    * `partials` maps each aggregate to its merge form, e.g.
    * count→sum, sum→sum, max→max.
    */
  def saltedAgg(df: DataFrame, key: String, buckets: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(df.columns.toIndexedSeq.map(col): _*),
          lit(buckets.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)
}
