package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.{Column, DataFrame}

/** K-minimum-values (KMV / theta-sketch) distinct-value synopses and
  * the set-OVERLAP estimates they compose to (Beyer, Haas, Reinwald,
  * Sismanis, Gemulla, "On synopses for distinct-value estimation under
  * multiset operations", SIGMOD 2007 — the estimator family behind
  * DataSketches' theta sketch).
  *
  * Why this exists next to the HLL distinct counts
  * ([[graft.ops.IncrementalAgg.refreshDistinct]]): HLL registers
  * support UNION only. KMV sketches are closed under union AND support
  * an intersection/Jaccard estimator, which makes them the join-free
  * screen for corpus-overlap questions — "how much of corpus B is
  * already in corpus A?" asked before an expensive decontamination or
  * dedup join is ever launched. At 100 TB each side reduces to k
  * 8-byte hashes via one scan + a TakeOrdered (no shuffle of the data,
  * no join between the corpora); every estimate then folds from
  * ≤ 3k rows of metadata.
  *
  * Determinism: the sketch is the k SMALLEST distinct `xxhash64`
  * values — a pure function of the value SET (no RNG, no
  * layout/order dependence), so sketches and estimates replay
  * bit-identically across runs and engines.
  */
object Kmv {

  /** KMV sketch of the distinct non-null values of `keyCol`: the k
    * smallest xxhash64 values as a k-row `(h: BIGINT)` frame
    * (fewer than k rows when the corpus has < k distinct values — the
    * estimator then returns EXACT counts). One scan + one distinct
    * shuffle of 8-byte keys + a TakeOrderedAndProject; never a sort of
    * the corpus.
    */
  def sketch(df: DataFrame, keyCol: Column, k: Int): DataFrame = {
    require(k >= 16, "k must be at least 16 for usable error bounds")
    df.filter(keyCol.isNotNull)
      .select(xxhash64(keyCol).as("h"))
      .distinct()
      .orderBy(col("h").asc)
      .limit(k)
  }

  /** Map a signed 64-bit hash to its position in (0, 1]: the fraction
    * of the hash space at or below it. Exactly the same IEEE ops in
    * any engine: int64→double, subtract, divide.
    */
  private def frac(h: Column): Column =
    (h.cast(DoubleType) - lit(Long.MinValue.toDouble)) /
      lit(math.pow(2.0, 64))

  /** Distinct-value estimate from a single sketch, as a 1-row frame
    * `(n_est: DOUBLE, n_sketch: BIGINT)`: the Beyer et al. unbiased
    * (k−1)/frac(h_k) when the sketch is full, the exact row count when
    * not (a non-full sketch IS the distinct value set, hashed).
    */
  def distinctEstimate(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("n_sketch"), max(col("h")).as("_hk"))
      .select(
        when(col("n_sketch") < k, col("n_sketch").cast(DoubleType))
          .otherwise((lit(k - 1).cast(DoubleType)) / frac(col("_hk")))
          .as("n_est"),
        col("n_sketch"))

  /** Overlap report between two corpora from their sketches: 1 row
    * `(union_est, jaccard_est, intersection_est)`.
    *
    * The union sketch is the k smallest of the merged sketches (KMV is
    * closed under union); with θ = its k-th value, `K_θ(X)` below
    * denotes the members of sketch X at or below θ. Jaccard is
    * estimated on the k-sample of the union — `|K_θ(A) ∩ K_θ(B)| / |U|`
    * — and the intersection as jaccard × union (the SIGMOD 2007
    * multiset-operation composition). Everything after the two
    * sketches is ≤ 3k rows: the merge, the semi-joins, the folds — a
    * driver-side cost at any corpus scale, and the joins broadcast.
    *
    * Standard error ~ 1/√k on the union; the Jaccard estimator adds
    * binomial noise √(J(1−J)/k). Callers gate with a few σ of slack
    * (the driver query uses 5σ).
    */
  def overlapEstimate(skA: DataFrame, skB: DataFrame, k: Int): DataFrame = {
    val union = skA.union(skB).distinct().orderBy(col("h").asc).limit(k)
    val uStats = union.agg(count(lit(1)).as("n_u"), max(col("h")).as("_hk"))
    val matches = union
      .join(skA, Seq("h"), "left_semi")
      .join(skB, Seq("h"), "left_semi")
      .agg(count(lit(1)).as("n_match"))
    broadcast(uStats).crossJoin(broadcast(matches))
      .select(
        when(col("n_u") < k, col("n_u").cast(DoubleType))
          .otherwise(lit(k - 1).cast(DoubleType) / frac(col("_hk")))
          .as("union_est"),
        (col("n_match").cast(DoubleType) / col("n_u").cast(DoubleType))
          .as("jaccard_est"),
        col("n_match"), col("n_u"))
      .select(col("union_est"), col("jaccard_est"),
        (col("jaccard_est") * col("union_est")).as("intersection_est"))
  }
}
