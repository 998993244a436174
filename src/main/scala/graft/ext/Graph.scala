package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Iterative graph analytics over an edge DataFrame — the ranking
  * sibling of [[Dedup.clusters]]' connected components. Scale posture:
  * the graph lives as a `(src, dst, outdeg)` adjacency frame that is
  * materialized ONCE; each iteration joins the O(N) `(node, rank)`
  * frame against it on the src key — so the per-round cost is one
  * rank-sized shuffle, never an edge rewrite. Scalars (node count,
  * dangling mass) ride along as broadcast 1-row frames — no `collect`.
  */
object Graph {

  /** PageRank (Page, Brin, Motwani, Winograd 1999) with a fixed
    * iteration count — the budgeted form a batch pipeline wants: the
    * rank after k rounds is a deterministic function of the edge set,
    * so a driver oracle can replay it (convergence-threshold stopping
    * would make the OUTPUT SHAPE depend on float drift).
    *
    * Semantics: nodes are the distinct endpoints of `edges`
    * (self-loops dropped, duplicate edges collapsed); rank starts
    * uniform at 1/N; each round
    * `r'(v) = (1−δ)/N + δ·(Σ_{u→v} r(u)/outdeg(u) + dangling/N)`
    * where `dangling` is the rank mass on nodes with no out-edges,
    * redistributed uniformly (the standard stochastic-matrix patch —
    * total mass stays exactly 1). Cross-engine determinism: every
    * per-edge contribution and the dangling mass are cast to
    * DECIMAL(28,12) BEFORE their sums, so aggregation is
    * order-independent (the [[Bm25]] trick); the scalar arithmetic
    * around the sums is plain IEEE double, identical in any engine.
    *
    * 100 TB posture: the adjacency frame is checkpointed once and
    * reused; each of the `iters` rounds shuffles only the O(N) rank
    * frame, which is checkpointed eagerly and the previous round's
    * blocks released — lineage stays one round deep, no exponential
    * replan from the dangling + contribution double-reference. Same
    * checkpoint policy switch as [[Dedup.clusters]]: `checkpointDir =
    * Some(dir)` for RELIABLE cluster checkpoints (caller owns the
    * dir's lifecycle), `None` for `localCheckpoint` (interactive /
    * local — blocks behind the RETURNED frame are released by the
    * context cleaner once unreferenced).
    *
    * @return (node, rank) with rank as DECIMAL(28,12), one row per node.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, damping: Double = 0.85,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "at least one iteration")
    require(damping > 0.0 && damping < 1.0, "damping must be in (0, 1)")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame = checkpointDir match {
      case Some(_) => df.checkpoint()
      case None    => df.localCheckpoint()
    }
    def release(df: DataFrame): Unit =
      if (checkpointDir.isEmpty) Dedup.releaseLocalCheckpoint(df)

    val e = edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = pin(e.join(outdeg, Seq("src")))
    val nodes = pin(adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node"))).distinct())
    val nDf = broadcast(nodes.agg(count(lit(1)).as("_n")))
    // pinned once: unpinned, every iteration's dangling-mass job would
    // re-run this adjacency-sized anti-join (an O(E) scan + shuffle per
    // round for a frame that is at most node-sized and never changes);
    // pinning also lets the no-sinks case short-circuit below
    val sinks = pin(nodes.join(adj.select(col("src").as("node")),
      Seq("node"), "left_anti"))
    // a graph with no sinks (e.g. any symmetric graph) has dangling
    // mass EXACTLY zero every round — skip the per-iteration dangling
    // job outright (the standard pagerank short-circuit; the pinned
    // frame makes the emptiness check free)
    val noSinks = sinks.isEmpty
    val dec = DecimalType(28, 12)

    var ranks = pin(nodes.crossJoin(nDf)
      .select(col("node"), (lit(1.0) / col("_n")).as("rank")))
    for (_ <- 1 to iters) {
      val dangling = broadcast(
        if (noSinks)
          edges.sparkSession.range(1).select(lit(0.0).as("_dm"))
        else ranks
          .join(sinks, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("rank").cast(dec)), lit(0).cast(dec))
            .cast(DoubleType).as("_dm")))
      val contribs = adj
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          (col("rank") / col("outdeg")).cast(dec).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).cast(DoubleType).as("inflow"))
      val next = pin(nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(nDf).crossJoin(dangling)
        .select(col("node"),
          ((lit(1.0) - lit(damping)) / col("_n") +
            lit(damping) * (coalesce(col("inflow"), lit(0.0)) +
              col("_dm") / col("_n"))).as("rank")))
      release(ranks)
      ranks = next
    }
    val out = ranks.select(col("node"), col("rank").cast(dec).as("rank"))
    release(adj); release(nodes); release(sinks)
    out
  }

  /** Rank mass scale of [[pageRankFixed]]: 1 rank unit = 10⁻¹² of the
    * total mass. 85·Scale ≈ 8.5×10¹³ ≪ 2⁶³, so every intermediate fits
    * BIGINT with 8 decimal orders of headroom.
    */
  val FixedScale: Long = 1000000000000L

  /** [[pageRank]] in fixed-point BIGINT arithmetic — the CROSS-ENGINE
    * BIT-EXACT variant. The double version is faithful to the textbook
    * semantics but not replayable digit-for-digit by another engine:
    * its per-edge double→DECIMAL(28,12) casts round through the
    * double's SHORTEST decimal rendering on the JVM
    * (`BigDecimal.valueOf`) and through the exact binary expansion in
    * DuckDB — a 10⁻¹²-digit disagreement per cast that a hash compare
    * sees. Here rank is a BIGINT in units of Scale⁻¹ = 10⁻¹² and every
    * operation is exact integer arithmetic (`div` truncation; all
    * quantities non-negative, so Spark's and DuckDB's `//` truncate-vs-
    * floor difference cannot bite):
    *
    *   r₀(v)  = Scale div N
    *   r'(v)  = ((100−d)·Scale div 100) div N
    *          + d·(Σ_{u→v} r(u) div outdeg(u) + dangling div N) div 100
    *
    * with `damping = d/100`. Truncation loses ≤ 10⁻¹² mass per term —
    * invisible at ranking granularity — in exchange for a result that
    * is a pure function of the edge SET: independent of partition
    * layout, aggregation order, engine, and platform. Same adjacency /
    * per-round-shuffle / checkpoint posture as [[pageRank]].
    *
    * @param dampingPct damping factor in integer percent (85 ⇒ δ=0.85).
    * @return (node, rank_u, rank): rank_u BIGINT in 10⁻¹² mass units,
    *         rank its exact DOUBLE rendering (rank_u / 10¹² — below
    *         2⁵³, so the division is one identical IEEE op everywhere).
    */
  def pageRankFixed(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampingPct: Int = 85,
      checkpointDir: Option[String] = None): DataFrame = {
    // Catalyst's IntegralDivide (SQL `div`): BIGINT in, BIGINT out
    def idiv(a: Column, b: Column): Column = call_function("div", a, b)
    require(iters >= 1, "at least one iteration")
    require(dampingPct > 0 && dampingPct < 100, "dampingPct must be in (0, 100)")
    checkpointDir.foreach(edges.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame = checkpointDir match {
      case Some(_) => df.checkpoint()
      case None    => df.localCheckpoint()
    }
    def release(df: DataFrame): Unit =
      if (checkpointDir.isEmpty) Dedup.releaseLocalCheckpoint(df)

    val e = edges
      .select(col(srcCol).cast(LongType).as("src"),
        col(dstCol).cast(LongType).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
    val outdeg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    val adj = pin(e.join(outdeg, Seq("src")))
    val nodes = pin(adj.select(col("src").as("node"))
      .union(adj.select(col("dst").as("node"))).distinct())
    val nDf = broadcast(nodes.agg(count(lit(1)).as("_n")))
    // pinned once (same rationale as [[pageRank]]): the dangling-mass
    // job must not re-run an adjacency-sized anti-join every round
    val sinks = pin(nodes.join(adj.select(col("src").as("node")),
      Seq("node"), "left_anti"))
    // no sinks ⇒ dangling mass is exactly 0 every round (see
    // [[pageRank]]) — skip the per-iteration dangling job outright
    val noSinks = sinks.isEmpty
    val teleport = lit((100L - dampingPct) * FixedScale / 100L)

    var ranks = pin(nodes.crossJoin(nDf)
      .select(col("node"),
        idiv(lit(FixedScale), col("_n")).as("rank")))
    for (_ <- 1 to iters) {
      val dangling = broadcast(
        if (noSinks)
          edges.sparkSession.range(1).select(lit(0L).as("_dm"))
        else ranks
          .join(sinks, Seq("node"), "left_semi")
          .agg(coalesce(sum(col("rank")), lit(0L)).as("_dm")))
      val contribs = adj
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          idiv(col("rank"), col("outdeg")).as("c"))
        .groupBy("node")
        .agg(sum(col("c")).as("inflow"))
      val next = pin(nodes
        .join(contribs, Seq("node"), "left")
        .crossJoin(nDf).crossJoin(dangling)
        .select(col("node"),
          (idiv(teleport, col("_n")) +
            idiv(lit(dampingPct.toLong) *
              (coalesce(col("inflow"), lit(0L)) +
                idiv(col("_dm"), col("_n"))), lit(100L))).as("rank")))
      release(ranks)
      ranks = next
    }
    val out = ranks.select(col("node"), col("rank").as("rank_u"),
      (col("rank").cast(DoubleType) / lit(FixedScale.toDouble)).as("rank"))
    release(adj); release(nodes); release(sinks)
    out
  }
}
