package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl corpora — PageRank (Page 1999) over
  * the URL/host graph is the classic crawl-frontier prioritization and
  * document-quality weight (Common Crawl publishes harmonic-centrality
  * and PageRank rankings for exactly this purpose; the reference engine
  * has no graph surface, published recipe).
  *
  * Everything is EXACT integer arithmetic in rank "micro-units": rank
  * values are BIGINT multiples of a unit (1.0 ≡ `unit`), every division
  * is a floor `div`, and the damping update runs in DECIMAL(38,0) so no
  * intermediate overflows — results are bit-identical across engines,
  * partitionings and reruns (the same discipline as [[NgramLm]] /
  * [[Sampling.mixCorporaByTokens]]), which makes fixed-iteration
  * PageRank hash-gateable against an unrolled SQL mirror.
  *
  * 100 TB shape (the part that must survive 1000 executors):
  *  - the edge list is repartitioned by `src` ONCE and persisted; every
  *    iteration joins the (small) rank table TO that stable layout —
  *    per round only the n-row rank table shuffles, never the edges.
  *  - per iteration: one src-key join + one dst-key aggregation (both
  *    high-cardinality uniform keys — hub dsts are handled by map-side
  *    partial sums since the payload is one BIGINT), one bounded
  *    one-row dangling-mass aggregate broadcast back (never a driver
  *    collect), one node-key left join.
  *  - iteration results are persisted + wrapped in a LogicalRDD leaf
  *    (the [[Dedup.dupClustersClosure]] recipe) so the logical plan
  *    stays O(1) per round instead of growing exponentially.
  */
object Graph {

  /** In/out degree per node over a directed edge list (multi-edges
    * count): one union + one aggregation. */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame =
    edges.select(col(srcCol).as("node"), lit(1L).as("o"), lit(0L).as("i"))
      .union(edges.select(col(dstCol).as("node"), lit(0L).as("o"), lit(1L).as("i")))
      .groupBy("node")
      .agg(sum("o").as("out_degree"), sum("i").as("in_degree"))

  /** Fixed-iteration PageRank with exact integer arithmetic.
    *
    * Per iteration, with ranks in micro-units of `unit`:
    * {{{
    *   contrib(e)  = rank(src(e)) div outdeg(src(e))        // per edge
    *   in(v)       = Σ contrib(e) over e with dst(e) = v
    *   dangShare   = (Σ rank(u) over out-degree-0 u) div n
    *   rank'(v)    = (unit·(den−num)) div den
    *               + (num · (in(v) + dangShare)) div den
    * }}}
    * Damping is the rational `num/den` (default 85/100). Floor-division
    * residues mean total mass decays by a few units per round — the
    * standard price of exact integer PageRank; relative ranking is
    * unaffected and every engine computes the identical value.
    *
    * `unit = 0` auto-sizes to the largest power of ten with
    * `n·unit ≤ 4·10^18` (kept in Long headroom; the damping product
    * runs in DECIMAL(38,0) regardless). Multi-edges contribute once
    * each — pre-`distinct` the edge list for simple-graph semantics.
    *
    * @return (node, rank) — BIGINT micro-unit ranks for EVERY node
    *         appearing as a src or dst.
    */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iters: Int = 10,
      dampingNum: Long = 85L,
      dampingDen: Long = 100L,
      unit: Long = 0L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(dampingDen > 0 && dampingNum >= 0 && dampingNum <= dampingDen,
      s"damping must be a rational in [0,1], got $dampingNum/$dampingDen")
    val spark = edges.sparkSession
    import org.apache.spark.storage.StorageLevel

    // persist + eager count + LogicalRDD leaf: truncated plan,
    // releasable cache (see Dedup.dupClustersClosure for the rationale).
    // Round-12 shape (guide §1 job-count, §2.4 remove shuffles):
    //  - the leaf wraps the cached plan's InternalRow RDD directly and
    //    KEEPS its output partitioning (GraftShim.internalDf) — the Row
    //    round-trip of createDataFrame(c.rdd, …) cost two row
    //    conversions per read, and the lost partitioning forced the
    //    rank table through an Exchange on BOTH per-iteration joins;
    //    with the leaf partitioned by `node`, the contrib join (rank
    //    aliased to src, co-partitioned with the src-keyed edges) and
    //    the rank-update join are Exchange-free.
    //  - the count every eager() already runs is RETURNED, and a probe
    //    metric can ride that same job as an Observation — no separate
    //    count/filter jobs for n or the dangling check.
    def eager(d: DataFrame,
        obs: Option[(org.apache.spark.sql.Observation, Column)] = scala.None)
        : (DataFrame, DataFrame, Long) = {
      val c = d.persist(StorageLevel.MEMORY_AND_DISK)
      val n = obs match {
        case Some((o, m)) => c.observe(o, m).count()
        case scala.None => c.count()
      }
      (org.apache.spark.sql.graftshim.GraftShim.internalDf(c), c, n)
    }

    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    // edges land in their per-iteration join layout ONCE (src-keyed —
    // the sort-merge path when the rank table outgrows a broadcast)
    val (e, eCache, _) = eager(e0.repartition(col("src")))

    // node set AND outdeg in ONE aggregation (outdeg = # src
    // appearances; pure-dst nodes get 0 = dangling); outdeg rides IN
    // the rank table — static, so the dangling aggregate is a filter
    // and no degree join appears anywhere in the loop. The same eager
    // count supplies n, and the dangling-node existence probe rides the
    // count job as an observed metric (zero extra jobs).
    val dangObs = org.apache.spark.sql.Observation()
    val (deg, degCache, n) = eager(
      e.select(col("src").as("node"), lit(1L).as("o"))
        .union(e.select(col("dst").as("node"), lit(0L).as("o")))
        .groupBy("node")
        .agg(sum("o").as("outdeg")),
      Some((dangObs,
        sum(when(col("outdeg") === 0L, 1L).otherwise(0L)).as("dang"))))
    require(n > 0, "pageRank: empty edge list")

    val u =
      if (unit > 0) unit
      else {
        val bound = 4000000000000000000L / n
        var v = 1L
        while (v <= bound / 10) v *= 10 // compare-then-multiply: no overflow
        v
      }
    require(u >= 1000L,
      s"pageRank: unit $u too small for $n nodes — total mass must stay in " +
        "BIGINT; pass an explicit smaller unit only if you accept the precision")
    val base = u * (dampingDen - dampingNum) / dampingDen // exact Long floor

    // rank column is a narrow projection over the cached degree leaf
    var ranks = deg.withColumn("rank", lit(u))
    var ranksCache = degCache
    // the DANGLING SET is static (outdeg never changes): when it is
    // empty — the common case for symmetrized graphs — the whole
    // per-iteration dangling aggregate is a constant zero and its job
    // is skipped outright. Existence came off the deg count's observed
    // metric above (was a separate limit(1).count() job).
    val hasDangling =
      dangObs.get("dang").asInstanceOf[Long] > 0L
    val zeroDang = spark.sql("SELECT CAST(0 AS DECIMAL(38,0)) AS dangshare")
    var it = 0
    while (it < iters) {
      // per-edge contribution: floor(rank/outdeg) — the small rank
      // table ships (broadcast at modest n; src-keyed sort-merge
      // against the stable edge layout beyond that)
      val contrib = e
        .join(ranks.select(col("node").as("src"), col("outdeg"), col("rank")),
          Seq("src"))
        .select(col("dst"), expr("rank div outdeg").as("contrib"))
      val inSum = contrib.groupBy(col("dst").as("node"))
        .agg(sum(col("contrib").cast("decimal(38,0)")).as("insum"))
      // dangling mass: one-row aggregate broadcast back (never a collect)
      val dangRow =
        if (!hasDangling) zeroDang
        else ranks
          .filter(col("outdeg") === 0L)
          .agg(coalesce(sum(col("rank").cast("decimal(38,0)")), lit(0L).cast("decimal(38,0)"))
            .as("dangsum"))
          .select(expr(s"dangsum div ${n}L").as("dangshare"))
      val stepped = ranks.select("node", "outdeg")
        .join(inSum, Seq("node"), "left")
        .crossJoin(broadcast(dangRow))
        .select(col("node"), col("outdeg"),
          (lit(base) + expr(
            s"(${dampingNum}L * (coalesce(insum, cast(0 as decimal(38,0))) " +
              s"+ cast(dangshare as decimal(38,0)))) div ${dampingDen}L")).as("rank"))
      val (next, nextCache, _) = eager(stepped)
      ranksCache.unpersist()
      ranks = next
      ranksCache = nextCache
      it += 1
    }
    eCache.unpersist()
    // project off the carried outdeg; the final round stays persisted
    // (same contract as before — reads hit the cache, recompute via
    // RDD lineage if evicted)
    ranksCache.select("node", "rank")
  }

  /** HyperBall approximate HARMONIC CENTRALITY (Boldi & Vigna 2013 —
    * the other ranking Common Crawl publishes beside PageRank):
    * `H(v) = Σ_{u≠v} 1/d(u→v)`, computed from the growth of v's
    * incoming ball `B_t(v)` = {u : d(u→v) ≤ t} as
    * `Σ_t (|B_t| − |B_{t−1}|)/t`. Ball sizes come from Datasketches
    * HLL counters (Spark's native hll_* expressions): per iteration
    * each node's sketch absorbs its IN-neighbors' sketches — one
    * edge join + one union aggregation, the identical loop shape as
    * [[pageRank]], with a few-KB sketch instead of a BIGINT riding the
    * shuffle. Exact all-pairs BFS is O(n·m) and unrunnable at crawl
    * scale; HyperBall is THE published scale path. Register-wise-max
    * union makes the counters order-insensitive (partition-invariant
    * results), but estimates are sketch-approximate — spec-gated
    * against exact BFS on small graphs, not hash-gated.
    *
    * Stops after `maxIters` rounds or when no sketch changed (ball
    * growth is monotone; unchanged estimates everywhere = converged
    * at the graph's diameter).
    *
    * @return (node, harmonic) — the approximate harmonic centrality,
    *         DOUBLE (sum of estimate deltas over t)
    */
  def harmonicCentrality(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIters: Int = 16,
      lgK: Int = 12): DataFrame = {
    require(maxIters >= 1, s"maxIters must be >= 1, got $maxIters")
    val spark = edges.sparkSession
    import org.apache.spark.storage.StorageLevel
    // InternalRow leaf — see pageRank's eager(): no Row round-trip on
    // the per-iteration state reads, leaf partitioning preserved, and
    // an optional probe metric rides the materialization count
    def eager(d: DataFrame,
        obs: Option[(org.apache.spark.sql.Observation, Column)] = scala.None)
        : (DataFrame, DataFrame) = {
      val c = d.persist(StorageLevel.MEMORY_AND_DISK)
      obs match {
        case Some((o, m)) => c.observe(o, m).count()
        case scala.None => c.count()
      }
      (org.apache.spark.sql.graftshim.GraftShim.internalDf(c), c)
    }
    // balls grow along REVERSE edges: B_t(v) unions the sketches of
    // nodes with an edge INTO v. The stable layout is keyed by SRC —
    // the per-iteration JOIN key: the state side arrives co-partitioned
    // (node aliased to src over the node-keyed leaf), so the join runs
    // with zero Exchange and only the dst-keyed union aggregation
    // shuffles each round. (A dst layout bought nothing: the src join
    // re-shuffled both sides AND the groupBy(dst) still shuffled.)
    val (e, eCache) = eager(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .repartition(col("src")))
    // B_0(v) = {v}: the groupBy both dedupes the node set and builds
    // each node's singleton sketch in one aggregation
    var (state, stateCache) = eager(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .groupBy("node")
        .agg(expr(s"hll_sketch_agg(node, $lgK)").as("sketch"))
        .withColumn("ball", expr("hll_sketch_estimate(sketch)"))
        .withColumn("harmonic", lit(0.0)))
    var t = 1
    var converged = false
    while (t <= maxIters && !converged) {
      // union of in-neighbors' sketches, keyed by dst
      val inbound = e
        .join(state.select(col("node").as("src"), col("sketch").as("nsk")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(expr("hll_union_agg(nsk)").as("insk"))
      val stepped = state
        .join(inbound, Seq("node"), "left")
        .select(col("node"),
          when(col("insk").isNull, col("sketch"))
            .otherwise(expr("hll_union(sketch, insk)")).as("sketch"),
          col("ball").as("prev_ball"), col("harmonic"))
        .withColumn("ball", expr("hll_sketch_estimate(sketch)"))
        .select(col("node"), col("sketch"), col("ball"), col("prev_ball"),
          (col("harmonic") +
            (col("ball") - col("prev_ball")).cast("double") / t).as("harmonic"))
      // convergence probe rides the materialization count as an
      // observed metric (was a separate filter+limit job per round);
      // prev_ball rides in the row, so no join back to the old state
      val convObs = org.apache.spark.sql.Observation()
      val (next, nextCache) = eager(stepped, Some((convObs,
        sum(when(col("ball") =!= col("prev_ball"), 1L).otherwise(0L)).as("chg"))))
      stateCache.unpersist()
      state = next
      stateCache = nextCache
      converged = convObs.get("chg").asInstanceOf[Long] == 0L
      t += 1
    }
    eCache.unpersist()
    stateCache.select("node", "harmonic")
  }

  /** EXACT per-node triangle counts over the UNDIRECTED simple graph
    * (directions/multi-edges/self-loops collapsed) — the local
    * clustering signal link-spam detectors key on. Degree-ordered
    * orientation (Chiba–Nishizeki / the standard MapReduce formulation,
    * Suri & Vassilvitskii 2011): each edge points from the lower-
    * (degree, id) endpoint to the higher, so every wedge is generated
    * at its LOWEST-degree apex — per-node wedge work is bounded by
    * O(√m) out-degree on any graph, which is what makes the wedge join
    * survive power-law degree distributions (a celebrity node never
    * enumerates its neighbor pairs). One wedge self-join + one closing
    * equi join; every triangle is found exactly once and credited to
    * all three corners.
    *
    * @return (node, triangles) for every node of the graph
    */
  def triangleCount(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    // canonical undirected simple edges: unordered distinct, no loops
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("node")).union(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient by (degree, id): lo → hi
    val withDeg = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("lo"), col("b").as("hi")))
        .otherwise(struct(col("b").as("lo"), col("a").as("hi"))).as("e"))
      .select(col("e.lo").as("lo"), col("e.hi").as("hi"))
    // wedges at the lowest apex; canonical (hi1 < hi2) halves the join
    val w1 = oriented.select(col("lo"), col("hi").as("h1"))
    val w2 = oriented.select(col("lo"), col("hi").as("h2"))
    val wedges = w1.join(w2, Seq("lo")).filter(col("h1") < col("h2"))
    // close the wedge: (h1, h2) is id-canonical, so the third edge is
    // looked up in id-canonical form — a plain equi join
    val closing = oriented.select(
      least(col("lo"), col("hi")).as("h1"), greatest(col("lo"), col("hi")).as("h2"))
    val tris = wedges
      .join(closing, Seq("h1", "h2"))
      .select(col("lo").as("u"), col("h1").as("v"), col("h2").as("w"))
    val perNode = tris.select(explode(array(col("u"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.select("node").join(perNode, Seq("node"), "left")
      .select(col("node"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Corpus weighting by graph rank: attach `rank` (and a double
    * `rank_score` = rank/unit-total, one IEEE divide of exact integers)
    * to documents keyed by `nodeCol`. Docs absent from the graph get
    * rank 0 — no link evidence, not an error. */
  def attachRank(
      docs: DataFrame,
      nodeCol: String,
      ranks: DataFrame): DataFrame =
    docs.join(ranks.withColumnRenamed("node", nodeCol), Seq(nodeCol), "left")
      .withColumn("rank", coalesce(col("rank"), lit(0L)))
}
