package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relation-derived graphs — the second
  * graph family next to the connected-components label propagation in
  * [[Dedup.nearDedupLabels]]: weighted PageRank by fixed-iteration power
  * method, the crawl-graph importance signal a web-scale curation
  * pipeline ranks domains/documents with.
  *
  * Engine-portability discipline, one step harder than the
  * k-means/correlation playbook: an iterated recursion amplifies even
  * 1-ULP rounding disagreements (engines round doubles differently at
  * tie-adjacent points — shortest-repr vs exact-binary-expansion
  * quantization), so ranks here are INTEGERS end to end: "picoranks" in
  * units of 1e−12 of probability mass, propagated with integer
  * multiplication and floor division only. Every step is exact int64
  * arithmetic, order-independent under summation, and bit-identical in
  * any engine — the DuckDB oracle unrolls the same iterations and
  * value-matches every rank with no tolerance at all.
  */
object Graph {

  /** Bidirectional customer↔supplier purchase graph from the order facts:
    * one edge per (customer, supplier) pair that traded, weighted by their
    * lineitem count, in both directions (a random walk on the undirected
    * bipartite graph). Node ids are 'C'/'S'-prefixed keys.
    *
    * Shape: one lineitem ⋈ orders equi-join (the only full-size join) +
    * one hash aggregate down to the distinct trading pairs; the reverse
    * edges are a map-side union. Every node has out- AND in-degree ≥ 1 by
    * construction, so PageRank needs no dangling-mass correction.
    */
  def purchaseGraph(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val pairs = lineitem
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_suppkey"))
      .agg(count(lit(1)).as("w"))
      .select(concat(lit("C"), col("o_custkey")).as("cnode"),
        concat(lit("S"), col("l_suppkey")).as("snode"), col("w"))
    pairs.select(col("cnode").as("src"), col("snode").as("dst"), col("w"))
      .unionByName(
        pairs.select(col("snode").as("src"), col("cnode").as("dst"), col("w")))
  }

  /** Weighted PageRank by `iters` power-method steps at damping
    * `dNum`/`dDen` over ARBITRARY (src, dst, w) edges, computed ENTIRELY in
    * integer picoranks (units of 1e−12):
    *
    *   pr₀(v)    = SCALE ÷ N
    *   c(u→v)   = (prₜ(u) · w(u,v)) ÷ W(u)          (exact: w ≤ W)
    *   Dₜ       = Σ_{u dangling} prₜ(u)             (sink mass this sweep)
    *   prₜ₊₁(v) = (SCALE·(dDen−dNum)÷dDen) ÷ N + ((Σ c + Dₜ÷N) · dNum) ÷ dDen
    *
    * (÷ = floor division; each floor leaks < 1 picorank of mass — ~(|E|+2N)
    * ·1e−12 per sweep, far below any ranking-relevant signal.) The int64
    * headroom bound is prₜ(u)·w(u,v) < 2⁶³: safe while no single edge
    * weight exceeds ~9e6 at full rank concentration; beyond that, widen
    * the same recursion to DECIMAL(38,0).
    *
    * DANGLING nodes (appear as dst, never as src — web-crawl sinks) are
    * handled by the standard uniform redistribution: their mass Dₜ is a
    * bounded per-sweep driver scalar (like N itself), folded into every
    * node's share. Graphs with no dangling nodes (detected once, one
    * bounded check) take the original sink-free plan unchanged — no extra
    * per-sweep action, pr stays one lazy composed plan: the sink-free
    * recursion drops the Dₜ÷N term and restricts output to nodes with
    * in-edges' contributions (every node, when in-degree ≥ 1), which is
    * bit-identical to the previous behavior and the same DuckDB oracle.
    * When sinks exist, each sweep localCheckpoints (Dₜ is an action per
    * sweep; without materialization each scalar would recompute the whole
    * lineage). Mass conservation on sink graphs is spec-pinned
    * (GraphSpec).
    *
    * Each iteration is one shuffle-keyed equi-join (edges ⋈ ranks on src —
    * ranks is |V| rows, broadcastable when nodes ≪ edges) plus one hash
    * aggregate keyed by dst; the weighted edge set is `localCheckpoint`ed
    * once and reused. DEPLOY-SCALE SUBSTITUTION: `localCheckpoint` stores
    * blocks on executors with lineage truncated — executor loss (or dynamic
    * allocation) makes the run unrecoverable. On a cluster, substitute
    * reliable checkpoints (`sparkContext.setCheckpointDir` + `checkpoint()`)
    * or materialize the weighted edge set / periodic rank snapshots as
    * tables; the recursion is unchanged. The same note applies to every
    * iterative localCheckpoint seam in this repo
    * ([[Dedup.nearDedupLabels]], the lshCalibration/pqShortlist
    * per-invocation caches). Iteration results checkpoint only every
    * `checkpointEvery` sweeps — a short fixed-iteration run (the common
    * case) executes as ONE shallow plan instead of paying an eager
    * materialization per sweep, while long runs keep lineage bounded (the
    * [[Dedup.nearDedupLabels]] pattern). N is a bounded driver total.
    *
    * Returns (node, pr_q, pr): the exact integer picorank and its double
    * reading pr_q/1e12 (one division — portable).
    */
  def pageRank(
      edges: DataFrame, dNum: Long = 85, dDen: Long = 100,
      iters: Int = 3, checkpointEvery: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val Scale = 1000000000000L
    // per-src out-weight via ONE window instead of a self-join (guide §2.4:
    // two operations keyed the same way share one exchange). Under AQE the
    // checkpoint surfaces as UnknownPartitioning, so each sweep PLANS an
    // edge-side exchange — but all sweeps' edge exchanges are canonically
    // identical (same RDD scan, same key), so runtime ReusedExchange
    // materializes the |E| shuffle once per run and later sweeps only read
    // it; the per-sweep shuffle WRITE is the |V|-row rank side
    val g = edges
      .select(col("src"), col("dst"), col("w"),
        sum(col("w")).over(Window.partitionBy("src")).as("wt"))
      .localCheckpoint()
    // node set + dangling detection in ONE pass and ONE action: a node is
    // dangling iff it appears as dst but never as src (web-crawl sink).
    // The lazy checkpoint is materialized by the same job that computes
    // the (count, dangling-count) scalars — no separate eager pass.
    val nodes = g.select(col("src").as("node"), lit(1).as("has_out"))
      .unionByName(g.select(col("dst").as("node"), lit(0).as("has_out")))
      .groupBy("node").agg(max(col("has_out")).as("has_out"))
      .localCheckpoint(false)
    val cnts = nodes
      .agg(count(lit(1)), sum(lit(1) - col("has_out"))).head()
    val n = cnts.getLong(0)
    val hasDangling = !cnts.isNullAt(1) && cnts.getLong(1) > 0
    val dangling = nodes.filter(col("has_out") === 0).select("node")
    val baseQ = (Scale * (dDen - dNum) / dDen) / n
    var pr = nodes.select(col("node"), lit(Scale / n).as("prq"))
    (1 to iters).foreach { i =>
      val contrib = g
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst"), expr("(prq * w) DIV wt").as("c"))
        .groupBy(col("dst"))
        .agg(sum(col("c")).as("sc"))
      if (hasDangling) {
        // the sweep's sink mass — a bounded driver scalar, exact int64
        val dShare = pr.join(dangling, Seq("node"))
          .agg(coalesce(sum(col("prq")), lit(0L))).head().getLong(0) / n
        pr = nodes
          .join(contrib.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(col("node"),
            expr(s"$baseQ + ((coalesce(sc, 0L) + $dShare) * $dNum) DIV $dDen")
              .as("prq"))
        if (i < iters) pr = pr.localCheckpoint()
      } else {
        pr = contrib.select(col("dst").as("node"),
          expr(s"$baseQ + (sc * $dNum) DIV $dDen").as("prq"))
        if (i % checkpointEvery == 0 && i < iters) pr = pr.localCheckpoint()
      }
    }
    pr.select(col("node"), col("prq").as("pr_q"),
      expr("CAST(prq AS DOUBLE) / 1000000000000.0").as("pr"))
  }

  /** Triangle listing over an id-ORIENTED undirected edge set (each edge
    * stored once as u < v): the wedge join e1(a,b) ⋈ e2(b,c) enumerates
    * every ordered wedge a<b<c once, and the closing equi-join against
    * e3(a,c) keeps exactly the triangles — each listed once as
    * (doc_a < doc_b < doc_c), the standard distributed formulation.
    *
    * Scale shape: two hash equi-joins; the wedge join's size is
    * Σ_v out(v)·in(v) under the id orientation — the same quantity
    * degree-ordered orientation minimizes (orient by (degree, id) instead
    * when hub nodes dominate; the join shape is unchanged). No cartesian,
    * no windows; triangle-dense hubs spread across partitions by the join
    * keys and AQE skew splitting.
    */
  def triangles(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").as("u"), col("dst").as("v"))
    e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("doc_a"), col("e1.v").as("doc_b"),
        col("e2.v").as("doc_c"))
  }

  /** Connected components of an undirected edge list (`u`, `v`) — the third
    * classic graph primitive next to PageRank and triangles, and the
    * cluster-discovery step every dedup/provenance pipeline runs on its
    * pair list. Delegates to the same min-label propagation loop as
    * [[Dedup.nearDedupLabels]] (per round one join + one hash aggregate,
    * `localCheckpoint` lineage cuts, label-sum convergence — diameter
    * rounds, never a materialized transitive closure), over the node set
    * derived from the edges.
    *
    * Returns (node, component, n_members); component = the minimum node id
    * reachable, sizes via a window count over the labeling (r16, guide
    * §2.4: the aggregate + join-back form re-keyed the |V|-row labeling
    * twice — component-keyed aggregate exchange, then the join's own pair
    * of exchanges; the window pays ONE component-keyed exchange and counts
    * in place).
    */
  def connectedComponents(edges: DataFrame, maxIterations: Int = 50): DataFrame = {
    val pairs = edges.select(col("u").as("doc_a"), col("v").as("doc_b"))
    val nodes = edges.select(col("u").as("doc_id"))
      .union(edges.select(col("v").as("doc_id"))).distinct()
    val lbl = Dedup.nearDedupLabels(nodes, pairs, maxIterations)
      .select(col("doc_id").as("node"), col("canonical_id").as("component"))
    lbl.withColumn("n_members",
        count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy("component")))
      .select("node", "component", "n_members")
  }
}
