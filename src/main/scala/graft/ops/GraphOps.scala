package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over edge lists, complementing the connected-
  * components family in [[DedupOps]] (min-label propagation +
  * large-star/small-star). The reference computes no graph measures;
  * this fills the gap Spark-first: edges and ranks stay DataFrames,
  * each iteration is a join + partial-aggregated groupBy, and lineage
  * is truncated per round exactly like the CC loops so a deep
  * iteration count cannot blow up the plan.
  *
  * Scale notes (100 TB posture): the per-iteration work is one
  * rank⋈edge hash join on `src` plus one groupBy on `dst` — the
  * Pregel message pattern. Edge probabilities are computed ONCE
  * up front (weights normalized per source) and localCheckpointed, so
  * iterations never re-derive them; the rank frame is node-sized (≪
  * edge-sized) and the planner broadcasts it when small. The only
  * driver-side scalar is the node COUNT.
  */
object GraphOps {

  /** Weighted, damped PageRank with a fixed iteration count.
    *
    * `edges` must have columns (`src`: string, `dst`: string,
    * `weight`: numeric > 0). Rank update per iteration:
    *
    *   rank'(v) = (1-d)/N + d · Σ_{u→v} p(u,v) · rank(u)
    *
    * where p(u,v) = weight(u,v) / Σ_w weight(u,w). Nodes with no
    * in-edges keep the teleport term; DANGLING nodes (no out-edges)
    * are refused loudly rather than silently leaking rank mass —
    * callers whose graphs can dangle must add self-loops or a sink
    * redistribution first (same loud-refusal contract as
    * [[DedupOps.connectedComponents]] non-convergence).
    *
    * Returns (`node`, `pagerank` rounded to 6dp) — rounding pinned so
    * the DuckDB oracle's unrolled-iteration recomputation hashes
    * identically despite double arithmetic.
    */
  def pageRank(edges: DataFrame, iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    val spark = edges.sparkSession
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    // One scalar to the driver: N. (Node count, not rows — bounded.)
    val n = nodes.count()
    require(n > 0, "pageRank: empty graph")
    val dangling = nodes
      .join(edges.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .limit(1).collect()
    require(dangling.isEmpty,
      s"pageRank: dangling node '${dangling.headOption.map(_.get(0))}' " +
        "has no out-edges; add self-loops or sink redistribution first")

    // p(u,v) — computed once, checkpointed, reused every iteration.
    val wOut = Window.partitionBy("src")
    val probs = edges.select(col("src"), col("dst"),
        (col("weight").cast("double") /
          sum(col("weight").cast("double")).over(wOut)).as("p"))
      .localCheckpoint()

    val teleport = (1.0 - damping) / n
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = probs
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("rank")).as("inflow"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        // same lineage-truncation discipline as the CC loops: round
        // k's plan must not replay rounds 1..k-1. Lazy — materialized
        // by the next round's join (or the caller's action).
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("pagerank"))
  }

  /** PageRank over the event-type transition graph: edges are the
    * first-order Markov transitions of [[EventOps.eventTransitions]]
    * (consecutive same-user event pairs, weighted by occurrence
    * count). The stationary-importance ranking of event types — which
    * states the user flow concentrates on. The edge derivation (one
    * window pass + one groupBy over the full log) is the distributed
    * heavy part; the iteration then runs on the collapsed type-level
    * graph, so cost scales with the LOG, not with iterations × log.
    */
  /** Per-node triangle counts via the degree-oriented node-iterator
    * (Suri & Vassilvitskii WWW '11, "the curse of the last reducer").
    *
    * `edges` is an undirected, deduplicated edge list (`src` < `dst`,
    * string vertices). Naive wedge enumeration groups wedges at their
    * CENTER, so one celebrity node with degree d contributes d²
    * wedges to a single reducer — the skew that kills corpus-scale
    * graphs. Orienting every edge along the total order (degree, id)
    * instead makes each node's out-degree O(√m) on ANY graph, so the
    * wedge join is Σ outdeg² ≤ O(m^1.5) spread evenly — the published
    * bound, with no skew cliff.
    *
    * Each triangle is counted exactly once: its three edges orient
    * consistently (the total order is total), the wedge forms at the
    * <T-minimal corner, and the closing edge (b,c) is itself oriented
    * low→high in the SAME order — carried as a struct comparison in
    * the wedge condition — so the closure check is a pure EQUI-join on
    * (b,c), never an OR-condition nested loop. Output: every corner of
    * every triangle, counted per node (the clustering-coefficient
    * numerator). */
  def triangleCounts(edges: DataFrame): DataFrame = {
    // The edge list feeds degree counting (2 scans), orientation, and
    // both sides of the wedge/closure joins — 5 consumers. Materialize
    // it ONCE so an expensive upstream (e.g. the co-occurrence mining
    // pipeline) never recomputes per consumer; the frame is
    // pair-thresholded, i.e. orders of magnitude below corpus size.
    val und = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = und.select(col("src").as("v"))
      .unionAll(und.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val lowFirst = struct(col("ds"), col("src")) < struct(col("dd"), col("dst"))
    val oriented = und
      .join(deg.select(col("v").as("src"), col("deg").as("ds")), "src")
      .join(deg.select(col("v").as("dst"), col("deg").as("dd")), "dst")
      .select(
        when(lowFirst, col("src")).otherwise(col("dst")).as("u"),
        when(lowFirst, col("dst")).otherwise(col("src")).as("w"),
        when(lowFirst, col("dd")).otherwise(col("ds")).as("dw"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dw"), col("e1.w")) < struct(col("e2.dw"), col("e2.w")))
      .select(col("e1.u").as("a"), col("e1.w").as("b"), col("e2.w").as("c"))
    wedges
      .join(oriented.select(col("u").as("b"), col("w").as("c")), Seq("b", "c"))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering coefficient per node: 2·T(v) / (deg(v)·(deg(v)−1))
    * — the fraction of a node's neighbor pairs that are themselves
    * connected (Watts–Strogatz '98). Nodes of degree < 2 have no
    * defined coefficient and are excluded; triangle-free nodes report
    * 0. The division is pinned to DOUBLE with the oracle's operand
    * order and 6dp round. Cost is [[triangleCounts]] plus one
    * node-keyed left join against the (node-cardinality) degree frame. */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val und = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = und.select(col("src").as("v"))
      .unionAll(und.select(col("dst").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    deg.filter(col("deg") >= 2)
      .join(triangleCounts(und).withColumnRenamed("node", "v"), Seq("v"), "left")
      .select(col("v").as("node"), col("deg"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        round(lit(2.0) * coalesce(col("n_triangles"), lit(0L)).cast("double") /
          (col("deg").cast("double") * (col("deg").cast("double") - 1.0)), 6)
          .as("clustering_coef"))
  }

  /** [[triangleCounts]] over the term co-occurrence graph
    * ([[MiningOps.termCooccurrence]]'s df-bounded, support-thresholded
    * pair set): which vocabulary terms sit in tightly clustered topic
    * neighborhoods. Node ids are term strings; the co-occurrence
    * thresholds bound the graph before any triangle work. */
  def cooccurrenceTriangles(docs: DataFrame): DataFrame =
    triangleCounts(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")))

  /** [[clusteringCoefficients]] over the same co-occurrence graph:
    * which terms sit in closed topic cliques (coef → 1) vs broad hub
    * vocabulary bridging unrelated contexts (coef → 0). */
  def cooccurrenceClustering(docs: DataFrame): DataFrame =
    clusteringCoefficients(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")))

  /** Multi-source BFS: minimum hop distance from a seed node set over
    * an undirected edge list, bounded at `maxHops`. The level-
    * synchronous frontier-expansion form every distributed graph
    * engine uses (Pregel supersteps): round h joins the CURRENT
    * frontier (nodes first reached at h−1) against the edge list,
    * anti-joins the visited set, and labels the survivors h. Unlike
    * the recursive-CTE formulation a single-node engine runs, no path
    * enumeration ever happens — each round's work is one frontier⋈edge
    * hash join (frontier is node-sized, broadcast when small) plus one
    * anti-join, and rows are (node, hops) pairs, so the total state is
    * V rows regardless of path multiplicity. Lineage is truncated per
    * round exactly like [[pageRank]] and the CC loops.
    *
    * Hop distances are UNIQUE per node (the first round that reaches a
    * node fixes its label), so the output is deterministic for any
    * edge order — no tie-breaking needed. Nodes unreached within
    * `maxHops` are absent, mirroring the oracle's bounded recursion.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int = 4): DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    // Undirected: every edge usable in both directions. Checkpointed
    // once — each of the maxHops rounds probes the same frame.
    val both = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    var visited = seeds.select(col("node")).distinct()
      .withColumn("hops", lit(0)).localCheckpoint()
    var frontier = visited
    for (h <- 1 to maxHops) {
      // Frontier is at most node-cardinality and typically far
      // smaller — let the planner broadcast it into the edge join so
      // the (large) edge side never reshuffles per round.
      val next = both.join(broadcast(frontier.select(col("node").as("src"))), "src")
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint() // eager: 2 consumers (union + next round)
      visited = visited.unionAll(next).localCheckpoint(eager = false)
      frontier = next
    }
    visited.select(col("node"), col("hops"))
  }

  /** [[bfsHops]] over the term co-occurrence graph, seeded at its
    * highest-degree term (ties broken by binary string order — both
    * engines agree): how many association steps separate the rest of
    * the vocabulary from the corpus's most-connected hub term. The
    * co-occurrence thresholds bound the graph BEFORE any traversal
    * (same contract as [[cooccurrenceTriangles]]); the DuckDB oracle
    * recomputes the identical reachability with a bounded recursive
    * CTE, so the iterative frontier loop is hash-gated — not just
    * audited — against an independent engine's transitive closure. */
  def cooccurrenceBfsHops(docs: DataFrame, maxHops: Int = 4): DataFrame = {
    val edges = MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst"))
      .localCheckpoint() // consumed by degree agg AND the BFS rounds
    val deg = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val seed = deg.orderBy(col("deg").desc, col("node").asc).limit(1)
      .select("node")
    bfsHops(edges, seed, maxHops)
      .select(col("node").as("term"), col("hops"))
      .orderBy(col("hops").asc, col("term").asc)
  }

  /** Closeness / harmonic / eccentricity centralities of the term
    * co-occurrence graph from ALL-PAIRS shortest hop counts — the
    * distance-based centrality row completing the degree
    * ([[cooccurrenceAssortativity]]), spectral ([[pageRank]]/
    * [[hitsUserType]]), and density ([[kCore]]/[[kTruss]]) families:
    * closeness = n_reachable/Σd (how quickly a term reaches the rest
    * of the vocabulary), harmonic = Σ1/d (Marchiori–Latora — finite
    * under disconnection where closeness degenerates), eccentricity =
    * max d (whose maximum over nodes is the graph diameter).
    *
    * All-pairs BFS runs as `maxHops` frontier rounds over (src, node)
    * pair states — V² states on the df-THRESHOLDED vocabulary graph
    * (the [[cooccurrenceTriangles]] contract: thresholds bound the
    * graph before any traversal; this is a vocabulary-sized operator,
    * never corpus-sized) — then REQUIRES one more round is a no-op
    * (the [[kCore]] loud-refusal contract), so every distance — hence
    * the eccentricity MAX — is exact, not hop-capped.
    *
    * Determinism: distances are exact ints; closeness is one pinned
    * division; each 1/d harmonic term rounds 10dp into DECIMAL(38,10)
    * before its sum (order-exact); isolated sources (nothing
    * reachable) emit NULL closeness/eccentricity and harmonic 0. */
  def cooccurrenceCloseness(docs: DataFrame, maxHops: Int = 8): DataFrame =
    closenessCentrality(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")), maxHops)

  /** [[cooccurrenceCloseness]]'s edge-level core — all-pairs BFS +
    * the three distance centralities over any undirected edge list. */
  def closenessCentrality(edges: DataFrame, maxHops: Int = 8): DataFrame = {
    val both = edges.unionAll(
        edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint() // probed by every BFS round
    val nodes = both.select(col("src").as("node")).distinct()
    var visited = nodes.select(col("node").as("s"), col("node"))
      .withColumn("hops", lit(0)).localCheckpoint()
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = both
        .join(frontier.select(col("s"), col("node").as("src")), "src")
        .select(col("s"), col("dst").as("node")).distinct()
        .join(visited.select("s", "node"), Seq("s", "node"), "left_anti")
        .withColumn("hops", lit(h))
        .localCheckpoint() // eager: union + next round both read it
      visited = visited.unionAll(next).localCheckpoint(eager = false)
      frontier = next
    }
    require(frontier.isEmpty,
      s"closenessCentrality: BFS not converged after $maxHops rounds " +
        "— raise `maxHops`; a hop-capped eccentricity would be wrong")
    val term = round(lit(1.0) / col("hops").cast("double"), 10)
      .cast("decimal(38,10)")
    visited.filter(col("hops") > 0)
      .groupBy(col("s").as("term"))
      .agg(count(lit(1)).as("n_reachable"),
        sum(col("hops").cast("long")).as("sum_hops"),
        max(col("hops").cast("long")).as("eccentricity"),
        sum(term).as("h"))
      .join(nodes.select(col("node").as("term")), Seq("term"), "right")
      .select(col("term"),
        coalesce(col("n_reachable"), lit(0L)).as("n_reachable"),
        col("eccentricity"),
        when(col("sum_hops") > 0L,
          round(col("n_reachable").cast("double") /
            col("sum_hops").cast("double"), 6)).as("closeness"),
        round(coalesce(col("h"), lit(0).cast("decimal(38,10)"))
          .cast("double"), 6).as("harmonic"))
  }

  /** k-core decomposition by iterative peeling (Seidman '83; the
    * Batagelj–Zaveršnik distributed formulation): repeatedly drop
    * nodes whose degree WITHIN the survivors is < k until stable —
    * the maximal subgraph where everyone keeps ≥ k neighbors, the
    * community-detection primitive between "has edges" and "is a
    * clique". The fixpoint is UNIQUE (peeling order never matters),
    * which is what makes an iterative operator like this gateable.
    *
    * Round contract (the same fixed-unroll discipline as
    * [[pageRank]]'s oracle): the loop runs EXACTLY `rounds` peels —
    * each one edge⋈members⋈members join + one grouped count, with
    * per-round lineage truncation — then REQUIRES that one more peel
    * is a no-op. Converged early, the extra peels are no-ops and the
    * result equals the oracle's identically-unrolled rounds;
    * unconverged, it throws (the [[graft.ops.DedupOps
    * .connectedComponents]] loud-refusal contract) instead of
    * shipping a superset of the core. Peeling is monotone
    * (members_{i+1} ⊆ members_i), so a stable COUNT proves a stable
    * SET. Returns each core member with its within-core degree. */
  def kCore(edges: DataFrame, k: Int, rounds: Int = 6): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val both = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint()
    def peel(members: DataFrame): DataFrame = both
      .join(members.select(col("node").as("src")), "src")
      .join(members.select(col("node").as("dst")), "dst")
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
    var members = both.select(col("src").as("node")).distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      members = peel(members).select("node").localCheckpoint()
    }
    val n = members.count()
    // one materialized post-loop peel serves BOTH the convergence
    // count and the returned frame — recomputing it would re-run the
    // two-sided membership join and aggregation a second time
    val last = peel(members).localCheckpoint()
    val stable = last.count()
    require(stable == n,
      s"kCore(k=$k): not converged after $rounds peels ($n -> $stable " +
        "members) — raise `rounds`; emitting the unconverged superset " +
        "would mislabel non-core nodes as core")
    last.orderBy(col("node").asc)
  }

  /** [[kCore]] over the term co-occurrence graph: the vocabulary's
    * densely inter-associated topical core — terms that keep ≥ k
    * co-occurrence partners even after every loosely-attached term is
    * peeled away (a stricter notion than high degree: a hub attached
    * to leaves has high degree and NO core membership). */
  def cooccurrenceKCore(docs: DataFrame, k: Int = 3): DataFrame =
    kCore(MiningOps.termCooccurrence(docs)
        .select(col("term_a").as("src"), col("term_b").as("dst")), k)
      .select(col("node").as("term"), col("deg").as("deg_in_core"))

  /** Synchronous label propagation (Raghavan et al. '07) for
    * community detection, `rounds` unrolled and fully deterministic:
    * labels start as each node's own id; each round every node adopts
    * its neighbors' PLURALITY label under the (count DESC, label ASC)
    * tie-break — pure neighbor majority, the node's own current label
    * does not vote. Deterministic ties plus a fixed synchronous round
    * count make the result a pure function of the edge set, so the
    * whole detector is hash-gated (the pagerank/k-core discipline) —
    * unlike the RNG-seeded async LPA most libraries ship. Contrast
    * [[graft.ops.DedupOps.connectedComponentsStar]]: CC merges
    * everything reachable; LPA keeps densely-knit regions apart even
    * when bridges connect them.
    *
    * Output: one row per surviving community label with its size.
    *
    * Scale: per round one adjacency equi-join (edge cardinality), one
    * (node, label) hash agg, one per-node argmax window — the Pregel
    * message+combine shape; the label frame localCheckpoints per
    * round so lineage stays flat. */
  /** The node→label assignment frame behind
    * [[labelPropagationRounds]] — exposed so modularity (and any
    * other community STATISTIC) can reuse the identical deterministic
    * propagation instead of re-deriving its own. */
  def labelPropagationAssignments(edges: DataFrame,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1 && rounds <= 10, s"rounds in [1,10]: $rounds")
    val und = edges.select(col("src"), col("dst"))
    val adj = und
      .unionAll(und.select(col("dst").as("src"), col("src").as("dst")))
      .toDF("node", "nbr").localCheckpoint()
    var labels = adj.select(col("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window.partitionBy("node")
      .orderBy(col("cnt").desc, col("label").asc)
    for (_ <- 1 to rounds) {
      labels = adj
        .join(labels.select(col("node").as("nbr"), col("label")), "nbr")
        .groupBy("node", "label").agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select("node", "label")
        .localCheckpoint()
    }
    labels
  }

  def labelPropagationRounds(edges: DataFrame, rounds: Int = 3): DataFrame =
    labelPropagationAssignments(edges, rounds)
      .groupBy("label").agg(count(lit(1)).as("n_members"))

  /** Newman–Girvan modularity of the [[labelPropagationAssignments]]
    * partition: Q = Σ_c [e_c/m − (d_c/2m)²] — the ONE number that says
    * whether the detected communities beat a degree-preserving random
    * graph (Q ≈ 0 ⇒ the partition is noise; the communities query
    * without this statistic is a list with no quality gate).
    *
    * Exactness: Q·4m² = Σ_c (4m·e_c − d_c²) — every term an exact
    * integer, summed in DECIMAL(38,0)/HUGEINT; one double division.
    * Shape: reuses the SAME propagation frame; e_c/d_c are one
    * edge⋈label join + one degree join, everything label-keyed. */
  def graphModularity(edges: DataFrame, rounds: Int = 3): DataFrame = {
    val und = edges.select(col("src"), col("dst")).localCheckpoint()
    val labels = labelPropagationAssignments(und, rounds)
    val deg = und.select(col("src").as("node"))
      .unionAll(und.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val mRow = und.agg(count(lit(1)).as("m"))
    val dc = labels.join(deg, "node")
      .groupBy("label").agg(sum("deg").as("d_c"))
    val ec = und
      .join(labels.select(col("node").as("src"), col("label").as("la")),
        "src")
      .join(labels.select(col("node").as("dst"), col("label").as("lb")),
        "dst")
      .filter(col("la") === col("lb"))
      .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_c"))
    dc.join(ec, Seq("label"), "left")
      .crossJoin(broadcast(mRow))
      .agg(count(lit(1)).as("n_communities"), max("m").as("n_edges"),
        sum(lit(4L).cast("decimal(38,0)") * col("m") *
          coalesce(col("e_c"), lit(0L)) -
          col("d_c").cast("decimal(38,0)") * col("d_c")).as("qnum"))
      .select(col("n_communities"), col("n_edges"),
        round(col("qnum").cast("double") /
          (lit(4.0) * col("n_edges").cast("double") *
            col("n_edges").cast("double")), 6).as("modularity"))
  }

  /** [[graphModularity]] over the term co-occurrence graph — the
    * quality gate for [[cooccurrenceCommunities]]. */
  def cooccurrenceModularity(docs: DataFrame): DataFrame =
    graphModularity(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")))

  /** [[labelPropagationRounds]] over the term co-occurrence graph:
    * topic-ish vocabulary communities, where [[cooccurrenceKCore]]
    * finds the dense core and connected components would fuse every
    * bridged topic into one blob. On the driver corpus the
    * support-thresholded graph IS one dense blob, so this reports a
    * single community — the separation behavior (barbell stays two
    * communities) is spec-gated on a planted fixture. */
  def cooccurrenceCommunities(docs: DataFrame): DataFrame =
    labelPropagationRounds(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")))

  /** Single-source WEIGHTED shortest paths by bounded Bellman-Ford
    * relaxation — the min-plus companion to [[bfsHops]]' unweighted
    * levels: round k's distance frame is min over all ≤k-hop paths,
    * computed as `min(dist, min_{u→v}(dist_u + w))` with one
    * dist⋈edge join and one groupBy-min per round (the Pregel
    * min-aggregation pattern; SSSP is its canonical example).
    *
    * Determinism with a DuckDB path-enumeration oracle: IEEE `+` is
    * monotone, so `min(a,b) + w = min(a+w, b+w)` EXACTLY — the
    * relaxation's nested mins equal the min over complete path sums,
    * and each path's sum is left-associated in both engines (the
    * accumulator order of the round loop here, of the recursive CTE
    * there). Distances are rounded only at output.
    *
    * Weights must be ≥ 0 (Bellman-Ford with bounded rounds reports
    * ≤maxRounds-hop optima either way, but negative weights would
    * make that a truncation, not an approximation guarantee —
    * refused loudly). */
  def ssspBellmanFord(edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 4): DataFrame = {
    val neg = edges.filter(col("w") < 0).limit(1).collect()
    require(neg.isEmpty,
      s"ssspBellmanFord: negative edge weight ${neg.headOption.map(_.get(2))}" +
        " — bounded relaxation only bounds HOPS, not correctness, under" +
        " negative weights")
    val e = edges.select(col("src"), col("dst"), col("w").cast("double"))
      .localCheckpoint()
    var dist = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0.0)).localCheckpoint()
    for (_ <- 1 to maxRounds) {
      val relaxed = e
        .join(broadcast(dist.withColumnRenamed("node", "src")), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionAll(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(eager = false)
    }
    dist
  }

  /** Most-probable event paths: shortest paths under w = −ln p over
    * the first-order transition graph, seeded at the alphabetically
    * first event type. Since −ln is monotone-decreasing and
    * Σ −ln p = −ln Π p, the min-plus optimum IS the maximum-
    * probability path (the Viterbi objective on the Markov chain) —
    * `neg_log_prob` is −ln of the best ≤maxRounds-step path
    * probability from the seed to each reachable type. Transition
    * probabilities are the exact n_steps/n_from doubles (unrounded —
    * the oracle mirrors the same two exact casts and one division);
    * ln of identical doubles is identical (the unigram_kl contract).
    */
  def likelyEventPaths(events: DataFrame, maxRounds: Int = 4): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val steps = events
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst").agg(count(lit(1)).as("n_steps"))
    val totals = steps.groupBy("src").agg(sum(col("n_steps")).as("n_from"))
    val edges = steps.join(totals, "src")
      .select(col("src"), col("dst"),
        (-log(col("n_steps").cast("double") / col("n_from").cast("double")))
          .as("w"))
      .localCheckpoint() // seeds scan + every relaxation round
    val seed = edges.select(col("src").as("node"))
      .unionAll(edges.select(col("dst").as("node")))
      .distinct().orderBy(col("node").asc).limit(1)
    ssspBellmanFord(edges, seed, maxRounds)
      .select(col("node").as("event_type"),
        round(col("dist"), 6).as("neg_log_prob"))
      .orderBy(col("event_type").asc)
  }

  /** PERSONALIZED PageRank — the seeded-restart variant of
    * [[pageRank]] (Jeh & Widom '03): teleport mass returns entirely to
    * `seed` instead of spreading uniformly, so ranks measure proximity
    * TO THE SEED through the edge structure — "which states funnel
    * into purchase", the recommendation/attribution reading a global
    * rank can't give. Same Pregel-style join loop, same per-round
    * lineage truncation, same dangling refusal (inherited via the
    * shared probs construction); the only change is the restart
    * vector. Fixed `iters` unroll keeps it oracle-gated (the
    * [[pageRank]] precedent). */
  def personalizedPageRank(edges: DataFrame, seed: String,
      iters: Int = 5, damping: Double = 0.85): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val dangling = nodes
      .join(edges.select(col("src").as("node")).distinct(),
        Seq("node"), "left_anti")
      .limit(1).collect()
    require(dangling.isEmpty,
      s"personalizedPageRank: dangling node " +
        s"'${dangling.headOption.map(_.get(0))}' has no out-edges")
    val seedPresent = nodes.filter(col("node") === seed).limit(1).collect()
    require(seedPresent.nonEmpty,
      s"personalizedPageRank: seed '$seed' not in the graph")
    val wOut = Window.partitionBy("src")
    val probs = edges.select(col("src"), col("dst"),
        (col("weight").cast("double") /
          sum(col("weight").cast("double")).over(wOut)).as("p"))
      .localCheckpoint()
    val restart = 1.0 - damping
    var ranks = nodes.withColumn("rank",
      when(col("node") === seed, lit(1.0)).otherwise(lit(0.0)))
    for (_ <- 1 to iters) {
      val contribs = probs
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(col("p") * col("rank")).as("inflow"))
      ranks = nodes
        .join(contribs, Seq("node"), "left")
        .select(col("node"),
          (when(col("node") === seed, lit(restart)).otherwise(lit(0.0)) +
            lit(damping) * coalesce(col("inflow"), lit(0.0))).as("rank"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("node"), round(col("rank"), 6).as("ppr"))
  }

  /** [[personalizedPageRank]] over the event-type transition graph,
    * seeded at 'purchase': proximity of every state to conversion. */
  def eventTypePpr(events: DataFrame, seed: String = "purchase",
      iters: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val edges = events
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("weight"))
    personalizedPageRank(edges, seed, iters)
      .select(col("node").as("event_type"), col("ppr"))
      .orderBy(col("event_type").asc)
  }

  def eventTypePageRank(events: DataFrame, iters: Int = 5): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val edges = events
      .select(col("event_type").as("src"),
        lead(col("event_type"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
      .groupBy("src", "dst")
      .agg(count(lit(1)).as("weight"))
    pageRank(edges, iters)
      .select(col("node").as("event_type"), col("pagerank"))
      .orderBy(col("event_type").asc)
  }

  /** HITS hubs/authorities (Kleinberg '99) on the user↔event-type
    * incidence bipartite — the mutual-reinforcement ranking beside
    * [[eventTypePageRank]]'s flow ranking: an event type is
    * authoritative when broad-ranging users touch it, a user is a hub
    * when they touch authoritative types. UNWEIGHTED incidence
    * (user touched type — the distinct collapse), so every iterate
    * stays an exact BIGINT: from uniform a₀ = 1, three unrolled
    * authority iterates a₁ a₂ a₃ are pure integer matrix-vector
    * products (aₖ = Bᵀ·B·aₖ₋₁ unnormalized — HITS normalization only
    * rescales, so the emitted ratio a₃/Σa₃ IS the normalized score,
    * one division of two exactly-representable doubles). BIGINT
    * headroom: iterates grow ≤ ×(users·types) per round — past ~10⁹
    * users switch the accumulators to DECIMAL(38,0) (stated, not
    * silent; Spark overflows loudly under ANSI).
    *
    * Shape: ONE distinct collapse of the log to the ≤ users·|types|
    * incidence frame; the six iterate joins/aggs all run on that
    * frame keyed alternately by user and by the |types|-row
    * (broadcast) authority vector. */
  def hitsUserType(events: DataFrame): DataFrame = {
    val inc = events.select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint()
    def auth(h: DataFrame, hCol: String): DataFrame =
      inc.join(h, "user_id")
        .groupBy("event_type").agg(sum(col(hCol)).as("a"))
    def hub(a: DataFrame, name: String): DataFrame =
      inc.join(broadcast(a), "event_type")
        .groupBy("user_id").agg(sum(col("a")).as(name))
    val h1 = inc.groupBy("user_id").agg(count(lit(1)).as("h1"))
    val a1 = auth(h1, "h1").withColumnRenamed("a", "a1").localCheckpoint()
    val h2 = hub(a1.select(col("event_type"), col("a1").as("a")), "h2")
    val a2 = auth(h2, "h2").withColumnRenamed("a", "a2").localCheckpoint()
    val h3 = hub(a2.select(col("event_type"), col("a2").as("a")), "h3")
    val a3 = auth(h3, "h3").withColumnRenamed("a", "a3").localCheckpoint()
    val tot = a3.agg(sum("a3").as("t3"))
    a1.join(a2, "event_type").join(a3, "event_type")
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("a1"), col("a2"), col("a3"),
        round(col("a3").cast("double") / col("t3").cast("double"), 6)
          .as("authority"))
  }

  /** Link prediction over an undirected graph: for every non-adjacent
    * pair (u,v) sharing ≥ `minCommon` neighbors, the three classic
    * neighborhood scores (Liben-Nowell & Kleinberg CIKM '03):
    * common-neighbor count, Adamic–Adar Σ_w 1/ln(deg w), and
    * resource allocation Σ_w 1/deg(w). The feature layer behind
    * "related terms/users" suggestions and graph-completion training
    * labels.
    *
    * Determinism: both weighted sums accumulate as exact BIGINT
    * micro-units — each neighbor contributes round(10⁶/ln deg) resp.
    * round(10⁶/deg) (a single rounding of an identical double on both
    * engines, the [[graft.ops.Num]] micro-unit convention) — so the
    * SUM is order-independent and the final /10⁶ division exact-input
    * deterministic. deg(w) ≥ 2 for any wedge center, so ln(deg) > 0.
    *
    * Scale: candidate pairs come from wedge enumeration grouped at
    * the CENTER — Σ_w deg(w)² pairs. `maxDeg` is the explicit skew
    * knob (same role as minhash's maxBucket): hub centers above it
    * are excluded from wedge formation, bounding per-center fan-out
    * at maxDeg² while losing only the near-zero-weight contributions
    * (1/ln deg vanishes exactly where the cap bites). The anti-join
    * against the edge set runs AFTER aggregation, on the collapsed
    * candidate frame. */
  def linkPredictionScores(edges: DataFrame, maxDeg: Long = 200,
      minCommon: Long = 2): DataFrame = {
    // und feeds degree counting, wedge adjacency, and the final
    // anti-join — materialize once (upstream may be a mining pipeline).
    val und = edges.select(col("src"), col("dst")).localCheckpoint()
    val e = und.unionAll(und.select(col("dst"), col("src")))
      .toDF("src", "dst")
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    val ec = e.join(deg.filter(col("deg") <= maxDeg)
        .withColumnRenamed("node", "src"), "src")
    val cand = ec.as("a")
      .join(ec.as("b"),
        col("a.src") === col("b.src") && col("a.dst") < col("b.dst"))
      .groupBy(col("a.dst").as("u"), col("b.dst").as("v"))
      .agg(count(lit(1)).as("common_neighbors"),
        sum(round(lit(1000000.0) / log(col("a.deg").cast("double")), 0)
          .cast("long")).as("aa_micro"),
        sum(round(lit(1000000.0) / col("a.deg").cast("double"), 0)
          .cast("long")).as("ra_micro"))
      .filter(col("common_neighbors") >= minCommon)
    cand
      .join(und.select(col("src").as("u"), col("dst").as("v")),
        Seq("u", "v"), "left_anti")
      .select(col("u").as("node_u"), col("v").as("node_v"),
        col("common_neighbors"),
        round(col("aa_micro").cast("double") / 1000000.0, 6)
          .as("adamic_adar"),
        round(col("ra_micro").cast("double") / 1000000.0, 6)
          .as("resource_alloc"))
  }

  /** [[linkPredictionScores]] over the MUTUAL top-`k`-by-lift
    * sparsification of the term co-occurrence graph: each term keeps
    * its k strongest partners (lift desc, then n_pair desc, then term
    * asc — lift is already 6dp-pinned, so the order is engine-stable),
    * and an edge survives only if BOTH endpoints keep it. The raw
    * co-occurrence graph of a homogeneous corpus is near-complete
    * (every frequent pair co-occurs somewhere), which leaves link
    * prediction nothing to predict; mutual-kNN is the standard graph
    * construction that keeps only above-independence affinity.
    *
    * Scale: the sparsifier CAPS degree at k by construction, so the
    * downstream wedge join is ≤ |V|·k² — no hub skew exists to cap,
    * and the per-term top-k is one partition-local window over the
    * already-thresholded pair set. */
  /** Degree assortativity (Newman '02): the Pearson correlation of
    * endpoint degrees over all edges — do hubs attach to hubs
    * (r → 1, social nets) or to leaves (r → −1, tech/biological
    * nets)? One scalar that tells you whether the graph's heavy keys
    * CLUSTER (a salting/partitioning concern for every graph op in
    * this module) or spread out.
    *
    * With each edge counted in both directions the symmetric Pearson
    * collapses to r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²) — every sum
    * an exact BIGINT over the directed endpoint-degree pairs, one
    * double division at the end (NULL when the variance is 0, e.g. a
    * regular graph). BIGINT headroom: Σx² ≤ n·D², overflowing only
    * past n·D² ≈ 9e18 — cap degrees upstream (the linkPrediction
    * maxDeg knob) long before that.
    *
    * Shape: degree collapse + two node-keyed joins of the edge list
    * against the (node-cardinality) degree frame → 1-row aggregate;
    * the checkpoint stops the expensive upstream edge miner from
    * running once per consumer. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").as("u"), col("dst").as("v"))
      .unionAll(edges.select(col("dst").as("u"), col("src").as("v")))
      .localCheckpoint()
    val deg = e.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
    val dp = e
      .join(deg.select(col("node").as("u"), col("deg").as("x")), "u")
      .join(deg.select(col("node").as("v"), col("deg").as("y")), "v")
    val s = dp.agg(count(lit(1)).as("n"), sum("x").as("sx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val num = col("n") * col("sxy") - col("sx") * col("sx")
    s.crossJoin(broadcast(nodes))
      .select((col("n") / lit(2)).cast("long").as("n_edges"),
        col("n_nodes"),
        when(den > 0L,
          round(num.cast("double") / den.cast("double"), 6))
          .as("assortativity"))
  }

  /** [[degreeAssortativity]] over the term co-occurrence graph: is
    * the topical vocabulary core-periphery (hub terms bonded to rare
    * specialists, r < 0) or stratified (r > 0)? */
  def cooccurrenceAssortativity(docs: DataFrame): DataFrame =
    degreeAssortativity(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")))

  def cooccurrenceLinkPrediction(docs: DataFrame, k: Int = 5): DataFrame = {
    val co = MiningOps.termCooccurrence(docs)
    val directed = co.select(col("term_a").as("src"), col("term_b").as("dst"),
        col("lift"), col("n_pair"))
      .unionAll(co.select(col("term_b"), col("term_a"),
        col("lift"), col("n_pair")))
      .toDF("src", "dst", "lift", "n_pair")
    val w = Window.partitionBy("src")
      .orderBy(col("lift").desc, col("n_pair").desc, col("dst").asc)
    val top = directed.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k).select("src", "dst")
    val mutual = top.as("x")
      .join(top.as("y"),
        col("y.src") === col("x.dst") && col("y.dst") === col("x.src"))
      .filter(col("x.src") < col("x.dst"))
      .select(col("x.src").as("src"), col("x.dst").as("dst"))
    linkPredictionScores(mutual)
  }

  /** k-truss of an undirected graph (Cohen '08): the maximal subgraph
    * whose EVERY edge sits in ≥ k−2 triangles — the edge-grained
    * cohesion notion between [[triangleCounts]]' node counts and
    * [[kCore]]'s degree peel (a k-core can be a star; a k-truss
    * cannot — every surviving edge is embedded in triangles).
    * Synchronous peel: per round, recompute each edge's triangle
    * support within the SURVIVING subgraph and drop edges below
    * k−2; fixed `rounds`, then a convergence check (the kCore
    * discipline — emitting an unconverged superset would mislabel).
    *
    * Triangles enumerate via the ordered (a<b<c) closure join — each
    * triangle once, each of its three edges credited once; the
    * degree-ordered orientation ([[triangleCounts]]) is the skew
    * path for corpus-free graphs, while this per-round form stays on
    * the vocabulary-bounded term graph. Output: surviving edges with
    * their in-truss support, (src, dst) ordered. */
  def kTruss(edges: DataFrame, k: Int = 4, rounds: Int = 6): DataFrame = {
    require(k >= 3, s"kTruss: k must be >= 3, got $k")
    def norm(e: DataFrame): DataFrame = e
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
    def support(e: DataFrame): DataFrame = {
      val tri = e.as("x")
        .join(e.as("y"), col("y.src") === col("x.dst"))
        .join(e.as("z"), col("z.src") === col("x.src") &&
          col("z.dst") === col("y.dst"))
        .select(col("x.src").as("a"), col("x.dst").as("b"),
          col("y.dst").as("c"))
      tri.select(col("a").as("src"), col("b").as("dst"))
        .unionAll(tri.select(col("b").as("src"), col("c").as("dst")))
        .unionAll(tri.select(col("a").as("src"), col("c").as("dst")))
        .groupBy("src", "dst").agg(count(lit(1)).as("support"))
    }
    def peel(e: DataFrame): DataFrame = e
      .join(support(e), Seq("src", "dst"))
      .filter(col("support") >= (k - 2).toLong)
    var e = norm(edges).localCheckpoint()
    for (_ <- 1 to rounds) {
      e = peel(e).select("src", "dst").localCheckpoint()
    }
    val last = peel(e).localCheckpoint()
    val stable = last.count()
    require(stable == e.count(),
      s"kTruss(k=$k): not converged after $rounds peels — raise " +
        "`rounds`; an unconverged superset would mislabel edges")
    last.orderBy(col("src").asc, col("dst").asc)
  }

  /** [[kTruss]] over the term co-occurrence graph: the triangle-woven
    * topical skeleton — term pairs whose relationship survives even
    * when every loosely-supported association is peeled away. */
  def cooccurrenceKTruss(docs: DataFrame, k: Int = 4): DataFrame =
    kTruss(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")), k)

  /** TextRank keyterms (Mihalcea & Tarau '04): PageRank over the
    * ±window token co-occurrence graph, top-k terms — the
    * graph-centrality keyphrase extractor beside RAKE's
    * degree/frequency heuristic ([[graft.ops.DocOps.rakeKeyphrases]])
    * and the df-based [[graft.ops.DocOps.tfidfTopTerms]]: a term
    * ranks high when it co-occurs with terms that themselves rank
    * high, which surfaces connective topical vocabulary raw counts
    * miss.
    *
    * Determinism — the INTEGER-LANE PageRank: ranks live in exact
    * pico-units (10¹²); each edge's contribution
    * round(w·pr(src)/outw(src)) is ONE pinned division, so the inflow
    * sums are exact BIGINT adds in any order (the event_pagerank
    * form sums fp doubles, fine for 5 nodes; a term graph has
    * thousands of in-edges, so this variant re-pins per edge).
    * Teleport and damping re-pin per round. `iters` fixed rounds,
    * ties (pr DESC, term ASC).
    *
    * Shape: per round one edge⋈rank equi-join + one dst hash agg
    * (the Pregel shape); ranks localCheckpoint per round; the final
    * cut is TakeOrderedAndProject. */
  def textRankTerms(docs: DataFrame, window: Int = 2,
      minCount: Long = 5L, iters: Int = 5, k: Int = 20): DataFrame = {
    val pairs = DocOps.windowPairCounts(docs, window, minCount)
    val edges = pairs.select(col("wa").as("src"), col("wb").as("dst"),
        col("n_pair").as("w"))
      .unionAll(pairs.select(col("wb").as("src"), col("wa").as("dst"),
        col("n_pair").as("w")))
      .localCheckpoint() // outw + every iteration's join side
    val outw = edges.groupBy(col("src")).agg(sum("w").as("outw"))
    val nodes = edges.select(col("src").as("node")).distinct()
      .localCheckpoint()
    val n = nodes.agg(count(lit(1)).as("n"))
    val pico = 1000000000000L
    var pr = nodes.crossJoin(broadcast(n))
      .select(col("node"),
        round(lit(pico.toDouble) / col("n").cast("double"), 0)
          .cast("long").as("prp"))
      .localCheckpoint()
    val ew = edges.join(outw, "src")
    for (_ <- 1 to iters) {
      val inflow = ew
        .join(pr.select(col("node").as("src"), col("prp")), "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(round(col("w").cast("double") * col("prp").cast("double") /
          col("outw").cast("double"), 0).cast("long")).as("inflow"))
      pr = nodes.crossJoin(broadcast(n))
        .join(inflow, Seq("node"), "left")
        .select(col("node"),
          (round(lit(0.15 * pico) / col("n").cast("double"), 0)
            .cast("long") +
            round(lit(0.85) * coalesce(col("inflow"), lit(0L))
              .cast("double"), 0).cast("long")).as("prp"))
        .localCheckpoint()
    }
    pr.select(col("node").as("term"),
        round(col("prp").cast("double") / lit(pico.toDouble), 6)
          .as("textrank"))
      .orderBy(col("textrank").desc, col("term").asc)
      .limit(k)
  }

  /** Rich-club coefficient φ(k) at a ladder of degree thresholds
    * (Zhou & Mondragón '04): among the N_k nodes of degree > k, the
    * realized edge density 2E_k/(N_k(N_k−1)) — does the graph's elite
    * wire to itself (φ grows with k: a rich club) or only to the
    * periphery (φ flat/falling)? The missing summary between
    * [[degreeAssortativity]]'s one global correlation and
    * [[kCore]]'s membership list.
    *
    * `edges` is an undirected deduplicated (src < dst) list.
    * Determinism: degrees, N_k and E_k are exact BIGINTs; φ clears to
    * ONE pinned division of 2·E_k over N_k(N_k−1); N_k < 2 → NULL φ,
    * stated.
    *
    * Shape: one degree collapse + ONE edge-keyed join annotating each
    * edge with min(deg_a, deg_b); every threshold is then a
    * conditional aggregate over that single frame — |thresholds|
    * never multiplies the join work. */
  def richClub(edges: DataFrame,
      thresholds: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    val und = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = und.select(col("src").as("node"))
      .unionAll(und.select(col("dst").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val dmin = und
      .join(deg.select(col("node").as("src"), col("deg").as("da")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("db")), "dst")
      .select(least(col("da"), col("db")).as("dmin"))
    val eAggs = thresholds.map(k =>
      sum(when(col("dmin") > k.toLong, 1L).otherwise(0L)).as(s"e$k"))
    val nAggs = thresholds.map(k =>
      sum(when(col("deg") > k.toLong, 1L).otherwise(0L)).as(s"n$k"))
    val es = dmin.agg(eAggs.head, eAggs.tail: _*)
    val ns = deg.agg(nAggs.head, nAggs.tail: _*)
    val dec = (c: Column) => c.cast("decimal(38,0)")
    val rows = thresholds.map { k =>
      es.crossJoin(ns).select(lit(k.toLong).as("k"),
        col(s"n$k").as("n_nodes"), col(s"e$k").as("n_edges"),
        when(col(s"n$k") >= 2L,
          round((dec(col(s"e$k")) * lit(2)).cast("double") /
            (dec(col(s"n$k")) * (col(s"n$k") - lit(1L))).cast("double"),
            6)).as("phi"))
    }
    rows.reduce(_ unionByName _)
  }

  /** [[richClub]] over the term co-occurrence graph: do the corpus's
    * best-connected terms co-occur with EACH OTHER (a topical core
    * vocabulary) or only fan out to specialists? */
  def cooccurrenceRichClub(docs: DataFrame): DataFrame =
    richClub(MiningOps.termCooccurrence(docs)
      .select(col("term_a").as("src"), col("term_b").as("dst")))
}
