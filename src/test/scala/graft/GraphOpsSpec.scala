package graft

import graft.ops.GraphOps

/** PageRank contract: matches a naive in-memory power iteration on a
  * fixture, conserves rank mass (no dangling leak by construction),
  * and refuses dangling graphs loudly instead of silently leaking.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val fixture = Seq(
    // a -> b (2), a -> c (1), b -> c (3), c -> a (1): strongly
    // connected, asymmetric weights.
    ("a", "b", 2L), ("a", "c", 1L), ("b", "c", 3L), ("c", "a", 1L))

  /** Naive reference: dense power iteration, same update rule. */
  private def naive(edges: Seq[(String, String, Long)], iters: Int,
      d: Double): Map[String, Double] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val n = nodes.size
    val outW = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val inflow = nodes.map { v =>
        v -> edges.filter(_._2 == v)
          .map { case (u, _, w) => (w.toDouble / outW(u)) * rank(u) }.sum
      }.toMap
      rank = nodes.map(v => v -> ((1.0 - d) / n + d * inflow(v))).toMap
    }
    rank
  }

  test("triangleCounts: K4 + pendant star, orientation counts each once") {
    // K4 on {a,b,c,d}: 4 triangles, every node in exactly 3. A high-
    // degree star center s (the "celebrity" the orientation exists
    // for) attached to leaves closes NO triangle; the chain x-y-z
    // likewise. Edges are src < dst, distinct — the operator contract.
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d")
    val star = (0 until 6).map(i => s"l$i" -> "s")
      .map { case (l, s) => if (l < s) (l, s) else (s, l) }
    val chain = Seq("x" -> "y", "y" -> "z")
    val edges = (k4 ++ star ++ chain).toDF("src", "dst")
    val got = GraphOps.triangleCounts(edges)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L),
      got.toString)
    // naive string-ordered closure agrees on total count: Σ per-node
    // participations = 3 × #triangles
    val e = (k4 ++ star ++ chain).toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val naive = (for {
      x <- vs; y <- vs if x < y && e((x, y))
      z <- vs if y < z && e((y, z)) && e((x, z))
    } yield 1).size
    assert(got.values.sum == 3L * naive, s"${got.values.sum} vs 3*$naive")
  }

  test("clusteringCoefficients: clique 1.0, bridges 0, deg<2 excluded") {
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", // triangle
      "c" -> "d", "d" -> "e",                           // path off it
      "f" -> "g")                                       // isolated edge
      .toDF("src", "dst")
    val got = GraphOps.clusteringCoefficients(edges)
      .collect().map(r => r.getAs[String]("node") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("n_triangles"),
          r.getAs[Double]("clustering_coef")))).toMap
    assert(got("a") == ((2L, 1L, 1.0)), got.toString)
    assert(got("b") == ((2L, 1L, 1.0)))
    // c: deg 3, 1 triangle of 3 possible neighbor pairs
    assert(got("c") == ((3L, 1L, 0.333333)))
    assert(got("d") == ((2L, 0L, 0.0)), "bridge node must report 0")
    // e, f, g have degree 1 — no defined coefficient
    assert(!got.contains("e") && !got.contains("f") && !got.contains("g"))
  }

  test("pageRank matches naive power iteration on the fixture") {
    val edges = fixture.toDF("src", "dst", "weight")
    val got = GraphOps.pageRank(edges, iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = naive(fixture, iters = 5, d = 0.85)
    assert(got.keySet == want.keySet)
    for ((node, w) <- want)
      assert(math.abs(got(node) - w) < 1e-6, s"$node: ${got(node)} vs $w")
  }

  test("rank mass is conserved (sums to 1)") {
    val edges = fixture.toDF("src", "dst", "weight")
    val total = GraphOps.pageRank(edges, iters = 5)
      .agg(org.apache.spark.sql.functions.sum("pagerank")).head.getDouble(0)
    assert(math.abs(total - 1.0) < 1e-5, s"mass leaked: $total")
  }

  test("dangling nodes are refused loudly") {
    // d has no out-edges: its rank mass would silently leak.
    val edges = (fixture :+ ("a", "d", 1L)).toDF("src", "dst", "weight")
    val e = intercept[IllegalArgumentException] {
      GraphOps.pageRank(edges, iters = 2).collect()
    }
    assert(e.getMessage.contains("dangling"), e.getMessage)
  }

  test("eventTypePageRank over real events: rows, mass, determinism") {
    val events = Tables.events(spark, sf0)
    val out = GraphOps.eventTypePageRank(events).collect()
    assert(out.nonEmpty)
    val total = out.map(_.getDouble(1)).sum
    assert(math.abs(total - 1.0) < 1e-4, s"mass: $total")
    val again = GraphOps.eventTypePageRank(events).collect()
    assert(out.toSeq == again.toSeq, "non-deterministic ranks")
  }

  test("bfsHops: levels, multi-source min, maxHops bound, unreachable absent") {
    // a-b-c-d-e chain, plus branch b-x; island p-q is unreachable.
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "e",
      "b" -> "x", "p" -> "q").toDF("src", "dst")
    val seed = Seq("a").toDF("node")
    val got = GraphOps.bfsHops(edges, seed, maxHops = 3)
      .as[(String, Int)].collect().toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 2, "x" -> 2, "d" -> 3))
    // e is 4 hops (beyond bound); p, q disconnected — all absent.

    // Multi-source: hop is the MIN over seeds, and edges traverse in
    // both directions (seed e reaches d at 1 even though the edge is
    // d->e).
    val multi = GraphOps.bfsHops(edges, Seq("a", "e").toDF("node"), 2)
      .as[(String, Int)].collect().toMap
    assert(multi("d") == 1 && multi("c") == 2 && multi("b") == 1)
  }

  test("ssspBellmanFord: weighted optimum beats fewer-hop path; " +
      "negative weights refused") {
    // a→b (5.0) vs a→c (1.0), c→b (1.0): the 2-hop route wins (2.0).
    // d is unreachable within bounds → absent.
    val edges = Seq(("a", "b", 5.0), ("a", "c", 1.0), ("c", "b", 1.0),
      ("x", "d", 1.0)).toDF("src", "dst", "w")
    val got = GraphOps.ssspBellmanFord(edges, Seq("a").toDF("node"), 3)
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 0.0, "c" -> 1.0, "b" -> 2.0))
    val e = intercept[IllegalArgumentException] {
      GraphOps.ssspBellmanFord(
        Seq(("a", "b", -1.0)).toDF("src", "dst", "w"),
        Seq("a").toDF("node"))
    }
    assert(e.getMessage.contains("negative edge weight"))
  }

  test("likelyEventPaths: −ln Π p along the best path, seed at 0") {
    def t(s: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:00:$s%02d")
    // user paths A→B→C and A→B (twice A→B, once B→C, once B→A):
    // p(A→B)=1, p(B→C)=p(B→A)=0.5. Seed = min type = A (dist 0);
    // B = −ln 1 = 0; C = −ln 1 + −ln 0.5 = ln 2.
    val events = Seq(
      (1L, t(1), 1L, "A"), (2L, t(2), 1L, "B"), (3L, t(3), 1L, "C"),
      (4L, t(10), 2L, "A"), (5L, t(11), 2L, "B"), (6L, t(12), 2L, "A")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val got = GraphOps.likelyEventPaths(events)
      .as[(String, Double)].collect().toMap
    assert(got("A") == 0.0 && got("B") == 0.0)
    assert(math.abs(got("C") - math.rint(math.log(2.0) * 1e6) / 1e6) < 1e-9,
      got.toString)
  }

  test("kCore: K4 survives, high-degree star center peels; " +
      "unconverged rounds refuse") {
    // K4 {a,b,c,d} is the 3-core. Star center s has degree 4 — HIGHER
    // than any K4 node — but its leaves peel in round 1 and s follows
    // in round 2: k-core is about mutual density, not degree.
    val edges = (Seq("a" -> "b", "a" -> "c", "a" -> "d",
      "b" -> "c", "b" -> "d", "c" -> "d") ++
      Seq("s" -> "l1", "s" -> "l2", "s" -> "l3", "s" -> "l4"))
      .toDF("src", "dst")
    val got = GraphOps.kCore(edges, k = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), got.toString)
    // rounds=1 leaves s in the set (its leaves only just peeled) —
    // must refuse rather than mislabel s as core
    val e = intercept[IllegalArgumentException] {
      GraphOps.kCore(edges, k = 3, rounds = 1)
    }
    assert(e.getMessage.contains("not converged"), e.getMessage)
  }

  test("closenessCentrality: path graph P4 hand values; refuses a " +
      "hop cap below the diameter") {
    // a-b-c-d: distances from a = (1,2,3) -> closeness 3/6, harmonic
    // 1 + .5 + 1/3, ecc 3; from b = (1,1,2) -> 3/4, 2.5, 2.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = GraphOps.closenessCentrality(edges).collect()
      .map(r => r.getAs[String]("term") ->
        ((r.getAs[Long]("n_reachable"), r.getAs[Long]("eccentricity"),
          r.getAs[Double]("closeness"), r.getAs[Double]("harmonic"))))
      .toMap
    val third = math.rint(1.0 / 3.0 * 1e10) / 1e10
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got("a") == ((3L, 3L, 0.5, r6(1.0 + 0.5 + third))), got)
    assert(got("b") == ((3L, 2L, 0.75, 2.5)), got)
    assert(got("c") == ((3L, 2L, 0.75, 2.5)), got)
    assert(got("d") == ((3L, 3L, 0.5, r6(1.0 + 0.5 + third))), got)
    // diameter 3 > maxHops 2 must refuse, not silently cap ecc
    intercept[IllegalArgumentException] {
      GraphOps.closenessCentrality(edges, maxHops = 2).collect()
    }
  }

  test("cooccurrenceKCore: members keep >= k partners, subset of graph") {
    val docs = Tables.documents(spark, sf0)
    val out = GraphOps.cooccurrenceKCore(docs).as[(String, Long)].collect()
    assert(out.nonEmpty, "expected a non-trivial 3-core at sf0.001")
    assert(out.forall(_._2 >= 3L), out.mkString(","))
  }

  test("hitsUserType: exact integer authority iterates on a planted bipartite") {
    import java.sql.Timestamp
    // incidence (1,a) (2,a) (2,b) (3,b) (4,a) — duplicates must
    // collapse. h1 = (1,2,1,1); a1 = (a:4, b:3); h2 = (4,7,3,4);
    // a2 = (a:15, b:10); h3 = (15,25,10,15); a3 = (a:55, b:35),
    // Σ = 90 → authority a = 55/90, b = 35/90.
    def e(id: Long, u: Long, t: String) =
      (id, Timestamp.valueOf("2024-03-01 10:00:00"), u, t, 1.0, "{}")
    val events = Seq(
      e(1, 1, "a"), e(2, 1, "a"), // duplicate incidence: one edge
      e(3, 2, "a"), e(4, 2, "b"), e(5, 3, "b"), e(6, 4, "a"),
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = GraphOps.hitsUserType(events).collect()
      .map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("a1"), r.getAs[Long]("a2"), r.getAs[Long]("a3"),
          r.getAs[Double]("authority")))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == Map(
      "a" -> ((4L, 15L, 55L, r6(55.0 / 90.0))),
      "b" -> ((3L, 10L, 35L, r6(35.0 / 90.0)))), got.toString)
  }

  test("cooccurrenceBfsHops: seed at hop 0, levels contiguous from 0") {
    val docs = Tables.documents(spark, sf0)
    val out = GraphOps.cooccurrenceBfsHops(docs).as[(String, Int)].collect()
    assert(out.nonEmpty)
    val levels = out.map(_._2).distinct.sorted.toVector
    assert(levels.head == 0 && out.count(_._2 == 0) == 1,
      "exactly one seed at hop 0")
    // BFS levels have no gaps: a node at hop h implies a neighbor at
    // h-1, so the distinct levels are 0..max.
    assert(levels == (0 to levels.max).toVector, s"gapped levels: $levels")
  }

  test("linkPredictionScores: K4-minus-edge scores the missing edge, " +
    "adjacent pairs anti-joined, maxDeg knob silences hub centers") {
    // K4 on {a,b,c,d} minus edge a-d. Non-adjacent pair (a,d) has
    // common neighbors b and c, both of degree 3:
    //   AA = 2·round(1e6/ln 3)/1e6, RA = 2·round(1e6/3)/1e6 = 0.666666.
    // (b,c) also shares two neighbors but IS an edge — must not appear.
    val edges = Seq("a" -> "b", "a" -> "c", "b" -> "c", "b" -> "d",
      "c" -> "d").toDF("src", "dst")
    val got = GraphOps.linkPredictionScores(edges).collect()
      .map(r => (r.getAs[String]("node_u"), r.getAs[String]("node_v")) ->
        ((r.getAs[Long]("common_neighbors"), r.getAs[Double]("adamic_adar"),
          r.getAs[Double]("resource_alloc")))).toMap
    val aa = 2.0 * math.rint(1e6 / math.log(3.0)) / 1e6
    assert(got == Map(("a", "d") -> ((2L, aa, 0.666666))), got.toString)
    // capping degree below the wedge centers' degree leaves no wedges
    assert(GraphOps.linkPredictionScores(edges, maxDeg = 2).isEmpty)
  }

  test("graphModularity: two disjoint triangles score exactly 0.5") {
    // LPA converges each triangle to its min label; e_c = 3, d_c = 6,
    // m = 6 -> Q = 2·(3/6 − (6/12)²) = 0.5
    val edges = Seq("a" -> "b", "b" -> "c", "a" -> "c",
      "d" -> "e", "e" -> "f", "d" -> "f").toDF("src", "dst")
    val r = GraphOps.graphModularity(edges).collect().head
    assert((r.getAs[Long]("n_communities"), r.getAs[Long]("n_edges"),
      r.getAs[Double]("modularity")) == ((2L, 6L, 0.5)), r)
  }

  test("degreeAssortativity: star is exactly -1, regular graph NULL") {
    // K1,3 star: directed endpoint-degree pairs (3,1)×3 and (1,3)×3
    // -> r = (6·18 − 12²)/(6·30 − 12²) = −36/36 = −1
    val star = Seq("c" -> "l1", "c" -> "l2", "c" -> "l3").toDF("src", "dst")
    val r = GraphOps.degreeAssortativity(star).collect().head
    assert((r.getAs[Long]("n_edges"), r.getAs[Long]("n_nodes"),
      r.getAs[Double]("assortativity")) == ((3L, 4L, -1.0)), r)
    // a triangle is 2-regular: zero degree variance -> NULL r, not 0/0
    val tri = Seq("a" -> "b", "b" -> "c", "a" -> "c").toDF("src", "dst")
    val t = GraphOps.degreeAssortativity(tri).collect().head
    assert(t.isNullAt(t.fieldIndex("assortativity")), t)
  }
}
