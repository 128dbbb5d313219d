package graft.llm

import graft.SparkSpec

class GraphOpsSpec extends SparkSpec {

  import spark.implicits._

  test("pagerank: a symmetric 2-node graph sits at its exact integer fixed point") {
    // N=2, scale=1e12: r0 = 5e11; each node passes its whole rank across,
    // so r = (15e12 div 200) + (85*5e11 div 100) = 7.5e10 + 4.25e11 = 5e11
    // — the chain never moves. Hand-checkable bit-exactness.
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val got = GraphOps.pagerank(edges, iters = 5).drop("converged")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("pagerank: a directed star concentrates mass; source-only leaves keep teleport mass") {
    // leaves 1,2,3 -> center 9. N=4, r0 = 2.5e11, base = 15e12 div 400.
    // Leaves have no in-edges: rank = base = 3.75e10 every iteration
    // (the left-join-back path). Center at iter 1:
    // base + (85 * 3*2.5e11) div 100 = 3.75e10 + 6.375e11 = 6.75e11.
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L)).toDF("src", "dst")
    val one = GraphOps.pagerank(edges, iters = 1).drop("converged").as[(Long, Long)].collect().toMap
    assert(one(9L) == 675000000000L, s"center got ${one(9L)}")
    assert(Seq(1L, 2L, 3L).forall(one(_) == 37500000000L), s"leaves: $one")
    val five = GraphOps.pagerank(edges, iters = 5).drop("converged").as[(Long, Long)].collect().toMap
    assert(five(9L) > five(1L))
    assert(five(1L) == five(2L) && five(2L) == five(3L))
  }

  test("pagerank is deterministic across invocations on the near-dup graph") {
    val jac = Dedup.jaccardPairs(
      Dedup.shingleTable(graft.Td.table(spark, Sf0001, "documents"),
        "doc_id", "text", 3), 0.8)
    val edges = jac.selectExpr("d1 AS src", "d2 AS dst")
      .unionByName(jac.selectExpr("d2 AS src", "d1 AS dst"))
    def run() = GraphOps.pagerank(edges, iters = 5).drop("converged")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val a = run()
    assert(a.nonEmpty)
    assert(a == run())
  }

  test("triangleCount: K4, a path, and a shared-edge bowtie count exactly") {
    try {
      // K4 on 1..4: every node is a corner of C(3,2) = 3 triangles
      val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
        .toDF("a", "b")
      val k4c = GraphOps.triangleCount(k4).as[(Long, Long)].collect().toMap
      assert(k4c == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))

      // path 1-2-3-4: wedges but no closures
      val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
      val pc = GraphOps.triangleCount(path).as[(Long, Long)].collect().toMap
      assert(pc.values.forall(_ == 0L) && pc.size == 4)

      // two triangles sharing edge (2,3): nodes 2 and 3 are in both
      val bowtie = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
        .toDF("a", "b")
      val bc = GraphOps.triangleCount(bowtie).as[(Long, Long)].collect().toMap
      assert(bc == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 1L))
    } finally Caches.releaseAll(spark) // triangleCount persists its edge frame
  }

  test("degree orientation collapses hub wedge cardinality (and counts stay exact)") {
    import org.apache.spark.sql.functions._
    try {
      // hub fixture: star with the hub at a MID id (100), leaves split
      // below/above — the adversarial case for raw-id orientation, where
      // the hub keeps ~d/2 in-edges AND ~d/2 out-edges and contributes
      // ~d²/4 wedges alone. Plus two leaf triangles so counts are
      // non-trivial.
      val hub = 100L
      val leaves = ((1L to 99L) ++ (101L to 201L))
      val star = leaves.map(l => (math.min(l, hub), math.max(l, hub)))
      // two triangles: {1,2,hub} closes a star wedge; {300,301,302} sits
      // on fresh nodes so it cannot close through the hub
      val triExtra = Seq((1L, 2L), (300L, 301L), (300L, 302L), (301L, 302L))
      val pairs = (star ++ triExtra)
        .map { case (x, y) => (math.min(x, y), math.max(x, y)) }
        .distinct.toDF("a", "b")

      val got = GraphOps.triangleCount(pairs).as[(Long, Long)].collect().toMap
      assert(got(hub) == 1L && got(1L) == 1L && got(2L) == 1L)
      assert(got(300L) == 1L && got(301L) == 1L && got(302L) == 1L)
      assert(got.values.sum == 6L) // two triangles x three corners

      // cardinality assertion: raw-id path wedges (e1.b = e2.a) vs the
      // orientation's out-edge-pair wedges
      val e0 = pairs.select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
      val idWedges = e0.as("e1").join(e0.as("e2"), col("e1.b") === col("e2.a")).count()
      val or = GraphOps.orientByDegree(pairs)
      val degWedges = or.as("e1").join(or.as("e2"),
        col("e1.src") === col("e2.src") &&
          (col("e1.dd") < col("e2.dd") ||
            (col("e1.dd") === col("e2.dd") && col("e1.dst") < col("e2.dst")))).count()
      // id order: 99 low leaves feed the hub, 101 high leaves drain it —
      // ~99*101 wedges pivot at the hub. Degree order: every star edge
      // points INTO the hub (leaves have degree 1-3), so the hub pivots
      // zero wedges and only the leaf triangles contribute.
      assert(idWedges > 9000L, s"fixture lost its hub blowup: $idWedges")
      assert(degWedges < 20L, s"orientation failed to tame the hub: $degWedges")
    } finally Caches.releaseAll(spark)
  }

  private def sym(pairs: Seq[(Long, Long)]) =
    (pairs ++ pairs.map(_.swap)).toDF("src", "dst")

  private def runLpa(edges: org.apache.spark.sql.DataFrame, iters: Int) =
    try GraphOps.labelPropagation(edges, iters).drop("converged").as[(Long, Long)].collect().toMap
    finally Caches.releaseAll(spark)

  test("labelPropagation: two cliques across a bridge stay DISTINCT communities " +
      "(where connected components would merge them)") {
    val tri1 = Seq((1L, 2L), (1L, 3L), (2L, 3L))
    val tri2 = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val got = runLpa(sym(tri1 ++ tri2 :+ (3L -> 4L)), iters = 4)
    assert(got(1L) == got(2L) && got(2L) == got(3L))
    assert(got(4L) == got(5L) && got(5L) == got(6L))
    assert(got(1L) != got(4L),
      s"bridge must not merge the cliques: $got")
    // the same edge list IS one connected component — the contrast claim
    val cc = Dedup.dedupClusters(
      (tri1 ++ tri2 :+ (3L -> 4L)).toDF("d1", "d2")).as[(Long, Long)]
      .collect().toMap
    assert(cc.values.toSet.size == 1)
  }

  test("labelPropagation: a star collapses to one community; 2-node pairs do not oscillate") {
    val star = runLpa(sym(Seq((10L, 1L), (10L, 2L), (10L, 3L))), iters = 4)
    assert(star.values.toSet == Set(1L), s"star: $star")
    val pair = runLpa(sym(Seq((7L, 8L))), iters = 4)
    assert(pair == Map(7L -> 7L, 8L -> 7L), s"pair: $pair")
  }

  test("labelPropagation: matches a local synchronous replay on a random graph; deterministic") {
    val rng = new scala.util.Random(23)
    val pairs = (0 until 150).map { _ =>
      (rng.nextInt(60).toLong, rng.nextInt(60).toLong)
    }.filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val edges = sym(pairs)
    val iters = 4
    val adj: Map[Long, Seq[Long]] = (pairs ++ pairs.map(_.swap)).distinct
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSeq }
    val nodes = adj.keySet
    var lbl: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      lbl = nodes.map { n =>
        val votes = (adj(n).map(lbl) :+ lbl(n)).groupBy(identity)
          .map { case (l, vs) => (l, vs.size) }
        n -> votes.toSeq.minBy { case (l, c) => (-c, l) }._1
      }.toMap
    }
    // edge list has duplicate undirected pairs removed, so vote counts are
    // one per neighbor — same multiset the distributed version aggregates
    val got = runLpa(edges, iters)
    assert(got == lbl)
    assert(got == runLpa(edges, iters)) // bit-stable across invocations
  }

  test("bfsHops: path graph distances, radius cutoff, and two-source min") {
    // path 1-2-3-4-5-6 (symmetric), sources {1, 6}: dist = min to either
    // end; with rounds = 2, node 3 gets 2 (from 1), node 4 gets 2 (from 6)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    val sources = Seq(1L, 6L).toDF("id")
    val got = GraphOps.bfsHops(edges, sources, rounds = 2).drop("converged")
      .as[(Long, Long)].collect().toMap
    Caches.release()
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 2L, 5L -> 1L, 6L -> 0L))
    // radius cutoff: single source 1, rounds = 2 -> nodes 4..6 absent
    val one = GraphOps.bfsHops(edges, Seq(1L).toDF("id"), rounds = 2).drop("converged")
      .as[(Long, Long)].collect().toMap
    Caches.release()
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bfsHops: disconnected component stays unreached; deterministic") {
    val edges = Seq((1L, 2L), (2L, 1L), (8L, 9L), (9L, 8L)).toDF("src", "dst")
    val a = GraphOps.bfsHops(edges, Seq(1L).toDF("id"), rounds = 4).drop("converged")
      .as[(Long, Long)].collect().toMap
    Caches.release()
    val b = GraphOps.bfsHops(edges, Seq(1L).toDF("id"), rounds = 4).drop("converged")
      .as[(Long, Long)].collect().toMap
    Caches.release()
    assert(a == Map(1L -> 0L, 2L -> 1L))
    assert(a == b)
  }

  test("kCore: pendant chain peels off round by round; the clique survives with exact degrees") {
    // 4-clique {1,2,3,4} + chain 4-5-6-7: the chain needs THREE rounds to
    // peel fully (7, then 6, then 5) — pins the round-by-round semantics
    val clique = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val pairs = (clique ++ chain).toDF("a", "b")
    val got = GraphOps.kCore(pairs, k = 2, rounds = 4).drop("converged")
      .as[(Long, Long)].collect().toMap
    Caches.release()
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // with only 2 rounds the edge 4-5 is still in the surviving set (6
    // dropped in round 2, so 5's sub-k degree is only visible to a THIRD
    // round): the final >= k cut hides 5 itself, but 4 still counts the
    // doomed edge — core_deg 4, not its converged 3
    val shallow = GraphOps.kCore(pairs, k = 2, rounds = 2).drop("converged")
      .as[(Long, Long)].collect().toMap
    Caches.release()
    assert(shallow == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 4L))
  }

  private def flagOf(df: org.apache.spark.sql.DataFrame): Set[Boolean] =
    try df.select("converged").distinct().as[Boolean].collect().toSet
    finally Caches.releaseAll(spark)

  test("convergence flags: a budget too shallow reports false; a covering budget reports true") {
    // kCore pendant chain: rounds 1..3 each peel one chain node, round 4
    // is the first UNCHANGED round — the earliest witnessable fixpoint
    val clique = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val pairs = (clique ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("a", "b")
    assert(flagOf(GraphOps.kCore(pairs, k = 2, rounds = 3)) == Set(false))
    assert(flagOf(GraphOps.kCore(pairs, k = 2, rounds = 4)) == Set(true))

    // BFS on a 6-path from one end: still expanding at round 2 → false;
    // a tall budget reaches everything and witnesses the empty frontier
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    assert(flagOf(GraphOps.bfsHops(edges, Seq(1L).toDF("id"), rounds = 2)) == Set(false))
    assert(flagOf(GraphOps.bfsHops(edges, Seq(1L).toDF("id"), rounds = 10)) == Set(true))

    // LPA on the same path: min-label still sweeping at 2 rounds → false;
    // by 20 rounds every node holds label 1 and a round passes unchanged
    assert(flagOf(GraphOps.labelPropagation(edges, iters = 2)) == Set(false))
    assert(flagOf(GraphOps.labelPropagation(edges, iters = 20)) == Set(true))

    // pagerank: the symmetric 2-node graph IS its own fixpoint — round 1
    // witnesses it (converged even at iters = 1)
    val two = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    assert(flagOf(GraphOps.pagerank(two, iters = 1)) == Set(true))
  }

  test("early-stop: a converged run equals the full-budget run and stops doing work") {
    // BFS: everything is reached by round 5; rounds = 50 must return the
    // identical table (stopping at the first stable round, not running 50)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    def bfs(r: Int) =
      try GraphOps.bfsHops(edges, Seq(1L).toDF("id"), rounds = r)
        .drop("converged").as[(Long, Long)].collect().toMap
      finally Caches.releaseAll(spark)
    val t0 = System.nanoTime
    val wide = bfs(50)
    val elapsed = (System.nanoTime - t0) / 1e9
    assert(wide == bfs(6))
    // 50 un-stopped rounds of join+fold jobs would take far longer; the
    // bound is generous (CI-safe) but still rules out running all 50
    assert(elapsed < 60.0, s"rounds=50 took ${elapsed}s - early stop broken?")

    // LPA: converged output is the all-ones labeling regardless of budget
    def lpa(i: Int) =
      try GraphOps.labelPropagation(edges, iters = i)
        .drop("converged").as[(Long, Long)].collect().toMap
      finally Caches.releaseAll(spark)
    assert(lpa(20) == lpa(40))

    // kCore: deep budget equals the first-witness budget on the chain
    val clique = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val pairs = (clique ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("a", "b")
    def core(r: Int) =
      try GraphOps.kCore(pairs, k = 2, rounds = r)
        .drop("converged").as[(Long, Long)].collect().toMap
      finally Caches.releaseAll(spark)
    assert(core(4) == core(30))
  }

  test("kCoreSym equals kCore exactly — converged, mid-peel, and on the near-dup graph") {
    def both(pairs: org.apache.spark.sql.DataFrame, k: Int, rounds: Int) =
      try {
        val sym = pairs.selectExpr("a AS src", "b AS dst")
          .unionByName(pairs.selectExpr("b AS src", "a AS dst"))
        (GraphOps.kCore(pairs, k, rounds)
           .as[(Long, Long, Boolean)].collect().sorted.toSeq,
         GraphOps.kCoreSym(sym, k, rounds)
           .as[(Long, Long, Boolean)].collect().sorted.toSeq)
      } finally Caches.releaseAll(spark)
    val clique = for (a <- 1L to 4L; b <- a + 1 to 4L) yield (a, b)
    val pairs = (clique ++ Seq((4L, 5L), (5L, 6L), (6L, 7L))).toDF("a", "b")
    // mid-peel (rounds = 2: node 4 still counts the doomed 4-5 edge),
    // first-witness (4), and over-budget (30) must all agree INCLUDING
    // the converged flag — the sym peel is a layout change, not a
    // semantics change
    for (r <- Seq(2, 4, 30)) {
      val (a, b) = both(pairs, k = 2, rounds = r)
      assert(a == b && a.nonEmpty, s"rounds=$r: kCore=$a kCoreSym=$b")
    }
    // empty cores stay empty
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val (pa, pb) = both(path, k = 2, rounds = 4)
    assert(pa.isEmpty && pb.isEmpty)
    // the real near-dup graph (the lg5/lg7 inputs)
    val jac = Dedup.jaccardPairs(
      Dedup.shingleTable(graft.Td.table(spark, Sf0001, "documents"),
        "doc_id", "text", 3), 0.8)
    val (ga, gb) = both(jac.selectExpr("d1 AS a", "d2 AS b"), k = 2, rounds = 4)
    assert(ga == gb && ga.nonEmpty)
  }

  test("kCore: a tree has no 2-core; k above the density empties a clique") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    assert(GraphOps.kCore(path, k = 2, rounds = 4).isEmpty)
    Caches.release()
    val tri = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    assert(GraphOps.kCore(tri, k = 3, rounds = 2).isEmpty)
    Caches.release()
    val kept = GraphOps.kCore(tri, k = 2, rounds = 4).drop("converged").as[(Long, Long)].collect().toMap
    Caches.release()
    assert(kept == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }
}
