package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force PageRank reference (dense maps, same fixed-iteration
    * definition: teleport (1-d)/n, dangling mass dropped). */
  private def prRef(edges: Seq[(String, String, Double)], iters: Int,
                    d: Double): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val wdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) * e._3 / wdeg(e._1)).sum).toMap
      r = nodes.map(v => v -> ((1.0 - d) / n + d * inflow.getOrElse(v, 0.0))).toMap
    }
    r
  }

  test("pageRank matches the brute-force reference on a weighted digraph") {
    // a hub (h) fed by three spokes that also chain; includes an asymmetric
    // weight and a node with no in-edges.
    val edges = Seq(
      ("s1", "h", 1.0), ("s2", "h", 2.0), ("s3", "h", 1.0),
      ("s1", "s2", 1.0), ("s2", "s3", 1.0), ("h", "s1", 1.0))
    val got = Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters = 7, damping = 0.85)
      .as[(String, Double)].collect().toMap
    val want = prRef(edges, 7, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, p) =>
      // operator rounds to 4 decimals at the end: bound = half-ulp of 1e-4
      assert(math.abs(p - want(v)) <= 5.001e-5, s"node $v: $p vs ${want(v)}")
    }
    // mass conservation: no dangling nodes here, so ranks sum to ~1
    assert(math.abs(got.values.sum - 1.0) < 1e-6)
  }

  /** Reference with the standard dangling-mass D/n redistribution. */
  private def prRefDangling(edges: Seq[(String, String, Double)], iters: Int,
                            d: Double): Map[String, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val wdeg = edges.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val dangling = nodes.filterNot(wdeg.contains)
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dm = dangling.map(r).sum
      val inflow = edges.groupBy(_._2).view.mapValues(
        _.map(e => r(e._1) * e._3 / wdeg(e._1)).sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (inflow.getOrElse(v, 0.0) + dm / n))).toMap
    }
    r
  }

  test("pageRank redistributes dangling mass on a digraph with sinks") {
    // c and e are sinks (no out-edges): without the D/n term their inflow
    // mass drains out of the system every round
    val edges = Seq(
      ("a", "b", 1.0), ("b", "c", 2.0), ("a", "c", 1.0),
      ("d", "a", 1.0), ("d", "e", 3.0))
    val got = Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters = 7, damping = 0.85, redistributeDangling = true)
      .as[(String, Double)].collect().toMap
    val want = prRefDangling(edges, 7, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (v, p) =>
      assert(math.abs(p - want(v)) <= 5.001e-5, s"node $v: $p vs ${want(v)}")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-3,
      "redistribution must conserve total rank mass")
    // and the default (drop) definition must NOT conserve it here
    val dropped = Graph.pageRank(edges.toDF("src", "dst", "w"), "src", "dst", "w",
        iters = 7, damping = 0.85)
      .as[(String, Double)].collect().toMap
    assert(dropped.values.sum < 0.9)
  }

  test("pageRank: repartition-invariant; mass follows the flow structure") {
    val edges = Seq(
      ("s1", "h", 1.0), ("s2", "h", 1.0), ("s3", "h", 1.0),
      ("h", "s1", 1.0), ("s2", "s1", 1.0), ("s3", "s2", 1.0))
    val df = edges.toDF("src", "dst", "w")
    val a = Graph.pageRank(df, "src", "dst", "w", iters = 10)
      .as[(String, Double)].collect().toMap
    val b = Graph.pageRank(df.repartition(7), "src", "dst", "w", iters = 10)
      .as[(String, Double)].collect().toMap
    assert(a === b)
    // h's only out-edge feeds s1, so s1 ends above h, h above the leaves
    assert(a("s1") > a("h") && a("h") > a("s2") && a("s2") > a("s3"))
    assert(math.abs(a.values.sum - 1.0) < 1e-3) // no dangling -> mass conserved
  }

  /** Brute-force HITS reference (dense maps, L1 normalization). */
  private def hitsRef(edges: Seq[(String, String)],
                      iters: Int): Map[String, (Double, Double)] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct.sorted
    var h = nodes.map(_ -> 1.0 / nodes.size).toMap
    var a = h
    for (_ <- 1 to iters) {
      val ar = nodes.map(v => v -> e.filter(_._2 == v).map(p => h(p._1)).sum).toMap
      val as = ar.values.sum
      a = ar.view.mapValues(_ / as).toMap
      val hr = nodes.map(v => v -> e.filter(_._1 == v).map(p => a(p._2)).sum).toMap
      val hs = hr.values.sum
      h = hr.view.mapValues(_ / hs).toMap
    }
    nodes.map(v => v -> ((h(v), a(v)))).toMap
  }

  test("hits matches the brute-force reference; pure hubs and authorities split") {
    // bipartite-ish: h1, h2 point at a1, a2, a3; a3 also points back at h1
    // (so h1 gets authority mass and a3 gets hub mass); plus duplicate edge
    val edges = Seq(("h1", "a1"), ("h1", "a2"), ("h1", "a3"), ("h2", "a1"),
      ("h2", "a2"), ("a3", "h1"), ("h1", "a1"))
    val got = Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters = 3)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = hitsRef(edges, 3)
    want.foreach { case (v, (h, a)) =>
      assert(math.abs(got(v)._1 - h) < 1e-3, s"$v hub: got ${got(v)._1} want $h")
      assert(math.abs(got(v)._2 - a) < 1e-3, s"$v auth: got ${got(v)._2} want $a")
    }
    // h1 is the dominant hub; a1/a2 are the dominant authorities; a pure
    // authority (a1) has zero hub score, and scores L1-normalize
    assert(got("h1")._1 === got.values.map(_._1).max)
    assert(got("a1")._1 === 0.0)
    assert(math.abs(got.values.map(_._1).sum - 1.0) < 1e-3)
    assert(math.abs(got.values.map(_._2).sum - 1.0) < 1e-3)
    // repartition-invariant
    val again = Graph.hits(edges.toDF("src", "dst").repartition(5),
      "src", "dst", iters = 3)
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again === got)
  }

  test("closeness: path graph distances are exact; radius bounds the reach") {
    // undirected path a-b-c-d-e (both directions given)
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val seeds = Seq("a", "c").toDF("node")
    val got = Graph.closeness(edges, "src", "dst", seeds, rounds = 3)
      .select($"seed", $"n_reached", $"closeness", $"harmonic")
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a reaches b@1 c@2 d@3 within 3 hops (e is 4 away): 3/(1+2+3)
    assert(got("a") === ((3L, 0.5, math.round((1.0 + 0.5 + 1.0 / 3) * 1e6) / 1e6)))
    // c reaches everything within 2: 4/(1+1+2+2)
    assert(got("c") === ((4L, round6(4.0 / 6), 3.0)))
    // BFS distances are min-hop, not path-dependent: add a chord a-c and
    // d's distance from a drops to 2
    val chord = (und ++ Seq(("a", "c"))) ++ (und ++ Seq(("a", "c"))).map(_.swap)
    val got2 = Graph.closeness(chord.toDF("src", "dst"), "src", "dst",
        Seq("a").toDF("node"), rounds = 3)
      .select($"n_reached", $"closeness").as[(Long, Double)].head()
    assert(got2 === ((4L, round6(4.0 / (1 + 1 + 2 + 3)))))
  }

  private def round6(x: Double): Double = math.round(x * 1e6) / 1e6

  test("MMR demotes near-duplicates that pure relevance would rank adjacent") {
    import graft.operators.KnnSearch
    // c1 and c2 are near-identical top candidates; c3 is orthogonal-ish with
    // lower relevance. Pure relevance ranks c1, c2, c3; MMR at lambda 0.7
    // must interleave the diverse c3 ahead of the redundant c2.
    val cands = Seq(
      (1L, Array(1f, 0f, 0f), 0.95),
      (2L, Array(0.999f, 0.04f, 0f), 0.94),
      (3L, Array(0f, 1f, 0f), 0.80))
    val got = KnnSearch.mmrRerank(cands, k = 3, lambda = 0.7)
    assert(got.map(_._2) === Seq(1L, 3L, 2L))
    assert(got.map(_._1) === Seq(1, 2, 3))
    // rank-1 score is pure relevance in e5 fixed point: 7 * 9500
    assert(got.head._4 === 7L * 9500L)
    // deterministic: same input, same output
    assert(KnnSearch.mmrRerank(cands, k = 3, lambda = 0.7) === got)
  }

  test("triangles: symmetric/duplicated/self-loop input is canonicalized, not multi-counted") {
    val k3 = Seq("a" -> "b", "a" -> "c", "b" -> "c")
    val messy = (k3 ++ k3.map(_.swap) ++ k3 ++ Seq("a" -> "a")).toDF("a", "b")
    val got = Graph.trianglesPerNode(messy).as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 1L, "b" -> 1L, "c" -> 1L))
  }

  test("triangles: hub with the smallest id stays degeneracy-bounded, not degree-bounded") {
    // node 0 is a 100-spoke hub; spokes (2i-1, 2i) pair up into triangles
    // with the hub. Graph degeneracy is 2, hub degree is 100: id-order
    // orientation would hand node 0 out-degree 100 (one hot join key);
    // degree-order must cap every out-degree at the degeneracy ceiling.
    val spokes = (1 to 100).map(i => 0 -> i)
    val rungs = (1 to 50).map(i => (2 * i - 1) -> (2 * i))
    val edges = (spokes ++ rungs).toDF("a", "b")
    val outDeg = Graph.orientByDegree(edges, "a", "b")
      .groupBy(col("u")).agg(count(lit(1)).as("od"))
      .agg(max(col("od"))).as[Long].head()
    assert(outDeg <= 2L, s"max oriented out-degree $outDeg exceeds the degeneracy bound")
    val got = Graph.trianglesPerNode(edges).as[(Int, Long)].collect().toMap
    assert(got(0) === 50L)
    (1 to 100).foreach(i => assert(got(i) === 1L, s"spoke $i"))
  }

  test("trianglesPerNode counts corners; zero-triangle nodes keep a row") {
    // K4 on {a,b,c,d} (every node in C(3,2)=3 triangles) plus a pendant
    // edge to e (0 triangles) and an isolated edge f-g.
    val k4 = Seq("a" -> "b", "a" -> "c", "a" -> "d", "b" -> "c", "b" -> "d", "c" -> "d")
    val edges = k4 ++ Seq("d" -> "e", "f" -> "g")
    val got = Graph.trianglesPerNode(edges.toDF("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(got === Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L,
      "e" -> 0L, "f" -> 0L, "g" -> 0L))
  }

  test("personalized PageRank: mass conserved, rank decays with distance from the seed") {
    // symmetric path a - b - c - d, restart at {a}
    val und = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    val edges = (und ++ und.map(_.swap)).map { case (s, t) => (s, t, 1.0) }
      .toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    val got = Graph.personalizedPageRank(edges, "src", "dst", "w", seeds,
        iters = 10)
      .select($"node", $"ppr").as[(String, Double)].collect().toMap

    // every restart lands at a seed -> total mass stays 1 (4e-4 = rounding)
    assert(math.abs(got.values.sum - 1.0) < 4e-4, got.toString)
    // the seed holds the most rank, the far end the least (NOT strict
    // monotonic decay: the path's dead end reflects mass back into c, so
    // c can legitimately edge past b — real PPR dynamics)
    assert(got.maxBy(_._2)._1 == "a", got.toString)
    assert(got.minBy(_._2)._1 == "d", got.toString)
    // unlike uniform PageRank, the far end holds far less than the seed
    assert(got("d") < got("a") / 2, got.toString)
  }

  test("kCore: cascading peel reaches the true 2-core; hair and chains drop") {
    // triangle 1-2-3 (the 2-core) + chain 3-4-5-6: peeling 6 exposes 5,
    // which exposes 4 — each removal needs its own round (the cascade that
    // proves iteration, not a single degree filter)
    val edges = Seq((1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)).toDF("a", "b")
    val out = Graph.kCore(edges, "a", "b", k = 2, rounds = 3)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(out === Map(1 -> 2L, 2 -> 2L, 3 -> 2L))
    // one round fewer still has chain remnants -> proves round 3 did work
    val early = Graph.kCore(edges, "a", "b", k = 2, rounds = 2)
      .collect().map(_.getInt(0)).toSet
    assert(early.contains(4) && !early.contains(5))
  }

  test("kCore: messy duplicated/symmetric/self-loop input canonicalized") {
    val edges = Seq((1, 2), (2, 1), (1, 1), (2, 3), (1, 3), (1, 3)).toDF("a", "b")
    val out = Graph.kCore(edges, "a", "b", k = 2, rounds = 2)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the duplicated (1,3) must not inflate degree; self-loop adds nothing
    assert(out === Map(1 -> 2L, 2 -> 2L, 3 -> 2L))
  }

  test("linkPrediction: square graph scores both diagonals at full Jaccard") {
    // a-b-c-d-a: diagonals (a,c) and (b,d) share BOTH neighbors
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")).toDF("x", "y")
    val out = Graph.linkPrediction(edges, "x", "y", maxMiddleDegree = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(("a", "c"), ("b", "d")))
    assert(out(("a", "c")) === ((2L, 1.0, 1.0)))
  }

  test("linkPrediction: hub cap excludes hub-mediated wedges") {
    val spokes = (1 to 5).map(i => ("h", s"x$i"))
    val df = spokes.toDF("x", "y")
    // hub degree 5 > cap 4: no middle survives, no candidates at all
    assert(Graph.linkPrediction(df, "x", "y", maxMiddleDegree = 4).count() === 0)
    // cap admits the hub: every spoke pair is a candidate with common=1,
    // but the DENOMINATOR degrees stay true (computed before the cap)
    val out = Graph.linkPrediction(df, "x", "y", maxMiddleDegree = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out.size === 10)
    assert(out(("x1", "x2")) === 1.0) // 1/(1+1-1)
  }

  test("linkPrediction: existing edges are never candidates; messy input canonicalized") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "a"), ("b", "c"), ("a", "c"))
      .toDF("x", "y")
    // triangle: every pair is already an edge -> empty
    assert(Graph.linkPrediction(edges, "x", "y", maxMiddleDegree = 10).count() === 0)
  }

  // ---- driver-resident tier ≡ distributed loop (the CC union-find
  // discipline: budget 0 forces the loop, so BOTH code paths stay covered
  // and the dispatch provably cannot change a result) ----

  private val tierEdges = Seq(
    ("s1", "h", 1.0), ("s2", "h", 2.0), ("s3", "h", 1.0),
    ("s1", "s2", 1.0), ("s2", "s3", 1.0), ("h", "s1", 1.0),
    ("h", "sink", 3.0), ("lone", "h", 0.5))

  test("pageRank: driver tier equals the distributed loop, both dangling modes") {
    val df = tierEdges.toDF("src", "dst", "w")
    for (redis <- Seq(false, true)) {
      val local = Graph.pageRank(df, "src", "dst", "w", iters = 5,
        damping = 0.85, redistributeDangling = redis)
        .as[(String, Double)].collect().toMap
      val loop = Graph.pageRank(df, "src", "dst", "w", iters = 5,
        damping = 0.85, redistributeDangling = redis, driverEdgeBudget = 0L)
        .as[(String, Double)].collect().toMap
      assert(local === loop, s"redistributeDangling=$redis")
    }
  }

  test("personalizedPageRank: driver tier equals the distributed loop") {
    val df = tierEdges.toDF("src", "dst", "w")
    val seeds = Seq("s1", "lone").toDF("node")
    val local = Graph.personalizedPageRank(df, "src", "dst", "w", seeds,
      iters = 5, damping = 0.85).as[(String, Double)].collect().toMap
    val loop = Graph.personalizedPageRank(df, "src", "dst", "w", seeds,
        iters = 5, damping = 0.85, driverEdgeBudget = 0L)
      .as[(String, Double)].collect().toMap
    assert(local === loop)
  }

  test("labelPropagation: driver tier equals the distributed loop") {
    val df = (tierEdges.map(e => (e._1, e._2)) ++ Seq(("x1", "x2"), ("x2", "x3")))
      .toDF("a", "b")
    val local = Graph.labelPropagation(df, "a", "b", iters = 3)
      .as[(String, String)].collect().toMap
    val loop = Graph.labelPropagation(df, "a", "b", iters = 3,
      driverEdgeBudget = 0L).as[(String, String)].collect().toMap
    assert(local === loop)
  }

  test("kCore: driver tier equals the distributed loop") {
    val df = (tierEdges.map(e => (e._1, e._2)) ++
      Seq(("s1", "s3"), ("s2", "lone"), ("x1", "x2"))).toDF("a", "b")
    for (k <- Seq(2, 3)) {
      val local = Graph.kCore(df, "a", "b", k = k, rounds = 3)
        .as[(String, Long)].collect().toMap
      val loop = Graph.kCore(df, "a", "b", k = k, rounds = 3,
        driverEdgeBudget = 0L).as[(String, Long)].collect().toMap
      assert(local === loop, s"k=$k")
    }
  }

  test("multiSourceBfs: driver tier equals the distributed loop") {
    val df = tierEdges.map(e => (e._1, e._2)).toDF("a", "b")
    val seeds = Seq("s1", "lone").toDF("node")
    val local = Graph.multiSourceBfs(df, "a", "b", seeds, rounds = 3)
      .as[(String, String, Int)].collect().toSet
    val loop = Graph.multiSourceBfs(df, "a", "b", seeds, rounds = 3,
      driverEdgeBudget = 0L).as[(String, String, Int)].collect().toSet
    assert(local === loop)
  }

  test("multiSourceBfs: mismatched seed type falls to the distributed " +
      "loop and matches it (no boxed-equality miss in the local tier)") {
    // IntegerType seeds against LongType edges: the distributed join
    // coerces and finds full reachability; a local-tier lookup with raw
    // JVM equality would miss every adjacency (boxed Integer != Long).
    // The dispatch guard must route this shape to the loop.
    val df = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val seeds = Seq(1, 3).toDF("node") // Int, not Long
    val dispatched = Graph.multiSourceBfs(df, "a", "b", seeds, rounds = 3)
      .select(col("seed").cast("long"), col("node").cast("long"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    val loop = Graph.multiSourceBfs(df, "a", "b", seeds, rounds = 3,
        driverEdgeBudget = 0L)
      .select(col("seed").cast("long"), col("node").cast("long"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    assert(dispatched === loop)
    // and the reachability is the coerced one, not the empty boxed miss
    assert(dispatched.contains((1L, 4L, 3)) && dispatched.contains((3L, 4L, 1)))
  }

  test("hits: driver tier equals the distributed loop") {
    val df = tierEdges.map(e => (e._1, e._2)).toDF("src", "dst")
    val local = Graph.hits(df, "src", "dst", iters = 3)
      .as[(String, Double, Double)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    val loop = Graph.hits(df, "src", "dst", iters = 3, driverEdgeBudget = 0L)
      .as[(String, Double, Double)].collect()
      .map { case (n, h, a) => n -> (h, a) }.toMap
    assert(local === loop)
  }
}
