package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames — the relational
  * formulation (edges as rows, iteration as join+aggregate) that scales the
  * way [[Dedup.connectedComponents]] does: no adjacency structure is ever
  * materialized on one machine, every round is an edge-partitioned shuffle
  * join with map-side partial aggregation, and lineage is truncated with
  * periodic localCheckpoints so long iteration chains don't accumulate plan
  * depth.
  */
object Graph {

  /** Spark's `round()` on DoubleType: decimal string -> HALF_UP -> double.
    * The driver-resident tiers must round THROUGH the same path or a value
    * sitting on a .00005 boundary could diverge from the distributed loop. */
  private def round4(v: Double): Double =
    java.math.BigDecimal.valueOf(v)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** An Ordering over collected node/label values that matches Spark's
    * sort order for the type — integers numerically, strings as UNSIGNED
    * UTF-8 bytes (UTF8String's binary comparison; java String.compareTo
    * would disagree on supplementary characters). Types without an exact
    * reproduction return None and take the distributed loop. */
  private def labelOrdering(dt: org.apache.spark.sql.types.DataType)
      : Option[Ordering[Any]] = dt match {
    case org.apache.spark.sql.types.LongType =>
      Some(Ordering.by((x: Any) => x.asInstanceOf[Long]))
    case org.apache.spark.sql.types.IntegerType =>
      Some(Ordering.by((x: Any) => x.asInstanceOf[Int]))
    case org.apache.spark.sql.types.StringType =>
      Some(new Ordering[Any] {
        def compare(a: Any, b: Any): Int = {
          val x = a.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          val y = b.asInstanceOf[String].getBytes(java.nio.charset.StandardCharsets.UTF_8)
          var i = 0
          val n = math.min(x.length, y.length)
          while (i < n) {
            val c = (x(i) & 0xff) - (y(i) & 0xff)
            if (c != 0) return c
            i += 1
          }
          x.length - y.length
        }
      })
    case _ => None
  }

  /** Weighted PageRank with a fixed iteration count.
    *
    * `edges` is a DIRECTED weighted edge list (undirected graphs pass both
    * directions). Per iteration: rank mass flows src -> dst proportionally
    * to edge weight / weighted out-degree, then every node takes
    * (1-damping)/n teleport plus damping * inflow. Nodes appearing only as
    * destinations still hold rank. Mass leaving a node with no out-edges
    * (dangling): dropped by default — symmetric edge lists (our main
    * callers) have no dangling nodes — or, with
    * `redistributeDangling = true`, spread uniformly (the standard
    * D/n term directed inputs need for mass conservation). The ANSI oracle
    * replays whichever definition the query registers.
    *
    * Scale shape: the per-iteration join keys ranks and normalized edges on
    * src (both hash-partitioned on the same key, so consecutive iterations
    * reuse the partitioning), the inflow aggregate is dst-keyed with
    * map-side partials, and the edge-probability table is computed ONCE and
    * persisted. The dangling mass is a one-row aggregate that re-enters the
    * plan via a broadcast cross join (never a per-iteration collect). The
    * only driver-side scalar is the node count.
    *
    * Size dispatch (the [[Dedup.connectedComponents]] pattern): each
    * iteration is 1 join + 1 agg over node-sized frames — on a small graph
    * that is pure rounds x fixed-job scheduling overhead. The edge count is
    * observed during the seed pass (zero extra jobs); when it fits
    * `driverEdgeBudget` (edge rows — the default 500k stays tens of MB on
    * the driver even with string node ids and boxed Row fields) the edges collect and the SAME power iteration runs locally:
    * identical p = w/wdeg flow, identical teleport/dangling terms,
    * identical round-4 output (spec-pinned equal to the loop). Over budget
    * — the only possibility at real corpus-graph volumes — the distributed
    * loop runs unchanged. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int, damping: Double = 0.85,
               redistributeDangling: Boolean = false,
               driverEdgeBudget: Long = 500000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1), got $damping")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = org.apache.spark.sql.Observation()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .observe(obs, count(lit(1)).as("n2"))
      .distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    // the union scans the edge list twice, so the observed count is 2E.
    // A missing metric (optimized-away CollectMetrics) must fail SAFE:
    // force the distributed loop, never the driver collect.
    val ne = (try obs.get("n2").asInstanceOf[Long] catch {
      case _: NoSuchElementException => Long.MaxValue
    }) / 2
    if (ne <= driverEdgeBudget &&
        e0.schema("src").dataType == e0.schema("dst").dataType) {
      graft.core.TierStats.record("pageRank", "driver")
      val rows = e0.select(col("src"), col("dst"), col("w")).collect()
      e0.unpersist()
      return pageRankLocal(edges.sparkSession, e0.schema("src").dataType,
        rows, iters, damping, redistributeDangling)
    }
    graft.core.TierStats.record("pageRank", "distributed")
    val wdeg = e0.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val ep = e0.join(wdeg, "src")
      .select(col("src"), col("dst"), (col("w") / col("wdeg")).as("p"))
      .localCheckpoint()
    e0.unpersist()
    // dangling nodes: hold rank but have no out-edges (only possible on
    // directed inputs); node-count sized, broadcastable
    lazy val dangling = nodes
      .join(ep.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contribs = ep.join(ranks, ep("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("contrib"))
      val withInflow = nodes.join(contribs, Seq("node"), "left")
      ranks =
        if (!redistributeDangling)
          withInflow.select(col("node"),
            (lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
        else {
          // one-row dangling-mass aggregate, broadcast back via cross join
          val dmass = ranks.join(broadcast(dangling), Seq("node"), "left_semi")
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
          withInflow.crossJoin(broadcast(dmass))
            .select(col("node"),
              (lit((1.0 - damping) / n) +
                lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
                  col("dmass") / n)).as("rank"))
        }
      // truncate the growing join lineage the way connectedComponents does
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 4).as("pagerank"))
  }

  /** The under-budget tier of [[pageRank]]: the identical power iteration
    * over driver-resident adjacency (node keys stay whatever type the edge
    * list carried). Arithmetic mirrors the loop term for term — seed 1/n,
    * per-edge flow rank(src) * (w/wdeg(src)), teleport (1-d)/n, optional
    * uniform dangling redistribution — and the output rounds through
    * [[round4]], Spark's own double-round path. */
  private def pageRankLocal(spark: org.apache.spark.sql.SparkSession,
                            nodeType: org.apache.spark.sql.types.DataType,
                            rows: Array[org.apache.spark.sql.Row], iters: Int,
                            damping: Double,
                            redistributeDangling: Boolean): DataFrame = {
    val wdeg = scala.collection.mutable.HashMap.empty[Any, Double]
    val nodesL = scala.collection.mutable.LinkedHashSet.empty[Any]
    rows.foreach { r =>
      nodesL += r.get(0); nodesL += r.get(1)
      wdeg(r.get(0)) = wdeg.getOrElse(r.get(0), 0.0) + r.getDouble(2)
    }
    val n = nodesL.size
    require(n > 0, "pageRank needs a non-empty edge set")
    var rank = nodesL.iterator.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.HashMap.empty[Any, Double]
      rows.foreach { r =>
        val p = r.getDouble(2) / wdeg(r.get(0))
        contrib(r.get(1)) = contrib.getOrElse(r.get(1), 0.0) + rank(r.get(0)) * p
      }
      val dmass =
        if (redistributeDangling)
          nodesL.iterator.filterNot(wdeg.contains).map(rank).sum
        else 0.0
      rank = nodesL.iterator.map { v =>
        v -> ((1.0 - damping) / n +
          damping * (contrib.getOrElse(v, 0.0) +
            (if (redistributeDangling) dmass / n else 0.0)))
      }.toMap
    }
    val out = nodesL.iterator
      .map(v => org.apache.spark.sql.Row(v, round4(rank(v)))).toSeq
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(out).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("pagerank",
          org.apache.spark.sql.types.DoubleType))))
  }

  /** Personalized PageRank (random walk with restart): teleport mass
    * returns ONLY to the `seeds` node set — the graph-expansion /
    * related-items primitive (rank concentrates around the seeds instead
    * of spreading globally). Dangling mass likewise returns to the seeds
    * (the PPR convention: every restart lands in S).
    *
    * Same per-iteration shape as [[pageRank]] (src-keyed contrib join,
    * dst-keyed map-side-partial inflow agg, one-row dangling aggregate via
    * broadcast cross join); the seed flag is joined ONCE into a
    * checkpointed node frame and rides along. Driver scalars: the seed
    * count (model-sized, like n).
    *
    * Size-dispatched like [[pageRank]]: under `driverEdgeBudget` the edges
    * and the (node, is_seed) frame collect and the identical seeded
    * iteration runs driver-local (spec-pinned equal to the loop). */
  def personalizedPageRank(edges: DataFrame, srcCol: String, dstCol: String,
                           weightCol: String, seeds: DataFrame, iters: Int,
                           damping: Double = 0.85,
                           driverEdgeBudget: Long = 500000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1), got $damping")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val obs = org.apache.spark.sql.Observation()
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node")))
      .observe(obs, count(lit(1)).as("n2"))
      .distinct()
    val seedSet = seeds.select(col(seeds.columns.head).as("node")).distinct()
    val marked = nodes
      .join(broadcast(seedSet.withColumn("__seed", lit(1.0))), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0.0)).as("is_seed"))
      .localCheckpoint()
    val ns = marked.agg(sum(col("is_seed"))).head().getDouble(0)
    require(ns > 0, "personalizedPageRank needs at least one seed present in the graph")
    // missing metric fails SAFE: the distributed loop, never the collect
    // (the pageRank convention — MaxValue keeps the budget guard closed).
    val ne = (try obs.get("n2").asInstanceOf[Long] catch {
      case _: NoSuchElementException => Long.MaxValue
    }) / 2
    if (ne <= driverEdgeBudget &&
        e0.schema("src").dataType == e0.schema("dst").dataType) {
      graft.core.TierStats.record("personalizedPageRank", "driver")
      val rows = e0.select(col("src"), col("dst"), col("w")).collect()
      e0.unpersist()
      return pprLocal(edges.sparkSession, e0.schema("src").dataType, rows,
        marked.collect(), ns, iters, damping)
    }
    graft.core.TierStats.record("personalizedPageRank", "distributed")
    val wdeg = e0.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val ep = e0.join(wdeg, "src")
      .select(col("src"), col("dst"), (col("w") / col("wdeg")).as("p"))
      .localCheckpoint()
    e0.unpersist()
    val dangling = marked.select(col("node"))
      .join(ep.select(col("src").as("node")).distinct(), Seq("node"), "left_anti")
      .localCheckpoint()
    var ranks = marked.select(col("node"), col("is_seed"),
      (col("is_seed") / ns).as("rank"))
    for (i <- 1 to iters) {
      val contribs = ep.join(ranks, ep("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("contrib"))
      val dmass = ranks.join(broadcast(dangling), Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dmass"))
      ranks = marked.join(contribs, Seq("node"), "left")
        .crossJoin(broadcast(dmass))
        .select(col("node"), col("is_seed"),
          (lit(1.0 - damping) * col("is_seed") / ns +
            lit(damping) * (coalesce(col("contrib"), lit(0.0)) +
              col("is_seed") * col("dmass") / ns)).as("rank"))
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 4).as("ppr"))
  }

  /** Under-budget tier of [[personalizedPageRank]]: the same seeded
    * restart iteration over collected adjacency. `markedRows` is the
    * checkpointed (node, is_seed) frame — node-sized, already bounded by
    * the edge budget that admitted us here. */
  private def pprLocal(spark: org.apache.spark.sql.SparkSession,
                       nodeType: org.apache.spark.sql.types.DataType,
                       rows: Array[org.apache.spark.sql.Row],
                       markedRows: Array[org.apache.spark.sql.Row],
                       ns: Double, iters: Int, damping: Double): DataFrame = {
    val wdeg = scala.collection.mutable.HashMap.empty[Any, Double]
    rows.foreach { r =>
      wdeg(r.get(0)) = wdeg.getOrElse(r.get(0), 0.0) + r.getDouble(2)
    }
    // iterate in the marked frame's order for determinism; it carries the
    // full node set by construction (built from the same edge union)
    val nodesL = markedRows.map(_.get(0))
    val isSeed = markedRows.map(r => r.get(0) -> r.getDouble(1)).toMap
    var rank = markedRows.map(r => r.get(0) -> r.getDouble(1) / ns).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.HashMap.empty[Any, Double]
      rows.foreach { r =>
        val p = r.getDouble(2) / wdeg(r.get(0))
        contrib(r.get(1)) = contrib.getOrElse(r.get(1), 0.0) + rank(r.get(0)) * p
      }
      val dmass = nodesL.iterator.filterNot(wdeg.contains).map(rank).sum
      rank = nodesL.iterator.map { v =>
        v -> ((1.0 - damping) * isSeed(v) / ns +
          damping * (contrib.getOrElse(v, 0.0) + isSeed(v) * dmass / ns))
      }.toMap
    }
    val out = nodesL.iterator
      .map(v => org.apache.spark.sql.Row(v, round4(rank(v)))).toSeq
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(out).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("ppr",
          org.apache.spark.sql.types.DoubleType))))
  }

  /** HITS hubs & authorities (Kleinberg 1999), fixed iteration count over a
    * DIRECTED edge list. Per iteration: authority(v) = Σ_{u→v} hub(u), then
    * L1-normalize; hub(u) = Σ_{u→v} authority(v), then L1-normalize — the
    * mutual-reinforcement recursion, L1 rather than L2 so each round's
    * normalizer is a plain sum (the dangling-mass shape: one-row aggregate
    * broadcast back via cross join, never a collect). Nodes appearing only
    * on one side still hold both scores (zero on the side they lack edges
    * for after round 1).
    *
    * Scale shape mirrors [[pageRank]]: the edge table is checkpointed once,
    * each half-round is one src- or dst-keyed join + map-side-partial
    * aggregate, score frames are node-sized, and lineage is truncated
    * every 3 rounds. Returns (node, hub, authority), round-4.
    *
    * Size-dispatched like [[pageRank]]: the deduped edge count is observed
    * on the checkpoint (zero extra jobs); under `driverEdgeBudget` the
    * identical mutual-reinforcement rounds run driver-local. */
  def hits(edges: DataFrame, srcCol: String, dstCol: String,
           iters: Int, driverEdgeBudget: Long = 500000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val obs = org.apache.spark.sql.Observation()
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .distinct().observe(obs, count(lit(1)).as("ne")).localCheckpoint()
    // missing metric fails SAFE: the distributed loop, never the collect
    val ne = try obs.get("ne").asInstanceOf[Long] catch {
      case _: NoSuchElementException => Long.MaxValue
    }
    if (ne <= driverEdgeBudget &&
        e0.schema("src").dataType == e0.schema("dst").dataType) {
      graft.core.TierStats.record("hits", "driver")
      return hitsLocal(edges.sparkSession, e0.schema("src").dataType,
        e0.collect(), iters)
    }
    graft.core.TierStats.record("hits", "distributed")
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "hits needs a non-empty edge set")
    var hub = nodes.withColumn("h", lit(1.0 / n))
    var auth = nodes.withColumn("a", lit(1.0 / n))
    for (i <- 1 to iters) {
      val aRaw = nodes.join(
        e0.join(hub, e0("src") === hub("node"))
          .groupBy(col("dst").as("node")).agg(sum(col("h")).as("araw")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("araw"), lit(0.0)).as("araw"))
      val aNorm = aRaw.agg(sum(col("araw")).as("s"))
      auth = aRaw.crossJoin(broadcast(aNorm))
        .select(col("node"), (col("araw") / col("s")).as("a"))
      val hRaw = nodes.join(
        e0.join(auth, e0("dst") === auth("node"))
          .groupBy(col("src").as("node")).agg(sum(col("a")).as("hraw")),
        Seq("node"), "left")
        .select(col("node"), coalesce(col("hraw"), lit(0.0)).as("hraw"))
      val hNorm = hRaw.agg(sum(col("hraw")).as("s"))
      hub = hRaw.crossJoin(broadcast(hNorm))
        .select(col("node"), (col("hraw") / col("s")).as("h"))
      if (i % 3 == 0 && i < iters) {
        hub = hub.localCheckpoint(); auth = auth.localCheckpoint()
      }
    }
    hub.join(auth, Seq("node"))
      .select(col("node"), round(col("h"), 4).as("hub"),
        round(col("a"), 4).as("authority"))
  }

  /** Under-budget tier of [[hits]]: the same L1-normalized
    * mutual-reinforcement rounds over the collected (deduped) edge list. */
  private def hitsLocal(spark: org.apache.spark.sql.SparkSession,
                        nodeType: org.apache.spark.sql.types.DataType,
                        rows: Array[org.apache.spark.sql.Row],
                        iters: Int): DataFrame = {
    val nodesL = scala.collection.mutable.LinkedHashSet.empty[Any]
    rows.foreach { r => nodesL += r.get(0); nodesL += r.get(1) }
    val n = nodesL.size
    require(n > 0, "hits needs a non-empty edge set")
    var hub = nodesL.iterator.map(_ -> 1.0 / n).toMap
    var auth = nodesL.iterator.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val araw = scala.collection.mutable.HashMap.empty[Any, Double]
      rows.foreach { r =>
        araw(r.get(1)) = araw.getOrElse(r.get(1), 0.0) + hub(r.get(0))
      }
      val as = nodesL.iterator.map(v => araw.getOrElse(v, 0.0)).sum
      auth = nodesL.iterator.map(v => v -> araw.getOrElse(v, 0.0) / as).toMap
      val hraw = scala.collection.mutable.HashMap.empty[Any, Double]
      rows.foreach { r =>
        hraw(r.get(0)) = hraw.getOrElse(r.get(0), 0.0) + auth(r.get(1))
      }
      val hs = nodesL.iterator.map(v => hraw.getOrElse(v, 0.0)).sum
      hub = nodesL.iterator.map(v => v -> hraw.getOrElse(v, 0.0) / hs).toMap
    }
    val out = nodesL.iterator
      .map(v => org.apache.spark.sql.Row(v, round4(hub(v)), round4(auth(v))))
      .toSeq
    spark.createDataFrame(
      new java.util.ArrayList(scala.jdk.CollectionConverters
        .SeqHasAsJava(out).asJava),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("hub",
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.types.StructField("authority",
          org.apache.spark.sql.types.DoubleType))))
  }

  /** Batch-synchronous multi-source BFS: shortest hop-distance from each
    * seed to every node it reaches within `rounds` hops. Per round the
    * frontier joins the edge table and anti-joins the visited set — both
    * frontier-keyed shuffles whose size is bounded by seeds × reached
    * nodes, the [[GraphAnn.beamSearch]] cadence with exact (not beam-
    * pruned) frontiers. Returns (seed, node, dist), dist 0 for the seed
    * itself. */
  def multiSourceBfs(edges: DataFrame, srcCol: String, dstCol: String,
                     seeds: DataFrame, rounds: Int,
                     driverEdgeBudget: Long = 500000L): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val obs = org.apache.spark.sql.Observation()
    val e = edges.select(col(srcCol).as("__s"), col(dstCol).as("__d"))
      .distinct().observe(obs, count(lit(1)).as("ne")).localCheckpoint()
    // hop distances are exact integers and node identity is plain equality
    // (post-select the columns share one coerced type only when src/dst
    // matched — the dispatch guard), so the under-budget tier is the same
    // BFS over driver-resident adjacency; missing metric fails SAFE to the
    // distributed loop (the pageRank convention).
    val ne = try obs.get("ne").asInstanceOf[Long] catch {
      case _: NoSuchElementException => Long.MaxValue
    }
    if (ne <= driverEdgeBudget &&
        e.schema("__s").dataType == e.schema("__d").dataType &&
        seeds.schema.head.dataType == e.schema("__s").dataType) {
      graft.core.TierStats.record("multiSourceBfs", "driver")
      val adj = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.ArrayBuffer[Any]]
      e.collect().foreach { r =>
        adj.getOrElseUpdate(r.get(0),
          scala.collection.mutable.ArrayBuffer.empty[Any]) += r.get(1)
      }
      val seedVals = seeds.select(col(seeds.columns.head)).distinct()
        .collect().map(_.get(0))
      val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      seedVals.foreach { s =>
        val dist = scala.collection.mutable.HashMap[Any, Int](s -> 0)
        var frontier: Seq[Any] = Seq(s)
        var r = 1
        while (r <= rounds && frontier.nonEmpty) {
          val next = frontier.flatMap(adj.getOrElse(_, Nil))
            .distinct.filterNot(dist.contains)
          next.foreach(dist(_) = r)
          frontier = next
          r += 1
        }
        dist.foreach { case (n, d) =>
          out += org.apache.spark.sql.Row(s, n, d)
        }
      }
      val nt = e.schema("__s").dataType
      return edges.sparkSession.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(out.toSeq).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("seed", nt),
          org.apache.spark.sql.types.StructField("node", nt),
          org.apache.spark.sql.types.StructField("dist",
            org.apache.spark.sql.types.IntegerType, nullable = false))))
    }
    graft.core.TierStats.record("multiSourceBfs", "distributed")
    var vis = seeds.select(col(seeds.columns.head).as("seed")).distinct()
      .select(col("seed"), col("seed").as("node"), lit(0).as("dist"))
      .localCheckpoint()
    var frontier = vis
    for (r <- 1 to rounds) {
      val next = e.join(frontier, e("__s") === frontier("node"))
        .select(col("seed"), col("__d").as("node")).distinct()
        .join(vis.select(col("seed"), col("node")), Seq("seed", "node"), "left_anti")
        .withColumn("dist", lit(r))
        .localCheckpoint()
      vis = vis.unionByName(next)
      frontier = next
    }
    vis
  }

  /** Closeness centrality of a seed set from a bounded-radius BFS
    * ([[multiSourceBfs]]): closeness n_reached / Σ dist (self excluded) and
    * harmonic closeness Σ 1/dist (the form that stays meaningful on
    * disconnected graphs), both over the nodes actually reached within
    * `rounds` hops — the standard sampled-seed approximation; exact when
    * `rounds` >= the graph diameter. Sums are hop-count integers (exact)
    * and dyadic-free reciprocals gridded by the round-6 output. */
  def closeness(edges: DataFrame, srcCol: String, dstCol: String,
                seeds: DataFrame, rounds: Int): DataFrame = {
    val bfs = multiSourceBfs(edges, srcCol, dstCol, seeds, rounds)
    bfs.where(col("dist") > 0)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(col("dist")).as("dist_sum"),
        round(sum(lit(1.0) / col("dist")), 6).as("harmonic"))
      .select(col("seed"), col("n_reached"),
        round(col("n_reached").cast("double") / col("dist_sum"), 6)
          .as("closeness"),
        col("harmonic"))
  }

  /** Degree-ordered DAG orientation of an undirected edge set: edges are
    * canonicalized (self-loops dropped, both directions collapsed, duplicates
    * removed) and then oriented from the lower-(degree, id) endpoint to the
    * higher one. Because (degree, id) is a strict total order, the result is
    * a DAG whose max out-degree is bounded by the graph's degeneracy — the
    * property that keeps the triangle join's per-key fan-out bounded even
    * when a hub node happens to hold a small id.
    */
  private[graft] def orientByDegree(edges: DataFrame, aCol: String,
                                    bCol: String): DataFrame = {
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val deg = und.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    und
      .join(deg.withColumnRenamed("node", "a").withColumnRenamed("deg", "deg_a"), "a")
      .join(deg.withColumnRenamed("node", "b").withColumnRenamed("deg", "deg_b"), "b")
      .select(
        when(col("deg_a") < col("deg_b") ||
            (col("deg_a") === col("deg_b") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
  }

  /** Per-node triangle participation over an UNDIRECTED graph. Input edges
    * may be in any form (symmetric, duplicated, self-looped) — the operator
    * canonicalizes internally, so a caller handing it pageRank's symmetric
    * edge list cannot multi-count. The classic two-join formulation over the
    * degree-oriented DAG ([[orientByDegree]]): each triangle appears exactly
    * once as a chain u→v, v→w, u→w under the (degree, id) total order; each
    * corner then credits its node. Nodes in the edge set with no triangles
    * keep a row with 0.
    *
    * Scale shape: two hash joins on single node keys plus one (u,w)-keyed
    * pair join; per-key fan-out on the chain join is bounded by the DAG's
    * max out-degree, which the degree orientation caps at the graph's
    * degeneracy (id-order alone would leave a small-id hub with its full
    * degree as out-degree — one hot key on a skewed graph). Counts
    * aggregate with map-side partials.
    */
  def trianglesPerNode(edges: DataFrame, aCol: String = "a",
                       bCol: String = "b"): DataFrame = {
    val e = orientByDegree(edges, aCol, bCol).localCheckpoint()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val corners = tri.select(col("x").as("node"))
      .union(tri.select(col("y").as("node")))
      .union(tri.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val nodes = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node"))).distinct()
    nodes.join(corners, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }

  /** k-core peeling: iteratively drop nodes with degree < k (with the
    * edges they carry) for `rounds` rounds — the density-filter that
    * separates cohesive cluster cores from hair. A fixed round count keeps
    * the gate replayable; peeling is monotone, so once a round removes
    * nothing the result IS the true k-core (the spec pins a fixture where
    * 3 rounds reach the fixpoint, including a chain that needs cascading
    * removals).
    *
    * Scale shape per round: one node-keyed degree agg (map-side partials)
    * + two semi-joins re-filtering the edge list; the edge list shrinks
    * monotonically, rounds localCheckpoint like the other iterative ops.
    * Returns surviving nodes with their final in-core degree.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Int,
            rounds: Int, driverEdgeBudget: Long = 500000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val obs = org.apache.spark.sql.Observation()
    var sym = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
      .observe(obs, count(lit(1)).as("ne"))
      .localCheckpoint()
    // peeling is pure integer degree arithmetic over the canonicalized
    // (type-coerced) edge list — under budget it runs driver-local;
    // missing metric fails SAFE to the loop (the pageRank convention)
    val ne = try obs.get("ne").asInstanceOf[Long] catch {
      case _: NoSuchElementException => Long.MaxValue
    }
    if (ne <= driverEdgeBudget) {
      graft.core.TierStats.record("kCore", "driver")
      var es = sym.collect().map(r => (r.get(0), r.get(1))).toSeq
      for (_ <- 1 to rounds) {
        val deg = es.groupBy(_._1).view.mapValues(_.size).toMap
        val keep = deg.collect { case (n, d) if d >= k => n }.toSet
        es = es.filter { case (s, d2) => keep(s) && keep(d2) }
      }
      val counts = es.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      val nt = sym.schema("src").dataType
      return edges.sparkSession.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(counts.map { case (n, c) =>
            org.apache.spark.sql.Row(n, c) }).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", nt),
          org.apache.spark.sql.types.StructField("core_deg",
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    graft.core.TierStats.record("kCore", "distributed")
    for (_ <- 1 to rounds) {
      val keep = sym.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select(col("node"))
      sym = sym
        .join(keep.withColumnRenamed("node", "src"), Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("node", "dst"), Seq("dst"), "left_semi")
        .select(col("src"), col("dst"))
        .localCheckpoint()
    }
    sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** Synchronous label propagation (community detection) with a fixed round
    * count. Input edges are UNDIRECTED in any form — canonicalized like
    * [[trianglesPerNode]] (dedup, self-loop drop), then symmetrized. Every
    * node starts labeled with itself; each round every node adopts the most
    * frequent label among its neighbors, ties broken by SMALLEST label —
    * the (count desc, label asc) rule that makes synchronous LPA fully
    * deterministic (the async coin-flip variant isn't replayable).
    *
    * Scale shape per round: one edge⋈labels hash join (edges re-partitioned
    * on src once, reused every round) + one (node,label)-keyed count with
    * map-side partials + one `min_by(label, (-count, label))` agg — the
    * argmax is a single aggregation, never a per-node sort. Lineage is
    * truncated per round with localCheckpoint, the same cadence as
    * [[pageRank]]. Converges-or-oscillates in O(diameter) rounds; a fixed
    * `iters` keeps the gate deterministic either way.
    */
  def labelPropagation(edges: DataFrame, aCol: String, bCol: String,
                       iters: Int,
                       driverEdgeBudget: Long = 500000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
    val obs = org.apache.spark.sql.Observation()
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
      .observe(obs, count(lit(1)).as("ne"))
      .localCheckpoint()
    // the (count desc, label asc) argmax needs an ordering over label
    // values — the local tier runs only for the types whose Spark sort
    // order it reproduces exactly ([[labelOrdering]]: integers, and
    // strings compared as UTF-8 bytes, Spark's binary collation); missing
    // metric fails SAFE to the loop (the pageRank convention)
    val ne = try obs.get("ne").asInstanceOf[Long] catch {
      case _: NoSuchElementException => Long.MaxValue
    }
    val ord = labelOrdering(sym.schema("src").dataType)
    if (ne <= driverEdgeBudget && ord.isDefined) {
      graft.core.TierStats.record("labelPropagation", "driver")
      implicit val o: Ordering[Any] = ord.get
      val es = sym.collect().map(r => (r.get(0), r.get(1)))
      val nodes = es.map(_._1).distinct
      var lbl = nodes.map(n => n -> n).toMap
      for (_ <- 1 to iters) {
        val counts = scala.collection.mutable.HashMap.empty[(Any, Any), Long]
        es.foreach { case (s, d) =>
          val key = (d, lbl(s))
          counts(key) = counts.getOrElse(key, 0L) + 1L
        }
        lbl = counts.toSeq
          .map { case ((n, l), c) => (n, l, c) }
          .groupBy(_._1).view
          .mapValues(_.minBy { case (_, l, c) => (-c, l) }(
            Ordering.Tuple2(Ordering.Long, o))._2)
          .toMap
      }
      val nt = sym.schema("src").dataType
      return edges.sparkSession.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(nodes.map(n =>
            org.apache.spark.sql.Row(n, lbl(n))).toSeq).asJava),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("node", nt),
          org.apache.spark.sql.types.StructField("community", nt))))
    }
    graft.core.TierStats.record("labelPropagation", "distributed")
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to iters) {
      labels = sym.join(labels, sym("src") === labels("node"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("c"))
        .groupBy(col("dst").as("node"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
        .localCheckpoint()
    }
    labels.select(col("node"), col("lbl").as("community"))
  }

  /** Common-neighbor link prediction: score non-adjacent node pairs by how
    * many neighbors they share (plus the Jaccard and cosine normalizations
    * of that count — both exact-arithmetic, unlike Adamic-Adar's `1/ln d`
    * whose last-ulp log makes cross-engine hashes unstable).
    *
    * Input is canonicalized internally (least/greatest + distinct,
    * self-loops dropped) — the [[labelPropagation]] convention.
    *
    * Scale shape: candidate pairs come from WEDGES (sym ⋈ sym on the middle
    * node), so a middle node of degree d fans out O(d²). That is the same
    * hub hazard [[trianglesPerNode]] dodges with degeneracy orientation —
    * but link prediction needs both wedge arms, so orientation can't save
    * it. The standard mitigation IS principled here: `maxMiddleDegree`
    * excludes hub middles entirely (a neighbor shared with everyone carries
    * no signal — the same reasoning that has Adamic-Adar downweight high
    * degree), bounding the join fan-out per key at the cap². Degrees are
    * computed BEFORE the cap so the Jaccard/cosine denominators stay true.
    * The existing-edge removal is an anti-join on the canonical pair key.
    */
  def linkPrediction(edges: DataFrame, aCol: String, bCol: String,
                     maxMiddleDegree: Int, minCommon: Int = 1): DataFrame = {
    require(maxMiddleDegree >= 1 && minCommon >= 1)
    val und = edges
      .select(least(col(aCol), col(bCol)).as("a"),
        greatest(col(aCol), col(bCol)).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    val sym = und.select(col("a").as("src"), col("b").as("dst"))
      .union(und.select(col("b").as("src"), col("a").as("dst")))
    val deg = sym.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg"))
    val mid = deg.where(col("deg") <= maxMiddleDegree).select(col("node"))
    val viaOk = sym.join(mid, sym("src") === mid("node")).drop("node")
    val wedges = viaOk.select(col("src").as("m"), col("dst").as("u"))
      .join(viaOk.select(col("src").as("m2"), col("dst").as("v")),
        col("m") === col("m2") && col("u") < col("v"))
      .select(col("u").as("a"), col("v").as("b"))
    val cn = wedges.groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
      .where(col("common") >= minCommon)
    val cand = cn.join(und, Seq("a", "b"), "left_anti")
    cand
      .join(deg.select(col("node").as("a"), col("deg").as("__da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("__db")), Seq("b"))
      .select(col("a"), col("b"), col("common"),
        round(col("common").cast("double") /
          (col("__da") + col("__db") - col("common")), 6).as("jaccard"),
        round(col("common").cast("double") /
          sqrt((col("__da") * col("__db")).cast("double")), 6).as("cosine"))
  }
}
