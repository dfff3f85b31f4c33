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

  /** Weighted PageRank with a fixed iteration count.
    *
    * `edges` is a DIRECTED weighted edge list (undirected graphs pass both
    * directions). Per iteration: rank mass flows src -> dst proportionally
    * to edge weight / weighted out-degree, then every node takes
    * (1-damping)/n teleport plus damping * inflow. Nodes appearing only as
    * destinations still hold rank; mass leaving a node with no out-edges
    * (dangling) is dropped, not redistributed — symmetric edge lists (our
    * callers) have no dangling nodes, and the ANSI oracle replays exactly
    * this definition.
    *
    * Scale shape: the per-iteration join keys ranks and normalized edges on
    * src (both hash-partitioned on the same key, so consecutive iterations
    * reuse the partitioning), the inflow aggregate is dst-keyed with
    * map-side partials, and the edge-probability table is computed ONCE and
    * persisted. The only driver-side scalar is the node count.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int, damping: Double = 0.85): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"damping in (0,1), got $damping")
    val e0 = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
      col(weightCol).cast("double").as("w"))
    val nodes = e0.select(col("src").as("node"))
      .union(e0.select(col("dst").as("node"))).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "pageRank needs a non-empty edge set")
    val wdeg = e0.groupBy(col("src")).agg(sum(col("w")).as("wdeg"))
    val ep = e0.join(wdeg, "src")
      .select(col("src"), col("dst"), (col("w") / col("wdeg")).as("p"))
      .localCheckpoint()
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (i <- 1 to iters) {
      val contribs = ep.join(ranks, ep("src") === ranks("node"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("rank") * col("p")).as("contrib"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("contrib"), lit(0.0))).as("rank"))
      // truncate the growing join lineage the way connectedComponents does
      if (i % 3 == 0 && i < iters) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("node"), round(col("rank"), 4).as("pagerank"))
  }

  /** Per-node triangle participation over an UNDIRECTED graph given as
    * canonical edges (a < b). The classic two-join formulation: a triangle
    * a<b<c is the row pattern e(a,b) ⋈ e(b,c) ⋈ e(a,c); each corner then
    * credits its node. Nodes in the edge set with no triangles keep a row
    * with 0.
    *
    * Scale shape: two hash joins on single node keys plus one (a,c)-keyed
    * pair join; fan-out is bounded by the graph's degeneracy (the canonical
    * a<b orientation is the standard trick that caps per-node join width at
    * out-degree, not full degree). Counts aggregate with map-side partials.
    */
  def trianglesPerNode(edges: DataFrame, aCol: String = "a",
                       bCol: String = "b"): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("x"), col("e1.b").as("y"), col("e2.b").as("z"))
    val corners = tri.select(col("x").as("node"))
      .union(tri.select(col("y").as("node")))
      .union(tri.select(col("z").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node"))).distinct()
    nodes.join(corners, Seq("node"), "left")
      .select(col("node"), coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
  }
}
