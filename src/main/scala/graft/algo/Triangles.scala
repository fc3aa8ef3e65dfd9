package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions}
import org.apache.spark.storage.StorageLevel
import graft.graph.LinkGraph

/** Global triangle count with the reference's semantics
  * (raphtory/src/algorithms/motifs/triangle_count.rs:64-127): undirected,
  * multi-edge-collapsed, self-loops never count, each triangle counted once.
  * The reference restricts to the 2-core first (an optimisation, not a
  * semantic change) — kept as a flag, default OFF: the iterative peel
  * costs several full-graph shuffle rounds while the degree-ordered
  * enumeration below already bounds the wedge join at O(m^1.5), and
  * non-core edges close no wedges so they fall out of the equi-joins
  * on their own.
  *
  * Physical shape: the degree-ordered node-iterator join. Edges are oriented
  * from the lower (degree, id) endpoint to the higher, which bounds the
  * wedge-join fan-out by O(m^1.5) and keeps hub skew off the wedge build —
  * the standard scalable formulation for web-graph degree distributions.
  * All joins are equi-joins so Catalyst keeps shuffle-hash/sort-merge plans.
  */
object Triangles {

  def count(g: LinkGraph, useKCore: Boolean = false): Long = {
    val base = if (useKCore) g.subgraph(KCore.coreSet(g, 2)) else g
    triangleCountOf(undirectedSimple(base))
  }

  /** Canonical undirected simple edges (a < b), self-loops dropped. */
  private[graft] def undirectedSimple(g: LinkGraph): DataFrame = {
    g.dedupEdges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  private[graft] def triangleCountOf(und0: DataFrame): Long = {
    val und = und0.persist(StorageLevel.MEMORY_AND_DISK)
    val (tri, oriented) = enumerate(und)
    val n = tri.count()
    oriented.unpersist(); und.unpersist()
    n
  }

  /** Enumerate each triangle exactly once as (c, x, y): c = the wedge
    * centre under degree-ordered orientation, x < y its two closing
    * endpoints. `und` must be the canonical (a < b) simple edge table.
    * The degree-order orientation bounds the wedge fan-out by O(m^1.5)
    * regardless of hub degrees — every caller (global count, per-node
    * credits) goes through this one shape so no O(Σ d²) wedge build
    * exists anywhere. Returns (triangles, the persisted oriented edge
    * table — unpersist it after consuming the triangles). */
  private[graft] def enumerate(und: DataFrame): (DataFrame, DataFrame) = {
    // degree-order orientation: lo -> hi by (degree, id)
    val deg = und.select(col("a").as("v")).union(und.select(col("b").as("v")))
      .groupBy("v").agg(functions.count(lit(1)).as("d"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("lo"),
        when(aFirst, col("b")).otherwise(col("a")).as("hi"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    oriented.count()
    // wedges centred at lo: pairs of oriented out-neighbours, canonicalised
    val e1 = oriented.select(col("lo").as("c"), col("hi").as("x"))
    val e2 = oriented.select(col("lo").as("c"), col("hi").as("y"))
    val wedges = e1.join(e2, "c").filter(col("x") < col("y"))
    // close the wedge with the canonical undirected edge (x, y)
    val tri = wedges.join(und, col("x") === und("a") && col("y") === und("b"))
      .select(col("c"), col("x"), col("y"))
    (tri, oriented)
  }

  /** Per-node triangle participation over the undirected simple graph:
    * (vid, triangles). Each oriented triangle is enumerated once and
    * explodes exactly 3 member credits — same O(m^1.5) bound as the
    * global count (the naive per-node formulation wedge-joins the full
    * undirected adjacency, which is O(Σ d_v²): a 10^6-degree hub alone
    * yields 10^12 wedge rows). Used by local clustering coefficient
    * (metrics/local_clustering_coefficient.rs:57-77). */
  def perNode(g: LinkGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val und = undirectedSimple(g).persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    val (tri, oriented) = enumerate(und)
    val credits = tri.select(explode(array($"c", $"x", $"y")).as("vid"))
    val res = credits.groupBy($"vid").agg(functions.count(lit(1)).as("triangles"))
    val out = g.nodes.select($"vid")
      .join(res, Seq("vid"), "left")
      .select($"vid", coalesce($"triangles", lit(0L)).as("triangles"))
      .localCheckpoint(true)
    oriented.unpersist(); und.unpersist()
    out
  }
}
