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
  * semantic change) — we keep that as a flag.
  *
  * Physical shape: the degree-ordered node-iterator join. Edges are oriented
  * from the lower (degree, id) endpoint to the higher, which bounds the
  * wedge-join fan-out by O(m^1.5) and keeps hub skew off the wedge build —
  * the standard scalable formulation for web-graph degree distributions.
  * All joins are equi-joins so Catalyst keeps shuffle-hash/sort-merge plans.
  */
object Triangles {

  def count(g: LinkGraph, useKCore: Boolean = true): Long = {
    val base = if (useKCore) g.subgraph(KCore.coreSet(g, 2)) else g
    triangleCountOf(undirectedSimple(base))
  }

  /** Canonical undirected simple edges (a < b), self-loops dropped. */
  private[algo] def undirectedSimple(g: LinkGraph): DataFrame = {
    g.dedupEdges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  private[algo] def triangleCountOf(und0: DataFrame): Long = {
    val und = und0.persist(StorageLevel.MEMORY_AND_DISK)
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
    val n = wedges.join(und, col("x") === und("a") && col("y") === und("b")).count()
    oriented.unpersist(); und.unpersist()
    n
  }

  /** Per-node triangle participation over the undirected simple graph:
    * (vid, triangles). Each triangle contributes once per member (it is the
    * wedge centre of exactly one closing wedge). Used by local clustering
    * coefficient (metrics/local_clustering_coefficient.rs:57-77). */
  def perNode(g: LinkGraph): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val und = undirectedSimple(g).persist(StorageLevel.MEMORY_AND_DISK)
    und.count()
    // full undirected adjacency (both orientations)
    val adj1 = und.select($"a".as("c"), $"b".as("x"))
      .union(und.select($"b".as("c"), $"a".as("x")))
    val adj2 = adj1.select($"c", $"x".as("y"))
    val wedges = adj1.join(adj2, "c").filter($"x" < $"y")
    val tri = wedges.join(und, $"x" === und("a") && $"y" === und("b"))
    val res = tri.groupBy($"c".as("vid")).agg(functions.count(lit(1)).as("triangles"))
    val out = g.nodes.select($"vid")
      .join(res, Seq("vid"), "left")
      .select($"vid", coalesce($"triangles", lit(0L)).as("triangles"))
    und.unpersist()
    out
  }
}
