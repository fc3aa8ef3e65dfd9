package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** Temporal bipartite projection
  * (raphtory/src/algorithms/projections/temporal_bipartite_projection.rs:19-64):
  * for every pivot node, each pair of incident edge events within `delta`
  * (earlier event a, later event b, b.ts − a.ts ≤ delta) produces a
  * projected edge a.nbr → b.nbr at floor((a.ts + b.ts) / 2).
  *
  * The reference selects pivots by node_type; we take an explicit pivot
  * node set (a `vid` DataFrame) — same operation, caller supplies the
  * typing. Equal-time event pairs are ordered by the deterministic event
  * `seq` (the reference's order there is its internal iteration order).
  *
  * Spark shape: one self-join of the pivot-incident event table on
  * (pivot, time-window) — a range join; Catalyst evaluates it as a
  * partitioned equi-join on pivot with a windowed predicate, which is the
  * scalable form when pivots are many and individually small. */
object BipartiteProjection {

  /** Returns the projected temporal edge table (src, dst, ts) over vids. */
  def project(g: LinkGraph, pivotVids: DataFrame, delta: Long): DataFrame = {
    val p = pivotVids.select(col("vid").as("pivot"))
    // incident exploded events of each pivot: (pivot, nbr, ts, seq)
    // drop self-loop EVENTS first: a (v, v) event would enter the union
    // twice (once per side) and duplicate every projected edge it forms
    val e = g.edges.filter(col("src") =!= col("dst"))
    val visits = e.select(col("dst").as("pivot"), col("src").as("nbr"), col("ts"), col("seq"))
      .union(e.select(col("src").as("pivot"), col("dst").as("nbr"), col("ts"), col("seq")))
      .join(p, Seq("pivot"), "left_semi")
    val a = visits.select(col("pivot"), col("nbr").as("src_nbr"), col("ts").as("ta"), col("seq").as("sa"))
    val b = visits.select(col("pivot"), col("nbr").as("dst_nbr"), col("ts").as("tb"), col("seq").as("sb"))
    a.join(b, Seq("pivot"))
      .filter((col("ta") < col("tb") || (col("ta") === col("tb") && col("sa") < col("sb"))) &&
        col("tb") - col("ta") <= delta)
      .select(col("src_nbr").as("src"), col("dst_nbr").as("dst"),
        // average_floor over possibly-negative longs
        (col("ta") + floor((col("tb") - col("ta")) / 2).cast("long")).as("ts"))
  }

  /** Convenience: pivots by name set. */
  def projectByNames(g: LinkGraph, pivotNames: Seq[String], delta: Long): DataFrame =
    project(g, g.nodes.filter(col("name").isin(pivotNames: _*)).select(col("vid")), delta)
}
