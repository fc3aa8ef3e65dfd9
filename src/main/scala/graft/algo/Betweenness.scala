package graft.algo

import org.apache.spark.sql.DataFrame
import graft.graph.LinkGraph

/** Betweenness centrality — Brandes over distinct OUT-neighbours with an
  * optional first-k-sources sample and 1/((n−1)(n−2)) normalisation,
  * exactly the reference's sequential algorithm
  * (raphtory/src/algorithms/centrality/betweenness.rs:21-115). The
  * reference runs single-threaded over the whole graph; we do the same on
  * the collected distinct adjacency (driver-bounded — the per-source BFS
  * fan-out parallelisation is the documented scale path, SURVEY §2.4.5). */
object Betweenness {

  /** Returns (vid, name, value). Sources = first `k` nodes in VID order
    * (all nodes when k = None). */
  def run(g: LinkGraph, k: Option[Int] = None, normalized: Boolean = false): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val nodes = g.nodes.as[(Long, String)].collect().sortBy(_._1)
    val n = nodes.length
    val idx = nodes.map(_._1).zipWithIndex.toMap
    val adj = Array.fill(n)(List.empty[Int])
    g.dedupEdges.as[(Long, Long)].collect().foreach { case (s, d) =>
      adj(idx(s)) = idx(d) :: adj(idx(s))
    }
    val betweenness = new Array[Double](n)
    val kSample = k.getOrElse(n).min(n)

    for (s <- 0 until kSample) {
      val stack = scala.collection.mutable.ArrayBuffer.empty[Int]
      val preds = Array.fill(n)(List.empty[Int])
      val sigma = new Array[Double](n)
      val dist = Array.fill(n)(-1L)
      val queue = scala.collection.mutable.Queue.empty[Int]
      sigma(s) = 1.0; dist(s) = 0L; queue.enqueue(s)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        stack += v
        adj(v).foreach { w =>
          if (dist(w) < 0) { queue.enqueue(w); dist(w) = dist(v) + 1 }
          if (dist(w) == dist(v) + 1) { sigma(w) += sigma(v); preds(w) = v :: preds(w) }
        }
      }
      val delta = new Array[Double](n)
      while (stack.nonEmpty) {
        val w = stack.remove(stack.length - 1)
        preds(w).foreach { v => delta(v) += (sigma(v) / sigma(w)) * (1.0 + delta(w)) }
        if (w != s) betweenness(w) += delta(w)
      }
    }
    val factor = if (normalized) 1.0 / ((n - 1.0) * (n - 2.0)) else 1.0
    val rows = nodes.indices.map(i => (nodes(i)._1, nodes(i)._2, betweenness(i) * factor))
    spark.createDataset(rows).toDF("vid", "name", "value")
  }
}
