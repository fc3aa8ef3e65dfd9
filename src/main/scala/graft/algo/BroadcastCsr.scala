package graft.algo

import graft.graph.LinkGraph

/** Whole-graph compact CSR for per-source fan-out algorithms (Brandes
  * betweenness, all-nodes in/out-components): each source's traversal is
  * independent, so sources parallelise as an RDD over ONE broadcast
  * adjacency. The edge table is packed EXECUTOR-side into one primitive
  * Array[Long] per partition ((srcIdx << 32) | dstIdx) so the driver
  * receives dense 8-byte/edge blocks, not boxed row objects.
  *
  * Callers must bound the collect with a DriverGuard first — the
  * broadcast-CSR regime requires the graph to fit executor memory anyway;
  * past the bound the recourse is per-source distributed frontier joins
  * or a sampled/sub-graph run. */
private[algo] object BroadcastCsr {

  /** (offsets, targets) over node indices 0..n-1 as mapped by `idx`;
    * `swap = true` reverses edge direction (in-adjacency). Distinct
    * neighbours (LinkGraph.dedupEdges). */
  def pack(g: LinkGraph, idx: Map[Long, Int], n: Int, swap: Boolean): (Array[Int], Array[Int]) = {
    val spark = g.spark
    import spark.implicits._
    val sc = spark.sparkContext
    val bcIdx = sc.broadcast(idx)
    val blocks = g.dedupEdges.as[(Long, Long)].rdd.mapPartitions { it =>
      val m = bcIdx.value
      val buf = new scala.collection.mutable.ArrayBuilder.ofLong
      it.foreach { case (s0, d0) =>
        val s = if (swap) d0 else s0
        val d = if (swap) s0 else d0
        buf += (m(s).toLong << 32) | (m(d).toLong & 0xffffffffL)
      }
      Iterator(buf.result())
    }.collect()
    bcIdx.destroy()
    val mEdges = blocks.iterator.map(_.length).sum
    val packed = new Array[Long](mEdges)
    var off = 0
    blocks.foreach { a => System.arraycopy(a, 0, packed, off, a.length); off += a.length }
    // srcIdx rides the high 32 bits, so a primitive sort IS the CSR order
    java.util.Arrays.sort(packed)
    val offsets = new Array[Int](n + 1)
    var i = 0
    while (i < mEdges) { offsets(((packed(i) >>> 32) + 1).toInt) += 1; i += 1 }
    i = 1
    while (i <= n) { offsets(i) += offsets(i - 1); i += 1 }
    val targets = new Array[Int](mEdges)
    i = 0
    while (i < mEdges) { targets(i) = (packed(i) & 0xffffffffL).toInt; i += 1 }
    (offsets, targets)
  }
}
