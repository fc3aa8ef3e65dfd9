package graft.bsp

import graft.graph.{CsrGraph, CsrBlock}

/** Superstep drivers over the CSR fast path (SURVEY §4.3): one Spark job
  * per superstep — broadcast the previous dense state, gather per CSR
  * block, stitch the returned dense segments on the driver. Semantics are
  * identical to the shuffle-based DataFrame supersteps; only the physical
  * plan differs. */
object CsrSuperstep {

  /** PageRank with the reference semantics (pagerank.rs:55-183); returns the
    * dense score array (absent ids hold 0.0). */
  def pageRank(csr: CsrGraph, outDeg: Array[Int], iterCount: Int, tol: Double,
               damping: Double, useL2Norm: Boolean,
               ctx: RunContext = RunContext.none): Array[Double] = {
    val sc = csr.blocks.sparkContext
    val n = csr.n
    val nP = csr.nPresent
    if (nP == 0) return new Array[Double](n)
    val teleport = (1.0 - damping) / nP
    val factor = damping / nP
    val present = csr.present

    var score = new Array[Double](n)
    var v = 0
    while (v < n) { if (present(v)) score(v) = 1.0 / nP; v += 1 }

    var step = 0
    var converged = false
    while (!converged && step < iterCount) {
      step += 1
      val t0 = System.nanoTime()
      // contrib[u] = prev(u) / outdeg(u); sink mass from prev scores
      val contrib = new Array[Double](n)
      var sinkMass = 0.0
      var u = 0
      while (u < n) {
        if (present(u)) {
          if (outDeg(u) > 0) contrib(u) = score(u) / outDeg(u)
          else sinkMass += score(u)
        }
        u += 1
      }
      val sinkContrib = factor * sinkMass
      val bc = sc.broadcast(contrib)
      val segments = csr.blocks.map { b =>
        val c = bc.value
        val out = new Array[Double](b.hi - b.lo)
        var i = 0
        while (i < out.length) {
          var acc = 0.0
          var k = b.offsets(i)
          val end = b.offsets(i + 1)
          while (k < end) { acc += c(b.srcs(k)); k += 1 }
          out(i) = acc
          i += 1
        }
        (b.lo, out)
      }.collect()
      bc.destroy()
      val next = new Array[Double](n)
      for ((lo, seg) <- segments) System.arraycopy(seg, 0, next, lo, seg.length)
      var delta = 0.0
      var w = 0
      while (w < n) {
        if (present(w)) {
          next(w) = damping * next(w) + teleport + sinkContrib
          val d = score(w) - next(w)
          delta += (if (useL2Norm) d * d else math.abs(d))
        } else next(w) = 0.0
        w += 1
      }
      score = next
      val normed = if (useL2Norm) math.sqrt(delta) else delta
      converged = normed <= tol * nP
      ctx.record(StepStat("pagerank-csr", step, csr.edgeCount, csr.edgeCount, normed,
        (System.nanoTime() - t0) / 1e6))
    }
    score
  }

  /** Min-label propagation (connected_components.rs:34-93) over an
    * undirected CSR; returns the dense label array (absent ids = -1). */
  def wcc(csr: CsrGraph, iterCount: Long = Long.MaxValue,
          ctx: RunContext = RunContext.none): Array[Int] = {
    val sc = csr.blocks.sparkContext
    val n = csr.n
    val present = csr.present
    var labels = new Array[Int](n)
    var v = 0
    while (v < n) { labels(v) = if (present(v)) v else -1; v += 1 }

    var step = 0L
    var done = false
    // +1: the init min-neighbour pass is step 0 (guard Long overflow)
    val maxSteps = if (iterCount > Long.MaxValue - 1) Long.MaxValue else iterCount + 1
    while (!done && step < maxSteps) {
      val t0 = System.nanoTime()
      val bc = sc.broadcast(labels)
      val segments = csr.blocks.map { b =>
        val l = bc.value
        val out = new Array[Int](b.hi - b.lo)
        var i = 0
        while (i < out.length) {
          var m = Int.MaxValue
          var k = b.offsets(i)
          val end = b.offsets(i + 1)
          while (k < end) { val c = l(b.srcs(k)); if (c < m) m = c; k += 1 }
          out(i) = m
          i += 1
        }
        (b.lo, out)
      }.collect()
      bc.destroy()
      var changed = 0L
      val next = labels.clone()
      for ((lo, seg) <- segments) {
        var i = 0
        while (i < seg.length) {
          val w = lo + i
          if (present(w) && seg(i) < next(w)) { next(w) = seg(i); changed += 1 }
          i += 1
        }
      }
      labels = next
      done = changed == 0 && step > 0
      ctx.record(StepStat("wcc-csr", step.toInt, csr.edgeCount, csr.edgeCount,
        changed.toDouble, (System.nanoTime() - t0) / 1e6))
      step += 1
    }
    labels
  }
}
