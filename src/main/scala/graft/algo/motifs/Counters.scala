package graft.algo.motifs

/** Sliding-window delta-temporal motif counters after Paranjape, Benson &
  * Leskovec, "Motifs in Temporal Networks" (WSDM 2017) §3.2–3.4.
  *
  * DERIVATION NOTE: the reference engine implements the same published
  * counting scheme (raphtory/src/algorithms/motifs/three_node_motifs.rs);
  * the update algebra below necessarily mirrors it because the paper's exact
  * O(events) recurrences and the reference's 40-slot output layout are the
  * spec both engines share. The decomposition here is our own: a common
  * two-pointer `DeltaSweep` drives all window motion, and each counter
  * only implements the paper's count-update hooks.
  *
  * Index conventions (paper Fig. 4 / reference layout doc
  * python/packages/algorithms.rs:405-449): directions IN = 0, OUT = 1;
  * flat indices pair(d1,d2) = 2·d1+d2 and triple(d1,d2,d3) = 4·d1+2·d2+d3.
  */
object Counters {

  final val IN = 0
  final val OUT = 1
  @inline def pair(d1: Int, d2: Int): Int = 2 * d1 + d2
  @inline def triple(d1: Int, d2: Int, d3: Int): Int = 4 * d1 + 2 * d2 + d3

  /** The paper's delta-window event sweep: for each current event j, the
    * pre-window holds earlier events with t ≥ t_j − delta, the post-window
    * later events with t ≤ t_j + delta (event order is the (ts, seq) sort
    * order, so equal-time events are ordered by sequence). Hooks fire as
    * events cross window boundaries. */
  trait DeltaSweep {
    /** event i leaves the pre-window (too old for current j) */
    protected def expirePre(i: Int): Unit
    /** event i enters the post-window */
    protected def admitPost(i: Int): Unit
    /** event j stops being "future": leaves the post-window to be counted */
    protected def retireFromPost(j: Int): Unit
    /** count the motifs completed by current event j */
    protected def countCurrent(j: Int): Unit
    /** event j becomes "past": enters the pre-window */
    protected def admitPre(j: Int): Unit

    final def sweep(times: Array[Long], delta: Long): Unit = {
      val l = times.length
      var start = 0
      var end = 0
      var j = 0
      while (j < l) {
        while (start < l && times(start) + delta < times(j)) { expirePre(start); start += 1 }
        while (end < l && times(end) <= times(j) + delta) { admitPost(end); end += 1 }
        retireFromPost(j)
        countCurrent(j)
        admitPre(j)
        j += 1
      }
    }
  }

  /** Two-node (single-pair) motif counter, paper §3.2: counts ordered
    * event triples on one node pair within delta. Events: dirs relative to
    * the counting endpoint. Only a pre-window is needed — the current
    * event always closes the triple. */
  final class PairCounter {
    private val c1 = new Array[Long](2)  // single events in window
    private val c2 = new Array[Long](4)  // ordered pairs in window
    val counts = new Array[Long](8)      // ordered triples (the motifs)

    def run(dirs: Array[Int], times: Array[Long], delta: Long): Unit = {
      var start = 0
      var j = 0
      while (j < dirs.length) {
        while (times(start) + delta < times(j)) {
          val d = dirs(start)
          c1(d) -= 1
          c2(pair(d, IN)) -= c1(IN)
          c2(pair(d, OUT)) -= c1(OUT)
          start += 1
        }
        val dir = dirs(j)
        var d1 = 0
        while (d1 < 2) {
          var d2 = 0
          while (d2 < 2) {
            counts(triple(d1, d2, dir)) += c2(pair(d1, d2))
            d2 += 1
          }
          d1 += 1
        }
        c2(pair(IN, dir)) += c1(IN)
        c2(pair(OUT, dir)) += c1(OUT)
        c1(dir) += 1
        j += 1
      }
    }
  }

  /** Star (single-centre) motif counter, paper §3.3: counts triples of
    * events incident to one centre where the two outer events share a
    * neighbour, classified PRE (pair before the odd event), MID
    * (straddling), POST (pair after). Neighbours are pre-indexed 0..n-1.
    *
    * Raw counts include the all-same-neighbour triples; callers subtract
    * the PairCounter totals to get proper 3-node stars (paper eq. 1). */
  final class StarCounter(n: Int, nbs: Array[Int], dirs: Array[Int]) extends DeltaSweep {
    private val preNodes = new Array[Long](2 * n)   // (dir, nb) events in pre-window
    private val postNodes = new Array[Long](2 * n)  // (dir, nb) events in post-window
    private val preSum = new Array[Long](8)   // same-nb ordered pairs, both pre
    private val midSum = new Array[Long](8)   // same-nb pairs straddling current
    private val postSum = new Array[Long](8)  // same-nb ordered pairs, both post
    val countPre = new Array[Long](8)
    val countMid = new Array[Long](8)
    val countPost = new Array[Long](8)

    protected def expirePre(i: Int): Unit = {
      val nb = nbs(i); val d = dirs(i)
      preNodes(d * n + nb) -= 1
      preSum(pair(d, IN)) -= preNodes(IN * n + nb)
      preSum(pair(d, OUT)) -= preNodes(OUT * n + nb)
    }
    protected def admitPost(i: Int): Unit = {
      val nb = nbs(i); val d = dirs(i)
      postSum(pair(IN, d)) += postNodes(IN * n + nb)
      postSum(pair(OUT, d)) += postNodes(OUT * n + nb)
      postNodes(d * n + nb) += 1
    }
    protected def retireFromPost(j: Int): Unit = {
      val nb = nbs(j); val d = dirs(j)
      postNodes(d * n + nb) -= 1
      postSum(pair(d, IN)) -= postNodes(IN * n + nb)
      postSum(pair(d, OUT)) -= postNodes(OUT * n + nb)
    }
    protected def countCurrent(j: Int): Unit = {
      val nb = nbs(j); val dir = dirs(j)
      midSum(pair(IN, dir)) -= preNodes(IN * n + nb)
      midSum(pair(OUT, dir)) -= preNodes(OUT * n + nb)
      var d1 = 0
      while (d1 < 2) {
        var d2 = 0
        while (d2 < 2) {
          countPre(triple(d1, d2, dir)) += preSum(pair(d1, d2))
          countPost(triple(dir, d1, d2)) += postSum(pair(d1, d2))
          countMid(triple(d1, dir, d2)) += midSum(pair(d1, d2))
          d2 += 1
        }
        d1 += 1
      }
      midSum(pair(dir, IN)) += postNodes(IN * n + nb)
      midSum(pair(dir, OUT)) += postNodes(OUT * n + nb)
    }
    protected def admitPre(j: Int): Unit = {
      val nb = nbs(j); val d = dirs(j)
      preSum(pair(IN, d)) += preNodes(IN * n + nb)
      preSum(pair(OUT, d)) += preNodes(OUT * n + nb)
      preNodes(d * n + nb) += 1
    }

    /** 24 raw star counts in reference layout order: PRE ++ MID ++ POST. */
    def counts24: Array[Long] = countPre ++ countMid ++ countPost
  }

  /** Triangle motif counter, paper §3.4, for ONE triangle's merged event
    * stream. Events are encoded relative to a designated base pair (u, v)
    * and third node w: `onBase(i)` marks u↔v events; for w events,
    * `wPartner(i)` = 0 if the event links w with u, 1 with v; `dirs(i)` =
    * the reference's direction code (w events: 0 = from w, 1 = into w;
    * base events: 1 = u→v, 0 = v→u). The 8 closed motif classes
    * accumulate in `counts` when a base event completes a triple. */
  final class TriangleCounter(onBase: Array[Boolean], wPartner: Array[Int], dirs: Array[Int])
      extends DeltaSweep {
    private val preNodes = new Array[Long](4)
    private val postNodes = new Array[Long](4)
    private val preSum = new Array[Long](8)
    private val midSum = new Array[Long](8)
    private val postSum = new Array[Long](8)
    val counts = new Array[Long](8)

    protected def expirePre(i: Int): Unit = if (!onBase(i)) {
      val w = wPartner(i); val d = dirs(i)
      preNodes(pair(d, w)) -= 1
      preSum(triple(w, d, IN)) -= preNodes(pair(IN, 1 - w))
      preSum(triple(w, d, OUT)) -= preNodes(pair(OUT, 1 - w))
    }
    protected def admitPost(i: Int): Unit = if (!onBase(i)) {
      val w = wPartner(i); val d = dirs(i)
      postSum(triple(1 - w, IN, d)) += postNodes(pair(IN, 1 - w))
      postSum(triple(1 - w, OUT, d)) += postNodes(pair(OUT, 1 - w))
      postNodes(pair(d, w)) += 1
    }
    protected def retireFromPost(j: Int): Unit = if (!onBase(j)) {
      val w = wPartner(j); val d = dirs(j)
      postNodes(pair(d, w)) -= 1
      postSum(triple(w, d, IN)) -= postNodes(pair(IN, 1 - w))
      postSum(triple(w, d, OUT)) -= postNodes(pair(OUT, 1 - w))
    }
    protected def countCurrent(j: Int): Unit = {
      val w = wPartner(j); val d = dirs(j)
      if (!onBase(j)) {
        midSum(triple(1 - w, IN, d)) -= preNodes(pair(IN, 1 - w))
        midSum(triple(1 - w, OUT, d)) -= preNodes(pair(OUT, 1 - w))
        midSum(triple(w, d, IN)) += postNodes(pair(IN, 1 - w))
        midSum(triple(w, d, OUT)) += postNodes(pair(OUT, 1 - w))
      } else {
        // the 8 closed-triangle classes (reference slot order 32..39)
        counts(0) += midSum(triple(d, 0, 0)) + postSum(triple(d, 0, 1)) + preSum(triple(1 - d, 1, 1))
        counts(4) += midSum(triple(d, 1, 0)) + postSum(triple(1 - d, 0, 1)) + preSum(triple(1 - d, 0, 1))
        counts(2) += midSum(triple(1 - d, 0, 0)) + postSum(triple(d, 1, 1)) + preSum(triple(1 - d, 1, 0))
        counts(6) += midSum(triple(1 - d, 1, 0)) + postSum(triple(1 - d, 1, 1)) + preSum(triple(1 - d, 0, 0))
        counts(1) += midSum(triple(d, 0, 1)) + postSum(triple(d, 0, 0)) + preSum(triple(d, 1, 1))
        counts(5) += midSum(triple(d, 1, 1)) + postSum(triple(1 - d, 0, 0)) + preSum(triple(d, 0, 1))
        counts(3) += midSum(triple(1 - d, 0, 1)) + postSum(triple(d, 1, 0)) + preSum(triple(d, 1, 0))
        counts(7) += midSum(triple(1 - d, 1, 1)) + postSum(triple(1 - d, 1, 0)) + preSum(triple(d, 0, 0))
      }
    }
    protected def admitPre(j: Int): Unit = if (!onBase(j)) {
      val w = wPartner(j); val d = dirs(j)
      preSum(triple(1 - w, IN, d)) += preNodes(pair(IN, 1 - w))
      preSum(triple(1 - w, OUT, d)) += preNodes(pair(OUT, 1 - w))
      preNodes(pair(d, w)) += 1
    }
  }
}
