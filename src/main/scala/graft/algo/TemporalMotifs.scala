package graft.algo

import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** Delta-temporal 3-node motif census — Paranjape, Benson & Leskovec,
  * "Motifs in Temporal Networks" (WSDM 2017) — with the reference's exact
  * counting semantics and 40-element output layout
  * (raphtory/src/algorithms/motifs/global_temporal_three_node_motifs.rs:27-314,
  * counter scheme three_node_motifs.rs; layout doc
  * python/packages/algorithms.rs:405-449):
  *
  *   [0..23]  star motifs, classes PRE | MID | POST × directions
  *            III..OOO (two-node motifs subtracted out),
  *   [24..31] two-node motifs III..OOO (counted from both endpoints),
  *   [32..39] the 8 delta-temporal triangle motifs.
  *
  * Spark shape: the per-node star/two-node counters run inside
  * `groupByKey(node).mapGroups` over the node's incident event list (the
  * counters are O(events) sliding-window algorithms from the paper); the
  * per-triangle counter runs per triangle discovered by the degree-ordered
  * wedge join, with the triangle's 6 directed event streams assembled by an
  * unordered-pair join. Both stages are embarrassingly parallel.
  */
object TemporalMotifs {

  private val IN = 0
  private val OUT = 1
  private val Dirs2d = Array((0, 0), (0, 1), (1, 0), (1, 1))
  @inline private def m2(d1: Int, d2: Int): Int = 2 * d1 + d2
  @inline private def m3(d1: Int, d2: Int, d3: Int): Int = 4 * d1 + 2 * d2 + d3

  /** Sliding-window two-node motif counter (paper §3.2). Events: (dir, ts)
    * in time order. */
  private final class TwoNodeCounter {
    private val c1 = new Array[Long](2)
    private val c2 = new Array[Long](4)
    val c3 = new Array[Long](8)

    def execute(dirs: Array[Int], times: Array[Long], delta: Long): Unit = {
      var start = 0
      var j = 0
      while (j < dirs.length) {
        while (times(start) + delta < times(j)) {
          val d = dirs(start)
          c1(d) -= 1
          c2(m2(d, IN)) -= c1(IN)
          c2(m2(d, OUT)) -= c1(OUT)
          start += 1
        }
        val dir = dirs(j)
        var i = 0
        while (i < 4) {
          val (d1, d2) = Dirs2d(i)
          c3(m3(d1, d2, dir)) += c2(m2(d1, d2))
          i += 1
        }
        c2(m2(IN, dir)) += c1(IN)
        c2(m2(OUT, dir)) += c1(OUT)
        c1(dir) += 1
        j += 1
      }
    }
  }

  /** Sliding-window star motif counter over a node's incident events
    * (nb = dense neighbour index, dir, ts). */
  private final class StarCounter(n: Int) {
    private val preNodes = new Array[Long](2 * n)
    private val postNodes = new Array[Long](2 * n)
    private val preSum = new Array[Long](8)
    private val midSum = new Array[Long](8)
    private val postSum = new Array[Long](8)
    val countPre = new Array[Long](8)
    val countMid = new Array[Long](8)
    val countPost = new Array[Long](8)

    private def pushPre(nb: Int, dir: Int): Unit = {
      preSum(m2(IN, dir)) += preNodes(IN * n + nb)
      preSum(m2(OUT, dir)) += preNodes(OUT * n + nb)
      preNodes(dir * n + nb) += 1
    }
    private def pushPost(nb: Int, dir: Int): Unit = {
      postSum(m2(IN, dir)) += postNodes(IN * n + nb)
      postSum(m2(OUT, dir)) += postNodes(OUT * n + nb)
      postNodes(dir * n + nb) += 1
    }
    private def popPre(nb: Int, dir: Int): Unit = {
      preNodes(dir * n + nb) -= 1
      preSum(m2(dir, IN)) -= preNodes(IN * n + nb)
      preSum(m2(dir, OUT)) -= preNodes(OUT * n + nb)
    }
    private def popPost(nb: Int, dir: Int): Unit = {
      postNodes(dir * n + nb) -= 1
      postSum(m2(dir, IN)) -= postNodes(IN * n + nb)
      postSum(m2(dir, OUT)) -= postNodes(OUT * n + nb)
    }
    private def processCurrent(nb: Int, dir: Int): Unit = {
      midSum(m2(IN, dir)) -= preNodes(IN * n + nb)
      midSum(m2(OUT, dir)) -= preNodes(OUT * n + nb)
      var i = 0
      while (i < 4) {
        val (d1, d2) = Dirs2d(i)
        countPre(m3(d1, d2, dir)) += preSum(m2(d1, d2))
        countPost(m3(dir, d1, d2)) += postSum(m2(d1, d2))
        countMid(m3(d1, dir, d2)) += midSum(m2(d1, d2))
        i += 1
      }
      midSum(m2(dir, IN)) += postNodes(IN * n + nb)
      midSum(m2(dir, OUT)) += postNodes(OUT * n + nb)
    }

    def execute(nbs: Array[Int], dirs: Array[Int], times: Array[Long], delta: Long): Unit = {
      val l = nbs.length
      if (l < 3) return
      var start = 0
      var end = 0
      var j = 0
      while (j < l) {
        while (start < l && times(start) + delta < times(j)) {
          popPre(nbs(start), dirs(start)); start += 1
        }
        while (end < l && times(end) <= times(j) + delta) {
          pushPost(nbs(end), dirs(end)); end += 1
        }
        popPost(nbs(j), dirs(j))
        processCurrent(nbs(j), dirs(j))
        pushPre(nbs(j), dirs(j))
        j += 1
      }
    }

    def counts24: Array[Long] = countPre ++ countMid ++ countPost
  }

  /** Sliding-window triangle motif counter over one triangle's 6 directed
    * event streams; events encoded as (uvEdge, uorv, dir, ts) — u = middle
    * id, v = smallest, the third node is the largest. */
  private final class TriangleCounter {
    // per-(dir, uorv) counts for the non-uv events (nb is always 0)
    private val preNodes = new Array[Long](4)
    private val postNodes = new Array[Long](4)
    private val preSum = new Array[Long](8)
    private val midSum = new Array[Long](8)
    private val postSum = new Array[Long](8)
    val finalCounts = new Array[Long](8)

    def execute(uv: Array[Boolean], uorv: Array[Int], dirs: Array[Int],
                times: Array[Long], delta: Long): Unit = {
      val l = uv.length
      if (l < 3) return

      def popPre(i: Int): Unit = if (!uv(i)) {
        val (w, d) = (uorv(i), dirs(i))
        preNodes(m2(d, w)) -= 1
        preSum(m3(w, d, IN)) -= preNodes(m2(IN, 1 - w))
        preSum(m3(w, d, OUT)) -= preNodes(m2(OUT, 1 - w))
      }
      def popPost(i: Int): Unit = if (!uv(i)) {
        val (w, d) = (uorv(i), dirs(i))
        postNodes(m2(d, w)) -= 1
        postSum(m3(w, d, IN)) -= postNodes(m2(IN, 1 - w))
        postSum(m3(w, d, OUT)) -= postNodes(m2(OUT, 1 - w))
      }
      def pushPre(i: Int): Unit = if (!uv(i)) {
        val (w, d) = (uorv(i), dirs(i))
        preSum(m3(1 - w, IN, d)) += preNodes(m2(IN, 1 - w))
        preSum(m3(1 - w, OUT, d)) += preNodes(m2(OUT, 1 - w))
        preNodes(m2(d, w)) += 1
      }
      def pushPost(i: Int): Unit = if (!uv(i)) {
        val (w, d) = (uorv(i), dirs(i))
        postSum(m3(1 - w, IN, d)) += postNodes(m2(IN, 1 - w))
        postSum(m3(1 - w, OUT, d)) += postNodes(m2(OUT, 1 - w))
        postNodes(m2(d, w)) += 1
      }
      def processCurrent(i: Int): Unit = {
        val (w, d) = (uorv(i), dirs(i))
        if (!uv(i)) {
          midSum(m3(1 - w, IN, d)) -= preNodes(m2(IN, 1 - w))
          midSum(m3(1 - w, OUT, d)) -= preNodes(m2(OUT, 1 - w))
          midSum(m3(w, d, IN)) += postNodes(m2(IN, 1 - w))
          midSum(m3(w, d, OUT)) += postNodes(m2(OUT, 1 - w))
        } else {
          finalCounts(0) += midSum(m3(d, 0, 0)) + postSum(m3(d, 0, 1)) + preSum(m3(1 - d, 1, 1))
          finalCounts(4) += midSum(m3(d, 1, 0)) + postSum(m3(1 - d, 0, 1)) + preSum(m3(1 - d, 0, 1))
          finalCounts(2) += midSum(m3(1 - d, 0, 0)) + postSum(m3(d, 1, 1)) + preSum(m3(1 - d, 1, 0))
          finalCounts(6) += midSum(m3(1 - d, 1, 0)) + postSum(m3(1 - d, 1, 1)) + preSum(m3(1 - d, 0, 0))
          finalCounts(1) += midSum(m3(d, 0, 1)) + postSum(m3(d, 0, 0)) + preSum(m3(d, 1, 1))
          finalCounts(5) += midSum(m3(d, 1, 1)) + postSum(m3(1 - d, 0, 0)) + preSum(m3(d, 0, 1))
          finalCounts(3) += midSum(m3(1 - d, 0, 1)) + postSum(m3(d, 1, 0)) + preSum(m3(d, 1, 0))
          finalCounts(7) += midSum(m3(1 - d, 1, 1)) + postSum(m3(1 - d, 1, 0)) + preSum(m3(d, 0, 0))
        }
      }

      var start = 0
      var end = 0
      var j = 0
      while (j < l) {
        while (start < l && times(start) + delta < times(j)) { popPre(start); start += 1 }
        while (end < l && times(end) <= times(j) + delta) { pushPost(end); end += 1 }
        popPost(j); processCurrent(j); pushPre(j)
        j += 1
      }
    }
  }

  /** Per-node star(24, two-node-subtracted) ++ two-node(8) counts, summed
    * over all nodes: one mapGroups pass over incident events. */
  private def starCounts(g: LinkGraph, delta: Long): Array[Long] = {
    val spark = g.spark
    import spark.implicits._
    // (node, nb, dir, ts, seq) for non-self exploded events
    val ev = g.edges.filter($"src" =!= $"dst")
      .select($"src".as("node"), $"dst".as("nb"), lit(OUT).as("dir"), $"ts", $"seq")
      .union(g.edges.filter($"src" =!= $"dst")
        .select($"dst".as("node"), $"src".as("nb"), lit(IN).as("dir"), $"ts", $"seq"))
      .as[(Long, Long, Int, Long, Long)]
    if (ev.isEmpty) return new Array[Long](32)
    val partials = ev.groupByKey(_._1).mapGroups { (_, it) =>
      val events = it.toArray.sortBy(e => (e._4, e._5)) // (ts, seq) order
      // dense neighbour index
      val nbIndex = scala.collection.mutable.HashMap.empty[Long, Int]
      events.foreach(e => nbIndex.getOrElseUpdate(e._2, nbIndex.size))
      val n = nbIndex.size
      val nbs = events.map(e => nbIndex(e._2))
      val dirs = events.map(_._3)
      val times = events.map(_._4)
      // two-node counts: per neighbour event stream
      val two = new Array[Long](8)
      events.groupBy(_._2).foreach { case (_, es) =>
        val c = new TwoNodeCounter
        c.execute(es.map(_._3), es.map(_._4), delta)
        var i = 0
        while (i < 8) { two(i) += c.c3(i); i += 1 }
      }
      val sc = new StarCounter(n)
      sc.execute(nbs, dirs, times, delta)
      val star = sc.counts24
      val out = new Array[Long](32)
      var i = 0
      while (i < 24) { out(i) = star(i) - two(i % 8); i += 1 }
      while (i < 32) { out(i) = two(i - 24); i += 1 }
      out
    }
    partials.reduce { (a, b) =>
      val r = new Array[Long](32)
      var i = 0
      while (i < 32) { r(i) = a(i) + b(i); i += 1 }
      r
    }
  }

  /** Per-triangle motif counts summed over all triangles of the (2-core)
    * graph. */
  private def triangleCounts(g: LinkGraph, delta: Long): Array[Long] = {
    val spark = g.spark
    import spark.implicits._
    val core = g.subgraph(KCore.coreSet(g, 2))
    val und = core.dedupEdges
      .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
      .filter($"a" =!= $"b").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    if (und.isEmpty) { und.unpersist(); return new Array[Long](8) }
    // triangles lo < mid < hi via wedge join on canonical edges
    val e1 = und.select($"a".as("lo"), $"b".as("mid"))
    val e2 = und.select($"a".as("lo2"), $"b".as("hi"))
    val wedges = e1.join(e2, $"lo" === $"lo2" && $"mid" < $"hi").select($"lo", $"mid", $"hi")
    val triangles = wedges.join(und, $"mid" === $"a" && $"hi" === $"b")
      .select($"lo", $"mid", $"hi")
    // unordered-pair key join to collect each triangle's 6 event streams
    val triPairs = triangles
      .select($"lo", $"mid", $"hi", $"lo".as("pa"), $"mid".as("pb"))
      .union(triangles.select($"lo", $"mid", $"hi", $"lo".as("pa"), $"hi".as("pb")))
      .union(triangles.select($"lo", $"mid", $"hi", $"mid".as("pa"), $"hi".as("pb")))
    val evPairs = core.edges.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("pa"), greatest($"src", $"dst").as("pb"),
        $"src", $"dst", $"ts", $"seq")
    val triEvents = triPairs.join(evPairs, Seq("pa", "pb"))
      .select($"lo", $"mid", $"hi", $"src", $"dst", $"ts", $"seq")
      .as[(Long, Long, Long, Long, Long, Long, Long)]
    val partials = triEvents.groupByKey(t => (t._1, t._2, t._3)).mapGroups {
      (key: (Long, Long, Long), it: Iterator[(Long, Long, Long, Long, Long, Long, Long)]) =>
      val (lo, mid, hi) = key
      // reference encoding: v = smallest (uorv 0? no: u = the larger of the
      // base pair, v = smaller, w = largest). Here base pair = (mid, lo),
      // third = hi; "u" = mid (uorv 0), "v" = lo (uorv 1).
      val events = it.toArray.sortBy(e => (e._6, e._7))
      val uvE = new Array[Boolean](events.length)
      val uorv = new Array[Int](events.length)
      val dirs = new Array[Int](events.length)
      val times = new Array[Long](events.length)
      var i = 0
      while (i < events.length) {
        val (s, d, t) = (events(i)._4, events(i)._5, events(i)._6)
        if (s == hi)      { uvE(i) = false; uorv(i) = if (d == mid) 0 else 1; dirs(i) = 0 }
        else if (d == hi) { uvE(i) = false; uorv(i) = if (s == mid) 0 else 1; dirs(i) = 1 }
        else if (s == mid){ uvE(i) = true;  uorv(i) = 1;                      dirs(i) = 1 }
        else              { uvE(i) = true;  uorv(i) = 0;                      dirs(i) = 0 }
        times(i) = t
        i += 1
      }
      val tc = new TriangleCounter
      tc.execute(uvE, uorv, dirs, times, delta)
      tc.finalCounts
    }
    val res =
      if (partials.isEmpty) new Array[Long](8)
      else partials.reduce { (a, b) =>
        val r = new Array[Long](8)
        var i = 0
        while (i < 8) { r(i) = a(i) + b(i); i += 1 }
        r
      }
    und.unpersist()
    res
  }

  /** The 40-element global census for one delta. */
  def globalCounts(g: LinkGraph, delta: Long): Array[Long] =
    starCounts(g, delta) ++ triangleCounts(g, delta)
}
