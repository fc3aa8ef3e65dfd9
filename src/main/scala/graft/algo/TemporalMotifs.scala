package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph
import graft.algo.motifs.Counters
import graft.algo.motifs.Counters.{IN, OUT}

/** Delta-temporal 3-node motif census — Paranjape, Benson & Leskovec,
  * "Motifs in Temporal Networks" (WSDM 2017) — with the reference's exact
  * output layout (raphtory/src/algorithms/motifs/
  * global_temporal_three_node_motifs.rs:27-314 for the global census,
  * local_temporal_three_node_motifs.rs:83-394 for the per-node variant;
  * layout doc python/packages/algorithms.rs:405-449):
  *
  *   [0..23]  star motifs, classes PRE | MID | POST × directions
  *            III..OOO (two-node motifs subtracted out),
  *   [24..31] two-node motifs III..OOO (counted from both endpoints),
  *   [32..39] the 8 delta-temporal triangle motifs.
  *
  * Counter algebra lives in motifs.Counters. Spark shape: star/two-node
  * counters STREAM over each node's incident events after a spillable
  * external sort (repartition + sortWithinPartitions + mapPartitions),
  * holding only the delta window — hub-degree-independent task memory;
  * triangle counters run per triangle discovered by a wedge join over the
  * 2-core, with the triangle's 6 directed event streams assembled by an
  * unordered-pair join. Both stages are embarrassingly parallel; nothing
  * touches the driver but the 40-slot reduce (global) / per-node sum
  * (local).
  */
object TemporalMotifs {

  // ---- per-node star + two-node pass --------------------------------------

  /** Process a sorted iterator as consecutive key runs. `process` MUST
    * fully consume (or at least not outlive) each run's sub-iterator; any
    * undrained remainder is skipped before the next run starts. */
  private def runs[T, K, R](it: Iterator[T])(key: T => K)(process: (K, Iterator[T]) => R): Iterator[R] =
    new Iterator[R] {
      private val b = it.buffered
      def hasNext: Boolean = b.hasNext
      def next(): R = {
        val k = key(b.head)
        val group: Iterator[T] = new Iterator[T] {
          def hasNext: Boolean = b.hasNext && key(b.head) == k
          def next(): T = b.next()
        }
        val r = process(k, group)
        while (group.hasNext) group.next()
        r
      }
    }

  /** Raw per-node counts: (vid, star24 two-node-subtracted ++ two8).
    * Shared by the global census (sum) and the local variant (as-is).
    *
    * Hub-safe shape: both passes repartition + externally sort (Spark's
    * spillable sort), then STREAM each run through a windowed counter —
    * task memory is O(delta-window + distinct neighbours), never O(node
    * events), so a web hub with 10⁷⁺ incident events cannot OOM a task
    * (the old groupByKey + toArray materialised the whole stream). The
    * two-node pass keys by (node, nb) — per-pair streams — and map-side
    * reduces the 8-vectors per node. */
  private def starTwoNodeByNode(g: LinkGraph, delta: Long) = {
    val spark = g.spark
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // (node, nb, dir, ts, seq) for non-self exploded events
    val ev = g.edges.filter($"src" =!= $"dst")
      .select($"src".as("node"), $"dst".as("nb"), lit(OUT).as("dir"), $"ts", $"seq")
      .union(g.edges.filter($"src" =!= $"dst")
        .select($"dst".as("node"), $"src".as("nb"), lit(IN).as("dir"), $"ts", $"seq"))
    val starRaw = ev.repartition(p, $"node")
      .sortWithinPartitions($"node", $"ts", $"seq")
      .as[(Long, Long, Int, Long, Long)]
      .mapPartitions { it =>
        runs(it)(_._1) { (node, es) =>
          val sc = new Counters.StreamingStarCounter(delta)
          sc.run(es.map(e => (e._2, e._3, e._4)))
          (node, sc.counts24)
        }
      }
    val twoRaw = ev.repartition(p, $"node", $"nb")
      .sortWithinPartitions($"node", $"nb", $"ts", $"seq")
      .as[(Long, Long, Int, Long, Long)]
      .mapPartitions { it =>
        runs(it)(e => (e._1, e._2)) { (key, es) =>
          val pc = new Counters.StreamingPairCounter(delta)
          es.foreach(e => pc.push(e._3, e._4))
          (key._1, pc.counts)
        }
      }
      .groupByKey(_._1)
      .reduceGroups { (a: (Long, Array[Long]), b: (Long, Array[Long])) =>
        val r = new Array[Long](8)
        var i = 0
        while (i < 8) { r(i) = a._2(i) + b._2(i); i += 1 }
        (a._1, r)
      }
      .map { case (node, (_, two)) => (node, two) }
    starRaw.toDF("node", "star").join(twoRaw.toDF("node", "two"), Seq("node"))
      .as[(Long, Array[Long], Array[Long])]
      .map { case (node, star, two) =>
        val out = new Array[Long](32)
        var i = 0
        while (i < 24) { out(i) = star(i) - two(i % 8); i += 1 }
        while (i < 32) { out(i) = two(i - 24); i += 1 }
        (node, out)
      }
  }

  // ---- per-triangle pass --------------------------------------------------

  /** Per-triangle event streams keyed by the sorted triple (lo, mid, hi),
    * over the 2-core (a triangle can only live there). Triangle discovery
    * goes through Triangles.enumerate — the degree-ordered orientation —
    * so the wedge fan-out is O(m^1.5) regardless of hub degrees (a
    * vid-ordered wedge join is O(Σ d²) when a hub happens to hold the
    * minimum vid among its neighbours). */
  private def triangleEvents(g: LinkGraph) = {
    val spark = g.spark
    import spark.implicits._
    // No 2-core prune here: the degree-ordered enumeration already bounds
    // the wedge join at O(m^1.5), and the iterative peel costs several
    // full-graph shuffle rounds per call — more than the constant-factor
    // pruning it buys this plan (edges outside the 2-core produce no
    // wedge closures and fall out of the equi-joins on their own).
    val und = Triangles.undirectedSimple(g)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (tri, oriented) = Triangles.enumerate(und)
    // recover the sorted triple from the (centre, x, y) orientation
    val lo = least($"c", $"x", $"y")
    val hi = greatest($"c", $"x", $"y")
    val triangles = tri.select(lo.as("lo"), ($"c" + $"x" + $"y" - lo - hi).as("mid"), hi.as("hi"))
    // unordered-pair key join collects each triangle's 6 event streams
    val triPairs = triangles
      .select($"lo", $"mid", $"hi", $"lo".as("pa"), $"mid".as("pb"))
      .union(triangles.select($"lo", $"mid", $"hi", $"lo".as("pa"), $"hi".as("pb")))
      .union(triangles.select($"lo", $"mid", $"hi", $"mid".as("pa"), $"hi".as("pb")))
    val evPairs = g.edges.filter($"src" =!= $"dst")
      .select(least($"src", $"dst").as("pa"), greatest($"src", $"dst").as("pb"),
        $"src", $"dst", $"ts", $"seq")
    (Seq(und, oriented), triPairs.join(evPairs, Seq("pa", "pb"))
      .select($"lo", $"mid", $"hi", $"src", $"dst", $"ts", $"seq")
      .as[(Long, Long, Long, Long, Long, Long, Long)])
  }

  /** Run one TriangleCounter over a triangle's merged stream from the
    * perspective (u, v, w): base pair (u, v), third node w. Events arrive
    * (src, dst, ts, seq)-sorted. Encoding per the reference
    * (local_temporal_three_node_motifs.rs:248-272): w events carry
    * wPartner 0 = links w↔u / 1 = links w↔v and dir 0 = from w / 1 = into
    * w; base events carry dir 1 = u→v / 0 = v→u. */
  private def countTriangle(events: Array[(Long, Long, Long, Long)],
                            u: Long, v: Long, w: Long, delta: Long): Array[Long] = {
    val l = events.length
    val onBase = new Array[Boolean](l)
    val wPartner = new Array[Int](l)
    val dirs = new Array[Int](l)
    val times = new Array[Long](l)
    var i = 0
    while (i < l) {
      val (s, d, t, _) = events(i)
      if (s == w)      { onBase(i) = false; wPartner(i) = if (d == u) 0 else 1; dirs(i) = 0 }
      else if (d == w) { onBase(i) = false; wPartner(i) = if (s == u) 0 else 1; dirs(i) = 1 }
      else if (s == u) { onBase(i) = true;  wPartner(i) = 1;                    dirs(i) = 1 }
      else             { onBase(i) = true;  wPartner(i) = 0;                    dirs(i) = 0 }
      times(i) = t
      i += 1
    }
    val tc = new Counters.TriangleCounter(onBase, wPartner, dirs)
    tc.sweep(times, delta)
    tc.counts
  }

  // ---- public API ---------------------------------------------------------

  /** Global 40-census AND the per-node table from ONE triangle enumeration
    * + counter sweep. The global census's single per-triangle perspective
    * (u = mid, v = lo, w = hi, global_temporal_three_node_motifs.rs:
    * 180-210) is exactly the mid member's local perspective (u = m, v =
    * min of the others, w = max), so the 3-perspective local sweep
    * subsumes it: global triangle slots = Σ of the mid-perspective rows,
    * global star/two-node slots = Σ of the per-node rows. Callers that
    * need both (the driver runs the global and the local census over the
    * same graph and delta) pay for one pass instead of two. */
  def census(g: LinkGraph, delta: Long): (Array[Long], DataFrame) =
    censusImpl(g, delta, needLocal = true)

  private def censusImpl(g: LinkGraph, delta: Long, needLocal: Boolean): (Array[Long], DataFrame) = {
    val spark = g.spark
    import spark.implicits._
    val sl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    def sumSlices(n: Int)(a: Array[Long], b: Array[Long]): Array[Long] = {
      val r = new Array[Long](n)
      var i = 0
      while (i < n) { r(i) = a(i) + b(i); i += 1 }
      r
    }
    val starTwoByNode = starTwoNodeByNode(g, delta).persist(sl)
    val (cached, triEv) = triangleEvents(g)
    if (!needLocal) {
      // global-only: count each triangle from the single mid perspective
      // the global census uses, skip the per-node join + checkpoint
      val midCounts = triEv.groupByKey(t => (t._1, t._2, t._3)).mapGroups { (key, it) =>
        val (lo, mid, hi) = key
        val events = it.map(e => (e._4, e._5, e._6, e._7)).toArray.sortBy(e => (e._3, e._4))
        countTriangle(events, mid, lo, hi, delta)
      }
      val starTwo = starTwoByNode.map(_._2).rdd.fold(new Array[Long](32))(sumSlices(32))
      val tri = midCounts.rdd.fold(new Array[Long](8))(sumSlices(8))
      starTwoByNode.unpersist(); cached.foreach(_.unpersist())
      return (starTwo ++ tri, null)
    }
    // all three member perspectives per triangle; isMid marks the one the
    // global census counts
    val triPerMember = triEv.groupByKey(t => (t._1, t._2, t._3)).flatMapGroups { (key, it) =>
      val (lo, mid, hi) = key
      val events = it.map(e => (e._4, e._5, e._6, e._7)).toArray.sortBy(e => (e._3, e._4))
      Iterator(
        (lo, countTriangle(events, lo, mid, hi, delta), false),
        (mid, countTriangle(events, mid, lo, hi, delta), true),
        (hi, countTriangle(events, hi, lo, mid, delta), false))
    }.persist(sl)
    // per-node table (local_temporal_three_node_motifs.rs:232-290: member
    // m counts from the perspective u = m, v = min of the other two, w =
    // max; the reference's `w > v.node` intersect condition picks exactly
    // that orientation, counts updated on u only)
    val triByNode = triPerMember.groupByKey(_._1).mapGroups { (vid, it) =>
      val sum = new Array[Long](8)
      it.foreach { case (_, c, _) =>
        var i = 0
        while (i < 8) { sum(i) += c(i); i += 1 }
      }
      (vid, sum)
    }.toDF("vid", "tri")
    val zeros32 = array((0 until 32).map(_ => lit(0L)): _*)
    val zeros8 = array((0 until 8).map(_ => lit(0L)): _*)
    // eager checkpoint before dropping the caches: a later action on the
    // local table must not recompute the triangle enumeration uncached
    val local = g.nodes
      .join(starTwoByNode.toDF("vid", "star_two"), Seq("vid"), "left")
      .join(triByNode, Seq("vid"), "left")
      .select($"vid", $"name",
        concat(coalesce($"star_two", zeros32), coalesce($"tri", zeros8)).as("counts"))
      .localCheckpoint(true)
    val starTwo = starTwoByNode.map(_._2).rdd.fold(new Array[Long](32))(sumSlices(32))
    val tri = triPerMember.filter(_._3).map(_._2).rdd.fold(new Array[Long](8))(sumSlices(8))
    starTwoByNode.unpersist(); triPerMember.unpersist(); cached.foreach(_.unpersist())
    (starTwo ++ tri, local)
  }

  /** The 40-element global census for one delta — skips the per-node
    * join/checkpoint the local table needs (callers wanting both should
    * use `census`, which shares one enumeration). */
  def globalCounts(g: LinkGraph, delta: Long): Array[Long] =
    censusImpl(g, delta, needLocal = false)._1

  /** Per-node 40-element counts: every node of the graph gets a row
    * (vid, name, counts[40]). */
  def localCounts(g: LinkGraph, delta: Long): DataFrame = census(g, delta)._2
}
