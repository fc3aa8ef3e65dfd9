package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.algo.TemporalMotifs

/** Delta-temporal 3-node motif census against the reference's exact
  * fixtures: global 40-count (global_temporal_three_node_motifs.rs:333-380)
  * and per-node local counts (local_temporal_three_node_motifs.rs:525-705,
  * incl. the windowed-view variant). */
class MotifSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def sampleGraph: LinkGraph = {
    val edges = Seq(
      (1L, 1L, 1L), (1L, 1L, 1L), (2L, 1L, 1L), (1L, 1L, 2L), (1L, 1L, 2L),
      (2L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 4L), (4L, 3L, 1L), (5L, 3L, 4L),
      (6L, 3L, 5L), (7L, 4L, 5L), (8L, 5L, 6L), (9L, 5L, 8L), (10L, 7L, 5L),
      (11L, 8L, 5L), (12L, 1L, 9L), (13L, 9L, 1L), (14L, 6L, 3L), (15L, 4L, 8L),
      (16L, 8L, 3L), (17L, 5L, 10L), (18L, 10L, 5L), (19L, 10L, 8L),
      (20L, 1L, 11L), (21L, 11L, 1L), (22L, 9L, 11L), (23L, 11L, 9L)
    ).map { case (t, s, d) => (s, d, t) }
    LinkGraph.fromNumericEdgeList(spark, edges)
  }

  /** The local-motif sample (local_temporal_three_node_motifs.rs:416-446):
    * same link structure, but duplicated events and self-loops appear once
    * per add_edge call. */
  def localSampleGraph: LinkGraph = {
    val edges = Seq(
      (1L, 1L, 1L), (1L, 1L, 1L), (2L, 1L, 1L), (1L, 1L, 2L), (2L, 1L, 3L),
      (3L, 1L, 4L), (4L, 3L, 1L), (5L, 3L, 4L), (6L, 3L, 5L), (7L, 4L, 5L),
      (8L, 5L, 6L), (9L, 5L, 8L), (10L, 7L, 5L), (11L, 8L, 5L), (12L, 1L, 9L),
      (13L, 9L, 1L), (14L, 6L, 3L), (15L, 4L, 8L), (16L, 8L, 3L),
      (17L, 5L, 10L), (18L, 10L, 5L), (19L, 10L, 8L), (20L, 1L, 11L),
      (21L, 11L, 1L), (22L, 9L, 11L), (23L, 11L, 9L)
    ).map { case (t, s, d) => (s, d, t) }
    LinkGraph.fromNumericEdgeList(spark, edges)
  }

  test("global census fixture, delta=10, exact 40 counts") {
    val got = TemporalMotifs.globalCounts(sampleGraph, 10L)
    val expected = Array[Long](
      0, 2, 3, 8, 2, 4, 1, 5, 0, 0, 0, 0, 1, 0, 2, 0, 0, 1, 6, 0, 0, 1, 10, 2,
      0, 1, 0, 0, 0, 0, 1, 0, 2, 3, 2, 4, 1, 2, 4, 1)
    assert(got.length == 40)
    assert(got.toSeq == expected.toSeq,
      s"got ${got.mkString(",")}\nexp ${expected.mkString(",")}")
  }

  val localExpected: Map[String, Seq[Long]] = Map(
    "1" -> Seq[Long](0, 0, 0, 0, 1, 2, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 2, 0, 0, 0, 3, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 2, 0),
    "10" -> Seq[Long](0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1),
    "11" -> Seq[Long](0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 0),
    "2" -> Seq[Long](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    "3" -> Seq[Long](0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 2, 0, 1, 2, 0),
    "4" -> Seq[Long](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 0, 1, 0, 0, 1, 2, 0),
    "5" -> Seq[Long](0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 4, 0, 0, 0, 3, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 2, 1, 3, 0, 1, 1, 1),
    "6" -> Seq[Long](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0),
    "7" -> Seq[Long](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    "8" -> Seq[Long](0, 0, 2, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 2, 1, 2, 0, 1, 0, 1),
    "9" -> Seq[Long](0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0,
      0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 0, 1, 0))

  test("local per-node motifs, delta=10, exact fixture (local_temporal_three_node_motifs.rs:525-625)") {
    val got = TemporalMotifs.localCounts(localSampleGraph, 10L).collect()
      .map(r => r.getAs[String]("name") -> r.getSeq[Long](r.fieldIndex("counts")).toList).toMap
    for ((name, exp) <- localExpected) {
      assert(got(name) == exp, s"node $name:\ngot ${got(name).mkString(",")}\nexp ${exp.mkString(",")}")
    }
  }

  test("streaming star/pair counters match the array-based reference counters") {
    import graft.algo.motifs.Counters
    // deterministic pseudo-random streams across several shapes
    for ((nEvents, nNbs, tSpan, delta, seed) <- Seq(
        (200, 3, 50L, 7L, 1L), (500, 20, 100L, 25L, 2L),
        (300, 1, 10L, 100L, 3L), (64, 8, 8L, 0L, 4L))) {
      var h = seed
      def next(bound: Long): Long = { h = graft.io.Corpus.splitmix64(h); (h >>> 8) % bound }
      val raw = (0 until nEvents).map { i =>
        (next(nNbs), next(2).toInt, next(tSpan), i.toLong)
      }.sortBy(e => (e._3, e._4))
      // array-based: dense first-appearance index, full arrays
      val nbIdx = scala.collection.mutable.HashMap.empty[Long, Int]
      raw.foreach(e => nbIdx.getOrElseUpdate(e._1, nbIdx.size))
      val sc = new Counters.StarCounter(nbIdx.size,
        raw.map(e => nbIdx(e._1)).toArray, raw.map(_._2).toArray)
      sc.sweep(raw.map(_._3).toArray, delta)
      val stream = new Counters.StreamingStarCounter(delta)
      stream.run(raw.iterator.map(e => (e._1, e._2, e._3)))
      assert(stream.counts24.toSeq == sc.counts24.toSeq, s"star seed=$seed")
      // pair counters per neighbour stream
      raw.groupBy(_._1).foreach { case (_, es) =>
        val pc = new Counters.PairCounter
        pc.run(es.map(_._2).toArray, es.map(_._3).toArray, delta)
        val sp = new Counters.StreamingPairCounter(delta)
        es.foreach(e => sp.push(e._2, e._3))
        assert(sp.counts.toSeq == pc.counts.toSeq, s"pair seed=$seed")
      }
    }
  }

  test("10^6-event hub streams through the star pass (bounded task memory)") {
    // one centre with a million incident events over 2000 neighbours —
    // the round-3 groupByKey shape materialised all of it in ONE task as
    // a boxed-tuple array; the streaming shape holds only the delta
    // window. Counts verified against a direct array-based sweep.
    import spark.implicits._
    val n = 1000000
    val nbs = 2000
    val delta = 40L
    val hubEvents = spark.range(0, n).select(
      org.apache.spark.sql.functions.when($"id" % 2 === 0, 0L).otherwise($"id" % nbs + 1).as("src"),
      org.apache.spark.sql.functions.when($"id" % 2 === 0, $"id" % nbs + 1).otherwise(0L).as("dst"),
      ($"id" * 3 % 500000).as("ts"), $"id".as("seq"),
      org.apache.spark.sql.functions.lit("_default").as("layer"))
    val nodes = spark.range(0, nbs + 1).select($"id".as("vid"), $"id".cast("string").as("name"))
    val g = new LinkGraph(hubEvents, nodes, namesAreNumeric = true)
    val got = TemporalMotifs.localCounts(g, delta)
      .filter($"vid" === 0L).head().getSeq[Long](2)
    // reference computation: the ARRAY-based counters (the pre-streaming
    // semantics) over the hub's stream — fits fine in test-driver memory
    import graft.algo.motifs.Counters
    val raw = (0 until n).map { i =>
      val nb = i % nbs + 1
      val dir = if (i % 2 == 0) Counters.OUT else Counters.IN
      (nb.toLong, dir, i.toLong * 3 % 500000, i.toLong)
    }.sortBy(e => (e._3, e._4))
    val nbIdx = scala.collection.mutable.HashMap.empty[Long, Int]
    raw.foreach(e => nbIdx.getOrElseUpdate(e._1, nbIdx.size))
    val sc = new Counters.StarCounter(nbIdx.size,
      raw.map(e => nbIdx(e._1)).toArray, raw.map(_._2).toArray)
    sc.sweep(raw.map(_._3).toArray, delta)
    val two = new Array[Long](8)
    raw.groupBy(_._1).foreach { case (_, es) =>
      val pc = new Counters.PairCounter
      pc.run(es.map(_._2).toArray, es.map(_._3).toArray, delta)
      var i = 0
      while (i < 8) { two(i) += pc.counts(i); i += 1 }
    }
    val star = sc.counts24
    val exp = (0 until 24).map(i => star(i) - two(i % 8)) ++ (0 until 8).map(two(_)) ++ Seq.fill(8)(0L)
    assert(got.toSeq == exp)
  }

  test("local per-node motifs on a windowed view (local_temporal_three_node_motifs.rs:627-705)") {
    val g = localSampleGraph.before(11L).after(0L)
    val got = TemporalMotifs.localCounts(g, 10L).collect()
      .map(r => r.getAs[String]("name") -> r.getSeq[Long](r.fieldIndex("counts")).toList).toMap
    val expected: Map[String, Seq[Long]] = Map(
      "1" -> Seq[Long](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0),
      "2" -> Seq.fill[Long](40)(0),
      "3" -> Seq[Long](0, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 0),
      "4" -> Seq[Long](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 0),
      "5" -> Seq[Long](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
        0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 0),
      "6" -> Seq.fill[Long](40)(0),
      "7" -> Seq.fill[Long](40)(0),
      "8" -> Seq.fill[Long](40)(0))
    for ((name, exp) <- expected) {
      assert(got(name) == exp, s"node $name:\ngot ${got(name).mkString(",")}\nexp ${exp.mkString(",")}")
    }
  }
}
