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
