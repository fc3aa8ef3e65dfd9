package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.algo.TemporalMotifs

/** Global delta-temporal 3-node motif census against the reference's exact
  * 40-count fixture (global_temporal_three_node_motifs.rs:333-380). */
class MotifSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("global census fixture, delta=10, exact 40 counts") {
    val edges = Seq(
      (1L, 1L, 1L), (1L, 1L, 1L), (2L, 1L, 1L), (1L, 1L, 2L), (1L, 1L, 2L),
      (2L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 4L), (4L, 3L, 1L), (5L, 3L, 4L),
      (6L, 3L, 5L), (7L, 4L, 5L), (8L, 5L, 6L), (9L, 5L, 8L), (10L, 7L, 5L),
      (11L, 8L, 5L), (12L, 1L, 9L), (13L, 9L, 1L), (14L, 6L, 3L), (15L, 4L, 8L),
      (16L, 8L, 3L), (17L, 5L, 10L), (18L, 10L, 5L), (19L, 10L, 8L),
      (20L, 1L, 11L), (21L, 11L, 1L), (22L, 9L, 11L), (23L, 11L, 9L)
    ).map { case (t, s, d) => (s, d, t) }
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    val got = TemporalMotifs.globalCounts(g, 10L)
    val expected = Array[Long](
      0, 2, 3, 8, 2, 4, 1, 5, 0, 0, 0, 0, 1, 0, 2, 0, 0, 1, 6, 0, 0, 1, 10, 2,
      0, 1, 0, 0, 0, 0, 1, 0, 2, 3, 2, 4, 1, 2, 4, 1)
    assert(got.length == 40)
    assert(got.toSeq == expected.toSeq,
      s"got ${got.mkString(",")}\nexp ${expected.mkString(",")}")
  }
}
