package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.algo.Wcc

/** Reference fixtures from raphtory/src/algorithms/components/
  * connected_components.rs tests (FIXTURES.md §B2). Component labels are the
  * representative GID — the earliest-ingested (min-VID) member. */
class WccSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def components(g: LinkGraph): Map[String, String] =
    Wcc.run(g).collect().map(r => r.getAs[String]("name") -> r.getAs[String]("component")).toMap

  test("7-edge two-component graph (connected_components.rs:104-138)") {
    val edges = Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 3L), (3L, 5L, 4L),
      (6L, 5L, 5L), (7L, 8L, 6L), (8L, 7L, 7L))
    val got = components(LinkGraph.fromNumericEdgeList(spark, edges))
    assert(got == Map("1" -> "1", "2" -> "1", "3" -> "1", "4" -> "1", "5" -> "1",
      "6" -> "1", "7" -> "7", "8" -> "7"))
  }

  test("23-edge motif graph all one component (connected_components.rs:141-197)") {
    val edges = Seq(
      (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L), (3L, 1L, 4L), (3L, 4L, 5L), (3L, 5L, 6L),
      (4L, 5L, 7L), (5L, 6L, 8L), (5L, 8L, 9L), (7L, 5L, 10L), (8L, 5L, 11L), (1L, 9L, 12L),
      (9L, 1L, 13L), (6L, 3L, 14L), (4L, 8L, 15L), (8L, 3L, 16L), (5L, 10L, 17L), (10L, 5L, 18L),
      (10L, 8L, 19L), (1L, 11L, 20L), (11L, 1L, 21L), (9L, 11L, 22L), (11L, 9L, 23L))
    val got = components(LinkGraph.fromNumericEdgeList(spark, edges))
    assert(got.values.toSet == Set("1"))
    assert(got.keySet == (1 to 11).map(_.toString).toSet)
  }

  test("self-loop singleton (connected_components.rs:199-220)") {
    val got = components(LinkGraph.fromNumericEdgeList(spark, Seq((1L, 1L, 1L))))
    assert(got == Map("1" -> "1"))
  }

  test("windowed components (connected_components.rs:222-253)") {
    val edges = Seq((1L, 2L, 0L), (2L, 1L, 0L), (3L, 4L, 9L), (4L, 3L, 9L))
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    assert(components(g) == Map("1" -> "1", "2" -> "1", "3" -> "3", "4" -> "3"))
    assert(components(g.window(0L, 2L)) == Map("1" -> "1", "2" -> "1"))
  }

  test("representative is first-ingested, not min GID") {
    // 9 ingested before 2: component label must be 9's GID even though 2 < 9
    val edges = Seq((9L, 5L, 0L), (5L, 2L, 1L))
    val got = components(LinkGraph.fromNumericEdgeList(spark, edges))
    assert(got == Map("9" -> "9", "5" -> "9", "2" -> "9"))
  }

  test("python gen_graph all one component (test_algorithms.py:26-31)") {
    val edges = Seq(
      (10L, 1L, 3L), (11L, 1L, 2L), (12L, 1L, 2L), (9L, 1L, 2L), (12L, 2L, 4L),
      (13L, 2L, 5L), (14L, 5L, 5L), (14L, 5L, 4L), (5L, 4L, 6L), (15L, 4L, 7L),
      (10L, 4L, 7L), (10L, 5L, 8L)
    ).map { case (t, s, d) => (s, d, t) }
    val got = components(LinkGraph.fromNumericEdgeList(spark, edges))
    assert(got.values.toSet == Set("1"))
  }
}
