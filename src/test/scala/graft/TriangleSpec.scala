package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.algo.{KCore, Triangles}

/** Reference fixtures from raphtory/src/algorithms/motifs/triangle_count.rs
  * and cores/k_core.rs (FIXTURES.md §B4). */
class TriangleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val motif23 = Seq(
    (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L), (3L, 1L, 4L), (3L, 4L, 5L), (3L, 5L, 6L),
    (4L, 5L, 7L), (5L, 6L, 8L), (5L, 8L, 9L), (7L, 5L, 10L), (8L, 5L, 11L), (1L, 9L, 12L),
    (9L, 1L, 13L), (6L, 3L, 14L), (4L, 8L, 15L), (8L, 3L, 16L), (5L, 10L, 17L), (10L, 5L, 18L),
    (10L, 8L, 19L), (1L, 11L, 20L), (11L, 1L, 21L), (9L, 11L, 22L), (11L, 9L, 23L))

  test("11-edge graph has 4 triangles (triangle_count.rs:139-168)") {
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (4L, 5L, 1L), (5L, 6L, 1L), (6L, 4L, 1L),
      (7L, 8L, 2L), (8L, 9L, 3L), (9L, 7L, 4L), (8L, 10L, 5L), (10L, 9L, 6L))
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    assert(Triangles.count(g) == 4L)
    assert(Triangles.count(g, useKCore = false) == 4L)
  }

  test("23-edge motif graph has 8 triangles (triangle_count.rs:170-208)") {
    val g = LinkGraph.fromNumericEdgeList(spark, motif23)
    assert(Triangles.count(g) == 8L)
  }

  test("2-core of the motif graph (k_core.rs:108-152)") {
    import spark.implicits._
    val g = LinkGraph.fromNumericEdgeList(spark, motif23)
    val core = KCore.coreSet(g, 2)
    val names = g.nodes.join(core, Seq("vid"), "left_semi")
      .select("name").as[String].collect().toSet
    assert(names == Set("1", "3", "4", "5", "6", "8", "9", "10", "11"))
  }

  test("self-loops and multi-edges never form triangles") {
    val edges = Seq((1L, 1L, 1L), (1L, 2L, 2L), (2L, 1L, 3L), (1L, 2L, 4L), (2L, 3L, 5L), (3L, 1L, 6L))
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    assert(Triangles.count(g) == 1L)
  }

  test("per-node triangle counts on the 11-edge graph") {
    val edges = Seq(
      (1L, 2L, 1L), (2L, 3L, 1L), (3L, 1L, 1L),
      (4L, 5L, 1L), (5L, 6L, 1L), (6L, 4L, 1L),
      (7L, 8L, 2L), (8L, 9L, 3L), (9L, 7L, 4L), (8L, 10L, 5L), (10L, 9L, 6L))
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    val got = Triangles.perNode(g).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byName = g.nodes.collect().map(r => r.getAs[Long]("vid") -> r.getAs[String]("name")).toMap
    val counts = got.map { case (vid, c) => byName(vid) -> c }
    assert(counts == Map("1" -> 1L, "2" -> 1L, "3" -> 1L, "4" -> 1L, "5" -> 1L, "6" -> 1L,
      "7" -> 1L, "8" -> 2L, "9" -> 2L, "10" -> 1L))
  }
}
