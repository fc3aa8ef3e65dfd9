package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.graph.{LinkGraph, PersistentGraph}

/** Persistent (deletion-aware) graph views against the reference's own
  * window-semantics tests (db/graph/views/deletion_graph.rs:821-840,
  * 994-1020, 1021-1052), plus node-type filtered subgraphs
  * (db/graph/views/node_type_filtered_subgraph.rs). */
class PersistentGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def edgeCount(g: LinkGraph): Long = g.edgeCount
  def hasEdge(g: LinkGraph, s: Long, d: Long): Boolean =
    g.edges.filter(col("src") === s && col("dst") === d).limit(1).count() > 0

  test("window semantics: add at 1, delete at 10 (deletion_graph.rs:821-840)") {
    val g = PersistentGraph.fromTuples(spark, Seq((1L, 2L, 1L, 0), (1L, 2L, 10L, 1)))
    assert(edgeCount(g.at(12)) == 0)
    assert(edgeCount(g.at(11)) == 0)
    assert(edgeCount(g.at(10)) == 0)
    assert(edgeCount(g.at(9)) == 1)
    assert(edgeCount(g.window(5, 9)) == 1)
    assert(edgeCount(g.window(5, 10)) == 1)
    assert(edgeCount(g.window(5, 11)) == 1)
    assert(edgeCount(g.window(10, 12)) == 0)
    assert(edgeCount(g.before(10)) == 1)
    assert(edgeCount(g.after(10)) == 0)
  }

  test("ordering of same-time addition and deletion (deletion_graph.rs:994-1020)") {
    // deletion before addition: edge (1,2) exists on (-inf,1) and [1,inf);
    // addition then deletion at the same t: edge (3,4) exists only at 2
    val g = PersistentGraph.fromTuples(spark, Seq(
      (1L, 2L, 1L, 1),   // delete_edge(1, 1, 2)
      (1L, 2L, 1L, 0),   // add_edge(1, 1, 2)
      (3L, 4L, 2L, 0),   // add_edge(2, 3, 4)
      (3L, 4L, 2L, 1)))  // delete_edge(2, 3, 4)
    assert(hasEdge(g.window(0, 1), 1, 2))
    assert(!hasEdge(g.window(0, 2), 3, 4))
    assert(hasEdge(g.window(1, 2), 1, 2))
    assert(hasEdge(g.window(2, 3), 3, 4))
    assert(!hasEdge(g.window(3, 4), 3, 4))
  }

  test("at()/after() across a mixed event log (deletion_graph.rs:1021-1052)") {
    val adds = Seq((1L, 2L, 1L), (1L, 3L, 2L), (2L, 1L, -1L), (1L, 1L, 0L),
      (3L, 2L, 7L), (1L, 1L, 1L))
    val g = PersistentGraph.fromTuples(spark,
      adds.map { case (s, d, t) => (s, d, t, 0) } :+ (1L, 2L, 10L, 1))
    for ((s, d, t) <- adds) assert(hasEdge(g.at(t), s, d), s"at($t) has ($s,$d)")
    val after10 = g.after(10)
    assert(!hasEdge(after10, 1, 2))
    for ((s, d, _) <- adds.tail) assert(hasEdge(after10, s, d), s"after(10) has ($s,$d)")
  }

  test("event-graph view exposes additions as a plain temporal graph") {
    val g = PersistentGraph.fromTuples(spark, Seq(
      (1L, 2L, 1L, 0), (2L, 3L, 2L, 0), (1L, 2L, 10L, 1)))
    assert(g.eventGraph.edgeEventCount == 2)
  }

  test("node props loader: columns attach by name or vid and filter natively") {
    val g = LinkGraph.fromNumericEdgeList(spark, Seq((0L, 1L, 1L), (1L, 2L, 2L)))
    val props = Seq(("0", 0.9), ("2", 0.1)).toDF("name", "trust")
    val typed = g.withNodeProps(props)
    val trusted = typed.nodes.filter(col("trust") > 0.5).select("vid").collect().map(_.getLong(0))
    assert(trusted.toSeq == Seq(0L))
    assert(typed.nodes.filter(col("trust").isNull).count() == 1) // node 1 unannotated
  }

  test("node types: withNodeTypes + subgraph_node_types") {
    val g = LinkGraph.fromNumericEdgeList(spark, Seq(
      (0L, 1L, 1L), (1L, 2L, 2L), (2L, 3L, 3L), (3L, 0L, 4L)))
    val types = Seq((0L, "page"), (1L, "page"), (2L, "image")).toDF("vid", "node_type")
    val typed = g.withNodeTypes(types)
    // untyped node 3 defaults to _default
    val tmap = typed.nodes.select("vid", "node_type").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tmap(3L) == "_default" && tmap(2L) == "image")
    val sub = typed.subgraphNodeTypes(Seq("page"))
    assert(sub.nodes.count() == 2)
    assert(sub.edges.collect().map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet ==
      Set((0L, 1L)))
    // filtering on _default keeps the untyped node
    assert(typed.subgraphNodeTypes(Seq("_default")).nodes.count() == 1)
  }
}
