package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.algo.PageRank

/** View algebra (SURVEY §1.5): window/layers/subgraph/rolling/expanding/
  * materialize as lazy Catalyst filters. */
class ViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val edges = Seq((1L, 2L, 0L), (2L, 3L, 5L), (3L, 4L, 10L), (4L, 1L, 15L))
  lazy val g = LinkGraph.fromNumericEdgeList(spark, edges)

  test("window is [start, end) on event time and restricts nodes") {
    val w = g.window(0L, 6L)
    assert(w.edgeEventCount == 2)
    assert(w.nodes.select("name").as[String].collect().toSet == Set("1", "2", "3"))
    assert(g.at(10L).edgeEventCount == 1)
    assert(g.before(10L).edgeEventCount == 2)
    assert(g.after(10L).edgeEventCount == 1)
  }

  test("rolling and expanding enumerate windowed views") {
    val rolls = g.rolling(5L, 5L)
    assert(rolls.map(_.edgeEventCount) == Seq(1, 1, 1, 1))
    val exps = g.expanding(5L)
    assert(exps.map(_.edgeEventCount) == Seq(1, 2, 3, 4))
  }

  test("layers filter edges only") {
    val mixed = LinkGraph.fromEdgeList(spark,
      Seq(("a", "b", 0L), ("b", "c", 1L)))
    assert(mixed.layers(Seq("_default")).edgeEventCount == 2)
    assert(mixed.layers(Seq("other")).edgeEventCount == 0)
  }

  test("subgraph induces on both endpoints") {
    val keep = g.nodes.filter($"name".isin("1", "2", "3")).select($"vid")
    val sub = g.subgraph(keep)
    assert(sub.edgeEventCount == 2) // (1,2), (2,3)
    assert(sub.nodeCount == 3)
  }

  test("nodeActivity: incident event counts + time bounds, self-loop incident once") {
    // 1->2 twice (ts 0, 4), self-loop 2->2 (ts 6), 3->1 (ts 9)
    val ga = LinkGraph.fromNumericEdgeList(spark,
      Seq((1L, 2L, 0L), (1L, 2L, 4L), (2L, 2L, 6L), (3L, 1L, 9L)))
    val act = ga.nodeActivity.join(ga.nodes, Seq("vid"))
      .select("name", "n_events", "earliest", "latest").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(act("1") == ((3L, 0L, 9L)))  // two out-events + one in-event
    assert(act("2") == ((3L, 0L, 6L)))  // two in-events + self-loop ONCE
    assert(act("3") == ((1L, 9L, 9L)))
    // windowed view windows the activity too
    val wAct = ga.window(4L, 7L).nodeActivity.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(wAct.values.sum == 3L) // events (1,2,4) twice-incident + loop once
  }

  test("materialize re-mints dense vids in view order and preserves results") {
    val w = g.window(5L, 16L) // nodes 2,3,4,1 by original vids 1,2,3,0
    val m = w.materialize()
    val vids = m.nodes.select("vid").as[Long].collect().sorted
    assert(vids.toSeq == (0L until m.nodeCount))
    // PageRank invariant under re-minting (same graph shape)
    val a = PageRank.run(w).collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    val b = PageRank.run(m).collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(a.keySet == b.keySet)
    for ((k, v) <- a) assert(math.abs(b(k) - v) < 1e-12)
  }

  test("windowed pagerank differs from full-graph pagerank") {
    val full = PageRank.run(g).collect().map(_.getDouble(2)).sum
    assert(math.abs(full - 1.0) < 1e-9)
  }

  test("temporal node properties: history, at(t), latest, windowed views (node.rs:96-109)") {
    // vid 0 = "1", vid 1 = "2" (fromNumericEdgeList first-appearance order)
    val pe = Seq(
      (0L, "x", 0L, 1.0), (0L, "x", 5L, 2.0), (0L, "x", 10L, 3.0),
      (1L, "x", 7L, 9.0), (0L, "y", 5L, 42.0)
    ).toDF("vid", "prop", "ts", "value")
    val gp = g.withNodePropEvents(pe)
    // history of one prop, all events
    assert(gp.propertyHistory("x").count() == 4)
    // at(t): latest event with ts <= t, per node; absent when none
    val at6 = gp.propertyAt("x", 6L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(at6 == Map(0L -> ((5L, 2.0))))
    val at7 = gp.propertyAt("x", 7L).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(at7 == Map(0L -> ((5L, 2.0)), 1L -> ((7L, 9.0))))
    // latest over the full view
    val latest = gp.propertyLatest("x").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(latest == Map(0L -> 3.0, 1L -> 9.0))
    // window views restrict property histories like edges
    val w = gp.window(0L, 6L)
    assert(w.propertyHistory("x").count() == 2)
    assert(w.propertyLatest("x").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap == Map(0L -> 2.0))
    // no events attached => empty, not an error
    assert(g.propertyHistory("x").isEmpty)
    // a property update IS node activity (window_graph.rs): vid 1's only
    // x-event is at ts=7; a window excluding all of vid 1's edges but
    // containing ts=7 must return it from property reads AND list it in
    // the induced node set (degree 0 — no in-window edges)
    val wNoEdges = gp.window(7L, 8L)
    assert(wNoEdges.propertyLatest("x").collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap == Map(1L -> 9.0))
    assert(wNoEdges.nodes.select("vid").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(wNoEdges.degrees.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap ==
      Map(1L -> 0L))
    // materialize remaps the event log onto the re-minted vids
    val m = gp.materialize()
    assert(m.propertyLatest("x").count() == 2)
  }

  test("edge-event temporal properties: history is a projection, at(t) per (src, dst)") {
    val e = Seq(
      (0L, 1L, 0L, 0L, "_default", 10.0), (0L, 1L, 5L, 1L, "_default", 20.0),
      (1L, 2L, 3L, 2L, "_default", 7.0)
    ).toDF("src", "dst", "ts", "seq", "layer", "w")
    val n = Seq((0L, "0"), (1L, "1"), (2L, "2")).toDF("vid", "name")
    val gw = new graft.graph.LinkGraph(e, n, namesAreNumeric = true)
    assert(gw.edgePropertyHistory("w").count() == 3)
    val at4 = gw.edgePropertyAt("w", 4L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(at4 == Map((0L, 1L) -> ((0L, 10.0)), (1L, 2L) -> ((3L, 7.0))))
    val at9 = gw.edgePropertyAt("w", 9L).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(at9 == Map((0L, 1L) -> 20.0, (1L, 2L) -> 7.0))
    // windows restrict edge property histories with the edge events
    assert(gw.window(0L, 3L).edgePropertyHistory("w").count() == 1)
  }
}
