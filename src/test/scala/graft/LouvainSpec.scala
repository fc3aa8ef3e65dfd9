package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.algo.Louvain

/** Seeded Louvain: deterministic runs, sensible communities on the
  * reference's own weighted test graph (louvain.rs:76-90), and modularity
  * no worse than obvious baselines on a planted two-clique graph.
  * (The reference uses an unseeded thread_rng, so raw assignments are not
  * comparable run-to-run even in the reference; its tests assert coverage,
  * ours assert coverage + determinism + quality.) */
class LouvainSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def collectCom(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("community")).toMap

  test("reference weighted fixture: all nodes assigned, deterministic, dense trio grouped") {
    // louvain.rs:76-90 edge list (weights), both directions added
    val raw = Seq(
      (100L, 200L, 2.0), (100L, 300L, 3.0), (200L, 300L, 8.5), (300L, 400L, 1.0),
      (400L, 500L, 1.5), (600L, 800L, 0.5), (700L, 900L, 3.5), (100L, 600L, 1.5))
    import spark.implicits._
    val events = raw.flatMap { case (s, d, w) => Seq((s, d, 1L, w), (d, s, 1L, w)) }
      .toDF("src", "dst", "ts", "weight")
    val g = LinkGraph.fromRawEdges(events)
    val r1 = collectCom(Louvain.run(g, weightCol = Some("weight")))
    val r2 = collectCom(Louvain.run(g, weightCol = Some("weight")))
    assert(r1 == r2)                               // seeded => reproducible
    assert(r1.keySet == Set("100", "200", "300", "400", "500", "600", "700", "800", "900"))
    // the heavy triangle 100-200-300 must land in one community
    assert(r1("100") == r1("200") && r1("200") == r1("300"))
    // disconnected pair 700-900 is its own community
    assert(r1("700") == r1("900"))
    assert(r1.values.toSet.size >= 2) // disconnected parts never merge
  }

  test("planted two-clique graph: cliques recovered, modularity beats trivial partitions") {
    // two 5-cliques joined by one bridge edge
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val edges = (cliqueA ++ cliqueB :+ (4L, 10L)).zipWithIndex
      .map { case ((s, d), t) => (s, d, t.toLong) }
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    val res = Louvain.run(g)
    val byName = collectCom(res)
    assert((0L to 4L).map(i => byName(i.toString)).toSet.size == 1, s"clique A split: $byName")
    assert((10L to 14L).map(i => byName(i.toString)).toSet.size == 1, s"clique B split: $byName")
    assert(byName("0") != byName("10"))
    val com = res.collect().map(r => r.getAs[Long]("vid") -> r.getAs[Long]("community")).toMap
    val q = Louvain.modularity(g, com)
    val qAllOne = Louvain.modularity(g, com.keys.map(_ -> 0L).toMap)
    val qSingletons = Louvain.modularity(g, com.keys.map(v => v -> v).toMap)
    assert(q > qAllOne && q > qSingletons && q > 0.4, s"Q=$q")
    // the distributed formulation computes the same Q (driver query path)
    val qDf = Louvain.modularityDF(g, res.select("vid", "community"))
    assert(math.abs(qDf - q) < 1e-9, s"modularityDF $qDf != modularity $q")
  }
}
