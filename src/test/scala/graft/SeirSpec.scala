package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.algo.Seir

class SeirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // path graph 1 -> 2 -> 3 -> 4 with increasing event times
  val path = Seq((1L, 2L, 2L), (2L, 3L, 4L), (3L, 4L, 6L))

  test("p=1 SI spreads along time-respecting out-edges; incubation shifts activation") {
    val g = LinkGraph.fromNumericEdgeList(spark, path)
    val res = Seir.run(g, Seq("1"), Seir.Config(infectionProb = 1.0, initialInfection = 0L))
      .collect().map(r => r.getAs[String]("name") ->
        (r.getAs[Long]("infected"), r.getAs[Long]("active"), r.getAs[Long]("recovered"))).toMap
    assert(res.keySet == Set("1", "2", "3", "4"))
    assert(res("1") == ((0L, 1L, Long.MaxValue)))
    assert(res("2") == ((2L, 3L, Long.MaxValue)))  // infected by event at t=2 >= active(1)
    assert(res("3") == ((4L, 5L, Long.MaxValue)))
    assert(res("4") == ((6L, 7L, Long.MaxValue)))
  }

  test("p=0 infects only seeds; events before activation don't transmit") {
    val g = LinkGraph.fromNumericEdgeList(spark, path)
    val none = Seir.run(g, Seq("1"), Seir.Config(infectionProb = 0.0, initialInfection = 0L))
    assert(none.collect().map(_.getAs[String]("name")).toSet == Set("1"))
    // seed infected AFTER its only out-event: no spread even at p=1
    val late = Seir.run(g, Seq("1"), Seir.Config(infectionProb = 1.0, initialInfection = 5L))
    assert(late.collect().map(_.getAs[String]("name")).toSet == Set("1"))
  }

  test("hash-coin mode: deterministic, p=1/p=0 agree with chacha mode, min-fixpoint shape") {
    val g = LinkGraph.fromNumericEdgeList(spark, path)
    def runHash(p: Double) = Seir.run(g, Seq("1"),
      Seir.Config(infectionProb = p, initialInfection = 0L, rngMode = "hash"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("infected")).toMap
    // degenerate probabilities are rng-independent: must equal the chacha fixtures
    assert(runHash(1.0) == Map("1" -> 0L, "2" -> 2L, "3" -> 4L, "4" -> 6L))
    assert(runHash(0.0) == Map("1" -> 0L))
    // intermediate p: reproducible run-to-run (pure function of the event log)
    val edges = (1L to 30L).map(i => (1L, 1L + i % 10, i))
    val g2 = LinkGraph.fromNumericEdgeList(spark, edges)
    def run2() = Seir.run(g2, Seq("1"),
      Seir.Config(infectionProb = 0.5, initialInfection = 0L, rngMode = "hash"))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("infected")).toMap
    assert(run2() == run2())
  }

  test("deterministic for a fixed seed; recovery bounds the window") {
    val edges = (1L to 30L).map(i => (1L, 1L + i % 10, i)) // star with repeated events
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    def run() = Seir.run(g, Seq("1"),
      Seir.Config(infectionProb = 0.5, initialInfection = 0L, recoveryRate = Some(0.2)))
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("infected")).toMap
    assert(run() == run())
    val res = Seir.run(g, Seq("1"),
      Seir.Config(infectionProb = 1.0, initialInfection = 0L, recoveryRate = Some(10.0)))
      .collect().map(r => r.getAs[String]("name")).toSet
    // recovery at rate 10 => window ~0 long; few or no infections beyond seed
    assert(res.contains("1"))
  }
}
