package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.graph.LinkGraph
import graft.io.Corpus
import graft.algo.{PageRank, Wcc}

/** The CSR fast path and the shuffle-based DataFrame supersteps must agree:
  * same semantics, different physical plan (SURVEY §4.3). */
class CsrEquivalenceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val g: LinkGraph = LinkGraph.fromPages(Corpus.tiny(spark).toDF()).cache()

  test("pagerank: csr == df to 1e-12 on the tiny corpus") {
    val cfg = PageRank.Config(iterCount = 20)
    val csr = PageRank.run(g, cfg.copy(mode = "csr")).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double]("score")).toMap
    val df = PageRank.run(g, cfg.copy(mode = "df")).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double]("score")).toMap
    assert(csr.keySet == df.keySet)
    for ((k, v) <- csr) assert(math.abs(v - df(k)) < 1e-12, s"node $k: csr $v df ${df(k)}")
    assert(math.abs(csr.values.sum - 1.0) < 1e-9)
  }

  test("hits: csr == df to 1e-12 on the tiny corpus") {
    def byName(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[String]("name") ->
        (r.getAs[Double]("hub"), r.getAs[Double]("auth"))).toMap
    val csr = byName(graft.algo.Hits.run(g, 20, tol = 0.0, mode = "csr"))
    val df = byName(graft.algo.Hits.run(g, 20, tol = 0.0, mode = "df"))
    assert(csr.keySet == df.keySet)
    for ((k, (h, a)) <- csr) {
      assert(math.abs(h - df(k)._1) < 1e-12, s"hub $k")
      assert(math.abs(a - df(k)._2) < 1e-12, s"auth $k")
    }
  }

  test("wcc: csr == df exactly on the tiny corpus") {
    val csr = Wcc.run(g, mode = "csr").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("component")).toMap
    val df = Wcc.run(g, mode = "df").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("component")).toMap
    assert(csr == df)
  }

  test("df-mode fixtures: exact-float pagerank and windowed wcc still hold") {
    // keep the shuffle path pinned to the reference fixtures too
    val edges = Seq(
      (10L, 1L, 3L), (11L, 1L, 2L), (12L, 1L, 2L), (9L, 1L, 2L), (12L, 2L, 4L),
      (13L, 2L, 5L), (14L, 5L, 5L), (14L, 5L, 4L), (5L, 4L, 6L), (15L, 4L, 7L),
      (10L, 4L, 7L), (10L, 5L, 8L)
    ).map { case (t, s, d) => (s, d, t) }
    val fg = LinkGraph.fromNumericEdgeList(spark, edges)
    val got = PageRank.run(fg, PageRank.Config(mode = "df")).collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Double]("score")).toMap
    assert(math.abs(got("1") - 0.07209850165402759) < 1e-6)
    assert(math.abs(got("5") - 0.1615298183542792) < 1e-6)

    val wedges = Seq((1L, 2L, 0L), (2L, 1L, 0L), (3L, 4L, 9L), (4L, 3L, 9L))
    val wg = LinkGraph.fromNumericEdgeList(spark, wedges)
    val comp = Wcc.run(wg.window(0L, 2L), mode = "df").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[String]("component")).toMap
    assert(comp == Map("1" -> "1", "2" -> "1"))
  }
}
