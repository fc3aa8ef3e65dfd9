package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import graft.graph.LinkGraph
import graft.algo.PageRank
import graft.ckpt.{Catalog, CatalogRunContext}

/** North rule: superstep state + per-partition lineage/metrics checkpoints;
  * killed runs resume mid-iteration without recomputing earlier steps. */
class CkptSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  val edges = Seq(
    (1L, 2L, 1L), (1L, 3L, 2L), (1L, 4L, 3L), (3L, 1L, 4L), (3L, 4L, 5L), (3L, 5L, 6L),
    (4L, 5L, 7L), (5L, 6L, 8L), (5L, 8L, 9L), (7L, 5L, 10L), (8L, 5L, 11L), (1L, 9L, 12L),
    (9L, 1L, 13L), (6L, 3L, 14L), (4L, 8L, 15L), (8L, 3L, 16L), (5L, 10L, 17L), (10L, 5L, 18L))

  def pr(g: LinkGraph, ctx: graft.bsp.RunContext) =
    PageRank.run(g, PageRank.Config(iterCount = 12, tol = 0.0, mode = "df"), ctx)
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Double]("score")).toMap

  test("kill after step k: resume completes identically without recomputing <= k") {
    val root = Files.createTempDirectory("graft-ckpt").toString
    val cat = new Catalog(root)
    val g = LinkGraph.fromNumericEdgeList(spark, edges)

    // uninterrupted run
    val full = pr(g, new CatalogRunContext(cat, "run-a", spark))
    assert(cat.snapshots("state/run-a") == (1L to 12L))

    // simulate a crash after superstep 7 of a second run: first do the full
    // run, then delete snapshots > 7 (as if the process died mid-step-8)
    pr(g, new CatalogRunContext(cat, "run-b", spark))
    for (s <- 8L to 12L)
      Files.delete(Paths.get(root, "state/run-b/meta", s"manifest-$s.json"))
    // a half-written data dir without manifest must be invisible
    Files.createDirectories(Paths.get(root, "state/run-b/snap-99"))
    val ctx2 = new CatalogRunContext(cat, "run-b", spark)
    val resumed = pr(g, ctx2)
    assert(ctx2.resumedFromStep == 7L)
    // only steps 8..12 were recomputed
    assert(ctx2.stats.map(_.step).toSet == (8 to 12).toSet)
    for ((k, v) <- full) assert(math.abs(resumed(k) - v) < 1e-15, s"node $k")
  }

  test("WCC kill/resume: labels identical, pre-crash supersteps not recomputed") {
    val root = Files.createTempDirectory("graft-ckpt-wcc").toString
    val cat = new Catalog(root)
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    def labels(ctx: graft.bsp.RunContext) =
      graft.algo.Wcc.run(g, ctx = ctx, mode = "df").collect()
        .map(r => r.getAs[Long]("vid") -> r.getAs[Long]("component_vid")).toMap
    val full = labels(new CatalogRunContext(cat, "wcc-a", spark))
    val committed = cat.snapshots("state/wcc-a")
    assert(committed.size >= 3, s"need >2 supersteps to crash-drop, got $committed")
    labels(new CatalogRunContext(cat, "wcc-b", spark))
    for (s <- 3L to committed.max)
      Files.delete(Paths.get(root, "state/wcc-b/meta", s"manifest-$s.json"))
    val ctx2 = new CatalogRunContext(cat, "wcc-b", spark)
    val resumed = labels(ctx2)
    assert(ctx2.resumedFromStep == 2L)
    assert(ctx2.stats.forall(_.step > 2), "resume recomputed pre-crash supersteps")
    assert(resumed == full)
  }

  test("sync LPA kill/resume mid-sweep: labels identical to the uninterrupted run") {
    val root = Files.createTempDirectory("graft-ckpt-lpa").toString
    val cat = new Catalog(root)
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    def labels(ctx: graft.bsp.RunContext) =
      graft.algo.Lpa.runSync(g, mode = "df", ctx = ctx).collect()
        .map(r => r.getAs[Long]("vid") -> r.getAs[String]("label")).toMap
    val full = labels(new CatalogRunContext(cat, "lpa-a", spark))
    val halfSteps = cat.snapshots("state/lpa-a")
    assert(halfSteps.size >= 3, s"need >2 half-sweeps, got $halfSteps")
    labels(new CatalogRunContext(cat, "lpa-b", spark))
    // crash ON an odd boundary: the resumed run restarts MID-SWEEP (colour
    // 1 of its sweep) where the first phase's changed count is unknown —
    // the convergence guard must not early-exit that sweep
    for (s <- 2L to halfSteps.max)
      Files.delete(Paths.get(root, "state/lpa-b/meta", s"manifest-$s.json"))
    val ctx2 = new CatalogRunContext(cat, "lpa-b", spark)
    val resumed = labels(ctx2)
    assert(ctx2.resumedFromStep == 1L)
    assert(ctx2.stats.forall(_.step > 1))
    assert(resumed == full)
  }

  test("async metric-flush failures surface at the finish() barrier, not silently") {
    // catalog root nested under a plain FILE: every mkdirs/create fails
    val f = Files.createTempFile("graft-ckpt-block", "")
    val ctx = new CatalogRunContext(new Catalog(f.toString + "/sub"), "run-e", spark)
    ctx.record(graft.bsp.StepStat("pagerank", 1, 1L, 1L, 0.0, 1.0))
    val e = intercept[Throwable] { ctx.finish() }
    assert(e.getMessage != null)
    Files.delete(f)
  }

  test("metrics table carries global and per-partition lineage rows") {
    val root = Files.createTempDirectory("graft-ckpt2").toString
    val cat = new Catalog(root)
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    val ctx = new CatalogRunContext(cat, "run-m", spark)
    pr(g, ctx)
    ctx.flushMetrics()
    val m = ctx.metrics().get.collect()
    val global = m.filter(_.getAs[Int]("partition") == -1)
    val lineage = m.filter(r => r.getAs[String]("algo") == "lineage")
    assert(global.map(_.getAs[Int]("step")).toSet == (1 to 12).toSet)
    assert(lineage.nonEmpty)
    // lineage row counts per step sum to the node count
    val byStep = lineage.groupBy(_.getAs[Int]("step")).view.mapValues(_.map(_.getAs[Long]("rows")).sum)
    byStep.foreach { case (_, total) => assert(total == 10L) }
    assert(global.forall(_.getAs[Long]("edges_scattered") > 0))
  }
}
