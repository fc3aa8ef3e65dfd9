package graft

import org.apache.spark.sql.SparkSession
import graft.graph.{CsrGraph, LinkGraph}
import graft.bsp.{CsrSuperstep, LocalRunContext}
import graft.algo.{PageRank, Triangles, Wcc}
import graft.io.Corpus

/** Driver-run benchmark. Prints ONE JSON line:
  * {"metric":"total","value":S,"unit":"sec","queries":{...},"sf":...,
  *  "corpus":{...},"scaling":{...}}.
  *
  * Three parts:
  *  1. corpus pipeline — the reference's Criterion bench graph scale
  *     (seeded 500k-node / 2M-edge attachment graph,
  *     raphtory-benchmark/benches/algobench.rs:56-90): full HTML ingest,
  *     PageRank (20 iters, CSR fast path), WCC, triangle count; reports
  *     edges-scattered/sec per PageRank superstep (the BASELINE.json metric);
  *  2. the oracle queries at SPARK_GRAFT_SF_DIR (row counts only);
  *  3. scaling evidence (BASELINE.md protocol): PageRank supersteps (CSR
  *     engine) on a 64M-edge seeded graph at local[8] vs local[32],
  *     interleaved best-of rounds (the host VM is noisy), reporting
  *     throughput at both and efficiency = thr32 / (4·thr8). Disable with
  *     SPARK_GRAFT_SCALING=0; the shuffle-path legs are in
  *     tools.ScalingCheck (SCALE_MODE=df).
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // tmpfs shuffle dirs: /tmp is a spinning disk here and serialises
      // concurrent shuffle writers (cluster analogue: per-node NVMe)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val doScaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    val benchPages = sys.env.getOrElse("SPARK_GRAFT_BENCH_PAGES", "500000").toLong

    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val extra = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // ---- part 1: corpus pipeline at the reference bench scale ----
    val spark = session(cpus)
    locally {
      val (g, tIngest) = time {
        val g0 = LinkGraph.fromPages(Corpus.pages(spark, benchPages, 4).toDF()).cache()
        g0.edges.count(); g0.nodes.count()
        g0
      }
      results("corpus_ingest") = tIngest
      val p = cpus
      val (csr, tCsr) = time {
        val c = CsrGraph.fromLinkGraph(g, p)
        c.blocks.count(); c
      }
      results("corpus_csr_pack") = tCsr
      val outDeg = CsrGraph.outDegrees(csr)
      val ctx = new LocalRunContext
      val (_, tPr) = time {
        CsrSuperstep.pageRank(csr, outDeg, 20, 0.0, 0.85, true, ctx)
      }
      results("corpus_pagerank20") = tPr
      val steps = ctx.stats.count(_.algo == "pagerank-csr")
      val scattered = csr.edgeCount * steps
      extra("pagerank_supersteps") = steps.toString
      extra("pagerank_edges_scattered_per_sec") = f"${scattered / tPr}%.0f"
      extra("corpus_nodes") = csr.nPresent.toString
      extra("corpus_edges") = csr.edgeCount.toString
      csr.unpersist()

      // corpus WCC / triangles: best of 2 rounds — the host VM phases in
      // and out of 4-7x slowdowns (BASELINE.md methodology), so a single
      // sample routinely misreports these two; best-of pins the
      // interference-free estimate the same way the scaling legs do
      val (_, tWcc1) = time { Wcc.run(g).count() }
      val (_, tWcc2) = time { Wcc.run(g).count() }
      results("corpus_wcc") = math.min(tWcc1, tWcc2)
      val (tri, tTri1) = time { Triangles.count(g, useKCore = false) }
      val (_, tTri2) = time { Triangles.count(g, useKCore = false) }
      results("corpus_triangles") = math.min(tTri1, tTri2)
      extra("corpus_triangle_count") = tri.toString
      g.unpersist()
    }

    // ---- part 2: the oracle queries at sfDir ----
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      var ok = true
      val (_, t) = time {
        try fn(spark, sfDir).count() catch { case _: Throwable => ok = false }
      }
      // failures are recorded as negative timings + listed in detail so a
      // broken query can never masquerade as a fast one
      results(name) = if (ok) t else -t
      if (!ok) failed += name
    }
    if (failed.nonEmpty) extra("failed_queries") = failed.mkString(",")

    // ---- part 3: N vs 4N scaling (BASELINE.md protocol) ----
    spark.stop()
    if (doScaling) {
      val scaleNodes = sys.env.getOrElse("SPARK_GRAFT_SCALE_NODES", "4000000").toLong
      val scaleK = 16
      val iters = 5
      val rounds = 3
      import graft.tools.ScalingCheck.measureRounds
      // interleaved best-of legs: the host is a noisy shared VM (round-to-
      // round swings up to 6x), so per parallelism we take the best round
      // across two interleaved legs as the interference-free estimate and
      // record every round for transparency
      val legs = 3 // host-noise phases can swallow a whole leg; spread legs in time
      var r8 = Seq.empty[Double]
      var r32 = Seq.empty[Double]
      for (_ <- 1 to legs) {
        r8 = r8 ++ measureRounds(8, scaleNodes, scaleK, iters, rounds, "csr")
        r32 = r32 ++ measureRounds(32, scaleNodes, scaleK, iters, rounds, "csr")
      }
      val thr8 = r8.max
      val thr32 = r32.max
      extra("scaling_mode") = "csr-superstep"
      extra("scaling_thr_local8") = f"$thr8%.0f"
      extra("scaling_thr_local32") = f"$thr32%.0f"
      extra("scaling_rounds_local8") = r8.map(r => f"$r%.0f").mkString(" ")
      extra("scaling_rounds_local32") = r32.map(r => f"$r%.0f").mkString(" ")
      extra("scaling_efficiency") = f"${thr32 / (4.0 * thr8)}%.3f"
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val ex = extra.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }.mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","detail":$ex}""")
  }
}
