package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.graph.LinkGraph
import graft.bsp.{RunContext, StepStat}

/** HITS hubs & authorities with the reference's semantics
  * (raphtory/src/algorithms/centrality/hits.rs:51-160):
  *
  *  - init hub = auth = 1;
  *  - per superstep over the distinct directed graph:
  *      recv_hub(t)  = Σ_{u→t} hub(u);   recv_auth(t) = Σ_{t→u} auth(u);
  *      auth'(t) = recv_hub(t) / Σ_v recv_hub(v);
  *      hub'(t)  = recv_auth(t) / Σ_v recv_auth(v);
  *    (nodes receiving nothing get 0);
  *  - stop when max per-node |Δhub| ≤ tol and max |Δauth| ≤ tol (reference
  *    fixed 0.01), or after iterCount supersteps (default 20). tol = 0 runs
  *    the full iterCount — the oracle-reproducible mode.
  *
  * The reference computes in f32; we compute in f64 (fixture asserted to
  * 1e-4).
  *
  * Physical shapes: the DF path folds BOTH message directions into ONE
  * tagged scatter table, so a superstep is a single shuffle
  * (groupBy(to, kind)) + one localCheckpoint + two cached-scan actions;
  * the CSR fast path (auto below 32M ids, like PageRank) gathers both
  * directions in one broadcast job per superstep. */
object Hits {

  val InMemMaxIds: Long = 32L * 1000 * 1000

  /** Returns (vid, name, hub, auth). */
  def run(g: LinkGraph, iterCount: Int = 20, ctx: RunContext = RunContext.none,
          tol: Double = 0.01, mode: String = "auto"): DataFrame = {
    val maxVid = g.nodes.agg(max("vid")).head() match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    if (maxVid < 0)
      return g.nodes.select(col("vid"), col("name"),
        lit(0.0).as("hub"), lit(0.0).as("auth")).limit(0)
    val useCsr = mode == "csr" ||
      (mode == "auto" && graft.graph.CsrGraph.inMemFits(g, maxVid, InMemMaxIds))
    if (useCsr) runCsr(g, iterCount, tol, ctx)
    else graft.bsp.IterativeConf.withStablePartitioning(g.spark) {
      runDf(g, iterCount, tol, ctx)
    }
  }

  private def runCsr(g: LinkGraph, iterCount: Int, tol: Double, ctx: RunContext): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val fwd = graft.graph.CsrGraph.fromLinkGraph(g, p)             // in-nbrs per dst
    val rev = graft.graph.CsrGraph.reversedFromLinkGraph(g, p)     // out-nbrs per src
    val (hub, auth) = graft.bsp.CsrSuperstep.hits(fwd, rev, iterCount, tol, ctx)
    fwd.unpersist(); rev.unpersist()
    val rows = g.nodes.select($"vid").as[Long].collect().sorted
      .map(v => (v, hub(v.toInt), auth(v.toInt)))
    val res = spark.createDataset(rows.toSeq).toDF("vid", "hub", "auth")
    res.join(g.nodes, Seq("vid")).select($"vid", $"name", $"hub", $"auth")
  }

  private def runDf(g: LinkGraph, iterCount: Int, tol: Double, ctx: RunContext): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt

    // tagged scatter table: kind 0 carries hub(u) -> recv_hub(v) along u→v,
    // kind 1 carries auth(v) -> recv_auth(u) against it — one shuffle/superstep
    val e = g.dedupEdges
    val scatter = e.select($"src".as("from"), $"dst".as("to"), lit(0).as("kind"))
      .union(e.select($"dst".as("from"), $"src".as("to"), lit(1).as("kind")))
      .repartition(p, $"from").persist(StorageLevel.MEMORY_AND_DISK)
    val m = scatter.count() / 2

    var stateCk = g.nodes.select($"vid", lit(1.0).as("hub"), lit(1.0).as("auth"))
      .repartition(p, $"vid").localCheckpoint(true)
    var state = stateCk

    var step = 0
    var done = false
    while (!done && step < iterCount) {
      step += 1
      val t0 = System.nanoTime()
      val recv = state.hint("shuffle_hash").join(scatter, state("vid") === $"from")
        .groupBy($"to".as("rvid")).agg(
          sum(when($"kind" === 0, $"hub").otherwise(0.0)).as("rh"),
          sum(when($"kind" === 1, $"auth").otherwise(0.0)).as("ra"))
      val joined = state.join(recv, state("vid") === $"rvid", "left")
        .select($"vid", $"hub", $"auth",
          coalesce($"rh", lit(0.0)).as("rh"), coalesce($"ra", lit(0.0)).as("ra"))
        .localCheckpoint(true)
      val tot = joined.agg(sum($"rh"), sum($"ra")).head()
      val totH = if (tot.isNullAt(0)) 0.0 else tot.getDouble(0)
      val totA = if (tot.isNullAt(1)) 0.0 else tot.getDouble(1)
      val hubE = if (totA == 0.0) lit(0.0) else $"ra" / totA
      val authE = if (totH == 0.0) lit(0.0) else $"rh" / totH
      val diffs = joined.agg(
        max(abs($"hub" - hubE)), max(abs($"auth" - authE))).head()
      val dH = if (diffs.isNullAt(0)) 0.0 else diffs.getDouble(0)
      val dA = if (diffs.isNullAt(1)) 0.0 else diffs.getDouble(1)
      stateCk.unpersist()
      stateCk = joined
      state = joined.select($"vid", hubE.as("hub"), authE.as("auth"))
      done = tol > 0 && dH <= tol && dA <= tol
      ctx.record(StepStat("hits", step, 2 * m, 2 * m, math.max(dH, dA),
        (System.nanoTime() - t0) / 1e6))
    }
    ctx.finish() // barrier: async snapshot commits durable before returning
    scatter.unpersist()
    state.join(g.nodes, Seq("vid")).select($"vid", $"name", $"hub", $"auth")
  }
}
