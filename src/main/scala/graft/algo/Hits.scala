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
  *  - stop when max per-node |Δhub| ≤ 0.01 and max |Δauth| ≤ 0.01, or after
  *    iterCount supersteps (default 20).
  *
  * The reference computes in f32; we compute in f64 (fixture asserted to
  * 1e-4). Same one-shuffle-per-direction superstep shape as PageRank. */
object Hits {

  /** Returns (vid, name, hub, auth). */
  def run(g: LinkGraph, iterCount: Int = 20, ctx: RunContext = RunContext.none): DataFrame =
    graft.bsp.IterativeConf.withStablePartitioning(g.spark) { run0(g, iterCount, ctx) }

  private def run0(g: LinkGraph, iterCount: Int, ctx: RunContext): DataFrame = {
    val spark = g.spark
    import spark.implicits._
    val p = spark.conf.get("spark.sql.shuffle.partitions").toInt

    val edges = g.dedupEdges.repartition(p, $"src").persist(StorageLevel.MEMORY_AND_DISK)
    val m = edges.count()

    var state = g.nodes.select($"vid", lit(1.0).as("hub"), lit(1.0).as("auth"))
      .repartition(p, $"vid").localCheckpoint(true)

    var step = 0
    var done = false
    while (!done && step < iterCount) {
      step += 1
      val t0 = System.nanoTime()
      // hub scores scatter along out-edges; auth scores along in-edges
      val recvHub = state.join(edges, state("vid") === edges("src"))
        .groupBy($"dst".as("vid")).agg(sum($"hub").as("recv_hub"))
      val recvAuth = state.join(edges, state("vid") === edges("dst"))
        .groupBy($"src".as("vid")).agg(sum($"auth").as("recv_auth"))
      val recv = state.select($"vid", $"hub", $"auth")
        .join(recvHub, Seq("vid"), "left")
        .join(recvAuth, Seq("vid"), "left")
        .select($"vid", $"hub", $"auth",
          coalesce($"recv_hub", lit(0.0)).as("rh"),
          coalesce($"recv_auth", lit(0.0)).as("ra"))
        .localCheckpoint(true)
      val tot = recv.agg(sum($"rh"), sum($"ra")).head()
      val totH = if (tot.isNullAt(0)) 0.0 else tot.getDouble(0)
      val totA = if (tot.isNullAt(1)) 0.0 else tot.getDouble(1)
      val newState = recv.select($"vid",
        (if (totA == 0.0) lit(0.0) else $"ra" / totA).as("new_hub"),
        (if (totH == 0.0) lit(0.0) else $"rh" / totH).as("new_auth"),
        $"hub", $"auth")
      val ck = newState.localCheckpoint(true)
      val diffs = ck.agg(max(abs($"hub" - $"new_hub")), max(abs($"auth" - $"new_auth"))).head()
      val dH = if (diffs.isNullAt(0)) 0.0 else diffs.getDouble(0)
      val dA = if (diffs.isNullAt(1)) 0.0 else diffs.getDouble(1)
      state.unpersist()
      state = ck.select($"vid", $"new_hub".as("hub"), $"new_auth".as("auth"))
        .localCheckpoint(true)
      done = dH <= 0.01 && dA <= 0.01
      ctx.record(StepStat("hits", step, 2 * m, 2 * m, math.max(dH, dA),
        (System.nanoTime() - t0) / 1e6))
    }
    edges.unpersist()
    state.join(g.nodes, Seq("vid")).select($"vid", $"name", $"hub", $"auth")
  }
}
