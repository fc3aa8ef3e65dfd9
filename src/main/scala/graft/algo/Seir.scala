package graft.algo

import org.apache.spark.sql.DataFrame
import graft.graph.LinkGraph

/** Temporal SEIR/SI epidemic simulation over the exploded edge-event log —
  * the reference's event-queue dynamics
  * (raphtory/src/algorithms/dynamics/temporal/epidemics.rs:150-240, after
  * arXiv:2007.14386):
  *
  *  - seeds become infected at `initialInfection`;
  *  - an infected node v activates at infected + incubation (default 1) and
  *    recovers at active + recovery (default ∞ → SI);
  *  - while active, each exploded out-edge event (in [active, recovered))
  *    to a not-yet-infected neighbour flips an infection coin with
  *    probability p; the FIRST success schedules the neighbour's infection
  *    at that event's time;
  *  - events process in (time, vid) order; first infection wins.
  *
  * The reference draws from a caller-supplied RNG (its own tests are
  * statistical, not exact); we use a deterministic seeded stream
  * (rng.Rand08.StdRng), so runs are reproducible. Driver-side simulation
  * over the collected event log, like the reference's single-process
  * event queue; graphs must fit the driver. Exponential incubation/recovery
  * sampling uses inverse-CDF on the same stream. */
object Seir {

  case class Config(
      infectionProb: Double,
      initialInfection: Long,
      recoveryRate: Option[Double] = None,
      incubationRate: Option[Double] = None,
      seed: Array[Byte] = Array.fill[Byte](32)(7),
      /** Infection-coin source. "chacha" = one sequential seeded stream
        * drawn in queue order (the reference's caller-RNG shape);
        * "hash" = an independent md5-derived coin per edge event
        * (md5u32(src:dst:ts:seq:salt)/2^32 < p) — still a deterministic
        * RNG, but order-independent, which makes the SI epidemic a pure
        * min-fixpoint: infection(v) = min event time te of a coin-true
        * event (u,v,te) with te ≥ infection(u)+incubation. That form is
        * replayable by the DuckDB oracle (recursive CTE) and would
        * distribute as superstep min-propagation at scale. Only valid
        * with constant incubation/recovery (rates draw from the
        * sequential stream). */
      rngMode: String = "chacha")

  /** Returns (vid, name, infected, active, recovered). */
  def run(g: LinkGraph, seeds: Seq[String], cfg: Config): DataFrame = {
    // nodes + events: the run collects BOTH the name map and the event
    // adjacency, so a many-isolated-nodes graph must trip the guard too
    graft.bsp.DriverGuard.check(g, "Seir.run", g.edgeEventCount + g.nodeCount,
      "window the event log first; the epidemic queue is inherently sequential")
    val spark = g.spark
    import spark.implicits._
    require(cfg.infectionProb >= 0 && cfg.infectionProb <= 1)
    require(cfg.rngMode == "chacha" ||
      (cfg.incubationRate.isEmpty && cfg.recoveryRate.isEmpty),
      "hash rngMode supports constant incubation/recovery only")
    val rng = new graft.rng.Rand08.StdRng(cfg.seed)
    def uniform(): Double = (rng.nextU32().toLong & 0xffffffffL).toDouble / (1L << 32).toDouble
    def bernoulli(p: Double): Boolean = uniform() < p
    def exp(rate: Double): Long = (-math.log1p(-uniform()) / rate).toLong
    /** Per-event md5 coin (rngMode "hash"): portable to the SQL oracle —
      * same first-8-md5-hex-as-u32 scheme as TextOps.md5u32. The digest
      * instance is reused (digest() resets it; this loop is sequential)
      * instead of re-allocating per event. */
    val coinMd = java.security.MessageDigest.getInstance("MD5")
    def hashCoin(s: Long, d: Long, t: Long, q: Long, p: Double): Boolean = {
      val hex = coinMd.digest(s"$s:$d:$t:$q:seir".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16).toDouble / (1L << 32).toDouble < p
    }

    val names = g.nodes.as[(Long, String)].collect().toMap
    val byName = names.map(_.swap)
    // out-event adjacency sorted by (ts, seq)
    val events = g.edges.select("src", "dst", "ts", "seq")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1)
      .map { case (s, es) => s -> es.sortBy(e => (e._3, e._4)) }

    final case class Infected(infected: Long, active: Long, recovered: Long)
    val states = scala.collection.mutable.HashMap.empty[Long, Infected]
    // (time, vid) min-queue — deterministic tie order like the reference's
    // BinaryHeap<Reverse<Infection>> with derived lexicographic Ord
    val queue = scala.collection.mutable.PriorityQueue.empty[(Long, Long)](
      Ordering.Tuple2[Long, Long].reverse)
    seeds.flatMap(byName.get).foreach(v => queue.enqueue((cfg.initialInfection, v)))

    while (queue.nonEmpty) {
      val (t, v) = queue.dequeue()
      if (!states.contains(v)) {
        val incubation = cfg.incubationRate.map(exp).getOrElse(1L)
        val recovery = cfg.recoveryRate.map(exp).getOrElse(Long.MaxValue)
        val start = saturatingAdd(t, incubation)
        val end = saturatingAdd(start, recovery)
        states(v) = Infected(t, start, end)
        // exploded out-edge events within the active window, per neighbour
        events.getOrElse(v, Array.empty).iterator
          .filter(e => e._3 >= start && e._3 < end)
          .toSeq.groupBy(_._2)
          .toSeq.sortBy(_._2.head._4) // neighbour groups in first-event order
          .foreach { case (nbr, es) =>
            if (!states.contains(nbr)) {
              es.iterator.map { e =>
                val coin =
                  if (cfg.rngMode == "hash") hashCoin(e._1, e._2, e._3, e._4, cfg.infectionProb)
                  else bernoulli(cfg.infectionProb)
                (e._3, coin)
              }
                .collectFirst { case (et, true) => et }
                .foreach(et => queue.enqueue((et, nbr)))
            }
          }
      }
    }
    val rows = states.toSeq.map { case (v, s) =>
      (v, names(v), s.infected, s.active, s.recovered)
    }
    spark.createDataset(rows).toDF("vid", "name", "infected", "active", "recovered")
  }

  private def saturatingAdd(a: Long, b: Long): Long = {
    val r = a + b
    if (b > 0 && r < a) Long.MaxValue else r
  }
}
