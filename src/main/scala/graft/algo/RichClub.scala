package graft.algo

import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** Temporal rich-club coefficient
  * (raphtory/src/algorithms/motifs/temporal_rich_club_coefficient.rs:39-97):
  *
  *  - S_k = nodes whose undirected distinct degree in the aggregate graph
  *    is ≥ k (the "club"); result 0 if |S_k| ≤ 1;
  *  - over every sliding window of `windowSize` consecutive views, the
  *    stable club edges are the intersection across the window of each
  *    view's canonical undirected non-self edges within S_k;
  *  - value = max over windows of |stable| / C(|S_k|, 2).
  *
  * Each view's club edge set is computed as a Spark job (a filter +
  * semi-join over the windowed edge table); the per-window intersection and
  * max run on the driver over those (small, club-bounded) sets — mirroring
  * the reference's per-view fold. */
object RichClub {

  def temporalRichClub(agg: LinkGraph, views: Seq[LinkGraph], k: Int, windowSize: Int): Double = {
    val spark = agg.spark
    import spark.implicits._
    // the club as a DataFrame: membership tests are broadcast SEMI-JOINS
    // (codegen'd, pushdown-friendly), not a UDF over a driver Set
    val club = agg.degrees.filter(col("degree") >= k).select($"vid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val clubSize = club.count()
    if (clubSize <= 1) { club.unpersist(); return 0.0 }
    // per-view club edge sets fold on the driver (mirroring the
    // reference's sequential per-view intersection) — bound the worst
    // case C(|S_k|,2) before collecting instead of a silent OOM when a
    // small k admits most of a large graph into the club
    graft.bsp.DriverGuard.check(agg, "RichClub.temporalRichClub",
      clubSize * (clubSize - 1) / 2,
      "raise k (shrink the club), raise graft.driver.maxElements, or " +
        "intersect per-window edge sets distributedly via g_rich_club's " +
        "sliding-window join plan")
    val edgeSets: Seq[Set[(Long, Long)]] = views.map { v =>
      v.dedupEdges
        .filter($"src" =!= $"dst")
        .join(broadcast(club).withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
        .join(broadcast(club).withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")
        .select(least($"src", $"dst").as("a"), greatest($"src", $"dst").as("b"))
        .distinct().as[(Long, Long)].collect().toSet
    }
    club.unpersist()
    val possible = clubSize * (clubSize - 1) / 2
    edgeSets.sliding(windowSize).filter(_.size == windowSize)
      .map(w => w.reduce(_ intersect _).size.toDouble / possible)
      .foldLeft(0.0)(math.max)
  }

  /** Convenience: rolling(window, step) views of the aggregate graph. */
  def temporalRichClubRolling(agg: LinkGraph, rollWindowMs: Long, rollStepMs: Long,
                              k: Int, windowSize: Int): Double =
    temporalRichClub(agg, agg.rolling(rollWindowMs, rollStepMs), k, windowSize)
}
