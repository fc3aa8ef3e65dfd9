package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Persistent (deletion-aware) graph: edges remain active from addition
  * until explicitly deleted — the reference's PersistentGraph semantics
  * (raphtory/src/db/graph/views/deletion_graph.rs:38-120,
  * db/api/mutation/deletion_ops.rs:23):
  *
  *  - events are (src, dst, ts, seq, layer, op) with op 0 = add, 1 = delete,
  *    ordered by (ts, seq);
  *  - an edge is alive_before(t) if its last addition strictly before t is
  *    later than its last deletion strictly before t, OR it is
  *    "only-deleted" (its first event is a deletion that has not happened
  *    yet by t — an edge deleted without a prior addition existed since
  *    −inf, deletion_graph.rs:60-80);
  *  - alive_at(t) additionally requires the first event AT exactly t not
  *    to be a deletion (deletion_graph.rs:82-100);
  *  - an edge is in window [start, end) if it is alive_at(start) or has an
  *    addition event inside the window ("active at any point in the
  *    window", deletion_graph.rs:40-42).
  *
  * Spark shape: one conditional min/max aggregation per (src, dst, layer)
  * computes every boundary event the predicate needs — a single shuffle,
  * no window functions, scale-independent of the event multiplicity.
  *
  * `window`/`at` return an ordinary LinkGraph snapshot (one edge event per
  * present (src, dst, layer) at its effective activation time), so the
  * whole analytics surface runs on persistent views unchanged. */
class PersistentGraph(val events: DataFrame, val nodes: DataFrame,
                      val namesAreNumeric: Boolean = false) extends Serializable {

  import PersistentGraph.key

  /** Structural snapshot of edges alive at any point in [start, end). */
  def window(start: Long, end: Long): LinkGraph = {
    val e = events
    val agg = e.groupBy(col("src"), col("dst"), col("layer")).agg(
      min(when(col("op") === 0, key(col("ts"), col("seq")))).as("first_add"),
      min(when(col("op") === 1, key(col("ts"), col("seq")))).as("first_del"),
      max(when(col("op") === 0 && col("ts") < start, key(col("ts"), col("seq")))).as("last_add_before"),
      max(when(col("op") === 1 && col("ts") < start, key(col("ts"), col("seq")))).as("last_del_before"),
      min(when(col("op") === 0 && col("ts") === start, key(col("ts"), col("seq")))).as("add_at_start"),
      min(when(col("op") === 1 && col("ts") === start, key(col("ts"), col("seq")))).as("del_at_start"),
      min(when(col("op") === 0 && col("ts") >= start && col("ts") < end, col("ts"))).as("add_in_window"))

    // alive_before(start): only-deleted || last add before start > last del before
    val onlyDeleted = (col("first_add").isNull ||
        col("first_del") < col("first_add")) &&
      col("first_del").isNotNull && col("first_del.ts") >= start
    // struct comparison with NULL-as-minus-infinity
    val lastAddWins = col("last_add_before").isNotNull &&
      (col("last_del_before").isNull || col("last_add_before") > col("last_del_before"))
    val aliveBefore = onlyDeleted || lastAddWins
    // first event AT start is a deletion?
    val deletedAtStart = col("del_at_start").isNotNull &&
      (col("add_at_start").isNull || col("del_at_start") < col("add_at_start"))
    val aliveAtStart = !deletedAtStart && aliveBefore
    val present = agg.filter(aliveAtStart || col("add_in_window").isNotNull)
      .select(col("src"), col("dst"),
        // effective activation: the window start if already alive, else the
        // first addition inside the window
        when(aliveAtStart, lit(start)).otherwise(col("add_in_window")).as("ts"),
        lit(0L).as("seq"), col("layer"))
    val active = present.select(col("src").as("vid"))
      .union(present.select(col("dst").as("vid"))).distinct()
    new LinkGraph(present, nodes.join(active, Seq("vid"), "left_semi"), namesAreNumeric)
  }

  def at(t: Long): LinkGraph = window(t, t + 1)

  def before(t: Long): LinkGraph = window(Long.MinValue + 1, t)

  def after(t: Long): LinkGraph = window(t + 1, Long.MaxValue)

  /** The event-graph view: additions only, as a plain temporal LinkGraph
    * (the reference's `event_graph()`, deletion_graph.rs:127-130). */
  def eventGraph: LinkGraph =
    new LinkGraph(events.filter(col("op") === 0).drop("op"), nodes, namesAreNumeric)
}

object PersistentGraph {

  /** (ts, seq) as an orderable struct — the TimeIndexEntry total order. */
  private def key(ts: Column, seq: Column): Column =
    struct(ts.as("ts"), seq.as("seq"))

  /** Build from an event table (src, dst, ts, seq, layer, op). Missing
    * layer/seq columns default like LinkGraph.fromRawEdges. */
  def fromEvents(df: DataFrame): PersistentGraph = {
    val withDefaults = Seq("seq" -> lit(0L), "layer" -> lit(graft.io.Ingest.DefaultLayer))
      .foldLeft(df) { case (d, (c, v)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, v)
      }
    val nodes = df.select(col("src").as("vid"))
      .union(df.select(col("dst").as("vid"))).distinct()
      .select(col("vid"), col("vid").cast("string").as("name"))
    new PersistentGraph(
      withDefaults.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      nodes.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      namesAreNumeric = true)
  }

  /** Convenience fixture loader: (src, dst, ts, op) tuples, seq = list
    * index (mutation order, like repeated add_edge/delete_edge calls). */
  def fromTuples(spark: org.apache.spark.sql.SparkSession,
                 list: Seq[(Long, Long, Long, Int)]): PersistentGraph = {
    import spark.implicits._
    val rows = list.zipWithIndex.map { case ((s, d, t, op), i) =>
      (s, d, t, i.toLong, graft.io.Ingest.DefaultLayer, op)
    }
    fromEvents(spark.createDataset(rows).toDF("src", "dst", "ts", "seq", "layer", "op"))
  }
}
