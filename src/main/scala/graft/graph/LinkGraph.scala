package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.io.{EdgeEvent, Ingest}

/** The engine's graph abstraction: two Datasets.
  *
  *  - `edges(src, dst, ts, seq, layer)` — the exploded temporal edge-event
  *    log over dense vertex ids (the analogue of the reference's
  *    `TemporalGraph` event log, raphtory/src/core/entities/graph/tgraph.rs:45-68).
  *  - `nodes(vid, name)` — vid is the dense first-appearance rank
  *    (SURVEY.md §7.4); name is the external GID (url / fixture id).
  *
  * All views (window / layer / subgraph — SURVEY §1.5) are non-destructive
  * Catalyst filters over the same two Datasets, so stacked views fuse into
  * one WholeStageCodegen stage exactly like the reference's zero-copy view
  * wrappers (raphtory/src/db/graph/views/window_graph.rs:76-120).
  *
  * `namesAreNumeric`: true when every GID parses as u64 — GID ordering (all
  * numeric ids sort before all strings; raphtory-api/src/core/entities/mod.rs:84-88)
  * then reduces to numeric order. Used by LPA tie-breaks.
  */
class LinkGraph(
    val edges: DataFrame,            // src: Long, dst: Long, ts: Long, seq: Long, layer: String
    val nodes: DataFrame,            // vid: Long, name: String
    val namesAreNumeric: Boolean = false,
    // timestamped node property events (vid, prop, ts, value) — the
    // reference's temporal property system (core/mod.rs:78-96)
    val nodePropEvents: Option[DataFrame] = None) extends Serializable {

  def spark: SparkSession = edges.sparkSession

  // ---- view algebra (SURVEY §1.5) ----------------------------------------

  /** Events with start <= ts < end; nodes restricted to active endpoints
    * (db/api/view/time.rs:115 — inclusive start, exclusive end). Temporal
    * node property events are windowed by the same bounds (the reference's
    * window views restrict property histories too,
    * db/graph/views/window_graph.rs:76-120). A property update IS node
    * activity in the reference, so the induced node set is edge endpoints
    * UNION in-window property-event vids: a node whose only in-window
    * activity is a property update still appears in nodes/degree (degree
    * 0) and answers property reads (locked by ViewSpec). */
  def window(start: Long, end: Long): LinkGraph = {
    val e = edges.filter(col("ts") >= start && col("ts") < end)
    val props = nodePropEvents.map(_.filter(col("ts") >= start && col("ts") < end))
    induced(e, props, props.map(_.select(col("vid"))))
  }

  def before(t: Long): LinkGraph = window(Long.MinValue, t)
  def after(t: Long): LinkGraph = window(t + 1, Long.MaxValue)
  def at(t: Long): LinkGraph = window(t, t + 1)

  /** Restrict to named layers (db/api/view/layer.rs:12-37). Nodes keep the
    * full set (layer views filter edges only in the reference). */
  def layers(names: Seq[String]): LinkGraph =
    new LinkGraph(edges.filter(col("layer").isin(names: _*)), nodes, namesAreNumeric,
      nodePropEvents)

  /** Default node type for nodes never explicitly typed
    * (raphtory-api/src/core/entities/mod.rs — the reference's `_default`). */
  val DefaultNodeType = "_default"

  /** Attach node types from a (vid, node_type) table; untyped nodes get
    * `_default` (db/api/view/node.rs:83-84). Returns a graph whose `nodes`
    * carry the extra column, usable by subgraphNodeTypes. */
  def withNodeTypes(types: DataFrame): LinkGraph = {
    val t = types.select(col("vid"), col("node_type"))
    val typed = nodes.drop("node_type").join(t, Seq("vid"), "left")
      .withColumn("node_type", coalesce(col("node_type"), lit(DefaultNodeType)))
    new LinkGraph(edges, typed, namesAreNumeric, nodePropEvents)
  }

  /** Attach arbitrary node property columns from a table keyed by `vid`
    * or by `name` — the load_node_props_from_* loaders
    * (raphtory/src/io/arrow/df_loaders.rs node-property path). Properties
    * become ordinary columns of `nodes`, filterable with native Catalyst
    * predicates like every other property. */
  def withNodeProps(props: DataFrame): LinkGraph = {
    val key = if (props.columns.contains("vid")) "vid" else "name"
    new LinkGraph(edges, nodes.join(props, Seq(key), "left"), namesAreNumeric, nodePropEvents)
  }

  // ---- temporal node properties (core/mod.rs:78-96) -----------------------

  /** Attach a timestamped node property EVENT log (vid, prop, ts, value):
    * the reference's temporal property system, where every property keeps
    * a per-entity history readable with `history()/at(t)/latest()`
    * (db/api/view/node.rs:96-109). Static columns (withNodeProps) stay the
    * fit for immutable attributes; this is for values that change. */
  def withNodePropEvents(events: DataFrame): LinkGraph =
    new LinkGraph(edges, nodes, namesAreNumeric,
      Some(events.select(col("vid"), col("prop"), col("ts"), col("value"))))

  private def propEventsOrEmpty: DataFrame = nodePropEvents.getOrElse {
    import org.apache.spark.sql.types._
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vid", LongType), StructField("prop", StringType),
        StructField("ts", LongType), StructField("value", DoubleType))))
  }

  /** Full timestamped history of one property: (vid, ts, value), view-
    * windowed like edges (node.rs:96-103 `properties().temporal().get(p)
    * .history()`). */
  def propertyHistory(prop: String): DataFrame =
    propEventsOrEmpty.filter(col("prop") === prop).select(col("vid"), col("ts"), col("value"))

  /** Latest value of `prop` per node at time t (events with ts <= t;
    * node.rs:104-109 `.at(t)`): (vid, ts, value) — one hash aggregate,
    * no window/sort. Nodes with no event by t are absent. Same-timestamp
    * updates tie-break on the larger value (the event log carries no seq,
    * unlike the reference's (ts, seq) TimeIndexEntry) — deterministic
    * across runs, where a bare max_by(value, ts) picks an arbitrary row. */
  def propertyAt(prop: String, t: Long): DataFrame =
    propertyHistory(prop).filter(col("ts") <= t)
      .groupBy(col("vid"))
      .agg(max(col("ts")).as("ts"),
        max_by(col("value"), struct(col("ts"), col("value"))).as("value"))

  /** Latest value per node over the whole view (`.latest()`). */
  def propertyLatest(prop: String): DataFrame = propertyAt(prop, Long.MaxValue)

  /** Timestamped history of an edge-event property: (src, dst, ts, value).
    * Edge temporal properties ride as extra columns of the exploded event
    * log (fromRawEdges keeps them), so the history IS a projection —
    * view-windowed like everything else (edge.rs:66-77 `history()` over
    * per-event props). */
  def edgePropertyHistory(prop: String): DataFrame =
    edges.select(col("src"), col("dst"), col("ts"), col(prop).as("value"))

  /** Latest value of an edge-event property per (src, dst) at time t:
    * one hash aggregate, deterministic for per-edge-unique event times. */
  def edgePropertyAt(prop: String, t: Long): DataFrame =
    edgePropertyHistory(prop).filter(col("ts") <= t)
      .groupBy(col("src"), col("dst"))
      .agg(max(col("ts")).as("ts"), max_by(col("value"), col("ts")).as("value"))

  /** Induced subgraph of the nodes whose type is in `types` — the
    * reference's subgraph_node_types
    * (db/graph/views/node_type_filtered_subgraph.rs). Untyped graphs have
    * every node at `_default`. */
  def subgraphNodeTypes(types: Seq[String]): LinkGraph = {
    val typed =
      if (nodes.columns.contains("node_type")) nodes
      else nodes.withColumn("node_type", lit(DefaultNodeType))
    subgraph(typed.filter(col("node_type").isin(types: _*)).select(col("vid")))
  }

  /** Induced subgraph on a node set given as a DataFrame with a `vid`
    * column (db/graph/views/node_subgraph.rs). Semi-joins both endpoints;
    * nodes filtered to the set. */
  def subgraph(vids: DataFrame): LinkGraph = {
    val v = vids.select(col("vid"))
    val e = edges
      .join(v.withColumnRenamed("vid", "src"), Seq("src"), "left_semi")
      .join(v.withColumnRenamed("vid", "dst"), Seq("dst"), "left_semi")
    new LinkGraph(e, nodes.join(v, Seq("vid"), "left_semi"), namesAreNumeric,
      nodePropEvents.map(_.join(v, Seq("vid"), "left_semi")))
  }

  private def induced(e: DataFrame,
                      props: Option[DataFrame] = nodePropEvents,
                      extraActive: Option[DataFrame] = None): LinkGraph = {
    val endpoints = e.select(col("src").as("vid"))
      .union(e.select(col("dst").as("vid")))
    val active = extraActive.fold(endpoints)(endpoints.union(_)).distinct()
    new LinkGraph(e, nodes.join(active, Seq("vid"), "left_semi"), namesAreNumeric, props)
  }

  /** Rolling windowed views: [start, start+window), stepping by `step`,
    * covering the event-time span (db/api/view/time.rs:143-152). Bounds are
    * fetched once; each element is a lazy filtered view. */
  def rolling(windowMs: Long, stepMs: Long): Seq[LinkGraph] = {
    timeBounds.toSeq.flatMap { case (lo, hi) =>
      Iterator.iterate(lo)(_ + stepMs).takeWhile(_ <= hi)
        .map(s => window(s, s + windowMs)).toSeq
    }
  }

  /** Expanding views: window(-inf, t) for t = lo+step, lo+2·step, ... ≥ hi
    * (time.rs:154-162). */
  def expanding(stepMs: Long): Seq[LinkGraph] = {
    timeBounds.toSeq.flatMap { case (lo, hi) =>
      Iterator.iterate(lo + stepMs)(_ + stepMs).takeWhile(_ - stepMs < hi)
        .map(t => window(Long.MinValue, t)).toSeq
    }
  }

  def timeBounds: Option[(Long, Long)] = {
    val r = edges.agg(min(col("ts")), max(col("ts"))).head()
    if (r.isNullAt(0)) None else Some((r.getLong(0), r.getLong(1) + 1))
  }

  /** Copy this view into an independent graph with vids re-minted densely
    * in view iteration (= vid) order — the reference's materialize()
    * (db/api/view/graph.rs:148-260, node remap at 219-237). */
  def materialize(): LinkGraph = {
    val spark = this.spark
    val remapSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("old_vid", org.apache.spark.sql.types.LongType, false),
      org.apache.spark.sql.types.StructField("new_vid", org.apache.spark.sql.types.LongType, false)))
    val remapRdd = nodes.select(col("vid")).orderBy(col("vid")).rdd.zipWithIndex
      .map { case (r, i) => org.apache.spark.sql.Row(r.getLong(0), i) }
    val remap = spark.createDataFrame(remapRdd, remapSchema)
    // carry EVERY extra column through the remap (edge weights that
    // fromRawEdges documents as preserved, node_type / node props):
    // re-selecting only the canonical columns silently stripped them
    val nodeExtras = nodes.columns.filterNot(_ == "vid").map(col).toSeq
    val newNodes = nodes.join(remap, nodes("vid") === remap("old_vid"))
      .select(col("new_vid").as("vid") +: nodeExtras: _*)
    val edgeExtras = edges.columns.filterNot(c => c == "src" || c == "dst").map(col).toSeq
    val newEdges = edges
      .join(remap.select(col("old_vid").as("src"), col("new_vid").as("src2")), Seq("src"))
      .join(remap.select(col("old_vid").as("dst"), col("new_vid").as("dst2")), Seq("dst"))
      .select(Seq(col("src2").as("src"), col("dst2").as("dst")) ++ edgeExtras: _*)
    val newProps = nodePropEvents.map(_.join(remap, col("vid") === col("old_vid"))
      .select(col("new_vid").as("vid"), col("prop"), col("ts"), col("value")))
    new LinkGraph(newEdges, newNodes, namesAreNumeric, newProps)
  }

  // ---- core accessors ----------------------------------------------------

  // The collapsed adjacencies below are derived by a full distinct (a
  // shuffle); nearly every structural algorithm starts from them, so they
  // are computed once per graph instance and kept persisted until
  // unpersist() — the analogue of the reference's materialised per-node
  // adjacency lists (node_store.rs:176-199).
  @transient private var dedupCache: DataFrame = _
  @transient private var undirectedCache: DataFrame = _

  /** Distinct directed (src, dst) pairs — the adjacency after multi-edge
    * collapse (node_store.rs:176-199: one adjacency entry per neighbour).
    * Lazily persisted; released by unpersist(). */
  def dedupEdges: DataFrame = synchronized {
    if (dedupCache == null)
      dedupCache = edges.select("src", "dst").distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    dedupCache
  }

  /** Distinct undirected neighbour pairs, both orientations, one row per
    * (v, neighbour); a self-loop yields a single (v, v) row — matching
    * `neighbours()` BOTH semantics (node_store.rs:252-299). Lazily
    * persisted; released by unpersist(). */
  def undirectedPairs: DataFrame = synchronized {
    if (undirectedCache == null) {
      val d = edges.select("src", "dst")
      undirectedCache = d.select(col("src").as("a"), col("dst").as("b"))
        .union(d.select(col("dst").as("a"), col("src").as("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    }
    undirectedCache
  }

  /** Distinct out-neighbour count per node; nodes with none get 0.
    * Self-loops count once per direction (node_store.rs:224-250). */
  def outDegrees: DataFrame = degreesOf(dedupEdges.groupBy("src").agg(count("*").as("degree")), "src")

  def inDegrees: DataFrame = degreesOf(dedupEdges.groupBy("dst").agg(count("*").as("degree")), "dst")

  /** Undirected distinct-neighbour degree (BOTH); self-loop counts 1. */
  def degrees: DataFrame =
    degreesOf(undirectedPairs.groupBy("a").agg(count("*").as("degree")), "a")

  private def degreesOf(d: DataFrame, key: String): DataFrame =
    nodes.select("vid").join(d.withColumnRenamed(key, "vid"), Seq("vid"), "left")
      .select(col("vid"), coalesce(col("degree"), lit(0L)).as("degree"))

  /** Per-node activity summary over the view: incident event count plus
    * earliest/latest event timestamp — the reference's node
    * `history()/earliest_time/latest_time` family (db/api/view/node.rs:
    * 96-109: a node's history is the union of its incident edge events).
    * A self-loop event is incident ONCE (one history entry, like the
    * reference's per-event additions), hence the dst-leg self-loop filter
    * instead of a distinct. Nodes with no in-view event are absent (empty
    * history ⇒ earliest/latest None). One union + one hash aggregate. */
  def nodeActivity: DataFrame = {
    val ends = edges.select(col("src").as("vid"), col("ts"))
      .union(edges.filter(col("dst") =!= col("src")).select(col("dst").as("vid"), col("ts")))
    ends.groupBy("vid").agg(count(lit(1)).as("n_events"),
      min(col("ts")).as("earliest"), max(col("ts")).as("latest"))
  }

  def nodeCount: Long = nodes.count()

  /** Unique-edge count (post multi-edge collapse), matching the reference's
    * `count_edges`. */
  def edgeCount: Long = dedupEdges.count()

  /** Exploded temporal event count (`count_temporal_edges`). */
  def edgeEventCount: Long = edges.count()

  def cache(): LinkGraph = {
    edges.persist(StorageLevel.MEMORY_AND_DISK)
    nodes.persist(StorageLevel.MEMORY_AND_DISK)
    this
  }

  def unpersist(): Unit = synchronized {
    edges.unpersist(); nodes.unpersist()
    if (dedupCache != null) { dedupCache.unpersist(); dedupCache = null }
    if (undirectedCache != null) { undirectedCache.unpersist(); undirectedCache = null }
  }
}

object LinkGraph {

  /** Full ingestion pipeline: pages table → hrefs → edge events → vids. */
  def fromPages(pages: DataFrame): LinkGraph = {
    // manage the raw-extraction cache here: fromEdgeEvents counts its own
    // persisted event table, after which the raw cache is dead weight —
    // release it instead of leaking one MEMORY_AND_DISK copy per ingest
    val raw = Ingest.rawLinks(pages)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = fromEdgeEvents(Ingest.edgeEventsFromRaw(raw))
    raw.unpersist()
    g
  }

  def fromEdgeEvents(events: org.apache.spark.sql.Dataset[EdgeEvent]): LinkGraph = {
    val spark = events.sparkSession
    import spark.implicits._
    val ev = events.toDF().persist(StorageLevel.MEMORY_AND_DISK)
    ev.count() // materialise before vid minting re-scans the event table
    val nodesByUrl = Ingest.mintVids(ev.as[EdgeEvent]).persist(StorageLevel.MEMORY_AND_DISK)
    val e = ev
      .join(nodesByUrl.withColumnRenamed("url", "src_url").withColumnRenamed("vid", "src"), Seq("src_url"))
      .join(nodesByUrl.withColumnRenamed("url", "dst_url").withColumnRenamed("vid", "dst"), Seq("dst_url"))
      .select($"src", $"dst", $"ts", $"seq", $"layer")
    val numeric = nodesByUrl.filter(!col("url").rlike("^[0-9]+$")).isEmpty
    new LinkGraph(e, nodesByUrl.select($"vid", $"url".as("name")), numeric)
  }

  /** Graph over raw numeric ids: vid = the id itself (no dense minting).
    * Used when the id space is externally defined (e.g. oracle-checked
    * queries where component labels must be min-raw-id). Extra columns of
    * `df` (e.g. an edge weight) are kept on `edges`. */
  def fromRawEdges(df: DataFrame): LinkGraph = {
    val withDefaults = Seq("ts" -> lit(0L), "seq" -> lit(0L), "layer" -> lit(Ingest.DefaultLayer))
      .foldLeft(df) { case (d, (c, v)) =>
        if (d.columns.contains(c)) d else d.withColumn(c, v)
      }
    // the node table derives from a full distinct over the edge list —
    // persist it, otherwise every algorithm re-runs that shuffle per access
    val nodes = df.select(col("src").as("vid"))
      .union(df.select(col("dst").as("vid"))).distinct()
      .select(col("vid"), col("vid").cast("string").as("name"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    new LinkGraph(withDefaults.persist(StorageLevel.MEMORY_AND_DISK), nodes,
      namesAreNumeric = true)
  }

  /** Fixture loader: edge list in listed order defines VIDs (src resolved
    * before dst per row — df_loaders.rs:231-257). GIDs as strings; numeric
    * GID lists (the common fixture case) set namesAreNumeric. */
  def fromEdgeList(spark: SparkSession, list: Seq[(String, String, Long)],
                   layer: String = Ingest.DefaultLayer): LinkGraph = {
    import spark.implicits._
    val vids = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def vidOf(name: String): Long = vids.getOrElseUpdate(name, vids.size.toLong)
    val rows = list.zipWithIndex.map { case ((s, d, t), i) =>
      (vidOf(s), vidOf(d), t, i.toLong, layer)
    }
    val e = spark.createDataset(rows).toDF("src", "dst", "ts", "seq", "layer")
    val n = spark.createDataset(vids.toSeq.map { case (name, vid) => (vid, name) })
      .toDF("vid", "name")
    val numeric = vids.keys.forall(k => k.nonEmpty && k.forall(_.isDigit))
    new LinkGraph(e, n, numeric)
  }

  def fromNumericEdgeList(spark: SparkSession, list: Seq[(Long, Long, Long)]): LinkGraph =
    fromEdgeList(spark, list.map { case (s, d, t) => (s.toString, d.toString, t) })
}
