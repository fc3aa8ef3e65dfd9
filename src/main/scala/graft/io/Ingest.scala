package graft.io

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One temporal edge event, urls as endpoints (FIXTURES.md §A):
  * `edges(src_url, dst_url, ts, seq, layer)`. `seq` is the deterministic
  * global row index in (ts, src_url, link_index) order — the analogue of the
  * reference's per-event secondary sequence number
  * (raphtory-api/src/core/storage/timeindex.rs:7, reserved per ingest row at
  * raphtory/src/io/arrow/df_loaders.rs:192). */
case class EdgeEvent(src_url: String, dst_url: String, ts: Long, seq: Long, layer: String)

/** pages → edge-event table → dense vertex ids.
  *
  * VID minting reproduces the reference loader's id-assignment order — first
  * appearance wins, src resolved before dst, rows in ingestion order
  * (raphtory/src/io/arrow/df_loaders.rs:231-257) — which is load-bearing for
  * exact-match WCC component representatives (SURVEY.md §7.4). */
object Ingest {

  val DefaultLayer = "_default"

  /** Extract href edges from a pages table (any table with url/warc_ts/html
    * columns). Multi-edges and self-loops are preserved (dedup happens at
    * the algorithm adapters, mirroring the reference's adjacency-collapse —
    * raphtory/src/core/entities/nodes/node_store.rs:176-199). */
  def edgeEvents(pages: DataFrame): Dataset[EdgeEvent] = {
    // cache the raw extraction: the sort below scans it three times
    // (range-partition sampling, zipWithIndex count, final compute), and
    // HTML parsing is the expensive part of ingestion. NOTE: the cache
    // lives until session end — pipelines that ingest repeatedly should
    // persist rawLinks themselves and call edgeEventsFromRaw (as
    // LinkGraph.fromPages does) so they can unpersist after materialising
    val raw = rawLinks(pages).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val out = withSeq(raw).as(org.apache.spark.sql.Encoders.product[EdgeEvent])
    out
  }

  /** Seq assignment over an already-persisted raw-links table (probe /
    * reuse entry; edgeEvents = rawLinks + this). */
  private[graft] def edgeEventsFromRaw(raw: DataFrame): Dataset[EdgeEvent] =
    withSeq(raw).as(org.apache.spark.sql.Encoders.product[EdgeEvent])

  /** One page's href rows: (src_url, dst_url, ts, link_idx) — the single
    * extraction body shared by the batch (rawLinks) and streaming
    * (StreamIngest.edgeEventStream) paths, so the two sinks cannot drift
    * in schema (link_idx type) or semantics (href resolution). */
  private[graft] def pageLinks(url: String, ts: Long,
                               html: Array[Byte]): Seq[(String, String, Long, Int)] =
    Html.extractHrefs(new String(html, "UTF-8"), url).zipWithIndex.map {
      case (href, j) => (url, href, ts, j)
    }

  /** Href extraction without seq assignment: (src_url, dst_url, ts, link_idx). */
  def rawLinks(pages: DataFrame): DataFrame = {
    val spark = pages.sparkSession
    import spark.implicits._
    pages
      .select($"url", unix_millis($"warc_ts").as("ts"), $"html")
      .as[(String, Long, Array[Byte])]
      .flatMap { case (url, ts, html) => pageLinks(url, ts, html) }
      .toDF("src_url", "dst_url", "ts", "link_idx")
  }

  /** Assign the dense global `seq` by total order (ts, src_url, link_idx).
    * Distributed: range-partitioned sort + zipWithIndex (no single-partition
    * window — survives 10^12 rows). */
  private def withSeq(raw: DataFrame): DataFrame = {
    val spark = raw.sparkSession
    val sorted = raw.orderBy("ts", "src_url", "link_idx")
    val schema = StructType(Seq(
      StructField("src_url", StringType, nullable = false),
      StructField("dst_url", StringType, nullable = false),
      StructField("ts", LongType, nullable = false),
      StructField("seq", LongType, nullable = false),
      StructField("layer", StringType, nullable = false)))
    val rdd = sorted.rdd.zipWithIndex.map { case (r, idx) =>
      Row(r.getAs[String]("src_url"), r.getAs[String]("dst_url"),
        r.getAs[Long]("ts"), idx, DefaultLayer)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Dense first-appearance vertex ids: `nodes(url, vid)`.
    * Appearance order: src of row seq before dst of row seq, rows by seq —
    * encoded as ord = 2*seq (src) / 2*seq+1 (dst); vid = dense rank of
    * min(ord) per url. */
  def mintVids(edges: Dataset[EdgeEvent]): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val appearances = edges.toDF().select(explode(array(
      struct(($"seq" * 2).as("ord"), $"src_url".as("url")),
      struct(($"seq" * 2 + 1).as("ord"), $"dst_url".as("url")))).as("x"))
      .select($"x.ord", $"x.url")
    val firstSeen = appearances.groupBy($"url").agg(min($"ord").as("ord"))
    val schema = StructType(Seq(
      StructField("url", StringType, nullable = false),
      StructField("vid", LongType, nullable = false)))
    val rdd = firstSeen.orderBy($"ord").rdd.zipWithIndex.map {
      case (r, idx) => Row(r.getAs[String]("url"), idx)
    }
    spark.createDataFrame(rdd, schema)
  }
}
