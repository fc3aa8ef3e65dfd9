package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.StreamIngest
import graft.io.{Corpus, Ingest}

/** Structured Streaming ingestion: the batch href extraction lifted to
  * readStream; AvailableNow trigger drives a directory of pages parquet
  * through the stream synchronously. */
class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("streamed edge events == batch extraction; checkpointed sink resumes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val pagesDir = s"$dir/pages"; val outDir = s"$dir/edges"; val ck = s"$dir/ck"
    val pages = Corpus.pages(spark, 50L, 2).toDF()
    pages.write.mode("overwrite").parquet(pagesDir)

    val q = StreamIngest.startEdgeIngest(spark, pagesDir, outDir, ck)
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(outDir)
      .select("src_url", "dst_url", "ts").as[(String, String, Long)].collect().toSet
    val batch = Ingest.edgeEvents(pages)
      .select("src_url", "dst_url", "ts").as[(String, String, Long)].collect().toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)

    // incremental: add more pages, re-trigger — only the delta is appended
    Corpus.pages(spark, 60L, 2).toDF().filter(col("url").endsWith("/p/55"))
      .write.mode("append").parquet(pagesDir)
    val q2 = StreamIngest.startEdgeIngest(spark, pagesDir, outDir, ck)
    q2.awaitTermination(120000)
    val after = spark.read.parquet(outDir).count()
    assert(after == streamed.size + 2) // page 55 has 2 out-links
  }

  test("stateful streaming: per-source running totals accumulate across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val totals = StreamIngest.liveSourceTotals(input.toDF().toDF("src_url", "ts"))
    val q = totals.writeStream.format("memory").queryName("live_totals")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(("a", 10L), ("a", 20L), ("b", 5L))
      q.processAllAvailable()
      val b1 = spark.table("live_totals").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(b1("a") == (2L, 20L) && b1("b") == (1L, 5L))
      // second micro-batch folds into checkpointed state
      input.addData(("a", 30L), ("c", 1L))
      q.processAllAvailable()
      val rows = spark.table("live_totals").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      val latest = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).maxBy(_._1) }
      assert(latest("a") == (3L, 30L))
      assert(latest("b") == (1L, 5L))
      assert(latest("c") == (1L, 1L))
    } finally q.stop()
  }

  test("streaming exact dedup: first-seen hash wins within and across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val deduped = StreamIngest.dedupStream(input.toDF().toDF("content_hash", "doc_id"))
    val q = deduped.writeStream.format("memory").queryName("dedup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // h1 duplicated WITHIN the batch (min id 3 kept), h2 unique
      input.addData(("h1", 7L), ("h1", 3L), ("h2", 5L))
      q.processAllAvailable()
      val b1 = spark.table("dedup_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(b1 == Map("h1" -> 3L, "h2" -> 5L))
      // h1/h2 re-arrive ACROSS batches -> suppressed by state; h3 new
      input.addData(("h1", 1L), ("h2", 9L), ("h3", 8L))
      q.processAllAvailable()
      val all = spark.table("dedup_stream").collect()
        .map(r => r.getString(0) -> r.getLong(1))
      assert(all.length == 3 && all.toMap == Map("h1" -> 3L, "h2" -> 5L, "h3" -> 8L))
    } finally q.stop()
  }

  test("dedupStream state-TTL variant builds as a streaming plan") {
    // A ProcessingTimeTimeout query never drains in-process (the engine
    // keeps scheduling no-data batches to evict timed-out state, so
    // processAllAvailable/awaitTermination block under EVERY trigger,
    // AvailableNow included) — the timeout CLOCK is not controllable
    // from a unit test. The shared per-batch logic (first-seen wins,
    // min-id within a batch, cross-batch suppression) is exercised by
    // the NoTimeout test above; here we lock the TTL wiring: the plan
    // builds, stays streaming, and declares the state operator.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val deduped = StreamIngest.dedupStream(
      input.toDF().toDF("content_hash", "doc_id"), stateTtlMs = Some(3600_000L))
    assert(deduped.isStreaming)
    assert(deduped.queryExecution.analyzed.toString.contains("FlatMapGroupsWithState"))
  }

  test("per-row minhash signature/buckets are byte-identical to the batch forms") {
    import graft.dedup.Dedup
    val docs = Corpus.pages(spark, 99L, 3).toDF()
      .select(monotonically_increasing_id().as("doc_id"), col("text"))
      .limit(40).cache()
    // signatures: minhashSigArray(text)[s] == minhashWide's mh<s>
    val wide = Dedup.minhashWide(docs)
    val perRow = docs.select(col("doc_id"), Dedup.minhashSigArray(col("text")).as("sig"))
    val joined = wide.join(perRow, "doc_id")
    val mismatch = (0 until 16).map(s =>
      joined.filter(col(s"mh$s") =!= element_at(col("sig"), s + 1)).count()).sum
    assert(mismatch == 0)
    // buckets: bandBucketArray == lshBucketsWide (band, bucket) rows
    val batchB = Dedup.lshBucketsWide(wide).select("doc_id", "band", "bucket")
    val rowB = perRow.select(col("doc_id"),
      posexplode(Dedup.bandBucketArray(col("sig"))).as(Seq("band", "bucket")))
    assert(batchB.exceptAll(rowB).count() == 0 && rowB.exceptAll(batchB).count() == 0)
  }

  test("streaming LSH near-dup: pairs within and across batches, hot-bucket cap") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val t1 = "the quick brown fox jumps over the lazy dog again and again"
    val t2 = "completely different content about graph engines and sparks"
    val input = MemoryStream[(Long, String)]
    val dups = StreamIngest.nearDupStream(input.toDF().toDF("doc_id", "text"))
    val q = dups.writeStream.format("memory").queryName("neardup_stream")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: two identical docs + one unrelated + a NULL text (must
      // not kill the stream — filtered before the state op)
      input.addData((1L, t1), (2L, t1), (5L, t2), (7L, null))
      q.processAllAvailable()
      val b1 = spark.table("neardup_stream").select("a", "b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(b1 == Set((1L, 2L)))
      // batch 2: a third copy arrives -> pairs with BOTH earlier copies
      // (state carries the bucket membership across micro-batches)
      input.addData((9L, t1))
      q.processAllAvailable()
      val all = spark.table("neardup_stream").select("a", "b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(all == Set((1L, 2L), (1L, 9L), (2L, 9L)))
      // agreement is 1.0 for identical texts
      assert(spark.table("neardup_stream").select("sig_agreement")
        .collect().forall(_.getDouble(0) == 1.0))
    } finally q.stop()
    // hot-bucket cap: capacity 2 -> the third identical doc is skipped
    val capIn = MemoryStream[(Long, String)]
    val capped = StreamIngest.nearDupStream(
      capIn.toDF().toDF("doc_id", "text"), bucketCap = 2)
    val q2 = capped.writeStream.format("memory").queryName("neardup_capped")
      .outputMode(OutputMode.Append()).start()
    try {
      capIn.addData((1L, t1), (2L, t1), (3L, t1))
      q2.processAllAvailable()
      val rows = spark.table("neardup_capped").select("a", "b").distinct().collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows == Set((1L, 2L)))
    } finally q2.stop()
  }

  test("watermarked rolling counts shape") {
    val events = Corpus.pages(spark, 30L, 2).toDF()
      .select(col("url").as("src_url"), col("url").as("dst_url"),
        unix_millis(col("warc_ts")).as("ts"))
    val counts = StreamIngest.rollingEdgeCounts(events, "10 seconds", "10 seconds")
    // batch execution of the streaming plan shape
    assert(counts.isStreaming == false || true) // plan builds; batch df here
    val rows = counts.collect()
    assert(rows.map(_.getAs[Long]("n_edges")).sum == 30L)
  }
}
