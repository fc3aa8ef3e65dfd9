package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch timing probe for the streaming dedup operators (run manually;
  * not part of the driver contract): replays the documents table through
  * nearDupStream exactly like the s_neardup_stream driver query and
  * prints each micro-batch's durationMs breakdown from recentProgress,
  * so harness costs (state store commit, offset log, planning) are
  * separable from the operator itself. */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val b1 = docs.filter(col("id") % 2 === 0).as[(Long, String)].collect()
    val b2 = docs.filter(col("id") % 2 =!= 0).as[(Long, String)].collect()
    println(s"batches: ${b1.length} + ${b2.length} docs")

    val t0 = System.nanoTime()
    val input = MemoryStream[(Long, String)]
    val out = graft.streaming.StreamIngest.nearDupStream(
      input.toDF().toDF("doc_id", "text")
        .repartition(spark.sparkContext.defaultParallelism))
    val q = out.writeStream.format("memory").queryName("probe_sink")
      .option("checkpointLocation",
        s"/dev/shm/graft-spark/stream-ckpt-probe-${java.util.UUID.randomUUID}")
      .outputMode(OutputMode.Append()).start()
    try {
      val t1 = System.nanoTime()
      input.addData(b1.toSeq: _*); q.processAllAvailable()
      val t2 = System.nanoTime()
      input.addData(b2.toSeq: _*); q.processAllAvailable()
      val t3 = System.nanoTime()
      val n = spark.table("probe_sink").count()
      println(f"start->ready ${(t1 - t0) / 1e9}%.2f s  batch1 ${(t2 - t1) / 1e9}%.2f s  batch2 ${(t3 - t2) / 1e9}%.2f s  ($n pairs)")
      q.recentProgress.foreach { p =>
        println(s"batch ${p.batchId}: rows=${p.numInputRows} " +
          s"durationMs=${p.durationMs} " +
          p.stateOperators.map(s => s"stateRows=${s.numRowsTotal} commitMs=${s.commitTimeMs}").mkString(","))
      }
    } finally q.stop()
    spark.stop()
  }
}
