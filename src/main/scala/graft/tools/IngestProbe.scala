package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.graph.LinkGraph
import graft.io.{Corpus, Ingest}

/** Break the corpus_ingest bench leg into its pipeline phases: page
  * synthesis + href parse, seq sort, vid mint, vid joins. Env: PAGES. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val cores = sys.env.getOrElse("CORES", "32").toInt
    val pages = sys.env.getOrElse("PAGES", "500000").toLong
    val spark = ScalingCheck.session(cores)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        // skipped / resubmitted stages can miss either timestamp
        for (sub <- si.submissionTime; comp <- si.completionTime) {
          val wall = (comp - sub) / 1e3
          val taskTime = si.taskMetrics.executorRunTime / 1e3
          val gc = si.taskMetrics.jvmGCTime / 1e3
          if (wall > 0.2)
            println(f"STAGE ${si.stageId}%4d tasks=${si.numTasks}%4d wall=$wall%6.2f cpuSum=$taskTime%7.2f gc=$gc%5.2f  ${si.name.takeWhile(_ != '(')}")
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val p = Corpus.pages(spark, pages, 4).toDF()
    val raw = time("rawLinks(parse+persist)") {
      val r = Ingest.rawLinks(p).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      r.count(); r
    }
    val ev = time("withSeq(sort+zip)") {
      val e = Ingest.edgeEventsFromRaw(raw).toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      e.count(); e
    }
    import spark.implicits._
    val nodes = time("mintVids") {
      val n = Ingest.mintVids(ev.as[graft.io.EdgeEvent])
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      n.count(); n
    }
    time("vid joins + count") {
      val e = ev
        .join(nodes.withColumnRenamed("url", "src_url").withColumnRenamed("vid", "src"), Seq("src_url"))
        .join(nodes.withColumnRenamed("url", "dst_url").withColumnRenamed("vid", "dst"), Seq("dst_url"))
        .select($"src", $"dst", $"ts", $"seq", $"layer")
      e.count()
    }
    println(s"nodes=${nodes.count()}")
    spark.stop()
  }
}
