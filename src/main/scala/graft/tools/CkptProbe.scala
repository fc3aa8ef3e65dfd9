package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.algo.PageRank
import graft.ckpt.{Catalog, CatalogRunContext}

/** Phase-level timing for the catalog-checkpointed PageRank path (the
  * g_pagerank_resume leg): per-superstep wall from ctx.stats plus the
  * run-level phases, to see where the durable-checkpoint overhead sits.
  * Usage: runMain graft.tools.CkptProbe <sfDir> [runs=2]. */
object CkptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(j.jobId, j.time)
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val w = (j.time - jobStarts.getOrDefault(j.jobId, j.time)) / 1e3
        if (w > 0.05) println(f"  JOB ${j.jobId}%4d wall=$w%6.2f s")
      }
    })
    val g = graft.Queries.graphForTest(spark, sfDir)
    g.edges.count() // memoize ingest outside the timed region
    for (i <- 1 to runs) {
      val root = Files.createTempDirectory(Paths.get("/dev/shm"), "graft-ckpt-probe").toString
      val cat = new Catalog(root)
      val ctx = new CatalogRunContext(cat, "p", spark)
      val t0 = System.nanoTime()
      PageRank.run(g, PageRank.Config(iterCount = 12, tol = 0.0, mode = "df"), ctx).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val steps = ctx.stats.map(_.wallMs)
      println(f"[ckpt-probe] run $i: total $wall%.2f s; steps ms = " +
        steps.map(m => f"$m%.0f").mkString(" "))
      import scala.jdk.CollectionConverters._
      val walk = Files.walk(Paths.get(root))
      val paths = try walk.iterator().asScala.toSeq finally walk.close()
      paths.sortBy(-_.getNameCount).foreach(p => Files.deleteIfExists(p))
    }
    spark.stop()
  }
}
