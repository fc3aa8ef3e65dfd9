package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch timing probe for the sssp/reachability loop shapes (run
  * manually; not part of the driver contract). */
object SsspProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.Queries.graphForTest(spark, sfDir)
    val srcName = g.nodes.agg(org.apache.spark.sql.functions.min(
      org.apache.spark.sql.functions.col("vid"))).head().getLong(0).toString
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.algo.Pathing.sssp(g, srcName, cutoff = 30L, withPaths = false).count()
      println(f"SSSP run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s, $n rows")
    }
    spark.stop()
  }
}
