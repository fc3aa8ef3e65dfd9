package graft.bsp

import org.apache.spark.sql.SparkSession

/** Iterative DataFrame loops need stable physical partitioning across
  * supersteps: AQE rewrites (coalesced / unknown partitioning at
  * localCheckpoint time) break the exchange reuse, making every superstep
  * re-shuffle both join sides (observed: 3× slowdown and 0.31 scaling
  * efficiency). Scope AQE off for the duration of a superstep loop; the
  * rest of the session keeps it on. */
object IterativeConf {
  def withStablePartitioning[T](spark: SparkSession)(body: => T): T = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try body finally spark.conf.set(key, prev)
  }
}
