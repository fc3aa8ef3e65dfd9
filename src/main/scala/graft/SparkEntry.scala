package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph
import graft.io.Corpus
import graft.algo.{PageRank, Triangles, Wcc}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `entry` is the flagship end-to-end slice (SURVEY §7.3): synthetic pages →
  * href extraction → edge table → dense vids → PageRank → top-10.
  * `queries` hosts one entry per implemented operator; `oracleSql` the
  * DuckDB-equivalent SQL over the same parquet tables for the driver's
  * correctness gate. Graph operators that run on the generated web corpus
  * (not on sfDir parquet) are fixture-verified in `sbt test` instead and
  * appear here over a graph derived from the `orders` table so DuckDB can
  * check them. */
object SparkEntry {

  /** Flagship: tiny crawl corpus → PageRank top 10. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val g = LinkGraph.fromPages(Corpus.tiny(spark).toDF()).cache()
    PageRank.run(g, PageRank.Config(iterCount = 20))
      .orderBy(desc("score"), asc("vid")).limit(10)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all ++ Queries2.all

  def oracleSql: Map[String, String] = Queries.oracles ++ Queries2.oracles
}
