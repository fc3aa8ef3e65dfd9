package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.graph.LinkGraph

/** Physical-plan audits: the properties ARCHITECTURE.md claims are
  * load-bearing at scale, asserted on the actual executed plans so a
  * regression (an extra Exchange, a lost pushdown, a nested-loop join)
  * fails the suite rather than only showing up as a 100TB slowdown. */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def plan(df: DataFrame): String = df.queryExecution.executedPlan.toString

  /** Run body with auto-broadcast off: at scale neither superstep side
    * fits a broadcast, and the co-partitioning claim is about that regime
    * (a tiny test graph would otherwise broadcast the edge side). */
  def withoutAutoBroadcast[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("DF PageRank superstep: ONE exchange, no broadcast-nested-loop, cached edge table never re-sorted") {
    // 200k nodes / ~3.2M edges with a 2MB broadcast threshold reproduces
    // the at-scale join regime (neither side broadcasts); the production
    // superstep uses shuffle_hash hints because post-checkpoint state has
    // unknown stats and would otherwise SMJ-re-sort the cached edge table
    val prevThresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (2L * 1024 * 1024).toString)
    try graft.bsp.IterativeConf.withStablePartitioning(spark) {
      val p = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val n = 200000L
      val edges0 = spark.range(0, n, 1, 4).flatMap { i =>
        graft.io.Corpus.linkTargets(i, 16, 7L).map(j => (i, j))
      }.toDF("src", "dst")
      val g = LinkGraph.fromRawEdges(edges0)
      val e = g.dedupEdges.repartition(p, $"src").sortWithinPartitions($"src").persist()
      e.count()
      val outDeg = e.groupBy($"src").agg(count(lit(1)).as("out_degree"))
      val state = g.nodes.select($"vid")
        .join(outDeg, $"vid" === $"src", "left")
        .select($"vid", coalesce($"out_degree", lit(0L)).as("out_degree"),
          lit(1.0 / n).as("score"))
        .repartition(p, $"vid").localCheckpoint(true)
      val contrib = state.hint("shuffle_hash").join(e, state("vid") === e("src"))
        .groupBy($"dst").agg(sum($"score" / $"out_degree").as("gather"))
      val newState = state.join(contrib.hint("shuffle_hash"), state("vid") === contrib("dst"), "left")
        .select(state("vid"), state("out_degree"),
          (lit(0.85) * coalesce($"gather", lit(0.0)) + 0.15 / n).as("score"))
      // tree collect: the cached dedupEdges BUILD lineage (embedded in the
      // InMemoryRelation string) ran once, not per superstep
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
      val exec = newState.queryExecution.executedPlan
      val exchanges = exec.collect { case x: ShuffleExchangeExec => x }.length
      val s = exec.toString
      assert(exchanges == 1, s"expected exactly 1 shuffle per superstep, got $exchanges in:\n$s")
      // the shuffle_hash hints must hold: both superstep joins SHJ, so the
      // m-row cached edge table is never re-sorted per iteration
      import org.apache.spark.sql.execution.SortExec
      import org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
      assert(exec.collect { case j: ShuffledHashJoinExec => j }.length == 2,
        s"superstep joins are not both SHJ:\n$s")
      assert(exec.collect { case srt: SortExec => srt }.isEmpty,
        s"unexpected per-superstep sort:\n$s")
      assert(!s.contains("BroadcastNestedLoopJoin"))
      e.unpersist(); g.unpersist()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThresh)
  }

  test("parquet scan: filters push down and columns prune to the projection") {
    val df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 10).select("doc_id", "text")
    val s = plan(df)
    assert(s.contains("PushedFilters") && s.contains("LessThan(doc_id,10)"),
      s"doc_id filter not pushed to the scan:\n$s")
    val readSchema = s.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("doc_id") && readSchema.contains("text")
      && !readSchema.contains("lang"),
      s"scan reads more columns than the projection: $readSchema")
  }

  test("TF-IDF search: the query-term idf join broadcasts (no all-to-all)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val res = graft.text.Search.search(docs, Seq("spark", "query"), k = 5)
    val s = plan(res)
    assert(s.contains("BroadcastHashJoin"), s"idf join did not broadcast:\n$s")
  }

  test("per-node triangles: wedge join is degree-oriented (no unoriented adjacency self-join)") {
    // the O(Σ d²) formulation unions both edge orientations ((a,b) ∪ (b,a))
    // and self-joins that full adjacency — its physical plan necessarily
    // contains a Union feeding the wedge join. The oriented path projects
    // lo→hi once (each triangle counted at its unique wedge centre), so
    // the executed plan must be Union-free.
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).map { case (s, d) => (s, d, 0L) }
    val g = LinkGraph.fromNumericEdgeList(spark, edges)
    val res = graft.algo.Triangles.perNode(g)
    // perNode localCheckpoints its result; audit the pre-checkpoint plan
    val und = graft.algo.Triangles.undirectedSimple(g)
    val (tri, oriented) = graft.algo.Triangles.enumerate(und)
    // the degree table's build lineage (inside the cached oriented table)
    // legitimately unions the two endpoint projections — only the WEDGE
    // JOIN pipeline above the cache boundary must be union-free
    import org.apache.spark.sql.execution.{SparkPlan, UnionExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def aboveCache(p: SparkPlan): Seq[SparkPlan] = p match {
      case _: InMemoryTableScanExec => Seq(p)
      case _ => p +: p.children.flatMap(aboveCache)
    }
    val nodesAbove = aboveCache(tri.queryExecution.executedPlan)
    assert(!nodesAbove.exists(_.isInstanceOf[UnionExec]),
      s"unoriented adjacency union in the wedge join:\n${plan(tri)}")
    oriented.unpersist()
    // vids are re-minted densely; compare by node name
    val byName = res.join(g.nodes, "vid").select($"name", $"triangles")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byName == Map("1" -> 1L, "2" -> 1L, "3" -> 1L, "4" -> 0L))
  }

  test("superstep pipeline stays inside WholeStageCodegen (no interpreted hot path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val q = docs.select(col("doc_id"),
      graft.text.TextOps.tokenCount(col("text")).as("n"))
    // codegen'd stages show as "*(n)" markers in the executed plan
    assert(plan(q).contains("*("), plan(q))
  }
}
