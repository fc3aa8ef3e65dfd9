package graft.graph

import org.apache.spark.rdd.RDD
import org.apache.spark.Partitioner
import org.apache.spark.storage.StorageLevel
import org.apache.spark.sql.functions._

/** One gather-side CSR partition: the adjacency of every destination vertex
  * in the contiguous id range [lo, hi). `offsets` has hi-lo+1 entries;
  * the in-neighbours of vertex v are srcs[offsets(v-lo) until offsets(v-lo+1)).
  *
  * This is the Spark analogue of the reference's per-layer columnar CSR
  * (pometry-storage adjacency, raphtory/src/db/api/storage/graph/storage_ops/
  * disk_graph) packed per *partition* instead of per file — SURVEY §4.3. */
case class CsrBlock(lo: Int, hi: Int, offsets: Array[Int], srcs: Array[Int])

/** In-memory gather-scatter graph for the superstep fast path.
  *
  * Partitioning is an explicit range partitioning of the destination id
  * space: partition p owns dst ∈ [p·n/P, (p+1)·n/P), so each superstep is
  * ONE Spark job — broadcast the previous vertex state (dense arrays),
  * every partition gathers over its CSR block and returns its dense result
  * segment, the driver stitches segments. No shuffle at all per superstep.
  *
  * Bounds: vertex ids must fit Int (n ≤ 2^31) and the per-vertex state
  * arrays must fit executor+driver memory (8·n bytes per double array) —
  * the single-machine regime the reference engine lives in
  * (raphtory README.md:47 "hundreds of millions of edges on your laptop").
  * Beyond that, the shuffle-based DataFrame supersteps (PageRank.run /
  * Wcc.run DF path) take over; both modes share exact semantics.
  */
class CsrGraph(
    val n: Int,                       // id space size (max vid + 1)
    val nPresent: Int,                // actual node count
    val present: Array[Boolean],
    val blocks: RDD[CsrBlock],
    val edgeCount: Long) extends Serializable {

  def unpersist(): Unit = blocks.unpersist()
}

object CsrGraph {

  /** CSR auto-mode fit test shared by PageRank/Wcc/Hits/Lpa: the dense id
    * space is bounded AND the total node-name payload — which the fast
    * path collects once to mint the result — stays under `maxNameBytes`
    * (the id bound alone would admit 32M url-length names ≈ several GB of
    * driver strings). One cheap agg over the node table; the supersteps
    * it gates cost orders of magnitude more. */
  def inMemFits(g: LinkGraph, maxVid: Long, maxIds: Long,
                maxNameBytes: Long = 2L * 1024 * 1024 * 1024): Boolean =
    maxVid >= 0 && maxVid < math.min(maxIds, Int.MaxValue.toLong) && {
      val r = g.nodes.agg(sum(length(col("name")))).head()
      r.isNullAt(0) || r.getLong(0) <= maxNameBytes
    }

  private class RangeByDst(parts: Int, n: Int) extends Partitioner {
    override def numPartitions: Int = parts
    override def getPartition(key: Any): Int = {
      val d = key.asInstanceOf[Int]
      math.min(((d.toLong * parts) / n).toInt, parts - 1)
    }
  }

  private def rangeBounds(parts: Int, n: Int, p: Int): (Int, Int) = {
    // inverse of RangeByDst: partition p owns [ceil(p*n/parts), ceil((p+1)*n/parts))
    def start(q: Int): Int = (((q.toLong * n) + parts - 1) / parts).toInt
    // getPartition(d)=floor(d*parts/n); d belongs to p iff d*parts/n == p
    // smallest d with floor(d*parts/n) >= p is ceil(p*n/parts)
    (start(p), if (p == parts - 1) n else start(p + 1))
  }

  /** Pack a (dst, src) pair RDD into dst-range CSR blocks. */
  def pack(pairs: RDD[(Int, Int)], n: Int, parts: Int,
           storage: StorageLevel = StorageLevel.MEMORY_AND_DISK): RDD[CsrBlock] = {
    val partitioner = new RangeByDst(parts, n)
    pairs.partitionBy(partitioner).mapPartitionsWithIndex({ (pid, it) =>
      val (lo, hi) = rangeBounds(parts, n, pid)
      val width = hi - lo
      val counts = new Array[Int](width + 1)
      val buf = new scala.collection.mutable.ArrayBuffer[Long](1 << 12)
      while (it.hasNext) {
        val (d, s) = it.next()
        counts(d - lo + 1) += 1
        buf += (d.toLong << 32) | (s.toLong & 0xffffffffL)
      }
      var i = 1
      while (i <= width) { counts(i) += counts(i - 1); i += 1 }
      val offsets = counts // prefix sums = offsets
      val srcs = new Array[Int](buf.length)
      val cursor = offsets.clone()
      var j = 0
      while (j < buf.length) {
        val packed = buf(j)
        val d = (packed >>> 32).toInt
        srcs(cursor(d - lo)) = packed.toInt
        cursor(d - lo) += 1
        j += 1
      }
      Iterator(CsrBlock(lo, hi, offsets, srcs))
    }, preservesPartitioning = true).persist(storage)
  }

  /** Shared builder body: maxVid bound check, present-bitmap collect,
    * pack, edge count. One implementation — the three public builders
    * differ only in the (gatherKey, neighbour) pair projection. An empty
    * graph (no nodes, e.g. a window view over a dead time range) packs to
    * a valid zero-vertex CsrGraph instead of NPE-ing on the null max. */
  private def build(g: LinkGraph, parts: Int,
                    pairsDf: org.apache.spark.sql.DataFrame): CsrGraph = {
    val spark = g.spark
    import spark.implicits._
    val maxRow = g.nodes.agg(max("vid")).head()
    val maxVid = if (maxRow.isNullAt(0)) -1L else maxRow.getLong(0)
    require(maxVid < Int.MaxValue, s"CSR fast path requires vid < 2^31, got $maxVid")
    val n = (maxVid + 1).toInt
    val presentVids = g.nodes.select("vid").as[Long].collect()
    val present = new Array[Boolean](n)
    presentVids.foreach(v => present(v.toInt) = true)
    val pairs = pairsDf.as[(Int, Int)].rdd
    val blocks = pack(pairs, n, parts)
    val m = blocks.map(_.srcs.length.toLong).fold(0L)(_ + _)
    new CsrGraph(n, presentVids.length, present, blocks, m)
  }

  /** Directed gather CSR (in-neighbours per dst) from deduped edges. */
  def fromLinkGraph(g: LinkGraph, parts: Int): CsrGraph =
    build(g, parts, g.dedupEdges.select(col("dst").cast("int"), col("src").cast("int")))

  /** Reversed gather CSR: out-neighbours per src (= in-neighbours of the
    * reversed graph). Used by gathers that pull along out-edges (HITS
    * hub-from-auth). */
  def reversedFromLinkGraph(g: LinkGraph, parts: Int): CsrGraph =
    build(g, parts, g.dedupEdges.select(col("src").cast("int"), col("dst").cast("int")))

  /** Undirected gather CSR (distinct BOTH-neighbours per vertex). */
  def undirectedFromLinkGraph(g: LinkGraph, parts: Int): CsrGraph =
    build(g, parts, g.undirectedPairs.select(col("a").cast("int"), col("b").cast("int")))

  /** Per-source distinct out-degree as a dense array (gather blocks count
    * each (dst, src) once, so counting srcs across blocks gives the
    * multi-edge-collapsed out-degree). Tree-reduced partial histograms. */
  def outDegrees(csr: CsrGraph): Array[Int] = {
    val n = csr.n
    csr.blocks.mapPartitions { it =>
      val h = new Array[Int](n)
      it.foreach { b =>
        var i = 0
        while (i < b.srcs.length) { h(b.srcs(i)) += 1; i += 1 }
      }
      Iterator(h)
    }.treeReduce({ (a, b) =>
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }, depth = 2)
  }
}
