package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.io.{Corpus, Html, Ingest}
import graft.graph.LinkGraph

class CorpusSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("extraction invariant: hrefs of page i == generated out-links, in order") {
    for (i <- Seq(0L, 1L, 2L, 7L, 50L, 119L)) {
      val html = Corpus.renderHtml(i, 2, 42L)
      val expect = Corpus.linkTargets(i, 2, 42L).map(Corpus.url).toSeq
      assert(Html.extractHrefs(html, Corpus.url(i)) == expect, s"page $i")
    }
  }

  test("link targets are distinct, in range, deterministic") {
    for (i <- 1L to 200L) {
      val t1 = Corpus.linkTargets(i, 4, 42L)
      val t2 = Corpus.linkTargets(i, 4, 42L)
      assert(t1.toSeq == t2.toSeq)
      assert(t1.distinct.length == t1.length)
      assert(t1.forall(j => j >= 0 && j < i))
      assert(t1.length == math.min(4L, i))
    }
  }

  test("extracted text is byte-stable and matches the template") {
    val p = Corpus.page(7L, 2, 42L)
    val links = Corpus.linkTargets(7L, 2, 42L)
    val expected = s"${Corpus.url(7)} Page 7 of the synthetic crawl. " +
      links.indices.map(j => s"link ${j + 1}").mkString(" ")
    assert(p.text == expected)
    // stability golden: sha-256 of page 7 text for seed 42 / k=2
    val sha = java.security.MessageDigest.getInstance("SHA-256")
      .digest(p.text.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(sha == CorpusSpec.Page7Sha, s"text hash drifted: $sha")
  }

  test("tiny corpus end-to-end: pages -> edges -> vids") {
    val pages = Corpus.tiny(spark).toDF()
    val g = LinkGraph.fromPages(pages).cache()
    // every page except 0 has min(2, i) out-links
    val expectedEdges = (0L until 120L).map(i => math.min(2L, i)).sum
    assert(g.edgeEventCount == expectedEdges)
    // node count: all pages are reachable as src (i>=1) and targets; page 0 only as dst
    assert(g.nodeCount == 120)
    // vids are dense 0..n-1
    import spark.implicits._
    val vids = g.nodes.select("vid").as[Long].collect().sorted
    assert(vids.toSeq == (0L until 120L))
    // first minted vid belongs to the src of the first edge event (page 1)
    val v0 = g.nodes.filter($"vid" === 0L).select("name").as[String].head()
    assert(v0 == Corpus.url(1))
    g.unpersist()
  }

  test("seq is the dense (ts, src, link_idx) row index") {
    import spark.implicits._
    val pages = Corpus.pages(spark, 20L, 2).toDF()
    val ev = Ingest.edgeEvents(pages)
    val seqs = ev.orderBy("seq").select("seq").as[Long].collect()
    assert(seqs.toSeq == seqs.indices.map(_.toLong))
    // ordering by seq == ordering by (ts, src_url, link order)
    val byS = ev.orderBy("seq").select("src_url").as[String].collect()
    val byT = ev.orderBy("ts", "src_url").select("src_url").as[String].collect()
    assert(byS.toSeq == byT.toSeq)
  }
}

object CorpusSpec {
  // golden text hash for (seed=42, k=2, page 7); recorded on first run
  val Page7Sha = "2e7a6e174c2a726de3908114b626d5939bb7c6684f0ffd2f3dab29c78ef950d2"
}
