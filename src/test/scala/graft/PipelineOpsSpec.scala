package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
import graft.sim.Ann
import graft.text.TextOps
import graft.media.Media

/** Training-data pipeline operators: dedup family, ANN, text analysis,
  * multimodal plumbing. */
class PipelineOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (2L, "The  quick Brown fox jumps over the lazy dog"),  // normalized-ish (case/ws differ)
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup of 0
    (4L, "completely different content about spark engines and graphs"),
    (5L, "der hund und die katze und der vogel und die maus"),
    (6L, "le chat et la souris et le chien et la maison")
  ).toDF("doc_id", "text")

  test("curate: quality gate -> lang filter -> fingerprint dedup -> survivor tokens") {
    val corpus = Seq(
      (0L, "the quick brown fox and the lazy dog of the north ran over the hill"),
      (1L, "The  quick brown fox and the lazy dog of the north ran over the hill"), // normalized dup of 0
      (2L, "short of the and"),                                                     // < minChars
      (3L, "the 1234567890 9876543210 0123456789 data and of the 111 222 333 444"), // digit-heavy
      (4L, "der hund und die katze und der vogel und die maus liefen durch den wald"), // German
      (5L, "a second unique english document about the engine and the graph of links")
    ).toDF("doc_id", "text")
    val kept = TextOps.curate(corpus, minChars = 20, maxDigitRatio = 0.3, langs = Seq("en"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dups"), r.getAs[Long]("n_tokens")))).toMap
    // doc 2 fails minChars, doc 3 fails digit ratio, doc 4 guesses de;
    // docs 0/1 share a whitespace/case-normalised fingerprint -> keep 0
    assert(kept.keySet == Set(0L, 5L))
    assert(kept(0L) == ((2L, 15L)))
    assert(kept(5L)._1 == 1L)
    // survivor columns come from the min-id row (struct-min = arg-min by id)
    val tok0 = TextOps.curate(corpus, 20, 0.3, Seq("en"))
      .filter(col("doc_id") === 0L).head().getAs[Long]("n_tokens")
    assert(tok0 == 15L)
  }

  test("exact dedup groups") {
    val g = Dedup.exactGroups(docs).collect()
    val dupGroup = g.filter(_.getAs[Long]("n_docs") > 1)
    assert(dupGroup.length == 1)
    assert(dupGroup.head.getAs[Long]("first_doc") == 0L)
    assert(g.map(_.getAs[Long]("n_docs")).sum == 7L)
  }

  test("minhash LSH finds exact and near dups, skips unrelated") {
    val nd = Dedup.minhashNearDups(docs, threshold = 0.5).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"))).toSet
    assert(nd.contains((0L, 1L)))       // identical
    assert(nd.contains((0L, 3L)) || nd.contains((1L, 3L))) // near dup
    assert(!nd.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("dupClusters: near-dup group collapses to min doc id, singletons keep themselves") {
    val rows = Dedup.dupClusters(docs, threshold = 0.5).collect()
      .map(r => r.getAs[Long]("id") -> (r.getAs[Long]("cluster"), r.getAs[Boolean]("keep"))).toMap
    assert(rows.size == 7)
    // 0/1 identical, 3 near — one cluster labelled by the minimum member
    assert(rows(0L)._1 == 0L && rows(1L)._1 == 0L && rows(3L)._1 == 0L)
    assert(rows(0L)._2 && !rows(1L)._2 && !rows(3L)._2)
    // unrelated docs are their own singleton clusters and are kept
    for (i <- Seq(4L, 5L, 6L)) assert(rows(i) == (i, true))
    // exactly one canonical copy per cluster
    val perCluster = rows.values.groupBy(_._1).map { case (c, vs) => c -> vs.count(_._2) }
    assert(perCluster.values.forall(_ == 1))
  }

  test("clustersFromPairs: differential vs union-find on random pair graphs") {
    // seeded random pair sets over 20 ids; expected clusters from a plain
    // driver union-find with min-member labels — the HashMin superstep
    // loop must agree exactly (labels, keep flags, singleton handling)
    for (seed <- Seq(7, 42, 1234)) {
      val r = new scala.util.Random(seed)
      val n = 20
      val pairSet = (0 until 25).map { _ =>
        val a = r.nextInt(n); val b = r.nextInt(n)
        (math.min(a, b).toLong, math.max(a, b).toLong)
      }.filter(p => p._1 != p._2).distinct
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      pairSet.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val minOf = (0 until n).groupBy(find).map { case (root, ms) => root -> ms.min.toLong }
      val expected = (0 until n).map(i => i.toLong -> minOf(find(i))).toMap

      val ids = (0 until n).map(_.toLong).toDF("id")
      val got = Dedup.clustersFromPairs(ids, pairSet.toDF("a", "b")).collect()
        .map(row => row.getAs[Long]("id") ->
          (row.getAs[Long]("cluster"), row.getAs[Boolean]("keep"))).toMap
      assert(got.size == n, s"seed $seed")
      for (i <- 0 until n) {
        assert(got(i.toLong)._1 == expected(i.toLong), s"seed $seed id $i")
        assert(got(i.toLong)._2 == (i.toLong == expected(i.toLong)), s"seed $seed id $i keep")
      }
    }
  }

  test("clustersFromPairs: empty id set with non-empty pairs returns empty (no NPE)") {
    // pairs can reference ids absent from the id table (e.g. a filtered
    // view); the convergence aggregate over the empty state must not NPE
    val got = Dedup.clustersFromPairs(
      Seq.empty[Long].toDF("id"), Seq((1L, 2L)).toDF("a", "b"))
    assert(got.count() == 0L)
  }

  test("simhash: identical texts equal, near texts close, different far") {
    val sh = Dedup.simhash(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sh(0L) == sh(1L))
    def dist(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(dist(sh(0L), sh(3L)) < dist(sh(0L), sh(4L)))
    val pairs = Dedup.simhashNearDups(Dedup.simhash(docs), maxDist = 0).collect()
    assert(pairs.exists(r => r.getAs[Long]("a") == 0L && r.getAs[Long]("b") == 1L))
  }

  test("simhash banded blocking finds pairs whose flipped bits land in the high half") {
    // 3 flips, ALL inside the top 16 bits (31, 28, 20) — the single
    // high-16-bit block of round 2 missed exactly these; with 4 disjoint
    // 8-bit bands the two low bands are identical, so the pair surfaces
    // (pigeonhole: any pair within hamming distance 3 has a clean band)
    val a = 0x0f0f1234L
    val b = a ^ 0x90100000L
    val sh = Seq((1L, a), (2L, b)).toDF("doc_id", "simhash")
    val got = Dedup.simhashNearDups(sh, maxDist = 3).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Int]("dist")))
    assert(got.toSeq == Seq((1L, 2L, 3)))
    // completeness boundary: 4 flips, one per default 8-bit band — the
    // requested maxDist = 4 exceeds the 4-band guarantee, so the band
    // count auto-widens to 8 and the pair must still surface (the round-3
    // behaviour silently dropped it)
    val c = a ^ 0x01010101L
    val sh2 = Seq((1L, a), (2L, c)).toDF("doc_id", "simhash")
    val got4 = Dedup.simhashNearDups(sh2, maxDist = 4).collect()
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Int]("dist")))
    assert(got4.toSeq == Seq((1L, 2L, 4)))
  }

  test("language id: en/de/fr marker heuristic") {
    val lang = TextOps.withLangGuess(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(lang(0L) == "en")
    assert(lang(5L) == "de")
    assert(lang(6L) == "fr")
  }

  test("token count and quality ratios") {
    val tc = docs.select($"doc_id", TextOps.tokenCount($"text").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(tc(0L) == 9L)
    val q = docs.select($"doc_id" +: TextOps.qualityColumns($"text").map { case (n, c) => c.as(n) }: _*)
    val r0 = q.filter($"doc_id" === 0L).head()
    assert(r0.getAs[Long]("n_chars") == 43L)
    assert(r0.getAs[Double]("punct_ratio") == 0.0)
  }

  def embeddings = {
    // 8 deterministic 8-dim vectors in two clusters
    (0 until 8).map { i =>
      val base = if (i < 4) Array(1.0f, 0.9f, 0.1f, 0f, 0f, 0.2f, 0.8f, 0.1f)
                 else Array(0f, 0.1f, 1.0f, 0.9f, 0.8f, 0.1f, 0f, 0.7f)
      val v = base.zipWithIndex.map { case (x, d) =>
        x + 0.01f * ((graft.io.Corpus.splitmix64(i * 31L + d) & 0xf) - 8)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("embeddingNearDups fails fast above the pair bound, naming the IVF scale path") {
    val prev = spark.conf.getOption("graft.dedup.maxPairs")
    spark.conf.set("graft.dedup.maxPairs", "10") // 8 vectors -> 28 pairs > 10
    try {
      val e = intercept[IllegalStateException] { Dedup.embeddingNearDups(embeddings, 0.3) }
      assert(e.getMessage.contains("ivfCandidates"))
      assert(e.getMessage.contains("embeddingVerify"))
      spark.conf.set("graft.dedup.maxPairs", "100")
      assert(Dedup.embeddingNearDups(embeddings, 0.3).count() > 0)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("graft.dedup.maxPairs", v)
        case None => spark.conf.unset("graft.dedup.maxPairs")
      }
    }
  }

  test("brute-force cosine top-k ranks own cluster first") {
    val top = Ann.bruteForceTopK(embeddings, Seq(0L).toDF("id"), 3).collect()
    assert(top.length == 3)
    assert(top.forall(_.getAs[Long]("neighbor_id") < 4))
  }

  test("LSH ANN recall vs brute force on clustered vectors") {
    val queries = Seq(0L, 5L).toDF("id")
    val exact = Ann.bruteForceTopK(embeddings, queries, 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.annTopK(embeddings, queries, 2, planes = 4).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    // recall ≥ 0.5 on this trivially clustered set
    assert(approx.intersect(exact).size * 2 >= exact.size)
  }

  test("multi-table LSH ANN: recall >= 0.9 vs brute force (sf0.001 embeddings)") {
    // These synthetic embeddings are near-isotropic (top-5 cosine ~ 0.3,
    // per-plane agreement p ~ 0.6) — the hard case for LSH. 4 planes x 24
    // tables gives expected recall 1-(1-p^4)^24 ~ 0.97 while still
    // skipping ~20% of candidates even here; on clustered real embeddings the same
    // structure prunes ~100x (see Ann.annTopK doc).
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = spark.range(10).toDF("id")
    val exact = Ann.bruteForceTopK(emb, queries, 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.annTopK(emb, queries, 5, planes = 4, multiProbe = 0, tables = 24)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall (${approx.intersect(exact).size}/${exact.size})")
    assert(approx.size <= 50)
  }

  test("IVF ANN: assignment is a pure projection (no shuffle) that partitions the set") {
    val cents = Ann.ivfTrain(embeddings, nlist = 4, iters = 2)
    val asg = Ann.ivfAssignments(embeddings, cents)
    assert(!asg.queryExecution.executedPlan.toString.contains("Exchange"),
      "nearest-centroid assignment must stay a per-row projection")
    val rows = asg.collect()
    assert(rows.length == 8 && rows.map(_.getLong(0)).distinct.length == 8)
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 4))
  }

  test("IVF ANN equals brute force on clustered vectors with nprobe=1") {
    // two tight clusters, nlist=2: Lloyd aligns the cells with the
    // clusters, so probing ONLY the query's own cell already recovers the
    // exact top-k — the density-following advantage over hyperplane LSH
    val cents = Ann.ivfTrain(embeddings, nlist = 2, iters = 3)
    val queries = Seq(0L, 5L).toDF("id")
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Ann.bruteForceTopK(embeddings, queries, 2))
    val approx = pairs(Ann.ivfTopK(embeddings, queries, 2, cents, nprobe = 1))
    assert(approx == exact)
  }

  test("IVF ANN recall vs brute force (sf0.001 embeddings)") {
    // the near-isotropic hard case (top-5 cosine ~0.3): like LSH, any
    // space-partitioning index degrades toward a scan here — measured
    // recall at nprobe=8/16 is ~0.76. The invariants worth locking are
    // (a) half-probe recall stays useful even on this worst case, and
    // (b) probing ALL cells recovers brute force EXACTLY, proving the
    // cell assignment is a lossless disjoint partition end-to-end.
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = spark.range(10).toDF("id")
    val cents = Ann.ivfTrain(emb, nlist = 16, iters = 4)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = pairs(Ann.bruteForceTopK(emb, queries, 5))
    val half = pairs(Ann.ivfTopK(emb, queries, 5, cents, nprobe = 8))
    val recall = half.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.7, s"recall $recall (${half.intersect(exact).size}/${exact.size})")
    assert(pairs(Ann.ivfTopK(emb, queries, 5, cents, nprobe = 16)) == exact)
  }

  test("IVF near-dup candidates: within-cell pairs, hot-cell cap drops whole cells") {
    val cents = Ann.ivfTrain(embeddings, nlist = 2, iters = 3)
    // two 4-member cells -> 2 * C(4,2) = 12 pairs uncapped
    val all = Ann.ivfCandidates(embeddings, cents).collect()
    assert(all.length == 12)
    assert(all.forall(r => r.getLong(0) < r.getLong(1)))
    // cap below the cell size drops BOTH cells whole (conservative guard)
    assert(Ann.ivfCandidates(embeddings, cents, maxCellSize = 3).isEmpty)
    // cap at the cell size keeps everything
    assert(Ann.ivfCandidates(embeddings, cents, maxCellSize = 4).count() == 12)
  }

  test("IVF search at 384 dims x 64 lists plans in bounded time (zip_with probe ranking)") {
    // probe selection zips the ONE scores array with indices; embedding
    // the score array once per centroid would be O(nlist^2) expression
    // nodes (the same blow-up class the LSH planes hit pre-r4)
    val dims = 384
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(dims)(d => (((i * 37 + d) % 19) - 9).toFloat / 9f))
    }.toDF("vec_id", "embedding")
    val cents = Array.tabulate(64, dims)((c, d) => (((c * 13 + d) % 23) - 11).toDouble / 11.0)
    val t0 = System.nanoTime()
    val rows = Ann.ivfTopK(vecs, spark.range(3).toDF("id"), 5, cents, nprobe = 8).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.nonEmpty)
    assert(secs < 60.0, f"high-dim IVF search took $secs%.1f s")
  }

  test("LSH bucketing at 384 dims x 128 planes plans in bounded time (one plane-matrix literal)") {
    // the round-3 shape inlined planes x dims `lit` nodes into one
    // projection (~50k expression nodes at this config) — analysis/codegen
    // blow-up territory; the matrix literal keeps the plan ~128 nodes
    val dims = 384
    val vecs = (0 until 50).map { i =>
      (i.toLong, Array.tabulate(dims)(d => (((i * 31 + d) % 17) - 8).toFloat / 8f))
    }.toDF("vec_id", "embedding")
    val t0 = System.nanoTime()
    val rows = Ann.lshTableBuckets(vecs, planes = 16, tables = 8).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows.length == 50 * 8)
    assert(secs < 60.0, f"high-dim LSH bucketing took $secs%.1f s")
    // deterministic: a second plan produces identical buckets
    val again = Ann.lshTableBuckets(vecs, planes = 16, tables = 8).collect()
    assert(again.map(_.toSeq).toSet == rows.map(_.toSeq).toSet)
  }

  test("LSH candidate bucket-size cap drops hot buckets, keeps the rest") {
    val hot = (0L until 40L).map(i => (i, "identical boilerplate page text body"))
    val rest = Seq((100L, "unique text one of a kind alpha"), (101L, "unique text one of a kind alpha"))
    val d = (hot ++ rest).toDF("doc_id", "text")
    val wide = Dedup.minhashWide(d, nHashes = 8, shingleN = 5)
    val buckets = Dedup.lshBucketsWide(wide, bands = 4, nHashes = 8)
    val uncapped = Dedup.lshCandidates(buckets).count()
    val capped = Dedup.lshCandidates(buckets, maxBucketSize = 10L).collect()
    assert(uncapped >= 40L * 39 / 2)                        // hot bucket blows up quadratically
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((100L, 101L)))
  }

  test("inverted-index TF-IDF search: postings, idf weighting, ranking") {
    import graft.text.Search
    val idx = Search.postings(docs).collect()
    assert(idx.exists(r => r.getString(0) == "the" && r.getAs[Long]("doc_id") == 0L
      && r.getAs[Long]("tf") == 2L))
    val res = Search.search(docs, Seq("the", "und"), k = 10).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    // 'und' appears in 1 of 7 docs (idf ln(8/2)) and twice there; 'the' in
    // 4 docs (idf ln(8/5)) — doc 5 must outrank the 'the' docs
    assert(res.contains(5L) && res.contains(0L))
    assert(res(5L) > res(0L))
    assert(!res.contains(6L)) // no query term
    assert(res.values.forall(_ > 0))
  }

  test("media: stub decode batch shape, frame sampling, resize plan") {
    val media = Media.syntheticMedia(spark, 30L)
    val feats = Media.extractFeatures(media)
    val rows = feats.collect()
    assert(rows.length == 30)
    assert(rows.forall(_.feature.length == Media.FeatureDim))
    assert(rows.filter(_.kind == "image").forall(f => f.width >= 64 && f.n_frames == 1))
    // deterministic across runs
    val again = Media.extractFeatures(media).collect()
    assert(rows.map(f => (f.media_id, f.width, f.feature.toSeq)).toSet ==
      again.map(f => (f.media_id, f.width, f.feature.toSeq)).toSet)
    val frames = Media.sampleFrames(feats, stride = 2, maxFrames = 4)
    assert(frames.groupBy("media_id").count().collect().forall(_.getLong(1) <= 4))
    val resize = Media.resizePlan(feats, 128, 128).collect()
    assert(resize.forall(r => r.getAs[Int]("target_width") <= 128 &&
      r.getAs[Int]("target_height") <= 128))
  }

  test("native DotProduct expression == HOF dot, and codegens") {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val e = embeddings
    val hof = e.select($"vec_id",
      aggregate(zip_with(transform($"embedding", x => x.cast("double")),
        transform($"embedding", x => x.cast("double")), (x, y) => x * y),
        lit(0.0), (acc, z) => acc + z).as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = e.select($"vec_id",
      VectorFunctions.dot_product($"embedding", $"embedding").as("d")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hof.keySet == native.keySet)
    for ((k, v) <- hof) assert(native(k) == v, s"vec $k")
    // SQL surface too
    e.createOrReplaceTempView("emb_t")
    val viaSql = spark.sql("SELECT vec_id, graft_dot_product(embedding, embedding) d FROM emb_t")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == native)
  }
}
