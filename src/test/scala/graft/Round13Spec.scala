package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Corpus, IndexStore, Similarity}

/** Round 13: product quantization (codebooks / encode / ADC search +
  * artifact flow), BPE encoding with a fixed merge table (the
  * production side of bpeMerges), and the heavy-hitters gate twin. */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // ---- product quantization ----

  test("PQ is EXACT when vectors sit on codewords (tiled corpus)") {
    // 4 distinct subvectors per subspace, vectors tiled from them:
    // with ksub >= 4 every subvector IS a codeword after training, so
    // encode -> reconstruct is the identity and PQ top-k == exact
    val protos = Seq(
      Seq.tabulate(8)(i => 1.0f + i * 0.1f),
      Seq.tabulate(8)(i => -0.5f + i * 0.05f),
      Seq.tabulate(8)(i => 2.0f - i * 0.2f),
      Seq.tabulate(8)(i => 0.3f * (i % 3)))
    val emb = (0L until 40L).map { id =>
      (id, (0 until 8).flatMap(j => protos(((id + j) % 4).toInt)).toArray.toSeq)
    }.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
    val books = Similarity.pqCodebooks(emb, m = 8, ksub = 8, iters = 3, dim = 64)
    val pq = Similarity.pqSearch(emb, Similarity.pqEncode(emb, books), books, 5, 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect().toSeq
    val exact = Similarity.cosineTopK(emb, 5, 4)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(pq == exact, "codeword-exact corpus must reproduce exact top-k")
  }

  test("PQ recall on the gate corpus clears the gate bound with margin") {
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val books = Similarity.pqCodebooks(emb)
    val ann = Similarity.pqSearch(emb, Similarity.pqEncode(emb, books), books, 10, 5)
    val exact = Similarity.cosineTopK(emb, 10, 5)
    val hits = exact.select("query_id", "neighbor_id")
      .intersect(ann.select("query_id", "neighbor_id")).count()
    val total = exact.count()
    val recall = hits.toDouble / total
    assert(recall >= 0.6, s"PQ corpus recall $recall below spec floor 0.6 " +
      "(gate bound is 0.5; rising corpus drift should trip HERE first)")
  }

  test("PQ artifact flow: indexed search equals inline, codes are m small ints") {
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val path = tmp("pq_idx")
    IndexStore.buildPqIndex(emb, path)
    val (codes, books) = IndexStore.loadPqIndex(spark, path)
    assert(books.length == 16 && books.forall(_.length == 256) &&
      books.forall(_.forall(_.length == 4)), "codebook shape m=16 x ksub=256 x sub=4")
    val c = codes.select(size(col("codes")).as("m"),
      array_min(col("codes")).as("lo"), array_max(col("codes")).as("hi"))
      .agg(min("m"), max("m"), min("lo"), max("hi")).head()
    assert(c.getInt(0) == 16 && c.getInt(1) == 16, "every vector carries m=16 codes")
    assert(c.getInt(2) >= 0 && c.getInt(3) < 256, "codes address the codebook (byte range)")
    val inline = {
      val bks = Similarity.pqCodebooks(emb)
      Similarity.pqSearch(emb, Similarity.pqEncode(emb, bks), bks, 10, 5)
    }.orderBy("query_id", "rank").as[(Long, Long, Int)].collect().toSeq
    val indexed = IndexStore.pqTopKFromIndex(emb, spark, path, 10, 5)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(indexed == inline, "from-index search must equal the inline twin")
  }

  test("PQ re-rank: full shortlist is bit-equal to exact; 4k shortlist beats flat ADC") {
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val n = emb.count().toInt
    val books = Similarity.pqCodebooks(emb)
    val codes = Similarity.pqEncode(emb, books)
    // shortlist = whole corpus -> quantization can hide nothing; the
    // re-rank stage IS the exact query (same kernel, same tiebreak)
    val full = Similarity.pqSearchRerank(emb, codes, books, 10, 5, shortlist = n)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect().toSeq
    val exact = Similarity.cosineTopK(emb, 10, 5)
      .orderBy("query_id", "rank").as[(Long, Long, Int)].collect().toSeq
    assert(full == exact, "corpus-wide shortlist must reproduce exact top-k")
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val e = Similarity.cosineTopK(emb, 10, 5)
      e.select("query_id", "neighbor_id")
        .intersect(df.select("query_id", "neighbor_id")).count().toDouble / e.count()
    }
    val flat = recallOf(Similarity.pqSearch(emb, codes, books, 10, 5))
    val rr = recallOf(Similarity.pqSearchRerank(emb, codes, books, 10, 5, 20))
    assert(rr >= flat, s"re-rank recall $rr must never lose to flat ADC $flat")
    assert(rr >= 0.8, s"re-rank recall $rr below spec floor 0.8 (gate bound 0.7)")
  }

  test("fused pq_cosine is bit-equal to cosine over the reconstructed vector") {
    import graft.functions.CosineSimilarity.cosineSim
    import graft.functions.PqCosine.pqCosine
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val books = Similarity.pqCodebooks(emb)
    val withQ = Similarity.pqEncode(emb, books)
      .join(emb.select(col("vec_id"), col("embedding").as("q_emb")), Seq("vec_id"))
    val both = withQ.select(col("vec_id"),
      pqCosine(col("codes"), col("q_emb"), books).as("fused"),
      cosineSim(col("q_emb"), Similarity.pqReconCol(books)).as("composed"))
    assert(both.filter(col("fused") =!= col("composed") ||
      col("fused").isNull =!= col("composed").isNull).count() == 0,
      "fused kernel must reproduce the composed form bit-for-bit")
    // mismatch conventions: wrong query dimension nulls out
    val shortQ = withQ.limit(5).select(col("codes"),
      expr("slice(q_emb, 1, 10)").as("q_emb"))
    assert(shortQ.select(pqCosine(col("codes"), col("q_emb"), books).as("s"))
      .filter(col("s").isNotNull).count() == 0,
      "dimension mismatch must null, never score a prefix")
  }

  test("fused residual scorer is bit-equal to cosine over centroid + reconstruction") {
    import graft.functions.CosineSimilarity.cosineSim
    import graft.functions.PqCosineResidual.pqCosineResidual
    import org.apache.spark.sql.functions.{broadcast, typedlit}
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val (assigned, cents) = Similarity.ivfIndexWithCentroids(emb, 8, 2)
    val resid = Similarity.residualFrame(emb, assigned, cents)
    val books = Similarity.pqCodebooks(resid)
    val reps = cents.toDF("cell", "__cent")
    val withQ = Similarity.pqEncode(resid, books)
      .join(resid.select(col("vec_id"), col("cell")), Seq("vec_id"))
      .join(broadcast(reps), Seq("cell"))
      .join(emb.select(col("vec_id"), col("embedding").as("q_emb")), Seq("vec_id"))
    // composed reference: float-add centroid + looked-up codeword, then
    // the plain cosine kernel — the fused form must match bitwise
    val recon = org.apache.spark.sql.functions.flatten(
      org.apache.spark.sql.functions.array(books.indices.map(j =>
        org.apache.spark.sql.functions.element_at(typedlit(books(j)),
          org.apache.spark.sql.functions.element_at(col("codes"), j + 1) + 1)): _*))
    val composed = expr("transform(zip_with(__cent, __recon, (a, b) -> a + b), " +
      "v -> CAST(v AS FLOAT))")
    val both = withQ.withColumn("__recon", recon)
      .select(col("vec_id"),
        pqCosineResidual(col("codes"), col("q_emb"), col("__cent"), books).as("fused"),
        cosineSim(col("q_emb"), composed).as("composed"))
    assert(both.filter(col("fused") =!= col("composed") ||
      col("fused").isNull =!= col("composed").isNull).count() == 0,
      "fused residual kernel must reproduce the composed form bit-for-bit")
  }

  test("IVFADC artifact flow: cell-pruned code scan clears the gate bound") {
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val path = tmp("ivfpq_idx")
    IndexStore.buildIvfPqIndex(emb, path)
    val (index, centroids, books) = IndexStore.loadIvfPqIndex(spark, path)
    assert(index.columns.toSet == Set("vec_id", "codes", "cell"),
      "index table carries exactly (vec_id, codes, cell)")
    val ann = Similarity.ivfPqSearch(emb, index, centroids, books, 10, 5)
    val exact = Similarity.cosineTopK(emb, 10, 5)
    val hits = exact.select("query_id", "neighbor_id")
      .intersect(ann.select("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / exact.count()
    assert(recall >= 0.5, s"IVFADC recall $recall below spec floor 0.5 (gate bound 0.4)")
    // pruning is real: nProbe=2 of 8 cells caps each query's scored
    // candidates at its two probed cells' populations, not the corpus
    val cellSizes = index.groupBy("cell").count()
      .as[(Long, Long)].collect().toMap
    val top2 = cellSizes.values.toSeq.sorted.reverse.take(2).sum
    val maxScored = ann.groupBy("query_id").count()
      .agg(max("count")).head().getLong(0)
    assert(maxScored <= 5 && top2 < cellSizes.values.sum,
      "top-k resolved from a strict subset of the corpus")
  }

  // ---- BPE encode ----

  test("bpeEncodeWords: greedy left-to-right merge semantics and round-trip") {
    val words = Seq("the", "order", "scan", "aaa", "thethe", "xyz").toDF("w")
    val merges = Seq("t" -> "h", "th" -> "e", "a" -> "a",
      "e" -> "r", "o" -> "r", "or" -> "d", "ord" -> "er")
    val enc = Corpus.bpeEncodeWords(words, merges)
      .select("w", "toks").as[(String, Seq[String])].collect().toMap
    assert(enc("the") == Seq("the"), "chained merges t+h, th+e collapse the word")
    assert(enc("order") == Seq("order"), "e+r then or+d then ord+er")
    assert(enc("aaa") == Seq("aa", "a"), "left-to-right non-overlapping merge")
    assert(enc("thethe") == Seq("the", "the"))
    assert(enc("xyz") == Seq("x", "y", "z"), "untouched word stays char-split")
    // round-trip: merges only concatenate, so tokens rebuild the word
    enc.foreach { case (w, toks) => assert(toks.mkString("") == w) }
  }

  test("bpeEncodeWords cannot merge across symbol boundaries") {
    // merge (b, a) must NOT fire inside "ab a" token layout: after
    // tokens {ab}{a}, the undelimited string 'b a' appears but no
    // symbol b is ADJACENT to a symbol a — the brace delimiters are
    // what encode that distinction
    val words = Seq("aba").toDF("w")
    val enc = Corpus.bpeEncodeWords(words, Seq("a" -> "b", "b" -> "a"))
      .select("toks").as[Seq[String]].head()
    assert(enc == Seq("ab", "a"),
      s"b+a merged across the {ab}|{a} boundary: $enc")
  }

  test("bpeEncodeWords rejects brace-bearing words loudly") {
    val bad = Seq("ok", "br{ace").toDF("w")
    val e = intercept[Exception] {
      Corpus.bpeEncodeWords(bad, Seq("o" -> "k")).collect()
    }
    assert(e.getMessage.contains("brace") ||
      e.getCause != null && e.getCause.getMessage.contains("brace"),
      s"expected the precondition error, got: ${e.getMessage}")
  }

  test("bpe encode gate: per-doc token mass conserves characters") {
    val g = SparkEntry.queries("x_corpus_bpe_encode")(spark, dir)
      .agg(sum("n_bpe_tokens"), sum("n_words"), sum("n_chars")).head()
    val (toks, words, chars) = (g.getLong(0), g.getLong(1), g.getLong(2))
    assert(toks > 0 && words > 0 && chars > 0)
    assert(toks <= chars, "tokens can never exceed characters")
    assert(toks >= words, "every word is at least one token")
    assert(toks < chars, "the default merge table must actually fire here")
  }

  test("BPE tokenizer artifact: saved merges drive an encoder equal to the trainer") {
    import graft.operators.TextAnalysis
    val docs = graft.core.Tables.t(spark, dir, "documents").select("doc_id", "text")
    // train 9 merges; persist the first 8 as the tokenizer artifact
    val m9 = Corpus.bpeMerges(docs, 9)
    assert(m9.length == 9 && m9.map(_._1) == (1 to 9))
    val path = tmp("bpe_merges")
    IndexStore.buildBpeMerges(docs, path, 8)
    val loaded = IndexStore.loadBpeMerges(spark, path)
    assert(loaded == m9.take(8).map(m => (m._2, m._3)),
      "artifact round-trips the ordered merge table")
    // trainer/encoder equivalence: encode the training vocabulary with
    // the 8 loaded merges, recount weighted adjacent pairs, and the
    // top pair (count desc, l, r — the trainer's total order) must be
    // EXACTLY the 9th merge the trainer itself chose. This
    // cross-validates the fold-based trainer state against the
    // replace-based encoder on real data.
    val vocab = docs.select(explode(TextAnalysis.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    val enc = Corpus.bpeEncodeWords(vocab, loaded)
    enc.select("w", "toks").as[(String, Seq[String])].collect()
      .foreach { case (w, toks) => assert(toks.mkString("") == w, s"round-trip broke on $w") }
    val top = enc.filter(size(col("toks")) >= 2)
      .select(col("n_w"), explode(expr(
        "transform(sequence(1, size(toks) - 1), " +
          "i -> struct(element_at(toks, i) AS l, element_at(toks, i + 1) AS r))")).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("n_w").as("n"))
      .orderBy(col("n").desc, col("l"), col("r"))
      .limit(1).as[(String, String, Long)].head()
    assert(top == ((m9(8)._2, m9(8)._3, m9(8)._4)),
      s"merge 9 recomputed from the encoder's state was $top, trainer chose ${m9(8)}")
  }

  test("sorted-neighborhood blocking: window recall and its documented blind spot") {
    import graft.operators.Linkage
    val recs = Seq(
      (1L, "anderson"), (2L, "andersen"),   // tail typo: sort-adjacent
      (3L, "smith"), (4L, "zmith"),         // HEAD typo: teleported in sort order
      (5L, "baker"), (6L, "baker"),         // exact duplicate
      (7L, "carter"), (8L, "dawson"), (9L, "ellis"), (10L, "foster"),
      (11L, "garner"), (12L, "harper"), (13L, "irwin"), (14L, "jones"),
      // t..y fillers keep smith and zmith more than a window apart
      (15L, "thomas"), (16L, "upton"), (17L, "victor"), (18L, "walker"),
      (19L, "xavier"), (20L, "young"))
      .toDF("id", "name")
    val sn = Linkage.sortedNeighborhoodPairs(recs, col("id"), col("name"),
      window = 3, maxDist = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sn.contains((1L, 2L)), "tail-typo twins are sort-adjacent and found")
    assert(sn.contains((5L, 6L)), "exact duplicates always share a window")
    // the documented trade: a leading-character typo moves the record
    // across the sort order, out of every shared window — the pair the
    // deletion-neighborhood blocking DOES find
    assert(!sn.contains((3L, 4L)), "head-typo pair is the known blind spot")
    val dn = Linkage.editDistancePairs(recs, col("id"), col("name"), 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(dn.contains((3L, 4L)), "deletion blocking is candidate-complete at d=1")
    // the standard remedy: a second pass on the REVERSED key makes the
    // head-typo pair tail-adjacent; the union recovers it
    val mp = Linkage.sortedNeighborhoodMultiPass(recs, col("id"), col("name"),
      window = 3, maxDist = 1, keys = Seq(identity, reverse))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(mp.contains((3L, 4L)), "reversed-key pass recovers the head typo")
    assert(mp.contains((1L, 2L)) && mp.contains((5L, 6L)),
      "multi-pass is a superset of the forward pass here")
    // candidate budget: window w over n rows probes at most n*(w-1) pairs
    val nCand = Linkage.sortedNeighborhoodPairs(recs, col("id"), col("name"),
      window = 3, maxDist = 100).count()
    assert(nCand <= recs.count() * 2, "fixed n*(w-1) candidate budget")
  }

  test("resource allocation outranks hub-mediated pairs that common-neighbors prefers") {
    import graft.operators.Graph
    // (v,w) share ONE rare neighbor (deg 2): RA = 500000
    // (x,y) share TWO hubs (deg 10 each):   RA = 200000, n_common = 2
    val spokes = (0 until 8).flatMap(i =>
      Seq((100L, 200L + i), (101L, 300L + i))) // hubs 100, 101 + 8 spokes each
    val edges = (Seq((50L, 1L), (50L, 2L), // rare neighbor 50 links v=1, w=2
      (100L, 10L), (100L, 11L), (101L, 10L), (101L, 11L)) ++ spokes)
      .toDF("a", "b")
    val ra = Graph.resourceAllocation(edges, k = 50)
      .as[(Long, Long, Long, Long)].collect()
    val cn = Graph.commonNeighbors(edges, k = 50)
      .as[(Long, Long, Long)].collect()
    val raMap = ra.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(raMap((1L, 2L)) == ((500000L, 1L)), s"rare-neighbor pair: ${raMap.get((1L, 2L))}")
    assert(raMap((10L, 11L)) == ((200000L, 2L)), s"hub pair: ${raMap.get((10L, 11L))}")
    val raRank = ra.sortBy(r => (-r._3, r._1, r._2)).map(r => (r._1, r._2)).toSeq
    assert(raRank.indexOf((1L, 2L)) < raRank.indexOf((10L, 11L)),
      "RA must rank the rare-neighbor pair above the hub pair")
    val cnTop = cn.maxBy(_._3)
    assert((cnTop._1, cnTop._2) == ((10L, 11L)),
      "common-neighbors prefers the hub pair — the disagreement RA exists for")
  }

  test("bloom-prefiltered decontamination equals the plain form and actually prunes") {
    val plain = SparkEntry.queries("x_text_contamination")(spark, dir)
      .as[(Long, Long)].collect().toSet
    val bloom = SparkEntry.queries("x_text_contamination_bloom")(spark, dir)
      .as[(Long, Long)].collect().toSet
    assert(plain.nonEmpty && bloom == plain,
      "bloom prefilter must not change the output (exact verify removes fps)")
  }

  test("parquet aggregate pushdown answers count/min/max from footers") {
    // the 100 TB lever: COUNT/MIN/MAX over a clean parquet scan can be
    // answered from row-group METADATA — zero data pages read. Session
    // -conf-gated (not a per-read option), so it lives here as a
    // pinned capability + equality check rather than as a gate row
    // that would mutate global planner state mid-verify.
    // needs the V2 parquet reader (V1, the default, has no aggregate
    // pushdown surface at all)
    val confs = Seq("spark.sql.parquet.aggregatePushdown" -> "true",
      "spark.sql.sources.useV1SourceList" -> "")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    def agg() = spark.read.parquet(s"$dir/lineitem.parquet")
      .agg(count(lit(1)).as("n"), min("l_orderkey").as("lo"),
        max("l_orderkey").as("hi"))
    try {
      confs.foreach { case (c, v) => spark.conf.set(c, v) }
      val pushed = agg()
      assert(pushed.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [COUNT(*)"),
        "aggregate must reach the scan as PushedAggregation")
      val r = pushed.as[(Long, Long, Long)].head()
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "false")
      assert(agg().as[(Long, Long, Long)].head() == r,
        "footer-answered aggregate equals the data-scan aggregate")
    } finally prev.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  // ---- heavy hitters gate twin ----

  test("heavy-hitters gate: every true heavy hitter is captured") {
    val rows = SparkEntry.queries("x_stats_heavy_hitters")(spark, dir)
      .as[(String, Long, Boolean)].collect()
    assert(rows.nonEmpty, "gate corpus has ~30 heavy tokens")
    assert(rows.forall(_._3), "MG guarantee: every true heavy hitter present")
  }
}
