package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Sparse (lexical) ranked retrieval — Okapi BM25 over an inverted
  * index. The retrieval primitive a training-data pipeline uses for
  * decontamination lookups ("which training docs answer this benchmark
  * question"), retrieval-based data selection, and known-item audits;
  * complements the dense ANN family in [[Similarity]] (same top-k
  * contract, lexical instead of embedding evidence). Cited pattern:
  * the reference's per-table synonym grep chains
  * (PharmacoDI/build_synonym_tables.py:41-63) are point lookups over
  * the same token-to-row shape; BM25 is that lookup with a principled
  * score.
  *
  * Scoring is Robertson/Sparck Jones BM25 (k1 = 1.2, b = 0.75) with
  * the idf kept LINEAR — `(N - df + ½) / (df + ½)` without the log —
  * so the whole score is a ratio of integer polynomials. With k1, b
  * and the ½s cleared to integers:
  *
  *   term_bp = 10000 * (2N - 2df + 1) * 22 * tf * sumdl
  *             DIV ((2df + 1) * (10*tf*sumdl + 3*sumdl + 9*dl*N))
  *
  * — every factor an exact integer (decimal(38,0) against the
  * 10000 * idf * tf * sumdl product overflowing int64), one floor
  * division per term, summed per (query, doc). Bit-portable across
  * engines, same trade the linear-idf [[Corpus.tfIdf]] documents: a
  * log idf would hang the oracle hash on libm rounding. Monotonicity
  * in tf, 1/df, and 1/dl — the properties BM25 ranks by — survives
  * the linearization (RetrievalSpec pins all three).
  *
  * Scale shape: query terms are collected once (bounded by
  * nQueries * qLen — quantizer-sized, the adjudicated driver-collect
  * class) and broadcast against the exploded corpus scan, so only
  * postings of query terms ever reach a shuffle; per-(doc, tok) tf is
  * map-combined; df over the pruned hits is vocabulary-of-the-query
  * sized. The final per-query top-k rides [[graft.functions.TopK]]
  * (map tasks emit <= k rows per query before the shuffle — O(q * k)
  * shuffle, never O(matched docs)). A stopword query term makes its
  * posting list corpus-sized; `maxDf` is the escape hatch (drop terms
  * hotter than the cap from scoring — the [[Dedup.GateMaxDf]] move).
  */
object Retrieval {

  type Q = (SparkSession, String) => DataFrame

  /** Gate parameters: queries are the `NQueries` smallest doc_ids,
    * each asking its `QueryLen` lexicographically-first distinct
    * tokens — deterministic, self-contained, and a known-item probe
    * (the query's own doc contains every query term by construction). */
  val NQueries = 8
  val QueryLen = 4
  val K = 10

  private[graft] def docTokens(docs: DataFrame): DataFrame =
    // fan-out before the tokenize+explode the BM25 pipelines hang off
    // this frame (scale-adaptive; no-op at scale and on pinned inputs
    // — see graft.core.Fanout.bySize)
    graft.core.Fanout.bySize(docs, col("doc_id"))
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))

  /** (q_id, tok) query-term pairs, collected driver-side — bounded by
    * nQueries * qLen rows, the quantizer-sized collect class. One
    * TakeOrdered job; the literal frame then feeds every consumer as
    * a broadcast, instead of re-running the corpus scan per use.
    *
    * The limit runs BEFORE tokenization (r22): the query ids are the
    * nQueries smallest doc_ids, a property of the raw corpus rows —
    * tokenizing first made the TakeOrdered evaluate the tokenizer (and
    * r21's fan exchange) over EVERY document to keep 8. Per-row
    * projections commute with a key-only top-k, so the output is
    * identical; the derivation now reads the corpus once with no
    * shuffle and tokenizes nQueries rows. */
  def queryTermsLocal(docs: DataFrame, nQueries: Int = NQueries,
      qLen: Int = QueryLen): Seq[(Long, String)] =
    queryTermsFromTokens(
      docs.orderBy("doc_id").limit(nQueries)
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws")),
      nQueries, qLen)

  /** [[queryTermsLocal]] over a pre-tokenized (doc_id, ws) frame —
    * the variant multi-pass consumers ([[bm25Rm3]]) feed from ONE
    * pinned tokenization instead of re-tokenizing the corpus. */
  def queryTermsFromTokens(toks: DataFrame, nQueries: Int = NQueries,
      qLen: Int = QueryLen): Seq[(Long, String)] =
    toks.orderBy("doc_id").limit(nQueries)
      .select(col("doc_id").as("q_id"),
        explode(slice(array_sort(array_distinct(col("ws"))), 1, qLen)).as("tok"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))

  /** One-row (n, sumdl) corpus statistics — the BM25 normalizer. */
  def corpusStats(docs: DataFrame): DataFrame =
    corpusStatsFromTokens(docTokens(docs))

  /** [[corpusStats]] over a pre-tokenized (doc_id, ws) frame. */
  def corpusStatsFromTokens(toks: DataFrame): DataFrame =
    // coalesce keeps an EMPTY corpus honest: sum over zero rows is
    // NULL, and the (n=0, sumdl=NULL) row is a landmine for any store
    // consumer that folds without null-skipping (the PostingsIngest
    // per-batch stats rows are exactly such a store)
    toks.agg(count(lit(1)).cast("long").as("n"),
      coalesce(sum(size(col("ws"))), lit(0L)).cast("long").as("sumdl"))

  /** Full-corpus postings (doc_id, tok, tf, dl) — the inverted-index
    * payload [[IndexStore.buildPostingsIndex]] persists. dl rides the
    * map-combined partial agg (max of a per-doc constant) so no
    * doc-keyed join is ever needed. */
  def postings(docs: DataFrame): DataFrame =
    docTokens(docs)
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))

  /** Postings pruned to the query vocabulary BEFORE the tf groupBy:
    * the broadcast semi-prune sits against the exploded scan, so the
    * only rows shuffled are instances of query terms. */
  def bm25Hits(docs: DataFrame, toks: Seq[String]): DataFrame =
    bm25HitsFromTokens(docTokens(docs), toks)

  /** [[bm25Hits]] over a pre-tokenized (doc_id, ws) frame. */
  def bm25HitsFromTokens(tokensDf: DataFrame, toks: Seq[String]): DataFrame = {
    val tokDf = tokensDf.sparkSession.createDataFrame(
      toks.distinct.map(Tuple1(_))).toDF("tok")
    tokensDf
      .select(col("doc_id"), size(col("ws")).cast("long").as("dl"),
        explode(col("ws")).as("tok"))
      .join(broadcast(tokDf), Seq("tok"))
      .groupBy("doc_id", "tok")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))
  }

  /** The exact-integer BM25 term contribution in basis points; inputs
    * must already be decimal(38,0) columns named tf, dl, df, n, sumdl. */
  private val TermBp =
    "CAST((10000 * (2*n - 2*df + 1) * 22 * tf * sumdl) DIV " +
      "((2*df + 1) * (10*tf*sumdl + 3*sumdl + 9*dl*n)) AS BIGINT)"

  private def dec(c: Column): Column = c.cast(DecimalType(38, 0))

  /** Score + rank: joins hits against the (tiny) df table and query
    * fan-out, folds per-term bp into per-(q, doc) scores, and takes
    * the per-query top-k through the partial-aggregating TopK
    * (score carried as Double in the aggregator — exact below 2^53,
    * a bound the 10^4-bp scale keeps until N ~ 10^11 docs; documented
    * here because the DIV arithmetic itself never rounds).
    *
    * `dfT` is passed in rather than derived so the index path can use
    * its persisted dictionary: both equal "docs containing tok", so
    * inline and from-index outputs are identical by construction. */
  def bm25Rank(hits: DataFrame, dfT: DataFrame, qterms: Seq[(Long, String)],
      stats: DataFrame, k: Int, maxDf: Option[Long] = None): DataFrame = {
    val spark = hits.sparkSession
    import spark.implicits._
    val qDf = spark.createDataFrame(qterms).toDF("q_id", "tok")
    val dfKept = maxDf.map(m => dfT.filter(col("df") <= m)).getOrElse(dfT)
    val scored = hits
      .join(broadcast(dfKept), Seq("tok"))
      .join(broadcast(qDf), Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"), dec(col("tf")).as("tf"),
        dec(col("dl")).as("dl"), dec(col("df")).as("df"),
        dec(col("n")).as("n"), dec(col("sumdl")).as("sumdl"))
      .withColumn("term_bp", expr(TermBp))
      .groupBy("q_id", "doc_id")
      .agg(sum("term_bp").as("score_bp"))
    scored.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._3.toDouble, r._2))
      .agg(new graft.functions.TopK(k).toColumn.name("top"))
      .flatMap { case (q, items) =>
        items.zipWithIndex.map { case ((s, d), i) => (q, d, s.toLong, i + 1) }
      }
      .toDF("q_id", "doc_id", "score_bp", "rank")
  }

  /** Weight-aware scoring: like [[bm25Rank]]'s scoring stage but each
    * (q_id, tok) carries an integer weight multiplying its term bp —
    * the primitive RM3 feedback needs (original terms at 7, expansion
    * terms at 3 = the classic 0.7/0.3 interpolation kept integer by
    * NOT dividing by 10: rank order is scale-invariant). Returns the
    * pre-top-k (q_id, doc_id, score_w) frame. */
  def bm25ScoresWeighted(hits: DataFrame, dfT: DataFrame,
      qtermsW: Seq[(Long, String, Long)], stats: DataFrame): DataFrame = {
    val spark = hits.sparkSession
    val qDf = spark.createDataFrame(qtermsW).toDF("q_id", "tok", "wt")
    hits
      .join(broadcast(dfT), Seq("tok"))
      .join(broadcast(qDf), Seq("tok"))
      .crossJoin(broadcast(stats))
      .select(col("q_id"), col("doc_id"), col("wt"), dec(col("tf")).as("tf"),
        dec(col("dl")).as("dl"), dec(col("df")).as("df"),
        dec(col("n")).as("n"), dec(col("sumdl")).as("sumdl"))
      .withColumn("term_bp", expr(TermBp))
      .groupBy("q_id", "doc_id")
      .agg(sum(col("wt") * col("term_bp")).as("score_w"))
  }

  /** Inline gate: query construction, pruned postings, df from the
    * pruned hits (= docs containing tok), rank. Pass `qterms` to skip
    * the self-contained query derivation (production searches arrive
    * with their own terms; the soak times pure search this way). */
  def bm25TopK(docs: DataFrame, nQueries: Int = NQueries,
      qLen: Int = QueryLen, k: Int = K,
      qterms: Option[Seq[(Long, String)]] = None): DataFrame = {
    val qt = qterms.getOrElse(queryTermsLocal(docs, nQueries, qLen))
    val hits = bm25Hits(docs, qt.map(_._2))
    val dfT = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    bm25Rank(hits, dfT, qt, corpusStats(docs), k)
  }

  val textBm25: Q = (s, dir) =>
    bm25TopK(t(s, dir, "documents")).orderBy("q_id", "rank")

  /** Indexed twin: same output through the persisted postings artifact
    * ([[IndexStore.ensurePostingsIndex]] — build-once per JVM), with
    * the probe pruned to the query terms' `pb` partitions at PLANNING
    * time (static isin on the partition column, the IVFADC move). */
  val textBm25Indexed: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val path = IndexStore.defaultPath("postings", dir)
    IndexStore.ensurePostingsIndex(docs, path)
    IndexStore.bm25FromIndex(docs, s, path, NQueries, QueryLen, K)
      .orderBy("q_id", "rank")
  }

  // ---- Pseudo-relevance feedback (RM3-lite) ----

  /** RM3 feedback parameters: top `FbDocs` docs from the first pass
    * contribute their `FbTerms` highest-tf non-query tokens as
    * expansion terms; original terms weigh [[WOrig]], expansion terms
    * [[WExp]] — the classic 0.7/0.3 interpolation, integer because
    * rank order never needed the /10. */
  val FbDocs = 3
  val FbTerms = 2
  val WOrig = 7L
  val WExp = 3L

  /** Pseudo-relevance feedback: run BM25, mine expansion terms from
    * each query's top-[[FbDocs]] docs (highest total tf, ties to the
    * smaller token, original terms excluded), then re-score with the
    * weighted union vocabulary. One extra driver round-trip collects
    * the expansion terms (bounded by nQueries * FbTerms — the same
    * quantizer-sized class as the query terms themselves) because the
    * SECOND pass's scan pruning needs them as literals; everything
    * else is the scoring shape already audited for BM25. The final
    * ranking stays exact-integer end to end. */
  def bm25Rm3(docs: DataFrame, nQueries: Int = NQueries,
      qLen: Int = QueryLen, k: Int = K): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // ONE pinned tokenization feeds every corpus consumer — query
    // derivation, pass-1 hits + stats, feedback mining, pass-2 hits —
    // instead of re-tokenizing the corpus per pass (the shared-shingle
    // move from Dedup.minhashLsh; tokenization was the dominant cost
    // of this row's three corpus scans). The pin stays live for the
    // returned frame's lineage, reclaimed by the context cleaner.
    // Scale note: the pin materializes the tokenized corpus (spills to
    // executor disk past memory) — the right trade for any corpus a
    // cluster can hold once; a corpus too large to pin should run its
    // passes against the postings ARTIFACT instead (ensurePostingsIndex
    // + bm25FromIndex: index once, every pass is a pruned probe).
    val toks = graft.core.Materialize.pin(docTokens(docs))
    val qterms = queryTermsFromTokens(toks, nQueries, qLen)
    val stats = corpusStatsFromTokens(toks)
    // pass 1: plain BM25 top-FbDocs
    val hits1 = bm25HitsFromTokens(toks, qterms.map(_._2))
    val dfT1 = hits1.groupBy("tok").agg(count(lit(1)).as("df"))
    val topm = bm25Rank(hits1, dfT1, qterms, stats, FbDocs)
      .select("q_id", "doc_id")
    // expansion mining: tokens of the feedback docs, total tf per
    // (q, tok), minus the original terms, top-FbTerms per query.
    // The feedback-doc set is tiny (q * FbDocs) — broadcast it against
    // the pinned tokens, explode only matching docs.
    val fbToks = toks
      .join(broadcast(topm), Seq("doc_id"))
      .select(col("q_id"), explode(col("ws")).as("tok"))
      .groupBy("q_id", "tok").agg(count(lit(1)).as("tf"))
    val origDf = spark.createDataFrame(qterms).toDF("q_id", "tok")
    val expTerms = fbToks
      .join(broadcast(origDf), Seq("q_id", "tok"), "left_anti")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("tf").desc, col("tok"))))
      .filter(col("rk") <= FbTerms)
      .select("q_id", "tok").as[(Long, String)].collect().toSeq
    // weighted union vocabulary; pass 2 over its pruned hits
    val union = qterms.map { case (q, t) => (q, t, WOrig) } ++
      expTerms.map { case (q, t) => (q, t, WExp) }
    val hits = bm25HitsFromTokens(toks, union.map(_._2))
    val dfT = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    val scored = bm25ScoresWeighted(hits, dfT, union, stats)
    scored.as[(Long, Long, Long)]
      .groupByKey(_._1)
      .mapValues(r => (r._3.toDouble, r._2))
      .agg(new graft.functions.TopK(k).toColumn.name("top"))
      .flatMap { case (q, items) =>
        items.zipWithIndex.map { case ((s, d), i) => (q, d, s.toLong, i + 1) }
      }
      .toDF("q_id", "doc_id", "score_w", "rank")
  }

  val textBm25Rm3: Q = (s, dir) =>
    bm25Rm3(t(s, dir, "documents")).orderBy("q_id", "rank")

  // ---- Hybrid retrieval: reciprocal-rank fusion of lexical + dense ----

  /** Brute-force dense top-k for the SAME query ids the BM25 gate asks
    * (self included — known-item symmetry with the lexical leg, where
    * the query's own doc competes like any other). This is the
    * oracle-shaped dense leg; at corpus scale the ANN family
    * ([[Similarity]] LSH/IVF/PQ) replaces it under the same (q_id,
    * doc_id, rank) contract, which is all the fusion consumes. */
  def denseTopK(emb: DataFrame, qIds: Seq[Long], k: Int): DataFrame = {
    import emb.sparkSession.implicits._
    import graft.functions.{CosineSimilarity, TopK}
    val q = emb.filter(col("vec_id").isin(qIds: _*))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    emb.crossJoin(broadcast(q))
      .select(col("q_id"), col("vec_id").as("doc_id"),
        CosineSimilarity.cosineSim(col("q_emb"), col("embedding")).as("sim"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._3, r._2))
      .agg(new TopK(k).toColumn.name("top"))
      .flatMap { case (qid, items) =>
        items.zipWithIndex.map { case ((_, d), i) => (qid, d, i + 1) }
      }
      .toDF("q_id", "doc_id", "rank")
  }

  /** Reciprocal-rank fusion constant (Cormack et al. 2009's k = 60)
    * and the integer scale that keeps fusion scores exact:
    * `pts(rank) = 10^7 div (60 + rank)` — a pure rank transform, so
    * the fused score is bit-portable even though the dense leg's
    * similarities are floats (only their ORDER crosses the boundary,
    * the same trade every cosine gate row already makes). */
  val RrfC = 60
  val RrfScale = 10000000L

  /** RRF fusion of two ranked legs — a doc absent from one list
    * simply contributes nothing for it (the standard formulation).
    * Fusion re-ranks a candidate pool of <= 2k rows per query, so the
    * final window is bounded by the leg sizes, never the corpus. Legs
    * arrive as (q_id, doc_id, lex_rank) / (q_id, doc_id, dense_rank).
    *
    * The textbook shape is a FULL OUTER join on (q_id, doc_id) — but
    * Spark cannot broadcast a full outer join, so that planned the
    * suite's one avoidable SortMergeJoin (caught by PlanGuardSpec the
    * round it started enforcing). A same-key full outer of two
    * rank-unique legs is exactly union + min-per-side aggregate: one
    * hash-aggregate exchange, no join operator at all, bit-identical
    * output. */
  def rrfFuse(lex: DataFrame, dense: DataFrame, kOut: Int): DataFrame =
    lex.select(col("q_id"), col("doc_id"),
        col("lex_rank").cast("int").as("lex_rank"),
        lit(null).cast("int").as("dense_rank"))
      .unionByName(dense.select(col("q_id"), col("doc_id"),
        lit(null).cast("int").as("lex_rank"),
        col("dense_rank").cast("int").as("dense_rank")))
      .groupBy("q_id", "doc_id")
      .agg(min("lex_rank").as("lex_rank"),
        min("dense_rank").as("dense_rank"))
      .withColumn("rrf",
        coalesce(expr(s"CAST($RrfScale AS BIGINT) DIV ($RrfC + lex_rank)"), lit(0L)) +
          coalesce(expr(s"CAST($RrfScale AS BIGINT) DIV ($RrfC + dense_rank)"), lit(0L)))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("q_id")
          .orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .filter(col("rank") <= kOut)
      .select("q_id", "doc_id", "rrf", "rank")

  /** Hybrid retrieval: BM25 top-k and dense top-k fused by
    * [[rrfFuse]]. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, nQueries: Int = NQueries,
      qLen: Int = QueryLen, k: Int = K, kOut: Int = K): DataFrame = {
    val qterms = queryTermsLocal(docs, nQueries, qLen)
    val hits = bm25Hits(docs, qterms.map(_._2))
    val dfT = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    val lex = bm25Rank(hits, dfT, qterms, corpusStats(docs), k)
      .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank"))
    val dense = denseTopK(emb, qterms.map(_._1).distinct, k)
      .select(col("q_id"), col("doc_id"), col("rank").as("dense_rank"))
    rrfFuse(lex, dense, kOut)
  }

  val textHybridRrf: Q = (s, dir) =>
    hybridRrf(t(s, dir, "documents"), t(s, dir, "embeddings"))
      .orderBy("q_id", "rank")

  /** Recall bounds for the ANN-leg hybrid gate: the dense leg alone
    * must clear the IVFADC family's own bar, and the FUSED list must
    * stay close to the exact-dense fusion — fusion with the exact
    * lexical leg dampens ANN misses, measured: fused overlap
    * 0.863/0.888/0.863 against dense-leg recall 0.775/0.800/0.675 at
    * sf0.001/0.01/0.1. */
  val AnnFusedMinRecall = 0.7
  val AnnDenseMinRecall = 0.4

  /** Hybrid retrieval with the ANN dense leg — the production shape:
    * the brute-force [[denseTopK]] leg is replaced by the IVFADC
    * artifact search ([[Similarity.ivfPqSearch]] — cell-pruned,
    * code-compressed, raw embeddings never read at search time),
    * CHECKED rather than assumed: the gate emits the
    * [[Similarity.annRecall]] reduction of the ANN-fused list against
    * the exact-dense-fused list (plus the dense leg's own recall
    * bound), so an index losing recall fails the hash gate instead of
    * silently degrading the fusion. Both dense legs exclude self
    * (the ANN search's contract); the lexical leg is the audited
    * exact-integer BM25. */
  def hybridRrfAnn(docs: DataFrame, emb: DataFrame, spark: SparkSession,
      indexPath: String, nQueries: Int = NQueries, qLen: Int = QueryLen,
      k: Int = K): DataFrame = {
    val qterms = queryTermsLocal(docs, nQueries, qLen)
    // the ANN search selects queries as vec_id < nQueries; the BM25
    // side takes the nQueries smallest doc_ids — identical sets only
    // on a dense 0-based id space, so check it rather than assume it
    val qIds = qterms.map(_._1).distinct.sorted
    require(qIds == (0L until nQueries.toLong),
      s"hybridRrfAnn expects query ids 0..${nQueries - 1} (dense 0-based " +
        s"doc_id space shared with vec_id); got $qIds")
    val hits = bm25Hits(docs, qterms.map(_._2))
    val dfT = hits.groupBy("tok").agg(count(lit(1)).as("df"))
    IndexStore.ensureIvfPqIndex(emb, indexPath)
    val (index, centroids, books) = IndexStore.loadIvfPqIndex(spark, indexPath)
    // each leg feeds TWO consumers (its fusion and the recall
    // referee); the frames are queries*k-bounded, so pinning them is
    // three tiny checkpoint jobs that halve the expensive upstreams
    // (postings scan, cell-pruned ADC scan, brute-force referee scan)
    val lex = graft.core.Materialize.pin(
      bm25Rank(hits, dfT, qterms, corpusStats(docs), k)
        .select(col("q_id"), col("doc_id"), col("rank").as("lex_rank")))
    val annD = graft.core.Materialize.pin(
      Similarity.ivfPqSearch(emb, index, centroids, books, nQueries, k))
    val exactD = graft.core.Materialize.pin(
      Similarity.cosineTopK(emb, nQueries, k))
    def asLeg(d: DataFrame) = d.select(col("query_id").as("q_id"),
      col("neighbor_id").as("doc_id"), col("rank").as("dense_rank"))
    def asAnn(f: DataFrame) = f.select(col("q_id").as("query_id"),
      col("doc_id").as("neighbor_id"))
    val fusedAnn = rrfFuse(lex, asLeg(annD), k)
    val fusedExact = rrfFuse(lex, asLeg(exactD), k)
    val denseOk = Similarity.annRecall(annD, exactD, AnnDenseMinRecall)
      .select(col("query_id"), col("recall_ok").as("dense_ok"))
    Similarity.annRecall(asAnn(fusedAnn), asAnn(fusedExact), AnnFusedMinRecall)
      .withColumnRenamed("recall_ok", "fused_ok")
      .join(broadcast(denseOk), Seq("query_id"))
      .select("query_id", "n_topk", "dense_ok", "fused_ok")
  }

  val textHybridRrfAnn: Q = (s, dir) =>
    hybridRrfAnn(t(s, dir, "documents"), t(s, dir, "embeddings"), s,
      IndexStore.defaultPath("ivfpq", dir))
      .orderBy("query_id")

  // ---- Retrieval-based decontamination ----

  /** Top-M cut for retrieval decontamination: every training doc
    * ranking in a benchmark query's top-[[DecontamTopM]] is flagged.
    * The ranked complement of the n-gram-overlap decon
    * ([[TextAnalysis.textContamination]]): n-gram overlap catches
    * verbatim leakage, ranked retrieval catches the reworded/partial
    * leakage a fixed-gram match misses — production pipelines run
    * both. */
  val DecontamTopM = 5

  /** Per-doc contamination flags: which corpus docs a benchmark query
    * set retrieves, with hit count / best rank / max score — the
    * audit record a decontamination run keeps. Cost shape is exactly
    * [[bm25TopK]] (query-term-pruned postings, O(q*m) top-M), and the
    * flag table is bounded by |benchmark| * m rows. */
  def decontamFlags(docs: DataFrame, nQueries: Int = NQueries,
      qLen: Int = QueryLen, m: Int = DecontamTopM): DataFrame =
    bm25TopK(docs, nQueries, qLen, m)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_queries_hit"),
        min("rank").as("best_rank"),
        max("score_bp").as("max_score_bp"))

  /** The cleaned corpus: drop every flagged doc. The flag side is
    * benchmark-bounded, so the anti-join broadcasts — one corpus scan,
    * no shuffle, the only shape that survives a 100 TB training set. */
  def decontaminate(docs: DataFrame, nQueries: Int = NQueries,
      qLen: Int = QueryLen, m: Int = DecontamTopM): DataFrame =
    docs.join(broadcast(decontamFlags(docs, nQueries, qLen, m)
      .select("doc_id")), Seq("doc_id"), "left_anti")

  val textDecontamRetrieval: Q = (s, dir) =>
    decontamFlags(t(s, dir, "documents")).orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "x_text_bm25" -> textBm25,
    "x_text_bm25_indexed" -> textBm25Indexed,
    "x_text_bm25_rm3" -> textBm25Rm3,
    "x_text_hybrid_rrf" -> textHybridRrf,
    "x_text_hybrid_rrf_ann" -> textHybridRrfAnn,
    "x_text_decontam_retrieval" -> textDecontamRetrieval)

  private val bm25Sql =
    ("WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents), " +
      "d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w), " +
      "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM d), " +
      s"q AS (SELECT doc_id AS q_id, list_sort(list_distinct(ws))[1:$QueryLen] AS qs FROM w ORDER BY doc_id LIMIT $NQueries), " +
      "qt AS (SELECT q_id, unnest(qs) AS tok FROM q), " +
      "tk AS (SELECT doc_id, unnest(ws) AS tok FROM w), " +
      "hits AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk " +
      "WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok), " +
      "dfv AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY tok), " +
      "sc AS (SELECT qt.q_id, h.doc_id, CAST(SUM(" +
      "(CAST(10000 AS HUGEINT) * (2*st.n - 2*dfv.df + 1) * 22 * h.tf * st.sumdl) // " +
      "(CAST(2*dfv.df + 1 AS HUGEINT) * (CAST(10 AS HUGEINT)*h.tf*st.sumdl + 3*st.sumdl + 9*d.dl*st.n))" +
      ") AS BIGINT) AS score_bp " +
      "FROM hits h JOIN dfv USING (tok) JOIN qt USING (tok) " +
      "JOIN d ON h.doc_id = d.doc_id CROSS JOIN st GROUP BY qt.q_id, h.doc_id), " +
      "r AS (SELECT q_id, doc_id, score_bp, CAST(row_number() OVER " +
      "(PARTITION BY q_id ORDER BY score_bp DESC, doc_id) AS INT) AS rank FROM sc) " +
      s"SELECT q_id, doc_id, score_bp, rank FROM r WHERE rank <= $K ORDER BY q_id, rank")

  private val hybridSql =
    ("WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents), " +
      "d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w), " +
      "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM d), " +
      s"q AS (SELECT doc_id AS q_id, list_sort(list_distinct(ws))[1:$QueryLen] AS qs FROM w ORDER BY doc_id LIMIT $NQueries), " +
      "qt AS (SELECT q_id, unnest(qs) AS tok FROM q), " +
      "tk AS (SELECT doc_id, unnest(ws) AS tok FROM w), " +
      "hits AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk " +
      "WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok), " +
      "dfv AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY tok), " +
      "sc AS (SELECT qt.q_id, h.doc_id, CAST(SUM(" +
      "(CAST(10000 AS HUGEINT) * (2*st.n - 2*dfv.df + 1) * 22 * h.tf * st.sumdl) // " +
      "(CAST(2*dfv.df + 1 AS HUGEINT) * (CAST(10 AS HUGEINT)*h.tf*st.sumdl + 3*st.sumdl + 9*d.dl*st.n))" +
      ") AS BIGINT) AS score_bp " +
      "FROM hits h JOIN dfv USING (tok) JOIN qt USING (tok) " +
      "JOIN d ON h.doc_id = d.doc_id CROSS JOIN st GROUP BY qt.q_id, h.doc_id), " +
      "lex AS (SELECT q_id, doc_id, rnk AS lex_rank FROM (SELECT q_id, doc_id, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY score_bp DESC, doc_id) AS rnk FROM sc) " +
      s"WHERE rnk <= $K), " +
      "sims AS (SELECT qe.vec_id AS q_id, c.vec_id AS doc_id, " +
      "list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim " +
      "FROM embeddings qe, embeddings c WHERE qe.vec_id IN (SELECT q_id FROM q)), " +
      "dn AS (SELECT q_id, doc_id, rnk AS dense_rank FROM (SELECT q_id, doc_id, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rnk FROM sims) " +
      s"WHERE rnk <= $K), " +
      "f AS (SELECT COALESCE(lex.q_id, dn.q_id) AS q_id, COALESCE(lex.doc_id, dn.doc_id) AS doc_id, " +
      s"COALESCE($RrfScale // ($RrfC + lex.lex_rank), 0) + COALESCE($RrfScale // ($RrfC + dn.dense_rank), 0) AS rrf " +
      "FROM lex FULL OUTER JOIN dn ON lex.q_id = dn.q_id AND lex.doc_id = dn.doc_id) " +
      "SELECT q_id, doc_id, rrf, CAST(rnk AS INT) AS rank FROM (SELECT q_id, doc_id, rrf, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rnk FROM f) " +
      s"WHERE rnk <= $K ORDER BY q_id, rank")

  /** The shared CTE prologue every BM25 oracle reuses: tokenized
    * corpus, doc lengths, corpus stats, query construction, token
    * stream, and the integer term-bp expression applied to a hits CTE
    * named by the caller. */
  private val bm25Prologue =
    ("WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents), " +
      "d AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS dl FROM w), " +
      "st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(dl) AS BIGINT) AS sumdl FROM d), " +
      s"q AS (SELECT doc_id AS q_id, list_sort(list_distinct(ws))[1:$QueryLen] AS qs FROM w ORDER BY doc_id LIMIT $NQueries), " +
      "qt AS (SELECT q_id, unnest(qs) AS tok FROM q), " +
      "tk AS (SELECT doc_id, unnest(ws) AS tok FROM w), ")

  private def termBpSql(h: String, dfv: String): String =
    s"(CAST(10000 AS HUGEINT) * (2*st.n - 2*$dfv.df + 1) * 22 * $h.tf * st.sumdl) // " +
      s"(CAST(2*$dfv.df + 1 AS HUGEINT) * (CAST(10 AS HUGEINT)*$h.tf*st.sumdl + 3*st.sumdl + 9*d.dl*st.n))"

  private val rm3Sql =
    (bm25Prologue +
      "hits1 AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk " +
      "WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok), " +
      "dfv1 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM hits1 GROUP BY tok), " +
      "sc1 AS (SELECT qt.q_id, h.doc_id, CAST(SUM(" + termBpSql("h", "dfv1") + ") AS BIGINT) AS score_bp " +
      "FROM hits1 h JOIN dfv1 USING (tok) JOIN qt USING (tok) " +
      "JOIN d ON h.doc_id = d.doc_id CROSS JOIN st GROUP BY qt.q_id, h.doc_id), " +
      "r1 AS (SELECT q_id, doc_id FROM (SELECT q_id, doc_id, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY score_bp DESC, doc_id) AS rk FROM sc1) " +
      s"WHERE rk <= $FbDocs), " +
      "fb AS (SELECT r1.q_id, t.tok, CAST(COUNT(*) AS BIGINT) AS tf " +
      "FROM r1 JOIN tk t ON r1.doc_id = t.doc_id GROUP BY r1.q_id, t.tok), " +
      "fbx AS (SELECT * FROM fb WHERE NOT EXISTS " +
      "(SELECT 1 FROM qt WHERE qt.q_id = fb.q_id AND qt.tok = fb.tok)), " +
      "et AS (SELECT q_id, tok FROM (SELECT q_id, tok, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY tf DESC, tok) AS rk FROM fbx) " +
      s"WHERE rk <= $FbTerms), " +
      s"qt2 AS (SELECT q_id, tok, CAST($WOrig AS BIGINT) AS wt FROM qt " +
      s"UNION ALL SELECT q_id, tok, CAST($WExp AS BIGINT) FROM et), " +
      "hits2 AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk " +
      "WHERE tok IN (SELECT tok FROM qt2) GROUP BY doc_id, tok), " +
      "dfv2 AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM hits2 GROUP BY tok), " +
      "sc2 AS (SELECT qt2.q_id, h.doc_id, CAST(SUM(qt2.wt * CAST(" + termBpSql("h", "dfv2") + " AS BIGINT)) AS BIGINT) AS score_w " +
      "FROM hits2 h JOIN dfv2 USING (tok) JOIN qt2 USING (tok) " +
      "JOIN d ON h.doc_id = d.doc_id CROSS JOIN st GROUP BY qt2.q_id, h.doc_id) " +
      "SELECT q_id, doc_id, score_w, CAST(rk AS INT) AS rank FROM (SELECT q_id, doc_id, score_w, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY score_w DESC, doc_id) AS rk FROM sc2) " +
      s"WHERE rk <= $K ORDER BY q_id, rank")

  /** Oracle for the ANN-leg hybrid gate: DuckDB computes the EXACT
    * fused side (lex + self-excluded exact dense, same RRF integers)
    * reduced to per-query counts, plus TRUE for both bound checks —
    * the [[Similarity.annRecall]] oracle convention. */
  private val hybridAnnSql =
    (bm25Prologue +
      "hits AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk " +
      "WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok), " +
      "dfv AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY tok), " +
      "sc AS (SELECT qt.q_id, h.doc_id, CAST(SUM(" + termBpSql("h", "dfv") + ") AS BIGINT) AS score_bp " +
      "FROM hits h JOIN dfv USING (tok) JOIN qt USING (tok) " +
      "JOIN d ON h.doc_id = d.doc_id CROSS JOIN st GROUP BY qt.q_id, h.doc_id), " +
      "lex AS (SELECT q_id, doc_id, rnk AS lex_rank FROM (SELECT q_id, doc_id, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY score_bp DESC, doc_id) AS rnk FROM sc) " +
      s"WHERE rnk <= $K), " +
      "sims AS (SELECT qe.vec_id AS q_id, c.vec_id AS doc_id, " +
      "list_cosine_similarity(CAST(qe.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])) AS sim " +
      "FROM embeddings qe, embeddings c " +
      "WHERE qe.vec_id IN (SELECT q_id FROM q) AND c.vec_id <> qe.vec_id), " +
      "dn AS (SELECT q_id, doc_id, rnk AS dense_rank FROM (SELECT q_id, doc_id, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY sim DESC, doc_id) AS rnk FROM sims) " +
      s"WHERE rnk <= $K), " +
      "f AS (SELECT COALESCE(lex.q_id, dn.q_id) AS q_id, COALESCE(lex.doc_id, dn.doc_id) AS doc_id, " +
      s"COALESCE($RrfScale // ($RrfC + lex.lex_rank), 0) + COALESCE($RrfScale // ($RrfC + dn.dense_rank), 0) AS rrf " +
      "FROM lex FULL OUTER JOIN dn ON lex.q_id = dn.q_id AND lex.doc_id = dn.doc_id), " +
      "topk AS (SELECT q_id FROM (SELECT q_id, " +
      "row_number() OVER (PARTITION BY q_id ORDER BY rrf DESC, doc_id) AS rnk FROM f) " +
      s"WHERE rnk <= $K) " +
      "SELECT q_id AS query_id, CAST(COUNT(*) AS BIGINT) AS n_topk, " +
      "TRUE AS dense_ok, TRUE AS fused_ok FROM topk GROUP BY q_id ORDER BY query_id")

  private val decontamSql =
    (bm25Prologue +
      "hits AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tk " +
      "WHERE tok IN (SELECT tok FROM qt) GROUP BY doc_id, tok), " +
      "dfv AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY tok), " +
      "sc AS (SELECT qt.q_id, h.doc_id, CAST(SUM(" + termBpSql("h", "dfv") + ") AS BIGINT) AS score_bp " +
      "FROM hits h JOIN dfv USING (tok) JOIN qt USING (tok) " +
      "JOIN d ON h.doc_id = d.doc_id CROSS JOIN st GROUP BY qt.q_id, h.doc_id), " +
      "r AS (SELECT q_id, doc_id, score_bp, CAST(row_number() OVER " +
      "(PARTITION BY q_id ORDER BY score_bp DESC, doc_id) AS INT) AS rank FROM sc) " +
      "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_queries_hit, " +
      "CAST(MIN(rank) AS INT) AS best_rank, MAX(score_bp) AS max_score_bp " +
      s"FROM r WHERE rank <= $DecontamTopM GROUP BY doc_id ORDER BY doc_id")

  val oracles: Map[String, String] = Map(
    "x_text_bm25" -> bm25Sql,
    "x_text_bm25_indexed" -> bm25Sql,
    "x_text_bm25_rm3" -> rm3Sql,
    "x_text_hybrid_rrf" -> hybridSql,
    "x_text_hybrid_rrf_ann" -> hybridAnnSql,
    "x_text_decontam_retrieval" -> decontamSql)
}
