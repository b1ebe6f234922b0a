package graft.operators

import graft.core.Tables.t
import graft.operators.TextAnalysis.tokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-level statistics and batch-assembly operators for a
  * training-data pipeline (driver north star; the reference's closest
  * analogs are its groupby/agg tables, e.g.
  * /root/reference/PharmacoDI/build_meta_tables.py:24-60) — the steps
  * between a cleaned document set and a tokenized training run:
  * vocabulary building, rarity weighting, sequence packing, and
  * per-group exemplar selection.
  *
  * Scale shapes: everything is explode → partial-aggregated groupBy or
  * a single window, no quadratic stage anywhere. Top-k outputs go
  * through `orderBy(...).limit(k)` which Spark plans as
  * TakeOrderedAndProject — per-partition heaps + a k-row driver merge,
  * never a full sort shuffle.
  */
object Corpus {

  type Q = (SparkSession, String) => DataFrame

  /** Vocabulary top-k: corpus-wide token occurrence and document
    * frequency, top 100 tokens by occurrence (token asc tiebreak for a
    * total order). The groupBy partial-aggregates map-side, so the
    * shuffle carries one row per distinct (doc, token) for the df leg —
    * at 100 TB this is the standard first pass of any tokenizer/vocab
    * build. */
  val vocabTopK: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      .groupBy("tok")
      .agg(count(lit(1)).as("n_occ"),
        count_distinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occ").desc, col("tok"))
      .limit(100)

  /** Vocabulary coverage curve — the tokenizer-sizing question "how
    * many vocabulary entries cover p% of all token occurrences?"
    * answered for p in {50, 90, 95, 99}: per threshold, the minimal
    * vocab size (tokens taken in count-desc, token-asc order) and the
    * occurrences it covers. All-integer comparisons (`cum*100 >=
    * total*p`) so the crossing points are engine-exact.
    *
    * Scale shape: the vocabulary is aggregated with map-side combine,
    * then ranked by [[graft.core.Cumsum.globalCumsum]] — the two-phase
    * distributed running total (range-partitioned sort + per-partition
    * offsets), NEVER a single-partition global window, so the curve
    * computes at any vocab size; the corpus total is a broadcast
    * single-row aggregate and all four thresholds fold into ONE
    * conditional-aggregation pass over the cumsum frame. */
  val vocabCoverage: Q = (s, dir) =>
    coverageCurve(t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("n_occ")))

  /** DataFrame core of [[vocabCoverage]]: input is a (tok, n_occ)
    * vocabulary table. */
  def coverageCurve(vocab: DataFrame,
      pcts: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    val cum = graft.core.Cumsum.globalCumsum(vocab,
      Seq(col("n_occ").desc, col("tok")), col("n_occ"), "cum")
    val tot = vocab.agg(sum("n_occ").cast("long").as("total"))
    val aggs = pcts.flatMap { p =>
      Seq(
        (sum(when(col("cum") * 100 < col("total") * p, 1L).otherwise(0L)) + 1L)
          .as(s"__v$p"),
        min(when(col("cum") * 100 >= col("total") * p, col("cum")))
          .as(s"__c$p"))
    }
    val one = cum.crossJoin(broadcast(tot)).agg(aggs.head, aggs.tail: _*)
    val rows = pcts.map { p =>
      struct(lit(p.toLong).as("pct"), col(s"__v$p").as("vocab_size"),
        col(s"__c$p").as("covered_occ"))
    }
    one.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
      .orderBy("pct")
  }

  /** TF-IDF-style rarity weighting, kept engine-portable: tf and df are
    * exact longs; `tf_idf = (tf / n_tokens) * (n_total / df)` is two
    * IEEE divisions and one multiply evaluated in the same order in
    * both engines (a log-idf would hang the oracle on libm rounding —
    * documented deviation; the ranking is monotone-equivalent for
    * fixed tf). The corpus size joins in as a broadcast single-row
    * aggregate, so the per-(doc,token) side shuffles once for tf and
    * once for the token-keyed df join — both key-partitioned, no
    * driver-side state. */
  val tfIdf: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val tf = graft.core.Fanout.bySize(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_tokens"),
        explode(col("ws")).as("tok"))
      .groupBy("doc_id", "n_tokens", "tok")
      .agg(count(lit(1)).as("tf"))
    // df is one row per distinct token — a vocabulary, which is tiny
    // next to the corpus (millions of rows vs billions of documents):
    // broadcast it so the per-(doc,token) side never reshuffles by
    // token. The shuffle-join fallback (drop the hint) is the escape
    // hatch for open vocabularies that outgrow the broadcast budget;
    // hot tokens ("the") are safe either way because the df groupBy
    // partial-aggregates map-side.
    val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_total"))
    tf.join(broadcast(df), Seq("tok"))
      .crossJoin(broadcast(n))
      .select(col("doc_id"), col("tok"), col("tf"), col("df"),
        ((col("tf") / col("n_tokens")) * (col("n_total") / col("df")))
          .as("tf_idf"))
      .orderBy("doc_id", "tok")
  }

  /** Context-window budget per packed chunk. */
  val PackBudget = 4096L

  /** Sequence packing: assign documents (in doc_id order, per source)
    * to training chunks by cumulative token budget —
    * `chunk_id = floor(tokens_before_this_doc / 4096)` — then account
    * each chunk. One window per source computes the running sum; the
    * follow-up groupBy partial-aggregates. All arithmetic is exact
    * longs below 2^53, so the double-division floor is bit-portable.
    *
    * At 100 TB a single window partition per source is the documented
    * ceiling (a source is processed by one task); the scalable variant
    * is the two-pass per-partition-offset scheme already implemented in
    * [[graft.core.Ids.denseIdScalable]] — same fold, coarser unit. */
  val packSequences: Q = (s, dir) => {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum("n_tokens").over(w))
      .withColumn("chunk_id",
        floor((col("cum") - col("n_tokens")) / lit(PackBudget)))
      .groupBy("source", "chunk_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("chunk_tokens"))
      .orderBy("source", "chunk_id")
  }

  /** Per-group top-k exemplars: the 3 longest documents of each source
    * (deterministic doc_id tiebreak) via a ranked window — the
    * "show me what a source looks like" selection step. The window
    * shuffles by source once; for large k-per-group workloads the
    * map-side-heap alternative is [[graft.functions.TopK]] (used by
    * cosine top-k), which caps shuffle volume at k rows per partition
    * per group. */
  val groupTopK: Q = (s, dir) => {
    val w = Window.partitionBy("source")
      .orderBy(col("n_tokens").desc, col("doc_id"))
    t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(tokens(col("text"))).as("n_tokens"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .orderBy("source", "rk")
  }

  /** Corpus-statistic gate: keep documents at or above the exact 20th
    * percentile of token count — the "drop the shortest tail" quality
    * filter, expressed as aggregate-to-scalar → broadcast → filter so
    * the corpus scans once and never shuffles. percentile_disc picks an
    * ACTUAL element (portable across engines, unlike interpolated
    * percentiles); at 100 TB the exact single-group buffer is the
    * oracle's price — the production twin swaps in approx_percentile's
    * fixed-size sketch, same plan shape (see
    * [[Sampling.statsApproxQuantiles]]). */
  val qualityGate: Q = (s, dir) => {
    val scored = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).as("n_tokens"))
    val thr = scored.agg(
      expr("percentile_disc(0.2) WITHIN GROUP (ORDER BY n_tokens)").as("thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("n_tokens") >= col("thr"))
      .orderBy("doc_id")
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection
    * via Importance Resampling" — arXiv:2302.03169): score every raw
    * document by how much its hashed-n-gram profile looks like a small
    * TARGET domain versus the raw corpus, then keep the top quantile.
    * The published method weights by log p_target(x) - log p_raw(x)
    * under bag-of-bigrams models; logs are not engine-portable, so the
    * affinity here is the difference of SMOOTHED INTEGER per-mille-mille
    * rates — `(cnt+1) * 1e6 div (total + V)` per bigram, summed over the
    * document with multiplicity. Monotone in the same direction,
    * bit-exact on every engine and shuffle order. Out-of-vocabulary
    * bigrams (unseen in the target) contribute 0 by construction —
    * the vocabulary IS the target's observed bigram set.
    *
    * Scale shape (the reason DSIR works at 100 TB): the target domain
    * is small by definition (an eval set, a curated corpus), so its
    * bigram profile is vocabulary-sized and BROADCASTS; the raw corpus
    * is touched twice — once to count vocab-bigram occurrences
    * (semi-join against the broadcast vocab BEFORE the groupBy, so the
    * count shuffle carries only vocab grams) and once to score docs
    * (broadcast affinity join + one partial-aggregated groupBy on
    * doc_id). No shuffle ever carries the full raw bigram space.
    * Overflow headroom: `(cnt+1) * 1e6` stays under 2^63 to ~9e12
    * occurrences of one bigram in either domain. */
  def importanceWeights(docs: DataFrame, isTarget: Column,
      scale: Long = 1000000L): DataFrame = {
    val g = graft.core.Fanout.bySize(docs, col("doc_id"))
      .select(col("doc_id"), isTarget.as("__tgt"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2)
      .select(col("doc_id"), col("__tgt"), explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("w1"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("__tgt"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
    // both count tables are vocabulary-sized and feed 2-3 consumers
    // each (semi-join, totals, affinity) — pin them so the corpus
    // explode behind them runs once per domain, not once per consumer
    val tg = graft.core.Materialize.pin(g.filter(col("__tgt"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_t")))
    val rg = graft.core.Materialize.pin(g.filter(!col("__tgt"))
      .join(broadcast(tg.select("w1", "w2")), Seq("w1", "w2"), "left_semi")
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_r")))
    val tots = tg.agg(sum("c_t").as("tt"), count(lit(1)).as("v"))
      .crossJoin(rg.agg(coalesce(sum("c_r"), lit(0L)).as("tr")))
    val aff = tg.join(rg, Seq("w1", "w2"), "left")
      .crossJoin(broadcast(tots))
      .select(col("w1"), col("w2"),
        (expr(s"((c_t + 1) * ${scale}L) div (tt + v)") -
          expr(s"((coalesce(c_r, 0L) + 1) * ${scale}L) div (tr + v)")).as("a"))
    val ds = g.join(broadcast(aff), Seq("w1", "w2"))
      .groupBy("doc_id").agg(sum("a").as("score"))
    docs.select("doc_id").join(ds, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Gate: importance-resample toward the `src0` domain — per-doc
    * integer affinity score plus the keep verdict at the exact 80th
    * percentile threshold (same aggregate-to-scalar → broadcast →
    * filter shape as [[qualityGate]]; ties at the threshold all keep,
    * so the verdict needs no ordering). */
  val importanceGate: Q = (s, dir) => {
    // pin: the scored frame feeds both the threshold aggregate and the
    // verdict rows — without it Spark re-runs the whole scoring DAG
    // (two corpus scans + three joins) once per consumer
    val sc = graft.core.Materialize.pin(
      importanceWeights(t(s, dir, "documents"), col("source") === "src0"))
    val thr = sc.agg(
      expr("percentile_disc(0.8) WITHIN GROUP (ORDER BY score)").as("thr"))
    sc.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("score"), (col("score") >= col("thr")).as("keep"))
  }

  /** Dataset-mix rebalancing: deterministically down-sample each
    * source toward an equal-share token target. Per source, the keep
    * fraction is `min(1, target / source_tokens)` with
    * `target = total_tokens / n_sources`; docs are kept by the
    * engine-portable md5 hash score ([[Sampling.hashScore]]) so the
    * SAME docs survive on every rerun, engine, and cluster size — the
    * property that makes ablations comparable. Output is the
    * post-sample per-source accounting (docs, tokens, applied
    * fraction).
    *
    * Scale shape: the mix table (one row per source) is a broadcast;
    * the keep decision is a per-row filter fused into the scan —
    * the corpus shuffles only for the final per-source accounting. */
  val mixRebalance: Q = (s, dir) => {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    // source-level token totals: a |sources|-row table consumed twice
    // (the target scalar and the per-source fraction) — pin so the
    // corpus aggregation under it runs once
    val bySource = graft.core.Materialize.pin(
      d.groupBy("source").agg(sum("n_tokens").as("src_tokens")))
    val target = bySource.agg(
      (sum("src_tokens").cast("double") / count(lit(1)).cast("double")).as("target"))
    val frac = bySource.crossJoin(broadcast(target))
      .select(col("source"),
        least(lit(1.0), col("target") / col("src_tokens").cast("double")).as("frac"))
    d.join(broadcast(frac), Seq("source"))
      .filter(Sampling.hashScore(col("doc_id")) < col("frac"))
      .groupBy("source", "frac")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .select("source", "n_docs", "n_tokens", "frac")
      .orderBy("source")
  }

  /** Temperature-flattened source mixing (alpha = 0.5): per-source
    * keep fraction `sqrt(min_tokens / src_tokens)` — the smallest
    * source keeps everything, larger sources are downsampled toward
    * (but not all the way to) uniform, the standard temperature
    * trade between respecting natural proportions (alpha=1, no-op)
    * and uniform ([[mixRebalance]]'s full flattening). sqrt and a
    * single long/long division are both IEEE correctly-rounded single
    * ops, so the fractions — and therefore the exact kept set under
    * the deterministic hash filter — are bit-identical on any engine.
    * Scale shape: mirror of mixRebalance — the fraction table is
    * |sources|-rows, broadcast into a scan-fused filter; the corpus
    * never shuffles before the final per-source rollup. */
  val temperatureMix: Q = (s, dir) => {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(tokens(col("text"))).cast("long").as("n_tokens"))
    val bySource = graft.core.Materialize.pin(
      d.groupBy("source").agg(sum("n_tokens").as("src_tokens")))
    val minTok = bySource.agg(min("src_tokens").as("min_tokens"))
    val frac = bySource.crossJoin(broadcast(minTok))
      .select(col("source"),
        sqrt(col("min_tokens").cast("double") /
          col("src_tokens").cast("double")).as("frac"))
    d.join(broadcast(frac), Seq("source"))
      .filter(Sampling.hashScore(col("doc_id")) < col("frac"))
      .groupBy("source", "frac")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .select("source", "n_docs", "n_tokens", "frac")
      .orderBy("source")
  }

  /** Context-window chunking with overlap: split every document into
    * word windows of 64 tokens at stride 32 (final partial window
    * kept), emitting per-chunk bounds and sizes — the
    * long-document-to-training-sample step. Chunks are derived
    * per-row from the token array (explode over a sequence of
    * offsets); no shuffle except the oracle ORDER BY. */
  val chunkSliding: Q = (s, dir) => {
    val win = 64
    val stride = 32
    t(s, dir, "documents")
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), size(col("ws")).as("n_tokens"),
        explode(sequence(lit(0),
          greatest(ceil((size(col("ws")) - win).cast("double") / stride), lit(0))
            .cast("int"))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("chunk_start"),
        least(col("chunk_idx") * stride + win, col("n_tokens")).as("chunk_end"))
      .withColumn("chunk_tokens", col("chunk_end") - col("chunk_start"))
      .filter(col("chunk_tokens") > 0)
      .orderBy("doc_id", "chunk_idx")
  }

  /** BPE-style merge statistics — the counting pass of one
    * byte-pair-encoding training step: weight each distinct word by
    * its corpus occurrence count, split it into characters, and rank
    * adjacent character pairs by weighted frequency (the top pair is
    * what a BPE trainer would merge next). The heavy lifting runs on
    * the VOCABULARY (distinct words — shrinks with Heaps' law), not
    * the corpus: the corpus contributes only the word-count
    * aggregation, so a 100 TB corpus costs one token groupBy plus
    * character work proportional to |vocab|. Top-k via
    * TakeOrderedAndProject as everywhere else. */
  val bpePairs: Q = (s, dir) => {
    val words = t(s, dir, "documents")
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    words.filter(length(col("w")) >= 2)
      .select(col("n_w"), explode(expr(
        "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")).as("pair"))
      .groupBy("pair").agg(sum("n_w").as("n_pair"))
      .orderBy(col("n_pair").desc, col("pair"))
      .limit(20)
  }

  /** Leakage-safe train/eval split: assign each document a split by
    * the deterministic hash of its NEAR-DUP CLUSTER canonical id, not
    * its own id — near-duplicates land in the same split by
    * construction, so the eval set can never contain a near-copy of a
    * training document (the classic contamination-by-duplication
    * failure a doc-id hash split silently allows). Docs in no cluster
    * hash on their own id: a singleton IS its cluster. Scale shape:
    * the cluster map is pair-participant-sized — tiny next to the
    * corpus — so it BROADCASTS into a left join and the split is one
    * more projection on the corpus scan; no corpus shuffle at all. */
  /** CALLER CAVEAT: split-safety is only as good as the `clusters`
    * map — build it with [[Dedup.minhashLsh]] for the linear-candidate
    * scale path (empirical LSH recall: a borderline-Jaccard pair near
    * the band knee can be missed, silently placing near-dups across
    * splits) or with [[splitSafeExact]] / [[Dedup.jaccardPairs]] when
    * the corpus sits near the threshold and exactness is worth the
    * quadratic-per-shingle cost. */
  def splitSafe(docs: DataFrame, clusters: DataFrame,
      evalFrac: Double): DataFrame =
    docs.join(broadcast(clusters), Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("canonical_id"), col("doc_id")))
      .select(col("doc_id"), col("group_id"),
        when(Sampling.hashScore(col("group_id")) < evalFrac, "eval")
          .otherwise("train").as("split"))

  /** Exact-pairs escape hatch for [[splitSafe]]: clusters from the
    * EXACT Jaccard pairs, so split-safety is guaranteed (not
    * empirical-LSH-recall) — for corpora whose near-dup similarity
    * sits near the LSH band knee. Rides
    * [[Dedup.jaccardPairsPrefix]] (PPJoin prefix filtering):
    * output-identical to the plain inverted-index join but tractable
    * on boilerplate-heavy corpora, so exactness no longer costs the
    * posting-list² runaway. `maxDf` switches to the capped
    * [[Dedup.jaccardPairs]] form (a deliberately DIFFERENT measure:
    * boilerplate stops voting for similarity). */
  def splitSafeExact(docs: DataFrame, minJaccard: Double, evalFrac: Double,
      maxDf: Option[Long] = None): DataFrame =
    splitSafe(docs,
      Dedup.canonicalClusters(maxDf match {
        case None => Dedup.jaccardPairsPrefix(
          Dedup.shingles(docs.select("doc_id", "text")), minJaccard)
        case some => Dedup.jaccardPairs(
          Dedup.shingles(docs.select("doc_id", "text")), minJaccard, some)
      }),
      evalFrac)

  /** Iterative BPE merge training (Sennrich et al. 2016 — the public
    * algorithm behind most production tokenizers): starting from
    * per-character symbol sequences over the corpus WORD COUNTS, each
    * round counts adjacent symbol pairs weighted by word frequency,
    * picks the most frequent pair (count desc, then pair asc for a
    * total order), and greedily merges its non-overlapping occurrences
    * left-to-right in every word. Returns the merge table
    * (rank, left, right, count) — the artifact a tokenizer ships.
    *
    * Scale shape: the corpus is touched ONCE (word-count aggregation,
    * map-combined); every round after that runs over the VOCABULARY
    * table (distinct words — orders of magnitude smaller than the
    * corpus, Zipf guarantees it), with the pair scan a codegen'd
    * higher-order-function projection, the top-1 a
    * TakeOrderedAndProject, and the merge a fold (`aggregate`) over
    * each word's symbol array. One driver-held row per round — the
    * merge decision — is the only thing collected; the vocabulary is
    * re-pinned per round so lineage stays flat (same loop discipline
    * as canonicalClusters). nMerges rounds = nMerges jobs, each
    * vocabulary-sized: this is why BPE training at corpus scale is a
    * word-count problem, not a corpus problem. */
  def bpeMerges(docs: DataFrame, nMerges: Int): Seq[(Int, String, String, Long)] = {
    var vocab = graft.core.Materialize.pin(
      docs.select(explode(tokens(col("text"))).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n_w"))
        .select(col("n_w"),
          expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))")
            .as("syms")))
    val merges = scala.collection.mutable.ListBuffer.empty[(Int, String, String, Long)]
    for (rank <- 1 to nMerges) {
      val top = vocab
        // fully-merged single-symbol words have no pairs — and Spark's
        // sequence(1, 0) counts DOWN, so they must be filtered before
        // the pair explode, not left to produce an empty sequence
        .filter(size(col("syms")) >= 2)
        .select(col("n_w"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n_w").as("n_pair"))
        .orderBy(col("n_pair").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) return merges.toList
      val (l, r, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
      merges += ((rank, l, r, n))
      // greedy left-to-right non-overlapping merge: fold each word's
      // symbol array; a pair match replaces the accumulator tail
      val lq = l.replace("\\", "\\\\").replace("'", "\\'")
      val rq = r.replace("\\", "\\\\").replace("'", "\\'")
      val next = vocab.select(col("n_w"), expr(
        "aggregate(syms, CAST(array() AS ARRAY<STRING>), (acc, x) -> " +
          s"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = '$lq' AND x = '$rq' " +
          s"THEN concat(slice(acc, 1, size(acc) - 1), array('$lq$rq')) " +
          "ELSE concat(acc, array(x)) END)").as("syms"))
      val pinned = graft.core.Materialize.pin(next)
      org.apache.spark.sql.classic.GraftColumnBridge.unpersistCheckpoint(vocab)
      vocab = pinned
    }
    org.apache.spark.sql.classic.GraftColumnBridge.unpersistCheckpoint(vocab)
    merges.toList
  }

  /** Fixed ordered merge table for [[bpeEncodeWords]]' gate row — in
    * production this is the artifact [[bpeMerges]] trains once and the
    * encoder ships forever after (a tokenizer IS its merge list);
    * hardcoding a table keeps the gate row a pure function of the
    * data, identically expressible in the DuckDB oracle. Later merges
    * consume earlier merges' outputs (e+r → er, then or+d → ord, then
    * ord+er → order), so the chain exercises real multi-level BPE. */
  val DefaultMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "e" -> "r",
    "o" -> "r", "or" -> "d", "ord" -> "er", "s" -> "c", "sc" -> "an",
    "a" -> "t", "o" -> "u", "r" -> "ow", "ro" -> "w")

  /** BPE ENCODING — the production side of [[bpeMerges]]: apply an
    * ordered merge table to a word table. Each word is spelled as
    * brace-delimited symbols (`scan` → `{s}{c}{a}{n}`), then every
    * merge rewrites ALL its adjacent occurrences left-to-right
    * non-overlapping (one literal `replace` per merge — codegen'd
    * string ops, no UDF, no loop state). The full-token delimiters are
    * what make a flat string replace SAFE: a pattern `{a}{b}` can only
    * match a whole symbol followed by a whole symbol, never a symbol
    * boundary mid-token (undelimited `a b` matching the tail of token
    * `ba` was the failure this encoding exists to prevent). Words must
    * be `[a-z0-9]*` (the declared pretokenizer normalization) so the
    * braces can never collide with content.
    *
    * Scale shape: encoding depends only on the WORD, so run it on the
    * vocabulary (Heaps' law: orders of magnitude smaller than the
    * corpus) and broadcast the result back onto word occurrences —
    * the corpus itself is never touched by the merge chain. At 100 TB
    * that turns tokenization from a per-occurrence regex pipeline into
    * one tiny-table projection plus a broadcast hash join.
    *
    * Returns (w, toks ARRAY<STRING>, n_toks INT); `concat_ws("",
    * toks) == w` by construction — merges only ever concatenate. */
  def bpeEncodeWords(words: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    // the delimiter safety argument requires brace-free words; a caller
    // skipping the declared normalization would get silently corrupt
    // tokens, so the precondition fails loudly instead (one cheap rlike
    // per VOCAB row, not per occurrence)
    val guarded = when(col("w").rlike("[{}]"),
      raise_error(concat(lit("bpeEncodeWords: word contains a brace "),
        lit("delimiter — normalize to [a-z0-9]* first: "), col("w"))))
      .otherwise(col("w"))
    val spelled = regexp_replace(guarded, "(.)", "{$1}")
    val enc = merges.foldLeft(spelled) { case (c, (l, r)) =>
      org.apache.spark.sql.functions.replace(
        c, lit(s"{$l}{$r}"), lit(s"{$l$r}"))
    }
    words.withColumn("__enc", enc)
      .withColumn("toks",
        split(regexp_replace(col("__enc"), "^\\{|\\}$", ""), "\\}\\{"))
      .withColumn("n_toks",
        (length(col("__enc")) -
          length(org.apache.spark.sql.functions.replace(
            col("__enc"), lit("{"), lit("")))).cast("int"))
      .drop("__enc")
  }

  /** Gate row: tokenize `documents` with [[DefaultMerges]] and emit
    * per-doc BPE token / word / char totals. The encode chain runs on
    * the distinct vocabulary only; `n_chars` rides along as the
    * conservation check (tokens partition each word's characters). */
  val bpeEncodeGate: Q = (s, dir) => {
    val occ = graft.core.Fanout.bySize(t(s, dir, "documents"), col("doc_id"))
      .select(col("doc_id"), explode(tokens(col("text"))).as("w0"))
      .select(col("doc_id"),
        regexp_replace(lower(col("w0")), "[^a-z0-9]", "").as("w"))
      .filter(col("w") =!= "")
      .groupBy("doc_id", "w").agg(count(lit(1)).as("n_occ"))
    val enc = bpeEncodeWords(occ.select("w").distinct(), DefaultMerges)
      .select(col("w"), col("n_toks"))
    occ.join(broadcast(enc), Seq("w"))
      .groupBy("doc_id")
      .agg(sum(col("n_occ") * col("n_toks")).as("n_bpe_tokens"),
        sum("n_occ").as("n_words"),
        sum(col("n_occ") * length(col("w"))).as("n_chars"))
      .orderBy("doc_id")
  }

  /** Tokenizer FERTILITY profile: BPE tokens per word, per source —
    * the standard tokenizer-evaluation metric (a tokenizer trained on
    * one distribution fragments text from another into more pieces;
    * fertility per source/language is how that cost is budgeted before
    * training). Integer basis points (`tokens * 10000 div words`) so
    * the profile hashes portably. Same vocabulary-hoisted shape as
    * [[bpeEncodeGate]]: the merge chain runs on distinct words only
    * and broadcasts back; the corpus contributes one scan. */
  val bpeFertilityGate: Q = (s, dir) => {
    val occ = graft.core.Fanout.bySize(t(s, dir, "documents"), col("doc_id"))
      .select(col("source"), explode(tokens(col("text"))).as("w0"))
      .select(col("source"),
        regexp_replace(lower(col("w0")), "[^a-z0-9]", "").as("w"))
      .filter(col("w") =!= "")
      .groupBy("source", "w").agg(count(lit(1)).as("n_occ"))
    val enc = bpeEncodeWords(occ.select("w").distinct(), DefaultMerges)
      .select(col("w"), col("n_toks"))
    occ.join(broadcast(enc), Seq("w"))
      .groupBy("source")
      .agg(sum(col("n_occ") * col("n_toks")).as("n_bpe_tokens"),
        sum("n_occ").as("n_words"))
      .select(col("source"), col("n_bpe_tokens"), col("n_words"),
        expr("n_bpe_tokens * 10000 div n_words").as("fertility_bp"))
      .orderBy("source")
  }

  /** Out-of-vocabulary profile: coverage of each source's token mass
    * by the corpus-wide top-`k` vocabulary — the first question a
    * tokenizer budget decision asks (how much of each source would
    * fall to byte-fallback/UNK at this vocab size). Integer basis
    * points so the row hashes portably.
    *
    * Scale shape: ONE explode feeds a (source, token) pre-aggregation
    * (map-side combined — the shuffle carries distinct pairs, not
    * occurrences), pinned once for its two consumers; the vocab is a
    * heap top-k (TakeOrderedAndProject) of a tiny per-token rollup and
    * BROADCASTS back into the coverage join. No second corpus scan,
    * no window. */
  def oovProfile(docs: DataFrame, vocabSize: Int): DataFrame = {
    val bySrcTok = graft.core.Materialize.pin(
      docs.select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy("source", "tok").agg(count(lit(1)).as("n")))
    val vocab = bySrcTok.groupBy("tok").agg(sum("n").as("n_occ"))
      .orderBy(col("n_occ").desc, col("tok")).limit(vocabSize)
      .select(col("tok"), lit(1).as("__in"))
    bySrcTok.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy("source")
      .agg(sum("n").as("n_tokens"),
        sum(when(col("__in").isNotNull, col("n")).otherwise(0L)).as("n_in_vocab"))
      .select(col("source"), col("n_tokens"), col("n_in_vocab"),
        expr("(n_tokens - n_in_vocab) * 10000 div n_tokens").as("oov_bp"))
      .orderBy("source")
  }

  val oovRate: Q = (s, dir) =>
    oovProfile(t(s, dir, "documents"), vocabSize = 500)

  /** Length-bucket packing profile: bucket documents by token count
    * (width-64 bins capped at the 512-token training budget) and
    * report per-bucket padding and truncation mass — the numbers a
    * batch-assembly strategy (pad-to-bucket vs pack) is chosen from.
    * waste_bp = padded-slot fraction lost to padding, in integer
    * basis points. One codegen'd projection + one map-combined
    * groupBy over 8 buckets; nothing shuffles but 8 rows. */
  def lengthBucketProfile(docs: DataFrame): DataFrame =
    docs
      .select(size(tokens(col("text"))).cast("long").as("n_tok"))
      .select(least(expr("n_tok div 64"), lit(7L)).as("bucket"), col("n_tok"))
      .withColumn("cap", (col("bucket") + 1) * 64)
      .groupBy("bucket", "cap")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tok").as("sum_tokens"),
        sum(greatest(col("cap") - col("n_tok"), lit(0L))).as("sum_padding"),
        sum(greatest(col("n_tok") - col("cap"), lit(0L))).as("sum_truncated"))
      .select(col("bucket"), col("cap"), col("n_docs"), col("sum_tokens"),
        col("sum_padding"), col("sum_truncated"),
        expr("sum_padding * 10000 div (n_docs * cap)").as("waste_bp"))
      .orderBy("bucket")

  val lengthBuckets: Q = (s, dir) => lengthBucketProfile(t(s, dir, "documents"))

  /** Source-mix drift between two corpus snapshots (deterministic
    * halves by doc_id parity stand in for version N vs N+1): per
    * source, both doc counts, each half's share of its snapshot in
    * integer basis points, and the absolute share delta — the
    * monitoring row a data-pipeline regression gate alerts on (a
    * source silently doubling its share of the mix). One map-combined
    * groupBy; snapshot totals broadcast back. */
  def driftProfile(docs: DataFrame, inSnapshotA: Column): DataFrame = {
    val per = docs
      .select(col("source"), inSnapshotA.as("__a"))
      .groupBy("source")
      .agg(sum(when(col("__a"), 1L).otherwise(0L)).as("n_a"),
        sum(when(!col("__a"), 1L).otherwise(0L)).as("n_b"))
    val tot = per.agg(sum("n_a").as("__ta"), sum("n_b").as("__tb"))
    // an EMPTY snapshot (every doc on one side) would integer-divide
    // by zero — silent NULLs here, an error in the DuckDB twin; define
    // a share of an empty snapshot as 0 (the funnelSteps convention)
    val shareA = when(col("__ta") > 0, expr("n_a * 10000 div __ta"))
      .otherwise(lit(0L))
    val shareB = when(col("__tb") > 0, expr("n_b * 10000 div __tb"))
      .otherwise(lit(0L))
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_a"), col("n_b"),
        shareA.as("share_a_bp"), shareB.as("share_b_bp"),
        abs(shareA - shareB).as("drift_bp"))
      .orderBy("source")
  }

  val sourceDrift: Q = (s, dir) =>
    driftProfile(t(s, dir, "documents"), col("doc_id") % 2 === 0)

  /** Three-way leakage-safe split: same cluster-hash discipline as
    * [[splitSafe]] with two thresholds — test < testFrac <= val <
    * testFrac+valFrac <= train — so near-duplicates land in the SAME
    * one of the three splits (eval contamination via val->train
    * near-dups is the same failure as the two-way case). */
  def splitSafe3(docs: DataFrame, clusters: DataFrame, testFrac: Double,
      valFrac: Double): DataFrame =
    docs.join(broadcast(clusters), Seq("doc_id"), "left")
      .withColumn("group_id", coalesce(col("canonical_id"), col("doc_id")))
      .select(col("doc_id"), col("group_id"),
        when(Sampling.hashScore(col("group_id")) < testFrac, "test")
          .when(Sampling.hashScore(col("group_id")) < testFrac + valFrac, "val")
          .otherwise("train").as("split"))

  val splitSafe3Gate: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val clusters = Dedup.canonicalClusters(
      Dedup.minhashLsh(docs.select("doc_id", "text"), 0.5))
    splitSafe3(docs, clusters, 0.10, 0.10).orderBy("doc_id")
  }

  /** Gate query: 10% eval split over the verified 0.5-Jaccard cluster
    * map (same clusters the x_dedup_clusters oracle checks). Pair
    * generation is [[Dedup.minhashLsh]] — the linear-candidate 100 TB
    * path, output-identical to exact pairs on the gate corpora (their
    * clusters sit at ~0.87 Jaccard, far above the 8x4 band knee; the
    * same empirical-recall caveat as [[Curation.curate]] applies to
    * borderline-Jaccard corpora). */
  val splitSafeGate: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val clusters = Dedup.canonicalClusters(
      Dedup.minhashLsh(docs.select("doc_id", "text"), 0.5))
    splitSafe(docs, clusters, 0.10).orderBy("doc_id")
  }

  /** Trigram language-model profile: for every bigram context
    * (w1, w2), the top-`k` next tokens by occurrence with the
    * context's total count and an integer-bp conditional probability —
    * the n-gram LM table a data pipeline builds for perplexity-ish
    * quality filters, decontamination heuristics, and synthetic-text
    * detection (repeated high-p continuations).
    *
    * Scale shape: trigram explode → one map-combined groupBy on
    * (w1, w2, w3) — the only corpus-sized shuffle, carrying one row
    * per DISTINCT trigram — then a window over the (w1, w2) context
    * (group size <= vocab, never corpus-sized) for rank and context
    * total. Integer counts and floor-division bp are bit-portable.
    * Tiebreak (n desc, w3 asc) totals the order. */
  def ngramLm(docs: DataFrame, k: Int = 3): DataFrame = {
    val tri = graft.core.Fanout.bySize(docs, col("doc_id"))
      .select(tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> " +
          "struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2, " +
          "element_at(ws, i + 2) AS w3))")).as("t"))
      .select("t.w1", "t.w2", "t.w3")
      .groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n"))
    val ctx = Window.partitionBy("w1", "w2")
    tri
      .withColumn("ctx_n", sum("n").over(ctx))
      .withColumn("rank", row_number().over(
        ctx.orderBy(col("n").desc, col("w3"))))
      .filter(col("rank") <= k)
      .select(col("w1"), col("w2"), col("w3"), col("n"), col("ctx_n"),
        expr("(n * 10000) div ctx_n").as("p_bp"), col("rank"))
  }

  val ngramLmGate: Q = (s, dir) =>
    ngramLm(t(s, dir, "documents"), 3).orderBy("w1", "w2", "rank")

  /** Per-source token-diversity profile: Simpson concentration
    * (sum p_i^2, the collision probability of two random tokens) and
    * the top token's share, both as integer basis points — the cheap
    * scalar signals that flag template-generated or boilerplate-heavy
    * sources before any pairwise dedup runs (a source whose
    * simpson_bp spikes is dominated by few token types).
    *
    * Arithmetic is decimal(38,0) end-to-end — sum(tf^2) over a
    * 100 TB source overflows int64 (N > ~3e9 tokens), decimal38 holds
    * to N ~ 1e17 — with ONE floor division to bp at the end, so the
    * outputs are exact integers, bit-portable across engines.
    *
    * Scale shape: one map-combined groupBy (source, token) — the only
    * corpus-sized shuffle — then a |sources|-row aggregate. */
  def diversityProfile(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(col("source"), explode(tokens(col("text"))).as("w"))
      .groupBy("source", "w").agg(count(lit(1)).cast(DecimalType(38, 0)).as("tf"))
    tf.groupBy("source")
      .agg(sum("tf").as("n"), sum(col("tf") * col("tf")).as("s2"),
        max("tf").as("maxtf"))
      .select(col("source"), col("n").cast("long").as("n_tokens"),
        expr("CAST((s2 * 10000) DIV (n * n) AS BIGINT)").as("simpson_bp"),
        expr("CAST((maxtf * 10000) DIV n AS BIGINT)").as("top_share_bp"))
  }

  val diversityGate: Q = (s, dir) =>
    diversityProfile(t(s, dir, "documents")).orderBy("source")

  /** Per-document LM-familiarity score: each doc's trigrams are scored
    * with the CORPUS trigram LM's integer-bp conditional probability
    * p(w3 | w1 w2) and averaged — the perplexity-proxy quality filter
    * of CCNet-style curation (Wenzek et al. 2020): low lm_bp = the
    * doc's continuations are rare given their contexts (noise, OCR
    * garbage, wrong language); suspiciously high lm_bp = templated /
    * machine-repeated text. Kept in integer basis points (floor
    * division at each step) so the score is bit-portable — a true
    * log-perplexity would not hash-match across engines.
    *
    * Scale shape: trigram explode is pinned once and feeds both the LM
    * aggregation (one map-combined groupBy on the distinct-trigram
    * key — vocabulary-sized, not corpus-sized) and the scoring join
    * (shuffles on the trigram key, then partial-aggregates per doc).
    * At 100 TB the LM table takes a df floor (drop hapax trigrams) and
    * usually fits broadcast, turning the scoring join map-side; the
    * uncapped form here IS the oracle shape. Docs under 3 tokens have
    * no trigrams and are excluded (documented contract, matches the
    * [[ngramLm]] filter). */
  def lmScore(docs: DataFrame): DataFrame = {
    val tri = graft.core.Materialize.pin(
      graft.core.Fanout.bySize(docs, col("doc_id"))
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(ws) - 2), i -> " +
          "struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2, " +
          "element_at(ws, i + 2) AS w3))")).as("t"))
      .select(col("doc_id"), col("t.w1"), col("t.w2"), col("t.w3")))
    val lm = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("n"))
      .withColumn("ctx_n", sum("n").over(Window.partitionBy("w1", "w2")))
      .withColumn("p_bp", expr("(n * 10000) div ctx_n"))
      .select("w1", "w2", "w3", "p_bp")
    tri.join(lm, Seq("w1", "w2", "w3"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tri"), sum("p_bp").as("__sum"))
      .select(col("doc_id"), col("n_tri"),
        expr("__sum div n_tri").as("lm_bp"))
  }

  val lmScoreGate: Q = (s, dir) =>
    lmScore(t(s, dir, "documents")).orderBy("doc_id")

  /** Deterministic training-order shuffle: a global pseudo-random
    * permutation of the corpus (position, batch id, offset in batch)
    * keyed by md5 of a salt + doc id — the "shuffle the corpus before
    * epoch N" step of a training-data pipeline, reproducible across
    * runs and engines because the permutation is a pure function of
    * (salt, doc_id), not of partitioning or RNG state.
    *
    * Scale shape: THE trap here is `row_number() OVER (ORDER BY ...)`,
    * which collapses to one partition; positions instead come from
    * [[graft.core.Ids.denseId]] — a range-partitioned sort on the hash
    * (uniform by construction, so zero skew) plus per-partition
    * offsets from a lightweight count job. The only full-data cost is
    * the one sort shuffle the semantics require. Downstream writers
    * partition output by `batch_id` to get one file per batch. */
  def trainingOrder(docs: DataFrame, batchSize: Long,
      salt: String): DataFrame = {
    require(batchSize >= 1, s"batchSize must be >= 1 (got $batchSize)")
    val keyed = docs.select(col("doc_id"),
      md5(concat(lit(salt + ":"), col("doc_id").cast("string"))).as("__k"))
    graft.core.Ids.denseId(keyed, Seq(col("__k"), col("doc_id")), "pos")
      .select(col("doc_id"), col("pos"),
        expr(s"(pos - 1) div ${batchSize}L").as("batch_id"),
        (col("pos") - 1) % batchSize as "pos_in_batch")
  }

  val trainingOrderGate: Q = (s, dir) =>
    trainingOrder(t(s, dir, "documents"), 256L, "shuf1").orderBy("pos")

  /** Fill a TOKEN budget from a deterministically shuffled corpus —
    * "give me the first B tokens of the shuffled dataset", the
    * assemble-a-training-mix-to-a-budget step. Documents are laid on
    * the cumulative-token line in [[graft.operators.Sampling
    * .hashScore]] order (reproducible shuffle, same md5 fraction as
    * every sampler) and a document is kept iff its STARTING offset is
    * below the budget — so the output always covers >= B tokens when
    * the corpus has them (the boundary document is included whole;
    * chunk-level truncation is [[chunkSliding]]'s job, composable
    * downstream).
    *
    * All-integer decision (long token counts, long cumsum), so
    * membership is bit-portable. The running total is
    * [[graft.core.Cumsum.globalCumsum]] — the two-phase distributed
    * form; the only full-data cost is the sort shuffle the
    * deterministic order already requires, identical to
    * [[trainingOrder]]'s own shape. */
  def tokenBudgetFill(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"tokenBudgetFill: budget must be positive (got $budget)")
    val base = docs.select(col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"),
      Sampling.hashScore(col("doc_id")).as("__r"))
    graft.core.Cumsum.globalCumsum(base,
        Seq(col("__r"), col("doc_id")), col("n_tokens"), "cum_tokens")
      .filter(col("cum_tokens") - col("n_tokens") < budget)
      .select("doc_id", "n_tokens", "cum_tokens")
  }

  /** ~1/3 of the sf0.01 corpus by tokens; exercises the boundary-doc
    * rule and the two-phase cumsum. */
  val tokenBudgetGate: Q = (s, dir) =>
    tokenBudgetFill(t(s, dir, "documents"), 20000L).orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "x_corpus_importance" -> importanceGate,
    "x_corpus_lm_score" -> lmScoreGate,
    "x_corpus_shuffle" -> trainingOrderGate,
    "x_corpus_budget_fill" -> tokenBudgetGate,
    "x_corpus_diversity" -> diversityGate,
    "x_corpus_ngram_lm" -> ngramLmGate,
    "x_corpus_oov_rate" -> oovRate,
    "x_corpus_length_buckets" -> lengthBuckets,
    "x_corpus_drift" -> sourceDrift,
    "x_corpus_split3" -> splitSafe3Gate,
    "x_corpus_temperature" -> temperatureMix,
    "x_corpus_split_safe" -> splitSafeGate,
    "x_corpus_bpe_pairs" -> bpePairs,
    "x_corpus_bpe_encode" -> bpeEncodeGate,
    "x_corpus_bpe_fertility" -> bpeFertilityGate,
    "x_corpus_mix_rebalance" -> mixRebalance,
    "x_corpus_chunk_sliding" -> chunkSliding,
    "x_corpus_vocab_topk" -> vocabTopK,
    "x_corpus_vocab_coverage" -> vocabCoverage,
    "x_corpus_tfidf" -> tfIdf,
    "x_corpus_pack_sequences" -> packSequences,
    "x_corpus_quality_gate" -> qualityGate,
    "x_corpus_group_topk" -> groupTopK)

  private val wsExpr = "regexp_split_to_array(trim(text), '\\s+')"

  /** DuckDB rendering of [[bpeEncodeWords]]' merge chain: one nested
    * literal replace() per [[DefaultMerges]] entry, same order. */
  private def bpeReplaceChainSql(inner: String): String =
    DefaultMerges.foldLeft(inner) { case (acc, (l, r)) =>
      s"replace($acc, '{$l}{$r}', '{$l$r}')"
    }

  /** DuckDB rendering of [[Sampling.hashScore]] (shared literal). */
  private def scoreSql(key: String): String =
    s"(CAST(('0x' || substring(md5(CAST($key AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0)"

  val oracles: Map[String, String] = Map(
    "x_corpus_importance" ->
      (s"WITH w AS (SELECT doc_id, source = 'src0' AS tgt, $wsExpr AS ws FROM documents), " +
        "g AS (SELECT doc_id, tgt, ws[i] AS w1, ws[i+1] AS w2 " +
        "FROM w, unnest(range(1, len(ws))) AS u(i) WHERE len(ws) >= 2), " +
        "tg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c_t FROM g WHERE tgt GROUP BY 1, 2), " +
        "rg AS (SELECT g.w1, g.w2, CAST(COUNT(*) AS BIGINT) AS c_r FROM g " +
        "JOIN tg ON g.w1 = tg.w1 AND g.w2 = tg.w2 WHERE NOT g.tgt GROUP BY 1, 2), " +
        "tot AS (SELECT CAST((SELECT SUM(c_t) FROM tg) AS BIGINT) AS tt, " +
        "CAST((SELECT COUNT(*) FROM tg) AS BIGINT) AS v, " +
        "CAST((SELECT COALESCE(SUM(c_r), 0) FROM rg) AS BIGINT) AS tr), " +
        "aff AS (SELECT tg.w1, tg.w2, " +
        "((tg.c_t + 1) * 1000000) // (tot.tt + tot.v) - ((COALESCE(rg.c_r, 0) + 1) * 1000000) // (tot.tr + tot.v) AS a " +
        "FROM tg LEFT JOIN rg ON tg.w1 = rg.w1 AND tg.w2 = rg.w2 CROSS JOIN tot), " +
        "ds AS (SELECT g.doc_id, CAST(SUM(aff.a) AS BIGINT) AS score FROM g " +
        "JOIN aff ON g.w1 = aff.w1 AND g.w2 = aff.w2 GROUP BY g.doc_id), " +
        "sc AS (SELECT d.doc_id, COALESCE(ds.score, 0) AS score FROM documents d LEFT JOIN ds ON d.doc_id = ds.doc_id), " +
        "th AS (SELECT CAST(quantile_disc(score, 0.8) AS DOUBLE) AS thr FROM sc) " +
        "SELECT sc.doc_id, sc.score, sc.score >= th.thr AS keep FROM sc CROSS JOIN th"),
    "x_corpus_lm_score" ->
      (s"WITH w AS (SELECT doc_id, $wsExpr AS ws FROM documents), " +
        "tri AS (SELECT doc_id, ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3 " +
        "FROM w, unnest(range(1, len(ws) - 1)) AS u(i) WHERE len(ws) >= 3), " +
        "cnt AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n FROM tri GROUP BY 1, 2, 3), " +
        "lm AS (SELECT w1, w2, w3, n * 10000 // CAST(SUM(n) OVER (PARTITION BY w1, w2) AS BIGINT) AS p_bp FROM cnt) " +
        "SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tri, " +
        "CAST(SUM(p_bp) AS BIGINT) // CAST(COUNT(*) AS BIGINT) AS lm_bp " +
        "FROM tri t JOIN lm USING (w1, w2, w3) GROUP BY t.doc_id ORDER BY t.doc_id"),
    "x_corpus_budget_fill" ->
      ("WITH d AS (SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens, " +
        "(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0) AS r FROM documents), " +
        "c AS (SELECT doc_id, n_tokens, CAST(SUM(n_tokens) OVER (ORDER BY r, doc_id) AS BIGINT) AS cum_tokens FROM d) " +
        "SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens - n_tokens < 20000 ORDER BY doc_id"),
    "x_corpus_shuffle" ->
      ("WITH p AS (SELECT doc_id, md5('shuf1:' || CAST(doc_id AS VARCHAR)) AS k FROM documents), " +
        "r AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY k, doc_id) AS BIGINT) AS pos FROM p) " +
        "SELECT doc_id, pos, (pos - 1) // 256 AS batch_id, (pos - 1) % 256 AS pos_in_batch " +
        "FROM r ORDER BY pos"),
    "x_corpus_diversity" ->
      (s"WITH tk AS (SELECT source, unnest($wsExpr) AS w FROM documents), " +
        "tf AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS tf FROM tk GROUP BY 1, 2), " +
        "agg AS (SELECT source, SUM(tf) AS n, SUM(tf * tf) AS s2, MAX(tf) AS maxtf FROM tf GROUP BY source) " +
        "SELECT source, CAST(n AS BIGINT) AS n_tokens, " +
        "CAST((s2 * 10000) // (n * n) AS BIGINT) AS simpson_bp, " +
        "CAST((maxtf * 10000) // n AS BIGINT) AS top_share_bp " +
        "FROM agg ORDER BY source"),
    "x_corpus_ngram_lm" ->
      (s"WITH w AS (SELECT $wsExpr AS ws FROM documents), " +
        "tri AS (SELECT ws[i] AS w1, ws[i+1] AS w2, ws[i+2] AS w3 " +
        "FROM w, unnest(range(1, len(ws) - 1)) AS u(i) WHERE len(ws) >= 3), " +
        "cnt AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n FROM tri GROUP BY 1, 2, 3), " +
        "rk AS (SELECT w1, w2, w3, n, " +
        "CAST(SUM(n) OVER (PARTITION BY w1, w2) AS BIGINT) AS ctx_n, " +
        "CAST(row_number() OVER (PARTITION BY w1, w2 ORDER BY n DESC, w3) AS INT) AS rank FROM cnt) " +
        "SELECT w1, w2, w3, n, ctx_n, n * 10000 // ctx_n AS p_bp, rank " +
        "FROM rk WHERE rank <= 3 ORDER BY w1, w2, rank"),
    "x_corpus_oov_rate" ->
      (s"WITH tk AS (SELECT source, unnest($wsExpr) AS tok FROM documents), " +
        "st AS (SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n FROM tk GROUP BY source, tok), " +
        "v AS (SELECT tok FROM (SELECT tok, CAST(SUM(n) AS BIGINT) AS n_occ FROM st GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 500)), " +
        "agg AS (SELECT source, CAST(SUM(n) AS BIGINT) AS n_tokens, " +
        "CAST(SUM(CASE WHEN tok IN (SELECT tok FROM v) THEN n ELSE 0 END) AS BIGINT) AS n_in_vocab FROM st GROUP BY source) " +
        "SELECT source, n_tokens, n_in_vocab, (n_tokens - n_in_vocab) * 10000 // n_tokens AS oov_bp " +
        "FROM agg ORDER BY source"),
    "x_corpus_length_buckets" ->
      (s"WITH d AS (SELECT CAST(len($wsExpr) AS BIGINT) AS n_tok FROM documents), " +
        "b AS (SELECT LEAST(n_tok // 64, 7) AS bucket, (LEAST(n_tok // 64, 7) + 1) * 64 AS cap, n_tok FROM d), " +
        "agg AS (SELECT bucket, cap, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tok) AS BIGINT) AS sum_tokens, " +
        "CAST(SUM(GREATEST(cap - n_tok, 0)) AS BIGINT) AS sum_padding, " +
        "CAST(SUM(GREATEST(n_tok - cap, 0)) AS BIGINT) AS sum_truncated FROM b GROUP BY bucket, cap) " +
        "SELECT bucket, cap, n_docs, sum_tokens, sum_padding, sum_truncated, " +
        "sum_padding * 10000 // (n_docs * cap) AS waste_bp FROM agg ORDER BY bucket"),
    "x_corpus_drift" ->
      ("WITH per AS (SELECT source, " +
        "CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a, " +
        "CAST(SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b " +
        "FROM documents GROUP BY source), " +
        "tot AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb FROM per) " +
        "SELECT source, n_a, n_b, " +
        "CASE WHEN ta > 0 THEN n_a * 10000 // ta ELSE 0 END AS share_a_bp, " +
        "CASE WHEN tb > 0 THEN n_b * 10000 // tb ELSE 0 END AS share_b_bp, " +
        "ABS(CASE WHEN ta > 0 THEN n_a * 10000 // ta ELSE 0 END - " +
        "CASE WHEN tb > 0 THEN n_b * 10000 // tb ELSE 0 END) AS drift_bp " +
        "FROM per, tot ORDER BY source"),
    "x_corpus_split3" ->
      (s"WITH RECURSIVE w AS (SELECT doc_id, $wsExpr AS ws FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle FROM w, unnest(range(1, len(ws)-1)) AS u(i) WHERE len(ws) >= 3), " +
        "cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id), " +
        "com AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), " +
        "pairs AS (SELECT doc_a, doc_b FROM com JOIN cnt ca ON com.doc_a = ca.doc_id JOIN cnt cb ON com.doc_b = cb.doc_id " +
        "WHERE common / (ca.n_sh + cb.n_sh - common) >= 0.5), " +
        "ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION SELECT doc_b, doc_a FROM pairs), " +
        "nodes AS (SELECT DISTINCT src AS n FROM ed), " +
        "reach(a, b) AS (SELECT n, n FROM nodes UNION SELECT r.a, ed.dst FROM reach r JOIN ed ON r.b = ed.src), " +
        "cl AS (SELECT a AS doc_id, MIN(b) AS canonical_id FROM reach GROUP BY a) " +
        "SELECT d.doc_id, COALESCE(cl.canonical_id, d.doc_id) AS group_id, " +
        s"CASE WHEN ${scoreSql("COALESCE(cl.canonical_id, d.doc_id)")} < 0.10 THEN 'test' " +
        s"WHEN ${scoreSql("COALESCE(cl.canonical_id, d.doc_id)")} < 0.20 THEN 'val' ELSE 'train' END AS split " +
        "FROM documents d LEFT JOIN cl USING (doc_id) ORDER BY doc_id"),
    "x_corpus_temperature" ->
      (s"WITH d AS (SELECT doc_id, source, CAST(len($wsExpr) AS BIGINT) AS n_tokens FROM documents), " +
        "s AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM d GROUP BY source), " +
        "m AS (SELECT MIN(src_tokens) AS min_tokens FROM s), " +
        "f AS (SELECT source, sqrt(CAST(min_tokens AS DOUBLE) / CAST(src_tokens AS DOUBLE)) AS frac FROM s, m) " +
        "SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(d.n_tokens) AS BIGINT) AS n_tokens, f.frac AS frac " +
        s"FROM d JOIN f ON d.source = f.source WHERE ${scoreSql("d.doc_id")} < f.frac " +
        "GROUP BY d.source, f.frac ORDER BY d.source"),
    "x_corpus_split_safe" ->
      (s"WITH RECURSIVE w AS (SELECT doc_id, $wsExpr AS ws FROM documents), " +
        "sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle FROM w, unnest(range(1, len(ws)-1)) AS u(i) WHERE len(ws) >= 3), " +
        "cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id), " +
        "com AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), " +
        "pairs AS (SELECT doc_a, doc_b FROM com JOIN cnt ca ON com.doc_a = ca.doc_id JOIN cnt cb ON com.doc_b = cb.doc_id " +
        "WHERE common / (ca.n_sh + cb.n_sh - common) >= 0.5), " +
        "ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION SELECT doc_b, doc_a FROM pairs), " +
        "nodes AS (SELECT DISTINCT src AS n FROM ed), " +
        "reach(a, b) AS (SELECT n, n FROM nodes UNION SELECT r.a, ed.dst FROM reach r JOIN ed ON r.b = ed.src), " +
        "cl AS (SELECT a AS doc_id, MIN(b) AS canonical_id FROM reach GROUP BY a) " +
        "SELECT d.doc_id, COALESCE(cl.canonical_id, d.doc_id) AS group_id, " +
        s"CASE WHEN ${scoreSql("COALESCE(cl.canonical_id, d.doc_id)")} < 0.10 THEN 'eval' ELSE 'train' END AS split " +
        "FROM documents d LEFT JOIN cl USING (doc_id) ORDER BY doc_id"),
    "x_corpus_bpe_pairs" ->
      (s"WITH w AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM " +
        s"(SELECT unnest($wsExpr) AS w FROM documents) GROUP BY w), " +
        "p AS (SELECT n_w, w, unnest(generate_series(1, length(w) - 1)) AS i FROM w WHERE length(w) >= 2), " +
        "pc AS (SELECT substring(w, i, 2) AS pair, CAST(SUM(n_w) AS BIGINT) AS n_pair FROM p GROUP BY pair) " +
        "SELECT pair, n_pair FROM pc ORDER BY n_pair DESC, pair LIMIT 20"),
    "x_corpus_bpe_encode" ->
      (s"WITH w0 AS (SELECT doc_id, unnest($wsExpr) AS t FROM documents), " +
        "wn AS (SELECT doc_id, regexp_replace(lower(t), '[^a-z0-9]', '', 'g') AS w FROM w0), " +
        "occ AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n_occ FROM wn WHERE w <> '' GROUP BY doc_id, w), " +
        "vocab AS (SELECT DISTINCT w FROM occ), " +
        s"enc AS (SELECT w, ${bpeReplaceChainSql("regexp_replace(w, '(.)', '{\\1}', 'g')")} AS e FROM vocab), " +
        "cnt AS (SELECT w, CAST(length(e) - length(replace(e, '{', '')) AS BIGINT) AS n_toks FROM enc) " +
        "SELECT occ.doc_id, CAST(SUM(n_occ * n_toks) AS BIGINT) AS n_bpe_tokens, " +
        "CAST(SUM(n_occ) AS BIGINT) AS n_words, CAST(SUM(n_occ * length(w)) AS BIGINT) AS n_chars " +
        "FROM occ JOIN cnt USING (w) GROUP BY occ.doc_id ORDER BY doc_id"),
    "x_corpus_bpe_fertility" ->
      (s"WITH w0 AS (SELECT source, unnest($wsExpr) AS t FROM documents), " +
        "wn AS (SELECT source, regexp_replace(lower(t), '[^a-z0-9]', '', 'g') AS w FROM w0), " +
        "occ AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS n_occ FROM wn WHERE w <> '' GROUP BY source, w), " +
        "vocab AS (SELECT DISTINCT w FROM occ), " +
        s"enc AS (SELECT w, ${bpeReplaceChainSql("regexp_replace(w, '(.)', '{\\1}', 'g')")} AS e FROM vocab), " +
        "cnt AS (SELECT w, CAST(length(e) - length(replace(e, '{', '')) AS BIGINT) AS n_toks FROM enc), " +
        "agg AS (SELECT occ.source, CAST(SUM(n_occ * n_toks) AS BIGINT) AS n_bpe_tokens, " +
        "CAST(SUM(n_occ) AS BIGINT) AS n_words FROM occ JOIN cnt USING (w) GROUP BY occ.source) " +
        "SELECT source, n_bpe_tokens, n_words, n_bpe_tokens * 10000 // n_words AS fertility_bp " +
        "FROM agg ORDER BY source"),
    "x_corpus_mix_rebalance" ->
      (s"WITH d AS (SELECT doc_id, source, CAST(len($wsExpr) AS BIGINT) AS n_tokens FROM documents), " +
        "bs AS (SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens FROM d GROUP BY source), " +
        "t AS (SELECT CAST(SUM(src_tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS target FROM bs), " +
        "f AS (SELECT source, least(1.0, target / CAST(src_tokens AS DOUBLE)) AS frac FROM bs CROSS JOIN t), " +
        s"kept AS (SELECT d.source, frac, doc_id, n_tokens FROM d JOIN f ON d.source = f.source WHERE ${scoreSql("doc_id")} < frac) " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, frac " +
        "FROM kept GROUP BY source, frac ORDER BY source"),
    "x_corpus_chunk_sliding" ->
      (s"WITH d AS (SELECT doc_id, CAST(len($wsExpr) AS INT) AS n FROM documents), " +
        "c AS (SELECT doc_id, n, CAST(unnest(generate_series(0, " +
        "CAST(greatest(ceil(CAST(n - 64 AS DOUBLE) / 32), 0) AS INT))) AS INT) AS chunk_idx FROM d) " +
        "SELECT doc_id, chunk_idx, CAST(chunk_idx * 32 AS INT) AS chunk_start, " +
        "CAST(least(chunk_idx * 32 + 64, n) AS INT) AS chunk_end, " +
        "CAST(least(chunk_idx * 32 + 64, n) - chunk_idx * 32 AS INT) AS chunk_tokens " +
        "FROM c WHERE least(chunk_idx * 32 + 64, n) - chunk_idx * 32 > 0 " +
        "ORDER BY doc_id, chunk_idx"),
    "x_corpus_vocab_topk" ->
      (s"SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs " +
        s"FROM (SELECT doc_id, unnest($wsExpr) AS tok FROM documents) " +
        "GROUP BY tok ORDER BY n_occ DESC, tok LIMIT 100"),
    "x_corpus_vocab_coverage" ->
      (s"WITH tk AS (SELECT unnest($wsExpr) AS tok FROM documents), " +
        "v AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_occ FROM tk GROUP BY tok), " +
        "c AS (SELECT n_occ, CAST(SUM(n_occ) OVER (ORDER BY n_occ DESC, tok ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM v), " +
        "t AS (SELECT CAST(SUM(n_occ) AS BIGINT) AS total FROM v), " +
        "p AS (SELECT unnest([50, 90, 95, 99]) AS pct) " +
        "SELECT CAST(pct AS BIGINT) AS pct, " +
        "CAST(SUM(CASE WHEN cum * 100 < total * pct THEN 1 ELSE 0 END) + 1 AS BIGINT) AS vocab_size, " +
        "CAST(MIN(CASE WHEN cum * 100 >= total * pct THEN cum END) AS BIGINT) AS covered_occ " +
        "FROM c, t, p GROUP BY pct ORDER BY pct"),
    "x_corpus_tfidf" ->
      (s"WITH w AS (SELECT doc_id, len($wsExpr) AS n_tokens, unnest($wsExpr) AS tok FROM documents), " +
        "tf AS (SELECT doc_id, n_tokens, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM w GROUP BY doc_id, n_tokens, tok), " +
        "df AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok), " +
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents) " +
        "SELECT doc_id, tok, tf, df, (tf / n_tokens) * (n_total / df) AS tf_idf " +
        "FROM tf JOIN df USING (tok) CROSS JOIN n ORDER BY doc_id, tok"),
    "x_corpus_pack_sequences" ->
      (s"WITH d AS (SELECT source, doc_id, CAST(len($wsExpr) AS BIGINT) AS n_tokens FROM documents), " +
        "c AS (SELECT source, doc_id, n_tokens, CAST(SUM(n_tokens) OVER " +
        "(PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM d) " +
        s"SELECT source, CAST(floor((cum - n_tokens) / $PackBudget) AS BIGINT) AS chunk_id, " +
        "CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS chunk_tokens " +
        "FROM c GROUP BY source, chunk_id ORDER BY source, chunk_id"),
    "x_corpus_quality_gate" ->
      (s"WITH s AS (SELECT doc_id, source, CAST(len($wsExpr) AS INT) AS n_tokens FROM documents), " +
        "t AS (SELECT CAST(quantile_disc(n_tokens, 0.2) AS DOUBLE) AS thr FROM s) " +
        "SELECT doc_id, source, n_tokens, thr FROM s CROSS JOIN t " +
        "WHERE n_tokens >= thr ORDER BY doc_id"),
    "x_corpus_group_topk" ->
      (s"WITH d AS (SELECT source, doc_id, CAST(len($wsExpr) AS INT) AS n_tokens FROM documents), " +
        "r AS (SELECT source, doc_id, n_tokens, CAST(ROW_NUMBER() OVER " +
        "(PARTITION BY source ORDER BY n_tokens DESC, doc_id) AS INT) AS rk FROM d) " +
        "SELECT source, doc_id, n_tokens, rk FROM r WHERE rk <= 3 ORDER BY source, rk"))
}
