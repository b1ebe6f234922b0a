package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for a large-scale training-data pipeline
  * (driver north star; no reference equivalent — cited patterns are the
  * reference's regex/string ops, e.g.
  * /root/reference/PharmacoDI/build_synonym_tables.py:74-82).
  *
  * All ops are per-row projections/aggregations over `documents`:
  * embarrassingly parallel, no shuffle except the final ORDER BY used
  * only for oracle determinism. At 100 TB these run as a single
  * whole-stage-codegen'd scan — no UDFs, only built-in higher-order
  * functions.
  */
object TextAnalysis {

  type Q = (SparkSession, String) => DataFrame

  /** Whitespace tokenization shared by all ops. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Fan-out for the per-row-HEAVY gates (tokenize/explode/regex over
    * every document): scale-adaptive scan repartition so a single-
    * row-group input doesn't serialize the projection in one task —
    * see [[graft.core.Fanout.bySize]] (no-op at scale and on pinned
    * frames). Applied only where the per-row work dominates; trivial
    * projections skip it (the shuffle would cost more than it buys). */
  private def fan(df: DataFrame): DataFrame =
    graft.core.Fanout.bySize(df, col("doc_id"))

  /** Count of tokens from `profile` present in `ws` (with repeats). */
  def profileHits(ws: Column, profile: Seq[String]): Column =
    size(filter(ws, w => w.isin(profile: _*)))

  /** Token counting (whitespace tokenizer). */
  val textTokens: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), size(tokens(col("text"))).as("n_tokens"))
      .orderBy("doc_id")

  /** GPT-2-style pretokenizer regex (contractions, letter runs, digit
    * runs, punctuation runs, whitespace). Identical in Java regex and
    * RE2, so the count is oracle-checked. */
  val BpePattern = "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** BPE-ish token counting via the fused [[graft.functions.RegexpCount]]
    * expression (counts matches without materializing the match array;
    * the composable `size(regexp_extract_all(...))` form is rewritten
    * to this automatically under GraftExtensions' FuseRegexpCount). */
  val textTokensBpe: Q = (s, dir) => {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column, expression}
    t(s, dir, "documents")
      .select(col("doc_id"),
        column(graft.functions.RegexpCount(
          expression(col("text")), expression(lit(BpePattern))))
          .as("n_bpe_tokens"))
      .orderBy("doc_id")
  }

  /** Quality scoring: length, token count, average token length,
    * stopword ratio. Ratios are a single IEEE division — portable. */
  val textQuality: Q = (s, dir) => {
    val stop = Seq("the", "a", "of", "and")
    fan(t(s, dir, "documents"))
      .select(col("doc_id"), col("text"), tokens(col("text")).as("ws"))
      .select(
        col("doc_id"),
        length(col("text")).as("n_chars_calc"),
        size(col("ws")).as("n_tokens"),
        (length(regexp_replace(col("text"), "\\s+", "")) / size(col("ws")))
          .as("avg_token_len"),
        (profileHits(col("ws"), stop) / size(col("ws"))).as("stopword_ratio"),
        ((length(col("text")) -
          length(regexp_replace(col("text"), "[0-9]", ""))) / length(col("text")))
          .as("digit_ratio"),
        ((length(col("text")) -
          length(regexp_replace(col("text"), "[A-Z]", ""))) / length(col("text")))
          .as("upper_ratio"))
      .orderBy("doc_id")
  }

  /** Profile classifier: score each profile by token hits, argmax with
    * deterministic alphabetical tiebreak. Used for language-ID
    * (stopword profiles) and topic-ID (domain profiles).
    */
  def classify(df: DataFrame, textCol: String, profiles: Seq[(String, Seq[String])]): DataFrame = {
    val ws = tokens(col(textCol))
    val scored = df.withColumn("__ws", ws)
    val withScores = profiles.foldLeft(scored) { case (d, (name, words)) =>
      d.withColumn(s"score_$name", profileHits(col("__ws"), words))
    }
    // argmax with alphabetical tiebreak: first profile (sorted) that is
    // >= all later ones wins.
    // DRIVER-SIDE STRING SORT (working rule, r15 canary): Java sorts
    // compare UTF-16 code units and diverge from the engine's UTF-8
    // byte order on non-BMP strings. Safe HERE because profile names
    // are caller-supplied ASCII identifiers and the tiebreak is
    // self-consistent (the same sorted list defines both sides of any
    // compare); a profile set with non-ASCII names must sort by UTF-8
    // BYTES (compare getBytes(UTF_8) lexicographically) instead.
    val sorted = profiles.map(_._1).sorted
    val predicted = sorted.init.zipWithIndex.foldRight(lit(sorted.last)) {
      case ((name, i), elseCol) =>
        val rest = sorted.drop(i + 1)
        val isMax = rest.map(o => col(s"score_$name") >= col(s"score_$o"))
          .reduce(_ && _)
        when(isMax, lit(name)).otherwise(elseCol)
    }
    withScores.withColumn("predicted", predicted).drop("__ws")
  }

  /** Language-ID over natural-language stopword profiles. */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "les", "et"),
    "es" -> Seq("el", "los", "las", "y"))

  val textLangId: Q = (s, dir) =>
    classify(t(s, dir, "documents"), "text", langProfiles)
      .select("doc_id", "score_de", "score_en", "score_es", "score_fr", "predicted")
      .orderBy("doc_id")

  /** Classifier evaluation against the `lang` ground-truth column: the
    * confusion matrix of the language-ID profiles — the eval loop a
    * training pipeline runs after any labeling pass. One partial-
    * aggregated groupBy over (truth, prediction); cells are exact
    * counts, so the oracle is exact. */
  val textEvalConfusion: Q = (s, dir) =>
    classify(t(s, dir, "documents"), "text", langProfiles)
      .groupBy(col("lang").as("truth"), col("predicted"))
      .agg(count(lit(1)).as("n"))
      .orderBy("truth", "predicted")

  /** Topic-ID over domain profiles — exercises varied argmax. */
  val topicProfiles: Seq[(String, Seq[String])] = Seq(
    "relational" -> Seq("table", "row", "column", "join", "key"),
    "streaming" -> Seq("stream", "batch", "window"),
    "perf" -> Seq("fast", "slow", "big", "small"))

  val textTopicId: Q = (s, dir) =>
    classify(t(s, dir, "documents"), "text", topicProfiles)
      .select("doc_id", "score_perf", "score_relational", "score_streaming", "predicted")
      .orderBy("doc_id")

  /** Content fingerprint: md5 over the sorted distinct token set —
    * order-insensitive document identity for fuzzy-dedup blocking. */
  val textFingerprint: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokens(col("text"))))))
          .as("fingerprint"))
      .orderBy("doc_id")

  /** Rolling polynomial hash over the character stream (order-sensitive
    * fingerprint): fold codepoints as acc = (acc*257 + cp) mod 1e15.
    * The modulus keeps every intermediate < 2.6e17, so ANSI-mode long
    * arithmetic cannot overflow — and unlike the round-1 xxhash64
    * formulation the arithmetic is engine-portable, so this IS
    * DuckDB-oracle-checked (list_reduce over unicode() codepoints
    * computes the identical fold). Still a pure per-row projection:
    * one codegen'd scan, no shuffle. */
  def rollingHash(text: Column): Column =
    aggregate(
      filter(split(text, ""), c => c =!= ""),
      lit(0L),
      (acc, c) => pmod(acc * lit(257L) + ascii(c), lit(1000000000000000L)))

  // NO fan: the r21 capture measured the added exchange a wash-to-loss
  // on this row (0.87 -> 1.15 s per rep) — the per-row fold is too
  // cheap to amortize a shuffle of the text column (VERDICT r21 #7's
  // cost floor, applied as a static call-site decision)
  val textRollingHash: Q = (s, dir) =>
    t(s, dir, "documents")
      .select(col("doc_id"), rollingHash(col("text")).as("rolling_hash"))
      .orderBy("doc_id")

  /** MOSS-style winnowing fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — public algorithm): hash every k-gram of the character
    * stream, then keep the positions whose hash is the minimum of the
    * trailing window of w gram hashes (local-minima selection). Any
    * two documents sharing a substring of length >= w + k - 1 are
    * guaranteed to share a fingerprint, so a plain equi-join on
    * (hash) finds candidate plagiarism/quote/boilerplate overlaps at
    * corpus scale with NO pairwise stage — the fingerprint table is a
    * fraction ~2/(w+1) of the gram stream.
    *
    * The gram hash is the same portable polynomial fold as
    * [[rollingHash]] (acc*257+cp mod 1e15 — every intermediate
    * < 2.6e17, exact in int64 on any engine), so the fingerprints are
    * DuckDB-oracle-checked, not just rows-counted. Cost is a pure
    * per-row projection — one codegen'd scan, no shuffle, O(n*k) work
    * per doc; docs shorter than k + w - 1 chars emit no rows (the
    * `when` guards dodge sequence()'s descending-range behavior on
    * negative spans). */
  def winnowing(df: DataFrame, k: Int = 8, w: Int = 4): DataFrame =
    df.select(col("doc_id"),
        explode(graft.functions.WinnowFingerprints.winnowFp(col("text"), k, w)).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.hash").as("hash"))

  /** Composable higher-order-function twin of [[winnowing]] — kept as
    * the spec cross-check (Round9Props holds the two identical on
    * random corpora); the gate runs the native expression, which does
    * the same arithmetic ~37x faster (soak at 400k docs: 60.2s
    * composable -> 0.8s native, ~2 us/doc). */
  def winnowingComposable(df: DataFrame, k: Int = 8, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, s"winnowing: k and w must be >= 1 (got $k, $w)")
    val emptyLongs = array().cast("array<bigint>")
    val cps = transform(filter(split(col("text"), ""), c => c =!= ""),
      c => ascii(c).cast(LongType))
    val withGrams = df
      .withColumn("__cp", cps)
      .withColumn("__gh",
        when(size(col("__cp")) >= k,
          transform(sequence(lit(0), size(col("__cp")) - k),
            p => aggregate(slice(col("__cp"), p + 1, lit(k)), lit(0L),
              (a, c) => pmod(a * lit(257L) + c, lit(1000000000000000L)))))
          .otherwise(emptyLongs))
    val sel = when(size(col("__gh")) >= w,
      filter(
        transform(sequence(lit(w - 1), size(col("__gh")) - 1),
          p => struct(p.cast("int").as("pos"),
            element_at(col("__gh"), p + 1).as("hash"),
            array_min(slice(col("__gh"), p - lit(w - 2), lit(w))).as("m"))),
        s => s.getField("hash") === s.getField("m")))
      .otherwise(array().cast("array<struct<pos:int,hash:bigint,m:bigint>>"))
    withGrams
      .select(col("doc_id"), explode(sel).as("f"))
      .select(col("doc_id"), col("f.pos").as("pos"), col("f.hash").as("hash"))
  }

  val textWinnowing: Q = (s, dir) =>
    winnowing(fan(t(s, dir, "documents"))).orderBy("doc_id", "pos")

  /** Count of the most frequent element in a string array, as the
    * longest equal-run over the SORTED array: one fold of
    * struct(prev, run, best) state — O(n log n) per row vs the naive
    * O(|distinct| * n) count-per-distinct-token scan (which degrades
    * quadratically on long natural-language documents where
    * |distinct| ~ n). Empty-token edge: `ws` contains "" only when it
    * is the whole array (split of empty text), and the "" run counts
    * correctly because the zero state's prev "" then matches it. */
  def maxRunCount(ws: Column): Column =
    aggregate(
      array_sort(ws),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (st, w) => {
        val run = when(st.getField("prev") === w, st.getField("run") + 1)
          .otherwise(lit(1))
        struct(w.as("prev"), run.as("run"),
          greatest(st.getField("best"), run).as("best"))
      },
      st => st.getField("best"))

  /** Repetition signals (Gopher-style quality filters, Rae et al. 2021
    * §A1.1 shape): duplicate word-3-gram fraction and most-frequent-
    * token share. Everything is per-row higher-order-function work over
    * the token array — no explode, no shuffle; ratios are single IEEE
    * divisions of ints so the oracle is exact. The most-frequent-token
    * count is the [[maxRunCount]] sorted fold: O(n log n) per document,
    * bounded by document length, not corpus size — embarrassingly
    * parallel at 100 TB. */
  val textRepetition: Q = (s, dir) =>
    fan(t(s, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .withColumn("grams",
        when(size(col("ws")) >= 3, expr(
          "transform(sequence(0, size(ws)-3), i -> concat_ws(' ', slice(ws, i+1, 3)))")))
      .select(
        col("doc_id"),
        size(col("ws")).as("n_tokens"),
        size(array_distinct(col("ws"))).as("n_distinct"),
        (lit(1.0) - size(array_distinct(col("grams"))) / size(col("grams")))
          .as("dup_3gram_ratio"),
        (maxRunCount(col("ws")) / size(col("ws")))
          .as("top_token_ratio"))
      .orderBy("doc_id")

  /** Portable SimHash (32-bit): the engine-neutral companion to
    * [[Dedup.simhash]] — token hash is the character-polynomial
    * (acc*31 + cp) mod 2^32 instead of xxhash64, so DuckDB can compute
    * the identical signature and the whole simhash pipeline gets a
    * hash-checked oracle (the 64-bit xxhash variant keeps the
    * rows-only check + property specs). Same one-scan shape: explode
    * distinct tokens, 32 conditional bit-vote sums, pack bits. */
  /** Portable 32-bit avalanche finalizer (xorshift-multiply, lowbias32
    * shape): the raw polynomial's bits are linearly structured, which
    * made simhash bit-votes correlate across documents — 9x more
    * hamming<=1 signature collisions than a well-mixed hash on the
    * same corpus (measured). The multiplier is chosen < 2^27 so
    * h * m stays under 2^63 (ANSI-safe) and every op (xor, >>, *, %)
    * exists identically in DuckDB. */
  def mix32(h: Column): Column = {
    val m1 = pmod(h.bitwiseXOR(shiftright(h, 16)) * lit(73244475L), lit(4294967296L))
    val m2 = pmod(m1.bitwiseXOR(shiftright(m1, 16)) * lit(73244475L), lit(4294967296L))
    m2.bitwiseXOR(shiftright(m2, 16))
  }

  /** Portable 32-bit token hash: character polynomial mod 2^32,
    * avalanched with [[mix32]]. */
  def charPolyHash32(tok: Column): Column =
    mix32(aggregate(
      filter(split(tok, ""), c => c =!= ""),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + ascii(c), lit(4294967296L))))

  def simhash32(docs: DataFrame): DataFrame = {
    val toks = fan(docs)
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .select(col("doc_id"), charPolyHash32(col("tok")).as("h"))
    val bitSums = (0 until 32).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$i"))
    val sums = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 32).map(i =>
      when(col(s"b$i") > 0, shiftleft(lit(1L), i)).otherwise(lit(0L)))
      .reduce(_ + _)
    sums.select(col("doc_id"), sig.as("simhash32"))
  }

  val textSimhashPortable: Q = (s, dir) =>
    simhash32(t(s, dir, "documents")).orderBy("doc_id")

  /** Distinct word n-grams as an array column (empty when too short).
    * Built from Column-level functions (not an expr string) so it
    * composes with any input expression, not just a column named ws. */
  def wordNgrams(ws: Column, n: Int): Column =
    when(size(ws) >= n,
      array_distinct(transform(sequence(lit(0), size(ws) - n),
        i => concat_ws(" ", slice(ws, i + 1, lit(n))))))
      .otherwise(array().cast(ArrayType(StringType)))

  /** Benchmark decontamination: count, per corpus document, the
    * distinct 4-grams it shares with an eval set (here: doc_id < 10 —
    * the stand-in for a held-out benchmark). The eval side's distinct
    * grams are BROADCAST (an eval suite is tiny next to a 100 TB
    * corpus), so the corpus side never shuffles: one scan, explode,
    * broadcast-hash semi-match, partial-aggregated count per doc.
    * Training pipelines drop (or flag) every hit before training. */
  val textContamination: Q = (s, dir) => {
    // tokens() must be materialized as a column BEFORE wordNgrams:
    // references to `ws` inside the transform lambda are re-evaluated
    // per element, so passing the split expression directly re-splits
    // the text once per gram (measured 5s -> 0.6s at sf0.1).
    val grams = fan(t(s, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(wordNgrams(col("ws"), 4)).as("g"))
    val evalGrams = grams.filter(col("doc_id") < 10).select("g").distinct()
    grams.filter(col("doc_id") >= 10)
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_grams"))
      .orderBy("doc_id")
  }

  /** Cross-source n-gram overlap matrix — the MIX AUDIT a corpus
    * assembled from many crawls/dumps needs before training: for every
    * ordered source pair (a, b), how much of a's distinct 4-gram mass
    * also appears in b (containment, basis points, integer-exact).
    * High containment_bp flags a source that is largely a re-crawl of
    * another — the between-source counterpart of the within-corpus
    * dedup family, and the pairwise generalization of
    * [[textContamination]]'s one-fixed-side overlap.
    *
    * Plan shape at 100 TB: one distinct (source, gram) projection
    * (map-side partial agg), pinned once for its three consumers; the
    * pair join shuffles on the GRAM (inverted-index discipline — no
    * source x source data blow-up, join fan-out per gram is bounded by
    * its source-df, at most |sources|), and the matrix itself is
    * |sources|^2 rows. With thousands of sources a hot gram present in
    * every source costs df^2 rows — cap with a stop-gram df filter
    * exactly like [[Dedup]]'s maxDf before scaling there. */
  def crossSourceOverlap(docs: DataFrame, n: Int = 4): DataFrame = {
    val grams = graft.core.Materialize.pin(
      graft.core.Fanout.bySize(docs, col("doc_id"))
        .select(col("source"), tokens(col("text")).as("ws"))
        .select(col("source"), explode(wordNgrams(col("ws"), n)).as("g"))
        .distinct())
    val sizes = grams.groupBy("source").agg(count(lit(1)).as("n_grams_a"))
    val shared = grams.select(col("source").as("src_a"), col("g"))
      .join(grams.select(col("source").as("src_b"), col("g")), Seq("g"))
      .filter(col("src_a") =!= col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
    shared
      .join(broadcast(sizes.withColumnRenamed("source", "src_a")), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("n_shared"), col("n_grams_a"),
        expr("CAST(n_shared * 10000 DIV n_grams_a AS BIGINT)")
          .as("containment_bp"))
      .orderBy("src_a", "src_b")
  }

  val textSourceOverlap: Q = (s, dir) =>
    crossSourceOverlap(t(s, dir, "documents"))

  /** Bloom-prefiltered decontamination — output-identical to
    * [[textContamination]] (the exact join removes bloom false
    * positives; identity IS the contract, so both share one oracle).
    * The scale story this buys: the corpus side's gram stream is cut
    * AT THE SCAN by a few-MB bloom of the eval-set grams, so the
    * grams that reach the verify join are true hits plus the fpp
    * tail — at 100 TB, where the eval gram set is too large to
    * broadcast raw and the verify must shuffle, the bloom removes
    * ~all of the shuffle volume first (the [[BloomPrune]] pattern
    * applied to n-gram decontamination; the probe is the codegen'd
    * [[graft.functions.BloomMightContain]] — behind the pushed-down
    * scan, before every exchange, inside whole-stage codegen). */
  val textContaminationBloom: Q = (s, dir) => {
    val grams = fan(t(s, dir, "documents"))
      .select(col("doc_id"), tokens(col("text")).as("ws"))
      .select(col("doc_id"), explode(wordNgrams(col("ws"), 4)).as("g"))
    val evalGrams = graft.core.Materialize.pin(
      grams.filter(col("doc_id") < 10).select("g").distinct())
    val bf = evalGrams.stat.bloomFilter("g", 100000L, 0.01)
    grams.filter(col("doc_id") >= 10)
      .filter(graft.functions.BloomMightContain
        .bloomMightContain(bf, col("g")))
      .join(broadcast(evalGrams), Seq("g"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hit_grams"))
      .orderBy("doc_id")
  }

  /** Dataset-mix statistics: per-source doc/token counts and each
    * source's share of total tokens — the bookkeeping behind sampling
    * weights when mixing sources into a training run. One partial-
    * aggregated groupBy + a scalar total via window; the share is a
    * single IEEE division of two exact longs, so it oracle-checks. */
  val textMixStats: Q = (s, dir) =>
    t(s, dir, "documents")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(tokens(col("text"))).cast(LongType)).as("n_tokens"))
      .withColumn("token_share",
        col("n_tokens") / sum("n_tokens").over(Window.partitionBy()))
      .orderBy("source")

  /** Bigram collocation statistics: the 50 most frequent adjacent
    * token pairs with their lift over independence —
    * `lift = n_pair * N / (n_w1 * n_w2)` where N is the corpus bigram
    * count and n_w are corpus unigram counts. Lift is the standard
    * collocation score kept engine-portable: exact long counts cast to
    * double, one multiply, one divide — no log (a PMI would hang the
    * oracle on libm rounding; the ranking is monotone in lift for
    * fixed counts anyway).
    *
    * Scale shape: bigrams come from zipping the token array against
    * itself shifted by one (slice+arrays_zip inside the row — no
    * window, no self-join); all three count tables partial-aggregate
    * map-side; the unigram side is vocabulary-sized, so it joins in as
    * a broadcast, and the total is a broadcast scalar — the big
    * per-bigram table shuffles exactly once, for its own groupBy. The
    * final top-50 is TakeOrderedAndProject (per-partition heaps). */
  val textCollocations: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val toks = docs.select(col("doc_id"), tokens(col("text")).as("ws"))
    val pairs = toks.filter(size(col("ws")) >= 2)
      .select(explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("w1"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w2"))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pair"))
    val uni = toks.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n_w"))
    // total bigram count = sum(len-1) straight off the token arrays —
    // same number as re-aggregating `pairs`, without Spark re-running
    // the bigram explode for a second consumer
    val total = toks.filter(size(col("ws")) >= 2)
      .agg(sum((size(col("ws")) - 1).cast("long")).as("n_total"))
    pairs
      .join(broadcast(uni.select(col("w").as("w1"), col("n_w").as("n_w1"))), Seq("w1"))
      .join(broadcast(uni.select(col("w").as("w2"), col("n_w").as("n_w2"))), Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("n_pair"), col("n_w1"), col("n_w2"),
        ((col("n_pair").cast("double") * col("n_total").cast("double")) /
          (col("n_w1").cast("double") * col("n_w2").cast("double"))).as("lift"))
      .orderBy(col("n_pair").desc, col("w1"), col("w2"))
      .limit(50)
  }

  /** Rarity scoring — the integer-arithmetic stand-in for an n-gram
    * LM perplexity filter: per document, how rare its word
    * combinations are corpus-wide. Emits the bigram-instance count,
    * the corpus frequency of the document's RAREST bigram, and how
    * many of its bigram instances are corpus-rare (frequency <= 2).
    * Docs full of rare/unseen combinations (gibberish, OCR damage,
    * boilerplate mutations) surface with rarest_n = 1; all-integer
    * outputs keep the gate hash exact where a log-prob would not be.
    *
    * Scale shape: same discipline as the span-dedup op — ONE bigram
    * explode, partial-aggregated (doc, bigram) groupBy, corpus
    * frequency via a sum window over the reduced bigram groups, one
    * per-doc fold. No second explode, no join against a bigram table. */
  val textRarity: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val toks = fan(docs).select(col("doc_id"), tokens(col("text")).as("ws"))
    val g = toks.filter(size(col("ws")) >= 2)
      .select(col("doc_id"), explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1).as("w1"),
        slice(col("ws"), lit(2), size(col("ws")) - 1).as("w2"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("n_occ"))
    val corpusN = sum("n_occ").over(Window.partitionBy("w1", "w2"))
    val perDoc = g.withColumn("corpus_n", corpusN)
      .groupBy("doc_id")
      .agg(sum("n_occ").as("n_bigrams"),
        min("corpus_n").as("rarest_n"),
        sum(when(col("corpus_n") <= 2, col("n_occ")).otherwise(0L)).as("n_rare"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("rarest_n"), lit(0L)).as("rarest_n"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .orderBy("doc_id")
  }

  /** PII patterns, kept in the Java/RE2-portable regex subset (no
    * lookarounds, no backreferences) so the SAME pattern text drives
    * both the Spark query and the DuckDB oracle. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** PII scrubbing — the redaction pass training corpora run before
    * release (emails, phone numbers, dotted-quad IPs -> typed
    * placeholder tokens), plus per-document match counts for audit.
    * Redaction order is email -> IPv4 -> phone: an email can embed
    * digit runs, and a dotted quad must be gone before the phone
    * pattern scans the text. Counts are taken on the ORIGINAL text via
    * the fused native [[graft.functions.RegexpCount]] (no match-array
    * allocation); the scrub is three chained codegen'd
    * `regexp_replace` calls. Shape at scale: one projection pass over
    * the corpus — no shuffle, no UDF, partition-parallel at any size. */
  def piiScrub(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.classic.GraftColumnBridge.{column, expression}
    def rcount(pat: String) =
      column(graft.functions.RegexpCount(
        expression(col("text")), expression(lit(pat)))).cast(LongType)
    // NO fan: three regexp_replace passes measured cheaper than the
    // shuffle the fan adds (r21: 1.04 -> 1.20 s per rep — VERDICT r21
    // #7's cost floor, static call-site decision)
    docs.select(col("doc_id"),
      regexp_replace(
        regexp_replace(
          regexp_replace(col("text"), EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("text_clean"),
      rcount(EmailRe).as("n_emails"),
      rcount(Ipv4Re).as("n_ips"),
      rcount(PhoneRe).as("n_phones"))
  }

  val textPiiScrub: Q = (s, dir) =>
    piiScrub(t(s, dir, "documents")).orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "x_text_pii_scrub" -> textPiiScrub,
    "x_text_rarity" -> textRarity,
    "x_text_collocations" -> textCollocations,
    "x_text_eval_confusion" -> textEvalConfusion,
    "x_text_contamination" -> textContamination,
    "x_text_contamination_bloom" -> textContaminationBloom,
    "x_text_source_overlap" -> textSourceOverlap,
    "x_text_mix_stats" -> textMixStats,
    "x_text_repetition" -> textRepetition,
    "x_dedup_simhash_portable" -> textSimhashPortable,
    "x_text_tokens" -> textTokens,
    "x_text_tokens_bpe" -> textTokensBpe,
    "x_text_quality" -> textQuality,
    "x_text_langid" -> textLangId,
    "x_text_topicid" -> textTopicId,
    "x_text_fingerprint" -> textFingerprint,
    "x_text_rolling_hash" -> textRollingHash,
    "x_text_winnowing" -> textWinnowing)

  private def hitsSql(listExpr: String, words: Seq[String]): String =
    s"CAST(len(list_filter($listExpr, w -> w IN (${words.map(w => s"'$w'").mkString(",")}))) AS INT)"

  private val wsExpr = "regexp_split_to_array(trim(text), '\\s+')"

  /** Shared by the plain and bloom-prefiltered decontamination rows —
    * the bloom leg's contract is output identity. */
  private val contaminationSql: String =
    (s"WITH w AS (SELECT doc_id, $wsExpr AS ws FROM documents), " +
      "g AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS g FROM w, unnest(range(1, len(ws)-2)) AS u(i) WHERE len(ws) >= 4), " +
      "e AS (SELECT DISTINCT g FROM g WHERE doc_id < 10) " +
      "SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_hit_grams FROM g JOIN e USING (g) " +
      "WHERE g.doc_id >= 10 GROUP BY g.doc_id ORDER BY doc_id")

  private val sourceOverlapSql: String =
    (s"WITH w AS (SELECT source, $wsExpr AS ws FROM documents), " +
      "g AS (SELECT DISTINCT source, array_to_string(ws[i:i+3], ' ') AS g " +
      "FROM w, unnest(range(1, len(ws)-2)) AS u(i) WHERE len(ws) >= 4), " +
      "sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams_a FROM g GROUP BY source), " +
      "p AS (SELECT a.source AS src_a, b.source AS src_b, CAST(COUNT(*) AS BIGINT) AS n_shared " +
      "FROM g a JOIN g b USING (g) WHERE a.source <> b.source GROUP BY 1, 2) " +
      "SELECT src_a, src_b, n_shared, n_grams_a, " +
      "CAST(n_shared * 10000 // n_grams_a AS BIGINT) AS containment_bp " +
      "FROM p JOIN sz ON sz.source = p.src_a ORDER BY src_a, src_b")

  val oracles: Map[String, String] = Map(
    "x_text_source_overlap" -> sourceOverlapSql,
    "x_text_pii_scrub" ->
      (s"SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text, " +
        s"'$EmailRe', '<EMAIL>', 'g'), '$Ipv4Re', '<IP>', 'g'), " +
        s"'$PhoneRe', '<PHONE>', 'g') AS text_clean, " +
        s"CAST(len(regexp_extract_all(text, '$EmailRe')) AS BIGINT) AS n_emails, " +
        s"CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ips, " +
        s"CAST(len(regexp_extract_all(text, '$PhoneRe')) AS BIGINT) AS n_phones " +
        "FROM documents ORDER BY doc_id"),
    "x_text_rarity" ->
      (s"WITH d AS (SELECT doc_id, $wsExpr AS arr FROM documents), " +
        "p AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr)-1)) AS i FROM d WHERE len(arr) >= 2), " +
        "b AS (SELECT doc_id, arr[i] AS w1, arr[i+1] AS w2 FROM p), " +
        "g AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS n_occ FROM b GROUP BY doc_id, w1, w2), " +
        "c AS (SELECT doc_id, n_occ, CAST(SUM(n_occ) OVER (PARTITION BY w1, w2) AS BIGINT) AS corpus_n FROM g), " +
        "a AS (SELECT doc_id, CAST(SUM(n_occ) AS BIGINT) AS n_bigrams, MIN(corpus_n) AS rarest_n, " +
        "CAST(SUM(CASE WHEN corpus_n <= 2 THEN n_occ ELSE 0 END) AS BIGINT) AS n_rare FROM c GROUP BY doc_id) " +
        "SELECT documents.doc_id, CAST(COALESCE(n_bigrams, 0) AS BIGINT) AS n_bigrams, " +
        "CAST(COALESCE(rarest_n, 0) AS BIGINT) AS rarest_n, CAST(COALESCE(n_rare, 0) AS BIGINT) AS n_rare " +
        "FROM documents LEFT JOIN a USING (doc_id) ORDER BY doc_id"),
    "x_text_collocations" ->
      (s"WITH d AS (SELECT $wsExpr AS arr FROM documents), " +
        "p AS (SELECT arr, unnest(generate_series(1, len(arr)-1)) AS i FROM d WHERE len(arr) >= 2), " +
        "b AS (SELECT arr[i] AS w1, arr[i+1] AS w2 FROM p), " +
        "pc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_pair FROM b GROUP BY w1, w2), " +
        "u AS (SELECT unnest(arr) AS w FROM d), " +
        "uc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_w FROM u GROUP BY w), " +
        "tot AS (SELECT CAST(SUM(n_pair) AS BIGINT) AS n_total FROM pc) " +
        "SELECT w1, w2, n_pair, u1.n_w AS n_w1, u2.n_w AS n_w2, " +
        "(CAST(n_pair AS DOUBLE) * CAST(n_total AS DOUBLE)) / " +
        "(CAST(u1.n_w AS DOUBLE) * CAST(u2.n_w AS DOUBLE)) AS lift " +
        "FROM pc JOIN uc u1 ON pc.w1 = u1.w JOIN uc u2 ON pc.w2 = u2.w CROSS JOIN tot " +
        "ORDER BY n_pair DESC, w1, w2 LIMIT 50"),
    "x_text_tokens" ->
      s"SELECT doc_id, CAST(len($wsExpr) AS INT) AS n_tokens FROM documents ORDER BY doc_id",
    "x_text_tokens_bpe" ->
      ("SELECT doc_id, CAST(len(regexp_extract_all(text, " +
        "'''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+')) AS INT) " +
        "AS n_bpe_tokens FROM documents ORDER BY doc_id"),
    "x_text_quality" ->
      (s"SELECT doc_id, CAST(length(text) AS INT) AS n_chars_calc, CAST(len($wsExpr) AS INT) AS n_tokens, " +
        s"length(regexp_replace(text, '\\s+', '', 'g')) / len($wsExpr) AS avg_token_len, " +
        s"${hitsSql(wsExpr, Seq("the", "a", "of", "and"))} / CAST(len($wsExpr) AS INT) AS stopword_ratio, " +
        "(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))) / length(text) AS digit_ratio, " +
        "(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) / length(text) AS upper_ratio " +
        "FROM documents ORDER BY doc_id"),
    "x_text_langid" -> {
      val p = langProfiles.toMap
      s"WITH s AS (SELECT doc_id, ${hitsSql(wsExpr, p("de"))} AS score_de, ${hitsSql(wsExpr, p("en"))} AS score_en, " +
        s"${hitsSql(wsExpr, p("es"))} AS score_es, ${hitsSql(wsExpr, p("fr"))} AS score_fr FROM documents) " +
        "SELECT doc_id, score_de, score_en, score_es, score_fr, " +
        "CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de' " +
        "WHEN score_en >= score_es AND score_en >= score_fr THEN 'en' " +
        "WHEN score_es >= score_fr THEN 'es' ELSE 'fr' END AS predicted FROM s ORDER BY doc_id"
    },
    "x_text_eval_confusion" -> {
      val p = langProfiles.toMap
      s"WITH s AS (SELECT doc_id, lang, ${hitsSql(wsExpr, p("de"))} AS score_de, ${hitsSql(wsExpr, p("en"))} AS score_en, " +
        s"${hitsSql(wsExpr, p("es"))} AS score_es, ${hitsSql(wsExpr, p("fr"))} AS score_fr FROM documents), " +
        "pr AS (SELECT lang AS truth, " +
        "CASE WHEN score_de >= score_en AND score_de >= score_es AND score_de >= score_fr THEN 'de' " +
        "WHEN score_en >= score_es AND score_en >= score_fr THEN 'en' " +
        "WHEN score_es >= score_fr THEN 'es' ELSE 'fr' END AS predicted FROM s) " +
        "SELECT truth, predicted, CAST(COUNT(*) AS BIGINT) AS n FROM pr " +
        "GROUP BY truth, predicted ORDER BY truth, predicted"
    },
    "x_text_topicid" -> {
      val p = topicProfiles.toMap
      s"WITH s AS (SELECT doc_id, ${hitsSql(wsExpr, p("perf"))} AS score_perf, ${hitsSql(wsExpr, p("relational"))} AS score_relational, " +
        s"${hitsSql(wsExpr, p("streaming"))} AS score_streaming FROM documents) " +
        "SELECT doc_id, score_perf, score_relational, score_streaming, " +
        "CASE WHEN score_perf >= score_relational AND score_perf >= score_streaming THEN 'perf' " +
        "WHEN score_relational >= score_streaming THEN 'relational' ELSE 'streaming' END AS predicted FROM s ORDER BY doc_id"
    },
    "x_text_fingerprint" ->
      s"SELECT doc_id, md5(array_to_string(list_sort(list_distinct($wsExpr)), ' ')) AS fingerprint FROM documents ORDER BY doc_id",
    "x_text_rolling_hash" ->
      ("SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(list_filter(string_split(text, ''), c -> c <> ''), c -> CAST(unicode(c) AS BIGINT))), " +
        "(a, b) -> (a * 257 + b) % 1000000000000000) AS rolling_hash " +
        "FROM documents ORDER BY doc_id"),
    "x_text_winnowing" ->
      ("WITH cps AS (SELECT doc_id, list_transform(list_filter(string_split(text, ''), c -> c <> ''), " +
        "c -> CAST(unicode(c) AS BIGINT)) AS cp FROM documents), " +
        "g AS (SELECT doc_id, list_transform(range(0, len(cp) - 7), " +
        "p -> list_reduce(list_prepend(CAST(0 AS BIGINT), cp[p+1:p+8]), (a, b) -> (a * 257 + b) % 1000000000000000)) AS gh FROM cps) " +
        "SELECT doc_id, CAST(p AS INT) AS pos, gh[p+1] AS hash " +
        "FROM g, unnest(range(3, len(gh))) AS t(p) " +
        "WHERE gh[p+1] = list_min(gh[p-2:p+1]) " +
        "ORDER BY doc_id, pos"),
    // bloom twin is output-identical by contract -> one shared oracle
    "x_text_contamination_bloom" -> contaminationSql,
    "x_text_contamination" -> contaminationSql,
    "x_text_mix_stats" ->
      (s"WITH s AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        s"CAST(SUM(len($wsExpr)) AS BIGINT) AS n_tokens FROM documents GROUP BY source) " +
        "SELECT source, n_docs, n_tokens, " +
        "n_tokens / CAST(SUM(n_tokens) OVER () AS BIGINT) AS token_share " +
        "FROM s ORDER BY source"),
    "x_text_repetition" ->
      (s"WITH w AS (SELECT doc_id, $wsExpr AS ws FROM documents), " +
        "g AS (SELECT doc_id, ws, CASE WHEN len(ws) >= 3 THEN " +
        "list_transform(range(1, len(ws) - 1), i -> array_to_string(ws[i:i+2], ' ')) END AS grams FROM w) " +
        "SELECT doc_id, CAST(len(ws) AS INT) AS n_tokens, CAST(len(list_distinct(ws)) AS INT) AS n_distinct, " +
        "1.0 - CAST(len(list_distinct(grams)) AS INT) / CAST(len(grams) AS INT) AS dup_3gram_ratio, " +
        "CAST(list_max(list_transform(list_distinct(ws), t -> len(list_filter(ws, x -> x = t)))) AS INT) / CAST(len(ws) AS INT) AS top_token_ratio " +
        "FROM g ORDER BY doc_id"),
    "x_dedup_simhash_portable" ->
      (simhash32SqlCtes + " SELECT doc_id, " + simhash32SqlExpr +
        " AS simhash32 FROM s ORDER BY doc_id"))

  /** DuckDB rendering of [[simhash32]], shared with the portable
    * pairs oracle in [[Dedup]]: the WITH-clause prefix and the final
    * signature expression over alias `s`. */
  private[operators] lazy val simhash32SqlCtes: String = {
    val th0 = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      "list_transform(list_filter(string_split(tok, ''), c -> c <> ''), c -> CAST(unicode(c) AS BIGINT))), " +
      "(a, b) -> (a * 31 + b) % 4294967296)"
    val bitSums = (0 until 32).map(i =>
      s"SUM(CASE WHEN (th >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS b$i").mkString(", ")
    s"WITH tk AS (SELECT doc_id, unnest(list_distinct($wsExpr)) AS tok FROM documents), " +
      s"h0 AS (SELECT doc_id, $th0 AS th0 FROM tk), " +
      "hm1 AS (SELECT doc_id, (xor(th0, th0 >> 16) * 73244475) % 4294967296 AS th1 FROM h0), " +
      "hm2 AS (SELECT doc_id, (xor(th1, th1 >> 16) * 73244475) % 4294967296 AS th2 FROM hm1), " +
      "h AS (SELECT doc_id, xor(th2, th2 >> 16) AS th FROM hm2), " +
      s"s AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)"
  }

  private[operators] lazy val simhash32SqlExpr: String =
    "CAST(" + (0 until 32).map(i =>
      s"CASE WHEN b$i > 0 THEN ${1L << i} ELSE 0 END").mkString(" + ") + " AS BIGINT)"
}
