package graft.operators

import graft.core.Tables.t
import graft.operators.TextAnalysis.tokens
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Record-linkage similarity joins: edit-distance fuzzy matching over
  * short string keys and exact term-frequency cosine over token
  * multisets. (Driver north star — the reference's nearest analog is
  * its synonym/identifier harmonization joins, e.g.
  * /root/reference/PharmacoDI/build_synonym_tables.py:15-60, which
  * match free-text drug/cell names across sources; these operators are
  * the scalable form of that matching.)
  *
  * Scale design:
  *  - [[editDistancePairs]] blocks with DELETION NEIGHBORHOODS, not
  *    q-grams: every string emits its <= `maxDist`-deletion variants
  *    (a complete candidate condition — any edit script of cost <= d
  *    aligns the two strings on a common subsequence reachable by <= d
  *    deletions from each side), so the equi-join key is a variant
  *    hash whose posting list holds only near-matches. Q-gram blocking
  *    collapses here: one shared prefix gram ("Customer#00" at df =
  *    |table|) costs df^2 candidates — the same stop-shingle blowup
  *    [[Dedup]] caps, except UNCAPPABLE because the discriminating
  *    grams are exactly the ones boilerplate drowns. Variant volume is
  *    |s| per row at d=1 (|s|^2/2 at d=2) — linear fan-out on short
  *    link keys, shuffled as 8-byte hashes.
  *  - [[tfCosinePairs]] is an inverted-index join (posting-list
  *    self-join on the token, partial-aggregated pair dot products) —
  *    never a document cross join; `maxDf` drops stop tokens exactly
  *    as [[Dedup.jaccardPairs]] does.
  *  - Both verify candidates EXACTLY in integer arithmetic
  *    (levenshtein / 100*dot^2 >= 81*n2a*n2b), so outputs are
  *    bit-portable across engines and partitionings.
  */
object Linkage {

  type Q = (SparkSession, String) => DataFrame

  /** All <= `d`-deletion variants of string column `s` (including `s`
    * itself), distinct. d=0 -> [s]. Pure codegen'd higher-order
    * functions — no UDF. The empty string maps to [s] alone
    * (sequence(1, 0) would COUNT DOWN — see the d=1 guard). */
  private def deletionVariants(s: Column, d: Int): Column = {
    require(d >= 0 && d <= 2, s"maxDist must be 0..2 (got $d)")
    def del1(arr: Column): Column =
      // one deletion applied to every member of arr, flattened:
      // member v of length L yields L strings (drop position i).
      array_distinct(flatten(transform(arr, v =>
        when(length(v) <= 0, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), length(v)), i =>
            concat(v.substr(lit(1), i - 1), v.substr(i + 1, lit(999999))))))))
    val base = array(s)
    d match {
      case 0 => base
      case 1 => array_distinct(concat(base, del1(base)))
      case 2 =>
        val one = del1(base)
        array_distinct(concat(base, one, del1(one)))
    }
  }

  /** Fuzzy self-join: all `(id_a, id_b, dist)` with
    * `levenshtein(s_a, s_b) <= maxDist` and `id_a < id_b`, over a
    * frame carrying (`id`, `s`). Exact — deletion-neighborhood
    * blocking is candidate-complete (see object doc) and every
    * candidate is verified with the codegen'd levenshtein. Intended
    * for short link keys (names, titles, identifiers): variant
    * fan-out is |s| per row at d=1, |s|^2/2 at d=2.
    *
    * Plan shape: explode variants -> equi-join on the 8-byte variant
    * hash -> distinct pair -> one broadcast-free verify join back to
    * the (id, s) table per side. No stage is quadratic in the table;
    * candidate volume is bounded by true-match volume times variant
    * overlap multiplicity (then distinct'd). */
  def editDistancePairs(df: DataFrame, id: Column, s: Column,
      maxDist: Int = 1): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (got $maxDist)")
    val base = graft.core.Materialize.pin(
      graft.core.Fanout.bySize(df.select(id.as("__id"), s.as("__s")),
        col("__id")))
    val posts = base.select(col("__id"),
      explode(deletionVariants(col("__s"), maxDist)).as("__v"))
      .select(col("__id"), xxhash64(col("__v")).as("__vh"))
    val cand = posts.select(col("__id").as("id_a"), col("__vh"))
      .join(posts.select(col("__id").as("id_b"), col("__vh")), Seq("__vh"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    cand
      .join(base.select(col("__id").as("id_a"), col("__s").as("__sa")), Seq("id_a"))
      .join(base.select(col("__id").as("id_b"), col("__s").as("__sb")), Seq("id_b"))
      // thresholded levenshtein early-exits the DP once the distance
      // can no longer come in under maxDist (returns -1 instead):
      // O(maxDist * len) per candidate, not O(len^2)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("__sa"), col("__sb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Gate query: ED<=1 fuzzy self-join on customer names — the
    * record-linkage shape (ids differing by one digit collide). */
  val linkEditNames: Q = (s, dir) =>
    editDistancePairs(t(s, dir, "customer"), col("c_custkey"), col("c_name"), 1)
      .withColumnsRenamed(Map("id_a" -> "cust_a", "id_b" -> "cust_b"))
      .orderBy("cust_a", "cust_b")

  /** Sorted-neighborhood blocking (Hernández/Stolfo 1995): total-sort
    * the records on the link key, then candidates are only pairs
    * within `window` positions — a FIXED n*(window-1) candidate budget
    * regardless of key length or typo model, where
    * [[editDistancePairs]]' deletion fan-out grows with |s| (d=1) or
    * |s|^2 (d=2). The complementary trade: deletion blocking is
    * candidate-COMPLETE for its distance bound; sorted-neighborhood is
    * not — a typo in the leading characters teleports a record across
    * the sort order and out of its twin's window (Round13Spec pins
    * both sides of this trade). Production recipe: multiple passes
    * with independent keys (name, reversed name, phonetic) union'd —
    * each pass is this operator.
    *
    * Scale shape: the global position comes from [[graft.core.Ids
    * .denseId]] (range-partitioned total sort + per-partition offsets
    * — never a single-partition window); each record then probes its
    * window-1 successors through ONE equi-join on position, and every
    * candidate is verified with the thresholded codegen'd levenshtein.
    * Nothing is quadratic; nothing is driver-side. */
  def sortedNeighborhoodPairs(df: DataFrame, id: Column, s: Column,
      window: Int, maxDist: Int = 1,
      keyOf: Column => Column = identity): DataFrame = {
    require(window >= 2, s"window must cover at least one neighbor (got $window)")
    val base = df.select(id.as("__id"), s.as("__s"),
      keyOf(s).as("__k"))
    // no outer pin: denseId already pins its sorted frame internally,
    // so both consumers below re-derive positions from that cache with
    // one cheap offsets join each — pinning again would hold a SECOND
    // corpus-sized copy for the whole session (r13 self-review)
    val pos = graft.core.Ids.denseId(base, Seq(col("__k"), col("__id")), "__pos")
    val probes = pos.select(col("__id").as("ia"), col("__s").as("__sa"),
      explode(expr(s"transform(sequence(1, ${window - 1}), o -> __pos + o)"))
        .as("__ppos"))
    probes.join(pos.select(col("__id").as("ib"), col("__s").as("__sb"),
        col("__pos").as("__ppos")), Seq("__ppos"))
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"),
        levenshtein(col("__sa"), col("__sb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }

  /** Multi-pass sorted neighborhood — the standard remedy for the
    * single-key blind spot: run one pass per independent sort key
    * (name, reversed name, a phonetic code, ...) and union the
    * verified pairs. A head typo that escapes the forward-sorted
    * window is tail-adjacent under the reversed key; k passes cost
    * k * n * (window-1) candidates, still linear. Pairs found by
    * several passes dedup on (id_a, id_b, dist) — dist is a function
    * of the pair, so distinct is exact. */
  def sortedNeighborhoodMultiPass(df: DataFrame, id: Column, s: Column,
      window: Int, maxDist: Int,
      keys: Seq[Column => Column]): DataFrame = {
    require(keys.nonEmpty, "at least one sort key pass")
    keys.map(k => sortedNeighborhoodPairs(df, id, s, window, maxDist, k))
      .reduce(_ unionByName _).distinct()
  }

  /** Phonetic sort key for the multi-pass scaffold: soundex code first
    * (Spark's codegen'd `SoundEx` — no UDF), full string as the
    * intra-block tiebreak so equal-code records sort deterministically
    * and land adjacent. This closes the blind spot the forward and
    * reversed passes SHARE: an adjacent transposition ("Johnson" →
    * "Jhonson") breaks the head for the forward sort AND sits far from
    * the tail anchor under enough same-suffix neighbors, but soundex
    * is transposition-stable for same-class consonants, so both
    * variants key to the same block (Round14Spec pins the case).
    *
    * Deliberately NOT added to the `x_link_sn_multipass` gate row: the
    * gate corpus's `c_name` values share the constant "Customer#"
    * prefix and differ only in DIGITS, which soundex ignores — every
    * row would key to the same code ("C236"), collapsing the phonetic
    * pass into a duplicate of the forward pass (same tiebreak order,
    * zero new recall) while roughly doubling the row's cost. The pass
    * earns its budget on letter-bearing person/org names, which the
    * spec fixture models. */
  val phoneticKey: Column => Column = s => concat(soundex(upper(s)), s)

  /** Gate twin of [[linkEditNames]] under the fixed-budget blocking:
    * ED<=1 pairs whose names sit within 10 sort positions. */
  val linkSortedNeighborhood: Q = (s, dir) =>
    sortedNeighborhoodPairs(t(s, dir, "customer"), col("c_custkey"),
      col("c_name"), window = 10, maxDist = 1)
      .withColumnsRenamed(Map("id_a" -> "cust_a", "id_b" -> "cust_b"))
      .orderBy("cust_a", "cust_b")

  /** Two-pass gate: forward + reversed-name sort keys union'd. */
  val linkSnMultipass: Q = (s, dir) =>
    sortedNeighborhoodMultiPass(t(s, dir, "customer"), col("c_custkey"),
      col("c_name"), window = 10, maxDist = 1,
      keys = Seq(identity, reverse))
      .withColumnsRenamed(Map("id_a" -> "cust_a", "id_b" -> "cust_b"))
      .orderBy("cust_a", "cust_b")

  /** Exact term-frequency cosine similarity self-join: all doc pairs
    * with cos(tf_a, tf_b) >= `minCos` over whitespace-token multisets,
    * where `minCos` is a RATIONAL p/q so the threshold test runs in
    * exact int64 arithmetic: cos >= p/q <=> q^2 * dot^2 >= p^2 *
    * n2a * n2b (dot, n2 integral). No floating point touches the
    * decision, so output membership is bit-portable across engines,
    * partition orders, and scale factors; the reported `cos` is the
    * two-op sqrt+divide form (both correctly rounded, engine-stable).
    *
    * Overflow headroom: the guard term is q^2*dot^2 — int64 holds
    * dot <= ~3e9/q; dot is bounded by max tokens/doc * max tf, fine
    * for documents (1e4 tokens, tf ~ 1e2 -> dot ~ 1e6). At corpus
    * scale pass `maxDf` to drop stop tokens from the measure (same
    * contract as [[Dedup.jaccardPairs]]' cap — boilerplate should not
    * vote for similarity).
    *
    * Scale shape: tf groupBy (map-combined), posting self-join on the
    * token (sum over tokens df^2 — the `maxDf` knob's target), pair
    * dot partial-agg, two norm joins. One row per candidate pair ever
    * shuffles. */
  def tfCosinePairs(docs: DataFrame, pNum: Int, pDen: Int,
      maxDf: Option[Long] = None): DataFrame = {
    require(pNum > 0 && pDen > 0 && pNum <= pDen,
      s"minCos must be rational in (0,1]: got $pNum/$pDen")
    val tf0 = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
    val tfAll = graft.core.Materialize.pin(maxDf match {
      case None => tf0
      case Some(cap) =>
        val df = tf0.groupBy("w").agg(count(lit(1)).as("__df"))
        tf0.join(df.filter(col("__df") <= cap).select("w"), Seq("w"))
    })
    val n2 = tfAll.groupBy("doc_id").agg(sum(col("tf") * col("tf")).as("n2"))
    val dot = tfAll.select(col("doc_id").as("doc_a"), col("w"), col("tf").as("tf_a"))
      .join(tfAll.select(col("doc_id").as("doc_b"), col("w"), col("tf").as("tf_b")),
        Seq("w"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(sum(col("tf_a") * col("tf_b")).as("dot"))
    dot
      .join(n2.select(col("doc_id").as("doc_a"), col("n2").as("n2_a")), Seq("doc_a"))
      .join(n2.select(col("doc_id").as("doc_b"), col("n2").as("n2_b")), Seq("doc_b"))
      .filter(lit(pDen.toLong * pDen) * col("dot") * col("dot") >=
        lit(pNum.toLong * pNum) * col("n2_a") * col("n2_b"))
      .select(col("doc_a"), col("doc_b"), col("dot"),
        (col("dot").cast("double") /
          sqrt((col("n2_a") * col("n2_b")).cast("double"))).as("cos"))
  }

  /** Gate query: tf-cosine >= 0.85 over a deterministic 1/10th of the
    * documents corpus. The subsample is a semantic necessity, not a
    * shortcut: the synthetic corpus draws from a 31-word vocabulary,
    * so every posting list spans ~the whole corpus and MOST pairs
    * genuinely clear 0.9 — the output itself is Θ(n²), and no
    * implementation outruns its own result set (the r9 bench's 121 s
    * row was this, in both engines). The gate verifies the exact
    * rational-arithmetic semantics; the linear-regime cost story
    * (vocab growing with corpus, df bounded) is soak-verified, and
    * real corpora near this degenerate regime take the `maxDf` cap. */
  val linkTfCosine: Q = (s, dir) =>
    tfCosinePairs(t(s, dir, "documents").filter(pmod(col("doc_id"), lit(10)) === 0),
      17, 20)
      .orderBy("doc_a", "doc_b")

  val queries: Map[String, Q] = Map(
    "x_link_edit_names" -> linkEditNames,
    "x_link_sorted_neighborhood" -> linkSortedNeighborhood,
    "x_link_sn_multipass" -> linkSnMultipass,
    "x_link_tf_cosine" -> linkTfCosine)

  val oracles: Map[String, String] = Map(
    "x_link_edit_names" ->
      ("SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b, " +
        "CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist " +
        "FROM customer a, customer b " +
        "WHERE a.c_custkey < b.c_custkey AND levenshtein(a.c_name, b.c_name) <= 1 " +
        "ORDER BY cust_a, cust_b"),
    "x_link_sorted_neighborhood" ->
      ("WITH p AS (SELECT c_custkey AS id, c_name AS s, " +
        "row_number() OVER (ORDER BY c_name, c_custkey) AS pos FROM customer), " +
        "c AS (SELECT a.id AS ia, b.id AS ib, a.s AS sa, b.s AS sb " +
        "FROM p a JOIN p b ON b.pos > a.pos AND b.pos < a.pos + 10) " +
        "SELECT LEAST(ia, ib) AS cust_a, GREATEST(ia, ib) AS cust_b, " +
        "CAST(levenshtein(sa, sb) AS INT) AS dist " +
        "FROM c WHERE levenshtein(sa, sb) <= 1 ORDER BY cust_a, cust_b"),
    "x_link_sn_multipass" ->
      ("WITH p1 AS (SELECT c_custkey AS id, c_name AS s, " +
        "row_number() OVER (ORDER BY c_name, c_custkey) AS pos FROM customer), " +
        "p2 AS (SELECT c_custkey AS id, c_name AS s, " +
        "row_number() OVER (ORDER BY reverse(c_name), c_custkey) AS pos FROM customer), " +
        "c AS (SELECT a.id AS ia, b.id AS ib, a.s AS sa, b.s AS sb " +
        "FROM p1 a JOIN p1 b ON b.pos > a.pos AND b.pos < a.pos + 10 " +
        "UNION ALL SELECT a.id, b.id, a.s, b.s " +
        "FROM p2 a JOIN p2 b ON b.pos > a.pos AND b.pos < a.pos + 10) " +
        "SELECT DISTINCT LEAST(ia, ib) AS cust_a, GREATEST(ia, ib) AS cust_b, " +
        "CAST(levenshtein(sa, sb) AS INT) AS dist " +
        "FROM c WHERE levenshtein(sa, sb) <= 1 ORDER BY cust_a, cust_b"),
    "x_link_tf_cosine" ->
      ("WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w FROM documents WHERE doc_id % 10 = 0), " +
        "tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY 1, 2), " +
        "n2 AS (SELECT doc_id, CAST(SUM(tf*tf) AS BIGINT) AS n2 FROM tf GROUP BY doc_id), " +
        "dt AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(SUM(a.tf*b.tf) AS BIGINT) AS dot " +
        "FROM tf a JOIN tf b ON a.w = b.w AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT doc_a, doc_b, dot, " +
        "CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE)) AS cos " +
        "FROM dt JOIN n2 na ON na.doc_id = doc_a JOIN n2 nb ON nb.doc_id = doc_b " +
        "WHERE 400 * dot * dot >= 289 * na.n2 * nb.n2 " +
        "ORDER BY doc_a, doc_b"))
}
