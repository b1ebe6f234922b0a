package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** End-to-end corpus curation — the composed flagship of the
  * training-data extensions: one query that chains the filters a
  * production pipeline runs before training (C4/Gopher shape:
  * language-ID -> length gate -> near-dup canonical drop ->
  * benchmark decontamination -> dataset-mix accounting), built
  * entirely from the already-oracle-checked pieces so the WHOLE
  * composition is DuckDB-hash-checked, not just its parts.
  *
  * Stage order mirrors practice: cheap per-row gates first (langid +
  * length are one codegen'd scan that prunes the corpus before
  * anything shuffles), then near-dup clustering on the SURVIVORS
  * (shingle inverted-index -> verified Jaccard pairs -> min-label
  * connected components; non-canonical members dropped), then the
  * decontamination anti-join (eval 4-grams broadcast, corpus never
  * shuffled for it), and finally the per-source doc/token accounting
  * that feeds sampling weights. At 100 TB every cross-row step here
  * keys on doc_id or a 16-byte hash — never payloads.
  */
object Curation {

  type Q = (SparkSession, String) => DataFrame

  val MinTokens = 30

  /** docs with doc_id < evalSplit play the held-out benchmark; the
    * rest are the training corpus being curated.
    *
    * `nearDupPairs` generates the verified near-dup pairs
    * (docs, minJaccard) => (doc_a, doc_b, ...). Default is
    * [[Dedup.minhashLsh]] at its 8x4 banding — banded equi-join
    * candidates, exact-Jaccard verification — the
    * linear-candidate-cost 100 TB path. Recall caveat (this is a
    * property of banding, not of the threshold): 8 bands x 4 rows
    * gives a pair at Jaccard j a candidate probability of
    * 1-(1-j^4)^8 — only ~0.40 at j=0.5, >0.999 by j~0.85. On the
    * gate corpora the two wirings ARE output-identical (CurationSpec
    * and the x_dedup_minhash_lsh oracle assert it) because their
    * near-dup clusters sit at ~0.87 Jaccard, far above the band
    * knee; that identity is an empirical fact about those corpora,
    * NOT a general contract. On corpora with borderline pairs
    * (0.5 <= j < ~0.8) the LSH default will under-deduplicate
    * relative to [[exactPairs]] — use [[highRecallPairs]] (64x2
    * banding: ~0.9999 at j=0.5, at the cost of a wider candidate
    * set) or [[exactPairs]] (exact, quadratic candidates) when
    * borderline recall matters more than candidate cost. */
  def curate(docs: DataFrame, evalSplit: Long = 10L,
      minTokens: Int = MinTokens,
      nearDupPairs: (DataFrame, Double) => DataFrame =
        (d, j) => Dedup.minhashLsh(d, j)): DataFrame = {
    // per-row gates: language argmax + token-count floor, one scan —
    // pinned, because THREE consumers re-execute it otherwise (the
    // near-dup branch, the contamination branch, and the final
    // accounting join), i.e. three language classifications of the
    // whole corpus instead of one (isolated timing at sf0.1:
    // 9.2s -> 8.9s cold, 4.8s -> 4.2s warm with the pin)
    val base = graft.core.Materialize.pin(
      TextAnalysis.classify(docs.filter(col("doc_id") >= evalSplit),
        "text", TextAnalysis.langProfiles)
      .filter(col("predicted") === "en")
      .withColumn("ws", TextAnalysis.tokens(col("text")))
      .filter(size(col("ws")) >= minTokens)
      .select(col("doc_id"), col("source"), col("text"), col("ws")))
    // near-dup canonical drop over the survivors: keep each cluster's
    // min-id member
    val dupDrop = Dedup.canonicalClusters(
        nearDupPairs(base.select("doc_id", "text"), 0.5))
      .filter(col("doc_id") =!= col("canonical_id"))
      .select("doc_id")
    // decontamination: any corpus doc sharing a 4-gram with the eval
    // set is dropped (eval grams broadcast; corpus side unshuffled)
    val evalGrams = docs.filter(col("doc_id") < evalSplit)
      .select(TextAnalysis.tokens(col("text")).as("ws"))
      .select(explode(TextAnalysis.wordNgrams(col("ws"), 4)).as("g"))
      .distinct()
    val contaminated = base
      .select(col("doc_id"), explode(TextAnalysis.wordNgrams(col("ws"), 4)).as("g"))
      .join(broadcast(evalGrams), Seq("g"))
      .select("doc_id").distinct()
    base
      .join(dupDrop, Seq("doc_id"), "left_anti")
      .join(contaminated, Seq("doc_id"), "left_anti")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(size(col("ws")).cast(LongType)).as("n_tokens"))
      .orderBy("source")
  }

  /** Exact inverted-index pair generation (quadratic candidate space)
    * — the oracle-shaped cross-check wiring for [[curate]]. */
  val exactPairs: (DataFrame, Double) => DataFrame =
    (docs, j) => Dedup.jaccardPairs(Dedup.shingles(docs), j)

  /** High-recall LSH wiring: 64 hashes x 2-row bands = 32 bands, so a
    * borderline pair at j=0.5 is a candidate w.p. ~1-(0.75)^32 ~=
    * 0.9999 (vs ~0.40 for the 8x4 default). Still linear candidate
    * cost — the extra bands widen the candidate set (more verify
    * work), they do not reintroduce the quadratic pair space. */
  val highRecallPairs: (DataFrame, Double) => DataFrame =
    (docs, j) => Dedup.minhashLsh(docs, j, numHashes = 64, bandRows = 2)

  val pipelineCuration: Q = (s, dir) => curate(t(s, dir, "documents"))

  val queries: Map[String, Q] = Map(
    "x_pipeline_curation" -> pipelineCuration)

  /** DuckDB mirror of the full chain. The language argmax repeats the
    * alphabetical tiebreak (de, en, es, fr) of
    * [[TextAnalysis.classify]]; clusters come from the same
    * recursive-CTE transitive closure the x_dedup_clusters oracle
    * uses, computed over the SAME filtered survivor set. */
  val oracles: Map[String, String] = Map(
    "x_pipeline_curation" -> {
      val ws = "regexp_split_to_array(trim(text), '\\s+')"
      def hits(words: Seq[String]): String =
        s"CAST(len(list_filter(ws, w -> w IN (${words.map(w => s"'$w'").mkString(",")}))) AS INT)"
      val p = TextAnalysis.langProfiles.toMap
      "WITH RECURSIVE " +
        s"w0 AS (SELECT doc_id, source, text, $ws AS ws FROM documents), " +
        s"sc AS (SELECT doc_id, source, text, ws, ${hits(p("de"))} AS s_de, ${hits(p("en"))} AS s_en, " +
        s"${hits(p("es"))} AS s_es, ${hits(p("fr"))} AS s_fr FROM w0 WHERE doc_id >= 10), " +
        "base AS (SELECT doc_id, source, text, ws FROM sc WHERE " +
        "NOT (s_de >= s_en AND s_de >= s_es AND s_de >= s_fr) AND s_en >= s_es AND s_en >= s_fr " +
        s"AND len(ws) >= $MinTokens), " +
        // near-dup clusters over the survivors (3-gram shingles, jaccard >= 0.5)
        "sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle " +
        "FROM base, unnest(range(1, len(ws)-1)) AS u(i) WHERE len(ws) >= 3), " +
        "cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id), " +
        "com AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common " +
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), " +
        "pairs AS (SELECT doc_a, doc_b FROM com JOIN cnt ca ON com.doc_a = ca.doc_id " +
        "JOIN cnt cb ON com.doc_b = cb.doc_id " +
        "WHERE common / (ca.n_sh + cb.n_sh - common) >= 0.5), " +
        "ed AS (SELECT doc_a AS src, doc_b AS dst FROM pairs UNION SELECT doc_b, doc_a FROM pairs), " +
        "nodes AS (SELECT DISTINCT src AS n FROM ed), " +
        "reach(a, b) AS (SELECT n, n FROM nodes UNION SELECT r.a, ed.dst FROM reach r JOIN ed ON r.b = ed.src), " +
        "cc AS (SELECT a AS doc_id, MIN(b) AS canonical_id FROM reach GROUP BY a), " +
        "dup AS (SELECT doc_id FROM cc WHERE doc_id <> canonical_id), " +
        // decontamination: corpus 4-grams vs eval 4-grams
        "g4 AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+3], ' ') AS g " +
        "FROM base, unnest(range(1, len(ws)-2)) AS u(i) WHERE len(ws) >= 4), " +
        "ev AS (SELECT DISTINCT array_to_string(ws[i:i+3], ' ') AS g " +
        "FROM w0, unnest(range(1, len(ws)-2)) AS u(i) WHERE doc_id < 10 AND len(ws) >= 4), " +
        "cont AS (SELECT DISTINCT doc_id FROM g4 JOIN ev USING (g)), " +
        "kept AS (SELECT * FROM base WHERE doc_id NOT IN (SELECT doc_id FROM dup) " +
        "AND doc_id NOT IN (SELECT doc_id FROM cont)) " +
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(len(ws)) AS BIGINT) AS n_tokens FROM kept GROUP BY source ORDER BY source"
    })
}
