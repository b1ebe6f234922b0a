package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the near-dup similarity graph (the edge lists
  * [[Dedup.jaccardPairs]] / [[Dedup.minhashLsh]] produce). Connected
  * components live in [[Dedup.canonicalClusters]]; this module adds
  * triangle counting — the local-clustering signal that separates
  * "mirror cluster" (dense, triangle-rich) from "chain of borderline
  * pairs" (triangle-free), which canonical-drop treats identically.
  *
  * Scale design (the standard degree-ordered orientation): orient every
  * undirected edge from its lower-(degree, id) endpoint to the higher
  * one. The oriented out-degree of ANY node is O(sqrt(|E|)) — even a
  * star's hub emits no wedges because all its edges point INTO it — so
  * the wedge join is bounded by sum(outdeg^2) <= |E|^1.5, the
  * arboricity bound, instead of the quadratic sum(deg^2) a naive
  * neighbor self-join pays on skewed degree distributions. Every step
  * is an equi-join or partial-aggregated groupBy; nothing quadratic in
  * nodes.
  */
object Graph {

  type Q = (SparkSession, String) => DataFrame

  /** Count triangles in an undirected simple graph given as unique
    * `(a, b)` pairs with `a < b`. Returns one row: `n_triangles`. */
  def triangleCount(edges0: DataFrame): DataFrame = {
    // the edge list is consumed by both union legs of `sym` (and the
    // subtree producing it — e.g. verified Jaccard pairs — can be the
    // expensive part of the whole query): pin it so pair generation
    // runs once, not once per consumer
    val edges = graft.core.Materialize.pin(edges0)
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("d"))
    // total order pi = (degree, id); orient u -> v iff pi(u) < pi(v).
    // Degrees ride along so wedge endpoints can be pi-compared without
    // another join. The degree table is NODE-sized — deliberately
    // un-hinted: AQE promotes it to a broadcast join while it fits and
    // falls back to a shuffle join on graphs whose node set outgrows
    // driver memory (the r9 kCorePeel eviction, applied here).
    val withDeg = sym
      .join(deg, Seq("u"))
      .join(deg.select(col("u").as("v"), col("d").as("dv")), Seq("v"))
    // oriented feeds the wedge join twice plus the closing semi-join —
    // pin it (edge-sized) so orientation runs once
    val oriented = graft.core.Materialize.pin(withDeg.filter(
        col("d") < col("dv") || (col("d") === col("dv") && col("u") < col("v")))
      .select(col("u"), col("v"), col("dv")))
    // wedges (v, w) out of each u, kept in pi order so the closing
    // edge (v -> w) is stored exactly once in `oriented`
    val out2 = oriented.select(col("u"), col("v").as("w"), col("dv").as("dw"))
    val wedges = oriented.join(out2, Seq("u"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v").as("u"), col("w").as("v"))
    wedges.join(oriented.select("u", "v"), Seq("u", "v"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
  }

  /** Gate query: triangles of the verified 0.5-Jaccard near-dup graph
    * — the same edge set the x_dedup_ngram_jaccard oracle checks
    * (including its no-op-at-gate-scale [[Dedup.GateMaxDf]] cap). */
  val graphTriangles: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(t(s, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    triangleCount(pairs)
  }

  /** The shared artifact all five `*_indexed` gates consume: the
    * verified near-dup edge list, built to parquet ONCE per run via
    * [[IndexStore.ensureEdgeIndex]] (per-JVM memo — whichever indexed
    * gate runs first pays the edge derivation, the other four reload).
    * This is the reference's build-once / query-many shape: every
    * consumer of the combined tables re-reads the keyed artifacts
    * rather than rebuilding (combine_pset_tables.py:230,
    * build_synonym_tables.py:38-43). */
  private def indexedEdges(s: SparkSession, dir: String): DataFrame = {
    val path = IndexStore.defaultPath("edges", dir)
    IndexStore.ensureEdgeIndex(t(s, dir, "documents"), path)
    IndexStore.loadEdgeIndex(s, path)
  }

  /** Gate query for the artifact flow: triangles from the loaded edge
    * artifact — must hash-match the rebuild twin [[graphTriangles]]
    * (same oracle). */
  val graphTrianglesIndexed: Q = (s, dir) => triangleCount(indexedEdges(s, dir))

  /** Artifact-flow twin of [[graphPageRank]] (same oracle). */
  val graphPageRankIndexed: Q = (s, dir) => pageRankInt(indexedEdges(s, dir))

  /** Artifact-flow twin of [[graphPpr]] (same oracle): seeds re-derived
    * from the artifact's edge set — identical by construction since
    * the artifact IS the same derivation, parquet-round-tripped. */
  val graphPprIndexed: Q = (s, dir) => {
    val edges = indexedEdges(s, dir)
    val pinned = graft.core.Materialize.pin(edges)
    val seeds = pinned.select(col("a").as("u"))
      .unionByName(pinned.select(col("b").as("u")))
      .distinct().orderBy("u").limit(5)
      .collect().map(_.getLong(0)).toSeq
    pprInt(pinned, seeds)
  }

  /** Artifact-flow twin of [[graphKCore]] (same oracle). */
  val graphKCoreIndexed: Q = (s, dir) => kCorePeel(indexedEdges(s, dir), k = 2)

  /** Artifact-flow twin of [[graphCommunities]] (same oracle). */
  val graphCommunitiesIndexed: Q = (s, dir) =>
    labelPropagate(indexedEdges(s, dir), rounds = 2)

  /** Artifact-flow twin of [[graphCommonNeighbors]] (same oracle). */
  val graphCommonNeighborsIndexed: Q = (s, dir) =>
    commonNeighbors(indexedEdges(s, dir), k = 20, maxDeg = Some(1000L))

  /** Integer-scaled PageRank over an undirected graph given as unique
    * `(a, b)` pairs with `a < b`, unrolled to a fixed `iters` rounds.
    *
    * Ranks are BIGINTs in units of `1/scale`: rank0 = scale for every
    * node, then `rank' = (15*scale) div 100 + (85 * sum(contrib)) div
    * 100` with `contrib = rank div deg` — the damping-0.85 recursion
    * in pure integer arithmetic. Integer ops keep the result exactly
    * reproducible ANYWHERE: addition is commutative/associative
    * bit-exactly, so the shuffle-order-dependent float summation
    * problem (which would break the DuckDB oracle hash and make two
    * cluster runs disagree) cannot arise. Symmetrized edges mean every
    * node has out-degree >= 1 — no dangling-mass term.
    *
    * Scale shape: degree table and rank vector are node-sized, so the
    * per-round rank join is deliberately UN-hinted: AQE promotes it to
    * a broadcast join while the rank vector fits (gate graphs) and the
    * same plan degrades to the standard Pregel-style shuffle join on
    * `u` when the node set outgrows driver memory — a forced hint
    * would OOM the driver on exactly the graphs worth ranking. Either
    * way the edge list streams once per round with map-side partial
    * aggregation. `scale` = 1e9 holds the
    * per-node sum below Long overflow to ~1e8 nodes (sum of all ranks
    * is n*scale; 85x that must stay under 2^63). */
  def pageRankInt(edges0: DataFrame, iters: Int = 3,
      scale: Long = 1000000000L): DataFrame = {
    val edges = graft.core.Materialize.pin(edges0)
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    // symDeg feeds every round: pin so symmetrize+degree runs once
    val symDeg = graft.core.Materialize.pin(
      sym.join(sym.groupBy("u").agg(count(lit(1)).as("du")), Seq("u")))
    var rank = symDeg.select("u").distinct()
      .select(col("u"), lit(scale).as("r"))
    for (_ <- 1 to iters) {
      // pin per round (as kCorePeel/labelPropagate do): caps lineage
      // and AQE replan depth, which otherwise grow with every
      // iteration — cheap at iters=3, load-bearing if iters is raised
      rank = graft.core.Materialize.pin(symDeg.join(rank, Seq("u"))
        .select(col("v"), expr("r div du").as("c"))
        .groupBy("v").agg(sum("c").as("s"))
        .select(col("v").as("u"),
          (lit(15L * scale / 100) + expr("(85 * s) div 100")).as("r")))
    }
    rank.select(col("u").as("node"), col("r").as("rank_scaled"))
      .orderBy("node")
  }

  /** Personalized PageRank — the seeded variant of [[pageRankInt]]:
    * teleport mass lands ONLY on the seed set (init = scale on seeds,
    * 0 elsewhere; per-round teleport term conditional on seed
    * membership), so ranks measure proximity TO THE SEEDS instead of
    * global centrality — "find more docs like these known-good ones",
    * the seed-expansion move of curation pipelines (and of
    * similarity-graph label spreading generally). Same exact-integer
    * arithmetic and per-round pin discipline as the global form; the
    * seed set is a literal isin (bounded by |seeds|, caller-provided). */
  def pprInt(edges0: DataFrame, seeds: Seq[Long], iters: Int = 3,
      scale: Long = 1000000000L): DataFrame = {
    require(seeds.nonEmpty, "personalized PageRank needs a seed set")
    // pin-if-unpinned: both gate callers already pinned the edge frame
    // to collect their seed sets from it — re-pinning would copy the
    // same blocks a second time for nothing
    val edges = graft.core.Materialize.pinIfNeeded(edges0)
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    val symDeg = graft.core.Materialize.pin(
      sym.join(sym.groupBy("u").agg(count(lit(1)).as("du")), Seq("u")))
    def tele(c: org.apache.spark.sql.Column, amount: Long) =
      when(c.isin(seeds.map(java.lang.Long.valueOf): _*), lit(amount))
        .otherwise(lit(0L))
    var rank = symDeg.select("u").distinct()
      .select(col("u"), tele(col("u"), scale).as("r"))
    for (_ <- 1 to iters) {
      rank = graft.core.Materialize.pin(symDeg.join(rank, Seq("u"))
        .select(col("v"), expr("r div du").as("c"))
        .groupBy("v").agg(sum("c").as("s"))
        .select(col("v").as("u"),
          (tele(col("v"), 15L * scale / 100) +
            expr("(85 * s) div 100")).as("r")))
    }
    rank.select(col("u").as("node"), col("r").as("rank_scaled"))
      .orderBy("node")
  }

  /** Gate: PPR seeded at the 5 smallest nodes of the near-dup graph
    * (deterministic, the known-item convention every retrieval gate
    * uses). The seed collect is 5 rows. */
  val graphPpr: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(t(s, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val pinned = graft.core.Materialize.pin(pairs)
    val seeds = pinned.select(col("a").as("u"))
      .unionByName(pinned.select(col("b").as("u")))
      .distinct().orderBy("u").limit(5)
      .collect().map(_.getLong(0)).toSeq
    pprInt(pinned, seeds)
  }

  /** Gate query: 3-round PageRank of the verified 0.5-Jaccard
    * near-dup graph (same edge set as x_graph_triangles, same
    * [[Dedup.GateMaxDf]] cap). */
  val graphPageRank: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(t(s, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    pageRankInt(pairs)
  }

  /** Bounded k-core peel: `rounds` rounds of "drop every node whose
    * CURRENT degree is below k", returning the surviving nodes with
    * their residual degrees. The k-core (maximal subgraph of min
    * degree >= k) is this peel's fixpoint; a FIXED round count is the
    * gate contract (same convention as [[pageRankInt]] — an unrollable
    * recursion both engines compute identically), and each round only
    * ever removes nodes, so the bounded peel is a sound over-
    * approximation that GraphSpec shows reaches the true core on
    * fixture graphs within 2 rounds. Degeneracy-style chain graphs
    * that need O(n) rounds want the to-fixpoint driver loop of
    * [[Dedup.canonicalClusters]]; corpus similarity graphs peel in a
    * few rounds because near-dup clusters are locally dense.
    *
    * Scale shape: per round, one partial-aggregated degree count
    * (node-sized) joined back into two semi-joins on the live edge
    * list — edges stream, nothing quadratic; per-round pins keep round
    * N's output from re-running rounds 1..N-1 per consumer (and cap
    * the lineage like the CC loop). The keep-set is deliberately NOT
    * broadcast-hinted: it is node-sized, so AQE promotes it to a
    * broadcast join only while it actually fits (gate graphs), and the
    * same code degrades to a shuffled semi-join when the surviving
    * node set is beyond driver memory — a forced hint would OOM the
    * driver exactly on the graphs that need the peel most. */
  def kCorePeel(edges0: DataFrame, k: Int, rounds: Int = 3): DataFrame = {
    require(k >= 1, s"k must be >= 1 (got $k)")
    val edges = graft.core.Materialize.pin(edges0)
    var alive = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    for (_ <- 1 to rounds) {
      val keep = graft.core.Materialize.pin(
        alive.groupBy("u").agg(count(lit(1)).as("du"))
          .filter(col("du") >= k).select("u"))
      alive = graft.core.Materialize.pin(
        alive.join(keep, Seq("u"), "left_semi")
          .join(keep.select(col("u").as("v")), Seq("v"), "left_semi"))
    }
    alive.groupBy("u").agg(count(lit(1)).as("deg"))
      .select(col("u").as("node"), col("deg"))
      .orderBy("node")
  }

  /** Gate query: 3-round 2-core of the verified 0.5-Jaccard near-dup
    * graph (same edge derivation as the other graph gates) — the
    * "dense cluster cores vs borderline chains" triage. */
  val graphKCore: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(t(s, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    kCorePeel(pairs, k = 2)
  }

  /** Synchronous label propagation (Raghavan et al. 2007), made
    * deterministic: every round, EVERY node simultaneously takes the
    * most frequent label among its neighbors, ties broken to the
    * SMALLEST label — no randomized visit order, so the result is a
    * pure function of the graph and both engines compute it
    * identically (the classic async LPA is order-dependent by design;
    * determinism is what makes the op oracle-checkable and
    * replay-stable in a pipeline). A FIXED round count is the gate
    * contract, same convention as [[pageRankInt]]/[[kCorePeel]];
    * synchronous LPA can oscillate on bipartite structure, which a
    * fixed horizon sidesteps — callers wanting convergence run the
    * driver loop to a fixpoint exactly like the CC operator.
    *
    * Scale shape: per round, ONE shuffle join of the edge list with
    * the node-sized label table (un-hinted — AQE broadcasts while it
    * fits), a partial-aggregated (node, label) count, and an argmax
    * window on the node key the join already partitioned by. Label
    * state never exceeds one row per node; per-round pins cap lineage
    * like the CC/PageRank loops. */
  def labelPropagate(edges0: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1 (got $rounds)")
    val edges = graft.core.Materialize.pin(edges0)
    val und = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    var labels = und.select(col("u")).distinct().withColumn("lbl", col("u"))
    for (_ <- 1 to rounds) {
      val counts = und
        .join(labels.select(col("u").as("v"), col("lbl")), Seq("v"))
        .groupBy("u", "lbl").agg(count(lit(1)).as("n"))
      val w = Window.partitionBy("u").orderBy(desc("n"), col("lbl"))
      labels = graft.core.Materialize.pin(
        counts.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1).select("u", "lbl"))
    }
    labels.select(col("u").as("node"), col("lbl").as("community"))
      .orderBy("node")
  }

  /** Gate query: 2-round deterministic LPA communities of the verified
    * 0.5-Jaccard near-dup graph. */
  val graphCommunities: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(t(s, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    labelPropagate(pairs, rounds = 2)
  }

  /** Common-neighbor link prediction: the top-k NON-adjacent node
    * pairs ranked by how many neighbors they share — the classic
    * "these two docs aren't flagged as near-dups but sit in the same
    * neighborhood" triage signal over the similarity graph (and the
    * integer-exact core of Jaccard/Adamic-Adar link scores, which are
    * monotone in it for fixed degrees).
    *
    * Scale shape: common-neighbor counting IS wedge enumeration, so
    * the candidate volume is sum(deg²) over wedge centers — quadratic
    * in a hub's degree. `maxDeg` is the [[Dedup]] `maxDf` lesson
    * applied to graphs: drop centers above the cap (a boilerplate hub
    * connected to everything predicts nothing useful anyway) and the
    * volume bound becomes |nodes| * maxDeg². Everything else is
    * equi-joins + one partial-aggregated groupBy; the top-k lands as
    * TakeOrderedAndProject (per-partition heaps, no global sort). */
  def commonNeighbors(edges0: DataFrame, k: Int,
      maxDeg: Option[Long] = None): DataFrame = {
    val edges = graft.core.Materialize.pin(edges0)
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    val centers = maxDeg match {
      case Some(cap) =>
        // the cap bounds DEGREE, not node count — the filtered table
        // is still node-sized, so no forced broadcast (AQE decides)
        val deg = sym.groupBy("u").agg(count(lit(1)).as("du"))
        sym.join(deg.filter(col("du") <= cap), Seq("u"), "left_semi")
      case None => sym
    }
    val left = graft.core.Materialize.pin(centers)
    val wedges = left.join(left.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy("v", "w").agg(count(lit(1)).as("n_common"))
    wedges
      .join(edges.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"),
        "left_anti")
      .orderBy(col("n_common").desc, col("v"), col("w"))
      .limit(k)
      .select(col("v").as("node_a"), col("w").as("node_b"), col("n_common"))
  }

  /** Gate query: top-20 predicted links of the verified 0.5-Jaccard
    * near-dup graph (same edge derivation as x_graph_triangles; the
    * degree cap, like [[Dedup.GateMaxDf]], is a no-op on the gate
    * corpus — Round9bSpec holds capped == uncapped there). */
  val graphCommonNeighbors: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(t(s, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    commonNeighbors(pairs, k = 20, maxDeg = Some(1000L))
  }

  /** Resource-allocation link prediction (Zhou/Lü/Zhang 2009):
    * RA(v,w) = sum over common neighbors u of 1/deg(u) — a shared RARE
    * neighbor is strong evidence, a shared hub is weak, which is
    * exactly the failure mode of raw common-neighbor counts on
    * boilerplate-heavy near-dup graphs (every doc sharing a template
    * hub looks linked). Same wedge-enumeration shape as
    * [[commonNeighbors]] — the weight is attached to the CENTER before
    * the wedge self-join, so it rides the same shuffle and the
    * aggregation is a plain sum. Weights are exact integers
    * (`1000000 div deg` — parts-per-million; floor division is
    * engine-portable where 1.0/deg is not), so the ranking and the
    * gate hash are bit-stable. `maxDeg` caps the center table like
    * the parent op: at 100 TB a template hub of degree d contributes
    * d^2 wedges and at most 1e6/d per pair — quadratic cost for
    * vanishing signal, the same economics as [[Dedup]]'s `maxDf`. */
  def resourceAllocation(edges0: DataFrame, k: Int,
      maxDeg: Option[Long] = None): DataFrame = {
    val edges = graft.core.Materialize.pin(edges0)
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(edges.select(col("b").as("u"), col("a").as("v")))
    val deg = sym.groupBy("u").agg(count(lit(1)).as("du"))
    val centers = maxDeg match {
      case Some(cap) =>
        sym.join(deg.filter(col("du") <= cap), Seq("u"), "left_semi")
      case None => sym
    }
    val weighted = centers.join(deg, Seq("u"))
      .select(col("u"), col("v"), expr("1000000L div du").as("wu"))
    val left = graft.core.Materialize.pin(weighted)
    val wedges = left.join(left.select(col("u"), col("v").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
      .groupBy("v", "w")
      .agg(sum("wu").as("ra_ppm"), count(lit(1)).as("n_common"))
    wedges
      .join(edges.select(col("a").as("v"), col("b").as("w")), Seq("v", "w"),
        "left_anti")
      .orderBy(col("ra_ppm").desc, col("v"), col("w"))
      .limit(k)
      .select(col("v").as("node_a"), col("w").as("node_b"),
        col("ra_ppm"), col("n_common"))
  }

  /** Gate twin of [[graphCommonNeighbors]] under the RA weighting. */
  val graphResourceAllocation: Q = (s, dir) => {
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(t(s, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    resourceAllocation(pairs, k = 20, maxDeg = Some(1000L))
  }

  val queries: Map[String, Q] = Map(
    "x_graph_triangles" -> graphTriangles,
    "x_graph_triangles_indexed" -> graphTrianglesIndexed,
    "x_graph_pagerank" -> graphPageRank,
    "x_graph_ppr" -> graphPpr,
    "x_graph_ppr_indexed" -> graphPprIndexed,
    "x_graph_pagerank_indexed" -> graphPageRankIndexed,
    "x_graph_common_neighbors" -> graphCommonNeighbors,
    "x_graph_common_neighbors_indexed" -> graphCommonNeighborsIndexed,
    "x_graph_resource_alloc" -> graphResourceAllocation,
    "x_graph_kcore" -> graphKCore,
    "x_graph_kcore_indexed" -> graphKCoreIndexed,
    "x_graph_communities" -> graphCommunities,
    "x_graph_communities_indexed" -> graphCommunitiesIndexed)

  /** Shared oracle prefix: the verified-Jaccard edge list `e(a, b)`
    * with `a < b` — identical to the x_dedup_ngram_jaccard oracle's
    * pair derivation. */
  private val edgeCte =
    "WITH w AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS ws FROM documents), " +
      "sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle FROM w, unnest(range(1, len(ws)-1)) AS u(i) WHERE len(ws) >= 3), " +
      "cnt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id), " +
      "com AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS common FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id), " +
      "e AS (SELECT doc_a AS a, doc_b AS b FROM com JOIN cnt ca ON com.doc_a = ca.doc_id JOIN cnt cb ON com.doc_b = cb.doc_id " +
      "WHERE common / (ca.n_sh + cb.n_sh - common) >= 0.5)"

  /** One unrolled integer-PageRank round: rank table `prev(u, r)` ->
    * next rank table. `//` is DuckDB integer division (all operands
    * non-negative, so it agrees with Spark's `div`); SUM(BIGINT)
    * returns HUGEINT, hence the CAST back. */
  private def prRoundSql(prev: String): String =
    s"(SELECT ed.v AS u, CAST(150000000 + (85 * CAST(SUM(p.r // d.du) AS BIGINT)) // 100 AS BIGINT) AS r " +
      s"FROM ed JOIN $prev p ON ed.u = p.u JOIN deg d ON ed.u = d.u GROUP BY ed.v)"

  private val trianglesSql =
    edgeCte + " " +
      "SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles FROM e e1 " +
      "JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b " +
      "JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b"

  private val commonNeighborsSql =
      (edgeCte + ", " +
        "sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
        "wed AS (SELECT s1.v AS v, s2.v AS w, CAST(COUNT(*) AS BIGINT) AS n_common " +
        "FROM sym s1 JOIN sym s2 ON s1.u = s2.u AND s1.v < s2.v GROUP BY 1, 2) " +
        "SELECT v AS node_a, w AS node_b, n_common FROM wed " +
        "WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = wed.v AND e.b = wed.w) " +
        "ORDER BY n_common DESC, node_a, node_b LIMIT 20")

  private val resourceAllocSql =
      (edgeCte + ", " +
        "sym AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
        "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS du FROM sym GROUP BY u), " +
        "wsym AS (SELECT s.u, s.v, 1000000 // d.du AS wu FROM sym s JOIN deg d USING (u)), " +
        "wed AS (SELECT s1.v AS v, s2.v AS w, CAST(SUM(s1.wu) AS BIGINT) AS ra_ppm, " +
        "CAST(COUNT(*) AS BIGINT) AS n_common " +
        "FROM wsym s1 JOIN wsym s2 ON s1.u = s2.u AND s1.v < s2.v GROUP BY 1, 2) " +
        "SELECT v AS node_a, w AS node_b, ra_ppm, n_common FROM wed " +
        "WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = wed.v AND e.b = wed.w) " +
        "ORDER BY ra_ppm DESC, node_a, node_b LIMIT 20")

  private val communitiesSql =
      (edgeCte + ", " +
        "ed AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
        "l0 AS (SELECT DISTINCT u AS node, u AS lbl FROM ed), " +
        "c1 AS (SELECT ed.u, l0.lbl, CAST(COUNT(*) AS BIGINT) AS n FROM ed JOIN l0 ON ed.v = l0.node GROUP BY ed.u, l0.lbl), " +
        "l1 AS (SELECT u, lbl FROM (SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY n DESC, lbl) AS rn FROM c1) WHERE rn = 1), " +
        "c2 AS (SELECT ed.u, l1.lbl, CAST(COUNT(*) AS BIGINT) AS n FROM ed JOIN l1 ON ed.v = l1.u GROUP BY ed.u, l1.lbl), " +
        "l2 AS (SELECT u, lbl FROM (SELECT u, lbl, ROW_NUMBER() OVER (PARTITION BY u ORDER BY n DESC, lbl) AS rn FROM c2) WHERE rn = 1) " +
        "SELECT u AS node, lbl AS community FROM l2 ORDER BY node")

  private val kcoreSql =
      (edgeCte + ", " +
        "ed AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
        "d0 AS (SELECT u, COUNT(*) AS du FROM ed GROUP BY u), " +
        "k0 AS (SELECT u FROM d0 WHERE du >= 2), " +
        "a1 AS (SELECT * FROM ed WHERE u IN (SELECT u FROM k0) AND v IN (SELECT u FROM k0)), " +
        "d1 AS (SELECT u, COUNT(*) AS du FROM a1 GROUP BY u), " +
        "k1 AS (SELECT u FROM d1 WHERE du >= 2), " +
        "a2 AS (SELECT * FROM a1 WHERE u IN (SELECT u FROM k1) AND v IN (SELECT u FROM k1)), " +
        "d2 AS (SELECT u, COUNT(*) AS du FROM a2 GROUP BY u), " +
        "k2 AS (SELECT u FROM d2 WHERE du >= 2), " +
        "a3 AS (SELECT * FROM a2 WHERE u IN (SELECT u FROM k2) AND v IN (SELECT u FROM k2)) " +
        "SELECT u AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM a3 GROUP BY u ORDER BY node")

  private val pagerankSql =
      (edgeCte + ", " +
        "ed AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
        "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS du FROM ed GROUP BY u), " +
        "r0 AS (SELECT DISTINCT u, CAST(1000000000 AS BIGINT) AS r FROM ed), " +
        s"r1 AS ${prRoundSql("r0")}, " +
        s"r2 AS ${prRoundSql("r1")}, " +
        s"r3 AS ${prRoundSql("r2")} " +
        "SELECT u AS node, r AS rank_scaled FROM r3 ORDER BY node")

  /** One unrolled PERSONALIZED round: teleport conditional on seed
    * membership (`sd` = 5 smallest nodes), everything else identical
    * to [[prRoundSql]]. */
  private def pprRoundSql(prev: String): String =
    s"(SELECT ed.v AS u, CAST(CASE WHEN ed.v IN (SELECT u FROM sd) THEN 150000000 ELSE 0 END " +
      s"+ (85 * CAST(SUM(p.r // d.du) AS BIGINT)) // 100 AS BIGINT) AS r " +
      s"FROM ed JOIN $prev p ON ed.u = p.u JOIN deg d ON ed.u = d.u GROUP BY ed.v)"

  private val pprSql =
    (edgeCte + ", " +
      "ed AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
      "deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS du FROM ed GROUP BY u), " +
      "sd AS (SELECT DISTINCT u FROM ed ORDER BY u LIMIT 5), " +
      "r0 AS (SELECT DISTINCT u, CAST(CASE WHEN u IN (SELECT u FROM sd) THEN 1000000000 ELSE 0 END AS BIGINT) AS r FROM ed), " +
      s"r1 AS ${pprRoundSql("r0")}, " +
      s"r2 AS ${pprRoundSql("r1")}, " +
      s"r3 AS ${pprRoundSql("r2")} " +
      "SELECT u AS node, r AS rank_scaled FROM r3 ORDER BY node")

  /** Each `*_indexed` gate shares its rebuild twin's oracle: the
    * artifact IS the twin's edge derivation, parquet-round-tripped. */
  val oracles: Map[String, String] = Map(
    "x_graph_ppr" -> pprSql,
    "x_graph_ppr_indexed" -> pprSql,
    "x_graph_triangles" -> trianglesSql,
    "x_graph_triangles_indexed" -> trianglesSql,
    "x_graph_common_neighbors" -> commonNeighborsSql,
    "x_graph_common_neighbors_indexed" -> commonNeighborsSql,
    "x_graph_resource_alloc" -> resourceAllocSql,
    "x_graph_communities" -> communitiesSql,
    "x_graph_communities_indexed" -> communitiesSql,
    "x_graph_kcore" -> kcoreSql,
    "x_graph_kcore_indexed" -> kcoreSql,
    "x_graph_pagerank" -> pagerankSql,
    "x_graph_pagerank_indexed" -> pagerankSql)
}
