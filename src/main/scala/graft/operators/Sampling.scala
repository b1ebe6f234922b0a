package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sampling + order-statistics operators for a training-data pipeline
  * (driver north star; the reference subsets only by predicates). All
  * sampling here is HASH-based, not rand()-based: a hash of a stable
  * key gives a sample that is reproducible across runs, engines, and
  * cluster sizes — the property a 100 TB pipeline needs so reruns and
  * backfills select the same rows (and the property that makes these
  * DuckDB-oracle-checkable at all; rand() seeds are engine-private).
  *
  * Scale notes: hash sampling is a pure per-row filter (codegen'd scan,
  * no shuffle, combines with pushed-down column pruning); stratified
  * top-n shuffles once on the stratum key; the exact quantiles query is
  * one hash aggregation (percentile_disc keeps per-group sorted buffers
  * — for sketch-sized state at petabyte scale swap in
  * approx_percentile, which this query deliberately avoids so the
  * oracle is exact).
  */
object Sampling {

  type Q = (SparkSession, String) => DataFrame

  /** Deterministic [0,1) sampling score from a key column: first 8 hex
    * chars of md5 as a fraction of 2^32. Engine-portable (md5 of the
    * decimal string rendering). */
  def hashScore(key: Column): Column =
    conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType) / lit(4294967296L)

  /** Reproducible ~`fraction` sample of `df` keyed on `key`. */
  def hashSample(df: DataFrame, key: Column, fraction: Double): DataFrame =
    df.filter(hashScore(key) < fraction)

  /** ~10% reproducible sample of documents keyed on doc_id. */
  val sampleHash: Q = (s, dir) =>
    hashSample(t(s, dir, "documents"), col("doc_id"), 0.10)
      .select("doc_id", "source", "n_chars")
      .orderBy("doc_id")

  /** Exactly `n` rows per stratum (or all rows of a smaller stratum),
    * chosen by the deterministic hash order with a unique-key
    * tiebreak. */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column, n: Int): DataFrame =
    df.withColumn("__rk",
        row_number().over(Window.partitionBy(stratum).orderBy(hashScore(key), key)))
      .filter(col("__rk") <= n)
      .drop("__rk")

  /** 20 orders per priority class, deterministic. */
  val sampleStratified: Q = (s, dir) =>
    stratifiedSample(t(s, dir, "orders"), col("o_orderpriority"), col("o_orderkey"), 20)
      .select("o_orderpriority", "o_orderkey", "o_custkey")
      .orderBy("o_orderpriority", "o_orderkey")

  /** Poisson / probability-proportional-to-size sampling: include each
    * row independently with probability `expectedN * w / sum(w)` (the
    * classic PPS design — Horvitz-Thompson estimates from the sample
    * are unbiased with these inclusion probabilities). Deterministic:
    * the coin is [[hashScore]] of the row key, so reruns, backfills,
    * and engines agree on the selected SET, not just its size.
    *
    * Bit-portability requires `weight` to be INTEGRAL (sum as BIGINT
    * is exact and order-free; a double sum's low bits depend on
    * partition merge order) — callers with money weights pass cents.
    * The threshold is then two correctly-rounded IEEE ops
    * (double*int64, /int64) — identical bits on any engine.
    *
    * Scale shape: the total is one partial-aggregated scalar,
    * broadcast back; the filter itself is a pure per-row projection —
    * no shuffle of the fact table at all. */
  /** Contract guard applied AT the weight column: weights must be
    * positive and non-null — a null weight silently drops rows from
    * the cumsum/coin (null comparisons filter as false) and a negative
    * total flips the inclusion comparison for EVERY row, so both fail
    * loudly instead. Guarding the column itself (not a separate filter
    * predicate) matters: Catalyst reorders conjunctive predicates, so
    * a filter-side raise_error can be bypassed when a null weight
    * already fails a cheaper sibling predicate — the exact silent drop
    * being guarded against. One codegen'd comparison per row. */
  private def guardedWeight(weight: Column, op: String): Column =
    when(weight.isNotNull && weight > 0, weight)
      .otherwise(raise_error(concat(
        lit(s"$op: weight must be positive and non-null (got "),
        coalesce(weight.cast("string"), lit("null")), lit(")"))))

  def ppsSample(df: DataFrame, key: Column, weight: Column,
      expectedN: Double): DataFrame = {
    val w = df.withColumn("__w", guardedWeight(weight, "ppsSample"))
    val tot = w.agg(sum(col("__w")).as("__tot"))
    w.crossJoin(broadcast(tot))
      .filter(hashScore(key) < lit(expectedN) * col("__w") / col("__tot"))
      .drop("__w", "__tot")
  }

  /** ~500 orders sampled with probability proportional to order value
    * (integer cents — o_totalprice is 2-dp money). */
  val sampleWeighted: Q = (s, dir) =>
    ppsSample(
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("w_cents")),
      col("o_orderkey"), col("w_cents"), 500.0)
      .orderBy("o_orderkey")

  /** Weighted sampling WITHOUT replacement, exact size n — the
    * Efraimidis–Spirakis A-ES design (Inf. Process. Lett. 97(5),
    * 2006): each row gets the exponential race score
    * E = -ln(u) / w with u uniform in (0,1], and the n SMALLEST
    * scores are the sample; P(row first) = w/W exactly, and the
    * without-replacement inclusion probabilities follow by the
    * memoryless race. Where [[ppsSample]] hits n only in expectation
    * and [[systematicPps]] draws heavy rows MULTIPLE times, this is
    * the design for "pick n distinct documents, quality-weighted" —
    * the corpus-subsampling ask.
    *
    * u is the same md5 key fraction as [[hashScore]] (shifted to
    * (0,1] so ln never sees 0) — deterministic, engine-portable,
    * reproducible across runs and partitionings like every sampler
    * here. The score compare is IEEE-double (ln + divide, both
    * correctly rounded), with the key as tiebreak; adjacent ranked
    * scores differ by ~1/n relative, astronomically far from ULP.
    *
    * Scale shape: orderBy(score).limit(n) plans as
    * TakeOrderedAndProject — each task keeps its own top-n heap and
    * the driver merges P partial heaps, so nothing resembling a full
    * sort or shuffle of the corpus happens. For n large enough that
    * n x P merge bytes bind (n >> 10^6), switch to the two-pass
    * threshold form (approx-quantile the score at n/N, filter, exact
    * top-up) — same race, scan-bound. */
  /** The A-ES race score: -ln(u)/w with u the portable md5 uniform
    * shifted into (0,1]. Smaller = drawn earlier. */
  private[graft] def aesRaceScore(key: Column, weight: Column,
      op: String): Column = aesScore(key, weight, op)

  private def aesScore(key: Column, weight: Column, op: String): Column = {
    val h = conv(substring(md5(key.cast(StringType)), 1, 8), 16, 10)
      .cast(LongType)
    -log((h + lit(1L)) / lit(4294967296.0)) / guardedWeight(weight, op)
  }

  def weightedSampleNoReplace(df: DataFrame, key: Column, weight: Column,
      n: Int): DataFrame = {
    require(n > 0, s"weightedSampleNoReplace: n must be positive (got $n)")
    df.withColumn("__score", aesScore(key, weight, "weightedSampleNoReplace"))
      .orderBy(col("__score").asc, key.asc)
      .limit(n)
      .drop("__score")
  }

  /** Per-stratum weighted sampling without replacement: the A-ES race
    * run independently inside each stratum — "n documents PER
    * LANGUAGE, quality-weighted", the language-balanced corpus draw.
    * One window over the stratum key (single shuffle on the stratum —
    * same shape as [[stratifiedSample]], which this generalizes:
    * constant weights reduce to it exactly). A stratum with fewer
    * than n rows contributes all of them. */
  def stratifiedWeightedSample(df: DataFrame, stratum: Column, key: Column,
      weight: Column, n: Int): DataFrame = {
    require(n > 0, s"stratifiedWeightedSample: n must be positive (got $n)")
    df.withColumn("__rk", row_number().over(Window.partitionBy(stratum)
        .orderBy(aesScore(key, weight, "stratifiedWeightedSample"), key)))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** 10 orders per priority class, value-weighted, no duplicates. */
  val sampleStratifiedWeighted: Q = (s, dir) =>
    stratifiedWeightedSample(
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("w_cents")),
      col("o_orderpriority"), col("o_orderkey"), col("w_cents"), 10)
      .orderBy("o_orderpriority", "o_orderkey")

  /** Exactly 300 orders, value-weighted, no duplicates. */
  val sampleWeightedNoReplace: Q = (s, dir) =>
    weightedSampleNoReplace(
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("w_cents")),
      col("o_orderkey"), col("w_cents"), 300)
      .orderBy("o_orderkey")

  /** SYSTEMATIC PPS sampling — exact sample size n (as multiplicities),
    * inclusion probability still proportional to weight. Rows are laid
    * on the cumulative-weight line in deterministic hash order; a row
    * is drawn once per threshold multiple of W/n inside its weight
    * interval: multiplicity = floor(cum*n/W) - floor((cum-w)*n/W).
    * Multiplicities sum to exactly n by telescoping, and a row heavier
    * than W/n draws 2+ times — the textbook systematic design, where
    * Poisson/[[ppsSample]] only hits n in expectation.
    *
    * All-integer arithmetic (long cum, truncating div on non-negative
    * operands = floor), so selection is bit-portable. The cumulative
    * weight comes from [[graft.core.Cumsum.globalCumsum]] — the
    * two-phase distributed running total, NOT a single-partition
    * global window. cum*n must fit int64 — GUARDED: the broadcast
    * total is checked against Long.MaxValue/n inside the selection
    * filter, so past ~10^18/n total weight the query fails loudly
    * (raise_error) instead of silently returning wrong multiplicities
    * (switch the product to decimal if that scale is ever real). */
  def systematicPps(df: DataFrame, key: Column, weight: Column,
      n: Long): DataFrame = {
    require(n > 0, s"systematicPps: n must be positive (got $n)")
    val w = df.withColumn("__w", guardedWeight(weight, "systematicPps"))
    val tot = w.agg(sum(col("__w").cast(LongType)).as("__tot"))
    graft.core.Cumsum.globalCumsum(w, Seq(hashScore(key), key), col("__w"), "__cum")
      .crossJoin(broadcast(tot))
      // overflow guard lives INSIDE the multiplicity expression (same
      // reorder-proofing as guardedWeight): evaluating a multiplicity
      // forces the check, so an overflowing total raises before any
      // wrong multiplicity can be observed
      .withColumn("multiplicity",
        when(col("__tot") <= lit(Long.MaxValue / n),
          expr(s"(__cum * $n) div __tot - ((__cum - __w) * $n) div __tot"))
          .otherwise(raise_error(concat(
            lit(s"systematicPps: total weight * n=$n overflows int64 (total "),
            col("__tot").cast("string"),
            lit(") — pre-scale weights or use decimal")))))
      .filter(col("multiplicity") > 0)
      .drop("__cum", "__tot", "__w")
  }

  /** Exactly 500 draws over orders, weight = order value in cents. */
  val sampleSystematic: Q = (s, dir) =>
    systematicPps(
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          round(col("o_totalprice") * 100).cast(LongType).as("w_cents")),
      col("o_orderkey"), col("w_cents"), 500L)
      .orderBy("o_orderkey")

  /** Per-group mode with a deterministic smallest-value tiebreak.
    * Two-level shape: the (group, value) pre-aggregation is map-side
    * combinable (shuffle carries one row per distinct value, not per
    * input row), then the argmax window runs over the tiny distinct
    * table — mode at any scale without buffering raw rows, and without
    * the engine-private tiebreak of builtin mode() aggregates (DuckDB
    * documents none; Spark has no builtin), which is what makes this
    * form oracle-checkable at all. */
  def groupedMode(df: DataFrame, group: String, value: String): DataFrame =
    df.groupBy(group, value).agg(count(lit(1)).as("n"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(group).orderBy(col("n").desc, col(value))))
      .filter(col("__rk") === 1)
      .drop("__rk")

  val statsMode: Q = (s, dir) =>
    groupedMode(t(s, dir, "lineitem"), "l_returnflag", "l_quantity")
      .select(col("l_returnflag"), col("l_quantity").as("mode_qty"), col("n"))
      .orderBy("l_returnflag")

  /** Per-group min-max normalization (feature scaling to [0,1]): the
    * group extremes are a partial-aggregated groupBy producing a
    * group-sized table that BROADCASTS back onto the fact scan — the
    * normalize itself is one more projection, no fact shuffle.
    * Bit-portable because the value is integer cents: (x-min) and
    * (max-min) are exact int64s, and the single IEEE division of the
    * two is correctly rounded identically on every engine. */
  def minMaxScale(df: DataFrame, group: String, cents: Column): DataFrame = {
    val d = df.withColumn("__cents", cents)
    val ext = d.groupBy(group)
      .agg(min("__cents").as("__mn"), max("__cents").as("__mx"))
    d.join(broadcast(ext), Seq(group))
      .withColumn("scaled",
        when(col("__mx") === col("__mn"), lit(0.0))
          .otherwise((col("__cents") - col("__mn")).cast("double") /
            (col("__mx") - col("__mn")).cast("double")))
  }

  val statsMinmaxScale: Q = (s, dir) =>
    minMaxScale(t(s, dir, "lineitem"), "l_returnflag",
      floor(col("l_extendedprice") * 100).cast(LongType))
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("__cents").as("cents"), col("scaled"))

  /** Per-group percent_rank — (rank-1)/(n-1) is rank arithmetic over
    * exact integers followed by one IEEE division, so ties and bits
    * agree across engines by definition (unlike cume_dist-of-doubles
    * pipelines). One shuffle on the group key. */
  val statsPercentRank: Q = (s, dir) =>
    t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100).cast(LongType).as("cents"))
      .withColumn("pr", percent_rank().over(
        Window.partitionBy("o_orderpriority").orderBy("cents")))

  /** Exact per-group order statistics: discrete percentiles return an
    * ACTUAL element of the group (no interpolation arithmetic), so
    * doubles hash-match across engines where interpolated quantiles
    * would differ in ulps.
    *
    * NOT percentile_disc aggregates: each one is an ObjectAggregate
    * that buffers every group value in memory PER PERCENTILE (3x here)
    * — 7.7s at sf0.1 and an OOM risk for large groups. The discrete
    * percentile at p is by definition the element at sorted position
    * ceil(p*n) (smallest value with cume_dist >= p), so one
    * window-ranked sort + a rank-pick computes all three percentiles
    * with spillable state: 7.7s -> ~1s at sf0.1, and the same DuckDB
    * quantile_disc oracle passes. */
  def discretePercentiles(df: DataFrame, group: String, value: String,
      ps: Seq[(Double, String)]): DataFrame = {
    val w = Window.partitionBy(group).orderBy(value)
    val ranked = df.select(col(group), col(value))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(group)))
    ranked
      .filter(ps.map { case (p, _) => col("__rn") === ceil(lit(p) * col("__n")) }
        .reduce(_ || _))
      .groupBy(group)
      .agg(
        ps.map { case (p, name) =>
          max(when(col("__rn") === ceil(lit(p) * col("__n")), col(value))).as(name)
        }.head,
        ps.tail.map { case (p, name) =>
          max(when(col("__rn") === ceil(lit(p) * col("__n")), col(value))).as(name)
        }: _*)
  }

  /** Per-group equi-depth (quartile) histogram: bucket boundaries are
    * the exact discrete p25/p50/p75 (actual data values from
    * [[discretePercentiles]] — no interpolation, so both engines pick
    * the identical element), broadcast back onto the fact scan for
    * bucket assignment, then one partial-aggregated (group, bucket)
    * count with observed min/max per bucket. Values are only ever
    * COMPARED, never arithmetically combined, so doubles are safe in
    * the hash gate.
    *
    * Scale shape: boundaries come from the rank-pick window (one
    * shuffle on the group key, spillable sort state — not the
    * per-percentile ObjectAggregate buffers); the boundary table is
    * groups x 3 values — always broadcastable; the fact side shuffles
    * once for the final (group, bucket) aggregate. Equi-depth is the
    * histogram a skewed measure needs: equal-POPULATION buckets where
    * the fixed-width `x_stats_histogram` would put ~all rows in one
    * bin. */
  def equiDepthHistogram(df: DataFrame, group: String, value: String): DataFrame = {
    val q = discretePercentiles(df, group, value,
      Seq(0.25 -> "__b1", 0.5 -> "__b2", 0.75 -> "__b3"))
    df.select(col(group), col(value))
      .join(broadcast(q), Seq(group))
      .withColumn("bucket",
        when(col(value) <= col("__b1"), 0L)
          .when(col(value) <= col("__b2"), 1L)
          .when(col(value) <= col("__b3"), 2L)
          .otherwise(3L))
      .groupBy(col(group), col("bucket"))
      .agg(count(lit(1)).as("n"), min(value).as("lo"), max(value).as("hi"))
      .orderBy(group, "bucket")
  }

  /** Gate: quartile histogram of lineitem prices per return flag. */
  val statsEquiDepth: Q = (s, dir) =>
    equiDepthHistogram(t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice")

  val statsQuantiles: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val pct = discretePercentiles(li, "l_returnflag", "l_extendedprice",
      Seq(0.5 -> "p50", 0.95 -> "p95", 0.99 -> "p99"))
    val extremes = li.groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("lo"), max("l_extendedprice").as("hi"),
        count(lit(1)).as("n"))
    extremes.join(broadcast(pct), Seq("l_returnflag"))
      .select("l_returnflag", "p50", "p95", "p99", "lo", "hi", "n")
      .orderBy("l_returnflag")
  }

  /** Distinct-count sketch: exact per-group distinct (oracle-checked)
    * next to HyperLogLog++ estimates at two precisions. The estimate
    * columns are NOT in the oracle projection contract — the paired
    * query [[statsApproxDistinct]] exposes them; this split keeps the
    * exact side hash-checked while the sketch side is bounds-checked in
    * ScalaTest (SamplingSpec asserts relative error < 5%). */
  val statsDistinct: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("n_exact"))
      .orderBy("l_returnflag")

  /** HLL++ distinct estimates. Fixed sketch state per group no matter
    * how many distincts — the 100 TB path where count_distinct's
    * exact hash set would OOM. Raw estimate form (library + spec);
    * the gate runs the self-verifying [[statsApproxDistinct]]. */
  val approxDistinctRaw: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("n_approx"))
      .orderBy("l_returnflag")

  /** Self-verifying gate form: the sketch estimate is checked IN-QUERY
    * against the exact distinct count and reduced to a boolean, so the
    * row hashes portably (the estimate itself is the HLL++ hash
    * family's, not portable SQL — r8 ran this rows-only). Bound 0.1 =
    * 5 sigma at rsd 0.02; the oracle emits the exact count and a TRUE
    * literal, so a sketch drifting out of bound fails the hash gate. */
  val statsApproxDistinct: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(count_distinct(col("l_partkey")).as("n_exact"),
        approx_count_distinct(col("l_partkey"), 0.02).as("__approx"))
      .select(col("l_returnflag"), col("n_exact"),
        (abs(col("__approx") - col("n_exact")).cast("double") / col("n_exact")
          <= 0.1).as("within_bound"))
      .orderBy("l_returnflag")

  /** Self-verifying count-min gate, the frequency analog of
    * [[statsApproxDistinct]]: ONE fixed-memory sketch
    * ([[graft.functions.CountMinSketch]], depth 7 x width 4096 =
    * 224 KB total, map-side partial-merged) is built over every
    * whitespace token of `documents`, then the 20 lexicographically
    * first distinct tokens are probed and each estimate checked
    * IN-QUERY against the CMS one-sided guarantee: exact <= est <=
    * exact + ceil(e/width * N). The reduced boolean hashes portably;
    * the oracle emits the exact counts and a TRUE literal, so a
    * sketch drifting out of bound fails the hash gate (hashing is
    * deterministic MurmurHash3, so the outcome is a fixed property of
    * the data, not a per-run coin). Probe evaluation is driver-side
    * over the 224 KB array + 20 collected exact counts — the
    * DISTRIBUTED work is the sketch build and the exact counts; the
    * probe frame is inherently tiny. */
  val statsCmsBound: Q = (s, dir) => {
    import s.implicits._
    val (depth, width) = (7, 4096)
    val toks = graft.core.Materialize.pin(
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= ""))
    val sketch = toks.as[String]
      .select(new graft.functions.CountMinSketch(depth, width).toColumn).head()
    val n = toks.count()
    val bound = math.ceil(math.E / width * n).toLong
    val probes = toks.select("tok").distinct().orderBy("tok").limit(20)
      .as[String].collect()
    val exact = toks.filter(col("tok").isin(probes.map(x => x: Any): _*))
      .groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .as[(String, Long)].collect().toMap
    probes.toSeq.sorted.map { p =>
      val est = graft.functions.CountMinSketch.estimate(sketch, depth, width, p)
      val ex = exact(p)
      (p, ex, est >= ex && est <= ex + bound)
    }.toDF("tok", "n_exact", "within_bound")
  }

  /** Self-verifying Misra-Gries heavy-hitters gate: one k=64-counter
    * [[graft.functions.HeavyHitters]] summary (map-side
    * partial-merged, at most 64 (token, counter) pairs per partial —
    * the frequent-items dual of [[statsCmsBound]]) is built over every
    * whitespace token of `documents`, then every TRUE heavy hitter —
    * token with exact count strictly above N/(k+1), an exact integer
    * comparison `n*65 > N` so the qualifying set is engine-portable —
    * is checked to be PRESENT in the summary. That presence is the MG
    * guarantee (est >= true - N/(k+1) > 0), deterministic under any
    * partitioning even though the counter VALUES are order-dependent,
    * which is why the row emits the exact counts + the boolean and
    * never the counters. On the gate corpus (31-token vocab) the
    * summary holds everything; the lossy regime (domain >> k, Zipf
    * tail evictions) is pinned in FunctionsSpec. */
  val statsHeavyHitters: Q = (s, dir) => {
    import s.implicits._
    val k = 64
    val toks = graft.core.Materialize.pin(
      t(s, dir, "documents")
        .select(explode(split(trim(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= ""))
    val summary = toks.as[String]
      .select(new graft.functions.HeavyHitters(k).toColumn).head()
    val n = toks.count()
    val hh = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
      .filter(col("n_exact") * (k + 1) > n)
      .as[(String, Long)].collect()
    hh.toSeq.sortBy(_._1).map { case (tk, ex) =>
      (tk, ex, summary.contains(tk))
    }.toDF("tok", "n_exact", "in_summary")
  }

  /** Mergeable distinct sketches (Apache DataSketches HLL via Spark
    * 4's hll_sketch_agg / hll_union_agg): per-(type, hour) user
    * sketches are built ONCE, then merged across hours per type. This
    * is the sketch property approx_count_distinct alone doesn't
    * surface — sketches are DATA (storable, re-aggregatable), so the
    * 100 TB pattern is: maintain fine-grained sketches incrementally,
    * answer any coarser rollup by union without touching raw rows
    * again. Raw estimate form (library + spec; the estimate is the
    * DataSketches hash family's, not portable SQL); the gate runs the
    * self-verifying [[statsHllUnion]]. */
  val hllUnionRaw: Q = (s, dir) =>
    t(s, dir, "events")
      .select(col("event_type"), expr("ts div 1000000000 div 3600").as("hour"),
        col("user_id"))
      .groupBy("event_type", "hour")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("n_users_approx"),
        count(lit(1)).as("n_hours"))
      .orderBy("event_type")

  /** Self-verifying gate form: the hour-sketch rollup's merged
    * estimate is compared IN-QUERY to the exact distinct-user count
    * and reduced to a boolean (bound 0.1 ≈ 6 sigma at default lgK=12
    * rsd ~1.6%), alongside the exact count and hour count — all three
    * hash-checkable against DuckDB. A union that lost sketch state
    * (the property under test: sketches are mergeable DATA) would
    * break the bound and fail the hash gate. */
  val statsHllUnion: Q = (s, dir) => {
    val ev = t(s, dir, "events")
      .select(col("event_type"), expr("ts div 1000000000 div 3600").as("hour"),
        col("user_id"))
    val merged = ev
      .groupBy("event_type", "hour")
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("__approx"),
        count(lit(1)).as("n_hours"))
    val exact = ev.groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_users_exact"))
    merged.join(exact, Seq("event_type"))
      .select(col("event_type"), col("n_hours"), col("n_users_exact"),
        (abs(col("__approx") - col("n_users_exact")).cast("double")
          / col("n_users_exact") <= 0.1).as("within_bound"))
      .orderBy("event_type")
  }

  /** Exact twin of [[statsHllUnion]]'s rollup target. */
  val eventsDistinctUsers: Q = (s, dir) =>
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("event_type")

  /** Sketch-based percentiles. approx_percentile at accuracy 10000
    * holds bounded state per group regardless of group size — the
    * 100 TB replacement for percentile_disc's exact sorted buffers;
    * TemporalSamplingSpec bounds its error against the exact form.
    * Raw estimate form (library + spec); the gate runs the
    * self-verifying [[statsApproxQuantiles]]. */
  val approxQuantilesRaw: Q = (s, dir) =>
    t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("approx"))
      .select(col("l_returnflag"),
        col("approx").getItem(0).as("p50_approx"),
        col("approx").getItem(1).as("p95_approx"))
      .orderBy("l_returnflag")

  /** Self-verifying gate form: the sketch percentiles are bracketed
    * IN-QUERY by exact discrete percentiles at ±0.02 rank mass
    * (approx_percentile at accuracy 10000 guarantees rank error
    * <= n/10000 — three orders inside the 0.02-quantile margin at
    * gate scale) and reduced to booleans next to the exact p50/p95
    * values, all hash-checkable against DuckDB quantile_disc. */
  val statsApproxQuantiles: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val approx = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.95), 10000)").as("approx"))
      .select(col("l_returnflag"),
        col("approx").getItem(0).as("__p50a"),
        col("approx").getItem(1).as("__p95a"))
    val bounds = discretePercentiles(li, "l_returnflag", "l_extendedprice",
      Seq(0.5 -> "p50_exact", 0.95 -> "p95_exact",
        0.48 -> "__lo50", 0.52 -> "__hi50", 0.93 -> "__lo95", 0.97 -> "__hi95"))
    approx.join(broadcast(bounds), Seq("l_returnflag"))
      .select(col("l_returnflag"), col("p50_exact"), col("p95_exact"),
        (col("__p50a") >= col("__lo50") && col("__p50a") <= col("__hi50")).as("p50_ok"),
        (col("__p95a") >= col("__lo95") && col("__p95a") <= col("__hi95")).as("p95_ok"))
      .orderBy("l_returnflag")
  }

  /** Per-group second-order statistics (corr / covar_samp /
    * stddev_samp) computed from EXACT decimal moments, then combined
    * with a fixed double-arithmetic tree. Spark's builtin corr()
    * accumulates co-moments in doubles, so its last bits depend on
    * partition merge order — useless under a cross-engine hash gate.
    * Here the five moment sums are decimal(38,4) (exact — inputs are
    * 2-dp money/quantity; no overflow below ~10^34), and the final
    * corr/covar/stddev formulas are division/sqrt over those scalars:
    * IEEE ops are correctly rounded, so both engines produce identical
    * bits. Same pattern as the linear idf in [[Corpus.tfIdf]].
    *
    * Scale shape: one hash aggregation with map-side partial merge —
    * moments are associative, so this is a single shuffle of
    * 6 numbers per group regardless of data size (the textbook
    * moment-sketch reduction; numerically safer at petabyte n than
    * streaming doubles because the decimal sums never round). */
  val statsCorrMoments: Q = (s, dir) => {
    val m = t(s, dir, "lineitem")
      .select(col("l_returnflag"),
        col("l_quantity").cast(DecimalType(18, 2)).as("x"),
        col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val n = col("n").cast("double")
    val (sx, sy, sxx, syy, sxy) = (col("sx").cast("double"),
      col("sy").cast("double"), col("sxx").cast("double"),
      col("syy").cast("double"), col("sxy").cast("double"))
    // Final stats rounded to 9 decimals: the moment sums are exact,
    // but DuckDB's wide-DECIMAL->DOUBLE cast is not correctly rounded
    // (measured: syy at sf0.001 lands 1 ulp off Java's cast), so the
    // raw double tree can differ in the last bit. Rounding collapses
    // a 1-ulp input wiggle (~1e-16 relative) far below the 9-dp
    // boundary; the oracle mirrors with the varchar-decimal round
    // trick that matches Spark round's shortest-repr HALF_UP.
    m.select(col("l_returnflag"), col("n"),
        round((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 9)
          .as("corr_qty_price"),
        round((n * sxy - sx * sy) / (n * (n - lit(1.0))), 9).as("covar_samp"),
        round(sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0)))), 9).as("stddev_qty"))
      .orderBy("l_returnflag")
  }

  /** Curriculum binning: decile of each document's token count within
    * its source (ntile over a totally-ordered window — the doc_id
    * tiebreak makes bucket assignment deterministic and
    * engine-portable). The curriculum/difficulty-bucketing step of a
    * training pipeline: downstream sampling draws per (source, decile).
    * One shuffle on source; ntile state is a row counter. */
  val statsNtile: Q = (s, dir) => {
    val d = t(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        size(TextAnalysis.tokens(col("text"))).as("n_tokens"))
    d.withColumn("decile", ntile(10).over(
        Window.partitionBy("source").orderBy(col("n_tokens"), col("doc_id"))))
      .orderBy("doc_id")
  }

  /** Per-group winsorization: clamp values into [p05, p95] where both
    * bounds are exact DISCRETE percentiles (actual group elements, so
    * clamped values stay exact data values and the cents-sum hashes
    * portably). Outputs per-group clip counts and the winsorized sum —
    * the outlier-robust aggregate a heavy-tailed metric needs. Scale
    * shape: the percentile table is group-sized → broadcast join; one
    * pass over the fact for the clamp + partial-aggregated groupBy. */
  val statsWinsorize: Q = (s, dir) => {
    val li = t(s, dir, "lineitem")
    val pct = discretePercentiles(li, "l_returnflag", "l_extendedprice",
      Seq(0.05 -> "lo", 0.95 -> "hi"))
    li.join(broadcast(pct), Seq("l_returnflag"))
      .select(col("l_returnflag"),
        greatest(least(col("l_extendedprice"), col("hi")), col("lo")).as("w"),
        (col("l_extendedprice") < col("lo")).cast("int").as("clo"),
        (col("l_extendedprice") > col("hi")).cast("int").as("chi"))
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum("clo").as("n_clip_lo"),
        sum("chi").as("n_clip_hi"),
        sum(floor(col("w") * 100).cast(LongType)).as("sum_cents"))
      .orderBy("l_returnflag")
  }

  /** Equi-width histogram over event values in integer cents (bin
    * width 5.00): one codegen'd projection + one partial-aggregated
    * groupBy — the single-pass distribution profile. Integer cents
    * keep the bin assignment and bounds bit-portable (value >= 0 in
    * this table, so truncating and flooring division agree). */
  val statsHistogram: Q = (s, dir) =>
    t(s, dir, "events")
      .select(floor(col("value") * 100).cast(LongType).as("cents"))
      .select(expr("cents div 500").as("bin"), col("cents"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"),
        min("cents").as("lo_cents"), max("cents").as("hi_cents"))
      .orderBy("bin")

  /** Join-key skew profile — the diagnostic to run BEFORE shuffling
    * 100 TB on a key: per-key counts (one map-combined aggregation),
    * then the top-10 heavy keys with their share in basis points,
    * carrying corpus-level figures (n_keys, total, max_n) on every
    * row. Integer basis points (n*10000 div total), not a float
    * ratio, so the profile hashes bit-portably. The key-count table
    * is its own scale story: it's exactly the table a salting
    * strategy (core.Skew) or AQE skew-join would consume. Top-10 via
    * orderBy+limit (TakeOrderedAndProject: per-partition heaps, never
    * a global sort) — a bare Window.orderBy rank would drag every
    * key-count through one partition; the rank window runs over the
    * 10 survivors only. */
  val statsKeySkew: Q = (s, dir) => {
    val c = graft.core.Materialize.pin(
      t(s, dir, "orders")
        .groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("n")))
    val tot = c.agg(sum("n").as("total"), count(lit(1)).as("n_keys"),
      max("n").as("max_n"))
    c.orderBy(col("n").desc, col("key")).limit(10)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n").desc, col("key"))))
      .crossJoin(broadcast(tot))
      .select(col("rank"), col("key"), col("n"),
        expr("n * 10000 div total").as("share_bp"),
        col("n_keys"), col("total"), col("max_n"))
      .orderBy("rank")
  }

  val queries: Map[String, Q] = Map(
    "x_stats_key_skew" -> statsKeySkew,
    "x_stats_winsorize" -> statsWinsorize,
    "x_stats_histogram" -> statsHistogram,
    "x_stats_ntile" -> statsNtile,
    "x_stats_corr_moments" -> statsCorrMoments,
    "x_stats_approx_quantiles" -> statsApproxQuantiles,
    "x_sample_hash" -> sampleHash,
    "x_sample_stratified" -> sampleStratified,
    "x_sample_weighted" -> sampleWeighted,
    "x_sample_weighted_noreplace" -> sampleWeightedNoReplace,
    "x_sample_stratified_weighted" -> sampleStratifiedWeighted,
    "x_sample_systematic" -> sampleSystematic,
    "x_stats_mode" -> statsMode,
    "x_stats_minmax_scale" -> statsMinmaxScale,
    "x_stats_percent_rank" -> statsPercentRank,
    "x_stats_quantiles" -> statsQuantiles,
    "x_stats_equidepth" -> statsEquiDepth,
    "x_stats_distinct" -> statsDistinct,
    "x_stats_approx_distinct" -> statsApproxDistinct,
    "x_stats_cms_bound" -> statsCmsBound,
    "x_stats_heavy_hitters" -> statsHeavyHitters,
    "x_stats_hll_union" -> statsHllUnion,
    "x_events_distinct_users" -> eventsDistinctUsers)

  /** DuckDB rendering of [[hashScore]]. */
  private def scoreSql(key: String): String =
    s"(CAST(('0x' || substring(md5(CAST($key AS VARCHAR)), 1, 8)) AS UBIGINT) / 4294967296.0)"

  val oracles: Map[String, String] = Map(
    "x_stats_winsorize" ->
      ("WITH p AS (SELECT l_returnflag, quantile_disc(l_extendedprice, 0.05) AS lo, " +
        "quantile_disc(l_extendedprice, 0.95) AS hi FROM lineitem GROUP BY l_returnflag) " +
        "SELECT l.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, " +
        "CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_lo, " +
        "CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clip_hi, " +
        "CAST(SUM(CAST(floor(GREATEST(LEAST(l_extendedprice, hi), lo) * 100) AS BIGINT)) AS BIGINT) AS sum_cents " +
        "FROM lineitem l JOIN p USING (l_returnflag) GROUP BY l.l_returnflag ORDER BY l_returnflag"),
    "x_stats_histogram" ->
      ("WITH c AS (SELECT CAST(floor(value * 100) AS BIGINT) AS cents FROM events) " +
        "SELECT cents // 500 AS bin, CAST(COUNT(*) AS BIGINT) AS n, " +
        "MIN(cents) AS lo_cents, MAX(cents) AS hi_cents FROM c GROUP BY bin ORDER BY bin"),
    "x_stats_ntile" ->
      ("WITH d AS (SELECT doc_id, source, CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INT) AS n_tokens FROM documents) " +
        "SELECT doc_id, source, n_tokens, CAST(NTILE(10) OVER " +
        "(PARTITION BY source ORDER BY n_tokens, doc_id) AS INT) AS decile " +
        "FROM d ORDER BY doc_id"),
    "x_stats_corr_moments" ->
      ("WITH m AS (SELECT l_returnflag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy, " +
        "SUM(x*x) AS sxx, SUM(y*y) AS syy, SUM(x*y) AS sxy " +
        "FROM (SELECT l_returnflag, CAST(l_quantity AS DECIMAL(18,2)) AS x, " +
        "CAST(l_extendedprice AS DECIMAL(18,2)) AS y FROM lineitem) GROUP BY l_returnflag) " +
        "SELECT l_returnflag, CAST(n AS BIGINT) AS n, " +
        "CAST(round(CAST(CAST((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / " +
        "(sqrt(CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) * " +
        "sqrt(CAST(n AS DOUBLE)*CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))) AS VARCHAR) AS DECIMAL(30,15)), 9) AS DOUBLE) AS corr_qty_price, " +
        "CAST(round(CAST(CAST((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0)) AS VARCHAR) AS DECIMAL(30,15)), 9) AS DOUBLE) AS covar_samp, " +
        "CAST(round(CAST(CAST(sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)) / " +
        "(CAST(n AS DOUBLE)*(CAST(n AS DOUBLE) - 1.0))) AS VARCHAR) AS DECIMAL(30,15)), 9) AS DOUBLE) AS stddev_qty " +
        "FROM m ORDER BY l_returnflag"),
    "x_sample_hash" ->
      (s"SELECT doc_id, source, n_chars FROM documents " +
        s"WHERE ${scoreSql("doc_id")} < 0.10 ORDER BY doc_id"),
    "x_sample_weighted" ->
      ("WITH w AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents FROM orders), " +
        "t AS (SELECT CAST(SUM(w_cents) AS BIGINT) AS tot FROM w) " +
        s"SELECT o_orderkey, w_cents FROM w, t " +
        s"WHERE ${scoreSql("o_orderkey")} < 500.0 * w_cents / tot ORDER BY o_orderkey"),
    "x_sample_stratified_weighted" ->
      ("WITH w AS (SELECT o_orderpriority, o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents FROM orders), " +
        "s AS (SELECT *, -ln((CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) + 1) / 4294967296.0) / w_cents AS score FROM w), " +
        "r AS (SELECT o_orderpriority, o_orderkey, w_cents, ROW_NUMBER() OVER " +
        "(PARTITION BY o_orderpriority ORDER BY score, o_orderkey) AS rk FROM s) " +
        "SELECT o_orderpriority, o_orderkey, w_cents FROM r WHERE rk <= 10 " +
        "ORDER BY o_orderpriority, o_orderkey"),
    "x_sample_weighted_noreplace" ->
      ("WITH w AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents FROM orders), " +
        "s AS (SELECT o_orderkey, w_cents, " +
        "-ln((CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS UBIGINT) + 1) / 4294967296.0) / w_cents AS score " +
        "FROM w) " +
        "SELECT o_orderkey, w_cents FROM (SELECT * FROM s ORDER BY score, o_orderkey LIMIT 300) " +
        "ORDER BY o_orderkey"),
    "x_sample_systematic" ->
      ("WITH w AS (SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents FROM orders), " +
        "t AS (SELECT CAST(SUM(w_cents) AS BIGINT) AS tot FROM w), " +
        s"c AS (SELECT o_orderkey, w_cents, CAST(SUM(w_cents) OVER (ORDER BY ${scoreSql("o_orderkey")}, o_orderkey) AS BIGINT) AS cum FROM w) " +
        "SELECT o_orderkey, w_cents, (cum * 500) // tot - ((cum - w_cents) * 500) // tot AS multiplicity " +
        "FROM c, t WHERE (cum * 500) // tot - ((cum - w_cents) * 500) // tot > 0 ORDER BY o_orderkey"),
    "x_stats_mode" ->
      ("WITH c AS (SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM lineitem GROUP BY l_returnflag, l_quantity), " +
        "r AS (SELECT l_returnflag, l_quantity, n, " +
        "row_number() OVER (PARTITION BY l_returnflag ORDER BY n DESC, l_quantity) AS rk FROM c) " +
        "SELECT l_returnflag, l_quantity AS mode_qty, n FROM r WHERE rk = 1 ORDER BY l_returnflag"),
    "x_stats_key_skew" ->
      ("WITH c AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY o_custkey), " +
        "s AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS n_keys, MAX(n) AS max_n FROM c), " +
        "r AS (SELECT key, n, CAST(row_number() OVER (ORDER BY n DESC, key) AS INT) AS rank FROM c) " +
        "SELECT rank, key, n, n * 10000 // total AS share_bp, n_keys, total, max_n " +
        "FROM r, s WHERE rank <= 10 ORDER BY rank"),
    "x_stats_minmax_scale" ->
      ("WITH d AS (SELECT l_returnflag, l_orderkey, l_linenumber, " +
        "CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem), " +
        "e AS (SELECT l_returnflag, MIN(cents) AS mn, MAX(cents) AS mx FROM d GROUP BY l_returnflag) " +
        "SELECT d.l_returnflag, l_orderkey, l_linenumber, cents, " +
        "CASE WHEN mx = mn THEN 0.0 ELSE CAST(cents - mn AS DOUBLE) / CAST(mx - mn AS DOUBLE) END AS scaled " +
        "FROM d JOIN e USING (l_returnflag)"),
    "x_stats_percent_rank" ->
      ("SELECT o_orderkey, o_orderpriority, CAST(floor(o_totalprice * 100) AS BIGINT) AS cents, " +
        "percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT)) AS pr " +
        "FROM orders"),
    "x_sample_stratified" ->
      (s"WITH r AS (SELECT o_orderpriority, o_orderkey, o_custkey, " +
        s"row_number() OVER (PARTITION BY o_orderpriority ORDER BY ${scoreSql("o_orderkey")}, o_orderkey) AS rk FROM orders) " +
        "SELECT o_orderpriority, o_orderkey, o_custkey FROM r WHERE rk <= 20 ORDER BY o_orderpriority, o_orderkey"),
    "x_stats_quantiles" ->
      ("SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS p50, " +
        "quantile_disc(l_extendedprice, 0.95) AS p95, quantile_disc(l_extendedprice, 0.99) AS p99, " +
        "MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "x_stats_equidepth" ->
      ("WITH q AS (SELECT l_returnflag, quantile_disc(l_extendedprice, 0.25) AS b1, " +
        "quantile_disc(l_extendedprice, 0.5) AS b2, quantile_disc(l_extendedprice, 0.75) AS b3 " +
        "FROM lineitem GROUP BY l_returnflag), " +
        "b AS (SELECT l.l_returnflag, l.l_extendedprice AS v, " +
        "CASE WHEN l.l_extendedprice <= q.b1 THEN 0 WHEN l.l_extendedprice <= q.b2 THEN 1 " +
        "WHEN l.l_extendedprice <= q.b3 THEN 2 ELSE 3 END AS bucket " +
        "FROM lineitem l JOIN q ON l.l_returnflag = q.l_returnflag) " +
        "SELECT l_returnflag, CAST(bucket AS BIGINT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n, " +
        "MIN(v) AS lo, MAX(v) AS hi FROM b GROUP BY l_returnflag, bucket " +
        "ORDER BY l_returnflag, bucket"),
    "x_stats_distinct" ->
      ("SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "x_events_distinct_users" ->
      ("SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users " +
        "FROM events GROUP BY event_type ORDER BY event_type"),
    // Self-verifying sketch rows: the oracle computes the EXACT side
    // and a TRUE literal for each in-query bound check — a sketch
    // drifting out of bound flips the boolean and fails the hash gate.
    "x_stats_approx_distinct" ->
      ("SELECT l_returnflag, CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact, " +
        "TRUE AS within_bound FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"),
    "x_stats_cms_bound" ->
      ("WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents), " +
        "tf AS (SELECT tok FROM toks WHERE tok <> ''), " +
        "probes AS (SELECT DISTINCT tok FROM tf ORDER BY tok LIMIT 20) " +
        "SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS within_bound " +
        "FROM tf JOIN probes USING (tok) GROUP BY tok ORDER BY tok"),
    "x_stats_heavy_hitters" ->
      ("WITH toks AS (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok FROM documents), " +
        "tf AS (SELECT tok FROM toks WHERE tok <> ''), " +
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM tf) " +
        "SELECT tok, CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS in_summary " +
        "FROM tf, n GROUP BY tok, total HAVING COUNT(*) * 65 > total ORDER BY tok"),
    "x_stats_hll_union" ->
      ("WITH ev AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour, user_id FROM events) " +
        "SELECT event_type, CAST(COUNT(DISTINCT hour) AS BIGINT) AS n_hours, " +
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users_exact, TRUE AS within_bound " +
        "FROM ev GROUP BY event_type ORDER BY event_type"),
    "x_stats_approx_quantiles" ->
      ("SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS p50_exact, " +
        "quantile_disc(l_extendedprice, 0.95) AS p95_exact, " +
        "TRUE AS p50_ok, TRUE AS p95_ok " +
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"))
}
