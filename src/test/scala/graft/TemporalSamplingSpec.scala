package graft

import graft.operators.{Sampling, Temporal}
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("funnel is strictly ordered: steps before the previous step's first event don't count") {
    val sec = (s: Long) => s * 1000000000L
    val events = Seq(
      (1L, "view", sec(1)), (1L, "click", sec(2)), (1L, "purchase", sec(3)),
      (2L, "view", sec(1)), (2L, "purchase", sec(2)), // skips click: stops at step 1
      (3L, "click", sec(1)), (3L, "view", sec(2)), (3L, "click", sec(3)),
      (3L, "purchase", sec(4)), // pre-view click ignored, later click counts
      (4L, "purchase", sec(1)), (4L, "view", sec(2)) // purchase BEFORE view: no lookback
    ).toDF("user_id", "event_type", "ts")
    val out = Temporal.funnelSteps(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(4L, 2L, 2L),
      s"expected 4 viewers, 2 ordered clickers, 2 ordered purchasers, got ${out.mkString(",")}")
    assert(out.map(_.getLong(3)).toSeq == Seq(10000L, 5000L, 5000L))
  }

  test("SparkEntry rejects duplicate gate names instead of silently shadowing") {
    // would have caught the r14 x_events_funnel near-miss at gate time
    assert(SparkEntry.queries.size == SparkEntry.queries.keys.toSet.size)
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet),
      "every oracle must correspond to a registered query")
  }

  test("asOfJoin attaches the greatest left sec <= right sec per key, ties inclusive") {
    val clicks = Seq((1L, 100L), (1L, 200L), (1L, 300L), (2L, 50L))
      .toDF("user_id", "sec")
    val purchases = Seq((1L, 10L, 250L), (1L, 11L, 200L), (2L, 12L, 40L), (3L, 13L, 99L))
      .toDF("user_id", "event_id", "p_sec")
    val out = Temporal.asOfJoin(clicks, purchases, "user_id", "sec", "p_sec")
      .select("event_id", "asof_sec")
      .as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(200L)) // greatest click <= 250
    assert(out(11L).contains(200L)) // tie at same second counts (<=)
    assert(out(12L).isEmpty)        // only later clicks exist
    assert(out(13L).isEmpty)        // user with no clicks at all
  }

  test("rangeCountJoin counts left rows in (r-width, r] and keeps zero-match rows") {
    val clicks = Seq((1L, 100L), (1L, 3600L), (1L, 3700L), (2L, 10L))
      .toDF("user_id", "sec")
    val purchases = Seq((1L, 10L, 3700L), (1L, 11L, 100L), (2L, 12L, 9000L))
      .toDF("user_id", "event_id", "p_sec")
    val out = Temporal.rangeCountJoin(clicks, purchases, "user_id", "sec", "p_sec", 3600L)
      .select("event_id", "n_in_range").as[(Long, Long)].collect().toMap
    // (100, 3700]: clicks at 3600, 3700 (100 is exactly r-width, excluded)
    assert(out(10L) == 2L)
    assert(out(11L) == 1L) // its own-second click at 100
    assert(out(12L) == 0L) // zero-match preserved
  }

  test("asOfJoinBucketed equals asOfJoin on hot-keyed random data, any bucket width") {
    val rng = new scala.util.Random(13)
    // 90% of rows land on user 0 — the pathological key the bucketed
    // form exists for
    def hotKey(): Long = if (rng.nextInt(10) == 0) rng.nextInt(5).toLong + 1 else 0L
    val clicks = Seq.fill(400)((hotKey(), rng.nextInt(50000).toLong))
      .toDF("user_id", "sec")
    val purchases = Seq.tabulate(150)(i => (hotKey(), i.toLong, rng.nextInt(50000).toLong))
      .toDF("user_id", "event_id", "p_sec")
    val plain = Temporal.asOfJoin(clicks, purchases, "user_id", "sec", "p_sec")
      .select("event_id", "asof_sec").as[(Long, Option[Long])].collect().toMap
    // widths below/at/above the data span: single-row buckets, carries
    // across many empty buckets, and one-bucket degeneration
    for (width <- Seq(1L, 777L, 3600L, 1000000L)) {
      val bucketed = Temporal.asOfJoinBucketed(
          clicks, purchases, "user_id", "sec", "p_sec", width)
        .select("event_id", "asof_sec").as[(Long, Option[Long])].collect().toMap
      assert(bucketed == plain, s"bucketWidth=$width")
    }
  }

  test("asOfJoinBucketed: ties inclusive, cross-bucket carry, no-prior null") {
    val clicks = Seq((1L, 100L), (1L, 200L), (2L, 50L)).toDF("user_id", "sec")
    val purchases = Seq(
      (1L, 10L, 200L),  // tie at same second, same bucket
      (1L, 11L, 9999L), // nearest left is many empty buckets back
      (2L, 12L, 40L),   // only later clicks
      (3L, 13L, 70L))   // no clicks at all
      .toDF("user_id", "event_id", "p_sec")
    val out = Temporal.asOfJoinBucketed(
        clicks, purchases, "user_id", "sec", "p_sec", 60L)
      .select("event_id", "asof_sec").as[(Long, Option[Long])].collect().toMap
    assert(out(10L).contains(200L))
    assert(out(11L).contains(200L))
    assert(out(12L).isEmpty)
    assert(out(13L).isEmpty)
  }

  test("bucketed operators handle negative seconds (floor-division buckets, every width)") {
    // pre-epoch timestamps: with truncating division bucket 0 would
    // span (-w, w) — twice the intended width — voiding the documented
    // per-bucket serial bound; floorDiv keeps every bucket exactly w
    // wide. Output equivalence must hold for data straddling zero.
    val rng = new scala.util.Random(17)
    def sec(): Long = rng.nextInt(2000).toLong - 1000L
    val clicks = Seq.fill(300)((rng.nextInt(3).toLong, sec()))
      .toDF("user_id", "sec")
    val purchases = Seq.tabulate(120)(i => (rng.nextInt(3).toLong, i.toLong, sec()))
      .toDF("user_id", "event_id", "p_sec")
    val plain = Temporal.asOfJoin(clicks, purchases, "user_id", "sec", "p_sec")
      .select("event_id", "asof_sec").as[(Long, Option[Long])].collect().toMap
    for (width <- Seq(1L, 7L, 60L, 5000L)) {
      val bucketed = Temporal.asOfJoinBucketed(
          clicks, purchases, "user_id", "sec", "p_sec", width)
        .select("event_id", "asof_sec").as[(Long, Option[Long])].collect().toMap
      assert(bucketed == plain, s"asOfJoinBucketed width=$width")
    }
    val naive = purchases.as("p").join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.sec") > col("p.p_sec") - 60L && col("c.sec") <= col("p.p_sec"),
        "left")
      .groupBy(col("p.event_id"))
      .agg(sum(when(col("c.sec").isNotNull, 1L).otherwise(0L)).as("n"))
      .as[(Long, Long)].collect().toMap
    val ranged = Temporal.rangeCountJoin(
        clicks, purchases, "user_id", "sec", "p_sec", 60L)
      .select("event_id", "n_in_range").as[(Long, Long)].collect().toMap
    assert(ranged == naive, "rangeCountJoin on negative seconds")
  }

  test("asOfJoin agrees with the naive max-subquery formulation on random data") {
    val rng = new scala.util.Random(11)
    val clicks = Seq.fill(300)((rng.nextInt(5).toLong, rng.nextInt(20000).toLong))
      .toDF("user_id", "sec")
    val purchases = Seq.tabulate(100)(i =>
      (rng.nextInt(5).toLong, i.toLong, rng.nextInt(20000).toLong))
      .toDF("user_id", "event_id", "p_sec")
    val fast = Temporal.asOfJoin(clicks, purchases, "user_id", "sec", "p_sec")
      .select("event_id", "asof_sec").as[(Long, Option[Long])].collect().toMap
    val naive = purchases.as("p").join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") && col("c.sec") <= col("p.p_sec"), "left")
      .groupBy("p.event_id").agg(max(col("c.sec")).as("asof"))
      .as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
  }

  test("rangeCountJoin agrees with the naive inequality join on random data") {
    val rng = new scala.util.Random(7)
    val clicks = Seq.fill(300)((rng.nextInt(5).toLong, rng.nextInt(20000).toLong))
      .toDF("user_id", "sec")
    val purchases = Seq.tabulate(100)(i =>
      (rng.nextInt(5).toLong, i.toLong, rng.nextInt(20000).toLong))
      .toDF("user_id", "event_id", "p_sec")
    val fast = Temporal.rangeCountJoin(clicks, purchases, "user_id", "sec", "p_sec", 3600L)
      .select("event_id", "n_in_range").as[(Long, Long)].collect().toMap
    val naive = purchases.as("p").join(clicks.as("c"),
        col("p.user_id") === col("c.user_id") &&
          col("c.sec") > col("p.p_sec") - 3600 && col("c.sec") <= col("p.p_sec"), "left")
      .groupBy("p.event_id").agg(count(col("c.sec")).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(fast == naive)
  }
}

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSample is deterministic, key-stable, and near the target fraction") {
    val df = spark.range(10000).toDF("id")
    val a = Sampling.hashSample(df, col("id"), 0.1).as[Long].collect().toSet
    val b = Sampling.hashSample(df, col("id"), 0.1).as[Long].collect().toSet
    assert(a == b, "same key set must be selected on rerun")
    assert(math.abs(a.size / 10000.0 - 0.1) < 0.02, s"got ${a.size} of 10000")
    // a smaller fraction selects a SUBSET (scores are per-key constants)
    val c = Sampling.hashSample(df, col("id"), 0.05).as[Long].collect().toSet
    assert(c.subsetOf(a))
  }

  test("stratifiedSample returns exactly n per stratum (or the whole small stratum)") {
    val df = (Seq.tabulate(100)(i => ("big", i.toLong)) ++ Seq(("tiny", 900L), ("tiny", 901L)))
      .toDF("stratum", "key")
    val out = Sampling.stratifiedSample(df, col("stratum"), col("key"), 5)
      .groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(out == Map("big" -> 5L, "tiny" -> 2L))
  }

  test("percentile_disc returns actual elements with DuckDB quantile_disc semantics") {
    // cume_dist >= p rule: {1,2,3,4} at 0.5 -> 2 (matches DuckDB)
    val df = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val p50 = df.select(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)"))
      .as[Double].head()
    assert(p50 == 2.0)
  }

  test("approx_percentile stays within 1% of the exact discrete percentile") {
    val dir = "/root/testdata/sf0.001"
    val approx = Sampling.approxQuantilesRaw(spark, dir)
      .select("l_returnflag", "p50_approx")
      .as[(String, Double)].collect().toMap
    val exact = Sampling.statsQuantiles(spark, dir)
      .select("l_returnflag", "p50").as[(String, Double)].collect().toMap
    assert(approx.nonEmpty && approx.keySet == exact.keySet)
    approx.foreach { case (k, a50) =>
      assert(math.abs(a50 - exact(k)) / exact(k) < 0.01, s"$k: approx $a50 vs exact ${exact(k)}")
    }
  }

  test("window rank-pick percentiles equal percentile_disc aggregates") {
    val df = Seq.tabulate(101)(i => ("g", (i * 7 % 101).toDouble))
      .toDF("g", "x")
    val win = Sampling.discretePercentiles(df, "g", "x", Seq(0.5 -> "p50", 0.95 -> "p95"))
      .select("p50", "p95").as[(Double, Double)].head()
    val agg = df.groupBy("g").agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY x)").as("p50"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY x)").as("p95"))
      .select("p50", "p95").as[(Double, Double)].head()
    assert(win == agg)
  }

  test("approx_count_distinct stays within 5% of exact at HLL precision 0.01") {
    val df = spark.range(50000).select((col("id") % 9173).as("k"))
    val (approx, exact) = df
      .select(approx_count_distinct(col("k"), 0.01).as("a"), count_distinct(col("k")).as("e"))
      .as[(Long, Long)].head()
    assert(exact == 9173L)
    assert(math.abs(approx - exact) / exact.toDouble < 0.05, s"approx=$approx exact=$exact")
  }

  test("hll sketch union: merged fine-grained sketches match the one-shot sketch exactly") {
    // 50k rows, 500 groups, keys overlap across groups (k % 7919)
    val df = spark.range(50000).select((col("id") % 500).as("g"), (col("id") % 7919).as("k"))
    // merge path: per-group sketches unioned to one estimate
    val merged = df.groupBy("g").agg(expr("hll_sketch_agg(k)").as("sk"))
      .select(expr("hll_sketch_estimate(hll_union_agg(sk))").as("m"))
      .as[Long].head()
    // one-shot path over the raw rows
    val oneShot = df.select(expr("hll_sketch_estimate(hll_sketch_agg(k))").as("o"))
      .as[Long].head()
    // HLL union is register-wise max, but DataSketches may hold small
    // per-group sketches in sparse mode and promote on union (HLL_8
    // union target vs the one-shot sketch's representation), so the
    // two paths agree tightly but not bit-for-bit
    assert(math.abs(merged - oneShot) / oneShot.toDouble < 0.01,
      s"merged=$merged oneShot=$oneShot")
    assert(math.abs(merged - 7919L) / 7919.0 < 0.05, s"estimate=$merged exact=7919")
  }

  test("hll_union merged estimate within 5% of the exact twin per type") {
    val dir = "/root/testdata/sf0.001"
    val approx = Sampling.hllUnionRaw(spark, dir)
      .select(col("event_type"), col("n_users_approx"))
      .as[(String, Long)].collect().toMap
    val exact = Sampling.queries("x_events_distinct_users")(spark, dir)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (t, e) =>
      assert(math.abs(approx(t) - e) / e.toDouble < 0.05,
        s"$t: approx=${approx(t)} exact=$e") }
  }

  test("self-verifying sketch gate rows: every in-query bound check is true") {
    val dir = "/root/testdata/sf0.001"
    val hll = Sampling.queries("x_stats_hll_union")(spark, dir)
      .select("within_bound").as[Boolean].collect()
    assert(hll.nonEmpty && hll.forall(identity))
    val ad = Sampling.queries("x_stats_approx_distinct")(spark, dir)
      .select("within_bound").as[Boolean].collect()
    assert(ad.nonEmpty && ad.forall(identity))
    val aq = Sampling.queries("x_stats_approx_quantiles")(spark, dir)
      .select("p50_ok", "p95_ok").as[(Boolean, Boolean)].collect()
    assert(aq.nonEmpty && aq.forall { case (a, b) => a && b })
  }
}
