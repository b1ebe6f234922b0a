package graft

import graft.operators.{BloomPrune, Cdc, Corpus, Dedup, EventsOps, Graph, Layout, Sampling, Similarity, Temporal, TextAnalysis}
import org.apache.spark.sql.functions._

/** Semantics checks for the round-8 operators (CDC merge/SCD2, bloom
  * join pruning, interval overlap join, cross-doc span dedup, bigram
  * collocations, exact-moment stats); the sf-corpus legs are
  * hash-checked by the DuckDB gate.
  */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("mergeUpsert: insert adds, update replaces, delete removes, rest untouched") {
    val snap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "v", "x")
    val changes = Seq(
      ("U", 2L, "b2", 22.0),
      ("D", 3L, "c", 30.0),
      ("I", 9L, "z", 90.0)).toDF("op", "k", "v", "x")
    val out = Cdc.mergeUpsert(snap, changes, "k")
      .as[(Long, String, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 22.0), (9L, "z", 90.0)))
  }

  test("scd2: intervals chain per key and exactly one current row per key") {
    val rows = Cdc.cdcScd2(spark, dir)
      .select("user_id", "valid_from", "valid_to", "version", "is_current")
      .as[(Long, Long, Option[Long], Int, Int)].collect()
    val byUser = rows.groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (u, rs) =>
      val seq = rs.sortBy(_._4)
      assert(seq.map(_._4).toSeq == (1 to seq.length), s"dense versions for $u")
      // each interval's end is the next interval's start
      seq.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2), s"contiguous history for $u")
        case _ =>
      }
      assert(seq.count(_._5 == 1) == 1 && seq.last._5 == 1,
        s"exactly one current row (the last) for $u")
    }
  }

  test("bloomSemiJoin: output identical to the plain semi-join; prefilter prunes") {
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val fact = spark.read.parquet(s"$dir/orders.parquet")
      .select("o_orderkey", "o_custkey")
    val exact = fact.join(dim.withColumnRenamed("c_custkey", "o_custkey"),
        Seq("o_custkey"), "left_semi")
      .as[(Long, Long)].collect().toSet
    val pruned = BloomPrune.bloomSemiJoin(fact, "o_custkey", dim, "c_custkey", 10000L, 0.03)
      .as[(Long, Long)].collect().toSet
    assert(pruned == exact, "bloom path is exact")
    val nPre = BloomPrune.bloomPrefilter(fact, "o_custkey", dim, "c_custkey", 10000L, 0.03).count()
    val nAll = fact.count()
    assert(nPre < nAll, s"prefilter prunes ($nPre of $nAll)")
    assert(nPre >= exact.size.toLong, "prefilter never drops a true match")
  }

  test("intervalOverlapJoin: equals the naive inequality join, no duplicate pairs") {
    // via Tables.t: ts arrives as nanos-Long regardless of the
    // testdata generation's parquet encoding (SchemaDriftSpec)
    val e = graft.core.Tables.t(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        expr("ts div 1000000000").as("sec"))
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("v_id"),
        col("sec").as("v_start"), (col("sec") + col("event_id") % 600).as("v_end"))
    val c = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("c_id"),
        col("sec").as("c_start"), (col("sec") + col("event_id") % 600).as("c_end"))
    // widths both below and above the max interval length must agree
    for (w <- Seq(60L, 600L, 7200L)) {
      val got = Temporal
        .intervalOverlapJoin(v, c, "user_id", "v_start", "v_end", "c_start", "c_end", w)
        .select("v_id", "c_id").as[(Long, Long)].collect().toList
      assert(got.distinct.size == got.size, s"no duplicate pairs at width $w")
      val naive = v.join(c, Seq("user_id"))
        .filter(col("v_start") <= col("c_end") && col("c_start") <= col("v_end"))
        .select("v_id", "c_id").as[(Long, Long)].collect().toSet
      assert(got.toSet == naive, s"matches naive join at width $w")
    }
  }

  test("dedupSpanCrossdoc: planted shared 8-gram flags both docs, unique doc stays 0") {
    val shared = "q w e r t y u i" // 8 tokens
    val d = Seq(
      (1L, s"$shared alpha beta gamma delta"),
      (2L, s"prefix tokens here also $shared"),
      (3L, "totally unique words nothing repeats anywhere in this one")
    ).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val out = withDocs(d) { tmp =>
      Dedup.dedupSpanCrossdoc(spark, tmp)
        .as[(Long, Long, Long, Double)].collect()
    }.map(r => r._1 -> r).toMap
    assert(out(1L)._3 >= 1 && out(2L)._3 >= 1, "both sharers flagged")
    assert(out(3L)._3 == 0 && out(3L)._4 == 0.0, "unique doc unflagged")
    // doc1: 12 tokens -> 5 spans; only the leading span is shared
    assert(out(1L)._2 == 5 && out(1L)._3 == 1 && out(1L)._4 == 0.2)
  }

  test("textCollocations: planted bigram counts and lift") {
    val d = Seq(
      (1L, "a b a b"),
      (2L, "a b c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val rows = withDocs(d) { tmp =>
      TextAnalysis.textCollocations(spark, tmp)
        .as[(String, String, Long, Long, Long, Double)].collect()
    }
    val byPair = rows.map(r => (r._1, r._2) -> r).toMap
    // bigrams: doc1 = ab, ba, ab; doc2 = ab, bc -> n(ab)=3 of N=5;
    // unigrams: a x3, b x3 across the corpus
    val ab = byPair(("a", "b"))
    assert(ab._3 == 3 && ab._4 == 3 && ab._5 == 3)
    assert(ab._6 == (3.0 * 5.0) / (3.0 * 3.0))
    assert(rows.head._3 == rows.map(_._3).max, "sorted by pair count desc")
  }

  test("statsCorrMoments: exact-moment formulas agree with Spark's builtin aggregates") {
    val got = Sampling.statsCorrMoments(spark, dir)
      .as[(String, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val ref = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c"),
        covar_samp(col("l_quantity"), col("l_extendedprice")).as("cv"),
        stddev_samp(col("l_quantity")).as("sd"))
      .as[(String, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == ref.keySet && got.nonEmpty)
    got.foreach { case (k, (_, _, c, cv, sd)) =>
      assert(math.abs(c - ref(k)._2) < 1e-9, s"corr $k")
      assert(math.abs(cv - ref(k)._3) / math.abs(ref(k)._3) < 1e-9, s"covar $k")
      assert(math.abs(sd - ref(k)._4) / ref(k)._4 < 1e-9, s"stddev $k")
    }
  }

  test("cdcAggRefresh: merged partial state equals the full recompute exactly") {
    val merged = Cdc.cdcAggRefresh(spark, dir)
      .as[(String, Long, BigDecimal)].collect().toSeq
    val full = spark.read.parquet(s"$dir/orders.parquet")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      .orderBy("o_orderpriority")
      .as[(String, Long, BigDecimal)].collect().toSeq
    assert(merged.map(r => (r._1, r._2, r._3.underlying.stripTrailingZeros)) ==
      full.map(r => (r._1, r._2, r._3.underlying.stripTrailingZeros)))
  }

  test("eventsFunnel: ordering enforced (purchase before first view doesn't count), one Exchange") {
    val seq = Seq(
      // user 1: full ordered funnel
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // user 2: purchase BEFORE the first view -> stage stops at click
      (2L, "purchase", 50L), (2L, "view", 100L), (2L, "click", 150L),
      // user 3: click before view -> stage stops at view
      (3L, "click", 10L), (3L, "view", 20L),
      // user 4: nothing relevant
      (4L, "error", 5L))
    val e = seq.toDF("user_id", "event_type", "sec")
    // same logic as the gate query, against the in-memory frame
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
    val out = e
      .withColumn("t_view", min(when(col("event_type") === "view", col("sec"))).over(w))
      .withColumn("t_click", min(when(col("event_type") === "click" && col("sec") >= col("t_view"), col("sec"))).over(w))
      .withColumn("t_purchase", min(when(col("event_type") === "purchase" && col("sec") >= col("t_click"), col("sec"))).over(w))
      .groupBy("user_id")
      .agg(min("t_view").as("t_view"), min("t_click").as("t_click"), min("t_purchase").as("t_purchase"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(out(1L) == ((Some(100L), Some(200L), Some(300L))))
    assert(out(2L) == ((Some(100L), Some(150L), None)), "early purchase ignored")
    assert(out(3L) == ((Some(20L), None, None)), "early click ignored")
    assert(out(4L) == ((None, None, None)))
    val plan = EventsOps.eventsFunnel(spark, dir).queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"stacked windows + groupBy reuse one user_id exchange (got $exchanges)")
  }

  test("zorder2: bijective on the 32x32 grid and recoverable per dimension") {
    val grid = (for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val z = grid.withColumn("z", Layout.zorder2(col("x"), col("y"), 5))
      .as[(Long, Long, Long)].collect()
    assert(z.map(_._3).distinct.length == 1024, "interleave is a bijection")
    z.foreach { case (x, y, v) =>
      val rx = (0 until 5).map(i => (((v >> (2 * i)) & 1L) << i)).sum
      val ry = (0 until 5).map(i => (((v >> (2 * i + 1)) & 1L) << i)).sum
      assert(rx == x && ry == y, s"deinterleave recovers ($x,$y)")
    }
  }

  test("clusteredWrite: per-file spread of BOTH dimensions shrinks vs unclustered layout") {
    // a grid both dimensions actually POPULATE (sf0.001 custkey spans
    // only ~150 values, so a 10-bit grid would leave the top x-bits
    // zero and the z-curve would degenerate to a y-sort — sizing bits
    // to the data range is part of the operator's contract)
    val o = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderkey"),
        (col("o_custkey") % 32).as("zx"),
        (expr("CAST(floor(o_totalprice / 16000.0) AS BIGINT)") % 32).as("zy"))
      .withColumn("zval", Layout.zorder2(col("zx"), col("zy"), 5))
    val tmp = java.nio.file.Files.createTempDirectory("layout-spec").toString
    try {
      Layout.clusteredWrite(o, s"$tmp/clustered", "zval", 8)
      o.orderBy("o_orderkey").repartition(8)
        .write.mode("overwrite").parquet(s"$tmp/random")
      def avgSpread(path: String, dim: String): Double = {
        val perFile = spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg((max(dim) - min(dim)).as("spread"))
          .agg(avg("spread")).collect()(0).getDouble(0)
        perFile
      }
      val (cx, rx) = (avgSpread(s"$tmp/clustered", "zx"), avgSpread(s"$tmp/random", "zx"))
      val (cy, ry) = (avgSpread(s"$tmp/clustered", "zy"), avgSpread(s"$tmp/random", "zy"))
      assert(cx < rx * 0.8, s"zx clusters ($cx vs $rx)")
      assert(cy < ry * 0.8, s"zy clusters ($cy vs $ry)")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("triangleCount: planted graphs (triangle, star, clique) count exactly") {
    def count(edges: Seq[(Long, Long)]): Long =
      Graph.triangleCount(edges.toDF("a", "b")).collect()(0).getLong(0)
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L))) == 1, "single triangle")
    assert(count(Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))) == 0,
      "star has no triangles (hub emits no wedges under orientation)")
    // K5: C(5,3) = 10 triangles
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    assert(count(k5) == 10, "K5 has 10 triangles")
    // two triangles sharing an edge
    assert(count(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))) == 2)
  }

  test("simCentroids: exact per-label means, array order preserved") {
    val emb0 = spark.read.parquet(s"$dir/embeddings.parquet")
    val got = Similarity.centroidVectors(emb0)
      .as[(Int, Seq[Double])].collect().toMap
    // the gate query is the scalar posexploded view of the same means
    val scalarRows = Similarity.simCentroids(spark, dir)
      .as[(Int, Int, Double)].collect()
    val fromScalar = scalarRows.groupBy(_._1).map { case (l, rs) =>
      l -> rs.sortBy(_._2).map(_._3).toSeq
    }
    assert(fromScalar == got.map { case (k, v) => k -> v.toSeq })
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .as[(Long, Seq[Float], Int)].collect()
    val byLabel = emb.groupBy(_._3)
    assert(got.keySet == byLabel.keySet)
    byLabel.foreach { case (label, vs) =>
      val dim = vs.head._2.length
      val expected = (0 until dim).map { i =>
        val sum9 = vs.map(v => math.floor(v._2(i).toDouble * 1e9).toLong).sum
        sum9.toDouble / (vs.length.toDouble * 1e9)
      }
      got(label).zip(expected).zipWithIndex.foreach { case ((g, e), i) =>
        assert(g == e, s"label $label pos $i")
      }
    }
  }

  test("eventsRangeFrame: window sums match a per-row recomputation") {
    val rows = EventsOps.eventsRangeFrame(spark, dir)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, rs) =>
      rs.foreach { case (_, _, sec, _, nHour, centsHour) =>
        val inRange = rs.filter(r => r._3 >= sec - 3600 && r._3 <= sec)
        assert(inRange.length.toLong == nHour)
        assert(inRange.map(_._4).sum == centsHour)
      }
    }
    assert(rows.nonEmpty)
  }

  test("mixRebalance: fractions bounded, oversized sources shrink toward target, rerun identical") {
    val rows = Corpus.mixRebalance(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nTok, frac) =>
      assert(frac > 0.0 && frac <= 1.0, s"$src frac $frac")
      assert(nDocs > 0 && nTok > 0)
    }
    assert(rows.exists(_._4 < 1.0), "at least one source is down-sampled")
    val again = Corpus.mixRebalance(spark, dir)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.toSeq == again.toSeq, "hash sampling is rerun-stable")
  }

  test("chunkSliding: windows cover every token, stride overlap, partial tail kept") {
    val chunks = Corpus.chunkSliding(spark, dir)
      .as[(Long, Int, Int, Int, Int)].collect()
    val nTokens = spark.read.parquet(s"$dir/documents.parquet")
      .select(size(split(trim(col("text")), "\\s+")).as("n"))
      .as[(Int)].collect()
    val byDoc = chunks.groupBy(_._1)
    byDoc.foreach { case (_, cs) =>
      val sorted = cs.sortBy(_._2)
      assert(sorted.head._3 == 0, "first chunk starts at 0")
      sorted.foreach { case (_, _, start, end, n) =>
        assert(n == end - start && n > 0 && n <= 64)
      }
      // consecutive chunks advance by the stride and overlap by 32
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._3 - a._3 == 32)
        case _ =>
      }
      val docLen = sorted.map(_._4).max
      assert(sorted.last._4 == docLen, "tail chunk reaches the end")
    }
    assert(byDoc.size == nTokens.length, "every doc chunked")
  }

  test("bpePairs: planted corpus ranks the dominant character pair first") {
    val d = Seq(
      (1L, "abab abab cd"),
      (2L, "abab xy")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")))
    val rows = withDocs(d) { tmp => Corpus.bpePairs(spark, tmp)
      .as[(String, Long)].collect() }
    val byPair = rows.toMap
    // "abab" occurs 3x as a word; each contributes pairs ab, ba, ab
    assert(byPair("ab") == 6 && byPair("ba") == 3)
    assert(rows.head._1 == "ab", "most frequent pair ranks first (the BPE merge)")
  }

  test("eventsAnomaly: planted spike flags; warm-up hours cannot flag") {
    val hours = (0L until 10L).map(h => ("A", h, 10L)) :+ (("A", 10L, 30L))
    // expand to raw events: h hours with n events each
    val raw = hours.flatMap { case (t, h, n) => (0L until n).map(i => (t, h * 3600 + i)) }
    val e = raw.toDF("event_type", "sec")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour").rowsBetween(-24, -1)
    val out = e.groupBy(col("event_type"), (col("sec") / 3600).cast("long").as("hour"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("n_obs", count(lit(1)).over(w))
      .withColumn("s", sum("n_events").over(w))
      .withColumn("ss", sum(col("n_events") * col("n_events")).over(w))
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getLong(3))).toMap
    assert(out(0L)._2 == 0 && out(1L)._2 == 1, "warm-up window sizes")
    // the gate query itself on real data: flags only where n_obs >= 2
    val gate = EventsOps.eventsAnomaly(spark, dir).collect()
    assert(gate.nonEmpty)
    gate.foreach { r =>
      if (r.getInt(6) == 1) assert(r.getLong(3) >= 2, "no flag without baseline")
    }
    // planted spike check through the same formula
    val spike = e.groupBy(col("event_type"), (col("sec") / 3600).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_obs", count(lit(1)).over(w))
      .withColumn("s", sum("n").over(w))
      .withColumn("ss", sum(col("n") * col("n")).over(w))
      .filter(col("hour") === 10L).collect()(0)
    val (nObs, s, ss) = (spike.getLong(3).toDouble, spike.getLong(4).toDouble, spike.getLong(5).toDouble)
    val mean = s / nObs
    val std = math.sqrt((nObs * ss - s * s) / (nObs * (nObs - 1.0)))
    assert(30.0 > mean + 2 * std, "constant baseline + 3x spike must flag")
  }

  test("plan shapes: merge anti-join broadcasts, overlap is equi-join, span explodes once") {
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val merge = plan(Cdc.cdcMergeUpsert(spark, dir))
    assert(merge.contains("LeftAnti") && merge.contains("BroadcastHashJoin"),
      "snapshot side never shuffles: broadcast anti-join")
    val overlap = plan(Temporal.eventsIntervalOverlap(spark, dir))
    assert(!overlap.contains("BroadcastNestedLoopJoin"),
      "bucketed rewrite keeps the overlap join an equi-join")
    val span = plan(Dedup.dedupSpanCrossdoc(spark, dir))
    assert("Generate explode".r.findAllIn(span).size == 1,
      "span table is exploded exactly once")
    val colloc = plan(TextAnalysis.textCollocations(spark, dir))
    assert("Generate ".r.findAllIn(colloc).size <= 3,
      "one bigram explode + two unigram legs, none duplicated further")
  }

  test("plan shapes: new ops broadcast their small sides, never sort-merge") {
    def shape(df: org.apache.spark.sql.DataFrame): (Int, Int) = {
      val p = df.queryExecution.executedPlan.toString
      ("BroadcastHashJoin".r.findAllIn(p).size,
        "SortMergeJoin".r.findAllIn(p).size)
    }
    assert(shape(EventsOps.eventsRetention(spark, dir)) == ((1, 0)),
      "cohort map broadcasts onto the event log")
    assert(shape(Sampling.statsWinsorize(spark, dir)) == ((1, 0)),
      "percentile table broadcasts onto the fact")
    assert(shape(Corpus.splitSafeGate(spark, dir)) == ((1, 0)),
      "cluster map broadcasts onto the corpus")
    assert(shape(Sampling.statsHistogram(spark, dir)) == ((0, 0)),
      "histogram is scan + aggregation, no join at all")
    // PageRank's rank join is deliberately un-hinted (r10 broadcast
    // eviction) and each round is eagerly pinned (r11), so the final
    // frame's own plan is a checkpoint scan with no joins left to
    // inspect. Assert the eviction's actual claim on ONE un-pinned
    // round: AQE promotes the node-sized rank join to broadcast at
    // gate scale once it sees the runtime shuffle size.
    val prEdges = graft.operators.Dedup.jaccardPairs(
        graft.operators.Dedup.shingles(
          graft.core.Tables.t(spark, dir, "documents")), 0.5,
        maxDf = Some(graft.operators.Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val prSym = prEdges.select(col("a").as("u"), col("b").as("v"))
      .unionByName(prEdges.select(col("b").as("u"), col("a").as("v")))
    val prRank0 = prSym.select("u").distinct()
      .select(col("u"), org.apache.spark.sql.functions.lit(1000000000L).as("r"))
    val prRound = prSym
      .join(prSym.groupBy("u").agg(count(lit(1)).as("du")), Seq("u"))
      .join(prRank0, Seq("u"))
      .select(col("v"), expr("r div du").as("c"))
      .groupBy("v").agg(sum("c").as("s"))
    prRound.collect()
    val prPlan = prRound.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(prPlan).size >= 1,
      "AQE promotes the un-hinted node-sized rank join to broadcast at gate scale")
    // PPS: scalar total broadcasts back (nested-loop on a 1-row side is
    // the only join); the fact table itself is never exchanged
    val pps = Sampling.queries("x_sample_weighted")(spark, dir)
    val pp = pps.queryExecution.executedPlan.toString
    assert(shape(pps) == ((0, 0)) &&
      "BroadcastNestedLoopJoin".r.findAllIn(pp).size == 1,
      "weight total broadcasts as a 1-row side")
    assert(shape(Sampling.statsMode(spark, dir)) == ((0, 0)),
      "mode is two aggregates + a window, no join")
    val att = Temporal.queries("x_events_attribution")(spark, dir)
    assert(!att.queryExecution.executedPlan.toString.contains("Join"),
      "attribution inherits the as-of join's zero-join union-merge plan")
  }

  test("piiScrub: redacts emails/phones/IPs with counts, leaves clean text alone") {
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.co.uk or call (555) 123-4567 now"),
      (2L, "server at 10.0.255.7 and backup 192.168.1.1 port 8080"),
      (3L, "plain prose with no identifiers at all"),
      (4L, "two mails a@b.io c.d@e.org and 555-123-4567 555.987.6543")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(docs)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0)._2 == "contact me at <EMAIL> or call <PHONE> now")
    assert((out(0)._3, out(0)._4, out(0)._5) == ((1L, 0L, 1L)))
    assert(out(1)._2 == "server at <IP> and backup <IP> port 8080")
    assert((out(1)._3, out(1)._4, out(1)._5) == ((0L, 2L, 0L)))
    assert(out(2)._2 == "plain prose with no identifiers at all")
    assert((out(2)._3, out(2)._4, out(2)._5) == ((0L, 0L, 0L)))
    assert(out(3)._2 == "two mails <EMAIL> <EMAIL> and <PHONE> <PHONE>")
    assert((out(3)._3, out(3)._4, out(3)._5) == ((2L, 0L, 2L)))
  }

  test("pageRankInt: triangle is a fixed point, star concentrates rank on the hub") {
    val triangle = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val tri = Graph.pageRankInt(triangle, iters = 3)
      .as[(Long, Long)].collect().toMap
    // regular graph: every node keeps rank0 = scale exactly
    assert(tri == Map(1L -> 1000000000L, 2L -> 1000000000L, 3L -> 1000000000L))

    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val r1 = Graph.pageRankInt(star, iters = 1).as[(Long, Long)].collect().toMap
    // hand-computed integer recursion, one round:
    // hub gets 3 leaves' full rank: 15e7 + (85 * 3e9) div 100
    // each leaf gets 1e9 div 3:     15e7 + (85 * 333333333) div 100
    assert(r1(1L) == 2700000000L)
    assert(r1(2L) == 433333333L && r1(3L) == 433333333L && r1(4L) == 433333333L)
    val r3 = Graph.pageRankInt(star, iters = 3).as[(Long, Long)].collect().toMap
    assert(r3(1L) > r3(2L), "hub outranks leaves after any round count")
    assert(r3(2L) == r3(3L) && r3(3L) == r3(4L), "symmetric leaves tie exactly")
  }

  test("splitSafe: near-dup cluster members share a split, singletons hash alone") {
    val docs = Seq(1L, 2L, 3L, 10L, 11L).toDF("doc_id")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "canonical_id")
    val out = Corpus.splitSafe(docs, clusters, 0.5)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    val clusterSplits = out.filter(_._2 == 1L).map(_._3).distinct
    assert(out.filter(r => Set(1L, 2L, 3L).contains(r._1)).forall(_._2 == 1L))
    assert(clusterSplits.length == 1, "all cluster members land in one split")
    // singletons group on their own id
    assert(out.find(_._1 == 10L).get._2 == 10L)
    assert(out.find(_._1 == 11L).get._2 == 11L)
    // split agrees with the hashSample score on the group id
    val sampled = Sampling.hashSample(docs, col("doc_id"), 0.5)
      .as[Long].collect().toSet
    out.filter(r => Set(10L, 11L).contains(r._1)).foreach { r =>
      assert((r._3 == "eval") == sampled.contains(r._1))
    }
  }

  test("eventsRetention: age 0 holds the full cohort, no later age exceeds it") {
    val rows = EventsOps.eventsRetention(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byCohort = rows.groupBy(_._1)
    byCohort.foreach { case (c, rs) =>
      val age0 = rs.find(_._2 == 0L)
      assert(age0.isDefined, s"cohort $c has an age-0 row (users are active in their first hour)")
      assert(rs.forall(_._3 <= age0.get._3), s"cohort $c: no age outdraws age 0")
      assert(rs.forall(_._2 >= 0L), "ages are non-negative")
    }
  }

  test("statsWinsorize: clip counts stay within the 5% tails, sum bounded by raw sum") {
    val rows = Sampling.statsWinsorize(spark, dir)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (flag, n, clo, chi, _) =>
      // discrete p05/p95 are actual elements: at most 5% strictly below/above
      assert(clo <= n * 5 / 100 + 1, s"$flag: lo clips bounded")
      assert(chi <= n * 5 / 100 + 1, s"$flag: hi clips bounded")
    }
  }

  test("statsHistogram: rows fall inside their bin and bins cover all rows") {
    val rows = Sampling.statsHistogram(spark, dir)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (bin, n, lo, hi) =>
      assert(n > 0 && lo >= bin * 500 && hi < (bin + 1) * 500,
        s"bin $bin bounds its member cents")
    }
    val total = rows.map(_._2).sum
    val nEvents = graft.core.Tables.t(spark, dir, "events").count()
    assert(total == nEvents, "every event lands in exactly one bin")
  }

  test("temperatureMix: smallest source keeps all, fractions fall with size") {
    val docs = (
      (1 to 4).map(i => (i.toLong, "w w w w w", "small")) ++
      (5 to 40).map(i => (i.toLong, "w w w w w", "mid")) ++
      (41 to 140).map(i => (i.toLong, "w w w w w", "big"))
    ).toDF("doc_id", "text", "source")
    withDocs(docs) { tmp =>
      val out = Corpus.temperatureMix(spark, tmp)
        .as[(String, Long, Long, Double)].collect()
        .map(r => r._1 -> r).toMap
      assert(out("small")._4 == 1.0, "smallest source keeps everything")
      assert(out("small")._2 == 4L)
      // equal per-doc tokens: frac = sqrt(n_small / n_src) exactly
      assert(out("mid")._4 == math.sqrt(4.0 / 36.0))
      assert(out("big")._4 == math.sqrt(4.0 / 100.0))
      assert(out("big")._4 < out("mid")._4 && out("mid")._4 < out("small")._4)
    }
  }

  test("ppsSample: deterministic, size near target, sure-things always kept") {
    val rows = (1 to 2000).map(i => (i.toLong, (i % 100 + 1).toLong))
      .toDF("k", "w")
    val pick = Sampling.ppsSample(rows, col("k"), col("w"), 200.0)
      .as[(Long, Long)].collect().toSet
    val again = Sampling.ppsSample(rows, col("k"), col("w"), 200.0)
      .as[(Long, Long)].collect().toSet
    assert(pick == again, "hash coin => identical set on rerun")
    assert(math.abs(pick.size - 200) < 60, s"size ${pick.size} near E[n]=200")
    // inclusion probability scales with weight: heavy rows (w>90)
    // should be sampled at >5x the rate of light rows (w<=10)
    val heavy = pick.count(_._2 > 90) / 2000.0 / (10 / 100.0)
    val light = pick.count(_._2 <= 10) / 2000.0 / (10 / 100.0)
    assert(heavy > 5 * light, s"PPS skew: heavy=$heavy light=$light")
    // a row with n*w/sum(w) >= 1 is a sure thing
    val sure = rows.union(Seq((9999L, 10000000L)).toDF("k", "w"))
    val p2 = Sampling.ppsSample(sure, col("k"), col("w"), 200.0)
      .filter(col("k") === 9999L).count()
    assert(p2 == 1L, "inclusion prob >= 1 => always selected")
  }

  test("systematicPps: multiplicities sum to exactly n, heavy rows draw multiply") {
    val rows = (1 to 3000).map(i => (i.toLong, (i % 50 + 1).toLong)).toDF("k", "w")
    val out = Sampling.systematicPps(rows, col("k"), col("w"), 100L)
      .as[(Long, Long, Long)].collect()
    assert(out.map(_._3).sum == 100L, "telescoping => exactly n draws")
    val again = Sampling.systematicPps(rows, col("k"), col("w"), 100L)
      .as[(Long, Long, Long)].collect()
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "deterministic")
    // one row with w > 2*W/n must be drawn at least twice
    val withWhale = rows.union(Seq((99999L, 5000L)).toDF("k", "w"))
    val whale = Sampling.systematicPps(withWhale, col("k"), col("w"), 100L)
      .filter(col("k") === 99999L).as[(Long, Long, Long)].collect()
    assert(whale.length == 1 && whale.head._3 >= 2,
      s"whale multiplicity ${whale.headOption.map(_._3)}")
    // and the gate shape still sums to n on real data
    val gate = Sampling.queries("x_sample_systematic")(spark, dir)
      .as[(Long, Long, Long)].collect()
    assert(gate.map(_._3).sum == 500L)
  }

  test("groupedMode: majority value wins; ties break to smallest value") {
    val df = Seq(
      ("a", 5L), ("a", 5L), ("a", 3L),           // clear mode 5
      ("b", 7L), ("b", 2L), ("b", 7L), ("b", 2L) // tie 2 vs 7 -> 2
    ).toDF("g", "v")
    val out = Sampling.groupedMode(df, "g", "v")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(("a", 5L, 2L), ("b", 2L, 2L)))
  }

  test("containmentPairs catches doc-in-doc that Jaccard misses") {
    val small = (1 to 10).map(i => s"w$i").mkString(" ")
    val big = (1 to 80).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small), (2L, big)).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    // small's 8 shingles all appear in big: containment 1.0
    val c = Dedup.containmentPairs(sh, 0.8)
      .as[(Long, Long, Double)].collect()
    assert(c.toSeq == Seq((1L, 2L, 1.0)))
    // but the union is dominated by big: jaccard = 8/78 << 0.5
    assert(Dedup.jaccardPairs(sh, 0.5).count() == 0L)
  }

  test("cube grand-total row equals the full table count") {
    val out = graft.operators.Relational.queries("a9_cube")(spark, dir)
      .filter(col("l_returnflag").isNull && col("l_linestatus").isNull)
      .as[(String, String, Long, Long)].collect()
    val n = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(out.length == 1 && out.head._3 == n)
  }

  test("attribution report partitions all purchases; rev sums in cents") {
    val report = Temporal.queries("x_events_attribution")(spark, dir)
      .as[(Long, Boolean, Long, Long)].collect()
    val e = spark.read.parquet(s"$dir/events.parquet")
    val nPurch = e.filter(col("event_type") === "purchase").count()
    assert(report.map(_._3).sum == nPurch, "every purchase lands in one bucket")
    val revCents = e.filter(col("event_type") === "purchase")
      .select(sum(round(col("value") * 100).cast("long"))).as[Long].head()
    assert(report.map(_._4).sum == revCents, "revenue conserved")
    assert(report.exists(_._2) && report.exists(!_._2),
      "both attributed and unattributed buckets occur")
  }

  test("maxDf cap: boilerplate shingles stop voting, group overlap survives") {
    // docs 1/2 near-dup via private vocab; ALL docs share a 5-word
    // boilerplate header (=> 3 universal shingles voting for every pair)
    val header = "copyright acme corp all rights"
    val docs = Seq(
      (1L, s"$header x1 x2 x3 x4 x5 x6"),
      (2L, s"$header x1 x2 x3 x4 x5 y9"),
      (3L, s"$header z1 z2 z3 z4 z5 z6"),
      (4L, s"$header q1 q2 q3 q4 q5 q6")).toDF("doc_id", "text")
    val sh = Dedup.shingles(docs)
    // uncapped: the header makes EVERY pair >= 3/19 similar, and at a
    // low threshold all 6 pairs surface
    assert(Dedup.jaccardPairs(sh, 0.15).count() == 6L)
    // capped at df<=2: the 3 header-internal shingles (df=4) drop out
    // of index AND denominators; only the true near-dup pair remains —
    // 5 common (2 header->x bridges + 3 x-internal) of 6+6 filtered
    val capped = Dedup.jaccardPairs(sh, 0.15, maxDf = Some(2L))
      .as[(Long, Long, Double)].collect()
    assert(capped.toSeq == Seq((1L, 2L, 5.0 / 7.0)))
    // containment takes the same knob
    assert(Dedup.containmentPairs(sh, 0.5, maxDf = Some(2L)).count() == 1L)
  }

  test("snapshotDiff classifies added/removed/changed, drops unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val neu = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("k", "v")
    val out = Cdc.snapshotDiff(old, neu, "k", "v")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "removed"), (3L, "changed"), (4L, "added")))
  }

  test("keySkew: shares in basis points, heap top-10, corpus figures ride along") {
    val rows = Sampling.queries("x_stats_key_skew")(spark, dir)
      .as[(Int, Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length == 10 && rows.map(_._1).toSeq == (1 to 10))
    val (total, maxN) = (rows.head._6, rows.head._7)
    rows.foreach { r =>
      assert(r._4 == r._3 * 10000 / total, "integer basis points")
      assert(r._3 <= maxN)
    }
    assert(rows.head._3 == maxN, "rank 1 is the heaviest key")
    assert(rows.sliding(2).forall { case Array(a, b) => a._3 >= b._3 },
      "counts non-increasing")
    // top-10 must come from a heap (TakeOrderedAndProject), not a
    // global-sort window over every key count
    val plan = Sampling.queries("x_stats_key_skew")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), "heap top-k in plan")
  }

  test("full outer join keeps unmatched rows from BOTH sides") {
    // synthetic: key 1 left-only, key 3 right-only, key 2 matched
    // (at sf0.001 every active customer has orders, so the gate data
    // exercises only the right-only case; the gate row's DuckDB hash
    // check covers whatever the corpus contains)
    val cust = Seq((1L, "a"), (2L, "b")).toDF("c_custkey", "c_name")
    val cnt = Seq((2L, 5L), (3L, 7L)).toDF("c_custkey", "n_orders")
    val out = cust.join(cnt, Seq("c_custkey"), "full_outer")
      .as[(Long, Option[String], Option[Long])].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, Some("a"), None), (2L, Some("b"), Some(5L)),
      (3L, None, Some(7L))))
    // and the gate query itself surfaces right-only rows on sf data
    val gate = graft.operators.Relational.queries("j11_full_outer")(spark, dir)
      .as[(Long, Option[String], Option[Long])].collect()
    assert(gate.exists(r => r._2.isEmpty && r._3.isDefined),
      "orders of an excluded customer -> null name")
    assert(gate.map(_._1).distinct.length == gate.length, "key appears once")
  }

  test("minMaxScale: group min -> 0, max -> 1, constant group -> 0") {
    val df = Seq(("a", 10L), ("a", 30L), ("a", 20L), ("b", 7L), ("b", 7L))
      .toDF("g", "v")
    val out = Sampling.minMaxScale(df, "g", col("v"))
      .select(col("g"), col("v"), col("scaled"))
      .as[(String, Long, Double)].collect().toSet
    assert(out == Set(("a", 10L, 0.0), ("a", 30L, 1.0), ("a", 20L, 0.5),
      ("b", 7L, 0.0), ("b", 7L, 0.0)))
  }

  test("percentRank: 0 at group min, 1 at group max, ties share a rank") {
    val rows = Sampling.queries("x_stats_percent_rank")(spark, dir)
      .as[(Long, String, Long, Double)].collect()
    rows.groupBy(_._2).foreach { case (_, g) =>
      val byC = g.sortBy(_._3)
      assert(byC.head._4 == 0.0 && byC.last._4 == 1.0)
      // equal cents => equal percent_rank
      byC.groupBy(_._3).values.foreach(ts =>
        assert(ts.map(_._4).distinct.length == 1))
    }
  }

  private def withDocs[T](df: org.apache.spark.sql.DataFrame)(f: String => T): T = {
    val tmp = java.nio.file.Files.createTempDirectory("round8-spec").toString
    try { df.write.parquet(s"$tmp/documents.parquet"); f(tmp) }
    finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }
}
