package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IndexStore, Retrieval, Similarity, Temporal}

/** Round 15: probe-score calibration on a deliberately mean-shifted
  * corpus (the r14 form dropped the +w·mean constant — invisible on
  * near-zero-mean fixtures), the loud w0Dim corpus checks, the
  * empty-funnel division guard, the pin-if-pinned guard, broadcast
  * discipline across the whole BM25 family's plans, the ANN-leg
  * hybrid fusion contract, and the non-BMP token-order canary that
  * replaced the standing UTF-16-vs-UTF-8 prose adjudication with an
  * executable fence (and falsified it: the engine agrees with DuckDB
  * even off-BMP; only driver-side Java sorts diverge). */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val d = Files.createTempDirectory(tag).toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  // ---- probe calibration ----

  test("probe score is calibrated: score(corpus mean) ~ ybar on a mean-shifted corpus") {
    // every axis carries a large constant offset, so the w·mean term
    // is far from zero — exactly the corpus class where dropping it
    // (the r14 bug) would shift every score by a constant
    val rows = (0 until 40).map { i =>
      val y = i % 2
      (i.toLong,
        Seq(10.0f + y * 2.0f + (i % 5) * 0.01f, 7.0f, 5.0f, 3.0f), y)
    }
    val emb = rows.toDF("vec_id", "embedding", "__y")
    val (w, m, b) = Similarity.linearProbeParams(emb, col("__y"), dim = 4)
    val atMean = Seq((0L, m)).toDF("vec_id", "embedding")
    val s0 = Similarity.probeScore(atMean, w, m, b)
      .select("score").head().getDouble(0)
    assert(math.abs(s0 - 0.5) < 0.02,
      s"score at the corpus mean must be ~ybar (0.5), got $s0")
    // and the documented score>0.5 decision rule actually separates
    val acc = Similarity.probeScore(emb, w, m, b)
      .filter((col("score") > 0.5).cast("int") === col("__y"))
      .count().toDouble / 40
    assert(acc >= 0.9, s"decision rule must separate the shifted corpus, got $acc")
  }

  // ---- loud corpus checks on the stored-whitening serve path ----

  test("whitenFromIndex fails loudly on empty and wrong-width corpora") {
    val emb = graft.core.Tables.t(spark, dir, "embeddings")
    val path = tmp("r15-whiten")
    IndexStore.ensureWhitenIndex(emb, path)
    // empty: eager caller error (one-row sample, no corpus pass)
    val e1 = intercept[IllegalArgumentException] {
      IndexStore.whitenFromIndex(emb.filter(lit(false)), spark, path)
    }
    assert(e1.getMessage.contains("empty corpus"))
    // wrong/ragged width: raises PER ROW inside the serve projection —
    // zero extra scans, and no short row can be silently
    // prefix-projected by the fused kernel
    val ragged = Seq((0L, (0 until 64).map(_.toFloat)), (1L, Seq(1.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val e2 = intercept[Exception] {
      IndexStore.whitenFromIndex(ragged, spark, path).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e2).exists(_.contains("stored transform dim")),
      s"wrong-width row must raise the guard error, got: ${messages(e2)}")
  }

  // ---- empty-funnel guard ----

  test("funnelSteps yields zero conv_bp, never nulls, when no user performs step 1") {
    val events = Seq((1L, "click", 1000000000L), (2L, "purchase", 2000000000L))
      .toDF("user_id", "event_type", "ts")
    val out = Temporal.funnelSteps(events, Seq("view", "click", "purchase"))
      .orderBy("step").collect()
    assert(out.length == 3)
    assert(out.forall(r => !r.isNullAt(r.fieldIndex("conv_bp"))),
      "an empty top-of-funnel must not produce NULL conversion rows")
    assert(out.forall(r => r.getLong(r.fieldIndex("conv_bp")) == 0L))
  }

  // ---- pin-if-pinned guard ----

  test("pinIfNeeded recognizes an already-pinned frame and does not re-pin") {
    val df = spark.range(10).toDF("id")
    assert(!graft.core.Materialize.isPinned(df))
    val p = graft.core.Materialize.pin(df)
    assert(graft.core.Materialize.isPinned(p))
    assert(graft.core.Materialize.pinIfNeeded(p) eq p,
      "a bare pinned scan must pass through untouched")
    assert(!(graft.core.Materialize.pinIfNeeded(df) eq df),
      "an unpinned frame must still be pinned")
  }

  // ---- broadcast discipline across the BM25 family ----

  test("every BM25-family plan keeps posting-list joins broadcast; only leg fusion may sort-merge") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    import org.apache.spark.sql.catalyst.plans.FullOuter
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val store = tmp("r15-pstore")
    val qterms = Retrieval.queryTermsLocal(docs)
    graft.streaming.PostingsIngest.ingestBatch(docs, 0L, store)
    val idxAsof = tmp("r15-pidx")
    graft.streaming.PostingsIngest.consolidate(spark, store, idxAsof)
    val wm = graft.streaming.PostingsIngest
      .consolidatedThrough(spark, idxAsof)
    val frames = Seq(
      "inline" -> Retrieval.bm25TopK(docs),
      "rm3" -> Retrieval.bm25Rm3(docs),
      "grown_store" -> graft.streaming.PostingsIngest
        .bm25FromStore(spark, store, qterms),
      "hybrid" -> Retrieval.hybridRrf(docs, emb),
      "hybrid_ann" -> Retrieval.hybridRrfAnn(docs, emb, spark,
        tmp("r15-ivfpq")),
      // the as-of probe re-derives df from its own gen-pruned hits —
      // that extra partial agg must not cost the probe its
      // broadcast-only join discipline
      "asof_index" -> IndexStore.bm25FromIndex(docs, spark, idxAsof,
        Retrieval.NQueries, Retrieval.QueryLen, Retrieval.K,
        asOfGen = wm))
    for ((name, df) <- frames) {
      val smjs = df.queryExecution.sparkPlan.collect {
        case j: SortMergeJoinExec => j
      }
      // the ONLY join that may shuffle-sort is the full-outer RRF leg
      // fusion — its inputs are each bounded by queries*k rows. Any
      // other SMJ means a posting-list or corpus-sized join lost its
      // broadcast and would shuffle the index at scale.
      assert(smjs.forall(_.joinType == FullOuter),
        s"$name: non-fusion SortMergeJoin in plan:\n" +
          smjs.filterNot(_.joinType == FullOuter).mkString("\n"))
    }
  }

  test("bm25Rm3's final plan reads the PINNED tokenization, never the parquet corpus") {
    // the shared-pin claim, executable: after the one tokenization
    // pin, pass-2 hits and stats must both feed from the checkpoint
    // blocks — a documents parquet scan anywhere in the served plan
    // means a consumer fell off the shared frame and re-tokenized
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val plan = Retrieval.bm25Rm3(docs).queryExecution.sparkPlan.toString
    assert(!plan.contains("documents.parquet"),
      s"rm3 serving plan must not rescan the corpus:\n$plan")
    assert(plan.contains("Scan ExistingRDD") || plan.contains("LocalTableScan"),
      "corpus access must flow through the pinned tokenization")
  }

  // ---- ANN-leg hybrid fusion ----

  test("hybridRrfAnn: fused candidates come only from the two legs; bounds hold") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val out = Retrieval.hybridRrfAnn(docs, emb, spark, tmp("r15-ivfpq2"))
      .collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getBoolean(2)), "dense-leg recall bound must hold")
    assert(out.forall(_.getBoolean(3)), "fused-overlap bound must hold")
  }

  test("hybridRrfAnn refuses a non-0-based query id space") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("doc_id", col("doc_id") + 100)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException] {
      Retrieval.hybridRrfAnn(docs, emb, spark, tmp("r15-ivfpq3"))
    }
    assert(e.getMessage.contains("query ids"))
  }

  // ---- retrieval decontamination ----

  test("decontaminate drops exactly the flagged docs; flags are the top-M union") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val flags = Retrieval.decontamFlags(docs).collect()
    val flagged = flags.map(_.getLong(0)).toSet
    // the flag table is exactly the per-query top-M union: bounded by
    // |benchmark| * M rows, every row with a rank inside the cut and
    // at least one query hit. (A query's own doc is SCORED on every
    // term — the bm25 known-item contract — but need not crack the
    // top-M: short high-tf docs legitimately outrank it.)
    assert(flags.nonEmpty && flags.length <= Retrieval.NQueries * Retrieval.DecontamTopM)
    assert(flags.forall { r =>
      r.getLong(r.fieldIndex("n_queries_hit")) >= 1 &&
        r.getInt(r.fieldIndex("best_rank")) <= Retrieval.DecontamTopM
    })
    val kept = Retrieval.decontaminate(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val all = docs.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == all -- flagged, "cleaned corpus = corpus minus flags, exactly")
    // and the anti-join broadcasts (flag side is benchmark-bounded)
    val plan = Retrieval.decontaminate(docs).queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"decontamination must broadcast the flag side:\n$plan")
  }

  // ---- non-BMP token-order canary ----

  test("non-BMP canary: ENGINE string order is UTF-8 byte order (agrees with DuckDB); only driver-side Java sorts diverge") {
    // Writing this fence FALSIFIED the carried prose adjudication:
    // Spark's UTF8_BINARY collation compares UTF-8 BYTES (UTF8String
    // stores UTF-8 and compares bytewise), so every ENGINE-side sort
    // the tokenizing gates rely on (array_sort in query-term
    // selection, orderBy tiebreaks) agrees with DuckDB's byte order
    // even for supplementary-plane tokens. The real divergence class
    // is DRIVER-side Java sorts -- String.compareTo is UTF-16
    // code-unit order, which places the surrogate pair (0xD83D..)
    // BELOW U+FFFF while its UTF-8 bytes (F0 9F ..) sort ABOVE
    // (EF BF BF). All three facts pinned here; the working rule they
    // enforce: token ordering must stay in the engine -- no collected
    // token list may be .sorted driver-side on the gate paths.
    val hi = "\uFFFF"
    val supp = new String(Character.toChars(0x1F600))
    val sparkOrder = Seq(Tuple1(Seq(hi, supp))).toDF("ws")
      .select(array_sort(col("ws")).as("s")).head().getSeq[String](0)
    assert(sparkOrder == Seq(hi, supp),
      "engine sort must be UTF-8 byte order: U+FFFF (EF BF BF) before U+1F600 (F0 9F 98 80)")
    def utf8Cmp(a: String, b: String): Int = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val d = (x(i) & 0xFF) - (y(i) & 0xFF)
        if (d != 0) return d
        i += 1
      }
      x.length - y.length
    }
    assert(utf8Cmp(hi, supp) < 0,
      "DuckDB-side (UTF-8 byte) order agrees with the engine")
    assert(hi.compareTo(supp) > 0,
      "Java String order is UTF-16 code-unit order -- the DIVERGENT one; " +
        "driver-side token sorts would break off-BMP portability")
  }
}
