package graft

import graft.operators.{Corpus, Graph, Profile, Relational}
import org.apache.spark.sql.functions._

/** Round-9 second batch: data-quality validation/profiling, DSIR-style
  * importance scoring, common-neighbor link prediction, and the salted
  * skew join's gate identity.
  */
class Round9bSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // ------------------------------------------------------- Profile

  test("constraintChecks: violations are counted and verdicts match") {
    val df = Seq(
      (Some(1L), Some("x"), "O", 10.0),
      (Some(2L), None, "F", -5.0),       // null fk, negative value
      (Some(2L), Some("y"), "Z", 0.0),   // dup key, bad domain
      (None, Some("z"), "P", 1.0))       // null key (hits completeness of k)
      .toDF("k", "fk", "st", "v")
    val out = Profile.constraintChecks(df, Seq(
        Profile.Check.nonEmpty,
        Profile.Check.complete("fk"),
        Profile.Check.unique("k"),
        Profile.Check.atLeast("v", 0d),
        Profile.Check.inSet("st", Seq("O", "F", "P"))))
      .as[(String, Long, Boolean)].collect().toSeq
    // count(distinct k) ignores the null key: 4 rows - 2 distinct = 2
    assert(out == Seq(
      ("complete_fk", 1L, false),
      ("domain_st", 1L, false),
      ("min_v", 1L, false),
      ("rows_nonempty", 4L, true),
      ("unique_k", 2L, false)))
  }

  test("constraintChecks: clean table passes everything") {
    val df = Seq((1L, "a", "O", 1.0), (2L, "b", "F", 2.0)).toDF("k", "fk", "st", "v")
    val out = Profile.constraintChecks(df, Seq(
        Profile.Check.nonEmpty, Profile.Check.complete("fk"),
        Profile.Check.unique("k"), Profile.Check.atLeast("v", 0d),
        Profile.Check.atMost("v", 10d),
        Profile.Check.inSet("st", Seq("O", "F", "P"))))
      .as[(String, Long, Boolean)].collect().toSeq
    assert(out.forall(_._3), s"unexpected failures: ${out.filterNot(_._3)}")
  }

  test("columnSummary: exact bp stats per column") {
    val df = Seq((Some(1.5), 0.07), (None, 0.00), (Some(2.25), 0.07))
      .toDF("a", "b")
    val out = Profile.columnSummary(df, Seq("a", "b"))
      .as[(String, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSeq
    assert(out == Seq(
      ("a", 3L, 1L, 2L, Some(15000L), Some(22500L), Some(37500L)),
      ("b", 3L, 0L, 2L, Some(0L), Some(700L), Some(1400L))))
  }

  // ---------------------------------------------------- Importance

  test("importanceWeights: hand-computed integer affinities") {
    // target: "a b" x1, "a b c" x1 -> vocab {(a,b): 2, (b,c): 1}, tt=3, v=2
    // raw:    "a b x" (one vocab gram (a,b)), "x y" (no vocab grams) -> tr=1
    // aff(a,b) = 3_000_000 div 5 - 2_000_000 div 3 = 600000 - 666666 = -66666
    // aff(b,c) = 2_000_000 div 5 - 1_000_000 div 3 = 400000 - 333333 = 66667
    val docs = Seq(
      (1L, "a b", "t"), (2L, "a b c", "t"),
      (3L, "a b x", "r"), (4L, "x y", "r"), (5L, "z", "r"))
      .toDF("doc_id", "text", "src")
    val affAB = 3000000L / 5 - 2000000L / 3
    val affBC = 2000000L / 5 - 1000000L / 3
    val out = Corpus.importanceWeights(docs, col("src") === "t")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, affAB), (2L, affAB + affBC), (3L, affAB), (4L, 0L), (5L, 0L)))
    // target docs outrank the vocab-overlapping raw doc only through
    // the (b,c) gram raw never uses — the DSIR discrimination signal
    assert(out(1)._2 > out(2)._2)
  }

  test("importanceWeights: no target docs -> empty vocab -> all scores 0") {
    val docs = Seq((1L, "a b", "r"), (2L, "c d", "r")).toDF("doc_id", "text", "src")
    val out = Corpus.importanceWeights(docs, col("src") === "t")
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 0L), (2L, 0L)))
  }

  test("importance gate: keep set is the top quintile with ties kept") {
    val out = Corpus.importanceGate(spark, dir)
      .as[(Long, Long, Boolean)].collect()
    assert(out.length == 500)
    val thr = out.map(_._2).sorted.apply((0.8 * 500).toInt - 1)
    // percentile_disc(0.8) picks the smallest element with cume_dist >=
    // 0.8; every score >= it keeps, below drops — exact, no ordering
    assert(out.forall { case (_, s, k) => k == (s >= thr) })
    assert(out.count(_._3) >= 100)
  }

  // ------------------------------------------------ CommonNeighbors

  test("commonNeighbors: path, star, triangle fixtures") {
    // P4: 1-2-3-4 -> (1,3) via 2, (2,4) via 3; (1,4) shares nothing
    val p4 = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val outP4 = Graph.commonNeighbors(p4, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(outP4 == Set((1L, 3L, 1L), (2L, 4L, 1L)))
    // star: leaves pairwise share the hub; hub adjacent to all
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val outStar = Graph.commonNeighbors(star, k = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(outStar == Set((2L, 3L, 1L), (2L, 4L, 1L), (3L, 4L, 1L)))
    // K3: every pair already an edge -> nothing to predict
    val k3 = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    assert(Graph.commonNeighbors(k3, k = 10).count() == 0)
  }

  test("commonNeighbors: maxDeg cap excludes hub centers") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    // hub degree 3 > cap 2: no wedge centers remain
    assert(Graph.commonNeighbors(star, k = 10, maxDeg = Some(2L)).count() == 0)
    // cap 3 is a no-op
    assert(Graph.commonNeighbors(star, k = 10, maxDeg = Some(3L)).count() == 3)
  }

  test("commonNeighbors gate: degree cap is a no-op on the gate corpus") {
    import graft.operators.Dedup
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(graft.core.Tables.t(spark, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val capped = Graph.commonNeighbors(pairs, k = 20, maxDeg = Some(1000L))
      .as[(Long, Long, Long)].collect().toSeq
    val uncapped = Graph.commonNeighbors(pairs, k = 20)
      .as[(Long, Long, Long)].collect().toSeq
    assert(capped == uncapped)
  }

  // ----------------------------------------------------------- KCore

  test("kCorePeel: chain peels fully, triangle survives, tail strips") {
    // chain 1-2-3-4 under k=2: ends peel, then the middle pair's
    // degrees drop below 2 -> empty within 2 rounds
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    assert(Graph.kCorePeel(chain, k = 2).count() == 0)
    // triangle + pendant tail: tail node 4 peels round 1, triangle is
    // the exact 2-core with all residual degrees 2
    val triTail = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val out = Graph.kCorePeel(triTail, k = 2)
      .as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // k=1 keeps every non-isolated node
    assert(Graph.kCorePeel(triTail, k = 1).count() == 4)
  }

  test("kCorePeel: bounded peel reaches the fixpoint on the gate graph") {
    import graft.operators.Dedup
    val pairs = Dedup.jaccardPairs(
        Dedup.shingles(graft.core.Tables.t(spark, dir, "documents")), 0.5,
        maxDf = Some(Dedup.GateMaxDf))
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val r3 = Graph.kCorePeel(pairs, k = 2, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    val r5 = Graph.kCorePeel(pairs, k = 2, rounds = 5)
      .as[(Long, Long)].collect().toSeq
    assert(r3 == r5, "3-round peel is not the fixpoint on the gate graph")
    assert(r3.nonEmpty)
    assert(r3.forall(_._2 >= 2))
  }

  // ------------------------------------------------------ SaltedJoin

  test("salted join gate == plain equi-join aggregate") {
    val li = graft.core.Tables.t(spark, dir, "lineitem")
    val sup = graft.core.Tables.t(spark, dir, "supplier")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_items"),
        sum(floor(col("l_quantity") * 100).cast("long")).as("qty_cents"))
      .orderBy("s_nationkey")
      .as[(Int, Long, Long)].collect().toSeq
    val salted = Relational.j12SaltedJoin(spark, dir)
      .as[(Int, Long, Long)].collect().toSeq
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
