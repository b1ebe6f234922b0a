package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning: reduce a fact table to the rows whose
  * key passes a Bloom filter built from the (filtered) dimension keys,
  * then make the result exact with a semi-join over the survivors.
  * This is the manual form of the runtime row-level filtering Spark
  * itself injects for shuffle joins
  * (`spark.sql.optimizer.runtimeFilter.bloomFilter` — the "large side
  * scan carries a bloom built on the small side" pattern); writing it
  * explicitly lets a pipeline persist the filter and reuse it across
  * queries/batches, which the optimizer's per-query filter cannot.
  *
  * Scale shape: the filter is built with one aggregation over the dim
  * keys (a few MB of bits for 10^8 keys at 3% fpp), ships to every
  * executor as a broadcast task binary, and drops non-matching fact
  * rows AT THE SCAN, before any exchange — so the only rows that reach
  * the exact semi-join's hash table probe are true matches plus the fpp
  * tail. At 100 TB the win is shuffle volume: a 0.1%-selective dim
  * predicate means ~99.9% of the fact never leaves the scan stage.
  * The probe itself is [[graft.functions.BloomMightContain]] — a
  * codegen'd expression over the serialized sketch (decoded once per
  * task), so the per-row membership test stays inside whole-stage
  * codegen instead of fencing it behind a scala UDF boundary.
  */
object BloomPrune {

  type Q = (SparkSession, String) => DataFrame

  /** Exact semi-join of `fact` against `dimKeys`, bloom-prefiltered.
    * `expectedKeys`/`fpp` size the sketch. Output == plain left-semi
    * join (the filter only prunes; the semi-join removes false
    * positives). */
  def bloomSemiJoin(fact: DataFrame, factKey: String, dimKeys: DataFrame,
      dimKey: String, expectedKeys: Long, fpp: Double): DataFrame = {
    val bf = dimKeys.stat.bloomFilter(dimKey, expectedKeys, fpp)
    fact.filter(graft.functions.BloomMightContain
        .bloomMightContain(bf, col(factKey)))
      .join(broadcast(dimKeys.select(col(dimKey).as(factKey))), Seq(factKey), "left_semi")
  }

  /** Prefilter-only leg, for measuring pruning selectivity in specs. */
  def bloomPrefilter(fact: DataFrame, factKey: String, dimKeys: DataFrame,
      dimKey: String, expectedKeys: Long, fpp: Double): DataFrame = {
    val bf = dimKeys.stat.bloomFilter(dimKey, expectedKeys, fpp)
    fact.filter(graft.functions.BloomMightContain
      .bloomMightContain(bf, col(factKey)))
  }

  /** Gate query: orders placed by BUILDING-segment customers, routed
    * through the bloom prefilter + exact semi-join. The oracle is the
    * plain IN-subquery — output-identity with the unpruned semi-join is
    * the operator's contract. */
  val joinBloomPrefilter: Q = (s, dir) => {
    val dim = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val fact = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    bloomSemiJoin(fact, "o_custkey", dim, "c_custkey",
        expectedKeys = 1000000L, fpp = 0.03)
      .orderBy("o_orderkey")
  }

  val queries: Map[String, Q] = Map(
    "x_join_bloom_prefilter" -> joinBloomPrefilter)

  val oracles: Map[String, String] = Map(
    "x_join_bloom_prefilter" ->
      ("SELECT o_orderkey, o_custkey, o_totalprice FROM orders " +
        "WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING') " +
        "ORDER BY o_orderkey"))
}
