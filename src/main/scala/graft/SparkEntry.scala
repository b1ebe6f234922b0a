package graft

import graft.operators._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries and oracles are contributed per-module; names key into the
  * SURVEY.md §2 operator inventory (s-, p-, j-, a-, w-, o-, u-, r-,
  * f-prefixed) plus the training-data-pipeline extensions (x_-prefixed).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The spine of the reference workload: broadcast dim chain
    * + fact aggregation (combine_pset_tables.py:296-330 shape). */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val t = (n: String) => spark.read.parquet(s"$dir/$n.parquet")
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "l_returnflag")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy("r_name", "l_returnflag")
  }

  /** Map-merge with a LOUD duplicate check: `++` silently overwrites,
    * so two modules registering the same gate name would quietly drop
    * one gate row from the suite (nearly happened in r14 — a second
    * `x_events_funnel` shadowed the Events one until review). */
  private def merged[V](maps: Seq[Map[String, V]]): Map[String, V] = {
    val all = maps.flatMap(_.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"duplicate gate names registered across modules: ${dups.mkString(", ")}")
    maps.reduce(_ ++ _)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    merged(Seq(Relational.queries, Dedup.queries, Similarity.queries,
      TextAnalysis.queries, Multimodal.queries, EventsOps.queries,
      Temporal.queries, Sampling.queries, Curation.queries,
      Corpus.queries, Cdc.queries, BloomPrune.queries,
      Layout.queries, Graph.queries, Linkage.queries,
      Profile.queries, Retrieval.queries,
      graft.streaming.Compaction.queries,
      graft.streaming.PostingsIngest.queries,
      graft.streaming.AnnIngest.queries,
      graft.streaming.DedupIngest.queries))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashes are not
    * portable across engines (minhash/simhash/rolling-hash/LSH) —
    * those get rows-only checks plus ScalaTest property coverage. */
  def oracleSql: Map[String, String] =
    merged(Seq(Relational.oracles, Dedup.oracles, Similarity.oracles,
      TextAnalysis.oracles, Multimodal.oracles, EventsOps.oracles,
      Temporal.oracles, Sampling.oracles, Curation.oracles,
      Corpus.oracles, Cdc.oracles, BloomPrune.oracles,
      Layout.oracles, Graph.oracles, Linkage.oracles,
      Profile.oracles, Retrieval.oracles,
      graft.streaming.Compaction.oracles,
      graft.streaming.PostingsIngest.oracles,
      graft.streaming.AnnIngest.oracles,
      graft.streaming.DedupIngest.oracles))
}
