package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Foreign-key surrogate mapping with unmatched-key audit — the
  * reference's `join_tables` semantics
  * (/root/reference/PharmacoDI/combine_pset_tables.py:296-330): left
  * join fact to a keyed dimension, log the distinct natural keys that
  * failed to map (:319-323), delete the unmatched rows (:324-326), and
  * swap the natural key for the surrogate id (:327-329).
  *
  * Spark-first shape: the dimension is always broadcast (dimension
  * tables here are orders of magnitude smaller than facts), so the
  * mapping is a map-side hash join with no shuffle of the fact table;
  * the audit is a `left_anti` join on the same broadcast, so at 100 TB
  * the fact is scanned once per mapping with zero shuffles.
  */
object Audit {

  final case class FkMapping(mapped: DataFrame, unmatched: DataFrame)

  /** Map `fact.factKey` (natural key) to `dim.idCol` via
    * `dim.dimKey`, producing `outCol` = surrogate id; drop rows whose
    * key has no match (reporting them in `unmatched`).
    */
  def mapForeignKey(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String = "name",
      idCol: String = "id",
      outCol: String = ""): FkMapping = {
    val out = if (outCol.nonEmpty) outCol else factKey
    val d = broadcast(dim.select(col(dimKey).as("__k"), col(idCol).as("__id")))
    val joined = fact.join(d, fact(factKey) === col("__k"), "left")
    val unmatched = joined.filter(col("__id").isNull)
      .select(col(factKey)).distinct()
    val mapped = joined.filter(col("__id").isNotNull)
      .drop(factKey, "__k")
      .withColumnRenamed("__id", out)
    FkMapping(mapped, unmatched)
  }

  /** Row-conservation check (build_meta_tables.py:109-111): warn-style
    * audit comparing counts before/after a transformation.
    */
  def rowConservation(before: Long, after: Long, what: String): Option[String] =
    if (before != after)
      Some(s"[audit] $what: row count changed $before -> $after")
    else None
}
