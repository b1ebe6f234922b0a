package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins whose key distribution is heavy-tailed
  * (e.g. a handful of compounds carrying most experiments).
  *
  * First line of defense is AQE's runtime skew-join splitting
  * (`spark.sql.adaptive.skewJoin.enabled`, on in Bench). Salting is
  * the explicit fallback for the cases AQE cannot fix — e.g. a
  * shuffled aggregation on a skewed key, or joins where one hot key
  * exceeds a single task even after splitting:
  *
  *  - the skewed (fact) side gets a deterministic salt in [0, buckets)
  *    derived from other columns, widening the hot key across tasks;
  *  - the other side is replicated once per bucket (explode of a
  *    sequence — cheap when that side is dimension-sized);
  *  - the join key becomes (key, salt), restoring correctness.
  */
object Skew {

  /** Deterministic salt from arbitrary spread columns. */
  def salt(buckets: Int, spread: Column*): Column =
    pmod(xxhash64(spread: _*), lit(buckets.toLong)).cast("int")

  /** Equi-join `fact` to `dim` on `key` with `buckets`-way salting of
    * the fact side. `spread` columns must distribute rows within a hot
    * key (any high-cardinality column works). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, buckets: Int,
      spread: Seq[Column], joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("__salt", salt(buckets, spread: _*))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(repDim, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
