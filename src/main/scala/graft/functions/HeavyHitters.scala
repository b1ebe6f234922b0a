package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters summary: at most `k` (item, counter)
  * pairs over a string stream of length N, guaranteeing
  * `true(x) - N/(k+1) <= est(x) <= true(x)` for EVERY item — so any
  * item with true frequency above N/(k+1) is certainly present in the
  * summary with a positive counter. The summary is MERGEABLE with the
  * same bound (Agarwal/Cormode et al., "Mergeable Summaries", PODS
  * 2012): merge = keyed counter sum, then subtract the (k+1)-th
  * largest counter from all and drop non-positives — which is why
  * Spark can partial-aggregate it map-side and the guarantee survives
  * any partitioning / merge order.
  *
  * Why this shape for 100 TB: the exact frequent-items query needs a
  * shuffle keyed on an unbounded item domain (tokens, URLs, shingles);
  * this summary is `k` pairs TOTAL per partial, answers "which items
  * exceed phi*N" without materializing the domain, and complements
  * [[CountMinSketch]] (point estimates, over-counts) with the
  * candidate SET (under-counts, never fabricates an absent item —
  * everything it returns was genuinely seen). Exact twin:
  * `x_corpus_vocab_topk`. The surfaced counter VALUES depend on
  * arrival/merge order (only the bound is deterministic), so the gate
  * row (`x_stats_heavy_hitters`) checks the order-free guarantee —
  * every true heavy hitter is captured — exactly like the CMS/HLL
  * bound rows.
  */
class HeavyHitters(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(k > 0, "k must be positive")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
    buf.get(x) match {
      case Some(c) => buf.updated(x, c + 1L)
      case None if buf.size < k => buf.updated(x, 1L)
      // full and unseen: decrement every counter instead of inserting
      // (the classic MG step — charges the new item and one occurrence
      // of each tracked item together, bounding total undercount)
      case None => buf.collect { case (t, c) if c > 1L => t -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val m = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    if (m.size <= k) m
    else {
      // keep the k largest counters; subtracting the (k+1)-th largest
      // from all preserves the per-item undercount bound additively
      val cut = m.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
      m.collect { case (t, c) if c > cut => t -> (c - cut) }
    }
  }

  override def finish(buf: Map[String, Long]): Map[String, Long] = buf

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
