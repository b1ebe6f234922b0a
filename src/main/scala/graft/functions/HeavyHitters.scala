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
  * Hot-path shape (the buffer sees every token of a 100 TB stream):
  * the classic "decrement ALL counters when full and unseen" step is
  * carried as a lazy global `debt` — effective(x) = stored(x) - debt —
  * so the saturated-unseen case (the COMMON case on a Zipf tail,
  * domain >> k) is one Long increment plus a comparison against a
  * cached minimum, not an O(k) map rebuild. Stored counters are only
  * physically pruned when the debt actually overtakes the cached
  * minimum (at least one entry dies per prune, so prunes are bounded
  * by insertions); the cached minimum may go stale LOW when the
  * minimal entry is incremented, which only ever triggers a prune
  * that removes nothing — conservative, never wrong. Within a
  * partition Spark keeps this buffer deserialized (object-hash
  * aggregation), so per-row cost is the in-memory update.
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
    extends Aggregator[String, (Map[String, Long], Long, Long), Map[String, Long]] {
  require(k > 0, "k must be positive")

  /** (stored counters, debt, cached min stored value). Effective
    * count = stored - debt; entries with stored <= debt are dead. */
  override def zero: (Map[String, Long], Long, Long) =
    (Map.empty, 0L, Long.MaxValue)

  override def reduce(buf: (Map[String, Long], Long, Long),
      x: String): (Map[String, Long], Long, Long) = {
    val (m, debt, minS) = buf
    m.get(x) match {
      case Some(c) =>
        // minS may now be stale-low if x was the unique minimum —
        // harmless: a stale-low min only triggers a no-op prune
        (m.updated(x, c + 1L), debt, minS)
      case None if m.size < k =>
        val c = debt + 1L // effective 1
        (m.updated(x, c), debt, math.min(minS, c))
      case None =>
        // classic MG: the unseen item cancels against one global
        // decrement of every tracked counter — lazily, debt += 1
        val nd = debt + 1L
        if (nd >= minS) {
          val pruned = m.filter(_._2 > nd)
          val newMin = if (pruned.isEmpty) Long.MaxValue
            else pruned.valuesIterator.min
          (pruned, nd, newMin)
        } else (m, nd, minS)
    }
  }

  private def effective(buf: (Map[String, Long], Long, Long)): Map[String, Long] = {
    val (m, debt, _) = buf
    if (debt == 0L) m
    else m.collect { case (t, c) if c > debt => t -> (c - debt) }
  }

  override def merge(a: (Map[String, Long], Long, Long),
      b: (Map[String, Long], Long, Long)): (Map[String, Long], Long, Long) = {
    val ea = effective(a)
    val m = effective(b).foldLeft(ea) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c)
    }
    val cut =
      if (m.size <= k) m
      else {
        // keep the k largest; subtracting the (k+1)-th largest from
        // all preserves the per-item undercount bound additively
        val c = m.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse).apply(k)
        m.collect { case (t, v) if v > c => t -> (v - c) }
      }
    (cut, 0L, if (cut.isEmpty) Long.MaxValue else cut.valuesIterator.min)
  }

  override def finish(buf: (Map[String, Long], Long, Long)): Map[String, Long] =
    effective(buf)

  override def bufferEncoder: Encoder[(Map[String, Long], Long, Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
