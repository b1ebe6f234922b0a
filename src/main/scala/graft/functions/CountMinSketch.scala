package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.util.hashing.MurmurHash3

/** Count-min sketch aggregator: a fixed-memory approximate frequency
  * table over a string stream — `depth` hash rows of `width` counters;
  * an item's estimate is the MINIMUM of its counters, so estimates
  * only ever OVER-count (collisions add, never subtract). With
  * `width = ceil(e / eps)` and `depth = ceil(ln(1/delta))` the
  * overestimate is at most `eps * N` with probability `1 - delta`.
  *
  * Why this shape for 100 TB: exact per-item counts of an unbounded
  * key domain (URLs, shingles, tokens) need a shuffle keyed on the
  * item — the sketch needs `depth * width * 8` bytes TOTAL, merges by
  * element-wise addition (commutative/associative → Spark
  * partial-aggregates it map-side), and answers point queries without
  * ever materializing the key domain. The complementary exact op is
  * `x_corpus_vocab_topk` (oracle-checked); the sketch trades exactness
  * for constant memory the same way HLL does for distinct counts —
  * and like HLL it is spec-bounded, not oracle-checked: the estimate
  * is a property of this sketch's hash family, not portable SQL.
  *
  * Hashing is MurmurHash3 with the row index as seed — deterministic
  * across JVMs and independent between rows.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {
  require(depth > 0 && width > 0, "depth and width must be positive")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], x: String): Array[Long] = {
    var r = 0
    while (r < depth) {
      buf(r * width + CountMinSketch.slot(x, r, width)) += 1L
      r += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}

object CountMinSketch {

  /** Counter slot of `x` in hash row `r` (row index seeds the hash, so
    * rows are independent). */
  private[functions] def slot(x: String, r: Int, width: Int): Int =
    math.floorMod(MurmurHash3.stringHash(x, 0x9E3779B9 * (r + 1)), width)

  /** Point estimate: the minimum counter across rows — an upper bound
    * on the true count, within eps*N of it with probability 1-delta. */
  def estimate(sketch: Array[Long], depth: Int, width: Int, x: String): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = sketch(r * width + slot(x, r, width))
      if (c < best) best = c
      r += 1
    }
    best
  }
}
