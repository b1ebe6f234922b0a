package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming weighted reservoir — the unbounded-stream form of
  * [[graft.operators.Sampling.weightedSampleNoReplace]].
  *
  * The A-ES race score -ln(u)/w is a DETERMINISTIC per-row function
  * (u is the md5 key fraction), so "the exact-n weighted
  * no-replacement sample of everything seen so far" is just the
  * running top-n of a per-row score: bounded state (n pairs), no
  * randomness to checkpoint, and — the property worth having — the
  * streaming reservoir at any point EQUALS the batch draw over the
  * union of all batches seen (StreamingSampleSpec pins it). A restart
  * replaying from the checkpoint converges to the identical state for
  * the same reason; there is no RNG whose seed could drift.
  *
  * State/scale shape: one [[graft.functions.TopK]] accumulator of n
  * (score, key) pairs — partial-aggregated, so each micro-batch task
  * reduces its slice to <= n pairs before the (single-group) shuffle.
  * Like every single-group reduction the final merge is one task;
  * fine for the n <= ~10^5 a sample means. The payload carried is the
  * KEY only — consumers join the sampled keys back to the stored
  * corpus, the same candidates-then-join discipline as the ANN
  * stores.
  *
  * Output (complete mode): (k, score) — the current reservoir
  * membership with its race score (consumers join k back to the
  * corpus; the score orders the reservoir and prices replacement).
  */
object SampleIngest {

  /** Running A-ES reservoir over a streaming frame. `key` and `weight`
    * must be integral columns (the key hashes via its decimal string
    * like every sampler). */
  def weightedReservoir(rows: DataFrame, key: Column, weight: Column,
      n: Int): DataFrame = {
    require(n > 0, s"weightedReservoir: n must be positive (got $n)")
    import rows.sparkSession.implicits._
    import graft.functions.TopK
    val scored = rows.select(
      graft.operators.Sampling.aesRaceScore(key, weight, "weightedReservoir")
        .as("score"),
      key.cast("long").as("k"))
    // TopK keeps the HIGHEST scores with ties to the smaller payload;
    // the race takes the LOWEST, so negate.
    val top = scored.select(col("score"), col("k"))
      .as[(Double, Long)]
      .groupByKey(_ => 0)
      .mapValues { case (s, k) => (-s, k) }
      .agg(new TopK(n).toColumn.name("top"))
      .flatMap { case (_, items) => items.map { case (negS, k) => (k, -negS) } }
      .toDF("k", "score")
    top
  }
}
