package graft.core

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-adaptive scan fan-out (optimization guide §2.5 "input skew":
  * one huge unsplittable file → repartition immediately after the
  * read; here the local twin — one TINY single-row-group file).
  *
  * Row-explosive pipelines (tokenize → shingle/n-gram explode) do
  * their expensive per-row work in the SCAN stage, whose parallelism
  * is bounded by the input's split count. A single-row-group parquet
  * file — the gate corpora, or one unsplittable straggler file at
  * scale — runs that whole stage in ONE task no matter how many cores
  * the session has (parquet cannot split inside a row group, so
  * `spark.sql.files.minPartitionNum` does not help). A 584 KB
  * documents table costs ~0.7 s of single-threaded tokenization per
  * query on local[32] — serial work every downstream stage waits on.
  *
  * `bySize` inserts ONE hash repartition to the session's default
  * parallelism, but only when the frame's estimated size says the
  * scan cannot feed the cores (estimate below the files
  * maxPartitionBytes split size, i.e. the planner will emit ~1 scan
  * partition). The decision reads logical-plan STATS — no job, no
  * RDD materialization (`.rdd` under AQE would execute shuffle
  * stages just to count partitions). At 100 TB the estimate is far
  * above the threshold and this is a no-op by construction — the
  * knob is data-derived, not tuned to either environment.
  *
  * The shuffle key must be a deterministic column (hash partitioning
  * repeats under task retry; round-robin `repartition(n)` pays a
  * sort and risks SPARK-38388-class retry drift) and the caller's
  * downstream must be order-insensitive (aggregation/join shapes —
  * every caller here feeds groupBy/window/join, never a positional
  * fold).
  */
object Fanout {

  /** `df` hash-repartitioned to `defaultParallelism` on `key` iff its
    * plan-estimated size is under one scan split — i.e. exactly when
    * the scan would otherwise plan ~1 task for per-row-expensive
    * downstream work. */
  def bySize(df: DataFrame, key: Column): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val splitBytes = spark.sessionState.conf.filesMaxPartitionBytes
    // a pinned (checkpointed) leaf was materialized by a caller who
    // already controls its partitioning — most pins sit downstream of
    // this very helper; re-fanning would add a shuffle of the blocks
    val pinned = Materialize.isPinned(df)
    val est = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (!pinned && p > 1 && est < splitBytes) df.repartition(p, key) else df
  }
}
