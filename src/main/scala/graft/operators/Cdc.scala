package graft.operators

import graft.core.Tables.t
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: applying a change batch onto a
  * snapshot (SCD type 1 merge/upsert) and building validity-interval
  * history from an event log (SCD type 2). The reference's closest
  * analog is its update-join family (j4/j5 —
  * /root/reference/PharmacoDI/build_meta_tables.py update joins), which
  * patch columns in place; these two generalize that to whole-row
  * insert/update/delete semantics, the shape every incremental
  * 100 TB pipeline needs for snapshot maintenance.
  *
  * Scale design:
  *  - [[mergeUpsert]] never shuffles the snapshot: the replaced-key set
  *    (one key per update/delete — the change batch is small next to
  *    the snapshot by definition of CDC) broadcasts into a left-anti
  *    hash join, and the applied rows union in. One scan of the
  *    snapshot, zero exchanges on it — the plan a MERGE INTO would
  *    produce on a sort-merge engine costs a full shuffle instead.
  *    For a change batch too big to broadcast, drop the hint and the
  *    same code runs as a shuffle anti-join.
  *  - [[scd2]] is one window per entity (lead over the entity's change
  *    sequence) — a single shuffle on the entity key, linear work per
  *    partition; entities are independent so the shape holds on 1000
  *    executors.
  */
object Cdc {

  type Q = (SparkSession, String) => DataFrame

  /** Apply a change batch to a snapshot. `changes` carries an `op`
    * column ('I' insert / 'U' update / 'D' delete) plus the full
    * snapshot schema; `key` is the primary key. Updates and deletes
    * remove the matching snapshot row; updates and inserts then add
    * their payload. Output = post-merge snapshot. */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val replaced = changes.filter(col("op").isin("U", "D")).select(key)
    val kept = snapshot.join(broadcast(replaced), Seq(key), "left_anti")
    val applied = changes.filter(col("op").isin("U", "I")).drop("op")
    kept.unionByName(applied)
  }

  /** SCD2 history build: from an event log keyed by `key` and ordered
    * by (`sec`, `tiebreak`), emit one validity interval per event —
    * valid_from = its second, valid_to = the next event's second (null
    * while current). One lead() window per key. */
  def scd2(events: DataFrame, key: String, sec: String, tiebreak: String): DataFrame = {
    val w = Window.partitionBy(key).orderBy(col(sec), col(tiebreak))
    events
      .withColumn("valid_from", col(sec))
      .withColumn("valid_to", lead(col(sec), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull, lit(1)).otherwise(lit(0)))
  }

  /** Gate query: a deterministic change batch derived from the orders
    * snapshot itself (key%10==0 → price update, ==1 → delete, ==2 →
    * insert under a shifted key), merged back. The +100.0 price bump is
    * a single IEEE double add — bit-portable across engines, unlike a
    * multiply-and-round chain. */
  val cdcMergeUpsert: Q = (s, dir) => {
    val snap = t(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val changes = snap
      .filter(col("o_orderkey") % 10 <= 2)
      .select(
        when(col("o_orderkey") % 10 === 0, lit("U"))
          .when(col("o_orderkey") % 10 === 1, lit("D"))
          .otherwise(lit("I")).as("op"),
        when(col("o_orderkey") % 10 === 2, col("o_orderkey") + 1000000000L)
          .otherwise(col("o_orderkey")).as("o_orderkey"),
        col("o_custkey"),
        col("o_orderstatus"),
        when(col("o_orderkey") % 10 === 0, col("o_totalprice") + 100.0)
          .otherwise(col("o_totalprice")).as("o_totalprice"))
    mergeUpsert(snap, changes, "o_orderkey").orderBy("o_orderkey")
  }

  /** Gate query: per-user state history from the event log — each
    * event opens an interval that the user's next event closes. */
  val cdcScd2: Q = (s, dir) => {
    val e = t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000000000").as("sec"))
    scd2(e, "user_id", "sec", "event_id")
      .select("user_id", "event_id", "event_type",
        "valid_from", "valid_to", "version", "is_current")
      .orderBy("user_id", "version")
  }

  /** Merge partial aggregates — incremental materialized-view
    * maintenance for distributive aggregates (count/sum; min/max work
    * the same way; avg = sum/count at read time). Each input is a
    * per-group partial state table; the merge is a re-aggregation of
    * their union. This is THE reason to store aggregates as
    * (count, sum, ...) state rather than finished values: refreshing a
    * 100 TB view for a 1 GB batch touches the batch and the (tiny)
    * stored state, never the base data. */
  def mergePartialAggs(parts: Seq[DataFrame], key: String): DataFrame =
    parts.reduce(_ unionByName _)
      .groupBy(key)
      .agg(sum("n").as("n"), sum("total").as("total"))

  /** Gate query: the orders aggregate by priority, maintained
    * incrementally — "stored" partial state from the base rows
    * (key%5 != 0) merged with a new batch (key%5 == 0). The sums
    * accumulate in decimal(18,2+) so the merged state is exact and the
    * merged output is bit-identical to a full recompute (spec-checked;
    * the oracle simply computes the full aggregate). */
  val cdcAggRefresh: Q = (s, dir) => {
    import org.apache.spark.sql.types.DecimalType
    val o = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("p"))
    def partial(df: DataFrame) = df.groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"), sum("p").as("total"))
    val stored = partial(o.filter(col("o_orderkey") % 5 =!= 0))
    val batch = partial(o.filter(col("o_orderkey") % 5 === 0))
    mergePartialAggs(Seq(stored, batch), "o_orderpriority")
      .orderBy("o_orderpriority")
  }

  /** Snapshot DIFF by content hash: classify every key across two
    * snapshot versions as added / removed / changed (unchanged rows —
    * the overwhelming bulk — are dropped). The comparison never
    * touches payload bytes past the scan: each side reduces to
    * (key, md5) at the parquet reader, so the full-outer join
    * shuffles 16-byte digests, not documents. The audit twin of
    * [[mergeUpsert]]: diff(old, new) is the change batch that would
    * replay old into new — data-versioning regression checks at
    * 100 TB run this, not a byte compare. */
  def snapshotDiff(old: DataFrame, neu: DataFrame, key: String,
      payload: String): DataFrame = {
    // Presence markers, not hash-nullness: md5(null) is null, so a key
    // present with a NULL payload would otherwise read as absent
    // ('added'/'removed') and a null-vs-null pair would drop as
    // unchanged through null !== null. The null-safe <=> makes
    // null==null unchanged and null-vs-value changed.
    val o = old.select(col(key), md5(col(payload)).as("__h_old"),
      lit(1).as("__in_old"))
    val n = neu.select(col(key), md5(col(payload)).as("__h_new"),
      lit(1).as("__in_new"))
    o.join(n, Seq(key), "full_outer")
      .withColumn("status",
        when(col("__in_old").isNull, "added")
          .when(col("__in_new").isNull, "removed")
          .when(!(col("__h_old") <=> col("__h_new")), "changed"))
      .filter(col("status").isNotNull)
      .select(col(key), col("status"))
  }

  /** Gate query: the "new" snapshot is a deterministic perturbation of
    * documents — doc_id%97==0 removed, doc_id%101==0 text-revised,
    * doc_id%103==0 re-keyed (+10^9: old id removed, new id added). */
  val cdcSnapshotDiff: Q = (s, dir) => {
    val docs = t(s, dir, "documents")
    val neu = docs.filter(col("doc_id") % 97 =!= 0)
      .select(
        when(col("doc_id") % 103 === 0, col("doc_id") + 1000000000L)
          .otherwise(col("doc_id")).as("doc_id"),
        when(col("doc_id") % 101 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    snapshotDiff(docs, neu, "doc_id", "text")
      .orderBy("doc_id", "status")
  }

  val queries: Map[String, Q] = Map(
    "x_cdc_merge_upsert" -> cdcMergeUpsert,
    "x_cdc_agg_refresh" -> cdcAggRefresh,
    "x_cdc_snapshot_diff" -> cdcSnapshotDiff,
    "x_cdc_scd2" -> cdcScd2)

  val oracles: Map[String, String] = Map(
    "x_cdc_merge_upsert" ->
      ("WITH snap AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders), " +
        "ch AS (SELECT CASE WHEN o_orderkey % 10 = 0 THEN 'U' WHEN o_orderkey % 10 = 1 THEN 'D' ELSE 'I' END AS op, " +
        "CASE WHEN o_orderkey % 10 = 2 THEN o_orderkey + 1000000000 ELSE o_orderkey END AS o_orderkey, " +
        "o_custkey, o_orderstatus, " +
        "CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 100.0 ELSE o_totalprice END AS o_totalprice " +
        "FROM snap WHERE o_orderkey % 10 <= 2), " +
        "kept AS (SELECT * FROM snap WHERE o_orderkey NOT IN " +
        "(SELECT o_orderkey FROM ch WHERE op IN ('U','D'))), " +
        "applied AS (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM ch WHERE op IN ('U','I')) " +
        "SELECT * FROM kept UNION ALL SELECT * FROM applied ORDER BY o_orderkey"),
    "x_cdc_snapshot_diff" ->
      ("WITH neu AS (SELECT CASE WHEN doc_id % 103 = 0 THEN doc_id + 1000000000 ELSE doc_id END AS doc_id, " +
        "CASE WHEN doc_id % 101 = 0 THEN text || ' rev2' ELSE text END AS text " +
        "FROM documents WHERE doc_id % 97 <> 0), " +
        "o AS (SELECT doc_id, md5(text) AS h_old FROM documents), " +
        "n AS (SELECT doc_id, md5(text) AS h_new FROM neu) " +
        "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, " +
        "CASE WHEN o.doc_id IS NULL THEN 'added' WHEN n.doc_id IS NULL THEN 'removed' " +
        "WHEN h_old <> h_new THEN 'changed' END AS status " +
        "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id " +
        "WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR h_old <> h_new " +
        "ORDER BY doc_id, status"),
    "x_cdc_agg_refresh" ->
      ("WITH o AS (SELECT o_orderkey, o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders), " +
        "pb AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, SUM(p) AS total FROM o WHERE o_orderkey % 5 <> 0 GROUP BY o_orderpriority), " +
        "pn AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, SUM(p) AS total FROM o WHERE o_orderkey % 5 = 0 GROUP BY o_orderpriority), " +
        "u AS (SELECT * FROM pb UNION ALL SELECT * FROM pn) " +
        "SELECT o_orderpriority, CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(total) AS DECIMAL(38,2)) AS total " +
        "FROM u GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "x_cdc_scd2" ->
      ("WITH e AS (SELECT user_id, event_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events) " +
        "SELECT user_id, event_id, event_type, sec AS valid_from, " +
        "lead(sec) OVER w AS valid_to, " +
        "CAST(row_number() OVER w AS INT) AS version, " +
        "CASE WHEN lead(sec) OVER w IS NULL THEN 1 ELSE 0 END AS is_current " +
        "FROM e WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id) " +
        "ORDER BY user_id, version"))
}
