package graft.pset

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed external-fetch skeleton for the S10-S12 sources
  * (ChEMBL paginated REST, UniProt id-mapping, clinicaltrials.gov).
  * The reference fans requests out with a multiprocessing pool on one
  * machine (get_chembl_compound_targets.py:93-113); the Spark-first
  * form is a `mapPartitions` over the request frame — each PARTITION
  * is a polite sequential client (one throttle clock, bounded retry),
  * and total concurrency is simply the partition count, set with
  * `repartition(n)` before the call. That gives the cluster the same
  * knobs a pool gives one host, plus data-locality of the keys and
  * restartable tasks.
  *
  * Boundaries kept deliberately:
  *  - the fetch function is injected (`Fetch = String => String`), so
  *    engine code carries no endpoint specifics and specs can run a
  *    localhost stub server — zero network assumptions in tests;
  *  - fetch emits RAW payload strings; JSON flattening happens
  *    downstream with `from_json`/`inline` (codegen'd, oracle-visible)
  *    — never json parsing inside the fetch loop;
  *  - failures land in an `error` column after retries, they do not
  *    kill the job (the reference's `@logger.catch` swallow, made
  *    explicit and queryable — EnrichmentBuilders' anti-join audits
  *    can route them).
  */
object EnrichmentFetch {

  /** url -> response body. Implementations must be Serializable (the
    * closure ships to executors). */
  type Fetch = String => String

  /** Plain java.net GET — the production implementation; specs point
    * it at a localhost stub. */
  def httpGet(timeoutMs: Int = 10000): Fetch = url => {
    val conn = new java.net.URI(url).toURL.openConnection()
      .asInstanceOf[java.net.HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    try {
      val src = scala.io.Source.fromInputStream(conn.getInputStream, "UTF-8")
      try src.mkString finally src.close()
    } finally conn.disconnect()
  }

  /** One GET per request row, fanned out across partitions. Output:
    * (key, payload, error) — `payload` null after `maxRetries`
    * failures, with the last message in `error`. `minIntervalMs`
    * paces requests WITHIN a partition (global rate = partitions x
    * 1000/minIntervalMs req/s — the politeness contract a public API
    * demands, controlled by repartitioning the request frame). */
  def fetchJson(requests: DataFrame, keyCol: String, urlCol: String,
      fetch: Fetch, maxRetries: Int = 3, minIntervalMs: Long = 0L): DataFrame = {
    import requests.sparkSession.implicits._
    requests.select(col(keyCol).cast("string"), col(urlCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        var lastReq = 0L
        it.map { case (key, url) =>
          val wait = lastReq + minIntervalMs - System.currentTimeMillis()
          if (wait > 0) Thread.sleep(wait)
          lastReq = System.currentTimeMillis()
          var attempt = 0
          var body: String = null
          var err: String = null
          while (body == null && attempt < maxRetries) {
            try { body = fetch(url); err = null }
            catch {
              case e: Exception =>
                err = String.valueOf(e.getMessage)
                attempt += 1
                if (attempt < maxRetries) Thread.sleep(50L << attempt)
            }
          }
          (key, body, err)
        }
      }
      .toDF(keyCol, "payload", "error")
  }

  /** Paginated REST consumption — the ChEMBL shape
    * (get_chembl_compound_targets.py: offset/limit pages until the
    * response carries no `next` link). Per key, pages are fetched
    * sequentially inside the partition (they are causally chained —
    * no parallelism to find there) and emitted one row per page;
    * different keys still parallelize across partitions. `nextUrl`
    * extracts the follow-up URL from a payload (None = last page);
    * `maxPages` bounds a server that never stops paginating. */
  def fetchPaginated(requests: DataFrame, keyCol: String, urlCol: String,
      fetch: Fetch, nextUrl: String => Option[String],
      maxPages: Int = 1000): DataFrame = {
    import requests.sparkSession.implicits._
    requests.select(col(keyCol).cast("string"), col(urlCol).cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (key, url0) =>
          val pages = scala.collection.mutable.ArrayBuffer.empty[(String, Int, String)]
          var next: Option[String] = Some(url0)
          while (next.isDefined && pages.size < maxPages) {
            val body = fetch(next.get)
            pages += ((key, pages.size, body))
            next = nextUrl(body)
          }
          pages
        }
      }
      .toDF(keyCol, "page", "payload")
  }

  /** Batched id-mapping — the UniProt shape
    * (build_target_tables.py:205-231: ONE request carries many ids,
    * response is a tab-separated id->id table). Ids are grouped into
    * `batchSize` chunks per partition, one request per chunk; the TSV
    * payload is exploded back to (from_id, to_id) rows with built-ins
    * (split + explode), not in the fetch loop. */
  def fetchIdMapping(ids: DataFrame, idCol: String,
      batchUrl: Seq[String] => String, fetch: Fetch,
      batchSize: Int = 100): DataFrame = {
    import ids.sparkSession.implicits._
    val payloads = ids.select(col(idCol).cast("string")).as[String]
      .mapPartitions { it =>
        it.grouped(batchSize).map(chunk => fetch(batchUrl(chunk.toSeq)))
      }
      .toDF("payload")
    payloads
      .select(split(col("payload"), "\n").as("lines"))
      .select(explode(expr("slice(lines, 2, size(lines))")).as("line"))
      .filter(length(trim(col("line"))) > 0)
      .select(split(col("line"), "\t").getItem(0).as("from_id"),
        split(col("line"), "\t").getItem(1).as("to_id"))
  }
}
