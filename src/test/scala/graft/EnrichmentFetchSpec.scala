package graft

import graft.pset.EnrichmentFetch
import java.net.InetSocketAddress
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exercises the distributed fetch skeleton against an in-process
  * localhost stub server (JDK HttpServer) — real sockets, zero
  * external network. Covers the three S10-S12 shapes: per-key GET
  * fan-out with retry, ChEMBL-style pagination, UniProt-style batched
  * id-mapping. */
class EnrichmentFetchSpec extends SparkSpec {
  import spark.implicits._

  private def withServer(routes: (String, com.sun.net.httpserver.HttpExchange => Unit)*)
      (body: Int => Unit): Unit = {
    val server = com.sun.net.httpserver.HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, handler) =>
      server.createContext(path, (ex: com.sun.net.httpserver.HttpExchange) => handler(ex))
    }
    server.start()
    try body(server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, s: String): Unit = {
    val bytes = s.getBytes("UTF-8")
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  test("fetchJson: per-key GET fan-out with retry; flaky first attempts recover, payload parses with from_json") {
    val hits = new java.util.concurrent.ConcurrentHashMap[String, AtomicInteger]()
    withServer("/target/" -> { ex =>
      val id = ex.getRequestURI.getPath.stripPrefix("/target/")
      val n = hits.computeIfAbsent(id, _ => new AtomicInteger).incrementAndGet()
      if (id == "flaky" && n == 1) respond(ex, 500, "boom")
      else respond(ex, 200, s"""{"name":"T_$id","uniprot_id":"P_$id"}""")
    }) { port =>
      val reqs = Seq("c1", "c2", "flaky").toDF("compound_id")
        .withColumn("url",
          concat(lit(s"http://127.0.0.1:$port/target/"), col("compound_id")))
      val out = EnrichmentFetch.fetchJson(reqs, "compound_id", "url",
        EnrichmentFetch.httpGet(), maxRetries = 3)
      val schema = StructType(Seq(
        StructField("name", StringType), StructField("uniprot_id", StringType)))
      val parsed = out
        .select(col("compound_id"), col("error"),
          from_json(col("payload"), schema).as("j"))
        .select(col("compound_id"), col("error"),
          col("j.name").as("name"), col("j.uniprot_id").as("uniprot_id"))
        .as[(String, String, String, String)].collect().toSet
      assert(parsed == Set(
        ("c1", null, "T_c1", "P_c1"),
        ("c2", null, "T_c2", "P_c2"),
        ("flaky", null, "T_flaky", "P_flaky")), "flaky endpoint must succeed on retry")
      assert(hits.get("flaky").get() == 2)
    }
  }

  test("fetchJson: a permanently-failing url lands in the error column, not an exception") {
    withServer("/ok" -> { ex => respond(ex, 200, "fine") }) { port =>
      val reqs = Seq(
        ("good", s"http://127.0.0.1:$port/ok"),
        ("bad", s"http://127.0.0.1:$port/missing")).toDF("key", "url")
      val out = EnrichmentFetch.fetchJson(reqs, "key", "url",
        EnrichmentFetch.httpGet(), maxRetries = 2)
        .select("key", "payload", "error")
        .as[(String, String, String)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(out("good")._1 == "fine" && out("good")._2 == null)
      assert(out("bad")._1 == null && out("bad")._2 != null)
    }
  }

  test("fetchPaginated: follows next links until exhausted, one row per page") {
    withServer("/items" -> { ex =>
      val q = Option(ex.getRequestURI.getQuery).getOrElse("")
      val offset = q.split("&").collectFirst {
        case kv if kv.startsWith("offset=") => kv.stripPrefix("offset=").toInt
      }.getOrElse(0)
      val items = (offset until math.min(offset + 2, 5)).mkString(",")
      val nextPart =
        if (offset + 2 < 5) s""","next":"offset=${offset + 2}"""" else ""
      respond(ex, 200, s"""{"items":[$items]$nextPart}""")
    }) { port =>
      val base = s"http://127.0.0.1:$port/items?offset=0"
      val nextRe = """"next":"([^"]+)"""".r
      val out = EnrichmentFetch.fetchPaginated(
        Seq("k1").toDF("key").withColumn("url", lit(base)),
        "key", "url", EnrichmentFetch.httpGet(),
        body => nextRe.findFirstMatchIn(body)
          .map(m => s"http://127.0.0.1:$port/items?${m.group(1)}"))
      val pages = out.select("page", "payload").as[(Int, String)].collect().sortBy(_._1)
      assert(pages.length == 3, "5 items at 2/page = 3 pages")
      // downstream flatten with built-ins: explode the items arrays
      val schema = StructType(Seq(StructField("items", ArrayType(IntegerType))))
      val items = out.select(explode(from_json(col("payload"), schema).getField("items")))
        .as[Int].collect().toSet
      assert(items == Set(0, 1, 2, 3, 4))
    }
  }

  test("fetchIdMapping: batched TSV mapping explodes to (from_id, to_id) rows") {
    val batches = new AtomicInteger
    withServer("/map" -> { ex =>
      batches.incrementAndGet()
      val ids = Option(ex.getRequestURI.getQuery).getOrElse("")
        .stripPrefix("ids=").split(",").filter(_.nonEmpty)
      val rows = ids.map(i => s"$i\tENSG_$i").mkString("\n")
      respond(ex, 200, s"From\tTo\n$rows\n")
    }) { port =>
      val ids = (1 to 5).map(i => s"P$i").toDF("uniprot_id").coalesce(1)
      val out = EnrichmentFetch.fetchIdMapping(ids, "uniprot_id",
        chunk => s"http://127.0.0.1:$port/map?ids=${chunk.mkString(",")}",
        EnrichmentFetch.httpGet(), batchSize = 2)
        .as[(String, String)].collect().toSet
      assert(out == (1 to 5).map(i => (s"P$i", s"ENSG_P$i")).toSet)
      assert(batches.get() == 3, "5 ids at batchSize 2 = 3 requests")
    }
  }
}
