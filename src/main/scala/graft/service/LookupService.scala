package graft.service

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.table.GraftTable
import org.apache.spark.sql.functions._
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Remote KV lookup service (reference: paimon-service —
  * `KvQueryServer.java` / `KvQueryClient.java`, the network endpoint
  * Flink lookup joins probe instead of scanning; closes §2 row J4).
  *
  * Spark-first shape: the server pins a table handle and answers pk
  * probes over HTTP (JDK `com.sun.net.httpserver` — zero dependencies).
  * Probes arrive BATCHED — the natural unit of a streaming lookup join's
  * micro-batch — and each batch of cache misses becomes ONE bucket-pruned
  * Spark job (`isin` / OR-of-ANDs over the primary key, which the file
  * index prunes to the keys' buckets), not one job per key. Results land
  * in a key-level LRU so hot keys (the lookup-join steady state) are
  * served memory-speed without touching Spark at all — the cache role the
  * reference fills with its LookupFile/RocksDB layer.
  *
  * Scale shape: the server is a thin stateless-ish front over the
  * table's own pruned-scan path — N servers can front the same table
  * (shared-nothing, each with its own cache), and cache memory is
  * bounded by `maxCachedKeys`, not table size.
  *
  * Wire protocol (JSON over HTTP):
  * {{{
  *   GET  /health            -> {"table": <path>, "primaryKeys": [...]}
  *   POST /lookup            body: [{"pk1": v, ...}, ...]
  *                           -> [rowJson, ...]   (found rows only)
  * }}}
  */
class LookupServer(table: GraftTable, host: String = "127.0.0.1",
    requestedPort: Int = 0, maxCachedKeys: Int = 100000) {
  require(table.isPrimaryKeyed, "lookup service requires a primary-key table")
  private val pks = table.schema.primaryKeys
  private val pkFields = pks.map(table.schema.fieldByName)

  // the server serves a PINNED snapshot so cached and freshly-scanned
  // values are COHERENT (a per-probe latest-snapshot read would mix
  // cache-era rows with newer ones). `refresh()` advances the pin and
  // clears the cache — the reference's periodic lookup refresh, under
  // the operator's control.
  @volatile private var pinnedDf = table.toDF // resolves the snapshot eagerly
  def refresh(): Unit = { pinnedDf = table.toDF; cache.clear() }

  /** Spark jobs run so far — observability + lets tests assert cache hits. */
  private val jobsRunCount = new java.util.concurrent.atomic.AtomicLong()
  def jobsRun: Long = jobsRunCount.get()

  // key-level LRU (access-order); values are the row's JSON, or None for
  // a proven-absent key (negative caching — absent probes are the common
  // case in enrichment joins and must not re-scan every batch)
  private val cache = java.util.Collections.synchronizedMap(
    new java.util.LinkedHashMap[Seq[String], Option[String]](1024, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Seq[String], Option[String]]): Boolean =
        size() > maxCachedKeys
    })

  private val server = HttpServer.create(new InetSocketAddress(host, requestedPort), 0)

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.createContext("/health", (ex: HttpExchange) => {
    val n = graft.core.Json.obj()
    n.put("table", table.location)
    val arr = n.putArray("primaryKeys")
    pks.foreach(arr.add)
    respond(ex, 200, graft.core.Json.write(n))
  })

  server.createContext("/lookup", (ex: HttpExchange) => {
    try {
      val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
      val keys = graft.core.Json.elems(graft.core.Json.parse(body)).map { o =>
        pks.map { p =>
          val v = o.get(p)
          require(v != null, s"probe missing pk column $p")
          if (v.isIntegralNumber) v.asLong().asInstanceOf[Any]
          else if (v.isFloatingPointNumber) v.asDouble().asInstanceOf[Any]
          else v.asText().asInstanceOf[Any]
        }
      }
      val found = lookupBatch(keys)
      respond(ex, 200, found.mkString("[", ",", "]"))
    } catch {
      case e: Exception => respond(ex, 400, s"""{"error":${jsonStr(e.getMessage)}}""")
    }
  })

  private def jsonStr(s: String): String =
    graft.core.Json.write(graft.core.Json.obj().put("m", s)).drop(5).dropRight(1)

  private def cacheKey(k: Seq[Any]): Seq[String] = k.map(String.valueOf)

  /** Resolve a batch of probes: cache hits are free; all misses fold into
    * ONE bucket-pruned Spark job. Returns found rows' JSON (order
    * unspecified, duplicates collapsed).
    */
  def lookupBatch(keys: Seq[Seq[Any]]): Seq[String] = {
    val distinctKeys = keys.distinct
    val misses = distinctKeys.filterNot(k => cache.containsKey(cacheKey(k)))
    if (misses.nonEmpty) {
      val cond =
        if (pks.size == 1)
          col(pks.head).isin(misses.map(k =>
            lit(k.head).cast(pkFields.head.sparkType)): _*)
        else misses.map(k => pks.zip(k).zip(pkFields).map { case ((c, v), f) =>
          col(c) === lit(v).cast(f.sparkType)
        }.reduce(_ && _)).reduce(_ || _)
      jobsRunCount.incrementAndGet()
      val df = pinnedDf
      val rows = df
        .select(to_json(struct(df.columns.map(col): _*)).as("__j") +:
          pks.map(col): _*)
        .filter(cond)
        .collect() // O(probe batch) rows — bounded by the request size
      val foundByKey = rows.map(r =>
        cacheKey(pks.indices.map(i => r.get(i + 1))) -> r.getString(0)).toMap
      misses.foreach(k => cache.put(cacheKey(k), foundByKey.get(cacheKey(k))))
    }
    distinctKeys.flatMap(k => cache.get(cacheKey(k)))
  }

  def start(): LookupServer = {
    // a real pool, not the calling thread: concurrent probes from many
    // stream partitions must not serialize through one HTTP handler
    // (cache misses racing on the same key run idempotent duplicate jobs
    // at worst — the LRU is a synchronized map)
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start(); this
  }
  def port: Int = server.getAddress.getPort
  def endpoint: String = s"http://$host:$port"
  def stop(): Unit = {
    server.stop(0)
    server.getExecutor match {
      case p: java.util.concurrent.ExecutorService => p.shutdown()
      case _ => ()
    }
  }
}

/** Client side (reference: paimon-service `KvQueryClient.java`): batch
  * probes to a [[LookupServer]]. Returns found rows' JSON only — callers
  * join against the probe set to see misses.
  */
object LookupClient {
  private lazy val http = java.net.http.HttpClient.newHttpClient()

  def lookupBatch(endpoint: String, keys: Seq[Map[String, Any]]): Seq[String] = {
    val arr = graft.core.Json.arr()
    keys.foreach { k =>
      val o = arr.addObject()
      k.foreach {
        case (n, v: Long) => o.put(n, v)
        case (n, v: Int) => o.put(n, v.toLong)
        case (n, v: Double) => o.put(n, v)
        case (n, v) => o.put(n, String.valueOf(v))
      }
    }
    val req = java.net.http.HttpRequest.newBuilder()
      .uri(java.net.URI.create(s"$endpoint/lookup"))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
        graft.core.Json.write(arr)))
      .build()
    val resp = http.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() == 200, s"lookup failed: ${resp.body()}")
    graft.core.Json.elems(graft.core.Json.parse(resp.body()))
      .map(graft.core.Json.write)
  }

  def lookup(endpoint: String, key: Map[String, Any]): Option[String] =
    lookupBatch(endpoint, Seq(key)).headOption
}
