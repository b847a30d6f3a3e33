package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession

import graft.catalog.{FileStatus, HyperFileMeta, MetaStore}

/** Thin HTTP product shell over the metadata catalog + extract store —
  * the serving surface a reference user actually curls
  * (app/api/v1/endpoints/file.py:42-114 list/detail/download,
  * file.py:164-201 sync trigger), re-expressed over [[MetaStore]] and
  * the parquet extract root instead of Postgres + S3.
  *
  * Design boundaries, deliberately mirroring the reference:
  *  - auth is a bearer token; a missing/wrong token is 403
  *    "Not authenticated" (file.py:57 raises exactly this);
  *  - list supports `?form_id=` (400 on a non-numeric value,
  *    file.py:60-68) and `?skip=&limit=` pagination with the reference's
  *    0/100 defaults (app/crud/base.py:29-32) — catalog reads are the
  *    P1/P2 point-lookup/paginate primitives over the SMALL catalog
  *    table, so every request is a driver-sized scan, never extract-
  *    scale work;
  *  - detail with `?file_format=hyper` answers 307 with the extract's
  *    local path in `Location` — the local-filesystem analog of the
  *    reference's presigned-URL RedirectResponse (file.py:100-108;
  *    presigning itself is S8, out-of-engine by design);
  *  - POST `{id}/sync` runs the caller-provided sync body ONLY when the
  *    file is not already queued/syncing, answering 200 (triggered) or
  *    202 (already in flight) with the reference's message body
  *    (file.py:186-199). The body runs synchronously so specs are
  *    deterministic; a production caller passes a closure that enqueues
  *    (the reference uses BackgroundTasks the same way).
  *
  * The server itself is the JDK's built-in httpserver — zero new
  * dependencies, driver-side only; Spark never serves HTTP at
  * executors. One instance serves one catalog root.
  *
  * @param sync callback for the sync trigger, given the file id;
  *             typically the [[graft.streaming.Streams.syncTick]] batch
  *             body (drain → refresh → recordSyncResult).
  * @param downloadPath resolves a catalog row to the local extract path
  *                     put in the redirect `Location` header.
  */
class Serve(spark: SparkSession, store: MetaStore, token: String,
            sync: Long => Unit,
            downloadPath: HyperFileMeta => String) {

  import spark.implicits._

  private var server: HttpServer = _

  /** Start on an ephemeral (or given) port; returns the bound port. */
  def start(port: Int = 0): Int = {
    server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/api/v1/files", (ex: HttpExchange) => handle(ex))
    server.setExecutor(null) // single-threaded: catalog reads are tiny
    server.start()
    server.getAddress.getPort
  }

  def stop(): Unit = if (server != null) server.stop(0)

  // ---- routing ----------------------------------------------------------

  private def handle(ex: HttpExchange): Unit =
    try {
      if (!authed(ex)) respondJson(ex, 403, """{"detail":"Not authenticated"}""")
      else {
        val rel = ex.getRequestURI.getPath.stripPrefix("/api/v1/files")
          .stripPrefix("/").stripSuffix("/")
        val parts = if (rel.isEmpty) Array.empty[String] else rel.split("/")
        (ex.getRequestMethod, parts) match {
          case ("GET", Array()) => listFiles(ex)
          case ("GET", Array(id)) => getFile(ex, id)
          case ("POST", Array(id, "sync")) => syncFile(ex, id)
          case _ => respondJson(ex, 404, """{"detail":"Not found."}""")
        }
      }
    } catch {
      case e: Throwable =>
        respondJson(ex, 500, s"""{"detail":${jsonStr(String.valueOf(e.getMessage))}}""")
    } finally ex.close()

  private def authed(ex: HttpExchange): Boolean =
    Option(ex.getRequestHeaders.getFirst("Authorization"))
      .contains(s"Bearer $token")

  private def query(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, "UTF-8")
      }.toMap

  // ---- handlers ---------------------------------------------------------

  /** GET /api/v1/files?form_id=&skip=&limit= (file.py:42-89). */
  private def listFiles(ex: HttpExchange): Unit = {
    val q = query(ex)
    q.get("form_id").filterNot(_.forall(_.isDigit)) match {
      case Some(bad) =>
        respondJson(ex, 400,
          s"""{"detail":${jsonStr(s"Invalid form_id provided: $bad")}}""")
      case None =>
        val all = store.readHyperFiles()
        val filtered = q.get("form_id") match {
          case Some(fid) =>
            graft.catalog.Catalog.pointLookup(all.toDF(), "formId", fid.toLong)
          case None => all.toDF()
        }
        // P2 pagination under a total order, reference defaults 0/100
        val skip = q.get("skip").map(_.toInt).getOrElse(0)
        val limit = q.get("limit").map(_.toInt).getOrElse(100)
        val page = graft.catalog.Catalog.paginate(filtered, Seq("id"), skip, limit)
        val rows = page.as[HyperFileMeta].collect() // bounded by `limit`
        respondJson(ex, 200,
          rows.map(fileJson(_, withUrls = true)).mkString("[", ",", "]"))
    }
  }

  /** GET /api/v1/files/{id}[?file_format=hyper] (file.py:92-114). */
  private def getFile(ex: HttpExchange, idStr: String): Unit =
    lookup(ex, idStr) { f =>
      if (query(ex).get("file_format").contains("hyper")) {
        // local-path analog of the presigned-URL redirect
        ex.getResponseHeaders.set("Location", downloadPath(f))
        ex.sendResponseHeaders(307, -1)
      } else respondJson(ex, 200, fileJson(f, withUrls = true))
    }

  /** POST /api/v1/files/{id}/sync (file.py:164-201). */
  private def syncFile(ex: HttpExchange, idStr: String): Unit =
    lookup(ex, idStr) { f =>
      val inFlight =
        f.fileStatus == FileStatus.Queued || f.fileStatus == FileStatus.Syncing
      if (!inFlight) sync(f.id)
      respondJson(ex, if (inFlight) 202 else 200,
        """{"message":"File syncing is currently on-going"}""")
    }

  private def lookup(ex: HttpExchange, idStr: String)(body: HyperFileMeta => Unit): Unit =
    idStr.toLongOption.flatMap { id =>
      graft.catalog.Catalog.pointLookup(store.readHyperFiles().toDF(), "id", id)
        .as[HyperFileMeta].collect().headOption // point lookup: <= 1 row
    } match {
      case Some(f) => body(f)
      case None => respondJson(ex, 404, """{"detail":"File not found."}""")
    }

  // ---- rendering --------------------------------------------------------

  private def respondJson(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def fileJson(f: HyperFileMeta, withUrls: Boolean): String = {
    val base = Seq(
      "id" -> f.id.toString,
      "user_id" -> f.userId.toString,
      "form_id" -> f.formId.toString,
      "filename" -> jsonStr(f.filename),
      "file_status" -> jsonStr(f.fileStatus),
      "is_active" -> f.isActive.toString,
      "last_updated" -> jsonStr(f.lastUpdated.toInstant.toString))
    val urls = if (!withUrls) Nil else Seq(
      "url" -> jsonStr(s"/api/v1/files/${f.id}"),
      "download_url" -> jsonStr(s"/api/v1/files/${f.id}?file_format=hyper"))
    (base ++ urls).map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => "\\u%04x".format(c.toInt)
      case c => c.toString
    } + "\""
}
