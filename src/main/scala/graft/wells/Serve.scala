package graft.wells

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import org.apache.spark.sql.SparkSession

/** Thin HTTP shell over the serving query (reference: app.py:15-39) — the
  * Flask app's three routes on the JDK's built-in server, zero new
  * dependencies. The engine owns the query ([[WellsQuery]]); this layer
  * only maps routes to bytes:
  *
  *   GET /wells  → JSON array from WellsQuery.wellsJson (re-reads the
  *                 parquet snapshot per request, like the reference
  *                 re-queries MySQL per request — a load can swap the
  *                 snapshot underneath and the next request sees it)
  *   GET /       → static/index.html   (when a static dir is configured)
  *   GET /map    → static/map.html
  *   GET /<file> → static asset, traversal-guarded
  */
object Serve {

  /** Bind and start; port 0 picks an ephemeral port (tests). The returned
    * server's actual port is `getAddress.getPort`. */
  def start(spark: SparkSession, tableRoot: String, port: Int,
      staticDir: Option[String]): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    server.createContext("/wells", (ex: HttpExchange) =>
      handle(ex) {
        // JDK contexts are longest-prefix matched; Flask routes are exact —
        // /wellsfoo and /wells/1 must 404, not leak the full payload
        if (ex.getRequestURI.getPath != "/wells") notFound
        else {
          val info = spark.read.parquet(s"$tableRoot/well_info")
          val stim = spark.read.parquet(s"$tableRoot/well_stimulation")
          val body = WellsQuery.wellsJson(info, stim)
            .mkString("[", ",", "]").getBytes(StandardCharsets.UTF_8)
          (200, "application/json", body)
        }
      })

    server.createContext("/", (ex: HttpExchange) =>
      handle(ex) {
        val req = ex.getRequestURI.getPath match {
          case "/" => "index.html"
          case "/map" => "map.html"
          case p => p.stripPrefix("/")
        }
        staticDir match {
          case Some(dir) =>
            // compare REAL paths: normalize alone would let a symlink
            // inside the static dir serve files outside it
            val base = Path.of(dir).toRealPath()
            val f = base.resolve(req).normalize()
            val real =
              try Some(f.toRealPath())
              catch { case _: java.io.IOException => None }
            real match {
              case Some(r) if r.startsWith(base) && Files.isRegularFile(r) =>
                (200, contentType(req), Files.readAllBytes(r))
              case _ => notFound
            }
          case None => notFound
        }
      })

    server.start()
    server
  }

  private val notFound =
    (404, "text/plain", "not found".getBytes(StandardCharsets.UTF_8))

  private def contentType(name: String): String =
    name.substring(name.lastIndexOf('.') + 1) match {
      case "html" => "text/html; charset=utf-8"
      case "js" => "application/javascript"
      case "css" => "text/css"
      case "json" => "application/json"
      case "png" => "image/png"
      case _ => "application/octet-stream"
    }

  private def handle(ex: HttpExchange)(f: => (Int, String, Array[Byte])): Unit = {
    val (status, mime, body) =
      try f
      catch { case e: Exception =>
        (500, "text/plain",
          s"error: ${e.getMessage}".getBytes(StandardCharsets.UTF_8))
      }
    try {
      ex.getResponseHeaders.set("Content-Type", mime)
      ex.sendResponseHeaders(status, body.length.toLong)
      ex.getResponseBody.write(body)
    } finally ex.close()
  }
}
