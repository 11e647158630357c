package graft.wells

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** End-to-end HTTP shell over the golden corpus: the reference app.py's
  * routes served by graft.wells.Serve against the engine's parquet tables. */
class ServeSpec extends AnyFunSuite with SparkSpec {

  private lazy val root: String = {
    val dir = Files.createTempDirectory("wells-serve").toString
    Loader.run(spark, "/root/reference/well_header.csv",
      "/root/reference/well_stimulation.csv", dir)
    Enrichment.run(spark, dir)
    dir
  }

  private def get(port: Int, path: String): HttpResponse[String] =
    HttpClient.newHttpClient().send(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path")).build(),
      HttpResponse.BodyHandlers.ofString())

  test("/wells serves the 76-row JSON array; static routes resolve") {
    val staticDir = Files.createTempDirectory("static")
    Files.writeString(staticDir.resolve("map.html"), "<html>map</html>")
    val server = Serve.start(spark, root, 0, Some(staticDir.toString))
    try {
      val port = server.getAddress.getPort
      val wells = get(port, "/wells")
      assert(wells.statusCode() == 200)
      assert(wells.headers().firstValue("Content-Type").get() == "application/json")
      assert(wells.body().startsWith("[{") && wells.body().endsWith("}]"))
      // 76 surviving wells -> 76 top-level objects
      assert(wells.body().split("\\},\\{").length == 76)

      val map = get(port, "/map")
      assert(map.statusCode() == 200 && map.body().contains("map"))
      assert(get(port, "/nope.html").statusCode() == 404)
      // exact-route parity with Flask: prefix extensions must not match
      assert(get(port, "/wells/1").statusCode() == 404)
      assert(get(port, "/wellsfoo").statusCode() == 404)
      // traversal guard: escaping the static root is a 404, not a file read
      assert(get(port, "/..%2F..%2Fetc%2Fpasswd").statusCode() == 404)
      // symlink guard: a link inside the static dir pointing outside it
      // must not serve the target
      Files.createSymbolicLink(staticDir.resolve("leak.html"),
        java.nio.file.Path.of("/etc/hostname"))
      assert(get(port, "/leak.html").statusCode() == 404)
    } finally server.stop(0)
  }

  test("serving without a static dir still answers /wells, 404s the rest") {
    val server = Serve.start(spark, root, 0, None)
    try {
      val port = server.getAddress.getPort
      assert(get(port, "/wells").statusCode() == 200)
      assert(get(port, "/").statusCode() == 404)
    } finally server.stop(0)
  }
}
