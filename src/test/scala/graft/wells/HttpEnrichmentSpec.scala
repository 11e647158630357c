package graft.wells

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** S11's real client against a LOOPBACK site: an in-process HttpServer
  * serves the reference site's two page shapes (search results + well
  * detail), and the client must walk them with the reference's exact
  * semantics — query-parameter set, candidate-link priority ladder,
  * labeled-cell and drop-cap badge extraction, not-found → blank row,
  * deadline → throw (which `Enrichment.scrape` isolates into blankRow +
  * the `__error` reject channel, S15). The Playwright/browser layer the
  * reference needs (JS, cookie banners) stays environment-bound; every
  * protocol- and HTML-level behavior below it is pinned here. */
class HttpEnrichmentSpec extends AnyFunSuite with SparkSpec {

  private def detailHtml(status: String, wtype: String, city: String,
      oil: String, gas: String): String =
    s"""<html><body><h1>Well Details</h1>
       |<table>
       |  <tr><th> Well Status </th><td> $status </td></tr>
       |  <tr><th>Well Type</th><td><b>$wtype</b></td></tr>
       |  <tr><th>Closest City</th><td>$city</td></tr>
       |</table>
       |<p class="block_stat"><span class="dropcap">$oil</span> Barrels of Oil Produced in 2024</p>
       |<p class="block_stat"><span class="dropcap">$gas</span> MCF of Gas Produced in 2024</p>
       |</body></html>""".stripMargin

  private def withServer(test: (HttpServer, String) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    try {
      server.start()
      test(server, s"http://127.0.0.1:${server.getAddress.getPort}")
    } finally server.stop(0)
  }

  private def respond(ex: HttpExchange, body: String, code: Int = 200): Unit = {
    val b = body.getBytes(UTF_8)
    ex.sendResponseHeaders(code, b.length)
    ex.getResponseBody.write(b)
    ex.close()
  }

  test("happy path: search -> priority link -> detail fields, scrape-normed downstream") {
    withServer { (server, base) =>
      var seenQuery: String = null
      server.createContext("/search", (ex: HttpExchange) => {
        seenQuery = ex.getRequestURI.getRawQuery
        // the /{api} rung must BEAT the earlier /wells/ rung
        respond(ex,
          """<ul class="search-results">
            |<a href="/wells/wrong-one">WRONG WELL</a>
            |<a href="/detail/33-053-06057">THORVALD 1-30H</a>
            |</ul>""".stripMargin)
      })
      server.createContext("/detail/33-053-06057", (ex: HttpExchange) =>
        respond(ex, detailHtml("Active", "Members Only", "Williston", "41.2k", "83.1k")))
      server.createContext("/wells/wrong-one", (ex: HttpExchange) =>
        respond(ex, detailHtml("WRONG", "WRONG", "WRONG", "0", "0")))

      val client = new HttpEnrichmentClient(base, perWellTimeoutMs = 5000)
      val r = client.fetch("THORVALD 1-30H", "33-053-06057")
      assert(r.well_status == "Active" && r.closest_city == "Williston"
        && r.oil_badge == "41.2k" && r.gas_badge == "83.1k",
        s"field extraction drifted: $r")
      assert(r.well_type == "Members Only", "raw fetch must NOT pre-norm")
      // the reference's full parameter set reaches the server, encoded
      assert(seenQuery.contains("type=wells")
        && seenQuery.contains("well_name=THORVALD+1-30H")
        && seenQuery.contains("api_no=33-053-06057")
        && seenQuery.contains("field_formation="),
        s"query drifted: $seenQuery")

      // through the scrape stage the F20 norm lands: Members Only -> N/A
      import spark.implicits._
      val scraped = Enrichment.scrape(
        Seq(("THORVALD 1-30H", "33-053-06057")).toDF("well_name", "api"), client)
      val row = scraped.collect().head
      assert(row.getAs[String]("well_type") == "N/A", "F20 scrape-norm missed")
      assert(row.getAs[String]("well_status") == "Active")
      assert(Enrichment.rejects(scraped).isEmpty, "no reject expected")
    }
  }

  test("ladder rungs: /wells/ fallback, then anchor-text fallback, then not-found blank") {
    withServer { (server, base) =>
      server.createContext("/search", (ex: HttpExchange) => {
        val q = ex.getRequestURI.getRawQuery
        if (q.contains("api_no=has-wells-link"))
          respond(ex, """<a href="/wells/w9">SOME WELL</a>""")
        else if (q.contains("well_name=BY+NAME"))
          respond(ex, """<a href="/named/w10">found BY NAME here</a>""")
        else respond(ex, "<p>No results</p>")
      })
      server.createContext("/wells/w9", (ex: HttpExchange) =>
        respond(ex, detailHtml("Plugged", "SWD", "Stanley", "1.0k", "2.0k")))
      server.createContext("/named/w10", (ex: HttpExchange) =>
        respond(ex, detailHtml("Inactive", "Dry Hole", "New Town", "N/A", "N/A")))
      val client = new HttpEnrichmentClient(base, perWellTimeoutMs = 5000)
      assert(client.fetch("X", "has-wells-link").well_status == "Plugged",
        "the /wells/ rung did not fire")
      assert(client.fetch("BY NAME", "no-such-api").well_status == "Inactive",
        "the anchor-text rung did not fire")
      val blank = client.fetch("NOPE", "nothing")
      assert(blank == Enrichment.blankRow("NOPE", "nothing"),
        "not-found must be the all-N/A row")
    }
  }

  test("lower ladder rungs: ul.search-results, .results container (class-TOKEN match), api anchor text") {
    withServer { (server, base) =>
      server.createContext("/search", (ex: HttpExchange) => {
        val q = ex.getRequestURI.getRawQuery
        if (q.contains("api_no=in-ul"))
          // the decoy proves rung order: no higher rung matches, and the
          // anchor OUTSIDE the list must not be picked over the one inside
          respond(ex, """<a href="/decoy/x">unrelated</a>
            |<ul class="search-results"><li><a href="/hit/w11">row</a></li></ul>"""
            .stripMargin)
        else if (q.contains("api_no=in-results-div"))
          // class="search-results" must NOT satisfy the .results rung
          // (CSS token match) — only the genuine token does
          respond(ex, """<div class="other results"><a href="/hit/w11">r</a></div>""")
        else if (q.contains("api_no=777-888"))
          // no href/list rung matches; the anchor TEXT carries the api
          respond(ex, """<a href="/hit/w11">Well 777-888 detail</a>""")
        else respond(ex, "<p>No results</p>")
      })
      server.createContext("/hit/w11", (ex: HttpExchange) =>
        respond(ex, detailHtml("Active", "Oil", "Ross", "3k", "4k")))
      val client = new HttpEnrichmentClient(base, perWellTimeoutMs = 5000)
      assert(client.fetch("X", "in-ul").well_status == "Active",
        "the ul.search-results rung did not fire")
      assert(client.fetch("X", "in-results-div").well_status == "Active",
        "the .results rung did not fire")
      assert(client.fetch("X", "777-888").well_status == "Active",
        "the api anchor-text fallback did not fire")
      // class-token discipline: 'search-results' on a DIV must satisfy
      // neither the ul rung (wrong tag) nor the .results rung (CSS token
      // match, not substring) — no rung fires, so the pick is empty
      assert(client.pickDetailHref(
          """<div class="search-results"><a href="/hit/w11">r</a></div>""",
          "X", "zzz").isEmpty,
        ".results matched a 'search-results' class — token match broken")
      // container SCOPING: an EMPTY results container must not capture an
      // anchor that merely follows it in the document — the ladder falls
      // through to the api anchor-text rung, which picks the right link
      // (the reference's CSS `ul.search-results a` matches nothing there)
      assert(client.pickDetailHref(
          """<ul class="search-results"></ul><a href="/about">About</a>
            |<a href="/d/55">Well 777-888 detail</a>""".stripMargin,
          "X", "777-888").contains("/d/55"),
        "an empty container captured a trailing anchor instead of falling through")
    }
  }

  test("detail page missing a label or badge degrades that FIELD to N/A, not the row") {
    withServer { (server, base) =>
      server.createContext("/search", (ex: HttpExchange) =>
        respond(ex, """<a href="/wells/w1">W</a>"""))
      server.createContext("/wells/w1", (ex: HttpExchange) =>
        respond(ex, """<table><tr><th>Well Status</th><td>Active</td></tr></table>"""))
      val r = new HttpEnrichmentClient(base, 5000).fetch("W", "a")
      assert(r.well_status == "Active" && r.well_type == "N/A"
        && r.closest_city == "N/A" && r.oil_badge == "N/A" && r.gas_badge == "N/A",
        s"partial detail page drifted: $r")
    }
  }

  test("deadline and HTTP errors throw; scrape() isolates them into blankRow + __error (S15)") {
    withServer { (server, base) =>
      server.createContext("/search", (ex: HttpExchange) => {
        val q = ex.getRequestURI.getRawQuery
        if (q.contains("api_no=slow")) { Thread.sleep(3000); respond(ex, "<p></p>") }
        else respond(ex, "boom", code = 500)
      })
      val client = new HttpEnrichmentClient(base, perWellTimeoutMs = 300)
      intercept[Exception](client.fetch("W", "slow"))
      intercept[Exception](client.fetch("W", "err500"))
      import spark.implicits._
      val scraped = Enrichment.scrape(
        Seq(("W", "slow"), ("W", "err500")).toDF("well_name", "api"), client)
        .localCheckpoint(true)
      assert(scraped.collect().forall(r =>
        r.getAs[String]("well_status") == "N/A"), "failures must degrade to blank rows")
      val rej = Enrichment.rejects(scraped).collect()
      assert(rej.length == 2 && rej.forall(_.getAs[String]("error").nonEmpty),
        "both failures must reach the reject side-channel with their errors")
    }
  }
}
