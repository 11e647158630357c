package graft.wells

import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets.UTF_8

/** S11's REAL client: the reference's scrape (web_scraping.py:131-238)
  * re-expressed at the HTTP layer — no Playwright exists on the JVM and
  * no network exists in this container, but everything below the
  * browser is plain protocol + HTML semantics, testable against an
  * in-process loopback server ([[graft.wells.Serve]]'s own
  * `com.sun.net.httpserver` machinery): the search URL with the
  * reference's exact query-parameter set (web_scraping.py:134-151), the
  * FULL candidate-link priority ladder over the results page
  * (web_scraping.py:161-178, six rungs: href containing `/<api>`, href
  * containing `/wells/`, anchor text containing the well name, first
  * anchor inside `ul.search-results`, first anchor inside a
  * `.results` container, anchor text containing the api — only the
  * `:visible` pseudo-class stays environment-bound with the browser
  * layer), the detail
  * page's labeled table cells (Well Status / Well Type / Closest City)
  * and `block_stat` drop-cap badges (web_scraping.py:80-110), and the
  * per-well deadline (PER_WELL_TIMEOUT, web_scraping.py:190).
  *
  * Failure semantics follow the reference's ladder: no matching search
  * link → the all-N/A [[Enrichment.blankRow]] (web_scraping.py:211-213);
  * a transport error or a blown deadline THROWS, which
  * [[Enrichment.scrape]]'s per-row isolation converts to blankRow + the
  * `__error` side-channel (S15 — the analog of the reference's
  * fail_*.png/html artifacts). Field values go through the same F20
  * scrape-norm downstream (Members Only → N/A), so a members-only cell
  * needs no special casing here.
  *
  * HTML parsing is regex over the two known page shapes — the same
  * fidelity class as the reference's CSS selectors (both break if the
  * site redesigns; neither needs a DOM for these fixed shapes). */
final class HttpEnrichmentClient(baseUrl: String, perWellTimeoutMs: Int = 18000)
    extends Enrichment.EnrichmentClient {

  private def enc(s: String) = URLEncoder.encode(Option(s).getOrElse(""), "UTF-8")

  /** The reference's full parameter set, most left blank — kept verbatim
    * so the server sees the same request shape (web_scraping.py:134-150). */
  private def searchUrl(wellName: String, api: String): String = {
    val params = Seq(
      "type" -> "wells", "operator_name" -> "", "well_name" -> wellName,
      "api_no" -> api, "lease_key" -> "", "state" -> "", "county" -> "",
      "section" -> "", "township" -> "", "range" -> "", "min_boe" -> "",
      "max_boe" -> "", "min_depth" -> "", "max_depth" -> "",
      "field_formation" -> "")
    baseUrl + "/search?" + params.map { case (k, v) => s"$k=${enc(v)}" }.mkString("&")
  }

  private def get(url: String, deadlineAt: Long): String = {
    val remaining = (deadlineAt - System.currentTimeMillis()).toInt
    if (remaining <= 0) throw new java.net.SocketTimeoutException(
      s"per-well deadline exhausted before $url")
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(remaining)
    conn.setReadTimeout(remaining)
    conn.setRequestProperty("User-Agent", "graft-wells/1.0")
    try {
      val code = conn.getResponseCode
      if (code != 200) throw new java.io.IOException(s"HTTP $code for $url")
      new String(conn.getInputStream.readAllBytes(), UTF_8)
    } finally conn.disconnect()
  }

  private val Anchor =
    "(?is)<a\\b[^>]*href=[\"']([^\"']+)[\"'][^>]*>(.*?)</a>".r

  private def stripTags(html: String): String =
    html.replaceAll("(?is)<[^>]+>", " ")
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
      .replaceAll("\\s+", " ").trim

  private val ClassedTag = "(?is)<(\\w+)\\b[^>]*class=[\"']([^\"']*)[\"'][^>]*>".r

  /** First anchor INSIDE an element whose class ATTRIBUTE carries
    * `token` as a whole whitespace-separated token (CSS class-token
    * match, not substring — `.results` must not match
    * class="search-results"); `tag` restricts the element name. The
    * search is scoped to the container's extent — the text before the
    * first matching closing tag (first-close, non-nesting: neither
    * result-container shape self-nests) — because an EMPTY container
    * must yield None so the ladder falls through to its later rungs,
    * exactly as the reference's CSS scoping does: an anchor AFTER the
    * container is not "in" it, and committing to one would pick a
    * wrong link where the reference's next rung finds the right one. */
  private def firstAnchorInClassed(html: String, tag: Option[String],
      token: String): Option[String] =
    ClassedTag.findAllMatchIn(html)
      .filter(m => tag.forall(_.equalsIgnoreCase(m.group(1))))
      .filter(_.group(2).split("\\s+").contains(token))
      .flatMap { m =>
        val close =
          ("(?is)</" + java.util.regex.Pattern.quote(m.group(1)) + "\\s*>").r
        val rest = html.substring(m.end)
        val scope = close.findFirstMatchIn(rest)
          .map(c => rest.substring(0, c.start)).getOrElse(rest)
        Anchor.findFirstMatchIn(scope).map(_.group(1))
      }
      .nextOption()

  /** The reference's FULL candidate ladder (web_scraping.py:161-166
    * plus the trailing api-anchor-text fallback at :178): first match
    * wins within each rung before the next rung is tried. The `:visible`
    * pseudo-class needs a layout engine and stays environment-bound
    * with the rest of the browser layer; everything selectable from the
    * HTML itself is replicated. */
  private[wells] def pickDetailHref(searchHtml: String, wellName: String,
      api: String): Option[String] = {
    val anchors = Anchor.findAllMatchIn(searchHtml)
      .map(m => (m.group(1), stripTags(m.group(2)))).toVector
    anchors.collectFirst { case (h, _) if api.nonEmpty && h.contains(s"/$api") => h }
      .orElse(anchors.collectFirst { case (h, _) if h.contains("/wells/") => h })
      .orElse(anchors.collectFirst {
        case (h, t) if wellName.nonEmpty && t.contains(wellName) => h })
      .orElse(firstAnchorInClassed(searchHtml, Some("ul"), "search-results"))
      .orElse(firstAnchorInClassed(searchHtml, None, "results"))
      .orElse(anchors.collectFirst {
        case (h, t) if api.nonEmpty && t.contains(api) => h })
  }

  private def resolve(href: String): String =
    if (href.startsWith("http://") || href.startsWith("https://")) href
    else if (href.startsWith("/")) baseUrl + href
    else baseUrl + "/" + href

  /** `<th>Label</th><td>value</td>` (the reference's
    * get_table_value_any), whitespace/attribute tolerant. */
  private def tableValue(html: String, label: String): String = {
    val p = ("(?is)<th[^>]*>\\s*" + java.util.regex.Pattern.quote(label) +
      "\\s*</th>\\s*<td[^>]*>(.*?)</td>").r
    p.findFirstMatchIn(html).map(m => stripTags(m.group(1)))
      .filter(_.nonEmpty).getOrElse("N/A")
  }

  /** `p.block_stat` containing `phrase`, first `span.dropcap` inside —
    * the badge selectors (web_scraping.py:85-110). */
  private def badge(html: String, phrase: String): String = {
    val blocks = "(?is)<p[^>]*class=[\"'][^\"']*block_stat[^\"']*[\"'][^>]*>(.*?)</p>".r
    val drop = "(?is)<span[^>]*class=[\"'][^\"']*dropcap[^\"']*[\"'][^>]*>(.*?)</span>".r
    blocks.findAllMatchIn(html).map(_.group(1))
      .find(b => stripTags(b).contains(phrase))
      .flatMap(b => drop.findFirstMatchIn(b).map(m => stripTags(m.group(1))))
      .filter(_.nonEmpty).getOrElse("N/A")
  }

  def fetch(wellName: String, api: String): Enrichment.WebRecord = {
    val deadlineAt = System.currentTimeMillis() + perWellTimeoutMs
    val search = get(searchUrl(wellName, api), deadlineAt)
    pickDetailHref(search, Option(wellName).getOrElse(""),
      Option(api).getOrElse("")) match {
      case None => Enrichment.blankRow(wellName, api) // not-found path
      case Some(href) =>
        val detail = get(resolve(href), deadlineAt)
        Enrichment.WebRecord(wellName, api,
          well_status = tableValue(detail, "Well Status"),
          well_type = tableValue(detail, "Well Type"),
          closest_city = tableValue(detail, "Closest City"),
          oil_badge = badge(detail, "Barrels of Oil Produced"),
          gas_badge = badge(detail, "MCF of Gas Produced"))
    }
  }
}
