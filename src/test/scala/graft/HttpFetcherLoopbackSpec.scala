package graft

import graft.crawl.{HttpFetcher, Fetcher}
import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Integration tests for the PRODUCTION fetch path over real sockets: an
  * in-process `com.sun.net.httpserver` loopback server (no network egress,
  * CI-safe offline). The pure helpers (charset resolution, gunzip caps)
  * are unit-tested in HttpFetcherSpec; here the full request path runs —
  * headers, redirects, gzip transport, bot-wall detection, Retry-After,
  * size caps, transport errors, robots fallback, politeness pacing.
  */
class HttpFetcherLoopbackSpec extends AnyFunSuite {

  private def withServer(routes: Map[String, HttpExchange => Unit])(
      body: (String, Int) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    routes.foreach { case (path, h) => server.createContext(path, ex => h(ex)) }
    server.start()
    try body("127.0.0.1", server.getAddress.getPort)
    finally server.stop(0)
  }

  private def respond(ex: HttpExchange, status: Int,
      headers: Seq[(String, String)], bytes: Array[Byte]): Unit = {
    headers.foreach { case (k, v) => ex.getResponseHeaders.add(k, v) }
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def gzip(s: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(s.getBytes(StandardCharsets.UTF_8)); gz.close()
    bos.toByteArray
  }

  private def fetcher() = new HttpFetcher(defaultDelayMs = 0L)

  test("loopback: 200 html decoded with the header charset") {
    val body = "<html><body><p>café society</p></body></html>"
    withServer(Map("/p" -> { ex =>
      respond(ex, 200, Seq("Content-Type" -> "text/html; charset=ISO-8859-1"),
        body.getBytes(StandardCharsets.ISO_8859_1))
    })) { (h, p) =>
      val r = fetcher().fetch(s"http://$h:$p/p")
      assert(r.status == 200 && r.contentType == "text/html")
      assert(r.body == body, r.body)
    }
  }

  test("loopback: gzip transport decompressed before parsing") {
    val body = "<html><body><p>" + ("squeeze me " * 200) + "</p></body></html>"
    withServer(Map("/gz" -> { ex =>
      respond(ex, 200, Seq("Content-Type" -> "text/html; charset=UTF-8",
        "Content-Encoding" -> "gzip"), gzip(body))
    })) { (h, p) =>
      val r = fetcher().fetch(s"http://$h:$p/gz")
      assert(r.status == 200)
      assert(r.body == body)
    }
  }

  test("loopback: meta-charset sniff when the header has no charset param") {
    // 0x92 is a curly apostrophe in windows-1252, unmappable garbage in UTF-8
    val bytes = ("<html><head><meta charset=\"windows-1252\"></head>" +
      "<body><p>it\u2019s here</p></body></html>")
      .getBytes(Charset1252)
    withServer(Map("/meta" -> { ex =>
      respond(ex, 200, Seq("Content-Type" -> "text/html"), bytes)
    })) { (h, p) =>
      val r = fetcher().fetch(s"http://$h:$p/meta")
      assert(r.status == 200)
      assert(r.body.contains("it\u2019s here"), r.body)
    }
  }
  private lazy val Charset1252 = java.nio.charset.Charset.forName("windows-1252")

  test("loopback: 301 surfaces Location as a candidate, never auto-follows") {
    var fetchedTarget = false
    withServer(Map(
      "/from" -> { ex =>
        respond(ex, 301, Seq("Location" -> "/to"), Array.emptyByteArray)
      },
      "/to" -> { ex =>
        fetchedTarget = true
        respond(ex, 200, Seq("Content-Type" -> "text/html"),
          "<p>target</p>".getBytes(StandardCharsets.UTF_8))
      })) { (h, p) =>
      val r = fetcher().fetch(s"http://$h:$p/from")
      assert(r.status == 301)
      assert(r.redirectTo == "/to")
      assert(r.body == "" && !fetchedTarget,
        "redirect must surface to the engine, not be followed by the client")
    }
  }

  test("loopback: Retry-After seconds surfaced on a 503") {
    withServer(Map("/busy" -> { ex =>
      respond(ex, 503, Seq("Retry-After" -> "7"), Array.emptyByteArray)
    })) { (h, p) =>
      val r = fetcher().fetch(s"http://$h:$p/busy")
      assert(r.status == 503 && r.retryAfterSec == 7)
    }
  }

  test("loopback: X-DataDome bot wall maps to the sentinel status") {
    withServer(Map("/wall" -> { ex =>
      respond(ex, 200, Seq("Content-Type" -> "text/html", "X-DataDome" -> "protect"),
        "<p>captcha</p>".getBytes(StandardCharsets.UTF_8))
    })) { (h, p) =>
      val r = fetcher().fetch(s"http://$h:$p/wall")
      assert(r.status == HttpFetcher.BotProtectionStatus)
    }
  }

  test("loopback: oversized body capped at maxBodyBytes (decompressed size)") {
    val big = "x" * 10000
    withServer(Map(
      "/big" -> { ex =>
        respond(ex, 200, Seq("Content-Type" -> "text/plain"),
          big.getBytes(StandardCharsets.UTF_8))
      },
      "/biggz" -> { ex =>
        respond(ex, 200, Seq("Content-Type" -> "text/plain",
          "Content-Encoding" -> "gzip"), gzip(big))
      })) { (h, p) =>
      val f = new HttpFetcher(maxBodyBytes = 1024, defaultDelayMs = 0L)
      assert(f.fetch(s"http://$h:$p/big").body.length == 1024)
      // the cap applies AFTER decompression (a truncated gzip stream would
      // be undecodable; the cap bounds what reaches the parser)
      assert(f.fetch(s"http://$h:$p/biggz").body.length == 1024)
    }
  }

  test("loopback: connection refused is a transport error with class+message") {
    // bind a port then close it so nothing listens there
    val sock = new java.net.ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val deadPort = sock.getLocalPort
    sock.close()
    val r = fetcher().fetch(s"http://127.0.0.1:$deadPort/x")
    assert(r.status == -1)
    assert(r.errorClass != null && r.errorClass.nonEmpty, "exception class recorded")
    assert(r.errorMessage != null, "exception message recorded")
    assert(r.errorStack != null && r.errorStack.contains("."),
      "stack frames recorded for the errors log")
  }

  test("loopback: fetchRobots falls back from https to http") {
    withServer(Map("/robots.txt" -> { ex =>
      respond(ex, 200, Seq("Content-Type" -> "text/plain"),
        "User-agent: *\nDisallow: /private/\n".getBytes(StandardCharsets.UTF_8))
    })) { (h, p) =>
      // https to a plaintext port fails the TLS handshake → http succeeds
      val robots = fetcher().fetchRobots(s"$h:$p")
      assert(robots.contains("Disallow: /private/"), robots)
    }
  }

  test("loopback: same-host stylesheet fetched once (cached), gated on text/css") {
    val cssHits = new java.util.concurrent.atomic.AtomicInteger(0)
    val html =
      """<html><head><LINK REL="Stylesheet" HREF="/site.css">
        |<link rel="stylesheet" href="/wrong-type.css">
        |<link rel="stylesheet" href="https://other.example.com/cross.css">
        |</head><body><div class="side-rail"><p>chrome</p></div>
        |<p>page text</p></body></html>""".stripMargin
    withServer(Map(
      "/page" -> { ex =>
        respond(ex, 200, Seq("Content-Type" -> "text/html"),
          html.getBytes(StandardCharsets.UTF_8))
      },
      "/site.css" -> { ex =>
        cssHits.incrementAndGet()
        respond(ex, 200, Seq("Content-Type" -> "text/css"),
          ".side-rail { display: none }".getBytes(StandardCharsets.UTF_8))
      },
      "/wrong-type.css" -> { ex =>
        respond(ex, 200, Seq("Content-Type" -> "application/octet-stream"),
          "BINARY".getBytes(StandardCharsets.UTF_8))
      })) { (h, p) =>
      val f = fetcher()
      val cache = scala.collection.mutable.Map.empty[String, String]
      def fetchCss(pageUrl: String): String = {
        val r = f.fetch(pageUrl)
        // host is PORTLESS (UrlCanonicalizer.host semantics, what
        // FrontierEntry.host carries in the engine)
        graft.crawl.CssFetch.cssFor(r.body, pageUrl, h, { u =>
          val fr = f.fetch(u)
          (fr.status, fr.contentType, fr.body)
        }, cache)
      }
      val css = fetchCss(s"http://$h:$p/page")
      assert(css.contains(".side-rail"), css)
      assert(!css.contains("BINARY"), "non-text/css sheet must be rejected")
      // second page on the same host: the cache answers, no new request
      fetchCss(s"http://$h:$p/page")
      assert(cssHits.get() == 1, s"css fetched ${cssHits.get()} times")
      // and the fetched sheet actually hides the element at extract time
      val r = f.fetch(s"http://$h:$p/page")
      val d = graft.extract.HtmlToSpans.extract(r.body, Seq(css))
      val texts = d.spans.map(_.text)
      assert(texts.contains("page text") && !texts.contains("chrome"), texts)
    }
  }

  test("loopback: per-host politeness pacing waits out the crawl delay") {
    withServer(Map("/a" -> { ex =>
      respond(ex, 200, Seq("Content-Type" -> "text/html"),
        "<p>ok</p>".getBytes(StandardCharsets.UTF_8))
    })) { (h, p) =>
      val f = new HttpFetcher(delayMsByHost = Map(h -> 250L), defaultDelayMs = 0L)
      val t0 = System.nanoTime()
      f.fetch(s"http://$h:$p/a")
      f.fetch(s"http://$h:$p/a")
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(elapsedMs >= 200.0, s"second same-host fetch not paced ($elapsedMs ms)")
    }
  }
}
