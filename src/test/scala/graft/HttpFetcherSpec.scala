package graft

import graft.crawl.HttpFetcher
import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Pure-function coverage of the HTTP fetcher's content handling (S2/C5);
  * the network path itself is exercised only in live deployments.
  */
class HttpFetcherSpec extends AnyFunSuite {

  test("mime extraction and textual gate") {
    assert(HttpFetcher.mimeOf("text/html; charset=utf-8") == "text/html")
    assert(HttpFetcher.mimeOf("Application/PDF") == "application/pdf")
    assert(HttpFetcher.isTextual("text/html"))
    assert(HttpFetcher.isTextual("text/plain"))
    assert(!HttpFetcher.isTextual("application/pdf"))
    assert(!HttpFetcher.isTextual("image/png"))
  }

  test("charset: header param wins, then meta sniff, then UTF-8") {
    val metaBody = """<html><head><meta charset="ISO-8859-1"></head>""".getBytes
    assert(HttpFetcher.resolveCharset("text/html; charset=UTF-16", metaBody)
      == StandardCharsets.UTF_16)
    assert(HttpFetcher.resolveCharset("text/html", metaBody)
      == StandardCharsets.ISO_8859_1)
    val httpEquiv =
      """<meta http-equiv="Content-Type" content="text/html; charset=windows-1251">"""
        .getBytes
    assert(HttpFetcher.resolveCharset("", httpEquiv).name() == "windows-1251")
    assert(HttpFetcher.resolveCharset("text/html", "<html>plain".getBytes)
      == StandardCharsets.UTF_8)
    // bogus charset names fall through to the next source
    assert(HttpFetcher.resolveCharset("text/html; charset=not-a-charset",
      "<html>".getBytes) == StandardCharsets.UTF_8)
  }

  test("gunzip round-trip and graceful fallback on non-gzip bytes") {
    val payload = "hello gzip world".getBytes(StandardCharsets.UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(payload); gz.close()
    assert(HttpFetcher.gunzip(bos.toByteArray).sameElements(payload))
    assert(HttpFetcher.gunzip(payload).sameElements(payload)) // not gzip → as-is
    // capped variant: output-size cap, and invalid gzip is an ERROR (None),
    // never compressed bytes passed through as if they were text
    assert(HttpFetcher.gunzipCapped(bos.toByteArray, 1 << 20).get.sameElements(payload))
    assert(HttpFetcher.gunzipCapped(bos.toByteArray, 5).get.sameElements(payload.take(5)))
    assert(HttpFetcher.gunzipCapped(payload, 1 << 20).isEmpty)
    // truncated gzip stream: either an error or a valid prefix, never garbage
    val truncated = bos.toByteArray.take(bos.toByteArray.length - 4)
    val r = HttpFetcher.gunzipCapped(truncated, 1 << 20)
    assert(r.isEmpty || new String(r.get, StandardCharsets.UTF_8).startsWith("hello"))
  }

  test("unreachable host yields an error response, never throws") {
    val f = new HttpFetcher(timeoutSec = 1)
    val r = f.fetch("https://definitely-not-a-real-host.invalid/x")
    assert(r.status == -1)
  }
}
