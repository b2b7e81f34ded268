package graft.extract

import org.scalatest.funsuite.AnyFunSuite

class PdfCodecSpec extends AnyFunSuite {
  import graft.extract.{PdfFixture => F, PdfToSpans => P}
  // in-package spec: exercises the private[extract] codec kernels directly

  private def randomData(seed: Int, n: Int): String = {
    val r = new java.util.Random(seed)
    val sb = new StringBuilder
    (0 until n).foreach { _ => sb.append((r.nextInt(256)).toChar) }
    sb.toString
  }

  test("RunLength round-trips random and runny data") {
    for (seed <- 1 to 5; n <- Seq(0, 1, 2, 500, 5000)) {
      val d = randomData(seed, n)
      assert(P.runLengthDecode(F.rleEncode(d)).contains(d), s"seed=$seed n=$n")
    }
    val runny = "a" * 300 + "bc" + "d" * 127 + "efg" + "h" * 129
    assert(P.runLengthDecode(F.rleEncode(runny)).contains(runny))
  }

  test("LZW round-trips random, runny, and width-crossing data") {
    for (seed <- 1 to 3; n <- Seq(0, 1, 600, 20000)) {
      val d = randomData(seed, n)
      assert(P.lzwDecode(F.lzwEncode(d)).contains(d), s"seed=$seed n=$n")
    }
    val txt = ("the quick brown fox " * 600) + randomData(9, 8000)
    assert(P.lzwDecode(F.lzwEncode(txt)).contains(txt), "big mixed")
  }

  test("LZW EarlyChange=0 round-trips (deferred width growth)") {
    val txt = ("deferred width growth material " * 400) + randomData(11, 6000)
    assert(P.lzwDecode(F.lzwEncode(txt, earlyChange = 0), earlyChange = 0)
      .contains(txt))
    // and the two conventions really differ past the first width boundary
    assert(!P.lzwDecode(F.lzwEncode(txt, earlyChange = 0), earlyChange = 1)
      .contains(txt))
  }

  test("PDF: /DecodeParms EarlyChange 0 LZW streams decode") {
    val content = "BT /F1 10 Tf 72 700 Td (early change zero paragraph " +
      ("word " * 300).trim + ") Tj ET"
    val data = F.lzwEncode(content, earlyChange = 0)
    val pdf = "%PDF-1.4\n" +
      s"1 0 obj << /Length ${data.length} /Filter /LZWDecode " +
      "/DecodeParms << /EarlyChange 0 >> >> stream\n" + data +
      "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n"
    val texts = P.extract(pdf).spans
      .filter(_.kind == "TextBlock.Text").map(_.text)
    assert(texts.length == 1 && texts.head.startsWith("early change zero"),
      texts.mkString("|"))
  }

  test("ASCII85/Hex round-trips") {
    for (seed <- 1 to 3; n <- Seq(0, 1, 2, 3, 4, 5, 1000)) {
      val d = randomData(seed, n)
      assert(P.ascii85Decode(F.a85Encode(d)).contains(d), s"a85 seed=$seed n=$n")
      assert(P.asciiHexDecode(F.hexEncode(d)).contains(d), s"hex seed=$seed n=$n")
    }
  }
  test("parseCMap: section-less, unterminated, and empty inputs yield empty maps") {
    // a structurally valid CMap with NO mapping sections -> empty map
    // (buildFont then falls back to Latin-1), never a crash
    assert(P.parseCMap("/CIDInit /ProcSet findresource begin endcmap end").map.isEmpty)
    assert(P.parseCMap("2 beginbfchar <01>\n").map.isEmpty) // unterminated section
    assert(P.parseCMap("").map.isEmpty)
    // garbage between valid sections is skipped, valid entries survive
    val mixed = P.parseCMap(
      "1 begincodespacerange <00> <FF> endcodespacerange junk !! " +
      "1 beginbfchar <41> <0042> endbfchar trailing ((")
    assert(mixed.codeBytes == 1 && mixed.map == Map(0x41 -> "B"), mixed.toString)
  }

}
