package graft.extract

import graft.core.Span

/** PDF → spans extraction seam.
  *
  * The reference converts PDFs via PdfPig's layout analysis + reading-order
  * detection (`wordslab.webscraper/pdf/PdfDocumentConverter.cs:30-113`:
  * unsupervised reading order, per-page decoration blocks removed via set
  * difference, one Section per page). No PDF toolkit ships in this
  * container, so the DECODE KERNEL IS A STUB — but the seam is the real
  * contract: the crawl engine treats any `bytes → ExtractedDoc` function as
  * a converter, and a PdfPig-equivalent drops in here without touching the
  * engine.
  *
  * The stub deterministically "extracts" any embedded ASCII text runs (the
  * degenerate uncompressed-PDF case) so plumbing tests have real rows.
  */
object PdfToSpans {

  val MinTextRunLength = 12

  def extract(pdfBytes: Array[Byte]): ExtractedDoc = {
    if (pdfBytes == null || pdfBytes.length < 5 ||
        !(pdfBytes(0) == '%' && pdfBytes(1) == 'P' && pdfBytes(2) == 'D' && pdfBytes(3) == 'F')) {
      return ExtractedDoc("", Vector.empty, Vector.empty, noFollow = true)
    }
    // STUB: printable-ASCII run scan; a real implementation does layout
    // analysis + reading order here (reference: PdfDocumentConverter.cs:47)
    val spans = Vector.newBuilder[Span]
    var off = 0
    spans += Span("Section.Start", "", "", { val o = off; off += 1; o })
    val run = new StringBuilder
    def flush(): Unit = {
      if (run.length >= MinTextRunLength) {
        spans += Span("TextBlock.Text", run.toString.trim, "", { val o = off; off += 1; o })
      }
      run.clear()
    }
    pdfBytes.foreach { b =>
      val c = b.toChar
      if (c >= ' ' && c <= '~') run.append(c) else flush()
    }
    flush()
    spans += Span("Section.End", "", "", off)
    ExtractedDoc("", spans.result(), Vector.empty, noFollow = true)
  }
}
