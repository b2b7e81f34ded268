package graft.extract

/** Deterministic uncompressed-PDF builder for fixtures: real PDF object
  * structure (header, catalog, page tree, per-page uncompressed content
  * streams, info /Title, xref-free trailer) with text laid out top-down so
  * the extractor's line/block grouping is exercised for real. No external
  * data, no toolkit — plain strings.
  */
object PdfFixture {

  /** One logical block: `lines` rendered at `fontSize`, consecutive lines
    * spaced at 1.2 × fontSize (within the 1.3 block-grouping threshold);
    * blocks are separated by 3 × fontSize (beyond it).
    */
  final case class Block(lines: Seq[String], fontSize: Double = 10.0)

  /** Optional per-page decoration: `header` at the top of every page and a
    * "Page N" footer at the bottom (what DecorationTextBlockClassifier
    * removes in the reference).
    */
  def pdf(pages: Seq[Seq[Block]], title: String = "",
      header: String = "", pageNumbers: Boolean = false,
      compress: Boolean = false): String = {
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers)
    }
    assemble(contents, title, compress)
  }

  /** zlib-deflate a content stream, returned as its lossless ISO-8859-1
    * string image (how real PDFs store page content: /Filter /FlateDecode).
    */
  private def deflate(content: String): String = {
    val bytes = content.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(bytes); d.finish()
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1)
  }

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  private def pageContent(blocks: Seq[Block], pageNo: Int,
      header: String, pageNumbers: Boolean): String = {
    val sb = new StringBuilder
    var y = 760.0
    if (header.nonEmpty) {
      sb.append(s"BT /F1 8 Tf 72 792 Td (${esc(header)}) Tj ET\n")
    }
    blocks.foreach { b =>
      sb.append(f"BT /F1 ${b.fontSize}%.1f Tf 72 $y%.1f Td\n")
      sb.append(f"${b.fontSize * 1.2}%.1f TL\n")
      b.lines.zipWithIndex.foreach { case (line, i) =>
        if (i == 0) sb.append(s"(${esc(line)}) Tj\n")
        else sb.append(s"(${esc(line)}) '\n") // ' = next line + show
      }
      sb.append("ET\n")
      y -= b.fontSize * 1.2 * b.lines.size + b.fontSize * 3
    }
    if (pageNumbers) {
      sb.append(s"BT /F1 8 Tf 300 24 Td (Page $pageNo) Tj ET\n")
    }
    sb.toString
  }

  private def assemble(contents: Seq[String], title: String,
      compress: Boolean = false): String = {
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val n = contents.length
    // object ids: 1 catalog, 2 pages, 3 info, then per page: page obj, content obj
    val kids = (0 until n).map(i => s"${4 + i * 2} 0 R").mkString(" ")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    sb.append(s"3 0 obj << /Title (${esc(title)}) >> endobj\n")
    contents.zipWithIndex.foreach { case (c, i) =>
      val pageId = 4 + i * 2
      val contentId = pageId + 1
      sb.append(s"$pageId 0 obj << /Type /Page /Parent 2 0 R /Contents $contentId 0 R " +
        "/MediaBox [0 0 612 792] >> endobj\n")
      val (data, filter) =
        if (compress) (deflate(c), " /Filter /FlateDecode") else (c, "")
      sb.append(s"$contentId 0 obj << /Length ${data.length}$filter >> stream\n")
      sb.append(data)
      sb.append("\nendstream endobj\n")
    }
    sb.append("trailer << /Root 1 0 R /Info 3 0 R >>\n%%EOF\n")
    sb.toString
  }
}
