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
      compress: Boolean = false,
      info: Map[String, String] = Map.empty): String = {
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers)
    }
    assemble(contents, title, compress, info)
  }

  /** Same document with an explicit content-stream /Filter chain, named in
    * DECODE order as PDF dicts do (e.g. `Seq("ASCII85Decode",
    * "FlateDecode")` = the classic mail-safe wrapping: deflate, then
    * ASCII85-armor; the reader un-armors first, inflates second).
    */
  def pdfFiltered(pages: Seq[Seq[Block]], title: String,
      filters: Seq[String], header: String = "",
      pageNumbers: Boolean = false): String = {
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers)
    }
    def encode(c: String): String = filters.reverse.foldLeft(c) { (d, f) =>
      f match {
        case "FlateDecode" => deflate(d)
        case "ASCII85Decode" => a85Encode(d)
        case "ASCIIHexDecode" => hexEncode(d)
        case "LZWDecode" => lzwEncode(d)
        case "RunLengthDecode" => rleEncode(d)
        case other => throw new IllegalArgumentException(other)
      }
    }
    val filterSpec =
      if (filters.length == 1) s" /Filter /${filters.head}"
      else s" /Filter [${filters.map("/" + _).mkString(" ")}]"
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val n = contents.length
    val kids = (0 until n).map(i => s"${4 + i * 2} 0 R").mkString(" ")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    sb.append(s"3 0 obj << /Title (${esc(title)}) >> endobj\n")
    contents.zipWithIndex.foreach { case (c, i) =>
      val pageId = 4 + i * 2
      val contentId = pageId + 1
      sb.append(s"$pageId 0 obj << /Type /Page /Parent 2 0 R /Contents $contentId 0 R " +
        "/MediaBox [0 0 612 792] >> endobj\n")
      val data = encode(c)
      sb.append(s"$contentId 0 obj << /Length ${data.length}$filterSpec >> stream\n")
      sb.append(data)
      sb.append("\nendstream endobj\n")
    }
    sb.append("trailer << /Root 1 0 R /Info 3 0 R >>\n%%EOF\n")
    sb.toString
  }

  /** PDF 1.5+ layout of the same document: the whole non-stream object
    * catalog (catalog, page tree, info dict — so the /Title) lives inside
    * a Flate-compressed /ObjStm object stream, located by a /XRef
    * cross-reference stream with /W [1 4 2] fields and the PNG Up row
    * predictor; content streams are Flate too and declare their /Length
    * as an INDIRECT reference (a trailing length object), the way
    * real-world incremental writers emit them.
    */
  def pdfModern(pages: Seq[Seq[Block]], title: String = "",
      header: String = "", pageNumbers: Boolean = false,
      info: Map[String, String] = Map.empty): String = {
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers)
    }
    assembleModern(contents, title, info)
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

  /** One decimal place, Locale.ROOT — the ONLY way a fixture may format a
    * fractional PDF number: the f-interpolator / bare String.format use
    * the default JVM locale, and a comma-decimal locale would emit "18,0",
    * an invalid PDF number (ADVICE r06; Bpe.normalizeWords pins locale the
    * same way).
    */
  private def d1(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")

  /** Document-information dict body: /Title plus every `info` entry.
    * Pure-ASCII values write as literal strings; anything else writes the
    * spec's UTF-16BE hex form with the FE FF BOM (PDF 32000 §7.9.2.2).
    */
  private def infoDict(title: String, info: Map[String, String]): String = {
    val entries =
      (if (title.nonEmpty || info.isEmpty) Seq("Title" -> title) else Nil) ++
        info.toSeq
    "<< " + entries.map { case (k, v) =>
      if (v.forall(c => c >= 0x20 && c < 0x7f)) s"/$k (${esc(v)})"
      else s"/$k <FEFF${v.map(c => f"${c.toInt}%04X").mkString}>"
    }.mkString(" ") + " >>"
  }

  /** ASCII85 encoding (PDF §7.4.3): 4 bytes → 5 chars '!'..'u', partial
    * final group of n bytes → n+1 chars, '~>' terminator. (No 'z'
    * shorthand — optional for encoders; the decoder handles both.)
    */
  private[extract] def a85Encode(data: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < data.length) {
      val count = math.min(4, data.length - i)
      var v = 0L
      var j = 0
      while (j < 4) {
        v = (v << 8) | (if (j < count) data.charAt(i + j) & 0xff else 0)
        j += 1
      }
      val cs = new Array[Char](5)
      var k = 4
      while (k >= 0) { cs(k) = ('!' + (v % 85).toInt).toChar; v /= 85; k -= 1 }
      sb.appendAll(cs, 0, count + 1)
      i += 4
    }
    sb.append("~>").toString
  }

  /** ASCIIHex encoding (PDF §7.4.2): hex pairs with line breaks, '>'. */
  private[extract] def hexEncode(data: String): String =
    data.grouped(32).map(_.map(c => f"${c & 0xff}%02X").mkString)
      .mkString("", "\n", ">")

  /** LZW encoding (PDF §7.4.4 TIFF variant): MSB-first variable-width
    * codes from 9 bits; leading clear-table (256), trailing EOD (257);
    * the decoder widens ONE CODE EARLY (EarlyChange=1), which — given the
    * decoder's one-entry table lag — means the ENCODER widens exactly
    * when its next free code reaches 2^width; clears the table at 4096.
    */
  private[extract] def lzwEncode(data: String, earlyChange: Int = 1): String = {
    val out = new StringBuilder
    var bitBuf = 0L
    var bitCnt = 0
    var width = 9
    def emit(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) {
        out.append((((bitBuf >> (bitCnt - 8)) & 0xff)).toChar)
        bitCnt -= 8
      }
    }
    var dict = scala.collection.mutable.HashMap.empty[String, Int]
    var nextCode = 258
    def reset(): Unit = {
      dict = scala.collection.mutable.HashMap.empty
      (0 until 256).foreach(i => dict(i.toChar.toString) = i)
      nextCode = 258
      width = 9
    }
    reset()
    emit(256) // clear
    var w = ""
    data.foreach { c =>
      val wc = w + c
      if (dict.contains(wc)) w = wc
      else {
        emit(dict(w))
        if (nextCode < 4096) {
          dict(wc) = nextCode
          nextCode += 1
          if (nextCode >= (1 << width) + (1 - earlyChange) && width < 12) width += 1
        } else { emit(256); reset() }
        w = c.toString
      }
    }
    if (w.nonEmpty) emit(dict(w))
    emit(257) // EOD
    if (bitCnt > 0) out.append((((bitBuf << (8 - bitCnt)) & 0xff)).toChar)
    out.toString
  }

  /** RunLength encoding (PDF §7.4.5): repeat runs of ≥3 as (257-n, byte),
    * literals in ≤128-byte chunks, 128 terminator.
    */
  private[extract] def rleEncode(data: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < data.length) {
      var run = 1
      while (i + run < data.length && run < 128 && data.charAt(i + run) == data.charAt(i))
        run += 1
      if (run >= 3) {
        out.append((257 - run).toChar).append(data.charAt(i))
        i += run
      } else {
        var lit = run // start with the short run as literal
        while (i + lit < data.length && lit < 128 &&
            !(i + lit + 2 < data.length &&
              data.charAt(i + lit) == data.charAt(i + lit + 1) &&
              data.charAt(i + lit) == data.charAt(i + lit + 2)))
          lit += 1
        out.append((lit - 1).toChar)
        out.append(data.substring(i, i + lit))
        i += lit
      }
    }
    out.append(128.toChar).toString
  }

  private def pageContent(blocks: Seq[Block], pageNo: Int,
      header: String, pageNumbers: Boolean,
      enc: String => String = s => s"(${esc(s)})"): String = {
    val sb = new StringBuilder
    var y = 760.0
    if (header.nonEmpty) {
      sb.append(s"BT /F1 8 Tf 72 792 Td ${enc(header)} Tj ET\n")
    }
    blocks.foreach { b =>
      sb.append(s"BT /F1 ${d1(b.fontSize)} Tf 72 ${d1(y)} Td\n")
      sb.append(s"${d1(b.fontSize * 1.2)} TL\n")
      b.lines.zipWithIndex.foreach { case (line, i) =>
        if (i == 0) sb.append(s"${enc(line)} Tj\n")
        else sb.append(s"${enc(line)} '\n") // ' = next line + show
      }
      sb.append("ET\n")
      y -= b.fontSize * 1.2 * b.lines.size + b.fontSize * 3
    }
    if (pageNumbers) {
      sb.append(s"BT /F1 8 Tf 300 24 Td ${enc(s"Page $pageNo")} Tj ET\n")
    }
    sb.toString
  }

  // --- subset-font fixtures: glyph codes ≠ character codes -----------------

  /** All text a page set shows, for building the fixture glyph table. */
  private def shownText(pages: Seq[Seq[Block]], header: String,
      pageNumbers: Boolean): String =
    (Seq(header).filter(_.nonEmpty) ++
      pages.flatMap(_.flatMap(_.lines)) ++
      (if (pageNumbers) (1 to pages.length).map(p => s"Page $p") else Nil))
      .mkString

  /** Same document, but shown through an embedded SUBSET font: glyph
    * codes are arbitrary small integers assigned in character-sorted
    * order, so a Latin-1 reading of the show strings is pure mojibake;
    * the /ToUnicode CMap (Flate-compressed, with both bfrange runs and
    * bfchar singles) is the only way back to the real text — the
    * structure essentially every real-world PDF with embedded font
    * subsets has. `twoByte` switches to a CID-style 2-byte codespace
    * (/Subtype /Type0) with 4-hex-digit show codes.
    */
  def pdfSubsetFont(pages: Seq[Seq[Block]], title: String = "",
      header: String = "", pageNumbers: Boolean = false,
      twoByte: Boolean = false,
      info: Map[String, String] = Map.empty): String = {
    val chars = shownText(pages, header, pageNumbers).distinct.sorted
    val base = if (twoByte) 0x0102 else 0x02 // ≠ char codes even for digits
    require(chars.length <= (if (twoByte) 50000 else 250), "fixture alphabet")
    val code: Map[Char, Int] =
      chars.zipWithIndex.map { case (c, i) => c -> (base + i) }.toMap
    val hexW = if (twoByte) 4 else 2
    def encStr(s: String): String =
      "<" + s.map(c => ("%0" + hexW + "X").format(code(c))).mkString + ">"
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers, encStr)
    }
    val cmapData = deflate(cmapText(code, hexW))
    val subtype = if (twoByte) "/Type0" else "/TrueType"
    val fontObj = s"<< /Type /Font /Subtype $subtype /BaseFont /GRAFTX+Fixture " +
      "/ToUnicode 5 0 R >>"
    assembleWithFont(contents, title, info, fontObj,
      Some(s"5 0 obj << /Length ${cmapData.length} /Filter /FlateDecode >> stream\n" +
        cmapData + "\nendstream endobj\n"))
  }

  /** Same document through a simple font remapped with /Encoding
    * /Differences glyph NAMES (no /ToUnicode at all) — the other way
    * legacy Type1 subsets carry their meaning.
    */
  def pdfDifferencesFont(pages: Seq[Seq[Block]], title: String = "",
      header: String = "", pageNumbers: Boolean = false): String = {
    val nameOf: Map[Char, String] =
      PdfToSpans.AglNames.map { case (n, c) => c -> n }
    val chars = shownText(pages, header, pageNumbers).distinct.sorted
    val unnamed = chars.filterNot(nameOf.contains)
    require(unnamed.isEmpty, s"no AGL name for: $unnamed")
    val code: Map[Char, Int] =
      chars.zipWithIndex.map { case (c, i) => c -> (0x21 + i) }.toMap
    require(chars.length <= 0xDE, "fixture alphabet")
    def encStr(s: String): String =
      "<" + s.map(c => f"${code(c)}%02X").mkString + ">"
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers, encStr)
    }
    val diffs = s"${0x21} " + chars.map(c => "/" + nameOf(c)).mkString(" ")
    val fontObj = "<< /Type /Font /Subtype /Type1 /BaseFont /GRAFTD+Fixture " +
      s"/Encoding << /Type /Encoding /Differences [ $diffs ] >> >>"
    assembleWithFont(contents, title, Map.empty, fontObj, None)
  }

  /** PDF 1.5 layout WITH a subset font: catalog, page tree, info AND the
    * font dictionary all live inside the Flate-compressed /ObjStm (how
    * real 1.5+ writers emit non-stream objects), the /ToUnicode CMap is a
    * top-level Flate stream referenced from inside the object stream, and
    * every show string uses remapped 1-byte glyph codes — the hardest
    * combination the reader supports, exercised as one document.
    */
  def pdfModernSubsetFont(pages: Seq[Seq[Block]], title: String = "",
      header: String = "", pageNumbers: Boolean = false): String = {
    val chars = shownText(pages, header, pageNumbers).distinct.sorted
    require(chars.length <= 250, "fixture alphabet")
    val code: Map[Char, Int] =
      chars.zipWithIndex.map { case (c, i) => c -> (0x02 + i) }.toMap
    def encStr(s: String): String =
      "<" + s.map(c => f"${code(c)}%02X").mkString + ">"
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers, encStr)
    }
    val cmapData = deflate(cmapText(code, 2))
    val n = contents.length
    // ids — embedded in ObjStm 1: 2 catalog, 3 pages, 4 info, 5 font,
    // 6..5+n page dicts; top level: per page content/length at
    // 6+n+2i / 7+n+2i, the CMap stream, then the XRef stream
    val cmapId = 6 + 3 * n
    val xrefId = 7 + 3 * n
    val kids = (0 until n).map(i => s"${6 + i} 0 R").mkString(" ")
    val embedded: Seq[(Int, String)] =
      Seq(
        2 -> "<< /Type /Catalog /Pages 3 0 R >>",
        3 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>",
        4 -> infoDict(title, Map.empty),
        5 -> ("<< /Type /Font /Subtype /TrueType /BaseFont /GRAFTM+Fixture " +
          s"/ToUnicode $cmapId 0 R >>")) ++
      (0 until n).map { i =>
        (6 + i) -> (s"<< /Type /Page /Parent 3 0 R /Contents ${6 + n + 2 * i} 0 R " +
          "/Resources << /Font << /F1 5 0 R >> >> /MediaBox [0 0 612 792] >>")
      }
    assembleModernLayout(embedded,
      contents.zipWithIndex.map { case (c, i) => (6 + n + 2 * i, c) },
      Seq(cmapId -> cmapData), xrefId)
  }

  // --- embedded TrueType program (no /ToUnicode at all) -------------------

  private def w16(v: Int): String =
    "" + ((v >> 8) & 0xff).toChar + (v & 0xff).toChar
  private def w32(v: Long): String =
    w16(((v >> 16) & 0xffff).toInt) + w16((v & 0xffff).toInt)

  /** Minimal TrueType (sfnt) binary carrying ONLY a `cmap` table — the one
    * table text recovery needs. `uniToGid` is the Unicode→glyph mapping;
    * `format12` picks a segmented-coverage (3,10) subtable over the
    * format-4 (3,1) default; `glyphIdArray` routes format-4 segments
    * through the spec's idRangeOffset/glyphIdArray indirection instead of
    * delta arithmetic.
    */
  private[graft] def trueTypeProgram(uniToGid: Seq[(Int, Int)],
      format12: Boolean = false, glyphIdArray: Boolean = false): String = {
    val sorted = uniToGid.sortBy(_._1)
    // maximal runs where codepoint and glyph advance together
    val runs = sorted.foldLeft(Vector.empty[Vector[(Int, Int)]]) { (acc, e) =>
      acc.lastOption match {
        case Some(r) if r.last._1 + 1 == e._1 && r.last._2 + 1 == e._2 =>
          acc.init :+ (r :+ e)
        case _ => acc :+ Vector(e)
      }
    }
    val sub =
      if (format12) {
        val body = runs.map { r =>
          w32(r.head._1.toLong) + w32(r.last._1.toLong) + w32(r.head._2.toLong)
        }.mkString
        w16(12) + w16(0) + w32(16L + body.length) + w32(0L) +
          w32(runs.length.toLong) + body
      } else {
        // runs + the mandatory final 0xFFFF segment
        val segCount = runs.length + 1
        val ends = runs.map(_.last._1) :+ 0xffff
        val starts = runs.map(_.head._1) :+ 0xffff
        val (deltas, ros, ga) =
          if (!glyphIdArray)
            (runs.map(r => (r.head._2 - r.head._1) & 0xffff) :+ 1,
              Vector.fill(segCount)(0), "")
          else {
            // glyphIdArray path: idRangeOffset[s] points (in bytes, from
            // its own address) at the segment's glyph run in the array
            var p = 0
            val ros0 = Vector.newBuilder[Int]
            val ga0 = new StringBuilder
            runs.zipWithIndex.foreach { case (r, s) =>
              ros0 += 2 * (segCount + p - s)
              r.foreach { case (_, gid) => ga0.append(w16(gid)); p += 1 }
            }
            (Vector.fill(runs.length)(0) :+ 1, ros0.result() :+ 0, ga0.toString)
          }
        val arrays = ends.map(w16).mkString + w16(0) +
          starts.map(w16).mkString + deltas.map(w16).mkString +
          ros.map(w16).mkString + ga
        w16(4) + w16(14 + arrays.length) + w16(0) +
          w16(2 * segCount) + w16(2) + w16(0) + w16(0) + arrays
      }
    val cmapTable = w16(0) + w16(1) +
      w16(3) + w16(if (format12) 10 else 1) + w32(12L) + sub
    // offset table (version, 1 table) + the cmap record; table data at 28
    w32(0x00010000L) + w16(1) + w16(16) + w16(0) + w16(0) +
      "cmap" + w32(0L) + w32(28L) + w32(cmapTable.length.toLong) + cmapTable
  }

  /** The writer class round-5 could not decode: a /Type0 /Identity-H font
    * whose descendant embeds a TrueType program and carries NEITHER
    * /ToUnicode NOR /Differences — the show strings are raw 2-byte glyph
    * IDs and the font program's `cmap` is the only road back to text.
    * Glyph IDs are assigned in character-sorted order from base 3, so a
    * Latin-1/U+FFFD reading is provably wrong by construction.
    * `cidToGidStream` swaps the /Identity CID→GID default for an explicit
    * /CIDToGIDMap stream (CIDs offset to 0x0200, mapped back by the
    * stream); `format12` embeds a segmented-coverage cmap instead of
    * format 4.
    */
  def pdfEmbeddedCmapFont(pages: Seq[Seq[Block]], title: String = "",
      header: String = "", pageNumbers: Boolean = false,
      format12: Boolean = false, cidToGidStream: Boolean = false,
      glyphIdArray: Boolean = false): String = {
    val chars = shownText(pages, header, pageNumbers).distinct.sorted
    require(chars.length <= 50000, "fixture alphabet")
    val gidOf: Map[Char, Int] =
      chars.zipWithIndex.map { case (c, i) => c -> (3 + i) }.toMap
    val cidOf: Map[Char, Int] =
      if (cidToGidStream)
        chars.zipWithIndex.map { case (c, i) => c -> (0x0200 + i) }.toMap
      else gidOf
    def encStr(s: String): String =
      "<" + s.map(c => f"${cidOf(c)}%04X").mkString + ">"
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, header, pageNumbers, encStr)
    }
    val program = trueTypeProgram(
      chars.map(c => (c.toInt, gidOf(c))), format12, glyphIdArray)
    val pre = new StringBuilder
    pre.append("4 0 obj << /Type /Font /Subtype /Type0 " +
      "/BaseFont /GRAFTT+Fixture /Encoding /Identity-H " +
      "/DescendantFonts [5 0 R] >> endobj\n")
    val c2g = if (cidToGidStream) "8 0 R" else "/Identity"
    pre.append("5 0 obj << /Type /Font /Subtype /CIDFontType2 " +
      "/BaseFont /GRAFTT+Fixture /CIDSystemInfo " +
      "<< /Registry (Adobe) /Ordering (Identity) /Supplement 0 >> " +
      s"/FontDescriptor 6 0 R /CIDToGIDMap $c2g >> endobj\n")
    pre.append("6 0 obj << /Type /FontDescriptor /FontName /GRAFTT+Fixture " +
      "/Flags 4 /FontFile2 7 0 R >> endobj\n")
    pre.append(s"7 0 obj << /Length ${program.length} >> stream\n")
    pre.append(program).append("\nendstream endobj\n")
    if (cidToGidStream) {
      val gidByCid = cidOf.map { case (c, cid) => cid -> gidOf(c) }
      val m = new StringBuilder
      (0 to cidOf.values.max).foreach(cid =>
        m.append(w16(gidByCid.getOrElse(cid, 0))))
      pre.append(s"8 0 obj << /Length ${m.length} >> stream\n")
      pre.append(m).append("\nendstream endobj\n")
    }
    assembleClassic(pre.toString,
      firstPageId = if (cidToGidStream) 9 else 8, contents, title, Map.empty)
  }

  /** /ToUnicode CMap body: consecutive (code, unicode) runs as bfrange,
    * the rest as bfchar — both section kinds exercised, ≤100 entries per
    * section as §9.10.3 requires.
    */
  private def cmapText(code: Map[Char, Int], hexW: Int): String = {
    def h(v: Int) = ("%0" + hexW + "X").format(v)
    val sorted = code.toSeq.map { case (c, k) => (k, c.toInt) }.sortBy(_._1)
    // group maximal runs where code and unicode advance together
    val runs = sorted.foldLeft(Vector.empty[Vector[(Int, Int)]]) { (acc, e) =>
      acc.lastOption match {
        case Some(run) if run.last._1 + 1 == e._1 && run.last._2 + 1 == e._2 =>
          acc.init :+ (run :+ e)
        case _ => acc :+ Vector(e)
      }
    }
    val (ranges, singles) = runs.partition(_.length >= 2)
    val sb = new StringBuilder
    sb.append("/CIDInit /ProcSet findresource begin\n12 dict begin\nbegincmap\n")
    sb.append("/CMapName /GraftFixture def\n/CMapType 2 def\n")
    sb.append(s"1 begincodespacerange\n<${"0" * hexW}> <${"F" * hexW}>\nendcodespacerange\n")
    ranges.grouped(100).foreach { g =>
      sb.append(s"${g.length} beginbfrange\n")
      g.foreach { run =>
        sb.append(s"<${h(run.head._1)}> <${h(run.last._1)}> <${"%04X".format(run.head._2)}>\n")
      }
      sb.append("endbfrange\n")
    }
    singles.flatten.grouped(100).foreach { g =>
      sb.append(s"${g.length} beginbfchar\n")
      g.foreach { case (k, u) =>
        sb.append(s"<${h(k)}> <${"%04X".format(u)}>\n")
      }
      sb.append("endbfchar\n")
    }
    sb.append("endcmap\nCMapName currentdict /CMap defineresource pop\nend\nend\n")
    sb.toString
  }

  /** Classic-layout assembly with one shared font: 1 catalog, 2 pages,
    * 3 info, 4 font, optional 5 CMap stream, then per page (page obj,
    * Flate content obj) from id 6; every page binds /F1 → 4 0 R in its
    * /Resources.
    */
  /** Document with an embedded /Subtype /Image XObject drawn on every page
    * with its BOTTOM edge at `imageY` (`q W 0 0 H 72 Y cm /Im1 Do Q` — the
    * unit square maps to [72, 72+W]×[imageY, imageY+H], and the extractor
    * anchors reading order at the drawn TOP edge imageY+H),
    * exercising the Media.Image span path: resources carry
    * /XObject << /Im1 N 0 R >>, the image stream's dict carries the dims,
    * and the payload is deterministic opaque bytes the extractor must NOT
    * read (only the dict surfaces).
    */
  def pdfWithImage(pages: Seq[Seq[Block]], title: String = "",
      imageW: Int = 120, imageH: Int = 80, imageY: Double = 500.0): String = {
    val contents = pages.zipWithIndex.map { case (blocks, p) =>
      pageContent(blocks, p + 1, "", pageNumbers = false) +
        s"q $imageW 0 0 $imageH 72 ${d1(imageY)} cm /Im1 Do Q\n"
    }
    val imgData = ("GRAY" * ((imageW * imageH + 3) / 4)).take(imageW * imageH)
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val n = contents.length
    val kids = (0 until n).map(i => s"${5 + i * 2} 0 R").mkString(" ")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    sb.append(s"3 0 obj ${infoDict(title, Map.empty)} endobj\n")
    sb.append(s"4 0 obj << /Type /XObject /Subtype /Image /Width $imageW " +
      s"/Height $imageH /ColorSpace /DeviceGray /BitsPerComponent 8 " +
      s"/Length ${imgData.length} >> stream\n")
    sb.append(imgData)
    sb.append("\nendstream endobj\n")
    contents.zipWithIndex.foreach { case (c, i) =>
      val pageId = 5 + i * 2
      val contentId = pageId + 1
      sb.append(s"$pageId 0 obj << /Type /Page /Parent 2 0 R /Contents $contentId 0 R " +
        "/Resources << /XObject << /Im1 4 0 R >> >> " +
        "/MediaBox [0 0 612 792] >> endobj\n")
      sb.append(s"$contentId 0 obj << /Length ${c.length} >> stream\n")
      sb.append(c)
      sb.append("\nendstream endobj\n")
    }
    sb.append("trailer << /Root 1 0 R /Info 3 0 R >>\n%%EOF\n")
    sb.toString
  }

  private def assembleWithFont(contents: Seq[String], title: String,
      info: Map[String, String], fontObj: String,
      cmapObj: Option[String]): String =
    assembleClassic(s"4 0 obj $fontObj endobj\n" + cmapObj.getOrElse(""),
      firstPageId = 6, contents, title, info)

  /** Classic-layout document assembly shared by the font-family writers:
    * catalog(1) + pages(2) + info(3) + the caller's pre-rendered preamble
    * objects (font dicts, CMap/font-program streams — ids 4..firstPageId-1),
    * then the per-page dict + Flate content loop (pages reference /F1 →
    * object 4), one trailer. The no-font `assemble` and the 1.5-layout
    * `assembleModern*` writers are intentionally separate shapes.
    */
  private def assembleClassic(preamble: String, firstPageId: Int,
      contents: Seq[String], title: String,
      info: Map[String, String]): String = {
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val n = contents.length
    val kids = (0 until n).map(i => s"${firstPageId + i * 2} 0 R").mkString(" ")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    sb.append(s"3 0 obj ${infoDict(title, info)} endobj\n")
    sb.append(preamble)
    contents.zipWithIndex.foreach { case (c, i) =>
      val pageId = firstPageId + i * 2
      val contentId = pageId + 1
      sb.append(s"$pageId 0 obj << /Type /Page /Parent 2 0 R /Contents $contentId 0 R " +
        "/Resources << /Font << /F1 4 0 R >> >> " +
        "/MediaBox [0 0 612 792] >> endobj\n")
      val data = deflate(c)
      sb.append(s"$contentId 0 obj << /Length ${data.length} /Filter /FlateDecode >> stream\n")
      sb.append(data)
      sb.append("\nendstream endobj\n")
    }
    sb.append("trailer << /Root 1 0 R /Info 3 0 R >>\n%%EOF\n")
    sb.toString
  }

  private def assemble(contents: Seq[String], title: String,
      compress: Boolean = false,
      info: Map[String, String] = Map.empty): String = {
    val sb = new StringBuilder
    sb.append("%PDF-1.4\n")
    val n = contents.length
    // object ids: 1 catalog, 2 pages, 3 info, then per page: page obj, content obj
    val kids = (0 until n).map(i => s"${4 + i * 2} 0 R").mkString(" ")
    sb.append("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    sb.append(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    sb.append(s"3 0 obj ${infoDict(title, info)} endobj\n")
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

  private def assembleModern(contents: Seq[String], title: String,
      info: Map[String, String] = Map.empty): String = {
    val n = contents.length
    // ids: 1 = ObjStm; inside it: 2 catalog, 3 pages, 4 info,
    // 5..4+n page dicts; top level: per page (content stream, its length
    // object) at 5+n+2i / 6+n+2i; last = the XRef stream itself
    val xrefId = 5 + 3 * n
    val kids = (0 until n).map(i => s"${5 + i} 0 R").mkString(" ")
    val embedded: Seq[(Int, String)] =
      Seq(
        2 -> "<< /Type /Catalog /Pages 3 0 R >>",
        3 -> s"<< /Type /Pages /Kids [$kids] /Count $n >>",
        4 -> infoDict(title, info)) ++
      (0 until n).map { i =>
        (5 + i) -> (s"<< /Type /Page /Parent 3 0 R /Contents ${5 + n + 2 * i} 0 R " +
          "/MediaBox [0 0 612 792] >>")
      }
    assembleModernLayout(embedded,
      contents.zipWithIndex.map { case (c, i) => (5 + n + 2 * i, c) },
      Nil, xrefId)
  }

  /** Shared PDF 1.5 assembler (both modern fixture layouts): `embedded`
    * objects live in the Flate /ObjStm (object 1); `contents` are
    * top-level Flate content streams declaring their /Length as an
    * INDIRECT reference (length object at id+1, the way real incremental
    * writers emit them); `extraStreams` are top-level Flate streams with a
    * direct /Length (e.g. a /ToUnicode CMap); the /XRef stream (/W [1 4 2],
    * PNG Up row predictor) indexes ids 0..`xrefId` contiguously. /Root is
    * object 2 and /Info object 4 by both callers' convention.
    */
  private def assembleModernLayout(embedded: Seq[(Int, String)],
      contents: Seq[(Int, String)], extraStreams: Seq[(Int, String)],
      xrefId: Int): String = {
    val bodies = embedded.map(_._2 + "\n")
    val offsets = bodies.scanLeft(0)(_ + _.length)
    val head = embedded.zip(offsets).map { case ((id, _), off) => s"$id $off" }
      .mkString(" ") + "\n"
    val objStmData = deflate(head + bodies.mkString)

    val sb = new StringBuilder
    val objOffsets = scala.collection.mutable.Map.empty[Int, Int]
    sb.append("%PDF-1.5\n")
    objOffsets(1) = sb.length
    sb.append(s"1 0 obj << /Type /ObjStm /N ${embedded.length} /First ${head.length} " +
      s"/Length ${objStmData.length} /Filter /FlateDecode >> stream\n")
    sb.append(objStmData)
    sb.append("\nendstream endobj\n")
    contents.foreach { case (contentId, c) =>
      val lenId = contentId + 1
      val data = deflate(c)
      objOffsets(contentId) = sb.length
      sb.append(s"$contentId 0 obj << /Length $lenId 0 R /Filter /FlateDecode >> stream\n")
      sb.append(data)
      sb.append("\nendstream endobj\n")
      objOffsets(lenId) = sb.length
      sb.append(s"$lenId 0 obj ${data.length} endobj\n")
    }
    extraStreams.foreach { case (id, data) =>
      objOffsets(id) = sb.length
      sb.append(s"$id 0 obj << /Length ${data.length} /Filter /FlateDecode >> stream\n")
      sb.append(data)
      sb.append("\nendstream endobj\n")
    }
    val xrefOffset = sb.length
    objOffsets(xrefId) = xrefOffset
    val embIdx = embedded.map(_._1).zipWithIndex.toMap
    val entries: Seq[(Int, Long, Long)] = (0 to xrefId).map { id =>
      if (id == 0) (0, 0L, 65535L)
      else embIdx.get(id) match {
        case Some(i) => (2, 1L, i.toLong) // i-th object inside ObjStm 1
        case None => (1, objOffsets(id).toLong, 0L)
      }
    }
    val rowW = 7 // /W [1 4 2]: 4-byte offsets — 2 bytes would silently
    // truncate offsets in documents past 64 KB
    val raw = entries.map { case (t, f2, f3) =>
      Array[Int](t,
        ((f2 >> 24) & 0xff).toInt, ((f2 >> 16) & 0xff).toInt,
        ((f2 >> 8) & 0xff).toInt, (f2 & 0xff).toInt,
        ((f3 >> 8) & 0xff).toInt, (f3 & 0xff).toInt)
    }
    // PNG Up filter: row[j] - prevRow[j], tag byte 2
    val filtered = new java.io.ByteArrayOutputStream()
    var prev = new Array[Int](rowW)
    raw.foreach { row =>
      filtered.write(2)
      (0 until rowW).foreach(j => filtered.write((row(j) - prev(j)) & 0xff))
      prev = row
    }
    val xrefData = deflate(new String(filtered.toByteArray,
      java.nio.charset.StandardCharsets.ISO_8859_1))
    sb.append(s"$xrefId 0 obj << /Type /XRef /Size ${xrefId + 1} /W [1 4 2] " +
      s"/Index [0 ${xrefId + 1}] /Root 2 0 R /Info 4 0 R " +
      s"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns $rowW >> " +
      s"/Length ${xrefData.length} >> stream\n")
    sb.append(xrefData)
    sb.append("\nendstream endobj\n")
    sb.append(s"startxref\n$xrefOffset\n%%EOF\n")
    sb.toString
  }
}
