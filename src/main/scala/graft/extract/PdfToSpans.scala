package graft.extract

import graft.core.Span
import scala.collection.mutable

/** PDF → spans extraction implementing the REFERENCE'S CONVERSION RULES
  * (`wordslab.webscraper/pdf/PdfDocumentConverter.cs:30-113`) over a
  * minimal uncompressed-PDF text model:
  *
  *  1. per page: text-showing operators → positioned lines → blocks
  *     (consecutive lines whose vertical gap is ≤ 1.3 × line height — the
  *     Docstrum between-line multiplier the reference configures), blocks
  *     in reading order (top-to-bottom, left-to-right);
  *  2. decoration removal across pages when NumberOfPages > 1 (the
  *     reference's `DecorationTextBlockClassifier.Get(...)` + `Except`):
  *     a block whose digit-masked text appears at the same quantized
  *     position on the majority of pages (headers, footers, page numbers)
  *     is dropped;
  *  3. title/section heuristic over the flattened block stream
  *     (`PdfDocumentConverter.cs:62-107`): blocks of ≤ 1 char are skipped;
  *     a block of ≤ 2 lines whose first-line height is > 1.2× the next
  *     block's and > 8 starts a Section; larger titles close open smaller
  *     sections (the reference pops its `titlesLineHeights` stack on
  *     `current / top >= 1.2` but never pushes — an apparent bug that
  *     leaves every section open; we push, so nesting closes as evidently
  *     intended); the LAST block is always a plain text block.
  *
  * No PDF toolkit ships in this container, so the byte-level reader
  * handles the text subset directly: content streams filtered with
  * /FlateDecode (zlib via `java.util.zip.Inflater` — essentially every
  * real-world PDF), /ASCIIHexDecode, /ASCII85Decode, or chains of those
  * (`[/ASCII85Decode /FlateDecode]`), /LZWDecode (TIFF variant,
  * EarlyChange), /RunLengthDecode; PDF 1.5+ object streams (/ObjStm)
  * and cross-reference streams (/XRef, with PNG row predictors);
  * BT..ET text objects with the Tf, Td, TD, TL, T-star, Tm, Tj, quote
  * and TJ operators, and the document-info /Title resolved through the
  * trailer's /Info reference; literal AND `<hex>` string text shows.
  * Image-only filters (DCT, JPX, JBIG2, CCITT) are skipped.
  * Each content stream is one page (the fixture/page-tree simplification;
  * a real toolkit drops in at `extract` without touching the engine).
  */
object PdfToSpans {

  final case class TextLine(x: Double, y: Double, fontSize: Double, text: String)

  final case class Block(lines: Vector[TextLine]) {
    def text: String = lines.map(_.text).mkString(" ")
    def firstLineHeight: Double = lines.head.fontSize
    def xLeft: Double = lines.map(_.x).min
    def yTop: Double = lines.map(_.y).max
  }

  def extract(pdfBytes: Array[Byte]): ExtractedDoc =
    if (pdfBytes == null) ExtractedDoc("", Vector.empty, Vector.empty, noFollow = true)
    else extract(new String(pdfBytes, java.nio.charset.StandardCharsets.ISO_8859_1))

  /** `pdf` is the raw bytes decoded ISO-8859-1 (lossless byte↔char). */
  def extract(pdf: String): ExtractedDoc = {
    if (pdf == null || !pdf.startsWith("%PDF"))
      return ExtractedDoc("", Vector.empty, Vector.empty, noFollow = true)
    // ONE raw-stream scan feeds title resolution, the object catalog, and
    // content extraction (this runs per document inside the extract
    // mapPartitions — a 10 MB PDF must not pay three full-file passes)
    val streams = rawStreams(pdf)
    val title = docTitleIn(pdf, streams)
    val pages = contentStreamsOf(streams).map(parsePage)
    val blocks = removeDecorations(pages).flatten
    ExtractedDoc(title, buildSpans(blocks), Vector.empty, noFollow = true)
  }

  // --- document info -----------------------------------------------------

  private val InfoRefRe = "/Info\\s+(\\d+)\\s+\\d+\\s+R".r

  /** /Title (...) from the info dictionary. Resolution order: follow the
    * trailer's `/Info N 0 R` reference through the object catalog (works
    * when the info dict lives inside a PDF 1.5+ compressed object stream,
    * where a raw byte scan sees nothing), then fall back to the classic
    * raw scan for xref-free fixtures. Escapes \( \) \\ handled.
    */
  def docTitle(pdf: String): String = docTitleIn(pdf, rawStreams(pdf))

  private def docTitleIn(pdf: String, streams: Vector[RawStream]): String = {
    val resolved = for {
      m <- InfoRefRe.findAllMatchIn(pdf).toSeq.lastOption // last trailer wins
      body <- resolveObject(pdf, streams, m.group(1).toInt)
      t = titleIn(body) if t.nonEmpty
    } yield t
    resolved.getOrElse(titleIn(pdf))
  }

  private def titleIn(s: String): String = {
    val i = s.indexOf("/Title")
    if (i < 0) return ""
    val open = s.indexOf('(', i)
    if (open < 0 || open > i + 16) return ""
    parseLiteralString(s, open)._1
  }

  private def parseLiteralString(s: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var i = open + 1
    var depth = 1
    while (i < s.length && depth > 0) {
      s.charAt(i) match {
        case '\\' if i + 1 < s.length =>
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case c => sb.append(c)
          }
          i += 1
        case '(' => depth += 1; sb.append('(')
        case ')' => depth -= 1; if (depth > 0) sb.append(')')
        case c => sb.append(c)
      }
      i += 1
    }
    (sb.toString, i)
  }

  // --- content streams ---------------------------------------------------

  private val FilterNames = "/([A-Za-z0-9]+Decode)".r

  /** zlib-inflate raw stream bytes (the string is the ISO-8859-1 image of
    * the bytes, lossless both ways). None on any malformed input — a broken
    * stream degrades to "no text", never a crash.
    */
  private def inflate(raw: String): Option[String] = {
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(raw.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
      val out = new java.io.ByteArrayOutputStream(math.max(64, raw.length * 4))
      val buf = new Array[Byte](8192)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary())
          throw new java.util.zip.DataFormatException("truncated stream")
      }
      inf.end()
      Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.ISO_8859_1))
    } catch { case _: Exception => None }
  }

  /** One raw stream object: its governing dictionary text and the stream
    * data (both as lossless ISO-8859-1 char images of the bytes).
    */
  private final case class RawStream(dict: String, data: String)

  // the (\s+\d+\s+R)? tail detects an INDIRECT length ("/Length 5 0 R" —
  // common in real PDFs, where the writer backfills the length after the
  // data): the leading digits are an object number, not a byte count
  private val LengthRe = "/Length\\s+(\\d+)(\\s+\\d+\\s+R)?".r

  /** Start of the balanced `<<` that governs the `stream` keyword at
    * `streamKw` (nested dicts — /DecodeParms etc. — handled; a plain
    * `lastIndexOf("<<")` would stop at the innermost one).
    */
  private def dictStart(pdf: String, streamKw: Int): Int = {
    var i = streamKw - 1
    var depth = 0
    while (i >= 1) {
      if (pdf.charAt(i) == '>' && pdf.charAt(i - 1) == '>') { depth += 1; i -= 2 }
      else if (pdf.charAt(i) == '<' && pdf.charAt(i - 1) == '<') {
        depth -= 1
        if (depth == 0) return i - 1
        i -= 2
      } else i -= 1
    }
    -1
  }

  /** All stream objects in byte order. /Length bounds the data exactly —
    * compressed bytes may contain the "endstream" byte sequence by chance,
    * so the keyword alone is not a safe terminator; it IS the fallback
    * when /Length is absent or indirect ("/Length 5 0 R" — resolving the
    * reference from inside the scanner would recurse, and the keyword scan
    * is what correctly handled these before /Length trust existed).
    */
  private def rawStreams(pdf: String): Vector[RawStream] = {
    val out = Vector.newBuilder[RawStream]
    var i = 0
    var done = false
    while (!done) {
      val s = pdf.indexOf("stream", i)
      if (s < 0) done = true
      else {
        val ds = dictStart(pdf, s)
        val dict = if (ds >= 0) pdf.substring(ds, s) else ""
        var b = s + "stream".length
        if (b < pdf.length && pdf.charAt(b) == '\r') b += 1
        if (b < pdf.length && pdf.charAt(b) == '\n') b += 1
        val direct = LengthRe.findFirstMatchIn(dict)
          .filter(_.group(2) == null).map(m => b + m.group(1).toInt)
        val dataEnd = direct.filter(_ <= pdf.length).getOrElse {
          val e = pdf.indexOf("endstream", s)
          if (e < 0) { done = true; b } else e
        }
        if (!done) {
          out += RawStream(dict, pdf.substring(b, dataEnd))
          val endTok = pdf.indexOf("endstream", dataEnd)
          if (endTok < 0) done = true
          else i = endTok + "endstream".length
        }
      }
    }
    out.result()
  }

  /** Decoded data of a stream: the /Filter chain applied in order —
    * /FlateDecode (zlib), /ASCIIHexDecode, /ASCII85Decode, /LZWDecode
    * (honoring /DecodeParms /EarlyChange), /RunLengthDecode, and their
    * chains (e.g. `[/ASCII85Decode /FlateDecode]`, the classic
    * mail-safe wrapping). Image-only filters (DCT, JPX, JBIG2, CCITT) →
    * None — declared limitation, not a crash.
    */
  private def decodedData(st: RawStream): Option[String] = {
    val filters = FilterNames.findAllMatchIn(st.dict).map(_.group(1)).toVector
    filters.foldLeft(Option(st.data)) { (acc, f) =>
      acc.flatMap { d =>
        f match {
          case "FlateDecode" => inflate(d)
          case "ASCIIHexDecode" => asciiHexDecode(d)
          case "ASCII85Decode" => ascii85Decode(d)
          case "LZWDecode" => lzwDecode(d, earlyChangeOf(st.dict))
          case "RunLengthDecode" => runLengthDecode(d)
          case _ => None
        }
      }
    }
  }

  private val EarlyChangeRe = "/EarlyChange\\s+(\\d+)".r

  /** /EarlyChange from a stream dict's /DecodeParms (default 1). */
  private def earlyChangeOf(dict: String): Int =
    EarlyChangeRe.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(1)

  /** /LZWDecode (PDF 32000 §7.4.4, the TIFF variant): MSB-first
    * variable-width codes starting at 9 bits, 256 = clear-table, 257 =
    * end-of-data, new entries from 258, width capped at 12 bits. With
    * `earlyChange` 1 (the spec default) the width grows ONE CODE EARLY
    * (at table size 2^w - 1); /DecodeParms << /EarlyChange 0 >> defers it
    * to 2^w. None on any malformed stream — degrade, never crash.
    */
  private[extract] def lzwDecode(s: String, earlyChange: Int = 1): Option[String] = {
    val out = new StringBuilder
    var table = mutable.ArrayBuffer.empty[String]
    var width = 9
    def reset(): Unit = {
      table = mutable.ArrayBuffer.tabulate(258)(i =>
        if (i < 256) i.toChar.toString else "")
      width = 9
    }
    reset()
    var bitBuf = 0L
    var bitCnt = 0
    var prev: String = null
    var i = 0
    while (i <= s.length) {
      if (bitCnt < width && i < s.length) {
        bitBuf = (bitBuf << 8) | (s.charAt(i) & 0xff)
        bitCnt += 8
        i += 1
      } else if (bitCnt >= width) {
        val code = ((bitBuf >> (bitCnt - width)) & ((1L << width) - 1)).toInt
        bitCnt -= width
        if (code == 257) return Some(out.toString) // EOD
        else if (code == 256) { reset(); prev = null }
        else {
          val entry =
            if (code < table.length) table(code)
            else if (code == table.length && prev != null) prev + prev.charAt(0)
            else return None // out-of-range code: corrupt stream
          out.append(entry)
          if (prev != null && table.length < 4096) table += (prev + entry.charAt(0))
          // earlyChange=1 widens one code before the table index needs it
          if (table.length >= (1 << width) - earlyChange && width < 12) width += 1
          prev = entry
        }
      } else i += 1 // trailing partial byte: pad bits exhausted
    }
    Some(out.toString) // EOD missing: tolerate, like the other decoders
  }

  /** /RunLengthDecode (PDF 32000 §7.4.5): length byte L — 0..127 copies
    * the next L+1 bytes literally, 129..255 repeats the next byte 257-L
    * times, 128 ends the data.
    */
  private[extract] def runLengthDecode(s: String): Option[String] = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val l = s.charAt(i) & 0xff
      if (l == 128) return Some(out.toString) // EOD
      else if (l < 128) {
        if (i + 1 + l + 1 > s.length) return None
        out.append(s.substring(i + 1, i + 1 + l + 1))
        i += 1 + l + 1
      } else {
        if (i + 1 >= s.length) return None
        val c = s.charAt(i + 1)
        var k = 0
        while (k < 257 - l) { out.append(c); k += 1 }
        i += 2
      }
    }
    Some(out.toString)
  }

  /** /ASCIIHexDecode: hex pairs, whitespace ignored, '>' terminates, an
    * odd trailing digit pads with 0 (PDF 32000 §7.4.2). None on a non-hex
    * byte — degrade, never crash.
    */
  private[extract] def asciiHexDecode(s: String): Option[String] = {
    val out = new StringBuilder
    var hi = -1
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '>') i = s.length
      else if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        if (v < 0) return None
        if (hi < 0) hi = v
        else { out.append(((hi << 4) | v).toChar); hi = -1 }
        i += 1
      } else i += 1
    }
    if (hi >= 0) out.append((hi << 4).toChar) // odd digit: low nibble 0
    Some(out.toString)
  }

  /** /ASCII85Decode: 5 chars '!'..'u' → 4 bytes base 85, 'z' = four zero
    * bytes, whitespace ignored, '~>' terminates; a partial final group of
    * n chars pads with 'u' and yields n-1 bytes (PDF 32000 §7.4.3).
    */
  private[extract] def ascii85Decode(s: String): Option[String] = {
    val out = new StringBuilder
    val grp = new Array[Int](5)
    var n = 0
    def flush(count: Int): Boolean = {
      if (count == 1) return false // a 1-char final group is invalid
      var v = 0L
      var i = 0
      while (i < 5) { v = v * 85 + (if (i < count) grp(i) else 84); i += 1 }
      var j = 0
      while (j < count - 1) {
        out.append(((v >> (8 * (3 - j))) & 0xff).toChar)
        j += 1
      }
      true
    }
    var i = 0
    var done = false
    while (i < s.length && !done) {
      val c = s.charAt(i)
      if (c == '~') done = true // '~>' terminator
      else if (c == 'z' && n == 0) out.append("\u0000\u0000\u0000\u0000")
      else if (c >= '!' && c <= 'u') {
        grp(n) = c - '!'
        n += 1
        if (n == 5) { if (!flush(5)) return None; n = 0 }
      } else if (!c.isWhitespace) return None
      i += 1
    }
    if (n > 0 && !flush(n)) return None
    Some(out.toString)
  }

  /** Text content streams in byte order (one per page). PDF 1.5+ metadata
    * streams — /ObjStm object catalogs and /XRef cross-reference streams —
    * are structural, never page content, and their inflated bytes can
    * contain "BT" by chance, so they are excluded here and routed to
    * `objectStreamBodies` / `xrefStreamEntries` instead. The reference's
    * PdfPig reads all of these as a matter of course
    * (`pdf/PdfDocumentConverter.cs:30-47`).
    */
  def contentStreams(pdf: String): Vector[String] =
    contentStreamsOf(rawStreams(pdf))

  private def contentStreamsOf(streams: Vector[RawStream]): Vector[String] =
    streams
      .filterNot(st => st.dict.contains("/ObjStm") || st.dict.contains("/XRef"))
      .flatMap(st => decodedData(st).filter(_.contains("BT")))

  // --- PDF 1.5+ object catalog (xref streams + object streams) ------------

  private val ObjCountRe = "/N\\s+(\\d+)".r
  private val FirstRe = "/First\\s+(\\d+)".r

  /** Bodies of objects embedded in /ObjStm object streams, by object
    * number. An ObjStm is a Flate stream whose head (before /First) is N
    * whitespace-separated (objnum, offset) pairs and whose tail is the
    * concatenated object bodies — PDF 1.5+ writers put the whole
    * non-stream object catalog (info dict, page tree) in these, so a raw
    * byte scan of the file sees none of it.
    */
  def objectStreamBodies(pdf: String): Map[Int, String] =
    objectStreamBodiesOf(rawStreams(pdf))

  private def objectStreamBodiesOf(streams: Vector[RawStream]): Map[Int, String] =
    streams.filter(_.dict.contains("/ObjStm")).flatMap { st =>
      val parsed = for {
        d <- decodedData(st)
        n <- ObjCountRe.findFirstMatchIn(st.dict).map(_.group(1).toInt)
        first <- FirstRe.findFirstMatchIn(st.dict).map(_.group(1).toInt)
        if first <= d.length
      } yield {
        val header = d.substring(0, first).trim.split("\\s+")
          .filter(_.nonEmpty).flatMap(_.toIntOption)
        val pairs = header.grouped(2).collect { case Array(num, off) => (num, off) }
          .toVector.take(n)
        pairs.zipWithIndex.map { case ((num, off), i) =>
          val start = math.min(first + off, d.length)
          val end =
            if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, d.length)
            else d.length
          num -> d.substring(start, math.max(start, end))
        }
      }
      parsed.getOrElse(Vector.empty)
    }.toMap

  private val WidthsRe = "/W\\s*\\[([^\\]]*)\\]".r
  private val IndexRe = "/Index\\s*\\[([^\\]]*)\\]".r
  private val SizeRe = "/Size\\s+(\\d+)".r
  private val PredictorRe = "/Predictor\\s+(\\d+)".r

  /** Entries of /XRef cross-reference streams: objnum → (type, f2, f3).
    * type 1 = regular object at byte offset f2; type 2 = object number
    * f3-th inside object stream f2; type 0 = free. Handles the /W field
    * widths, /Index subsection runs, and the PNG row predictors
    * (/Predictor 10-15: None/Sub/Up) real writers emit.
    */
  def xrefStreamEntries(pdf: String): Map[Int, (Int, Long, Long)] =
    xrefStreamEntriesOf(rawStreams(pdf))

  private def xrefStreamEntriesOf(
      streams: Vector[RawStream]): Map[Int, (Int, Long, Long)] =
    streams.filter(_.dict.contains("/XRef")).flatMap { st =>
      val parsed = for {
        d0 <- decodedData(st)
        w <- WidthsRe.findFirstMatchIn(st.dict).map(
          _.group(1).trim.split("\\s+").flatMap(_.toIntOption).toVector)
        if w.length == 3
      } yield {
        val rowW = w.sum
        val predictor = PredictorRe.findFirstMatchIn(st.dict)
          .map(_.group(1).toInt).getOrElse(1)
        val bytes = d0.toCharArray.map(c => (c & 0xff).toByte)
        val rows: Vector[Array[Int]] =
          if (predictor >= 10) unPng(bytes, rowW)
          else bytes.grouped(rowW).filter(_.length == rowW)
            .map(_.map(_ & 0xff)).toVector
        val index: Vector[(Int, Int)] = IndexRe.findFirstMatchIn(st.dict)
          .map(_.group(1).trim.split("\\s+").flatMap(_.toIntOption).toVector)
          .map(_.grouped(2).collect { case Vector(s0, c0) => (s0, c0) }.toVector)
          .getOrElse {
            val size = SizeRe.findFirstMatchIn(st.dict)
              .map(_.group(1).toInt).getOrElse(rows.length)
            Vector((0, size))
          }
        var rowIdx = 0
        val out = Vector.newBuilder[(Int, (Int, Long, Long))]
        index.foreach { case (start, count) =>
          var k = 0
          while (k < count && rowIdx < rows.length) {
            val r = rows(rowIdx)
            def field(off: Int, len: Int): Long = {
              var v = 0L; var j = 0
              while (j < len) { v = (v << 8) | r(off + j); j += 1 }
              v
            }
            // a zero-width type field defaults to type 1 (PDF 32000 §7.5.8.2)
            val t = if (w(0) == 0) 1 else field(0, w(0)).toInt
            out += ((start + k, (t, field(w(0), w(1)), field(w(0) + w(1), w(2)))))
            rowIdx += 1; k += 1
          }
        }
        out.result()
      }
      parsed.getOrElse(Vector.empty)
    }.toMap

  /** Undo a PNG row predictor: each (1 + rowW)-byte row leads with a
    * filter tag (0 None, 1 Sub, 2 Up — what PDF writers use).
    */
  private def unPng(bytes: Array[Byte], rowW: Int): Vector[Array[Int]] = {
    val rows = Vector.newBuilder[Array[Int]]
    var prev = new Array[Int](rowW)
    var i = 0
    while (i + rowW < bytes.length) {
      val tag = bytes(i) & 0xff
      val row = new Array[Int](rowW)
      var j = 0
      while (j < rowW) {
        val raw = bytes(i + 1 + j) & 0xff
        row(j) = tag match {
          case 0 => raw
          case 1 => (raw + (if (j > 0) row(j - 1) else 0)) & 0xff
          case 2 => (raw + prev(j)) & 0xff
          case _ => raw // unsupported PNG filter: best-effort pass-through
        }
        j += 1
      }
      rows += row
      prev = row
      i += 1 + rowW
    }
    rows.result()
  }

  /** Body text of object `num`: the xref stream's entry when one exists
    * (type 1 → parse at its byte offset; type 2 → the object-stream
    * catalog), else a top-level "num gen obj" scan, else the ObjStm
    * catalog (xref-free fixtures).
    */
  private def resolveObject(pdf: String, streams: Vector[RawStream],
      num: Int): Option[String] = {
    def topLevelAt(from: Int): Option[String] = {
      val re = ("(?<![0-9])" + num + "\\s+\\d+\\s+obj").r
      // LAST definition wins: an incremental update appends a replacement
      // object at the end of the file (PDF 32000 §7.5.6)
      re.findAllMatchIn(pdf.substring(from)).toSeq.lastOption.map { m =>
        val start = from + m.end
        val end = pdf.indexOf("endobj", start)
        pdf.substring(start, if (end < 0) pdf.length else end)
      }
    }
    xrefStreamEntriesOf(streams).get(num) match {
      case Some((1, off, _)) if off < pdf.length => topLevelAt(off.toInt)
      case Some((2, _, _)) => objectStreamBodiesOf(streams).get(num)
      case _ => topLevelAt(0).orElse(objectStreamBodiesOf(streams).get(num))
    }
  }

  // --- page parsing: text operators → lines → blocks ----------------------

  /** Interpret the text operators of one content stream into layout blocks. */
  def parsePage(content: String): Vector[Block] = {
    val shows = mutable.ArrayBuffer.empty[TextLine]
    var tx = 0.0; var ty = 0.0
    var fontSize = 12.0
    var leading = 14.4
    val toks = tokenize(content)
    var i = 0
    def num(j: Int): Double = toks(j).toDoubleOption.getOrElse(0.0)
    def show(text: String): Unit =
      if (text.nonEmpty) {
        // consecutive shows on one baseline concatenate (glyph continuation)
        val at = shows.lastIndexWhere(l => l.y == ty)
        if (at >= 0 && shows(at).y == ty && at == shows.length - 1)
          shows(at) = shows(at).copy(text = shows(at).text + text)
        else shows += TextLine(tx, ty, fontSize, text)
      }
    while (i < toks.length) {
      toks(i) match {
        case "Tf" if i >= 1 => fontSize = num(i - 1); leading = fontSize * 1.2
        case "TL" if i >= 1 => leading = num(i - 1)
        case "Td" if i >= 2 => tx += num(i - 2); ty += num(i - 1)
        case "TD" if i >= 2 => leading = -num(i - 1); tx += num(i - 2); ty += num(i - 1)
        case "Tm" if i >= 6 => tx = num(i - 2); ty = num(i - 1)
        case "T*" => ty -= leading
        case "Tj" if i >= 1 => show(stringTok(toks(i - 1)))
        case "'" if i >= 1 => ty -= leading; show(stringTok(toks(i - 1)))
        case "TJ" if i >= 1 => show(stringTok(toks(i - 1))) // array folded by tokenizer
        case "BT" => tx = 0.0; ty = 0.0
        case _ =>
      }
      i += 1
    }
    linesToBlocks(shows.toVector)
  }

  private def stringTok(t: String): String =
    if (t.startsWith("\u0000S")) t.substring(2) else ""

  /** `<48656C6C6F>` hex string starting at `open` ('<') -> Some(decoded
    * text, index after '>'); None when the bracketed content is NOT a
    * spec-valid hex string (anything but hex digits + whitespace before
    * '>', or no '>' at all — PDF 32000 §7.3.4.3), so a lone '<' inside a
    * dict (`<</MCID 0>>`) or binary data never swallows page text: the
    * tokenizer falls back to treating the '<' as an ordinary char. An odd
    * final digit pads with 0. The decoded bytes are treated as
    * single-byte text — the simple-font case; CID/multi-byte encodings
    * need a font toolkit and stay out of scope.
    */
  private def parseHexString(s: String, open: Int): Option[(String, Int)] = {
    val sb = new StringBuilder
    var hi = -1
    var i = open + 1
    while (i < s.length && s.charAt(i) != '>') {
      val c = s.charAt(i)
      if (!c.isWhitespace) {
        val v = Character.digit(c, 16)
        if (v < 0) return None // not a hex string after all
        if (hi < 0) hi = v
        else { sb.append(((hi << 4) | v).toChar); hi = -1 }
      }
      i += 1
    }
    if (i >= s.length) return None // unterminated: binary '<', not a string
    if (hi >= 0) sb.append((hi << 4).toChar)
    Some((sb.toString, i + 1))
  }

  /** Tokenizer: literal and hex strings collapse to one token tagged with
    * a NUL+S prefix (TJ arrays fold their strings together, positioning
    * numbers ignored).
    */
  private def tokenize(content: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = content.length
    val cur = new StringBuilder
    def flush(): Unit = { if (cur.nonEmpty) { out += cur.toString; cur.clear() } }
    while (i < n) {
      content.charAt(i) match {
        case '(' =>
          flush()
          val (s, next) = parseLiteralString(content, i)
          out += ("\u0000S" + s)
          i = next - 1
        case '<' if i + 1 < n && content.charAt(i + 1) != '<' &&
            (i == 0 || content.charAt(i - 1) != '<') =>
          // hex string shown as text: <48656C6C6F> Tj — real writers emit
          // these for simple fonts as readily as literal strings. The
          // prev/next guards skip both '<' of a '<<' dict open, and a
          // failed strict parse falls through to the default case
          parseHexString(content, i) match {
            case Some((s, next)) =>
              flush()
              out += ("\u0000S" + s)
              i = next - 1
            case None => cur.append('<')
          }
        case '[' =>
          flush()
          // TJ array: concatenate its literal and hex strings
          val sb = new StringBuilder
          var j = i + 1
          while (j < n && content.charAt(j) != ']') {
            if (content.charAt(j) == '(') {
              val (s, next) = parseLiteralString(content, j)
              sb.append(s); j = next
            } else if (content.charAt(j) == '<') {
              parseHexString(content, j) match {
                case Some((s, next)) => sb.append(s); j = next
                case None => j += 1
              }
            } else j += 1
          }
          out += ("\u0000S" + sb.toString)
          i = j
        case c if c == ' ' || c == '\n' || c == '\r' || c == '\t' => flush()
        case c => cur.append(c)
      }
      i += 1
    }
    flush()
    out.result()
  }

  /** Reading order (top-to-bottom, left-to-right), then group consecutive
    * lines into blocks when the vertical gap ≤ 1.3 × line height (the
    * reference's Docstrum between-line multiplier).
    */
  def linesToBlocks(lines: Vector[TextLine]): Vector[Block] = {
    if (lines.isEmpty) return Vector.empty
    val ordered = lines.sortBy(l => (-l.y, l.x))
    val blocks = Vector.newBuilder[Block]
    var cur = Vector(ordered.head)
    ordered.tail.foreach { l =>
      val prev = cur.last
      val gap = prev.y - l.y
      if (gap >= 0 && gap <= 1.3 * math.max(prev.fontSize, l.fontSize)) cur :+= l
      else { blocks += Block(cur); cur = Vector(l) }
    }
    blocks += Block(cur)
    blocks.result()
  }

  // --- decoration removal (J5/Except; DecorationTextBlockClassifier) ------

  /** Digit-masked text + quantized position key: page numbers/headers/
    * footers repeat at the same spot with only digits changing.
    */
  private def decorationKey(b: Block): (String, Long, Long) =
    (b.text.replaceAll("[0-9]", "#"),
      math.round(b.yTop / 10.0), math.round(b.xLeft / 10.0))

  /** Drop blocks whose key recurs on the majority of pages (> 1 page). */
  def removeDecorations(pages: Vector[Vector[Block]]): Vector[Vector[Block]] = {
    if (pages.length <= 1) return pages
    val pageCountByKey = pages.zipWithIndex
      .flatMap { case (bs, p) => bs.map(b => (decorationKey(b), p)) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }
    val threshold = math.max(2, (pages.length + 1) / 2)
    pages.map(_.filterNot(b => pageCountByKey(decorationKey(b)) >= threshold))
  }

  // --- section/title heuristic (PdfDocumentConverter.cs:62-107) -----------

  def buildSpans(blocks: Vector[Block]): Vector[Span] = {
    val spans = Vector.newBuilder[Span]
    var off = 0
    def emit(kind: String, text: String): Unit = {
      spans += Span(kind, text, "", off); off += 1
    }
    val titleHeights = mutable.Stack.empty[Double]
    var idx = 0
    while (idx < blocks.length - 1) {
      val b = blocks(idx)
      if (b.text.trim.length > 1) { // rule: ignore one-char blocks
        val isTitle = b.lines.length <= 2 && {
          val nextH = blocks(idx + 1).firstLineHeight
          b.firstLineHeight / nextH > 1.2 && b.firstLineHeight > 8
        }
        if (isTitle) {
          while (titleHeights.nonEmpty && b.firstLineHeight / titleHeights.top >= 1.2) {
            titleHeights.pop(); emit("Section.End", "")
          }
          emit("Section.Start", b.text)
          titleHeights.push(b.firstLineHeight)
        } else emit("TextBlock.Text", b.text)
      }
      idx += 1
    }
    blocks.lastOption.foreach(b => emit("TextBlock.Text", b.text))
    while (titleHeights.nonEmpty) { titleHeights.pop(); emit("Section.End", "") }
    spans.result()
  }
}
