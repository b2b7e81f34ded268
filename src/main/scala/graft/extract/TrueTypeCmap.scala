package graft.extract

import scala.collection.mutable

/** Minimal TrueType `cmap` reader for PDF font-program fallback.
  *
  * Real-world PDFs from modern writers embed a subset TrueType program in
  * the descendant font's /FontFile2 and show text as 2-byte glyph IDs via
  * /Encoding /Identity-H. When the writer also omits /ToUnicode (common
  * for "print" pipelines that never expect copy-paste), the ONLY road back
  * to Unicode inside the file is the font program's own `cmap` table —
  * it maps Unicode → glyph ID, which inverts to glyph ID → Unicode. The
  * reference inherits exactly this fallback from PdfPig's font handling
  * (`pdf/PdfDocumentConverter.cs:39-47`, `page.GetWords` resolves glyphs
  * through the embedded font when no ToUnicode CMap exists).
  *
  * Parses the sfnt table directory and the best Unicode `cmap` subtable
  * (format 12 preferred over format 4, Windows-Unicode platform preferred
  * over Apple-Unicode — the OpenType recommendation). Everything else in
  * the font (glyf, head, ...) is irrelevant to text extraction and is
  * ignored. Byte source is the PDF stream's ISO-8859-1 string (one char
  * per byte), matching the rest of the PDF reader.
  *
  * Hostile-input bounds: any malformed offset aborts to an empty map (the
  * caller falls through to the declared Latin-1/U+FFFD behavior), and the
  * mapping is capped at [[MaxEntries]] codepoints so a crafted font cannot
  * balloon executor memory.
  */
object TrueTypeCmap {

  /** Upper bound on extracted (glyph → unicode) entries. */
  val MaxEntries = 1 << 20

  /** glyph ID → Unicode string for the font program's best Unicode cmap
    * subtable; empty when the program has none (or is malformed). When
    * several codepoints map to one glyph (e.g. space and NBSP unified),
    * the SMALLEST codepoint wins — deterministic across runs.
    */
  def glyphToUnicode(program: String): Map[Int, String] =
    try parse(program)
    catch { case _: RuntimeException => Map.empty }

  private def u8(d: String, i: Int): Int = d.charAt(i) & 0xff
  private def u16(d: String, i: Int): Int = (u8(d, i) << 8) | u8(d, i + 1)
  private def u32(d: String, i: Int): Long =
    (u16(d, i).toLong << 16) | u16(d, i + 2)

  private def parse(d: String): Map[Int, String] = {
    // sfnt offset table: version (0x00010000 / 'true' / 'OTTO'), numTables,
    // then 16-byte table records
    if (d.length < 12) return Map.empty
    val numTables = u16(d, 4)
    var cmapOff = -1
    var t = 0
    while (t < numTables && 12 + 16 * t + 16 <= d.length) {
      val rec = 12 + 16 * t
      if (d.substring(rec, rec + 4) == "cmap") cmapOff = u32(d, rec + 8).toInt
      t += 1
    }
    if (cmapOff < 0 || cmapOff + 4 > d.length) return Map.empty

    // encoding records: pick the best Unicode subtable we can parse
    val n = u16(d, cmapOff + 2)
    var best: Iterator[(Int, Int)] = Iterator.empty
    var bestScore = 0
    var j = 0
    while (j < n && cmapOff + 4 + 8 * j + 8 <= d.length) {
      val rec = cmapOff + 4 + 8 * j
      val plat = u16(d, rec)
      val enc = u16(d, rec + 2)
      val sub = cmapOff + u32(d, rec + 4).toInt
      // OpenType: (3,10)=Windows UCS-4, (0,>=4)=Unicode full, (3,1)=Windows
      // BMP, (0,<4)=Unicode BMP; anything else (symbol, Mac scripts) maps
      // glyphs to private-use or script codes — useless for text recovery
      val score = (plat, enc) match {
        case (3, 10) => 4
        case (0, e) if e >= 4 => 3
        case (3, 1) => 2
        case (0, _) => 1
        case _ => 0
      }
      if (score > bestScore && sub + 2 <= d.length) {
        val it = u16(d, sub) match {
          case 4 => Some(format4(d, sub))
          case 12 => Some(format12(d, sub))
          case _ => None
        }
        it.foreach { v => best = v; bestScore = score }
      }
      j += 1
    }

    val out = mutable.Map.empty[Int, Int]
    best.take(MaxEntries).foreach { case (uni, gid) =>
      if (gid != 0 && uni != 0xffff &&
          out.get(gid).forall(uni < _)) out(gid) = uni
    }
    out.view.mapValues(u => new String(Character.toChars(u))).toMap
  }

  /** Format 4 (segment mapping to delta values): the BMP workhorse. */
  private def format4(d: String, sub: Int): Iterator[(Int, Int)] = {
    val segCount = u16(d, sub + 6) / 2
    val endAt = sub + 14
    val startAt = endAt + 2 * segCount + 2 // +2: reservedPad
    val deltaAt = startAt + 2 * segCount
    val roAt = deltaAt + 2 * segCount
    (0 until segCount).iterator.flatMap { s =>
      val end = u16(d, endAt + 2 * s)
      val start = u16(d, startAt + 2 * s)
      val delta = u16(d, deltaAt + 2 * s)
      val ro = u16(d, roAt + 2 * s)
      if (start > end) Iterator.empty
      else (start to end).iterator.map { uni =>
        val gid =
          if (ro == 0) (uni + delta) & 0xffff
          else {
            // the spec's in-place pointer arithmetic: glyphIdArray index
            // derives from the ADDRESS of this segment's idRangeOffset
            val addr = roAt + 2 * s + ro + 2 * (uni - start)
            val g = u16(d, addr)
            if (g == 0) 0 else (g + delta) & 0xffff
          }
        (uni, gid)
      }
    }
  }

  /** Format 12 (segmented coverage): full-Unicode groups. Range checks
    * stay in Long space — a crafted group with startChar ≥ 2^31 would
    * otherwise overflow an Int subtraction and slip past both guards.
    */
  private def format12(d: String, sub: Int): Iterator[(Int, Int)] = {
    val nGroups = u32(d, sub + 12).toInt
    (0 until nGroups).iterator.flatMap { g =>
      val rec = sub + 16 + 12 * g
      val startChar = u32(d, rec)
      val endChar = u32(d, rec + 4)
      val startGlyph = u32(d, rec + 8)
      if (startChar > endChar || startChar > 0x10ffffL ||
          endChar - startChar > MaxEntries) Iterator.empty
      else (startChar.toInt to math.min(endChar, 0x10ffffL).toInt).iterator
        .map(uni => (uni, (startGlyph + (uni - startChar)).toInt))
    }
  }
}
