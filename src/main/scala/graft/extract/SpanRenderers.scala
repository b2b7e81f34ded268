package graft.extract

import graft.core.{Span, SpanKinds, TextStats}

/** Deterministic `spans → text` renderers — the reference's per-document
  * file writers (`wordslab.nlptextdoc/NLPTextDocumentWriter.cs`) re-expressed
  * as pure functions over the span encoding, exportable via `df.write` or a
  * UDF column (SURVEY.md §2.1 S5).
  */
object SpanRenderers {

  /** CSV dataframe format — the reference's row encoding
    * (`NLPTextDocumentWriter.cs:47-48,356-458`):
    * `DocEltType;DocEltCmd;NestingLevel;Text;Lang;Chars;Words;AvgWordsLength;
    *  LetterChars;NumberChars;OtherChars;HashCode;IsUnique`
    * Media spans are dropped (reference parity projection); nesting level is
    * reconstructed from Start/End pairing (level 1 = document).
    */
  def toCsv(docUri: String, title: String, spans: Seq[Span],
      isUnique: Long => Boolean = _ => true): String = {
    val sb = new StringBuilder
    sb.append("DocEltType;DocEltCmd;NestingLevel;Text;Lang;Chars;Words;AvgWordsLength;LetterChars;NumberChars;OtherChars;HashCode;IsUnique\n")
    sb.append("Document;Start;1;;;;;;;;;;\n")
    var level = 1
    def csvQuote(s: String): String = "\"" + s.replace("\"", "\"\"") + "\""
    def statsCols(text: String): String = {
      val st = TextStats.of(text)
      val h = TextStats.textHash(text)
      val lang = graft.core.LangId.detect(text)
      s";$lang;${st.chars};${st.words};${st.avgWordLength};${st.letterChars};${st.numberChars};${st.otherChars};$h;${isUnique(h)}"
    }
    graft.core.SpanTree.referenceRows(spans).foreach { s =>
      if (SpanKinds.isStart(s.kind)) {
        val tpe = SpanKinds.elementType(s.kind)
        sb.append(s"$tpe;Start;$level;${csvQuote(s.text)};;;;;;;;;\n")
        level += 1
      } else if (SpanKinds.isEnd(s.kind)) {
        level -= 1
        sb.append(s"${SpanKinds.elementType(s.kind)};End;$level;;;;;;;;;;\n")
      } else if (s.kind == SpanKinds.TextBlockText) {
        sb.append(s"TextBlock;Text;$level;${csvQuote(s.text)}${statsCols(s.text)}\n")
      }
    }
    sb.append("Document;End;1;;;;;;;;;;\n")
    sb.toString
  }

  /** Markdown text rendering — section titles as `#` headers by nesting
    * depth, list items as `- `, tables as `|`-rows, text blocks as
    * paragraphs (behavioral analog of the MarkdownText writer,
    * `NLPTextDocumentWriter.cs:300-470`). Media spans render as
    * `![alt](src)` — the interleaved generalization.
    *
    * Like the reference, markdown renders the UNIQUE view (D4 pruning,
    * `doc.UniqueElements`): pass `isUnique` to drop duplicated text blocks
    * and groups with no unique text. The default keeps everything.
    */
  def toMarkdown(title: String, spans: Seq[Span],
      isUnique: Long => Boolean): String =
    toMarkdown(title, graft.core.SpanTree.pruneNonUnique(spans, isUnique))

  /** Row number of a cell-coordinate Start text ("row,col" or
    * "row:rowspan,col:colspan"); 1 when unparseable.
    */
  private def cellRowNum(coords: String): Int = {
    val parts = coords.split(',')
    if (parts.length != 2) 1
    else parts(0).split(':')(0).toIntOption.getOrElse(1)
  }

  /** Buffered markdown table state: rows break when the cell coordinate's
    * ROW number changes (col==1 is not a reliable row marker — a rowspan
    * continuation occupies column 1, so the next row's first cell starts
    * at col 2) and a GFM header separator row follows a leading
    * TableHeader row, so the output round-trips through a GFM parser
    * (unlike the reference's one-line rendering — documented improvement).
    */
  private final class MdTable {
    private val rows = Vector.newBuilder[(Boolean, Vector[String])]
    private var row: Vector[String] = Vector.empty
    private var rowIsHeader = false
    private var lastRow = Int.MinValue
    var cell: StringBuilder = _
    def startCell(coords: String, isHeader: Boolean): Unit = {
      val rowNum = cellRowNum(coords)
      if (rowNum != lastRow && row.nonEmpty) {
        rows += ((rowIsHeader, row)); row = Vector.empty
      }
      lastRow = rowNum
      if (row.isEmpty) rowIsHeader = isHeader
      cell = new StringBuilder
    }
    def endCell(): Unit = {
      // '|' would split the cell into extra GFM columns and a newline would
      // end the row — escape/collapse so the table round-trips a GFM parser
      if (cell != null) {
        row :+= cell.toString.trim.replace("\n", " ").replace("|", "\\|")
        cell = null
      }
    }
    /** Late content for a row whose cell already closed (malformed nesting:
      * an inner table ending after its host cell) — lands in that cell
      * instead of leaking outside the table.
      */
    def appendToLastCell(text: String): Unit = {
      val t = text.trim.replace("\n", " ").replace("|", "\\|")
      if (t.isEmpty) ()
      else if (cell != null) cell.append(' ').append(text)
      else if (row.nonEmpty) row = row.init :+ (row.last + " " + t)
      else row :+= t
    }
    def render(): String = {
      if (row.nonEmpty) { rows += ((rowIsHeader, row)); row = Vector.empty }
      val all = rows.result()
      if (all.isEmpty) return ""
      val ncols = all.map(_._2.size).max
      def line(cells: Vector[String]): String =
        (cells ++ Vector.fill(ncols - cells.size)(""))
          .mkString("| ", " | ", " |\n")
      val out = new StringBuilder
      out.append(line(all.head._2))
      if (all.head._1)
        out.append(Vector.fill(ncols)("---").mkString("| ", " | ", " |\n"))
      all.tail.foreach(r => out.append(line(r._2)))
      out.append('\n')
      out.toString
    }
  }

  def toMarkdown(title: String, spans: Seq[Span]): String = {
    val sb = new StringBuilder
    if (title.nonEmpty) sb.append("# ").append(title).append("\n\n")
    var sectionDepth = 0
    var listDepth = 0
    var tables = List.empty[MdTable] // stack: nested tables render into the outer cell
    def activeCell: Option[StringBuilder] =
      tables.headOption.flatMap(t => Option(t.cell))
    def out(text: String): Unit = activeCell match {
      case Some(c) => (if (c.nonEmpty) c.append(' ') else c).append(text)
      case None => sb.append(text)
    }
    spans.foreach { s =>
      s.kind match {
        case "Section.Start" =>
          sectionDepth += 1
          if (s.text.nonEmpty)
            sb.append("#" * math.min(6, sectionDepth + 1)).append(' ')
              .append(s.text).append("\n\n")
        case "Section.End" => sectionDepth -= 1
        case "List.Start" | "NavigationList.Start" => listDepth += 1
        case "List.End" | "NavigationList.End" =>
          listDepth -= 1; if (listDepth == 0 && tables.isEmpty) sb.append("\n")
        case "ListItem.Start" => if (tables.isEmpty) sb.append("- ")
        case "ListItem.End" => ()
        case "Table.Start" => tables ::= new MdTable
        case "Table.End" =>
          tables match {
            case t :: rest =>
              tables = rest
              val text = t.render()
              activeCell match {
                case Some(c) => c.append(' ').append(text.replace('\n', ' ').trim)
                case None => tables match {
                  // outer table still open but its cell already closed:
                  // route into that row, never outside the table
                  case outer :: _ => outer.appendToLastCell(text)
                  case Nil => sb.append(text)
                }
              }
            case Nil => ()
          }
        case "TableHeader.Start" =>
          tables.headOption.foreach(_.startCell(s.text, isHeader = true))
        case "TableCell.Start" =>
          tables.headOption.foreach(_.startCell(s.text, isHeader = false))
        case "TableHeader.End" | "TableCell.End" =>
          tables.headOption.foreach(_.endCell())
        case SpanKinds.TextBlockText =>
          if (activeCell.nonEmpty) out(s.text)
          // text inside an open table whose cell already closed (stray text
          // node under <table>/<tr>): land in the last row, never outside
          else if (tables.nonEmpty) tables.head.appendToLastCell(s.text)
          else if (listDepth > 0) sb.append(s.text).append('\n')
          else sb.append(s.text).append("\n\n")
        case SpanKinds.MediaImage =>
          if (s.media_ref.nonEmpty) {
            out(s"![${s.text}](${s.media_ref})")
            if (activeCell.isEmpty) sb.append('\n')
          }
        case _ => ()
      }
    }
    sb.toString
  }

  private def htmlEncode(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** preview.html rendering — the reference's HtmlPreview writer
    * (`NLPTextDocumentWriter.cs:39-120,239-303,482-485`): bootstrap-styled
    * standalone page with the source URI as a link button; Sections as
    * `<h{level}>`, lists as `<ul>/<li>`, tables as `<table>/<tr>/<th>/<td>`
    * with rowspan/colspan from the cell-coordinate Start text, text blocks
    * as `<div class="p-2">`. Renders the UNIQUE view (D4), like the
    * reference's `doc.UniqueElements`.
    */
  def toPreviewHtml(docUri: String, title: String, spans: Seq[Span],
      isUnique: Long => Boolean = _ => true): String = {
    val pruned = graft.core.SpanTree.pruneNonUnique(spans, isUnique)
    val sb = new StringBuilder
    sb.append("<!doctype html>\n<html>\n<head>\n")
    sb.append(s"<title>${htmlEncode(title)}</title>\n")
    sb.append(s"""<meta name="Uri" content="${htmlEncode(docUri)}">""").append('\n')
    sb.append("<meta name=\"viewport\" content=\"width=device-width, initial-scale=1\">\n")
    sb.append("<link href=\"https://cdn.jsdelivr.net/npm/bootstrap@5.3.2/dist/css/bootstrap.min.css\" rel=\"stylesheet\">\n")
    sb.append("</head>\n<body>\n")
    sb.append(s"""<div class="p-2 "><a href="${htmlEncode(docUri)}" class="btn btn-primary" target="_blank">${htmlEncode(docUri)}</a></div>""").append('\n')
    var level = 1
    // per-table last row number (stack: tables nest inside cells); a <tr>
    // opens when the cell's ROW coordinate changes — col==1 is not a
    // reliable row marker, a rowspan continuation occupies column 1 and
    // the next row's first cell then starts at col 2
    var rowStack = List.empty[Int]
    // cell coords text: "row,col" or "row:rowspan,col:colspan"
    def cellAttrs(coords: String): (Int, String) = {
      val parts = coords.split(',')
      if (parts.length != 2) return (1, "")
      def split(p: String): (Int, Int) = {
        val rc = p.split(':')
        (rc(0).toIntOption.getOrElse(1),
          if (rc.length > 1) rc(1).toIntOption.getOrElse(1) else 1)
      }
      val (rowNum, rowSpan) = split(parts(0))
      val (_, colSpan) = split(parts(1))
      val attrs = (if (rowSpan > 1) s""" rowspan="$rowSpan"""" else "") +
        (if (colSpan > 1) s""" colspan="$colSpan"""" else "")
      (rowNum, attrs)
    }
    def startCell(coords: String): String = {
      val (rowNum, attrs) = cellAttrs(coords)
      rowStack match {
        case top :: rest if top != rowNum =>
          if (top != -1) sb.append("</tr>\n")
          sb.append("<tr>\n")
          rowStack = rowNum :: rest
        case _ =>
      }
      attrs
    }
    pruned.foreach { s =>
      s.kind match {
        case "Section.Start" =>
          val h = math.min(6, level)
          sb.append(s"<h$h>${htmlEncode(s.text)}</h$h>\n"); level += 1
        case "Section.End" => level -= 1
        case "List.Start" | "NavigationList.Start" =>
          val t = if (s.text.nonEmpty) s""" title="${htmlEncode(s.text)}"""" else ""
          sb.append(s"<ul$t>\n"); level += 1
        case "List.End" | "NavigationList.End" => sb.append("</ul>\n"); level -= 1
        case "ListItem.Start" => sb.append("<li>\n"); level += 1
        case "ListItem.End" => sb.append("</li>\n"); level -= 1
        case "Table.Start" =>
          val t = if (s.text.nonEmpty) s""" title="${htmlEncode(s.text)}"""" else ""
          sb.append(s"<table$t>\n"); level += 1
          rowStack = -1 :: rowStack
        case "Table.End" =>
          rowStack match {
            case top :: rest =>
              if (top != -1) sb.append("</tr>\n")
              rowStack = rest
            case Nil =>
          }
          sb.append("</table>\n"); level -= 1
        case "TableHeader.Start" =>
          val attrs = startCell(s.text)
          sb.append(s"<th$attrs>\n"); level += 1
        case "TableHeader.End" => sb.append("</th>\n"); level -= 1
        case "TableCell.Start" =>
          val attrs = startCell(s.text)
          sb.append(s"<td$attrs>\n"); level += 1
        case "TableCell.End" => sb.append("</td>\n"); level -= 1
        case SpanKinds.TextBlockText =>
          sb.append(s"""<div class="p-2">${htmlEncode(s.text)}</div>""").append('\n')
        case SpanKinds.MediaImage =>
          if (s.media_ref.nonEmpty)
            sb.append(s"""<img class="p-2" src="${htmlEncode(s.media_ref)}" alt="${htmlEncode(s.text)}">""").append('\n')
        case _ => ()
      }
    }
    sb.append("</body>\n</html>\n")
    sb.toString
  }
}
