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
    */
  def toMarkdown(title: String, spans: Seq[Span]): String = {
    val sb = new StringBuilder
    if (title.nonEmpty) sb.append("# ").append(title).append("\n\n")
    var sectionDepth = 0
    var inCell = false
    var listDepth = 0
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
          listDepth -= 1; if (listDepth == 0) sb.append("\n")
        case "ListItem.Start" => sb.append("- ")
        case "ListItem.End" => ()
        case "Table.Start" => ()
        case "Table.End" => sb.append("|\n\n")
        case "TableHeader.Start" | "TableCell.Start" =>
          inCell = true; sb.append("| ")
        case "TableHeader.End" | "TableCell.End" => inCell = false
        case SpanKinds.TextBlockText =>
          if (inCell) sb.append(s.text).append(' ')
          else if (listDepth > 0) sb.append(s.text).append('\n')
          else sb.append(s.text).append("\n\n")
        case SpanKinds.MediaImage =>
          if (s.media_ref.nonEmpty) sb.append(s"![${s.text}](${s.media_ref})\n")
        case _ => ()
      }
    }
    sb.toString
  }
}
