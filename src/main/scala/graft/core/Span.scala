package graft.core

/** One interleaved text/media span of a document, in depth-first emission
  * order. This is the flattened row encoding of the reference's
  * NLPTextDocument tree: one span per "tree event", mirroring the CSV
  * dataframe rows of `wordslab.nlptextdoc/NLPTextDocumentWriter.cs:47-48,356-458`.
  *
  *  - `kind` = "{DocEltType}.{Cmd}" over the 8 element types of
  *    `wordslab.nlptextdoc/DocumentElements.cs:7-17` with commands
  *    {Start, End, Text}, plus the media generalization "Media.Image".
  *  - group Start spans carry the group title (Section/List/Table) or the
  *    cell coordinates "row,col" / "row:rowspan,col:colspan"
  *    (TableHeader/TableCell) in `text`, exactly like the reference CSV
  *    Start rows (`NLPTextDocumentWriter.cs:356-386`).
  *  - `media_ref` is the image src for kind == "Media.Image", else "".
  *  - `offset` is the dense 0-based ordinal in document order.
  *
  * Dropping all "Media.Image" spans yields exactly the reference's row
  * sequence (the reference folds `alt` text into the enclosing text block
  * and discards `src`, `html/HtmlDocumentConverter.cs:607-618`; we do the
  * same fold AND emit the media span additively).
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

object SpanKinds {
  val ElementTypes: Seq[String] = Seq(
    "Section", "NavigationList", "List", "ListItem",
    "Table", "TableHeader", "TableCell", "TextBlock")

  val MediaImage = "Media.Image"
  val TextBlockText = "TextBlock.Text"

  def start(tpe: String): String = s"$tpe.Start"
  def end(tpe: String): String = s"$tpe.End"

  def isStart(kind: String): Boolean = kind.endsWith(".Start")
  def isEnd(kind: String): Boolean = kind.endsWith(".End")
  def elementType(kind: String): String = kind.takeWhile(_ != '.')
}

object SpanTree {

  /** Validates the structural invariants of a span sequence (FIXTURES.md §1):
    * dense offsets, balanced + properly nested Start/End pairs, and no
    * TextBlock directly inside List/NavigationList/Table (builder guard,
    * `wordslab.nlptextdoc/NLPTextDocumentBuilder.cs:56-65`).
    * Returns the list of violations (empty = valid).
    */
  def validate(spans: Seq[Span]): Seq[String] = {
    val errs = Seq.newBuilder[String]
    spans.zipWithIndex.foreach { case (s, i) =>
      if (s.offset != i) errs += s"offset ${s.offset} at index $i is not dense"
    }
    var stack = List.empty[String]
    spans.foreach { s =>
      if (SpanKinds.isStart(s.kind)) {
        stack = SpanKinds.elementType(s.kind) :: stack
      } else if (SpanKinds.isEnd(s.kind)) {
        stack match {
          case top :: rest if top == SpanKinds.elementType(s.kind) => stack = rest
          case top :: _ => errs += s"End ${s.kind} closes $top at offset ${s.offset}"
          case Nil => errs += s"unbalanced End ${s.kind} at offset ${s.offset}"
        }
      } else if (s.kind == SpanKinds.TextBlockText) {
        stack.headOption match {
          case Some(t) if t == "List" || t == "NavigationList" || t == "Table" =>
            errs += s"TextBlock directly inside $t at offset ${s.offset}"
          case _ =>
        }
      }
    }
    stack.foreach(t => errs += s"unclosed $t")
    errs.result()
  }

  /** The reference-parity projection: drop the Media.Image generalization
    * and re-number offsets, yielding exactly the row sequence the reference
    * CSV writer would emit for the same document.
    */
  def referenceRows(spans: Seq[Span]): Seq[Span] =
    spans.filterNot(_.kind == SpanKinds.MediaImage)
      .zipWithIndex.map { case (s, i) => s.copy(offset = i) }
}
