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

  /** D4 bottom-up non-unique pruning — the reference's `UniqueElements`
    * view (`NLPTextDocument.cs:93-117` + `NLPTextAnalyzer.cs:139-152`
    * ContainsUniqueText rollup): a text block survives iff `isUnique`
    * holds for its content hash; a group survives iff it transitively
    * contains a surviving text block. The markdown/preview renderers
    * render THIS view (the CSV renders everything with an IsUnique
    * column). Media spans don't confer uniqueness but ride along inside
    * surviving groups. Offsets are re-numbered dense.
    */
  def pruneNonUnique(spans: Seq[Span], isUnique: Long => Boolean): Seq[Span] = {
    // one pass to find, for each Start index, its matching End index and
    // whether the group contains a unique text block
    val arr = spans.toVector
    val endOf = new Array[Int](arr.length)
    val containsUnique = new Array[Boolean](arr.length)
    var stack = List.empty[Int]
    arr.zipWithIndex.foreach { case (s, i) =>
      if (SpanKinds.isStart(s.kind)) stack = i :: stack
      else if (SpanKinds.isEnd(s.kind)) {
        val open = stack.head; stack = stack.tail
        endOf(open) = i
      } else if (s.kind == SpanKinds.TextBlockText &&
          isUnique(graft.core.TextStats.textHash(s.text))) {
        stack.foreach(open => containsUnique(open) = true)
      }
    }
    val out = Vector.newBuilder[Span]
    var i = 0
    while (i < arr.length) {
      val s = arr(i)
      if (SpanKinds.isStart(s.kind) && !containsUnique(i)) {
        i = endOf(i) // skip the whole non-unique group
      } else if (s.kind == SpanKinds.TextBlockText &&
          !isUnique(graft.core.TextStats.textHash(s.text))) {
        () // drop non-unique text block
      } else {
        out += s
      }
      i += 1
    }
    out.result().zipWithIndex.map { case (s, j) => s.copy(offset = j) }
  }
}
