package graft.extract

import graft.core.{Span, SpanKinds}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** One document parsed from the reference's legacy `##`-marker text format
  * (S6): document properties, then a stream of element lines and raw text
  * lines (`wordslab.nlptextdoc/NLPTextDocumentReader.cs:12-226`,
  * `NLPTextDocumentFormat.cs:23-44`).
  */
final case class LegacyDoc(
    uri: String,
    title: String,
    timestamp: String,
    metadata: Map[String, String],
    spans: Seq[Span])

/** A parsed legacy file as a Spark row (`path` = source file). */
final case class LegacyDocRow(
    path: String,
    uri: String,
    title: String,
    timestamp: String,
    metadata: Map[String, String],
    spans: Seq[Span])

/** Reader + writer for the legacy NLPTextDocument text serialization.
  *
  * Grammar (from `NLPTextDocumentFormat.cs:23-44`):
  *  - `## NLPTextDocument <Prop> <value>` — document properties (Title,
  *    Uri, Timestamp, `Metadata key=value`), only at the head of the file;
  *  - `## <level> <ElemName> Start [title|coords]` / `## <level>
  *    <ElemName> End` — group boundaries. Section/NavigationList/List/
  *    Table carry an optional title; TableHeader/TableCell carry cell
  *    coordinates `row,col` or `row:rowspan,col:colspan`
  *    (`NLPTextDocumentReader.cs:100-146`);
  *  - `## <level> <List|NavigationList> Items [title] >> a || b || c` —
  *    compact single-line list; expands to ListItem-wrapped text blocks
  *    (`NLPTextDocumentReader.cs:183-216`);
  *  - any other non-empty line — a text block; empty lines are skipped.
  *
  * The nesting level token is written for readability but ignored on read,
  * exactly like the reference reader (it parses the group and never uses
  * it). The legacy format predates the media generalization, so
  * `Media.Image` spans are dropped on write.
  */
object LegacyDocFormat {

  private val Marker = "##"
  private val PropertyPrefix = "## NLPTextDocument "
  private val ItemsStart = ">>"
  private val ItemsSep = "||"

  /** `## <level> <ElemName> <Start|End|Items> ?` anchored at line start —
    * the mirror of `NLPTextDocumentFormat.DOCUMENT_ELEMENT_LINE_REGEX`.
    */
  private val ElemLine =
    """^## ([0-9]+) ([A-Za-z]+) (Start|End|Items) ?""".r

  private val GroupTypes = Set("Section", "NavigationList", "List", "Table")
  private val CellTypes = Set("TableHeader", "TableCell")
  private val KnownTypes = SpanKinds.ElementTypes.toSet

  /** Canonical cell-coordinate text: spans suppress unit row/colspan
    * (`Span.scala` Start-span contract).
    */
  private def cellText(row: Int, rowspan: Int, col: Int, colspan: Int): String =
    if (rowspan == 1 && colspan == 1) s"$row,$col"
    else s"$row:$rowspan,$col:$colspan"

  /** Parse one legacy document. A well-formed element line with an
    * unknown element name or a malformed Items/property line throws
    * `IllegalArgumentException` with the offending line, mirroring the
    * reference's file-format error (`NLPTextDocumentReader.cs:218-224`);
    * a `##`-prefixed line that does not match the element grammar at all
    * is read as a TEXT line (lenient deviation — the reference throws,
    * but that makes text beginning with "##" unrepresentable; valid
    * corpora are unaffected and [[render]]→parse round-trips).
    */
  def parse(lines: Iterator[String]): LegacyDoc = {
    var uri = ""
    var title = ""
    var timestamp = ""
    val metadata = Map.newBuilder[String, String]
    val spans = Vector.newBuilder[Span]
    var offset = 0
    def emit(kind: String, text: String): Unit = {
      spans += Span(kind, text, "", offset)
      offset += 1
    }

    var readingProps = true
    lines.foreach { line =>
      if (line != null && line.nonEmpty) {
        if (readingProps && line.startsWith(PropertyPrefix)) {
          val propAndValue = line.substring(PropertyPrefix.length)
          val sp = propAndValue.indexOf(' ')
          if (sp < 0) throw new IllegalArgumentException(s"bad property line: $line")
          val value = propAndValue.substring(sp + 1).trim
          if (propAndValue.startsWith("Title")) title = value
          else if (propAndValue.startsWith("Uri")) uri = value
          else if (propAndValue.startsWith("Timestamp")) timestamp = value
          else if (propAndValue.startsWith("Metadata")) {
            val eq = value.indexOf('=')
            if (eq < 0) throw new IllegalArgumentException(s"bad metadata line: $line")
            metadata += value.substring(0, eq).trim -> value.substring(eq + 1).trim
          } else throw new IllegalArgumentException(s"bad property line: $line")
        } else {
          readingProps = false
          if (line.startsWith(Marker)) {
            ElemLine.findPrefixMatchOf(line) match {
              case Some(m) =>
                val name = m.group(2)
                val cmd = m.group(3)
                if (!KnownTypes.contains(name))
                  throw new IllegalArgumentException(s"unknown element: $line")
                val rest = line.substring(m.end)
                cmd match {
                  case "Start" =>
                    val text =
                      if (GroupTypes.contains(name)) rest.trim
                      else if (CellTypes.contains(name)) {
                        val coords = rest.trim.split("[,:]")
                        if (coords.length == 2)
                          cellText(coords(0).trim.toInt, 1, coords(1).trim.toInt, 1)
                        else if (coords.length == 4)
                          // legacy order is row,rowspan,col,colspan
                          // (NLPTextDocumentReader.cs:123-128)
                          cellText(coords(0).trim.toInt, coords(1).trim.toInt,
                            coords(2).trim.toInt, coords(3).trim.toInt)
                        else "1,1"
                      } else ""
                    emit(SpanKinds.start(name), text)
                  case "End" =>
                    emit(SpanKinds.end(name), "")
                  case "Items" =>
                    val startOfItems = line.indexOf(ItemsStart)
                    if (startOfItems < 0)
                      throw new IllegalArgumentException(s"bad Items line: $line")
                    val listTitle = line.substring(m.end, startOfItems).trim
                    val listName = if (name == "NavigationList") name else "List"
                    emit(SpanKinds.start(listName), listTitle)
                    line.substring(startOfItems + ItemsStart.length)
                      .split(java.util.regex.Pattern.quote(ItemsSep))
                      .map(_.trim).filter(_.nonEmpty).foreach { item =>
                        emit(SpanKinds.start("ListItem"), "")
                        emit(SpanKinds.TextBlockText, item)
                        emit(SpanKinds.end("ListItem"), "")
                      }
                    emit(SpanKinds.end(listName), "")
                }
              case None =>
                // a "##"-prefixed line that is NOT an element line (e.g. a
                // markdown heading inside crawled text) is a text block —
                // the lenient deviation from the reference reader (which
                // throws) that makes render→parse round-trip total; valid
                // reference corpora never hit this path
                emit(SpanKinds.TextBlockText, line)
            }
          } else {
            emit(SpanKinds.TextBlockText, line)
          }
        }
      }
    }
    LegacyDoc(uri, title, timestamp, metadata.result(), spans.result())
  }

  def parse(content: String): LegacyDoc =
    parse(content.linesIterator)

  /** Serialize a document to the legacy text format. Media spans are
    * dropped (the format predates them); embedded newlines in text become
    * spaces (legacy text blocks are single-line). A text line that ITSELF
    * matches the element/property grammar (e.g. the literal text
    * "## 2 Section End") is unrepresentable — it would parse back as
    * structure — so render THROWS on it rather than corrupt silently;
    * with that single exclusion, render→parse round-trips exactly.
    */
  def render(doc: LegacyDoc): String = {
    val sb = new StringBuilder
    def prop(name: String, value: String): Unit =
      if (value != null && value.nonEmpty)
        sb.append(PropertyPrefix).append(name).append(' ').append(value).append('\n')
    prop("Title", doc.title)
    prop("Uri", doc.uri)
    prop("Timestamp", doc.timestamp)
    doc.metadata.toSeq.sortBy(_._1).foreach { case (k, v) => prop("Metadata", s"$k=$v") }

    var depth = 0
    def oneLine(s: String): String = s.replace('\n', ' ').replace('\r', ' ')
    doc.spans.foreach { s =>
      if (SpanKinds.isStart(s.kind)) {
        depth += 1
        val name = SpanKinds.elementType(s.kind)
        val payload =
          if (CellTypes.contains(name)) {
            // canonical "row,col" / "row:rowspan,col:colspan" →
            // legacy coord order row,rowspan,col,colspan when spans differ
            val parts = s.text.split(',')
            if (parts.length == 2 && parts.exists(_.contains(':'))) {
              val Array(r, rs) = (parts(0).split(':') ++ Array("1")).take(2)
              val Array(c, cs) = (parts(1).split(':') ++ Array("1")).take(2)
              s"$r,$rs,$c,$cs"
            } else s.text
          } else oneLine(s.text)
        sb.append(s"$Marker ${depth + 1} $name Start")
        if (payload.nonEmpty) sb.append(' ').append(payload)
        sb.append('\n')
      } else if (SpanKinds.isEnd(s.kind)) {
        val name = SpanKinds.elementType(s.kind)
        sb.append(s"$Marker ${depth + 1} $name End").append('\n')
        depth -= 1
      } else if (s.kind == SpanKinds.TextBlockText) {
        val line = oneLine(s.text)
        if (ElemLine.findPrefixMatchOf(line).isDefined ||
            line.startsWith(PropertyPrefix))
          throw new IllegalArgumentException(
            s"text not representable in the legacy format (matches its grammar): $line")
        sb.append(line).append('\n')
      } // Media.* spans: no legacy encoding — dropped
    }
    sb.toString
  }
}

/** Spark source for a directory tree of legacy `##` files: the
  * `binaryFile` reader lists and reads files partition-parallel; each
  * partition parses its files locally — no driver fan-in (S6 at scale is
  * "re-ingest an old corpus", a one-file-per-task scan).
  */
object LegacyDocSource {

  /** Read every file under `dir` (recursively) matching `glob` as a legacy
    * document.
    */
  def read(spark: SparkSession, dir: String,
      glob: String = "*.txt"): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val doc = LegacyDocFormat.parse(
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
        LegacyDocRow(path, doc.uri, doc.title, doc.timestamp, doc.metadata, doc.spans)
      }
      .toDF()
  }
}
