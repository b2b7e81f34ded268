package graft

import graft.extract.{HtmlToSpans, SpanRenderers}
import org.scalatest.funsuite.AnyFunSuite

class RendererSpec extends AnyFunSuite {

  private val html =
    """<html><head><title>Doc Title</title></head><body>
      |<h2>Intro</h2>
      |<p>First paragraph.</p>
      |<ul><li>item one</li><li>item two</li></ul>
      |<table><tr><th>H</th></tr><tr><td>C</td></tr></table>
      |<p>before <img src="/i.png" alt="pic"> after</p>
      |</body></html>""".stripMargin

  test("CSV renderer matches the reference dataframe format shape") {
    val d = HtmlToSpans.extract(html)
    val csv = SpanRenderers.toCsv("https://x/", d.title, d.spans)
    val lines = csv.split("\n")
    assert(lines(0).startsWith("DocEltType;DocEltCmd;NestingLevel;Text;Lang"))
    assert(lines(1) == "Document;Start;1;;;;;;;;;;")
    assert(lines.last == "Document;End;1;;;;;;;;;;")
    // section start carries the title at level 1, contents at level 2
    assert(lines.exists(_.startsWith("Section;Start;1;\"Intro\"")))
    assert(lines.exists(_.startsWith("TextBlock;Text;2;\"First paragraph.\"")))
    // media spans are dropped in the reference projection: alt folded in text
    assert(!csv.contains("Media"))
    assert(lines.exists(_.contains("\"before pic after\"")))
    // stats columns populated for text rows (words of "First paragraph.")
    val first = lines.find(_.contains("First paragraph.")).get
    val cols = first.split(";")
    assert(cols(6) == "2") // Words
    // start/end balanced per type
    def count(p: String) = lines.count(_.startsWith(p))
    assert(count("Section;Start") == count("Section;End"))
    assert(count("List;Start") == count("List;End"))
    assert(count("TableCell;Start") == count("TableCell;End"))
  }

  test("markdown renderer: headers, lists, tables, images") {
    val d = HtmlToSpans.extract(html)
    val md = SpanRenderers.toMarkdown(d.title, d.spans)
    assert(md.startsWith("# Doc Title"))
    assert(md.contains("## Intro"))
    assert(md.contains("First paragraph.\n"))
    assert(md.contains("- item one"))
    assert(md.contains("| H"))
    assert(md.contains("![pic](/i.png)"))
  }

  test("CSV round-trips uniqueness flags through the isUnique hook") {
    val d = HtmlToSpans.extract(html)
    val allDup = SpanRenderers.toCsv("https://x/", d.title, d.spans, _ => false)
    assert(allDup.contains(";false\n") && !allDup.contains(";true\n"))
  }
}
