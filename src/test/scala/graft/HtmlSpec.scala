package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Html

/** The HTML tag walker: synth round-trips, trap handling (script/comment
  * fake tags, quoted '>', void elements), and the malformed-markup
  * guards (the q245 fail-soft contract). */
class HtmlSpec extends AnyFunSuite {

  private val toks20 = (0 until 20).map(i => s"w$i")
  private val text20 = toks20.mkString(" ")

  test("synth round-trip: 20 tokens → p(8)/div(8)/nav(4) blocks with " +
       "exact token and link counts") {
    val bs = Html.walkHtmlBlocks(Html.synthHtml(text20)).get
    assert(bs.length == 3)
    val Seq(p, d, nav) = bs
    assert(p.tag == "p" && p.nTokens == 8 && p.nLinkTokens == 0 &&
      p.text == toks20.take(8).mkString(" "))
    // div: every 2nd token (odd local index) is anchored
    assert(d.tag == "div" && d.nTokens == 8 && d.nLinkTokens == 4 &&
      d.text == toks20.slice(8, 16).mkString(" "))
    // nav: EVERY token anchored (density exactly 1)
    assert(nav.tag == "nav" && nav.nTokens == 4 && nav.nLinkTokens == 4 &&
      nav.text == toks20.slice(16, 20).mkString(" "))
  }

  test("ragged tail block and the b%3 cycle at 25 tokens (4 blocks)") {
    val t = (0 until 25).map(i => s"t$i")
    val bs = Html.walkHtmlBlocks(Html.synthHtml(t.mkString(" "))).get
    assert(bs.map(_.tag) == Seq("p", "div", "nav", "p"))
    assert(bs.map(_.nTokens) == Seq(8, 8, 8, 1))
    assert(bs.map(_.nLinkTokens) == Seq(0, 4, 8, 0))
  }

  test("traps: script bodies with fake tags, comments with fake tags, " +
       "quoted '>' in attributes never leak into blocks") {
    val bs = Html.walkHtmlBlocks(Html.synthHtml(text20)).get
    val all = bs.map(_.text).mkString(" ")
    assert(!all.contains("not a block") && !all.contains("fake tags") &&
      !all.contains("density"))
  }

  test("structural tolerance: nested inline tags, void elements, " +
       "raw-skip inside a block, anchors under a block count as links") {
    val h = "<html><body>" +
      "<div>alpha <span>beta <a href='/x'>gamma</a></span>" +
      "<br><hr/> delta<script>var y = '<div>no</div>';</script> eps</div>" +
      "</body></html>"
    val bs = Html.walkHtmlBlocks(h).get
    assert(bs.length == 1)
    val b = bs.head
    assert(b.tag == "div" && b.nTokens == 5 && b.nLinkTokens == 1 &&
      b.text == "alpha beta gamma delta eps")
  }

  test("malformed markup fails soft (None), never guesses") {
    val bad = Seq(
      "<html><body><p>unclosed block</body></html>",   // mismatched close
      "<html><body><p>text",                           // EOF inside body
      "<html><body><!-- unterminated <p>x</p>",        // comment
      "<html><body><p data-x=\"a>text</p></body></html>", // attr quote
      "<html><body><script>var x = 1;</body></html>",  // raw element
      "<html><body>bare text under body</body></html>",
      "<html><body><p>a</p></div></body></html>",      // stray close
      "<html><body><p>a</p>< junk</body></html>"       // bare '<'
    )
    bad.foreach { h =>
      assert(Html.walkHtmlBlocks(h).isEmpty, h.take(40))
    }
    assert(Html.walkHtmlBlocks(null).isEmpty)
  }

  test("href capture: anchor targets per block, in document order; " +
       "non-anchor and unquoted-bare attributes never captured") {
    val bs = Html.walkHtmlBlocks(Html.synthHtml(text20)).get
    val Seq(p, d, nav) = bs
    assert(p.links.isEmpty)
    assert(d.links == Seq("/w/w9", "/w/w11", "/w/w13", "/w/w15"))
    assert(nav.links == (16 until 20).map(i => s"/nav/w$i"))
    // a quoted '>' inside a NON-href attribute must not shift capture;
    // href on a non-anchor element is not a link
    val h = "<html><body><div data-x=\"a > b\">" +
      "<a class=\"k\" href=\"/t1\">x</a>" +
      "<img src=\"/not-a-link\"/><area href=\"/void-no-capture\"/>" +
      "<a href=\"/t2\">y</a></div></body></html>"
    val b = Html.walkHtmlBlocks(h).get.head
    assert(b.links == Seq("/t1", "/t2"), b.links.toString)
  }

  test("raw-skip close tag requires a delimiter after the name: " +
       "'</scripts>' inside script text must not terminate the skip") {
    // per spec an end tag's name must be followed by '>', '/', or
    // whitespace — the bare-prefix match would end the skip at
    // '</scripts>' and misparse the rest (round-12 advice)
    val h = "<html><body><div>alpha " +
      "<script>var s = \"</scripts> not a close\";</script>" +
      " beta</div></body></html>"
    val bs = Html.walkHtmlBlocks(h).get
    assert(bs.length == 1 && bs.head.text == "alpha beta")
    // whitespace and '/' after the name are valid close-tag forms
    val h2 = "<html><body><div>a<script>x</script >b</div></body></html>"
    assert(Html.walkHtmlBlocks(h2).get.head.text == "a b")
  }

  test("decodeEntities: basic set, decimal refs, ONE pass (no re-scan), " +
       "lenient passthrough of bare '&' and unknown/unterminated refs") {
    assert(Html.decodeEntities("a &amp; b &lt;c&gt; &quot;d&quot; &apos;e&apos;")
      == "a & b <c> \"d\" 'e'")
    assert(Html.decodeEntities("&#33;&#65;&#8364;") == "!A€")
    // single pass: "&amp;lt;" is the LITERAL "&lt;", never '<'
    assert(Html.decodeEntities("&amp;lt;") == "&lt;")
    // lenient: bare '&', unknown name, unterminated non-amp name,
    // oversized body, zero cp (bare `&amp` now DECODES — see below)
    assert(Html.decodeEntities("AT&T &bogus; &nbsp &toolongname; &#0; x")
      == "AT&T &bogus; &nbsp &toolongname; &#0; x")
    assert(Html.decodeEntities("no entities") == "no entities")
  }

  test("decodeEntities: surrogate-range refs (U+D800-U+DFFF) pass " +
       "through verbatim — decoding would mint an unpaired surrogate " +
       "(invalid UTF-16) that corrupts downstream UTF-8 encodes") {
    assert(Html.decodeEntities("&#xD800; &#xDFFF; &#55296; &#57343;")
      == "&#xD800; &#xDFFF; &#55296; &#57343;")
    // the boundary neighbors are real characters and still decode
    assert(Html.decodeEntities("&#xD7FF;") == "\uD7FF")
    assert(Html.decodeEntities("&#xE000;") == "\uE000")
  }

  test("decodeEntities: named core set (round-13 verdict item 1), hex " +
       "refs, and the bare-&amp tolerance rule — every expectation " +
       "spelled from Html.NamedEntities") {
    // the W3C-tier names all decode to their table value, in text
    for ((name, rep) <- Html.NamedEntities)
      assert(Html.decodeEntities(s"x &$name; y") == s"x $rep y", name)
    // nbsp is the headline real-web case: named and hex agree
    assert(Html.decodeEntities("a&nbsp;b") == "a\u00A0b")
    assert(Html.decodeEntities("a&#xA0;b&#Xa0;c") == "a\u00A0b\u00A0c")
    // hex general: case-insensitive marker and digits
    assert(Html.decodeEntities("&#x41;&#x2014;&#X20aC;") == "A—€")
    // hex rejects: no digits, non-hex digit, out of BMP, zero
    assert(Html.decodeEntities("&#x; &#xG1; &#x110000; &#x0;")
      == "&#x; &#xG1; &#x110000; &#x0;")
    // ONE pass composes with named refs: "&amp;nbsp;" is LITERAL
    assert(Html.decodeEntities("&amp;nbsp;") == "&nbsp;")
    // bare &amp: decodes when not followed by letter/digit/'=' (end,
    // space, punctuation), passes through verbatim otherwise —
    // "&amp;" itself takes the semicolon path first
    assert(Html.decodeEntities("S&amp P") == "S& P")
    assert(Html.decodeEntities("end&amp") == "end&")
    assert(Html.decodeEntities("w&amp.") == "w&.")
    assert(Html.decodeEntities("&amplt &ampx &amp9 &amp=1")
      == "&amplt &ampx &amp9 &amp=1")
    // the other names do NOT take the semicolonless rule
    assert(Html.decodeEntities("&nbsp &mdash x") == "&nbsp &mdash x")
  }

  test("recovery mode is VERBATIM-identical to strict on well-formed " +
       "entity-free markup (the q275 agreement contract)") {
    for (ntok <- Seq(1, 8, 20, 25, 40)) {
      val h = Html.synthHtml((0 until ntok).map(i => s"w$i").mkString(" "))
      assert(Html.walkHtmlBlocks(h, recover = true).get ==
        Html.walkHtmlBlocks(h).get, s"ntok=$ntok")
    }
  }

  test("corruption class 1 (truncated page): strict refuses, recovery " +
       "EOF-auto-closes and emits the in-progress block") {
    val text = (0 until 20).map(i => s"w$i").mkString(" ")
    val h = Html.corruptSynthHtml(text, 1)
    assert(!h.contains("</html>"))
    assert(Html.walkHtmlBlocks(h).isEmpty, "strict must refuse")
    assert(Html.walkHtmlBlocks(h, recover = true).get ==
      Html.walkHtmlBlocks(Html.synthHtml(text)).get)
  }

  test("corruption class 2 (stray closes): strict refuses, recovery " +
       "skips them (separator inside a block, no-op between blocks)") {
    val text = (0 until 20).map(i => s"w$i").mkString(" ")
    val h = Html.corruptSynthHtml(text, 2)
    assert(h.contains("</span>") && h.contains("</strong>") &&
      h.contains("</em>"))
    assert(Html.walkHtmlBlocks(h).isEmpty, "strict must refuse")
    assert(Html.walkHtmlBlocks(h, recover = true).get ==
      Html.walkHtmlBlocks(Html.synthHtml(text)).get)
  }

  test("corruption class 3 (entities + unclosed nav anchor): strict " +
       "refuses, recovery decodes and auto-closes with identical counts") {
    val toks = (0 until 25).map(i => s"w$i")
    val h = Html.corruptSynthHtml(toks.mkString(" "), 3)
    assert(Html.walkHtmlBlocks(h).isEmpty,
      "strict must refuse the unclosed anchor")
    val got = Html.walkHtmlBlocks(h, recover = true).get
    val wf = Html.walkHtmlBlocks(Html.synthHtml(toks.mkString(" "))).get
    // counts, tags, links: identical to the well-formed arithmetic
    assert(got.map(b => (b.tag, b.nTokens, b.nLinkTokens, b.links)) ==
      wf.map(b => (b.tag, b.nTokens, b.nLinkTokens, b.links)))
    // p-block first tokens decode to the decorated form
    assert(got.head.text ==
      ("&<w0>\"!" +: toks.slice(1, 8)).mkString(" "))
    assert(got(3).text == ("&<w24>\"!"))
    // non-p blocks verbatim
    assert(got(1).text == wf(1).text && got(2).text == wf(2).text)
  }

  test("recovery: close tag deeper on the stack auto-closes " +
       "intermediates; tokens inside the unclosed anchor stay links") {
    // <div>a <a>b c</div> — the anchor never closes; b and c are inside
    // it when </div> auto-closes, so both count as link tokens
    val h = "<html><body><div>a <a href=\"/x\">b c</div></body></html>"
    assert(Html.walkHtmlBlocks(h).isEmpty)
    val b = Html.walkHtmlBlocks(h, recover = true).get.head
    assert(b.nTokens == 3 && b.nLinkTokens == 2 && b.text == "a b c" &&
      b.links == Seq("/x"))
  }

  test("recovery: stray </body> and close-after-EOF-body are skipped; " +
       "href entity decoding applies in recovery only") {
    val h = "<html><body><p>x</p></body></body></html>"
    assert(Html.walkHtmlBlocks(h).isEmpty)
    assert(Html.walkHtmlBlocks(h, recover = true).get.head.text == "x")
    val ha = "<html><body><div><a href=\"/q?a=1&amp;b=2\">t</a></div>" +
      "</body></html>"
    assert(Html.walkHtmlBlocks(ha).get.head.links == Seq("/q?a=1&amp;b=2"))
    assert(Html.walkHtmlBlocks(ha, recover = true).get.head.links ==
      Seq("/q?a=1&b=2"))
  }

  test("recovery keeps the out-of-scope refusals: unterminated comment/" +
       "tag/raw element, bare text under body, double <body>") {
    val bad = Seq(
      "<html><body><!-- unterminated <p>x</p>",
      "<html><body><p>text",                          // EOF inside body…
      "<html><body><script>var x = 1;</body></html>", // unterminated raw
      "<html><body>bare text under body</body></html>",
      "<html><body><p>a</p></body><body><p>b</p></body></html>")
    // …but EOF-inside-body IS recoverable; the rest must still refuse
    assert(Html.walkHtmlBlocks(bad(1), recover = true).get.head.text
      == "text")
    for (h <- Seq(bad(0), bad(2), bad(3), bad(4)))
      assert(Html.walkHtmlBlocks(h, recover = true).isEmpty, h.take(40))
  }

  test("density arithmetic: floor micros, zero-token block safe") {
    val h = "<html><body><div><a href='/x'>one</a> two three</div>" +
      "<p></p></body></html>"
    val bs = Html.walkHtmlBlocks(h).get
    assert(bs.map(b => (b.nTokens, b.nLinkTokens)) == Seq((3, 1), (0, 0)))
  }

  test("walkTableCells: synth grid round-trip, thead/tbody transparent, " +
       "inline anchors join cell text, ragged last row") {
    // 8 tokens → table 0 gets w0 w2 w4 w6 (rows of 3: ragged row 1),
    // table 1 gets w1 w3 w5 w7
    val h = Html.synthTableHtml((0 until 8).map(i => s"w$i").mkString(" "))
    val cs = Html.walkTableCells(h, recover = false).get
    val expect = (0 until 8).map { i =>
      Html.TableCell(i % 2, (i / 2) / 3, (i / 2) % 3,
        (i / 2) / 3 == 0, s"w$i")
    }.sortBy(c => (c.tableIdx, c.rowIdx, c.colIdx))
    assert(cs.sortBy(c => (c.tableIdx, c.rowIdx, c.colIdx)) == expect)
    // recovery is verbatim-identical on well-formed entity-free pages
    assert(Html.walkTableCells(h, recover = true).get == cs)
    // a multi-token cell with inline markup stays ONE cell
    val h2 = "<table><tr><td>alpha <b>beta</b> gamma</td></tr></table>"
    assert(Html.walkTableCells(h2, recover = false).get ==
      Seq(Html.TableCell(0, 0, 0, header = false, "alpha beta gamma")))
  }

  test("walkTableCells: implied end tags parse in recovery, refuse in " +
       "strict; truncation EOF-closes; entities decode in recovery only") {
    val implied = "<table><tr><td>a<td>b<tr><td>c</table>"
    assert(Html.walkTableCells(implied, recover = false).isEmpty)
    assert(Html.walkTableCells(implied, recover = true).get ==
      Seq(Html.TableCell(0, 0, 0, header = false, "a"),
        Html.TableCell(0, 0, 1, header = false, "b"),
        Html.TableCell(0, 1, 0, header = false, "c")))
    val truncated = "<table><tr><th>x</th><td>y"
    assert(Html.walkTableCells(truncated, recover = false).isEmpty)
    assert(Html.walkTableCells(truncated, recover = true).get ==
      Seq(Html.TableCell(0, 0, 0, header = true, "x"),
        Html.TableCell(0, 0, 1, header = false, "y")))
    // the NBSP-glued decoration stays ONE cell token after decode
    val ent = "<table><tr><td>&nbsp;w&mdash;</td></tr></table>"
    assert(Html.walkTableCells(ent, recover = false).get.head.text ==
      "&nbsp;w&mdash;")
    assert(Html.walkTableCells(ent, recover = true).get.head.text ==
      Html.entityText("nbsp") + "w" + Html.entityText("mdash"))
  }

  test("walkTableCells: out-of-scope shapes refuse DIRECTED in both " +
       "modes — two-level nesting, cell outside row, junk in table, " +
       "misplaced/duplicate caption, malformed span values") {
    val bad = Seq(
      // nesting DEEPER than one level (table in a cell of an inner table)
      "<table><tr><td><table><tr><td><table></table></td></tr>" +
        "</table></td></tr></table>",
      // a table inside table STRUCTURE (between rows, not in a cell)
      "<table><table></table><tr><td>x</td></tr></table>",
      "<table><td>x</td></table>",                         // td sans tr
      "<table>stray<tr><td>x</td></tr></table>",           // junk text
      "<div><tr><td>x</td></tr></div>",                    // tr sans table
      // caption is FIRST CHILD, at most once (HTML content model)
      "<table><tr><td>x</td></tr><caption>late</caption></table>",
      "<table><caption>a</caption><caption>b</caption>" +
        "<tr><td>x</td></tr></table>",
      "<table><tr><caption>in-row</caption></tr></table>",
      // span values must be plain integers in [1, 1000]
      "<table><tr><td colspan=\"0\">x</td></tr></table>",
      "<table><tr><td rowspan=\"0\">x</td></tr></table>", // 0 = row-group
      "<table><tr><td colspan=\"two\">x</td></tr></table>",
      "<table><tr><td rowspan=\"1001\">x</td></tr></table>",
      "<table><tr><td colspan>x</td></tr></table>")
    for (h <- bad; rec <- Seq(false, true))
      assert(Html.walkTableCells(h, rec).isEmpty, s"$h rec=$rec")
    // a th closed as td is a structure lie — refused even in recovery
    assert(Html.walkTableCells("<table><tr><th>x</td></tr></table>",
      recover = true).isEmpty)
  }

  test("walkTableCells: SPAN-AWARE grid — colspan covers its columns, " +
       "rowspan covers following rows, later cells skip occupied " +
       "columns, a rowspan past the last row CLIPS (r14 verdict #1)") {
    // header: A colspan=2, B → (0,0,A),(0,1,A),(0,2,B)
    // row 1:  X rowspan=2, b1, b2 → X also covers (2,0)
    // row 2:  c1, c2 place at cols 1,2 (col 0 occupied by X)
    val h = "<table>" +
      "<tr><th colspan=\"2\">A</th><th>B</th></tr>" +
      "<tr><td rowspan=2>X</td><td>b1</td><td>b2</td></tr>" +
      "<tr><td>c1</td><td>c2</td></tr></table>"
    val cs = Html.walkTableCells(h, recover = false).get
      .map(c => (c.rowIdx, c.colIdx, c.header, c.text)).toSet
    assert(cs == Set(
      (0, 0, true, "A"), (0, 1, true, "A"), (0, 2, true, "B"),
      (1, 0, false, "X"), (1, 1, false, "b1"), (1, 2, false, "b2"),
      (2, 0, false, "X"), (2, 1, false, "c1"), (2, 2, false, "c2")))
    // clip: rowspan=3 with only 2 rows emits 2 coverage rows
    val h2 = "<table><tr><td rowspan='3'>X</td><td>a</td></tr>" +
      "<tr><td>b</td></tr></table>"
    val cs2 = Html.walkTableCells(h2, recover = false).get
      .map(c => (c.rowIdx, c.colIdx, c.text)).toSet
    assert(cs2 == Set((0, 0, "X"), (0, 1, "a"), (1, 0, "X"), (1, 1, "b")))
    // both quote forms + unquoted parse; absent spans default to 1;
    // an unrelated data-colspan attribute must NOT match
    val h3 = "<table><tr><td data-colspan=\"9\">a</td><td>b</td></tr>" +
      "</table>"
    assert(Html.walkTableCells(h3, recover = false).get.map(_.colIdx)
      == Seq(0, 1))
    // recovery agrees with strict on well-formed span pages
    assert(Html.walkTableCells(h, recover = true).get ==
      Html.walkTableCells(h, recover = false).get)
  }

  test("walkTableCells: ONE-level nested tables — the inner table gets " +
       "the next table_idx, its text never leaks into the outer cell, " +
       "and the outer cell resumes after </table> (r15 verdict #1)") {
    val h = "<table><tr><td>nav</td>" +
      "<td>main <table><caption>inner</caption>" +
      "<tr><th>h</th></tr><tr><td>v</td></tr></table> tail</td></tr>" +
      "</table>"
    val cs = Html.walkTableCells(h, recover = false).get
      .map(c => (c.tableIdx, c.rowIdx, c.colIdx, c.header, c.text))
    // outer = idx 0 (document open order), inner = idx 1; the outer
    // cell's text is ONLY its own tokens ('main tail')
    assert(cs.toSet == Set(
      (0, 0, 0, false, "nav"), (0, 0, 1, false, "main tail"),
      (1, -1, 0, false, "inner"), (1, 0, 0, true, "h"),
      (1, 1, 0, false, "v")), cs.toString)
    // a sibling table AFTER the nested pair numbers next in open order
    val h2 = h + "<table><tr><td>after</td></tr></table>"
    assert(Html.walkTableCells(h2, recover = false).get
      .map(_.tableIdx).max == 2)
    // recovery: implied ends inside BOTH levels land the same grid
    val implied = "<table><tr><td>nav" +
      "<td>main <table><tr><th>h<tr><td>v</table> tail</table>"
    assert(Html.walkTableCells(implied, recover = true).get
      .map(c => (c.tableIdx, c.rowIdx, c.colIdx, c.header, c.text)).toSet
      == Set(
        (0, 0, 0, false, "nav"), (0, 0, 1, false, "main tail"),
        (1, 0, 0, true, "h"), (1, 1, 0, false, "v")))
    // strict still refuses the implied-ends page
    assert(Html.walkTableCells(implied, recover = false).isEmpty)
    // EOF with both levels open: recovery closes innermost-first
    val eofOpen = "<table><tr><td>o <table><tr><td>i"
    assert(Html.walkTableCells(eofOpen, recover = true).get
      .map(c => (c.tableIdx, c.rowIdx, c.colIdx, c.text)).toSet
      == Set((0, 0, 0, "o"), (1, 0, 0, "i")))
    // spans inside the INNER table expand against the inner grid
    val spans = "<table><tr><td>w <table><tr><td colspan=2>a</td>" +
      "<td>b</td></tr></table></td></tr></table>"
    assert(Html.walkTableCells(spans, recover = false).get
      .filter(_.tableIdx == 1).map(c => (c.colIdx, c.text)).toSet
      == Set((0, "a"), (1, "a"), (2, "b")))
  }

  test("walkTableCells: span attrs parse POSITIONALLY — a span " +
       "spelling inside another attribute's quoted value is data, " +
       "never a span or a refusal (r15 advice, medium)") {
    // alt="rowspan=2" must NOT apply a rowspan: 2 independent rows
    val h = "<table><tr><td alt=\"rowspan=2\">a</td></tr>" +
      "<tr><td>b</td></tr></table>"
    val cs = Html.walkTableCells(h, recover = false).get
      .map(c => (c.rowIdx, c.colIdx, c.text))
    assert(cs == Seq((0, 0, "a"), (1, 0, "b")))
    // title="colspan rules" must NOT refuse the page (old behavior)
    val h2 = "<table><tr><td title=\"colspan rules\">a</td>" +
      "<td>b</td></tr></table>"
    assert(Html.walkTableCells(h2, recover = false).get.map(_.colIdx)
      == Seq(0, 1))
    // a REAL span attribute after a decoy-bearing attribute still fires
    val h3 = "<table><tr><td title=\"colspan rules\" colspan=2>a</td>" +
      "<td>b</td></tr></table>"
    assert(Html.walkTableCells(h3, recover = false).get.map(_.colIdx)
      == Seq(0, 1, 2))
    // valueless span attr and non-integer value still refuse directed
    assert(Html.walkTableCells(
      "<table><tr><td colspan>a</td></tr></table>", recover = true).isEmpty)
    assert(Html.walkTableCells(
      "<table><tr><td rowspan=\"x\">a</td></tr></table>",
      recover = true).isEmpty)
    // duplicate span attributes: FIRST wins (HTML duplicate-attr rule)
    val h4 = "<table><tr><td colspan=2 colspan=3>a</td><td>b</td></tr>" +
      "</table>"
    assert(Html.walkTableCells(h4, recover = false).get.map(_.colIdx)
      == Seq(0, 1, 2))
  }

  test("walkListItems: items in order, ol vs ul kind, one-level " +
       "nesting with suspend/resume, implied </li> in recovery only, " +
       "directed refusals") {
    val h = "<ul><li>a</li><li>m <ol><li>x</li><li>y</li></ol> d</li>" +
      "</ul><ol><li>z</li></ol>"
    val ls = Html.walkListItems(h, recover = false).get
      .map(l => (l.listIdx, l.ordered, l.itemIdx, l.text))
    // outer ul = 0, inner ol = 1, sibling ol = 2 (document open order);
    // the wrapping item's text is ONLY its own tokens ('m d')
    assert(ls.toSet == Set(
      (0, false, 0, "a"), (0, false, 1, "m d"),
      (1, true, 0, "x"), (1, true, 1, "y"),
      (2, true, 0, "z")), ls.toString)
    // implied </li>: recovery parses, strict refuses
    val implied = "<ul><li>a<li>b</ul>"
    assert(Html.walkListItems(implied, recover = false).isEmpty)
    assert(Html.walkListItems(implied, recover = true).get
      .map(l => (l.itemIdx, l.text)) == Seq((0, "a"), (1, "b")))
    // EOF close in recovery, innermost first
    assert(Html.walkListItems("<ul><li>o <ol><li>i", recover = true).get
      .map(l => (l.listIdx, l.itemIdx, l.text)).toSet
      == Set((0, 0, "o"), (1, 0, "i")))
    // directed refusals, both modes: li outside a list, junk text in
    // list structure, kind-mismatched close, two-level nesting, a list
    // inside list structure outside an item
    val bad = Seq(
      "<div><li>x</li></div>",
      "<ul>stray<li>x</li></ul>",
      "<ul><li>x</li></ol>",
      "<ul><li><ol><li><ul><li>d</li></ul></li></ol></li></ul>",
      "<ul><ul><li>x</li></ul></ul>")
    for (b <- bad; rec <- Seq(false, true))
      assert(Html.walkListItems(b, rec).isEmpty, s"$b rec=$rec")
    // entity decode in recovery only; inline markup joins item text
    val ent = "<ul><li>a&nbsp;b <b>c</b></li></ul>"
    assert(Html.walkListItems(ent, recover = false).get.head.text
      == "a&nbsp;b c")
    assert(Html.walkListItems(ent, recover = true).get.head.text
      == "a" + Html.entityText("nbsp") + "b c")
  }

  test("walkTableCells: caption captured at row −1 col 0, implied " +
       "</caption> in recovery only; caption text joins like a cell") {
    val h = "<table><caption>tbl <b>one</b></caption>" +
      "<tr><td>x</td></tr></table>"
    val cs = Html.walkTableCells(h, recover = false).get
    assert(cs == Seq(
      Html.TableCell(0, -1, 0, header = false, "tbl one"),
      Html.TableCell(0, 0, 0, header = false, "x")))
    // implied </caption> at <tr>: recovery parses, strict refuses
    val implied = "<table><caption>cap<tr><td>x</table>"
    assert(Html.walkTableCells(implied, recover = false).isEmpty)
    assert(Html.walkTableCells(implied, recover = true).get ==
      Seq(Html.TableCell(0, -1, 0, header = false, "cap"),
        Html.TableCell(0, 0, 0, header = false, "x")))
  }
}
