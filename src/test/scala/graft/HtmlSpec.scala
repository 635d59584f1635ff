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

  test("density arithmetic: floor micros, zero-token block safe") {
    val h = "<html><body><div><a href='/x'>one</a> two three</div>" +
      "<p></p></body></html>"
    val bs = Html.walkHtmlBlocks(h).get
    assert(bs.map(b => (b.nTokens, b.nLinkTokens)) == Seq((3, 1), (0, 0)))
  }
}
