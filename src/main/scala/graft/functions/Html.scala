package graft.functions

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structure-aware document extraction — the jusText/trafilatura shape:
  * parse REAL markup, segment into top-level blocks, score each block by
  * link density, and keep low-link-density prose. This is the markup-
  * aware replacement for frequency-only boilerplate stripping
  * ([[Curation.stripBoilerplateParagraphs]]): a nav menu is boilerplate
  * because of its STRUCTURE (every token inside an anchor), not because
  * it repeats.
  *
  * Built with the codec-wave discipline (the q217/q240/q245 recipe):
  * deterministic synth bytes → a REAL parser → an arithmetic oracle.
  * [[synthHtml]] renders a document's tokens into real HTML — prose
  * paragraphs, link-dense divs, all-anchor nav lists, plus the traps a
  * real walker must survive (a script element whose body contains fake
  * tags, a comment containing fake tags, attribute values containing
  * '>', self-closing void elements) — and [[walkHtmlBlocks]] parses the
  * BYTES back with a character-level tag walker. The oracle recomputes
  * every block's token counts arithmetically from the same token
  * stream, so any walker bug (attribute '>' handling, script skipping,
  * comment skipping, inline-anchor attribution) diverges immediately.
  *
  * Scale: the walk is mapPartitions over payload strings — per-row CPU,
  * scan-shaped, zero exchange growth (the q247 class); extraction adds
  * one per-document aggregation on uniform doc ids. Never corpus-keyed.
  *
  * Malformed markup FAILS SOFT (None → one null row), and the gates
  * fail directed on it — the q245 decoder contract: an unterminated
  * comment/tag/script, a mismatched or stray close tag, or trailing
  * open elements at EOF all refuse rather than guess. Real-web
  * tolerance is the opt-in RECOVERY MODE (`recover = true`, never
  * silent): auto-close at close-tag/EOF boundaries, skip stray closes,
  * decode the basic entity set — gated by q275 against
  * deterministically corrupted markup ([[corruptSynthHtml]]), with
  * strict-mode refusal of the same pages asserted in-query.
  */
object Html {

  /** Void elements that never take a close tag (HTML5 spec list, the
    * subset a tag walker must know to keep the open-element stack
    * honest). */
  private val VoidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr")

  /** Tags whose raw text content is NOT document text. */
  private val RawSkipTags = Set("script", "style")

  /** One parsed block: a direct child element of <body>, its extracted
    * whitespace-normalized text, how many of its tokens sit inside
    * anchors, and the anchor HREF targets in document order (the
    * link-graph raw material — q268). */
  final case class HtmlBlock(tag: String, text: String,
                             nTokens: Int, nLinkTokens: Int,
                             links: Seq[String] = Nil)

  /** Deterministic synth HTML for gates/oracles: the document's tokens
    * in ceil(n/8) blocks of 8 — block b holds tokens 8b..8b+7 and cycles
    * through three shapes:
    *   b % 3 == 0 → `<p>` prose (no links),
    *   b % 3 == 1 → `<div>` with every 2nd token (odd local index)
    *                wrapped in an anchor, a quoted attribute containing
    *                '>' and a trailing `<br/>`,
    *   b % 3 == 2 → `<nav><ul>` with EVERY token an anchored `<li>`
    *                (link density exactly 1).
    * The head carries a script whose body contains fake tags, and the
    * body opens with a comment containing fake tags — the walker must
    * skip both byte-exactly. Tokens are whitespace words (no markup
    * characters), so no entity escaping is needed and the oracle's
    * token arithmetic is exact. */
  def synthHtml(text: String): String = {
    val t = text.split(" ").filter(_.nonEmpty)
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>doc</title>"
    sb ++= "<script type=\"text/javascript\">var x = \"<p>not a block</p>\"; if (1 > 0) f();</script>"
    sb ++= "</head><body>"
    sb ++= "<!-- synth document; comment holds <p>fake tags</p> -->"
    val nb = (t.length + 7) / 8
    var b = 0
    while (b < nb) {
      val toks = t.slice(8 * b, 8 * b + 8)
      b % 3 match {
        case 0 =>
          sb ++= "<p class=\"prose\">"
          sb ++= toks.mkString(" ")
          sb ++= "</p>"
        case 1 =>
          sb ++= "<div data-note=\"density > 0\">"
          toks.zipWithIndex.foreach { case (w, j) =>
            if (j > 0) sb += ' '
            if (j % 2 == 1) { sb ++= "<a href=\"/w/"; sb ++= w; sb ++= "\">"; sb ++= w; sb ++= "</a>" }
            else sb ++= w
          }
          sb ++= "<br/></div>"
        case 2 =>
          sb ++= "<nav><ul>"
          toks.foreach { w =>
            sb ++= "<li><a href=\"/nav/"; sb ++= w; sb ++= "\">"; sb ++= w; sb ++= "</a></li>"
          }
          sb ++= "</ul></nav>"
      }
      b += 1
    }
    sb ++= "</body></html>"
    sb.toString
  }

  /** The named-entity core set — XML basics + the W3C top tier every
    * real crawl page is saturated with (`&nbsp;` is the single most
    * common entity on the web). ONE table drives the recovery decoder
    * AND every oracle spelling via [[entityText]]/[[entityRef]] (the
    * PiiRules shared-constant discipline) — the two sides cannot drift.
    * Every name is ≤ 7 chars (the decoder's entity-body window). */
  val NamedEntities: Seq[(String, String)] = Seq(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'",
    "nbsp" -> "\u00A0", "shy" -> "\u00AD", // NBSP / soft hyphen
    "ndash" -> "–", "mdash" -> "—", "hellip" -> "…",
    "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”",
    "laquo" -> "«", "raquo" -> "»",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "middot" -> "·", "bull" -> "•",
    "sect" -> "§", "para" -> "¶", "dagger" -> "†",
    "times" -> "×", "divide" -> "÷", "plusmn" -> "±",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    "sup2" -> "²", "sup3" -> "³", "micro" -> "µ",
    "pound" -> "£", "euro" -> "€", "cent" -> "¢",
    "agrave" -> "à", "eacute" -> "é", "egrave" -> "è",
    "ccedil" -> "ç", "ntilde" -> "ñ",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "szlig" -> "ß")

  private val NamedEntityMap: java.util.HashMap[String, String] = {
    val m = new java.util.HashMap[String, String](NamedEntities.size * 2)
    NamedEntities.foreach { case (k, v) =>
      require(k.length <= 7, s"entity name '$k' exceeds the 7-char window")
      m.put(k, v)
    }
    m
  }

  /** Markup-side spelling of a named entity (`&name;`) — gate dirt
    * construction interpolates this. */
  def entityRef(name: String): String = {
    require(NamedEntityMap.containsKey(name), s"unknown entity '$name'")
    s"&$name;"
  }

  /** Decoded replacement text of a named entity — oracle spellings
    * interpolate THIS, never a hand-typed character. */
  def entityText(name: String): String = {
    val v = NamedEntityMap.get(name)
    require(v != null, s"unknown entity '$name'")
    v
  }

  /** Decode HTML entities in ONE left-to-right pass (no re-scan:
    * "&amp;lt;" decodes to the LITERAL "&lt;", per spec):
    *  - the [[NamedEntities]] table (`&name;`, body ≤ 7 chars);
    *  - numeric refs, decimal `&#NN;` and hex `&#xNN;`/`&#XNN;`
    *    (BMP only — a code point outside (0, U+FFFF] passes through
    *    verbatim);
    *  - the bare-`&amp`-without-semicolon tolerance rule (the web's
    *    most common semicolonless entity): `&amp` not followed by an
    *    ASCII letter/digit/'=' decodes to '&'.
    * Anything else — unknown names, unterminated or overlong bodies —
    * passes through verbatim (lenient — real-web text is full of bare
    * '&'). Recovery-mode text/href treatment; the strict walker never
    * decodes (round-12 contract: the synth never needs it). */
  def decodeEntities(s: String): String = {
    var i = s.indexOf('&')
    if (i < 0) return s
    val n = s.length
    val sb = new StringBuilder(n)
    sb ++= s.substring(0, i)
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb += c; i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        val body = if (semi < 0 || semi > i + 8) null
          else s.substring(i + 1, semi)
        var dec: String = if (body == null) null
          else {
            val named = NamedEntityMap.get(body)
            if (named != null) named
            else if (body.length >= 2 && body.charAt(0) == '#') {
              val num = body.substring(1)
              val cp: Long =
                if ((num.charAt(0) == 'x' || num.charAt(0) == 'X') &&
                    num.length >= 2 &&
                    num.substring(1).forall(ch => Character.digit(ch, 16) >= 0))
                  java.lang.Long.parseLong(num.substring(1), 16)
                else if (num.forall(_.isDigit)) num.toLong
                else -1L
              // surrogate code points (U+D800-U+DFFF) are not characters
              // — cp.toChar would mint an unpaired surrogate (invalid
              // UTF-16, corrupts downstream UTF-8 encodes e.g. parquet);
              // pass the reference through verbatim like zero/out-of-BMP
              if (cp > 0 && cp <= Char.MaxValue.toLong &&
                  !(cp >= 0xD800L && cp <= 0xDFFFL)) cp.toChar.toString
              else null
            } else null
          }
        var consumed = 0
        if (dec != null) consumed = semi + 1 - i
        else if (s.regionMatches(i + 1, "amp", 0, 3) &&
            (i + 4 >= n || {
              val ca = s.charAt(i + 4)
              !(ca.isLetterOrDigit || ca == '=')
            })) { dec = "&"; consumed = 4 }
        if (dec == null) { sb += c; i += 1 }
        else { sb ++= dec; i += consumed }
      }
    }
    sb.toString
  }

  /** The REAL tag walker: segment an HTML string into the direct child
    * blocks of <body>, extracting whitespace-normalized text and
    * anchor-token counts per block. Every tag boundary is a token
    * separator (tokens never span tags; anchors are inline, so their
    * tokens still count into the enclosing block). Returns None on
    * malformed markup — see the object scaladoc for what counts.
    *
    * `recover = true` is the real-web tolerance MODE (round-12 verdict
    * item; strict stays the default contract):
    *  - a close tag whose name sits DEEPER on the open-element stack
    *    auto-closes everything above it (the unclosed-`<a>`/`<li>`
    *    class); `</body>` and EOF auto-close all open elements and emit
    *    the in-progress block (implicit body close at EOF);
    *  - a close tag matching NOTHING on the stack is a stray — skipped
    *    (still a token separator inside a block);
    *  - block text and captured hrefs decode the basic entity set via
    *    [[decodeEntities]] (counts are over the DECODED text — an
    *    entity never introduces whitespace in the supported set except
    *    an explicit `&#32;`).
    * On well-formed markup, recovery is VERBATIM-identical to strict
    * for entity-free documents (HtmlSpec pins this; q275 gates it
    * transitively through the shared oracle arithmetic). Out of
    * recovery scope — still a refusal: unterminated comments/tags/
    * attribute values/raw elements, bare text directly under body, a
    * second `<body>`. */
  def walkHtmlBlocks(html: String, recover: Boolean): Option[Seq[HtmlBlock]] = {
    if (html == null) return None
    val n = html.length
    var i = 0
    // open non-void elements, in order (body itself is tracked separately)
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    var inBody = false
    var bodySeen = false
    var bodyBaseDepth = -1 // stack size when <body> opened
    var blockTag: String = null
    var blockDepth = -1 // stack size just BEFORE the block element opened
    var textBuf: StringBuilder = null
    var linkBuf: StringBuilder = null
    var hrefs: scala.collection.mutable.Builder[String, Seq[String]] = null
    var aDepth = 0
    val blocks = Seq.newBuilder[HtmlBlock]
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    // the block element itself closed (or was auto-closed): emit
    def emitBlock(): Unit = {
      val rawT = textBuf.toString; val rawL = linkBuf.toString
      val (tTxt, lTxt) =
        if (recover) (decodeEntities(rawT), decodeEntities(rawL))
        else (rawT, rawL)
      val toks = tTxt.split("\\s+").filter(_.nonEmpty)
      val ltoks = lTxt.split("\\s+").filter(_.nonEmpty)
      blocks += HtmlBlock(blockTag, toks.mkString(" "),
        toks.length, ltoks.length, hrefs.result())
      blockTag = null; blockDepth = -1
      textBuf = null; linkBuf = null; hrefs = null
    }
    // pop ONE open element, maintaining anchor depth; emits the block
    // when the popped element is the block element itself, otherwise a
    // nested close is a token separator
    def popOne(): Unit = {
      val popped = stack.remove(stack.length - 1)
      if (popped == "a" && aDepth > 0) aDepth -= 1
      if (inBody && blockTag != null) {
        if (stack.length == blockDepth) emitBlock()
        else { textBuf += ' '; linkBuf += ' ' }
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        if (inBody && blockTag != null) {
          textBuf += c
          if (aDepth > 0) linkBuf += c else if (c.isWhitespace) linkBuf += ' '
        } else if (inBody && !c.isWhitespace) {
          return None // bare text directly under body — refuse, not guess
        }
        i += 1
      } else if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        if (e < 0) return None // unterminated comment
        i = e + 3
      } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
        val e = html.indexOf('>', i + 2) // doctype / PI: no quoted '>'s
        if (e < 0) return None
        i = e + 1
      } else if (i + 1 < n &&
          (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
        val closing = html.charAt(i + 1) == '/'
        var j = i + (if (closing) 2 else 1)
        val nameStart = j
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        if (j == nameStart) return None // "</>" or "<1..."
        val name = lower(html.substring(nameStart, j))
        // attribute scan: quoted values may contain '>'; the href value
        // of an anchor is CAPTURED (the link-graph raw material, q268) —
        // names are tracked loosely (bare values are skipped, quoted
        // values bind to the last seen name)
        var selfClose = false
        var done = false
        var href: String = null
        var pendingName: String = null
        while (!done) {
          if (j >= n) return None // unterminated tag
          val cj = html.charAt(j)
          if (cj == '"' || cj == '\'') {
            val e = html.indexOf(cj, j + 1)
            if (e < 0) return None // unterminated attribute value
            if (pendingName == "href" && href == null) {
              val v = html.substring(j + 1, e)
              href = if (recover) decodeEntities(v) else v
            }
            pendingName = null
            j = e + 1
          } else if (cj == '>') { done = true; j += 1 }
          else if (cj == '/' && j + 1 < n && html.charAt(j + 1) == '>') {
            selfClose = true; done = true; j += 2
          } else if (cj.isLetter) {
            val s0 = j
            while (j < n && (html.charAt(j).isLetterOrDigit ||
                html.charAt(j) == '-' || html.charAt(j) == '_')) j += 1
            pendingName = lower(html.substring(s0, j))
          } else j += 1
        }
        i = j // the tag's bytes are consumed; branches below adjust only state
        if (closing) {
          if (name == "body") {
            if (recover) {
              if (inBody) { // stray </body> outside body: skipped
                // auto-close every element the markup left open
                while (stack.length > bodyBaseDepth) popOne()
                inBody = false
              }
            } else {
              if (!inBody || blockTag != null ||
                  stack.length != bodyBaseDepth) return None
              inBody = false
            }
          } else if (stack.nonEmpty && stack.last == name) {
            popOne() // the well-formed case, both modes
          } else if (recover) {
            if (stack.contains(name)) {
              // the name sits deeper: auto-close everything above it
              while (stack.last != name) popOne()
              popOne()
            } else if (inBody && blockTag != null) {
              // stray close inside a block: still a token separator
              textBuf += ' '; linkBuf += ' '
            } // stray close elsewhere: skipped
          } else {
            return None // mismatched or stray close tag
          }
        } else if (name == "body") {
          if (inBody || bodySeen) return None
          inBody = true; bodySeen = true; bodyBaseDepth = stack.length
        } else if (RawSkipTags.contains(name)) {
          // raw content (script/style) is skipped byte-exactly to its
          // close tag; it contributes neither text nor structure, but is
          // still a token separator inside a block. The close-tag scan is
          // case-insensitive via regionMatches on the ORIGINAL string —
          // a lowercased copy could change length (U+0130 → "i" + U+0307)
          // and misalign every index after it.
          if (!selfClose) {
            val close = s"</$name"
            // per the HTML spec an appropriate end tag requires the name
            // to be FOLLOWED by '>', '/', or whitespace — '</scripts>'
            // inside script text must NOT terminate the skip. Candidates
            // come from indexOf("</") (near-O(n) library scan), each
            // verified case-insensitively with regionMatches — the
            // round-12 note's fix for the O(n·taglen) per-char loop.
            // Case-insensitivity stays index-safe: nothing is lowercased
            // (U+0130 → "i" + U+0307 would change lengths).
            def closesAt(e: Int): Boolean =
              html.regionMatches(true, e, close, 0, close.length) && {
                val after = e + close.length
                after < n && {
                  val ca = html.charAt(after)
                  ca == '>' || ca == '/' || ca.isWhitespace
                }
              }
            var e = html.indexOf("</", j)
            while (e >= 0 && e + close.length <= n && !closesAt(e))
              e = html.indexOf("</", e + 1)
            if (e < 0 || e + close.length > n)
              return None // unterminated raw element
            val gt = html.indexOf('>', e)
            if (gt < 0) return None
            i = gt + 1
          }
          if (inBody && blockTag != null) { textBuf += ' '; linkBuf += ' ' }
        } else {
          val isVoid = VoidTags.contains(name) || selfClose
          if (inBody && blockTag == null) {
            // a new top-level block opens; void elements directly under
            // body (a stray <hr>) are structure-only, not blocks
            if (!isVoid) {
              blockTag = name
              blockDepth = stack.length
              textBuf = new StringBuilder
              linkBuf = new StringBuilder
              hrefs = Seq.newBuilder[String]
              stack += name
              if (name == "a") {
                aDepth += 1
                if (href != null) hrefs += href
              }
            }
          } else {
            if (inBody) { textBuf += ' '; linkBuf += ' ' }
            if (!isVoid) {
              stack += name
              if (inBody && name == "a") {
                aDepth += 1
                if (href != null && hrefs != null) hrefs += href
              }
            }
          }
        }
      } else {
        return None // bare '<' not opening a tag/comment/doctype
      }
    }
    if (recover) {
      // implicit close of everything at EOF (the truncated-page class):
      // popping crosses the block boundary, emitting an in-progress block
      while (stack.nonEmpty) popOne()
      Some(blocks.result())
    } else if (inBody || stack.nonEmpty || blockTag != null) {
      None // EOF inside body / open elements
    } else Some(blocks.result())
  }

  /** Strict-mode walk — the default contract (see the 2-arg form). */
  def walkHtmlBlocks(html: String): Option[Seq[HtmlBlock]] =
    walkHtmlBlocks(html, recover = false)

  /** Attach deterministic synth HTML built from a text column:
    * (id, html) — the q245 `withSynthWavPayload` pattern for markup. */
  def withSynthHtml(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("html", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map(row => Row(row.getLong(idIdx), synthHtml(row.getString(tIdx))))
    }(enc)
  }

  /** Deterministic REAL-WEB corruption of [[synthHtml]] output, keyed by
    * `cls` (the gate uses id % 4) — the q245 decoder contract INVERTED:
    * strict must REFUSE the structurally corrupted classes and recovery
    * must parse 100% with output the oracle computes arithmetically.
    *   0 → untouched (the strict-agreement subset);
    *   1 → truncated page: the final close tag and the `</body></html>`
    *       tail dropped (the EOF auto-close class);
    *   2 → stray closes: `</span>` right after `<body>`, `</strong>`
    *       inside the first block, `</em>` before `</body>` (skip-stray
    *       + separator semantics);
    *   3 → entities + unclosed inline anchor: each p-block's FIRST
    *       token is entity-decorated in the markup
    *       (`&amp;&lt;w&gt;&quot;&#33;` decodes to `&<w>"!`), and the
    *       last nav `</a></li>` loses its `</a>` (auto-closed at the
    *       enclosing `</li>`; no tokens sit between a nav anchor and
    *       its `</li>`, so every count matches the well-formed
    *       arithmetic — only the decoded p-block text shifts, which the
    *       oracle recomputes).
    */
  def corruptSynthHtml(text: String, cls: Int): String = cls match {
    case 0 => synthHtml(text)
    case 1 =>
      val h = synthHtml(text).stripSuffix("</body></html>")
      val k = h.lastIndexOf("</")
      if (k < 0) h
      else h.substring(0, k) + h.substring(h.indexOf('>', k) + 1)
    case 2 =>
      val h = synthHtml(text)
      def replaceFirstLit(s: String, find: String, repl: String): String = {
        val i = s.indexOf(find)
        if (i < 0) s
        else s.substring(0, i) + repl + s.substring(i + find.length)
      }
      replaceFirstLit(
        replaceFirstLit(
          replaceFirstLit(h, "<body>", "<body></span>"),
          "<p class=\"prose\">", "<p class=\"prose\"></strong>"),
        "</body></html>", "</em></body></html>")
    case 3 =>
      val t = text.split(" ").filter(_.nonEmpty)
      val dec = t.zipWithIndex.map { case (w, i) =>
        if (i % 24 == 0) "&amp;&lt;" + w + "&gt;&quot;&#33;" else w }
      val h = synthHtml(dec.mkString(" "))
      val k = h.lastIndexOf("</a></li>")
      if (k < 0) h else h.substring(0, k) + h.substring(k + 4)
    case other =>
      throw new IllegalArgumentException(
        s"corruptSynthHtml: class must be 0-3, got $other")
  }

  /** Attach deterministically CORRUPTED synth HTML — the q275 gate's
    * payload (the [[withSynthHtml]] pattern). `clsOf` picks the
    * [[corruptSynthHtml]] class per id (default id % 4, the full
    * spectrum; q278's crawl-to-clean ladder uses 1 + id % 2 — the
    * text-preserving structural classes only). */
  def withCorruptSynthHtml(df: DataFrame, idCol: String, textCol: String,
                           clsOf: Long => Int = id => (id % 4).toInt)
      : DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("html", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        Row(id, corruptSynthHtml(row.getString(tIdx), clsOf(id)))
      }
    }(enc)
  }

  /** Per-block records over REAL HTML: one row per top-level block —
    * (id, block_idx, tag, n_tokens, n_link_tokens, link_density_micros,
    * text). Malformed markup yields ONE null row per carrier (fail
    * soft), which gates fail directed on (the q245 contract).
    * link_density_micros = ⌊1e6 · n_link/n⌋ (0 for an empty block).
    * `recover = true` walks in real-web recovery mode (see
    * [[walkHtmlBlocks]]) — the q275 gate. */
  def htmlBlocks(df: DataFrame, idCol: String, htmlCol: String,
                 recover: Boolean = false): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("block_idx", IntegerType),
      StructField("tag", StringType),
      StructField("n_tokens", IntegerType),
      StructField("n_link_tokens", IntegerType),
      StructField("link_density_micros", LongType),
      StructField("text", StringType),
      StructField("links", ArrayType(StringType))))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val hIdx = df.columns.indexOf(htmlCol)
    df.mapPartitions { it =>
      it.flatMap { row =>
        walkHtmlBlocks(row.getString(hIdx), recover) match {
          case Some(bs) => bs.zipWithIndex.map { case (b, k) =>
            val dens = if (b.nTokens == 0) 0L
              else b.nLinkTokens.toLong * 1000000L / b.nTokens
            Row(row.get(idIdx), k, b.tag, b.nTokens, b.nLinkTokens,
              dens, b.text, b.links)
          }
          case None =>
            Seq(Row(row.get(idIdx), null, null, null, null, null, null,
              null))
        }
      }
    }(enc)
  }

  /** One extracted table cell: table ordinal within the page, row and
    * column ordinals within the table, whether the cell is a `<th>`,
    * and its whitespace-normalized text. */
  final case class TableCell(tableIdx: Int, rowIdx: Int, colIdx: Int,
                             header: Boolean, text: String)

  /** Deterministic synth page with TWO data tables for the q302/q303
    * gates: token i (0-based) goes to table i%2 at in-table ordinal
    * j = i div 2, row j div 3, column j%3; row 0 renders as `<th>`
    * cells. Traps: a head script whose body holds a fake table, a
    * comment holding a fake table, a quoted '>' attribute on each
    * `<table>`, an inline anchor wrapped around every (row+col)%5==0
    * cell of table 0 (inline markup must join cell text, not split
    * cells), and `<thead>`/`<tbody>` grouping on table 0 (transparent —
    * row ordinals continue across them). A `<p>` of static prose
    * precedes each table (non-table text never leaks into cells). */
  def synthTableHtml(text: String): String = {
    val t = text.split(" ").filter(_.nonEmpty)
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>t</title>"
    sb ++= "<script>var t = \"<table><tr><td>fake</td></tr></table>\";</script>"
    sb ++= "</head><body>"
    sb ++= "<!-- trap: <table><tr><td>fake</td></tr></table> -->"
    for (k <- 0 until 2) {
      sb ++= "<p>intro prose for the next data table.</p>"
      sb ++= s"""<table class="data" data-note="cols > 0">"""
      val toks = t.zipWithIndex.filter(_._2 % 2 == k).map(_._1)
      val nRows = (toks.length + 2) / 3
      var r = 0
      while (r < nRows) {
        if (k == 0 && r == 0 && nRows > 1) sb ++= "<thead>"
        sb ++= "<tr>"
        val cells = toks.slice(3 * r, 3 * r + 3)
        cells.zipWithIndex.foreach { case (w, c) =>
          val tag = if (r == 0) "th" else "td"
          sb ++= s"<$tag>"
          if (k == 0 && (r + c) % 5 == 0) {
            sb ++= "<a href=\"/t/"; sb ++= w; sb ++= "\">"; sb ++= w
            sb ++= "</a>"
          } else sb ++= w
          sb ++= s"</$tag>"
        }
        sb ++= "</tr>"
        if (k == 0 && r == 0 && nRows > 1) sb ++= "</thead><tbody>"
        if (k == 0 && r == nRows - 1 && nRows > 1) sb ++= "</tbody>"
        r += 1
      }
      sb ++= "</table>"
    }
    sb ++= "</body></html>"
    sb.toString
  }

  /** Deterministic REAL-WEB corruption of [[synthTableHtml]] — the q275
    * recipe for tables, keyed by `cls` (the q303 gate uses id % 3):
    *   0 → untouched (the strict-agreement subset);
    *   1 → IMPLIED END TAGS: every `</td>`, `</th>` and `</tr>` dropped
    *       (the single most common real-crawl table shape — HTML5's
    *       implied-end-tag rules make them optional);
    *   2 → truncated page (`</table></body></html>` tail dropped — the
    *       EOF implied-close class) + entity dirt: each `<th>` cell's
    *       token spelled `&nbsp;w&mdash;` in the markup (decodes to
    *       NBSP-w-mdash, which stays ONE cell token — NBSP is not \\s). */
  def corruptSynthTableHtml(text: String, cls: Int): String = cls match {
    case 0 => synthTableHtml(text)
    case 1 => synthTableHtml(text)
      .replace("</td>", "").replace("</th>", "").replace("</tr>", "")
    case 2 =>
      val h = synthTableHtml(text)
        .stripSuffix("</body></html>") match {
          case s if s.endsWith("</table>") => s.stripSuffix("</table>")
          case s => s
        }
      // entity-decorate the th cell text (never the fake-table traps:
      // those live in script/comment bodies, not inside <th>)
      h.replaceAll("<th>([^<&]+)</th>",
        "<th>" + entityRef("nbsp") + "$1" + entityRef("mdash") + "</th>")
        .replaceAll("<th><a ([^>]*)>([^<&]+)</a></th>",
          "<th><a $1>" + entityRef("nbsp") + "$2" + entityRef("mdash") +
            "</a></th>")
    case other =>
      throw new IllegalArgumentException(
        s"corruptSynthTableHtml: class must be 0-2, got $other")
  }

  /** Deterministic SPAN synth page for the q310-q312 gates — one table
    * whose layout exercises every span rule [[walkTableCells]] claims:
    * caption = token 0; header row = `<th colspan="2">t1</th><th>t2
    * </th>` (expands to 3 header positions); body tokens come in pairs
    * of rows — slot 0 of each 5-token group renders `<td rowspan=2>`
    * at col 0 (covering BOTH rows of its pair), slots 1-2 fill row A
    * cols 1-2, slots 3-4 fill row B cols 1-2 (placing AFTER the
    * occupied col 0 — the skip rule). A ragged tail with slots 3-4
    * missing leaves row B unrendered, so the rowspan CLIPS (the
    * standard's grow-only-as-rows-exist rule) — the oracle recomputes
    * exactly that arithmetic. Traps: a script fake table WITH spans, a
    * comment fake table, a quoted '>' attribute, a `data-colspan`
    * attribute on the table AND on every slot-1 cell (the span-name
    * word-boundary trap), a span spelling inside ANOTHER attribute's
    * quoted value on every slot-2 (`alt="rowspan=2"` — a positional
    * parser must treat it as data, not a span) and slot-3 cell
    * (`title="colspan rules"` — must not refuse), both quoted and
    * unquoted span spellings. */
  def synthSpanTableHtml(text: String): String = {
    val t = text.split(" ").filter(_.nonEmpty)
    require(t.length >= 3,
      s"synthSpanTableHtml: needs >= 3 tokens, got ${t.length}")
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>s</title>"
    sb ++= "<script>var t = \"<table><caption>fake</caption>" +
      "<tr><td colspan=9>fake</td></tr></table>\";</script>"
    sb ++= "</head><body>"
    sb ++= "<!-- trap: <table><tr><td rowspan=7>fake</td></tr></table> -->"
    sb ++= "<p>intro prose for the span table.</p>"
    sb ++= spanTableFragment(t)
    sb ++= "</body></html>"
    sb.toString
  }

  /** The bare `<table>…</table>` fragment of [[synthSpanTableHtml]] —
    * shared with [[synthNestedTableHtml]], which wraps it in a layout
    * table (so both gates exercise the SAME expanded-grid arithmetic
    * and the SAME trap battery). */
  private def spanTableFragment(t: Array[String]): String = {
    val sb = new StringBuilder
    sb ++= "<table class=\"data\" data-colspan=\"9\" data-note=\"cols > 0\">"
    sb ++= "<caption>"; sb ++= t(0); sb ++= "</caption>"
    sb ++= "<tr><th colspan=\"2\">"; sb ++= t(1); sb ++= "</th><th>"
    sb ++= t(2); sb ++= "</th></tr>"
    val m = t.length - 3
    var p = 0
    while (5 * p < m) {
      val base = 3 + 5 * p
      sb ++= "<tr><td rowspan=2>"; sb ++= t(base); sb ++= "</td>"
      if (base + 1 < t.length) {
        sb ++= "<td data-colspan=\"7\">"; sb ++= t(base + 1); sb ++= "</td>"
      }
      if (base + 2 < t.length) {
        sb ++= "<td alt=\"rowspan=2\">"; sb ++= t(base + 2); sb ++= "</td>"
      }
      sb ++= "</tr>"
      if (base + 3 < t.length) {
        sb ++= "<tr><td title=\"colspan rules\">"; sb ++= t(base + 3)
        sb ++= "</td>"
        if (base + 4 < t.length) {
          sb ++= "<td>"; sb ++= t(base + 4); sb ++= "</td>"
        }
        sb ++= "</tr>"
      }
      p += 1
    }
    sb ++= "</table>"
    sb.toString
  }

  /** Deterministic NESTED synth page for the q324/q325 gates — the
    * real web's most common table shape: a LAYOUT table (no header
    * row) whose second cell wraps the ENTIRE [[spanTableFragment]]
    * span table. Outer table = table_idx 0 with cells ("nav menu",
    * "main data"); the inner span table = table_idx 1 with exactly
    * the q310 expanded grid. 'main' renders BEFORE the inner table
    * and 'data' AFTER it inside the same outer cell — the gate
    * proves the outer cell SUSPENDS across the inner table (no inner
    * text leaks in) and RESUMES after it. Trap battery carried from
    * the span synth (script/comment fake tables, span-attr decoys). */
  def synthNestedTableHtml(text: String): String = {
    val t = text.split(" ").filter(_.nonEmpty)
    require(t.length >= 3,
      s"synthNestedTableHtml: needs >= 3 tokens, got ${t.length}")
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>s</title>"
    sb ++= "<script>var t = \"<table><caption>fake</caption>" +
      "<tr><td colspan=9>fake</td></tr></table>\";</script>"
    sb ++= "</head><body>"
    sb ++= "<!-- trap: <table><tr><td rowspan=7>fake</td></tr></table> -->"
    sb ++= "<p>intro prose for the nested table.</p>"
    sb ++= "<table class=\"layout\"><tr><td>nav menu</td><td>main "
    sb ++= spanTableFragment(t)
    sb ++= " data</td></tr></table>"
    sb ++= "</body></html>"
    sb.toString
  }

  /** Deterministic real-web corruption of [[synthNestedTableHtml]] —
    * the [[corruptSynthSpanTableHtml]] classes over the nested page
    * (the q325 gate uses id % 3):
    *   0 → untouched (the strict-agreement subset);
    *   1 → IMPLIED END TAGS: every `</td>`, `</th>`, `</tr>` and
    *       `</caption>` dropped in BOTH tables (`</table>` kept —
    *       the nesting boundary stays explicit);
    *   2 → truncated page: the OUTER `</td></tr></table>` and the
    *       body/html closes cut (EOF implied-close pops both open
    *       contexts... the inner table closed explicitly) + entity
    *       dirt on every inner `<th>` cell and the caption. */
  def corruptSynthNestedTableHtml(text: String, cls: Int): String =
    cls match {
      case 0 => synthNestedTableHtml(text)
      case 1 => synthNestedTableHtml(text)
        .replace("</td>", "").replace("</th>", "").replace("</tr>", "")
        .replace("</caption>", "")
      case 2 =>
        val h = synthNestedTableHtml(text)
          .stripSuffix("</body></html>")
          .stripSuffix(" data</td></tr></table>")
        h.replaceAll("<th([^>]*)>([^<&]+)</th>",
          "<th$1>" + entityRef("nbsp") + "$2" + entityRef("mdash") +
            "</th>")
          .replaceAll("<caption>([^<&]+)</caption>",
            "<caption>" + entityRef("nbsp") + "$1" + entityRef("mdash") +
              "</caption>")
      case other =>
        throw new IllegalArgumentException(
          s"corruptSynthNestedTableHtml: class must be 0-2, got $other")
    }

  /** Attach [[synthNestedTableHtml]] pages (the [[withSynthHtml]]
    * pattern). */
  def withSynthNestedTableHtml(df: DataFrame, idCol: String,
                               textCol: String,
                               clsOf: Long => Int = _ => 0): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("html", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        Row(row.getLong(idIdx),
          corruptSynthNestedTableHtml(row.getString(tIdx),
            clsOf(row.getLong(idIdx))))
      }
    }(enc)
  }

  /** Deterministic real-web corruption of [[synthSpanTableHtml]] — the
    * q303 classes re-cut for spans (the q311 gate uses id % 3):
    *   0 → untouched (the strict-agreement subset);
    *   1 → IMPLIED END TAGS: every `</td>`, `</th>`, `</tr>` AND
    *       `</caption>` dropped (the implied-caption-close class);
    *   2 → truncated page (EOF implied-close) + entity dirt on every
    *       `<th>` cell and the caption (`&nbsp;w&mdash;` — decodes to
    *       ONE glued token, NBSP is not \s). */
  def corruptSynthSpanTableHtml(text: String, cls: Int): String =
    cls match {
      case 0 => synthSpanTableHtml(text)
      case 1 => synthSpanTableHtml(text)
        .replace("</td>", "").replace("</th>", "").replace("</tr>", "")
        .replace("</caption>", "")
      case 2 =>
        val h = synthSpanTableHtml(text)
          .stripSuffix("</body></html>") match {
            case s if s.endsWith("</table>") => s.stripSuffix("</table>")
            case s => s
          }
        h.replaceAll("<th([^>]*)>([^<&]+)</th>",
          "<th$1>" + entityRef("nbsp") + "$2" + entityRef("mdash") +
            "</th>")
          .replaceAll("<caption>([^<&]+)</caption>",
            "<caption>" + entityRef("nbsp") + "$1" + entityRef("mdash") +
              "</caption>")
      case other =>
        throw new IllegalArgumentException(
          s"corruptSynthSpanTableHtml: class must be 0-2, got $other")
    }

  /** Attach [[synthSpanTableHtml]] pages (the [[withSynthHtml]]
    * pattern). */
  def withSynthSpanTableHtml(df: DataFrame, idCol: String,
                             textCol: String,
                             clsOf: Long => Int = _ => 0): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("html", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        Row(row.getLong(idIdx),
          corruptSynthSpanTableHtml(row.getString(tIdx), clsOf(row.getLong(idIdx))))
      }
    }(enc)
  }

  /** The q310/q311 span-grid oracle CTE: every (doc, position) the
    * EXPANDED grid holds, recomputed arithmetically from token ordinals
    * — caption at (−1, 0); header token 1 at cols 0 AND 1 (colspan 2),
    * token 2 at col 2; body 5-token groups place slot 0 at col 0 of
    * BOTH pair rows (the second only when the slot-3 token exists —
    * the CLIP rule), slots 1-2 / 3-4 at cols 1-2 of rows A / B. Emits
    * (doc_id, i0, r, cx, hdr, w): `i0` the source-token ordinal (so
    * callers can re-derive header tokens), `w` the token itself. */
  def spanGridOracleCte: String =
    """t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '')
      |    AS t
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, i - 1 AS i0, len(t) - 3 AS m, t[i] AS w
      |  FROM t, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) ii),
      |pos AS (
      |  SELECT doc_id, i0, -1 AS r, 0 AS cx, FALSE AS hdr, w
      |  FROM c WHERE i0 = 0
      |  UNION ALL SELECT doc_id, i0, 0, 0, TRUE, w FROM c WHERE i0 = 1
      |  UNION ALL SELECT doc_id, i0, 0, 1, TRUE, w FROM c WHERE i0 = 1
      |  UNION ALL SELECT doc_id, i0, 0, 2, TRUE, w FROM c WHERE i0 = 2
      |  UNION ALL SELECT doc_id, i0, 1 + 2 * ((i0 - 3) // 5), 0, FALSE, w
      |    FROM c WHERE i0 >= 3 AND (i0 - 3) % 5 = 0
      |  UNION ALL SELECT doc_id, i0, 2 + 2 * ((i0 - 3) // 5), 0, FALSE, w
      |    FROM c WHERE i0 >= 3 AND (i0 - 3) % 5 = 0
      |      AND m > 5 * ((i0 - 3) // 5) + 3
      |  UNION ALL SELECT doc_id, i0, 1 + 2 * ((i0 - 3) // 5),
      |      (i0 - 3) % 5, FALSE, w
      |    FROM c WHERE i0 >= 3 AND (i0 - 3) % 5 IN (1, 2)
      |  UNION ALL SELECT doc_id, i0, 2 + 2 * ((i0 - 3) // 5),
      |      (i0 - 3) % 5 - 2, FALSE, w
      |    FROM c WHERE i0 >= 3 AND (i0 - 3) % 5 IN (3, 4))""".stripMargin

  /** TABLE extraction — the CommonCrawl structured-data walk: parse the
    * page's `<table>` elements into (table, row, col, header, text)
    * cells, SPAN-AWARE per the HTML table processing model (WHATWG
    * HTML §4.9.12 "Processing model — forming a table"): a
    * `colspan=c rowspan=r` cell covers its c × r grid rectangle and is
    * emitted once per covered (row, col) position; a later cell in the
    * same row places at the first column not occupied by an earlier
    * span; a rowspan reaching past the table's LAST actual row clips
    * to it (the standard's "grow downward only as rows exist" rule).
    * `<caption>` (first child, at most one) is captured as a cell at
    * row −1, col 0, is_header = false. Strict mode demands explicit
    * closes; `recover = true` applies HTML5's IMPLIED-END-TAG rules
    * (`<td>`/`<th>`/`<tr>` close an open cell/row/caption;
    * `</table>`/EOF close everything open — most real crawl tables
    * omit `</td>`/`</tr>`) and decodes entities in cell text
    * ([[decodeEntities]]). `<thead>`/`<tbody>`/`<tfoot>` are
    * transparent grouping (row ordinals continue across them). Inline
    * markup inside a cell is a token separator; its text joins the
    * cell.
    *
    * NESTED tables (r15 verdict #1 — the single most common real-web
    * table shape is a layout table wrapping the data table): an inner
    * `<table>` inside an OPEN CELL suspends the outer cell and parses
    * as its own table with the next `table_idx` (document open
    * order); the inner table's text never leaks into the outer cell's
    * text, and the outer cell resumes after the inner `</table>`. One
    * nesting level is supported; deeper nesting, and a `<table>`
    * inside table structure but outside a cell, refuse in both modes.
    *
    * Out of scope — a refusal in BOTH modes (directed, never a
    * guess): nesting deeper than one level, rows outside a table,
    * cells outside a row, a caption after the first row or a second
    * caption, non-whitespace text between table structure tags, and
    * span values that are not plain integers in [1, 1000] (HTML's
    * `rowspan=0` extend-to-row-group rule stays out of scope).
    *
    * Scale: one mapPartitions pass over payload strings (the
    * [[walkHtmlBlocks]] contract) — per-row CPU, zero exchange; the
    * per-table buffer (needed for rowspan clipping) is one page's
    * cells, never corpus state. */
  def walkTableCells(html: String, recover: Boolean): Option[Seq[TableCell]] = {
    if (html == null) return None
    val n = html.length
    var i = 0
    var nextTableIdx = 0
    // per-open-table parse context — tables nest ONE level (an inner
    // <table> inside a cell suspends the outer cell and opens its own
    // context/table_idx; deeper nesting refuses), so the stack holds
    // at most two of these
    final class TCtx(val idx: Int) {
      var inRow = false
      var inCell = false
      var inCaption = false
      var sawCaption = false
      var rowIdx = -1
      var colCursor = 0
      var cellCol = -1
      var cellColspan = 1
      var cellRowspan = 1
      var headerCell = false
      var cellBuf: StringBuilder = null
      var captionBuf: StringBuilder = null
      // col → rows this column stays occupied, INCLUDING the current row
      val live = scala.collection.mutable.HashMap.empty[Int, Int]
      // placements: (row, col, rowspan, colspan, header, text);
      // row −1 is the caption — expanded (and clipped) at table close
      val placed = scala.collection.mutable.ArrayBuffer
        .empty[(Int, Int, Int, Int, Boolean, String)]
    }
    var stack: List[TCtx] = Nil
    def cur: TCtx = stack.head
    val cells = Seq.newBuilder[TableCell]
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def norm(raw: String): String = {
      val txt = if (recover) decodeEntities(raw) else raw
      txt.split("\\s+").filter(_.nonEmpty).mkString(" ")
    }
    def emitCell(t: TCtx): Unit = {
      t.placed += ((t.rowIdx, t.cellCol, t.cellRowspan, t.cellColspan,
        t.headerCell, norm(t.cellBuf.toString)))
      t.inCell = false; t.cellBuf = null
    }
    def emitCaption(t: TCtx): Unit = {
      t.placed += ((-1, 0, 1, 1, false, norm(t.captionBuf.toString)))
      t.inCaption = false; t.captionBuf = null; t.sawCaption = true
    }
    def closeTable(t: TCtx): Unit = {
      val totalRows = t.rowIdx + 1
      t.placed.foreach { case (r, c0, rs, cs, hdr, txt) =>
        if (r < 0) cells += TableCell(t.idx, -1, 0, hdr, txt)
        else {
          var rr = r
          val rEnd = math.min(r + rs, totalRows)
          while (rr < rEnd) {
            var cc = c0
            while (cc < c0 + cs) {
              cells += TableCell(t.idx, rr, cc, hdr, txt); cc += 1
            }
            rr += 1
          }
        }
      }
      stack = stack.tail
    }
    // span attribute value, parsed POSITIONALLY over the tag's
    // name[=value] attribute pairs (quoted values skipped as units):
    // absent → 1; present with a missing / non-integer / out-of-range
    // value → −1 (the caller refuses — never a guess). Positional
    // parsing means 'colspan'/'rowspan' occurring INSIDE another
    // attribute's quoted VALUE (alt="rowspan=2", title="colspan
    // rules") is plain data — neither a span nor a refusal; duplicate
    // span attributes take the FIRST occurrence (the HTML parsing
    // model's duplicate-attribute rule).
    def spanAttr(attrs: String, name: String): Int = {
      val la = lower(attrs)
      val m = la.length
      var j = 0
      while (j < m) {
        val cj = la.charAt(j)
        if (cj.isWhitespace || cj == '/') j += 1
        else {
          val ns = j
          while (j < m && !la.charAt(j).isWhitespace &&
            la.charAt(j) != '=') j += 1
          val aname = la.substring(ns, j)
          while (j < m && la.charAt(j).isWhitespace) j += 1
          var value: String = null
          if (j < m && la.charAt(j) == '=') {
            j += 1
            while (j < m && la.charAt(j).isWhitespace) j += 1
            if (j < m) {
              val q = la.charAt(j)
              if (q == '"' || q == '\'') {
                val e = la.indexOf(q, j + 1)
                if (e < 0) return -1 // unterminated quote: refuse
                value = la.substring(j + 1, e); j = e + 1
              } else {
                val vs = j
                while (j < m && !la.charAt(j).isWhitespace) j += 1
                value = la.substring(vs, j)
              }
            }
          }
          if (aname == name) {
            if (value == null) return -1 // valueless span attr: refuse
            return if (value.nonEmpty && value.length <= 4 &&
              value.forall(_.isDigit)) {
              val x = value.toInt
              if (x >= 1 && x <= 1000) x else -1
            } else -1
          }
        }
      }
      1
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        if (stack.nonEmpty) {
          if (cur.inCell) cur.cellBuf += c
          else if (cur.inCaption) cur.captionBuf += c
          else if (!c.isWhitespace) return None // junk in table
        }
        i += 1
      } else if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        if (e < 0) return None
        i = e + 3
      } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
        val e = html.indexOf('>', i + 2)
        if (e < 0) return None
        i = e + 1
      } else if (i + 1 < n &&
          (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
        val closing = html.charAt(i + 1) == '/'
        var j = i + (if (closing) 2 else 1)
        val nameStart = j
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        if (j == nameStart) return None
        val name = lower(html.substring(nameStart, j))
        // attribute scan — quoted values may contain '>'
        val attrStart = j
        var attrEnd = j
        var selfClose = false
        var done = false
        while (!done) {
          if (j >= n) return None
          val cj = html.charAt(j)
          if (cj == '"' || cj == '\'') {
            val e = html.indexOf(cj, j + 1)
            if (e < 0) return None
            j = e + 1
          } else if (cj == '>') { done = true; attrEnd = j; j += 1 }
          else if (cj == '/' && j + 1 < n && html.charAt(j + 1) == '>') {
            selfClose = true; done = true; attrEnd = j; j += 2
          } else j += 1
        }
        i = j
        name match {
          case "table" if !closing =>
            if (stack.isEmpty) {
              stack = new TCtx({ nextTableIdx += 1; nextTableIdx - 1 }) ::
                stack
            } else if (cur.inCell) {
              // an inner table inside a cell: suspend the outer cell
              // (its buffer keeps only its OWN text — the inner
              // table's text never leaks) and open a fresh context
              // with the next table_idx. One level only — deeper
              // nesting refuses directed.
              if (stack.lengthCompare(2) >= 0) return None
              cur.cellBuf += ' ' // a token separator, like any element
              stack = new TCtx({ nextTableIdx += 1; nextTableIdx - 1 }) ::
                stack
            } else return None // a table inside table STRUCTURE
          case "table" if closing =>
            if (stack.isEmpty) return None
            if (cur.inCell || cur.inRow || cur.inCaption) {
              if (!recover) return None
              if (cur.inCell) emitCell(cur)
              if (cur.inCaption) emitCaption(cur)
            }
            closeTable(cur)
          case "caption" if !closing =>
            if (stack.isEmpty || cur.inRow || cur.inCell || cur.inCaption)
              return None
            if (cur.sawCaption || cur.rowIdx >= 0) return None // once, first
            cur.inCaption = true; cur.captionBuf = new StringBuilder
          case "caption" if closing =>
            if (stack.isEmpty || !cur.inCaption) return None
            emitCaption(cur)
          case "thead" | "tbody" | "tfoot" =>
            if (stack.isEmpty) return None // grouping is table structure
            if (cur.inCell) { // implied </td> + </tr> at a group boundary
              if (!recover) return None
              emitCell(cur)
            }
            if (cur.inCaption) { // implied </caption> at a group boundary
              if (!recover) return None
              emitCaption(cur)
            }
            if (cur.inRow) {
              if (!recover) return None
              cur.inRow = false
            }
          case "tr" if !closing =>
            if (stack.isEmpty) return None
            if (cur.inCell || cur.inRow || cur.inCaption) {
              if (!recover) return None
              if (cur.inCell) emitCell(cur)
              if (cur.inCaption) emitCaption(cur)
            }
            // the previous row is done: spans burn one occupied row
            cur.live.keys.toSeq.foreach { k =>
              val left = cur.live(k) - 1
              if (left <= 0) cur.live.remove(k) else cur.live(k) = left
            }
            cur.inRow = true; cur.rowIdx += 1; cur.colCursor = 0
          case "tr" if closing =>
            if (stack.isEmpty || !cur.inRow) return None
            if (cur.inCell) {
              if (!recover) return None
              emitCell(cur)
            }
            cur.inRow = false
          case "td" | "th" if !closing =>
            if (stack.isEmpty || !cur.inRow) return None
            if (cur.inCell) {
              if (!recover) return None
              emitCell(cur)
            }
            val attrs = html.substring(attrStart, attrEnd)
            val cs = spanAttr(attrs, "colspan")
            val rs = spanAttr(attrs, "rowspan")
            if (cs < 1 || rs < 1) return None // malformed span: refuse
            // place at the first column not occupied by an earlier span
            var c0 = cur.colCursor
            while (cur.live.getOrElse(c0, 0) > 0) c0 += 1
            cur.cellCol = c0; cur.cellColspan = cs; cur.cellRowspan = rs
            var cc = c0
            while (cc < c0 + cs) { cur.live(cc) = rs; cc += 1 }
            cur.colCursor = c0 + cs
            cur.inCell = true
            cur.headerCell = name == "th"
            cur.cellBuf = new StringBuilder
          case "td" | "th" if closing =>
            if (stack.isEmpty || !cur.inCell ||
              (name == "th") != cur.headerCell) return None
            emitCell(cur)
          case rn if RawSkipTags.contains(rn) && !closing =>
            if (!selfClose) {
              val close = s"</$rn"
              def closesAt(e: Int): Boolean =
                html.regionMatches(true, e, close, 0, close.length) && {
                  val after = e + close.length
                  after < n && {
                    val ca = html.charAt(after)
                    ca == '>' || ca == '/' || ca.isWhitespace
                  }
                }
              var e = html.indexOf("</", j)
              while (e >= 0 && e + close.length <= n && !closesAt(e))
                e = html.indexOf("</", e + 1)
              if (e < 0 || e + close.length > n) return None
              val gt = html.indexOf('>', e)
              if (gt < 0) return None
              i = gt + 1
            }
            if (stack.nonEmpty && cur.inCell) { cur.cellBuf += ' ' }
            else if (stack.nonEmpty && cur.inCaption) {
              cur.captionBuf += ' '
            }
          case _ =>
            // any other element: a token separator inside a cell or
            // caption, page structure outside (not this walker's
            // concern)
            if (stack.nonEmpty && cur.inCell) cur.cellBuf += ' '
            else if (stack.nonEmpty && cur.inCaption) cur.captionBuf += ' '
        }
      } else {
        return None // bare '<'
      }
    }
    if (stack.nonEmpty) {
      if (!recover) return None
      while (stack.nonEmpty) { // EOF implies close, innermost first
        if (cur.inCell) emitCell(cur)
        if (cur.inCaption) emitCaption(cur)
        closeTable(cur)
      }
    }
    Some(cells.result())
  }

  /** Per-cell records over real HTML: one row per extracted cell —
    * (id, table_idx, row_idx, col_idx, is_header, text). Malformed
    * markup yields ONE null row (fail soft — the q245 contract). */
  def htmlTableCells(df: DataFrame, idCol: String, htmlCol: String,
                     recover: Boolean = false): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("table_idx", IntegerType),
      StructField("row_idx", IntegerType),
      StructField("col_idx", IntegerType),
      StructField("is_header", BooleanType),
      StructField("text", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val hIdx = df.columns.indexOf(htmlCol)
    df.mapPartitions { it =>
      it.flatMap { row =>
        walkTableCells(row.getString(hIdx), recover) match {
          case Some(cs) => cs.map(c =>
            Row(row.get(idIdx), c.tableIdx, c.rowIdx, c.colIdx,
              c.header, c.text))
          case None => Seq(Row(row.get(idIdx), null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** Attach [[synthTableHtml]] pages (the [[withSynthHtml]] pattern). */
  def withSynthTableHtml(df: DataFrame, idCol: String, textCol: String,
                         clsOf: Long => Int = _ => 0): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("html", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        val id = row.getLong(idIdx)
        Row(id, corruptSynthTableHtml(row.getString(tIdx), clsOf(id)))
      }
    }(enc)
  }

  /** HEADER-KEYED table records — the "table understanding" step over
    * [[htmlTableCells]]: body cells join their `<th>` row's cell at the
    * same column, yielding (id, table_idx, row_idx, col_name, value)
    * tuples — markup tables become relational records. The join keys
    * on (id, table, col): per-document, uniform, never corpus-keyed.
    * Body cells whose column has no header (a body row wider than the
    * header row) drop — records without a schema are not records;
    * caption rows (row −1) are table metadata, never body records.
    * A table with MORE than one `<th>` row (legal markup, common in
    * real crawls) has no single header schema — joining all header
    * rows would silently duplicate every body record, so it refuses
    * DIRECTED instead (span-aware header groups are the walker's
    * declared non-goal). */
  def tableRecords(cells: DataFrame): DataFrame = {
    val headers0 = cells.filter(col("is_header"))
      .select(col("id"), col("table_idx"), col("row_idx"), col("col_idx"),
        col("text").as("col_name"))
    val hdrRows = headers0.groupBy("id", "table_idx")
      .agg(count_distinct(col("row_idx")).as("__n_hdr_rows"))
    val headers = headers0.join(hdrRows, Seq("id", "table_idx"))
      .select(col("id"), col("table_idx"), col("col_idx"),
        when(col("__n_hdr_rows") > 1, raise_error(concat(
          lit("tableRecords: table "), col("table_idx").cast("string"),
          lit(" of id "), col("id").cast("string"),
          lit(" has multiple <th> rows — header-keyed records need " +
            "exactly one header row"))))
          .otherwise(col("col_name")).as("col_name"))
    cells.filter(!col("is_header") && col("row_idx") >= 0)
      .select(col("id"), col("table_idx"), col("row_idx"),
        col("col_idx"), col("text").as("value"))
      .join(headers, Seq("id", "table_idx", "col_idx"))
      .select(col("id"), col("table_idx"), col("row_idx"),
        col("col_name"), col("value"))
  }

  /** Corpus link-graph extraction (the CommonCrawl link-graph shape):
    * one row per distinct HREF target with its total reference count and
    * the number of distinct documents referencing it. Rides
    * [[htmlBlocks]]' captured anchor targets — the walk is the only
    * payload pass; the aggregation keys on the (zipfian) href string
    * with map-side partials. Callers verify parse failures first (null
    * block rows), exactly as with block extraction. */
  def linkTargets(blocks: DataFrame): DataFrame =
    blocks
      .select(col("id"), explode(col("links")).as("href"))
      .groupBy(col("href"))
      .agg(count(lit(1)).as("n_refs"),
        count_distinct(col("id")).as("n_docs"))

  /** Link-INDEX rows for persistence through [[linkIndexTap]] (bucketed
    * by href): one row per (href, id) carrying the anchor-occurrence
    * count. The layout decision that makes corpus link stats an
    * O(index) bucket-local aggregate ([[linkTargetsFromIndex]] plans
    * with NO exchange) and arrival maintenance a plain APPEND: documents
    * are immutable and append-only (the q133 delivery contract), so a
    * batch's (href, id) pairs can never collide with persisted ones —
    * no read-modify-write, no anti-join. */
  def linkIndexRows(blocks: DataFrame): DataFrame =
    blocks
      .select(col("id"), explode(col("links")).as("href"))
      .groupBy(col("href"), col("id"))
      .agg(count(lit(1)).cast("long").as("n"))

  def linkIndexTap(table: String, buckets: Int): graft.sources.BucketedTap =
    graft.sources.BucketedTap(table, buckets, Seq("href"))

  /** Corpus link stats from the PERSISTED index — value-identical to
    * [[linkTargets]] over the same documents, but the aggregation keys
    * on the index's own bucket column, so the plan is a bucket-aware
    * scan + partial agg with zero exchange (asserted in-query by q272). */
  def linkTargetsFromIndex(index: DataFrame): DataFrame =
    index.groupBy(col("href"))
      .agg(sum(col("n")).cast("bigint").as("n_refs"),
        count(lit(1)).as("n_docs"))

  /** Block-level content extraction: keep blocks whose tag is not in
    * `dropTags` AND whose link density is under the threshold; return
    * one row per document — (id, n_blocks, n_kept, clean_text), kept
    * blocks joined by '\n' in block order (array_sort reassembly — no
    * window, deterministic on any partitioning). Documents whose markup
    * yields ZERO blocks emit no rows from [[htmlBlocks]] and are
    * therefore ABSENT from this output (total-corpus accounting needs
    * the carrier DataFrame); callers must verify parse-failure null
    * block rows FIRST — an unverified null row counts into n_blocks but
    * can never be kept. */
  def extractContent(blocks: DataFrame,
                     maxLinkDensityMicros: Long = 500000L,
                     dropTags: Seq[String] = Seq("nav", "footer", "aside"))
      : DataFrame = {
    val kept = blocks
      .filter(!col("tag").isin(dropTags.map(x => x: Any): _*) &&
        col("link_density_micros") < maxLinkDensityMicros)
      .groupBy(col("id"))
      .agg(concat_ws("\n", transform(
          array_sort(collect_list(struct(col("block_idx"), col("text")))),
          x => x.getField("text"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    val tot = blocks.groupBy(col("id"))
      .agg(count(lit(1)).as("n_blocks"))
    tot.join(kept, Seq("id"), "left")
      .select(col("id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  // --------------------------------------------------------------------
  // LIST extraction (ul/ol/li) — the other big structured-data shape in
  // real crawl HTML next to tables, built on the table walker's
  // disciplines: context stack with ONE nesting level, implied end tags
  // in recovery, entity decode, directed refusals.
  // --------------------------------------------------------------------

  /** One extracted list item: list ordinal within the page (document
    * open order), whether the list is ordered (`<ol>`), the item's
    * ordinal within its list, and its whitespace-normalized text. */
  final case class ListItem(listIdx: Int, ordered: Boolean, itemIdx: Int,
                            text: String)

  /** LIST extraction — parse the page's `<ul>`/`<ol>` elements into
    * (list, ordered, item, text) rows. An inner list inside an OPEN
    * `<li>` suspends the outer item (the inner list's text never leaks
    * into the outer item's text; the outer item resumes after the
    * inner close) and parses with the next `list_idx` — one nesting
    * level, exactly the nested-table contract. Strict mode demands
    * explicit `</li>` closes; `recover = true` applies HTML5's
    * implied-end-tag rules (`<li>` closes an open item; `</ul>`/
    * `</ol>`/EOF close everything open — real crawl lists omit `</li>`
    * constantly) and decodes entities in item text.
    *
    * Refusals in BOTH modes (directed, never a guess): an `<li>`
    * outside a list, non-whitespace text inside list structure
    * (between items), a close tag whose kind mismatches the open list
    * (`</ol>` closing a `<ul>` is a structure lie), nesting deeper
    * than one level, and a list inside list structure outside an item.
    *
    * Scale: one mapPartitions pass over payload strings — per-row CPU,
    * zero exchange; state is the ≤2-deep context stack. */
  def walkListItems(html: String, recover: Boolean): Option[Seq[ListItem]] = {
    if (html == null) return None
    val n = html.length
    var i = 0
    var nextListIdx = 0
    final class LCtx(val idx: Int, val ordered: Boolean) {
      var itemIdx = -1
      var inItem = false
      var itemBuf: StringBuilder = null
    }
    var stack: List[LCtx] = Nil
    def cur: LCtx = stack.head
    val items = Seq.newBuilder[ListItem]
    def lower(s: String) = s.toLowerCase(java.util.Locale.ROOT)
    def norm(raw: String): String = {
      val txt = if (recover) decodeEntities(raw) else raw
      txt.split("\\s+").filter(_.nonEmpty).mkString(" ")
    }
    def emitItem(t: LCtx): Unit = {
      items += ListItem(t.idx, t.ordered, t.itemIdx, norm(t.itemBuf.toString))
      t.inItem = false; t.itemBuf = null
    }
    while (i < n) {
      val c = html.charAt(i)
      if (c != '<') {
        if (stack.nonEmpty) {
          if (cur.inItem) cur.itemBuf += c
          else if (!c.isWhitespace) return None // junk in list structure
        }
        i += 1
      } else if (html.startsWith("<!--", i)) {
        val e = html.indexOf("-->", i + 4)
        if (e < 0) return None
        i = e + 3
      } else if (html.startsWith("<!", i) || html.startsWith("<?", i)) {
        val e = html.indexOf('>', i + 2)
        if (e < 0) return None
        i = e + 1
      } else if (i + 1 < n &&
          (html.charAt(i + 1).isLetter || html.charAt(i + 1) == '/')) {
        val closing = html.charAt(i + 1) == '/'
        var j = i + (if (closing) 2 else 1)
        val nameStart = j
        while (j < n && html.charAt(j).isLetterOrDigit) j += 1
        if (j == nameStart) return None
        val name = lower(html.substring(nameStart, j))
        var selfClose = false
        var done = false
        while (!done) {
          if (j >= n) return None
          val cj = html.charAt(j)
          if (cj == '"' || cj == '\'') {
            val e = html.indexOf(cj, j + 1)
            if (e < 0) return None
            j = e + 1
          } else if (cj == '>') { done = true; j += 1 }
          else if (cj == '/' && j + 1 < n && html.charAt(j + 1) == '>') {
            selfClose = true; done = true; j += 2
          } else j += 1
        }
        i = j
        name match {
          case "ul" | "ol" if !closing =>
            val ord = name == "ol"
            if (stack.isEmpty) {
              stack = new LCtx({ nextListIdx += 1; nextListIdx - 1 },
                ord) :: stack
            } else if (cur.inItem) {
              if (stack.lengthCompare(2) >= 0) return None // one level
              cur.itemBuf += ' ' // a token separator, like any element
              stack = new LCtx({ nextListIdx += 1; nextListIdx - 1 },
                ord) :: stack
            } else return None // a list inside list STRUCTURE
          case "ul" | "ol" if closing =>
            if (stack.isEmpty) return None
            if ((name == "ol") != cur.ordered) return None // kind lie
            if (cur.inItem) {
              if (!recover) return None
              emitItem(cur)
            }
            stack = stack.tail
          case "li" if !closing =>
            if (stack.isEmpty) return None
            if (cur.inItem) {
              if (!recover) return None
              emitItem(cur)
            }
            cur.itemIdx += 1
            cur.inItem = true
            cur.itemBuf = new StringBuilder
          case "li" if closing =>
            if (stack.isEmpty || !cur.inItem) return None
            emitItem(cur)
          case rn if RawSkipTags.contains(rn) && !closing =>
            if (!selfClose) {
              val close = s"</$rn"
              def closesAt(e: Int): Boolean =
                html.regionMatches(true, e, close, 0, close.length) && {
                  val after = e + close.length
                  after < n && {
                    val ca = html.charAt(after)
                    ca == '>' || ca == '/' || ca.isWhitespace
                  }
                }
              var e = html.indexOf("</", j)
              while (e >= 0 && e + close.length <= n && !closesAt(e))
                e = html.indexOf("</", e + 1)
              if (e < 0 || e + close.length > n) return None
              val gt = html.indexOf('>', e)
              if (gt < 0) return None
              i = gt + 1
            }
            if (stack.nonEmpty && cur.inItem) cur.itemBuf += ' '
          case _ =>
            // any other element: a token separator inside an item,
            // page structure outside (not this walker's concern)
            if (stack.nonEmpty && cur.inItem) cur.itemBuf += ' '
        }
      } else {
        return None // bare '<'
      }
    }
    if (stack.nonEmpty) {
      if (!recover) return None
      while (stack.nonEmpty) { // EOF implies close, innermost first
        if (cur.inItem) emitItem(cur)
        stack = stack.tail
      }
    }
    Some(items.result())
  }

  /** Per-item records over real HTML: one row per extracted list item —
    * (id, list_idx, ordered, item_idx, text). Malformed markup yields
    * ONE null row (fail soft — the q245 contract). */
  def htmlListItems(df: DataFrame, idCol: String, htmlCol: String,
                    recover: Boolean = false): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", df.schema(idCol).dataType),
      StructField("list_idx", IntegerType),
      StructField("ordered", BooleanType),
      StructField("item_idx", IntegerType),
      StructField("text", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val hIdx = df.columns.indexOf(htmlCol)
    df.mapPartitions { it =>
      it.flatMap { row =>
        walkListItems(row.getString(hIdx), recover) match {
          case Some(ls) => ls.map(l =>
            Row(row.get(idIdx), l.listIdx, l.ordered, l.itemIdx, l.text))
          case None => Seq(Row(row.get(idIdx), null, null, null, null))
        }
      }
    }(enc)
  }

  /** Deterministic NESTED-list synth page for the q330/q331 gates: an
    * outer `<ul>` (list_idx 0) whose second item wraps an inner `<ol>`
    * (list_idx 1) holding ONE `<li>` per corpus token; a SIBLING
    * `<ul>` (list_idx 2) holds every 3rd token (1-based positions 1,
    * 4, 7, …). The wrapping item reads 'main … data' — 'main' before
    * the inner list, 'data' after (suspend/resume with zero leak).
    * Traps: a script fake list, a comment fake list, a quoted '>'
    * attribute and a `data-li` decoy on the outer list, inline markup
    * inside an item (joins its text). */
  def synthListHtml(text: String): String = {
    val t = text.split(" ").filter(_.nonEmpty)
    require(t.length >= 3,
      s"synthListHtml: needs >= 3 tokens, got ${t.length}")
    val sb = new StringBuilder
    sb ++= "<!DOCTYPE html><html><head><title>l</title>"
    sb ++= "<script>var l = \"<ul><li>fake</li></ul>\";</script>"
    sb ++= "</head><body>"
    sb ++= "<!-- trap: <ol><li>fake</li></ol> -->"
    sb ++= "<p>intro prose for the lists.</p>"
    sb ++= "<ul class=\"menu\" data-li=\"9\" data-note=\"n > 0\">"
    sb ++= "<li>nav <b>links</b></li>"
    sb ++= "<li>main <ol>"
    t.foreach { w => sb ++= "<li>"; sb ++= w; sb ++= "</li>" }
    sb ++= "</ol> data</li>"
    sb ++= "<li>foot</li></ul>"
    sb ++= "<ul>"
    var p = 0
    while (3 * p < t.length) {
      sb ++= "<li>"; sb ++= t(3 * p); sb ++= "</li>"
      p += 1
    }
    sb ++= "</ul>"
    sb ++= "</body></html>"
    sb.toString
  }

  /** Deterministic real-web corruption of [[synthListHtml]] — the
    * table-gate classes re-cut for lists (the q331 gate uses id % 3):
    *   0 → untouched (the strict-agreement subset);
    *   1 → IMPLIED END TAGS: every `</li>` dropped in ALL lists
    *       (`</ul>`/`</ol>` kept — the nesting boundary and list kind
    *       stay explicit);
    *   2 → truncated page: the final sibling `</ul>` and the body/html
    *       closes cut (EOF implied-close pops the open list + item) +
    *       entity dirt on every plain-text item (`&nbsp;w&mdash;` —
    *       decodes around the item text, NBSP glues). */
  def corruptSynthListHtml(text: String, cls: Int): String =
    cls match {
      case 0 => synthListHtml(text)
      case 1 => synthListHtml(text).replace("</li>", "")
      case 2 =>
        val h = synthListHtml(text)
          .stripSuffix("</body></html>") match {
            case s if s.endsWith("</ul>") => s.stripSuffix("</ul>")
            case s => s
          }
        h.replaceAll("<li>([^<&]+)</li>",
          "<li>" + entityRef("nbsp") + "$1" + entityRef("mdash") + "</li>")
      case other =>
        throw new IllegalArgumentException(
          s"corruptSynthListHtml: class must be 0-2, got $other")
    }

  /** Attach [[synthListHtml]] pages (the [[withSynthHtml]] pattern). */
  def withSynthListHtml(df: DataFrame, idCol: String, textCol: String,
                        clsOf: Long => Int = _ => 0): DataFrame = {
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("html", StringType)))
    val enc = Encoders.row(schema)
    val idIdx = df.columns.indexOf(idCol)
    val tIdx = df.columns.indexOf(textCol)
    df.mapPartitions { it =>
      it.map { row =>
        Row(row.getLong(idIdx),
          corruptSynthListHtml(row.getString(tIdx),
            clsOf(row.getLong(idIdx))))
      }
    }(enc)
  }

  /** The q330/q331 list-grid oracle CTE: every (doc, list, item) the
    * walker must emit, recomputed arithmetically from token ordinals —
    * outer ul (idx 0) items ('nav links', 'main data', 'foot'), inner
    * ol (idx 1) one item per token, sibling ul (idx 2) every 3rd token
    * (1-based positions 1, 4, 7, …). Emits (doc_id, li, ord, ii, w). */
  def listGridOracleCte: String =
    """t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), w -> w <> '')
      |    AS t
      |  FROM documents),
      |pos AS (
      |  SELECT doc_id, 0 AS li, FALSE AS ord, 0 AS ii,
      |    'nav links' AS w FROM t
      |  UNION ALL SELECT doc_id, 0, FALSE, 1, 'main data' FROM t
      |  UNION ALL SELECT doc_id, 0, FALSE, 2, 'foot' FROM t
      |  UNION ALL
      |  SELECT doc_id, 1, TRUE, i - 1, t[i]
      |  FROM t, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) ii
      |  UNION ALL
      |  SELECT doc_id, 2, FALSE, (i - 1) // 3, t[i]
      |  FROM t, LATERAL (SELECT unnest(range(1, len(t) + 1)) AS i) jj
      |  WHERE (i - 1) % 3 = 0)""".stripMargin
}
