package graft

import org.apache.spark.sql.functions._
import graft.functions.Curation

/** Document-structure curation: paragraph dedup keeper semantics, the C4
  * line rule set, and the unicode normalization chain — each pinned on
  * hand-built literal inputs with hand-computed expected outputs (the
  * defense against shared-constant oracle blindness: the gated queries
  * compare Spark vs a GENERATED oracle, these compare against literals a
  * human wrote down). */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t").select(Curation.normalizeText(col("t")).as("r"))
      .collect().head.getString(0)

  test("normalizeText: unicode spaces, zero-width, controls, CRLF, collapse") {
    // ZWSP lead, tab and doubled spaces inside, CRLF — folds to
    // single-spaced prose with one newline
    assert(norm(" \u200Ba\tb  c \r\nd e ") == "a b c\nd e")
    // BOM dies; NBSP and ideographic space fold to ASCII space
    assert(norm("\uFEFFa\u00A0b\u3000c") == "a b c")
    // BEL control stripped; U+2028 line separator becomes a newline
    assert(norm("a\u0007b\u2028c") == "ab\nc")
    // ≥3 newlines fold to a paragraph break; spaces hugging newlines die
    assert(norm("a \n \n\n  \nb") == "a\n\nb")
    // already-clean text is a fixed point
    assert(norm("plain text stays") == "plain text stays")
    // all-junk collapses to empty
    assert(norm("\u200B  \t ") == "")
  }

  test("c4LineClean applies each rule independently") {
    val doc = Seq(
      "this line has enough words today.", // kept
      "short line.",                       // < 5 words
      "this line has no terminal punctuation at all", // no [.!?"]
      "a perfectly fine line except it mentions { braces }.", // brace
      "this Lorem Ipsum filler line should definitely die here.", // lorem
      "please turn on JavaScript to view this important content.", // js
      "she said \"it ends with a closing quote.\"" // kept: quote terminal
    ).mkString("\n")
    val r = Curation.c4LineClean(Seq((1L, doc)).toDF("doc_id", "text"))
      .collect().head
    assert(r.getAs[Long]("n_kept") == 2L)
    assert(r.getAs[Long]("n_dropped") == 5L)
    assert(r.getAs[String]("clean_text") ==
      "this line has enough words today.\n" +
        "she said \"it ends with a closing quote.\"")
  }

  test("dropDuplicateParagraphs keeps only the global first occurrence") {
    val docs = Seq(
      (1L, "unique prose one\nshared footer\nmore prose"),
      (2L, "shared footer\nunique prose two"),
      (3L, "shared footer")
    ).toDF("doc_id", "text")
    val r = Curation.dropDuplicateParagraphs(docs)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("clean_text"), x.getAs[Long]("n_kept"),
          x.getAs[Long]("n_dropped"))).toMap
    // keeper = min (doc_id, pos): doc 1 pos 2 wins; docs 2 and 3 lose it
    assert(r(1L) == (("unique prose one\nshared footer\nmore prose", 3L, 0L)))
    assert(r(2L) == (("unique prose two", 1L, 1L)))
    // a fully-boilerplate doc keeps its row with empty clean_text
    assert(r(3L) == (("", 0L, 1L)))
  }

  test("dropDuplicateParagraphs dedups repeats WITHIN one document too") {
    val docs = Seq((7L, "para a\npara a\npara b")).toDF("doc_id", "text")
    val r = Curation.dropDuplicateParagraphs(docs).collect().head
    assert(r.getAs[String]("clean_text") == "para a\npara b")
    assert(r.getAs[Long]("n_dropped") == 1L)
  }

  test("stripBoilerplateParagraphs: df over DISTINCT docs, losers erased " +
      "everywhere, no keeper") {
    val docs = Seq(
      (1L, "footer\nprose one\nlocal\nlocal"), // 'local' ×2 in ONE doc: df=1
      (2L, "footer\nprose two"),
      (3L, "footer\nprose three"),
      (4L, "twice only\nprose four"),
      (5L, "twice only\nprose five")           // 'twice only' df=2 < 3: kept
    ).toDF("doc_id", "text")
    val r = Curation.stripBoilerplateParagraphs(docs, minDocFreq = 3)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[String]("clean_text"), x.getAs[Long]("n_kept"),
          x.getAs[Long]("n_dropped"))).toMap
    // 'footer' df=3 → erased from ALL THREE docs (dedup would keep one)
    assert(r(1L) == (("prose one\nlocal\nlocal", 3L, 1L)))
    assert(r(2L) == (("prose two", 1L, 1L)))
    assert(r(3L) == (("prose three", 1L, 1L)))
    assert(r(4L) == (("twice only\nprose four", 2L, 0L)))
    assert(r(5L) == (("twice only\nprose five", 2L, 0L)))
    // wide (the default) ≡ narrow (the pinned legacy form) on a
    // collision-free corpus
    val wide = Curation.stripBoilerplateParagraphs(docs, minDocFreq = 3)
      .collect().map(_.toSeq).toSet
    assert(wide == Curation.stripBoilerplateParagraphs(docs, minDocFreq = 3,
      wideHash = false).collect().map(_.toSeq).toSet)
  }

  test("dropDuplicateParagraphs rejects positions outside the packable domain") {
    val doc = (1L, Seq.fill(4)("x").mkString("\n"))
    // fine at small size; the guard fires via a crafted negative id
    val bad = Seq((-1L, "a\nb")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      Curation.dropDuplicateParagraphs(bad).collect()
    }
    assert(e.getMessage.contains("packable domain") ||
      e.getCause != null &&
        e.getCause.getMessage.contains("packable domain"))
    Curation.dropDuplicateParagraphs(
      Seq(doc).toDF("doc_id", "text")).collect()
  }

  test("dropRepeatedLines keeps first occurrences; blanks are exempt") {
    val doc = Seq("nav bar", "real content one", "nav bar", "", "more text",
      "", "nav bar", "real content one").mkString("\n")
    val r = Curation.dropRepeatedLines(Seq((1L, doc)).toDF("doc_id", "text"))
      .collect().head
    // both blank separators survive; nav bar and the repeated content
    // line keep only their first occurrences
    assert(r.getAs[String]("clean_text") ==
      Seq("nav bar", "real content one", "", "more text", "").mkString("\n"))
    assert(r.getAs[Long]("n_kept") == 5L)
    assert(r.getAs[Long]("n_dropped") == 3L)
  }

  test("normalize oracle expression is generated from the same rule set") {
    // the DuckDB spelling must contain every rule's pattern verbatim
    val sql = Curation.normalizeOracleExpr("t")
    assert(sql.contains("regexp_replace"))
    assert(sql.contains("2028") && sql.contains("200B") &&
      sql.contains("FEFF") && sql.contains(" {2,}"))
  }

  test("blocklist artifact: latest version wins, k-order preserved, " +
       "empty artifact refused (the q295 loader contract)") {
    val v1 = Curation.blocklistVersionRows(spark, 1L, Seq("zz", "aa"))
    val v2 = Curation.blocklistVersionRows(spark, 2L, Seq("mm", "bb", "cc"))
    // versions arrive unioned in any order; the list order is k, NOT
    // alphabetical and NOT row order
    val (ver, terms) = Curation.loadLatestBlockTerms(
      v2.orderBy(desc("term")).unionByName(v1))
    assert(ver == 2L && terms == Seq("mm", "bb", "cc"))
    val (v, t) = Curation.loadLatestBlockTerms(v1)
    assert(v == 1L && t == Seq("zz", "aa"))
    intercept[IllegalArgumentException] {
      Curation.loadLatestBlockTerms(v1.filter(col("version") === 99L))
    }
  }

  test("card PII: Luhn gates candidates — valid spaced/dashed/bare " +
       "forms redact, a shape-matching checksum-invalid decoy survives, " +
       "no-candidate text is the identity") {
    val df = Seq(
      (1L, "pay 4111 1111 1111 1111 now"),
      (2L, "order 1234 5678 9012 3456 ref"), // shape ok, Luhn fails
      (3L, "card 4111-1111-1111-1111 and 4111111111111111"),
      (4L, "no cards 1234-5678 here")).toDF("doc_id", "text")
    val r = df.select(col("doc_id"),
        Curation.cardCount(col("text")).as("n"),
        Curation.cardScrub(col("text")).as("t"))
      .collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getString(2)))).toMap
    assert(r(1L) == ((1L, "pay <CARD> now")))
    assert(r(2L) == ((0L, "order 1234 5678 9012 3456 ref")))
    assert(r(3L) == ((2L, "card <CARD> and <CARD>")))
    assert(r(4L) == ((0L, "no cards 1234-5678 here")))
    // mixed separators are NOT one candidate (uniform-separator shape)
    val m = Seq((9L, "x 4111-1111 1111-1111 y")).toDF("doc_id", "text")
      .select(Curation.cardCount(col("text"))).collect().head.getLong(0)
    assert(m == 0L)
  }
}
