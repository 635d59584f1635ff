package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document-structure curation passes: paragraph-level exact dedup
  * (the CCNet/C4 "drop repeated paragraphs across documents" pass),
  * C4-style line-level cleaning, and unicode text normalization.
  *
  * These operate on the STRUCTURE of a document (paragraphs, lines,
  * codepoints) where [[Dedup]] operates on token windows — together they
  * are the standard web-corpus cleaning ladder: normalize → line-clean →
  * paragraph-dedup → span-dedup ([[Dedup.stripDuplicatedSpans]]) →
  * document-dedup ([[Dedup]] exact/near).
  *
  * Reference scope: extension beyond cascading ops (no paragraph/line
  * operators exist there); the per-record lowering discipline follows
  * the reference's Each pipeline (`FlinkFlowStep.java` per-record
  * chaining) — every rule here is a scan-local column program.
  */
object Curation {

  /** Packs (id, pos) into one int64 so a global "first occurrence"
    * reduces to an integer `min`: id * PosCap + pos. Both components are
    * guard-checked — the encoding is order-preserving only for
    * 0 ≤ pos < PosCap and id ≥ 0. */
  private val PosCap = 1000000L

  /** Paragraph-level exact deduplication across documents: every
    * paragraph (split on `sep`) that occurs more than once in the corpus
    * survives ONLY at its first occurrence — ordered by (document id,
    * position within document) — and is deleted everywhere else. The
    * CCNet recipe: boilerplate ("subscribe", "all rights reserved")
    * repeats across pages and dies here; unique prose is untouched.
    *
    * Returns (id, clean_text, n_kept, n_dropped) — one row per input
    * document, empty clean_text when every paragraph was a loser.
    *
    * Scale: one explode scan keyed by a 40-bit paragraph hash; the
    * duplicate-set aggregation shuffles on that uniform hash (widen to a
    * 64-bit double-prefix key past ~2^20 distinct paragraphs — the
    * [[Dedup.duplicatedSpans]] note); the join-back streams the exploded
    * side against the (much smaller) duplicated-hash set —
    * broadcast-eligible when boilerplate is rare, hash-partitioned
    * otherwise; reassembly groups per DOCUMENT (partitions bounded by
    * doc length) via array_sort — no window, deterministic on any
    * partitioning. Never all-pairs.
    *
    * `wideHash` defaults TRUE: a paragraph-hash collision here DELETES
    * REAL CONTENT (two different paragraphs conflated, the loser erased
    * corpus-wide — the q203 silent-corruption class), and any real
    * corpus clears the narrow key's ~2^20-distinct-paragraph budget.
    * The narrow form stays reachable as the legacy/oracle-mirror. */
  def dropDuplicateParagraphs(docs: DataFrame, idCol: String = "doc_id",
                              textCol: String = "text",
                              sep: String = "\n",
                              wideHash: Boolean = true): DataFrame = {
    val sepLit = java.util.regex.Pattern.quote(sep)
    val paras = docs
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), sepLit)))
      .select(col("__id"), (col("pos") + 1).as("ppos"),
        col("col").as("para"))
      // directed guards: the packed first-occurrence encoding is only
      // order-preserving inside these domains
      .withColumn("ppos", when(col("ppos") >= PosCap || col("__id") < 0,
          raise_error(concat(lit("dropDuplicateParagraphs: (id, pos) outside "
            + s"packable domain (id ≥ 0, pos < $PosCap): id="),
            col("__id"), lit(" pos="), col("ppos"))).cast("long"))
        .otherwise(col("ppos")))
      // wideHash: the 60-bit key (Md5Prefix60) — a paragraph-hash
      // collision DELETES REAL CONTENT (two different paragraphs
      // conflated, the loser erased corpus-wide), so past ~2^20 distinct
      // paragraphs the wide key is the correctness-preserving form (the
      // duplicatedSpans/winnow precedent)
      .withColumn("h",
        if (wideHash) graft.catalyst.Md5Prefix60(col("para"))
        else graft.catalyst.Md5Prefix40(col("para")))
    val dup = paras.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"),
        min(col("__id") * PosCap + col("ppos")).as("keeper"))
      .filter(col("cnt") >= 2)
      .select(col("h"), col("keeper"))
    val kept = paras.join(dup, Seq("h"), "left")
      .filter(col("keeper").isNull ||
        col("__id") * PosCap + col("ppos") === col("keeper"))
    val agg = kept.groupBy(col("__id"))
      .agg(concat_ws(sep, transform(
          array_sort(collect_list(struct(col("ppos"), col("para")))),
          x => x.getField("para"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    val nTot = paras.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_total"))
    nTot.join(agg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** Corpus-wide BOILERPLATE stripping by document frequency: every
    * paragraph appearing in ≥ `minDocFreq` DISTINCT documents is removed
    * from ALL of them — no keeper, unlike [[dropDuplicateParagraphs]]
    * (dedup preserves one copy of content; boilerplate — nav menus,
    * cookie banners, footers — is noise in every copy, the RefinedWeb /
    * CCNet boilerplate pass). Frequency counts DISTINCT docs, so a
    * paragraph repeated five times inside one page is NOT boilerplate.
    *
    * Returns (id, clean_text, n_kept, n_dropped), one row per document.
    *
    * Scale: one explode scan; the df aggregation shuffles on the uniform
    * paragraph hash (per-doc-distinct rows first, so a million-line page
    * costs its distinct paragraphs); the boilerplate set that survives
    * df ≥ K is TINY (that is what boilerplate means), so the anti-join
    * back broadcasts under AQE; reassembly is the per-document
    * array_sort — no window, deterministic on any partitioning.
    * `wideHash` defaults TRUE (the 60-bit key): a hash collision here
    * deletes real content corpus-wide, the q203 silent-corruption
    * class — the collision-safe key is the only defensible default for
    * a destructive operator; narrow stays reachable as the legacy
    * oracle-mirror. */
  def stripBoilerplateParagraphs(docs: DataFrame, idCol: String = "doc_id",
                                 textCol: String = "text",
                                 sep: String = "\n",
                                 minDocFreq: Int = 3,
                                 wideHash: Boolean = true): DataFrame = {
    require(minDocFreq >= 2,
      s"stripBoilerplateParagraphs: minDocFreq must be ≥ 2, got $minDocFreq")
    val sepLit = java.util.regex.Pattern.quote(sep)
    val paras = docs
      .select(col(idCol).as("__id"),
        posexplode(split(col(textCol), sepLit)))
      .select(col("__id"), (col("pos") + 1).as("ppos"), col("col").as("para"))
      .withColumn("h",
        if (wideHash) graft.catalyst.Md5Prefix60(col("para"))
        else graft.catalyst.Md5Prefix40(col("para")))
    val boiler = paras.select(col("h"), col("__id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("h"))
    val kept = paras.join(boiler, Seq("h"), "left_anti")
    val agg = kept.groupBy(col("__id"))
      .agg(concat_ws(sep, transform(
          array_sort(collect_list(struct(col("ppos"), col("para")))),
          x => x.getField("para"))).as("clean_text"),
        count(lit(1)).as("n_kept"))
    val nTot = paras.groupBy(col("__id"))
      .agg(count(lit(1)).as("n_total"))
    nTot.join(agg, Seq("__id"), "left")
      .select(col("__id").as(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0L))).as("n_dropped"))
  }

  /** The C4 line-filter rule set, applied to one line: keep iff the line
    * has ≥ `minWords` words, ends in terminal punctuation (. ! ? or a
    * closing quote), and contains no curly brace, no "lorem ipsum", and
    * no "javascript" (case-insensitive for the phrase rules). */
  private def c4LineKeep(ln: Column, minWords: Int): Column =
    size(filter(split(ln, " "), w => length(w) > 0)) >= minWords &&
      ln.rlike("[.!?\"]$") &&
      !ln.contains("{") && !ln.contains("}") &&
      !lower(ln).contains("lorem ipsum") &&
      !lower(ln).contains("javascript")

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): drop every
    * line failing [[c4LineKeep]] and reassemble the survivors. Purely
    * scan-local — one column program per row, no shuffle, no state;
    * whole-stage-codegen'd end to end.
    *
    * Returns (id, clean_text, n_kept, n_dropped). */
  def c4LineClean(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text",
                  minWords: Int = 5): DataFrame = {
    // materialize the line array once (the lambda-CSE discipline): a
    // split() subtree referenced by two lambdas would re-split per use
    docs.select(col(idCol), split(col(textCol), "\n").as("__l"))
      .select(col(idCol),
        filter(col("__l"), ln => c4LineKeep(ln, minWords)).as("__k"),
        size(col("__l")).as("__n"))
      .select(col(idCol),
        array_join(col("__k"), "\n").as("clean_text"),
        size(col("__k")).cast("long").as("n_kept"),
        (col("__n") - size(col("__k"))).cast("long").as("n_dropped"))
  }

  /** Intra-document repeated-line dedup: within ONE document, every line
    * keeps only its first occurrence (navigation menus, repeated
    * headers/footers inside a page). Unlike [[dropDuplicateParagraphs]]
    * this needs NO corpus-wide state — first occurrence is decided
    * against the document's own line array — so the whole op is one
    * scan-local column program: zero shuffles, no join, no window.
    *
    * Keep rule: line i survives iff `array_position(lines, line) == i`
    * (1-based first-occurrence index). Blank lines are exempt (paragraph
    * separators repeat legitimately).
    *
    * Returns (id, clean_text, n_kept, n_dropped). */
  def dropRepeatedLines(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    docs.select(col(idCol), split(col(textCol), "\n").as("__l"))
      .select(col(idCol), col("__l"),
        filter(col("__l"), (ln, i) =>
          length(ln) === 0 || array_position(col("__l"), ln) === i + 1)
          .as("__k"))
      .select(col(idCol),
        array_join(col("__k"), "\n").as("clean_text"),
        size(col("__k")).cast("long").as("n_kept"),
        (size(col("__l")) - size(col("__k"))).cast("long").as("n_dropped"))
  }

  // Normalization rule set, applied in order. Each pattern is spelled
  // with \x{...} escapes valid in BOTH Java regex (Spark) and RE2
  // (DuckDB); the DuckDB mirrors are generated from these constants via
  // [[normalizeOracleExpr]] so the two engines cannot drift.
  /** line separators → \n (CRLF first so it folds to one newline) */
  private[functions] val ReLineSep = ("\\r\\n|[\\r\\x{2028}\\x{2029}]", "\n")
  /** unicode space family + tab → ASCII space */
  private[functions] val ReSpace =
    ("[\\t\\x{00A0}\\x{1680}\\x{2000}-\\x{200A}\\x{202F}\\x{205F}\\x{3000}]",
      " ")
  /** control chars (not \t \n — already handled) + zero-width family +
    * BOM → removed */
  private[functions] val ReStrip =
    ("[\\x{0000}-\\x{0008}\\x{000B}\\x{000C}\\x{000E}-\\x{001F}\\x{007F}" +
      "\\x{200B}-\\x{200D}\\x{FEFF}]", "")
  /** runs of spaces collapse to one */
  private[functions] val ReCollapse = (" {2,}", " ")
  /** spaces hugging a newline are dropped (so collapse can't strand
    * them), then ≥3 newlines fold to a paragraph break */
  private[functions] val ReEdge = (" *\n *", "\n")
  private[functions] val ReBlank = ("\n{3,}", "\n\n")
  private val Rules =
    Seq(ReLineSep, ReSpace, ReStrip, ReCollapse, ReEdge, ReBlank)

  /** Unicode text normalization: CRLF/unicode line separators → \n,
    * unicode spaces → ASCII space, control/zero-width/BOM codepoints
    * stripped, space runs collapsed, newline edges trimmed, ≥3 blank
    * lines folded — then trimmed. One codegen'd per-row expression
    * chain; zero shuffles.
    *
    * The web-corpus pass that runs BEFORE any tokenizer or hash sees the
    * text: without it, byte-identical prose with different whitespace
    * defeats exact dedup and inflates vocabulary. */
  def normalizeText(text: Column): Column =
    trim(Rules.foldLeft(text) { case (c, (pat, rep)) =>
      regexp_replace(c, pat, rep)
    })

  /** DuckDB spelling of [[normalizeText]] over SQL expression `e` —
    * generated from the SAME rule constants (the shared-constant
    * discipline; the FunctionsSpec hand-pins examples so a wrong shared
    * constant still fails somewhere). */
  def normalizeOracleExpr(e: String): String = {
    // DuckDB '…' literals keep backslashes verbatim (no E-string
    // processing), so the Java pattern text passes through unchanged
    val chain = Rules.foldLeft(e) { case (acc, (pat, rep)) =>
      val p = pat.replace("'", "''")
      val r = rep.replace("\n", "' || chr(10) || '")
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }
    s"trim($chain)"
  }

  // --------------------------------------------------------------------
  // PII scrubbing — the redaction pass every compliance-bound training
  // pipeline runs before text leaves curation. Same shared-constant
  // discipline as normalizeText: ONE rule table drives the Spark kernel
  // chain and the DuckDB oracle spelling, in the engines' common regex
  // subset (no lookaround, no backrefs — Java regex and RE2 agree on
  // character classes, {m,n} bounds, and ASCII \b here).
  // --------------------------------------------------------------------

  /** (label, pattern, replacement token), applied in order. Emails
    * first: an address contains dotted runs the IPv4 rule could nibble
    * at if it ran earlier. Counting is defined over the ORIGINAL text
    * per rule (order-free); scrubbing is the sequential fold. */
  val PiiRules: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Sequential redaction fold — one codegen'd per-row expression chain,
    * zero shuffles (the q285 gate asserts the WHOLE plan is
    * exchange-free). */
  def piiScrub(text: Column): Column =
    PiiRules.foldLeft(text) { case (c, (_, pat, rep)) =>
      regexp_replace(c, pat, rep)
    }

  /** Match count for one rule over the original text. */
  def piiCount(text: Column, label: String): Column = {
    val pat = PiiRules.find(_._1 == label).get._2
    regexp_count(text, lit(pat)).cast("long")
  }

  /** All matches for one rule, sorted and '|'-joined — gates the
    * extracted VALUES, not just their count. */
  def piiMatches(text: Column, label: String): Column = {
    val pat = PiiRules.find(_._1 == label).get._2
    array_join(array_sort(regexp_extract_all(text, lit(pat), lit(0))), "|")
  }

  private def sq(s: String): String = s.replace("'", "''")

  /** DuckDB spelling of [[piiScrub]] over SQL expression `e`. */
  def piiScrubOracleExpr(e: String): String =
    PiiRules.foldLeft(e) { case (acc, (_, pat, rep)) =>
      s"regexp_replace($acc, '${sq(pat)}', '${sq(rep)}', 'g')"
    }

  /** DuckDB spelling of [[piiCount]]. */
  def piiCountOracleExpr(e: String, label: String): String = {
    val pat = PiiRules.find(_._1 == label).get._2
    s"CAST(len(regexp_extract_all($e, '${sq(pat)}')) AS BIGINT)"
  }

  /** DuckDB spelling of [[piiMatches]]. DuckDB's array_to_string maps an
    * EMPTY list to NULL where Spark's array_join gives '' — coalesced. */
  def piiMatchesOracleExpr(e: String, label: String): String = {
    val pat = PiiRules.find(_._1 == label).get._2
    s"coalesce(array_to_string(list_sort(" +
      s"regexp_extract_all($e, '${sq(pat)}')), '|'), '')"
  }

  // --------------------------------------------------------------------
  // CHECKSUM-VALIDATED PII: payment-card numbers. A card rule cannot be
  // a plain [[PiiRules]] regex — the shape (four 4-digit groups) matches
  // order ids, serials, and phone-ish strings constantly; real scrubbers
  // redact a candidate ONLY when its digits pass the Luhn checksum
  // (ISO/IEC 7812). Candidates come from the regex; validation is
  // Spark's `luhn_check` on the digit string; the scrub is a fold of
  // whole-string replaces over the VALID candidates only. The oracle
  // replays the Luhn arithmetic itself (double every second digit from
  // the right, subtract 9 above 9, sum % 10 = 0) — the checksum is in
  // the gate, not assumed.

  /** Card-number candidate shape: four 4-digit groups, uniform '-'/' '
    * separators or none — spelled as an explicit alternation (a
    * backreference would be Java-regex-only; DuckDB's RE2 has none). */
  val CardCandPat: String =
    "\\b(?:\\d{4}-\\d{4}-\\d{4}-\\d{4}|" +
      "\\d{4} \\d{4} \\d{4} \\d{4}|\\d{16})\\b"
  val CardReplacement: String = "<CARD>"

  private def cardCandidates(text: Column): Column =
    array_distinct(regexp_extract_all(text, lit(CardCandPat), lit(0)))

  private def luhnOk(c: Column): Column =
    call_function("luhn_check", regexp_replace(c, "[- ]", ""))

  /** Valid (Luhn-passing) candidates, sorted and '|'-joined. */
  def cardMatches(text: Column): Column =
    array_join(array_sort(filter(cardCandidates(text), luhnOk _)), "|")

  /** Count of DISTINCT valid card numbers in the text. */
  def cardCount(text: Column): Column =
    size(filter(cardCandidates(text), luhnOk _)).cast("long")

  /** Redact every valid candidate (whole-string replace fold — a
    * candidate string cannot overlap another match of the shape). */
  def cardScrub(text: Column): Column =
    aggregate(filter(cardCandidates(text), luhnOk _), text,
      (acc, c) => replace(acc, c, lit(CardReplacement)))

  /** The Luhn test in DuckDB over candidate expression `c` (a lambda
    * body — `c` must be a plain identifier). */
  private def luhnOracleExpr(c: String): String = {
    val s = s"regexp_replace($c, '[- ]', '', 'g')"
    s"((list_sum(list_transform(range(1, len($s) + 1), " +
      s"i -> CASE WHEN (len($s) - i) % 2 = 1 " +
      s"THEN CASE WHEN 2 * CAST($s[i] AS INTEGER) > 9 " +
      s"THEN 2 * CAST($s[i] AS INTEGER) - 9 " +
      s"ELSE 2 * CAST($s[i] AS INTEGER) END " +
      s"ELSE CAST($s[i] AS INTEGER) END))) % 10 = 0)"
  }

  private def cardValidOracleExpr(e: String): String =
    s"list_filter(list_distinct(regexp_extract_all($e, " +
      s"'${sq(CardCandPat)}')), c -> ${luhnOracleExpr("c")})"

  def cardCountOracleExpr(e: String): String =
    s"CAST(len(${cardValidOracleExpr(e)}) AS BIGINT)"

  def cardMatchesOracleExpr(e: String): String =
    s"coalesce(array_to_string(list_sort(" +
      s"${cardValidOracleExpr(e)}), '|'), '')"

  /** DuckDB spelling of [[cardScrub]]: fold whole-string replaces over
    * the valid candidates (list_reduce with the text prepended as the
    * accumulator seed — safe on an empty candidate list). */
  def cardScrubOracleExpr(e: String): String =
    s"list_reduce(list_prepend($e, ${cardValidOracleExpr(e)}), " +
      s"(acc, c) -> replace(acc, c, '$CardReplacement'))"

  // --------------------------------------------------------------------
  // Blocklist screening — single-pass multi-pattern matching
  // (catalyst.MultiMatch, Aho–Corasick). The other half of the
  // compliance pass next to PII redaction: a banned-term list evaluated
  // in ONE scan per document regardless of list size.
  // --------------------------------------------------------------------

  /** The q292 term list — chosen so every automaton path provably fires
    * on the synth: 'a' (same-position density), able/str/win/dow
    * (substring and cross-pattern overlap inside table/stream/window),
    * merge/key/slow (plain word hits). Counts are ALL occurrences at
    * all positions (overlapping included) — the definition the oracle
    * reproduces by brute positional enumeration. */
  val BlockTerms: Seq[String] =
    Seq("a", "merge", "str", "able", "win", "dow", "key", "slow")

  /** Per-document blocklist count vector ('|'-joined, term-list order)
    * and total, as one single-pass expression + a fold. */
  def blocklistScreen(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame =
    blocklistScreenWith(docs, BlockTerms, idCol, textCol)

  /** Versioned blocklist ARTIFACT rows: (version, k, term) — the q133
    * maintenance shape applied to the compliance list. The banned-term
    * list is a DATA artifact, not a driver-side constant: a list update
    * lands as a NEW version (plain append, no read-modify-write), and
    * scoring always rebuilds the automaton from the latest version. */
  def blocklistVersionRows(spark: org.apache.spark.sql.SparkSession,
                           version: Long, terms: Seq[String]): DataFrame = {
    import spark.implicits._
    terms.zipWithIndex
      .map { case (t, k) => (version, k.toLong, t) }
      .toDF("version", "k", "term")
  }

  /** Load the LATEST version's term list from the persisted artifact —
    * an O(versions × terms) bounded driver carry (the merge-list
    * contract: the list IS the model; the automaton rebuilds from it
    * and rides the codegen reference object into a scan-shaped pass).
    * Returns (version, terms in k order). */
  def loadLatestBlockTerms(artifact: DataFrame): (Long, Seq[String]) = {
    val rows = artifact.select(col("version").cast("long"),
        col("k").cast("long"), col("term")).collect()
    require(rows.nonEmpty, "blocklist artifact is empty")
    val latest = rows.iterator.map(_.getLong(0)).max
    val terms = rows.filter(_.getLong(0) == latest).sortBy(_.getLong(1))
      .map(_.getString(2)).toSeq
    (latest, terms)
  }

  /** [[blocklistScreen]] with the term list taken from a LOADED
    * artifact version instead of the [[BlockTerms]] constant. */
  def blocklistScreenWith(docs: DataFrame, terms: Seq[String],
                          idCol: String = "doc_id",
                          textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
      graft.catalyst.MultiMatch(col(textCol), terms).as("hits"))
      .withColumn("n_hits", expr(
        "aggregate(transform(split(hits, '\\\\|'), x -> CAST(x AS BIGINT))," +
          " 0L, (acc, x) -> acc + x)"))

  /** Oracle: brute positional enumeration — substr(text, i, len(kw)) =
    * kw over every (position, term) pair, which IS the all-occurrences
    * definition the automaton implements. */
  def blocklistOracleSql: String = {
    val kw = BlockTerms.zipWithIndex
      .map { case (t, k) => s"($k, '${sq(t)}')" }.mkString(", ")
    s"""WITH kw(k, t) AS (SELECT * FROM (VALUES $kw)),
       |cnt AS (
       |  SELECT d.doc_id, k.k,
       |    CAST(count(*) FILTER (substr(d.text, i.i, len(k.t)) = k.t)
       |      AS BIGINT) AS c
       |  FROM documents d CROSS JOIN kw k,
       |    LATERAL (SELECT unnest(range(1, len(d.text) + 1)) AS i) i
       |  GROUP BY 1, 2)
       |SELECT doc_id, string_agg(CAST(c AS VARCHAR), '|' ORDER BY k) AS hits,
       |  CAST(sum(c) AS BIGINT) AS n_hits
       |FROM cnt GROUP BY 1""".stripMargin
  }
}
