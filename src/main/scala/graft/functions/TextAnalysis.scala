package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting.
  *
  * Everything is a pure Column expression (whole-stage codegen, no UDFs,
  * no shuffle) so a 100 TB corpus pays exactly one scan. Hash primitives
  * are md5-derived so an external SQL engine can reproduce them
  * bit-for-bit (the correctness oracle relies on this).
  */
object TextAnalysis {

  /** Whitespace tokenizer — the base of all token-level ops. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish subword segmentation regex: alpha runs, digit runs, or single
    * non-alnum marks (a common pre-tokenizer shape). */
  val PreTokenRegex = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

  def preTokens(text: Column): Column =
    regexp_extract_all(text, lit(PreTokenRegex), lit(0))

  /** 40-bit deterministic token hash: first 10 hex chars of md5 — i.e.
    * `conv(substr(md5(tok),1,10),16,10)`, computed natively by the
    * codegen'd `Md5Prefix40` expression (no hex round-trip). 40 bits keeps
    * downstream weighted sums inside exact int64 range. */
  def tokenHash(tok: Column): Column = graft.catalyst.Md5Prefix40(tok)

  /** Token count (whitespace). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** Distinct-token count. */
  def distinctTokenCount(text: Column): Column =
    size(array_distinct(tokens(text)))

  /** Mean token length ×1e6, as exact integer arithmetic (avoids float
    * division divergence across engines). */
  def meanTokenLenMicros(text: Column): Column =
    floor(aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t)) * 1000000L
      / tokenCount(text)).cast("bigint")

  /** Count of tokens contained in `words`. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*)))

  val EnStop = Seq("the", "a", "of", "and", "in", "to")
  val DeStop = Seq("der", "die", "das", "und", "ist", "nicht")
  val FrStop = Seq("le", "la", "et", "les", "des", "un")
  val EsStop = Seq("el", "los", "y", "las", "una", "por")

  /** n-gram-heuristic language ID: stopword-hit argmax with a deterministic
    * tie-break order (en > de > fr > es > unknown). */
  def langId(text: Column): Column = {
    val en = stopwordHits(text, EnStop)
    val de = stopwordHits(text, DeStop)
    val fr = stopwordHits(text, FrStop)
    val es = stopwordHits(text, EsStop)
    when(en > 0 && en >= greatest(de, fr, es), "en")
      .when(de > 0 && de >= greatest(fr, es), "de")
      .when(fr > 0 && fr >= es, "fr")
      .when(es > 0, "es")
      .otherwise("unknown")
  }

  // --- Cavnar–Trenkle character-n-gram profile language ID ---
  //
  // The stopword-argmax heuristic above ([[langId]]) only sees exact
  // function-word tokens; a CCNet/C4-class pipeline keys its funnel on a
  // PROFILE classifier: rank the document's most frequent character
  // trigrams and compare rank order against per-language reference
  // profiles ("N-Gram-Based Text Categorization", Cavnar & Trenkle 1994).
  // Everything here is scan-local, codegen'd, exact-integer: profiles are
  // broadcast literal arrays (the q143 hash-classifier discipline), the
  // doc profile is one TopGramsByCount kernel pass, and the out-of-place
  // distance is an integer fold — no driver state, no shuffle, no floats.

  /** Per-language seed text the reference profiles are built from:
    * the language's most frequent function/common words (public-knowledge
    * frequency lists). The profile is a pure function of this constant,
    * computed once at class load in plain Scala and spelled verbatim into
    * the DuckDB oracle as literal rows — one source of truth. */
  val LangSeeds: Seq[(String, String)] = Seq(
    "en" -> ("the of and to in is was he for it with as his on be at by " +
      "had not are but from or have an they which one you were her all " +
      "she there would their we him been has when who will no more if " +
      "out so said what up its about into than them can only other time"),
    "de" -> ("der die und in den von zu das mit sich des auf ist im dem " +
      "nicht ein eine als auch es an werden aus er hat dass sie nach " +
      "wird bei einer um am sind noch wie einem über einen so zum war " +
      "haben nur oder aber vor zur bis mehr durch man sein wurde sei"),
    "fr" -> ("de la le et les des en un du une que est pour qui dans a " +
      "par plus pas au sur ne se ce il sont mais comme ou si leur y ont " +
      "tout cette ses son dont aux avec ils aussi bien sans peut tous " +
      "apres jamais etre fait elle deux meme nous autre notre entre"),
    "es" -> ("de la que el en y a los del se las por un para con no una " +
      "su al lo como mas pero sus le ya o este si porque esta entre " +
      "cuando muy sin sobre tambien me hasta hay donde quien desde todo " +
      "nos durante todos uno les ni contra otros ese eso ante ellos"),
    // Breadth set (round 10): 12 more Latin-script languages, same
    // ASCII-folded convention as fr/es above (the [a-z] normalizer makes
    // diacritics and non-Latin scripts invisible, so seeds are spelled
    // the way normalized documents arrive). Appended AFTER the original
    // four so existing tie-breaks (LangSeeds order) are unchanged.
    "it" -> ("di e il la che in a per un del con non una le si dei al " +
      "sono come da su lo piu ma anche questo della nel o se hanno " +
      "essere sua ha cui gli alla loro tutti nella era dalla parte due " +
      "anni stato quando molto prima ancora dopo senza tra questa ogni"),
    "pt" -> ("de a o que e do da em um para com nao uma os no se na por " +
      "mais as dos como mas ao ele das seu sua ou quando muito nos ja " +
      "eu tambem so pelo pela ate isso ela entre depois sem mesmo aos " +
      "seus quem nas me esse eles voce essa pode ser tem foi anos"),
    "nl" -> ("de het een van en in is dat op te zijn met voor niet aan " +
      "er om ook als dan maar bij uit nog naar of worden door over ze " +
      "had hij werd heeft wordt kunnen meer tegen deze onder zich hun " +
      "al twee wel waar na mijn moet ik je dit geen andere tot"),
    "sv" -> ("och att det som en pa ar av for den till inte om har de " +
      "ett men sig fran vi sa kan man nar under ska vid mot alla sina " +
      "dar mycket nu efter andra bara in blir upp aven vara utan varit " +
      "sedan mellan genom hade honom henne detta vilket fick mest"),
    "da" -> ("og i at det en den til er som pa de med han af for ikke " +
      "der var hun jeg sig men et har om vi min havde ham hende nu " +
      "over da fra du ud sin dem os op man hvor eller hvad skal selv " +
      "her alle vil blev kunne ind dog efter ogsaa meget noget"),
    "fi" -> ("ja on ei se etta han oli joka mutta ovat kun niin myos " +
      "hanen sen olla jos kuin mina vain mukaan sita voi kaikki tai " +
      "siita ollut sille talla viela sitten koska ilman jotka seka " +
      "nain paljon oman jo kanssa mita itse tassa ennen oltava"),
    "pl" -> ("w i z na do sie nie to ze jest jak po co tak jego przez " +
      "od za ale czy tego tylko juz ma mnie byl tym go moze mi pan dla " +
      "tych przy byc sa bylo jeszcze ktory bardzo kiedy nad bez nic " +
      "oraz ktore tej byla moga nawet gdy ich tego wszystko"),
    "cs" -> ("a se na je to v z do o ze by ale jako i za po co tak " +
      "jeho k ve pro si jsem s byl jsou bylo jeste vsak od nebo ktery " +
      "pri uz pak ktere me az tim nez aby jen podle dalsi byla muze " +
      "velmi teto proto tedy take mezi clovek svou rekl"),
    "ro" -> ("de a in si la cu o pe un care este nu mai pentru se din " +
      "sau dar ca au fost sa fie dupa fara prin doua acest cand unde " +
      "sunt lor ei noi daca toate doar poate acum foarte fiind acesta " +
      "aceasta catre asupra fiecare astfel atunci ceea alte insa"),
    "hu" -> ("a az es hogy nem is egy ez van volt de ha mar csak meg " +
      "mint azt el ki most erre azert vagy mert ezt ugy annak ami " +
      "amely mi pedig lehet kell majd olyan nagy itt minden akkor " +
      "ezek abban arra neki vele ott amikor ennek egyik lesz"),
    "tr" -> ("bir ve bu da de icin ile olarak daha cok ama gibi kadar " +
      "sonra ben o ki en diye var mi ne olan onun kendi yeni ancak " +
      "bunu biz sen onu simdi bile her zaman cunku iki buyuk neden " +
      "bana beni sana seni ise oldu olur yok nasil hem"),
    "id" -> ("yang dan di dengan untuk dari pada ini itu tidak ke " +
      "dalam akan adalah oleh juga saya kami mereka ada sudah bisa " +
      "telah atau harus kita anda dia saat karena masih lebih seperti " +
      "hanya bagi secara tetapi namun setelah sebagai para banyak " +
      "kepada antara terhadap ketika bahwa belum dapat"))

  /** Reference-profile length (out-of-place penalty for absent grams)
    * and document-profile length. */
  val LangProfileSize = 64
  val DocProfileSize = 40

  /** Plain-Scala mirror of the engine-side normalize + trigram + rank
    * pipeline, used ONLY to derive the reference profiles from
    * [[LangSeeds]] (and in specs as the oracle of the kernel path). */
  def charTrigramsOf(s: String): Seq[String] = {
    val norm = " " + s.toLowerCase.replaceAll("[^a-z]+", " ").trim + " "
    if (norm.length < 3) Seq.empty
    else (0 to norm.length - 3).map(i => norm.substring(i, i + 3))
  }

  def profileOf(seed: String, k: Int = LangProfileSize): Seq[String] =
    charTrigramsOf(seed).groupBy(identity).toSeq
      .map { case (g, gs) => (g, gs.size) }
      .sortBy { case (g, c) => (-c, g) }.take(k).map(_._1)

  /** (language, ranked trigram profile) — rank i = position i (0-based). */
  lazy val LangProfiles: Seq[(String, Seq[String])] =
    LangSeeds.map { case (l, seed) => l -> profileOf(seed) }

  /** Lowercased, non-letters collapsed to single spaces, space-padded —
    * the classifier's canonical character stream. */
  def normalizedChars(text: Column): Column =
    concat(lit(" "),
      trim(regexp_replace(lower(text), "[^a-z]+", " ")), lit(" "))

  /** Character n-grams of the normalized stream (empty array when the
    * stream is shorter than n — sequence(1, 0) would REVERSE). */
  def charNgrams(text: Column, n: Int = 3): Column = {
    val s = normalizedChars(text)
    when(length(s) >= n,
      transform(sequence(lit(1), length(s) - (n - 1)), i => s.substr(i, lit(n))))
      .otherwise(lit(Array.empty[String]))
  }

  /** Integer out-of-place distance of the doc's ranked profile against a
    * reference profile literal: Σ over doc profile positions i (1-based)
    * of |i − rank_ref(g)|, with absent grams costing [[LangProfileSize]].
    * Bounded by DocProfileSize · LangProfileSize = 2560 — far inside
    * int64 for the ×1e6 threshold math. */
  private def oopDistance(docProfile: Column, ref: Seq[String]): Column = {
    val refLit = lit(ref.toArray)
    aggregate(
      zip_with(docProfile,
        sequence(lit(1), greatest(size(docProfile), lit(1))),
        (g, i) => {
          val pos = array_position(refLit, g)
          when(pos === 0L, lit(LangProfileSize.toLong))
            .otherwise(abs(pos - i.cast("long")))
        }),
      lit(0L), (acc, x) => acc + coalesce(x, lit(0L)))
  }

  /** Profile-based language ID: the language with the smallest
    * out-of-place distance (ties break in [[LangSeeds]] order), or
    * "unknown" when the doc yields no profile or the best distance
    * exceeds `unknownCutMicros` (micros of the worst possible distance,
    * size(profile)·LangProfileSize) — the distance-threshold reject of
    * the original paper in exact integer arithmetic. The 0.9 default
    * separates the measured bands: real language text scores ~0.70–0.85
    * of worst (content words pull grams outside the function-word
    * profiles), non-language noise ~0.95+. */
  def langIdProfile(text: Column,
                    unknownCutMicros: Long = 900000L,
                    useKernel: Boolean = true): Column = {
    // default path: fused CharNgramProfile + LangIdVerdict kernels (one
    // counting pass, O(1) gram-rank lookups, all inside codegen).
    // useKernel=false keeps the composed transform/substr +
    // TopGramsByCount + aggregate/zip_with/array_position Column form as
    // the oracle-mirroring reference path — FunctionsSpec pins the two
    // identical; every HOF in that chain is CodegenFallback and the
    // composition measured ~300× slower.
    if (useKernel)
      return graft.catalyst.LangIdVerdict(
        graft.catalyst.CharNgramProfile(normalizedChars(text), 3, DocProfileSize),
        unknownCutMicros)
    val prof = graft.catalyst.TopGramsByCount(
      charNgrams(text), DocProfileSize)
    val dists = LangProfiles.map { case (l, ref) => l -> oopDistance(prof, ref) }
    val best = least(dists.map(_._2): _*)
    val worst = size(prof).cast("long") * LangProfileSize
    val pick = dists.init.foldRight(lit(dists.last._1)) {
      case ((l, d), els) => when(d === best, l).otherwise(els)
    }
    when(size(prof) === 0 ||
      best * 1000000L > worst * unknownCutMicros, "unknown")
      .otherwise(pick)
  }

  /** Quality score in [0,100], integer arithmetic only:
    * + length in a healthy band, + stopword presence, − punctuation excess,
    * − very short tokens. Mirrors common heuristic quality filters. */
  def qualityScore(text: Column): Column = {
    val nChars = length(text)
    val nToks = tokenCount(text)
    val stop = stopwordHits(text, EnStop)
    val punct = size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))
    val lenScore = when(nChars.between(100, 2000), 40)
      .when(nChars.between(20, 99), 20).otherwise(0)
    val stopScore = least(stop * lit(5), lit(30)).cast("int")
    val punctPenalty =
      least(floor(punct * lit(100) / greatest(nChars, lit(1))), lit(20L)).cast("int")
    val tokScore = when(nToks >= 10, 30).when(nToks >= 3, 15).otherwise(0)
    greatest(lenScore + stopScore + tokScore - punctPenalty, lit(0)).cast("int")
  }

  /** Duplicate word-n-gram fraction ×1e6 (floor) — the Gopher/RefinedWeb
    * repetition filter family: a document whose n-grams repeat heavily is
    * boilerplate/spam. Pure Column (one scan, no shuffle); 0 for empty
    * docs. */
  def dupNgramFractionMicros(text: Column, n: Int): Column = {
    val sh = Dedup.shingles(text, n)
    val tot = size(sh).cast("long")
    val dups = tot - size(array_distinct(sh)).cast("long")
    floor(dups * 1000000L / greatest(tot, lit(1L))).cast("bigint")
  }

  /** Mass fraction ×1e6 of the single most frequent token (the other
    * standard repetition signal). O(L log L) per row: sort the tokens,
    * then one pass counting the longest equal-run — no per-row hash map,
    * no O(L²) filter-per-distinct-token, no shuffle. Native codegen
    * kernel ([[graft.catalyst.TopTokenMass]]): the equivalent
    * `array_sort` + `aggregate` Column form falls out of whole-stage
    * codegen (ArrayAggregate is CodegenFallback). */
  def topTokenFractionMicros(text: Column): Column =
    graft.catalyst.TopTokenMass(tokens(text))

  /** Positional rolling-hash document fingerprint: Σ tokenHash(tᵢ)·((i mod 8)+1)
    * mod 1e9+7 — order-sensitive (unlike a bag-of-words hash). The kernel
    * reduces mod 1e9+7 per step, so it is exact for documents of any length
    * (no int64 overflow). One-pass native kernel. */
  def fingerprint(text: Column): Column =
    graft.catalyst.RollingFingerprint(tokens(text))

  /** Adjacent-token collocation statistics — the association-mining step
    * of corpus analysis (phrase/compound discovery ahead of tokenizer
    * training). For each adjacent pair (w1, w2): corpus pair count, both
    * unigram counts, and an EXACT integer Dice score ×1e6 =
    * 2e6·c12 div (c1 + c2) — integer division, no floating-point log, so
    * the score hashes identically on any engine (PMI stays derivable from
    * the counts downstream). Top-k by (c12 desc, w1, w2): fully
    * tie-broken, deterministic.
    *
    * Scale: the pair explode is linear in tokens; both aggregations
    * shuffle on word keys — zipfian-skewed, the case AQE skew handling
    * exists for — and the unigram side is vocabulary-sized (≪ corpus), so
    * Catalyst broadcasts it when small. The top-k lowers to
    * TakeOrderedAndProject, never a global sort. Dice headroom: 2e6·c12
    * wraps int64 past c12 ≈ 4.6e12 (≈ 40 TB of one repeated pair) — shard
    * or widen to decimal beyond that. */
  def collocations(docs: org.apache.spark.sql.DataFrame,
                   textCol: String = "text",
                   minCount: Long = 2L, k: Int = 100)
      : org.apache.spark.sql.DataFrame = {
    val t = tokens(col(textCol))
    // adjacent pairs via slice+zip over a materialized token column —
    // element_at inside the lambda re-evaluates the tokenize subtree per
    // position (O(len²) per row); the zip form tokenizes once
    val pairs = docs.select(t.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(slice(col("__t"), lit(1), size(col("__t")) - 1).as("ls"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("rs"))
      .select(explode(arrays_zip(col("ls"), col("rs"))).as("p"))
      .select(col("p.ls").as("w1"), col("p.rs").as("w2"))
    val uni = docs.select(explode(t).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    pairs.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
      .filter(col("c12") >= minCount)
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .withColumn("dice_micros", expr("2000000 * c12 div (c1 + c2)"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(k)
      .select("w1", "w2", "c12", "c1", "c2", "dice_micros")
  }

  /** The full Gopher-style document quality rule battery (Rae et al. 2021
    * §A1.1 shape) as one scan-local column program — per-document rule
    * attribution bits plus the keep verdict, the document-level companion
    * to the per-line C4 rules in [[Curation.c4LineClean]]:
    *
    *   bit 1  — word count outside [minWords, maxWords]
    *   bit 2  — mean word length outside [3, 10] chars
    *   bit 4  — symbol-to-word ratio ('#', '...', '…') > 10%
    *   bit 8  — > 90% of lines start with a bullet ('- ', '* ', '• ')
    *   bit 16 — > 30% of lines end with an ellipsis
    *   bit 32 — < 80% of words contain an alphabetic character
    *   bit 64 — fewer than 2 stopword hits
    *
    * All ratios are exact integer micros (floor(n·1e6/den)) so the
    * verdict hashes identically on any engine. Zero shuffles: the whole
    * battery is one projection over the corpus scan — at 100 TB this is
    * exactly one read. Rule constants are parameters so a pipeline can
    * tighten or relax per source. */
  def gopherRules(docs: org.apache.spark.sql.DataFrame,
                  idCol: String = "doc_id", textCol: String = "text",
                  minWords: Int = 50, maxWords: Int = 100000)
      : org.apache.spark.sql.DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nToks = size(toks).cast("long")
    val lines = split(t, "\n")
    val nLines = size(lines).cast("long")
    val meanLen = meanTokenLenMicros(t)
    val symbols =
      size(regexp_extract_all(t, lit("#|\\.\\.\\.|…"), lit(0))).cast("long")
    val bulletLines = size(filter(lines, l =>
      l.startsWith("- ") || l.startsWith("* ") || l.startsWith("• ")))
      .cast("long")
    val ellipsisLines = size(filter(lines, l =>
      l.endsWith("...") || l.endsWith("…"))).cast("long")
    val alphaWords =
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long")
    def fracMicros(n: Column, den: Column): Column =
      floor(n * 1000000L / greatest(den, lit(1L))).cast("bigint")
    val rules =
      when(nToks < minWords || nToks > maxWords, 1).otherwise(0) +
        when(meanLen < 3000000L || meanLen > 10000000L, 2).otherwise(0) +
        when(fracMicros(symbols, nToks) > 100000L, 4).otherwise(0) +
        when(fracMicros(bulletLines, nLines) > 900000L, 8).otherwise(0) +
        when(fracMicros(ellipsisLines, nLines) > 300000L, 16).otherwise(0) +
        when(fracMicros(alphaWords, nToks) < 800000L, 32).otherwise(0) +
        when(stopwordHits(t, EnStop) < 2, 64).otherwise(0)
    docs.select(col(idCol), rules.cast("int").as("rules"),
      (rules === 0).as("kept"))
  }
}
