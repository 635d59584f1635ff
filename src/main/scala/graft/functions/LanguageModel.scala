package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stupid Backoff n-gram language-model scoring (Brants et al. 2007,
  * "Large Language Models in Machine Translation" §4) — the corpus-
  * likelihood fluency signal of a CCNet-style quality filter, in the
  * exact form that was designed FOR distributed execution: the score
  *
  *   S(w3 | w1 w2) = c(w1w2w3)/c(w1w2)            if c(w1w2w3) > 0
  *                 = α · S(w3 | w2)                otherwise
  *   S(w3 | w2)    = c(w2w3)/c(w2)                 if c(w2w3) > 0
  *                 = α · S(w3)                     otherwise
  *   S(w3)         = c(w3)/N                       (0 for OOV)
  *
  * needs NO discount normalization pass over the count tables (that is
  * the paper's whole point — backoff LMs at web scale without the
  * Kneser-Ney global renormalization), so training is nothing but
  * n-gram counting.
  *
  * Scale shape:
  *  - TRAIN: ONE explode scan of the training corpus emits uni-, bi- and
  *    trigrams into a single (gram → count) table — a gram's order is
  *    self-describing (tokens carry no spaces, so an order-n gram has
  *    exactly n−1 spaces) and the one aggregate is map-side combined on
  *    near-uniform gram keys. The unigram total N reduces from the
  *    vocab-sized count table (O(vocab), not a second corpus scan) into
  *    a 1-row broadcast.
  *  - SCORE: one explode scan of the batch → trigram positions; scores
  *    are computed once per DISTINCT batch trigram (5 left joins against
  *    the count table, all keyed on distinct gram strings — no skew on
  *    the build of any of them) and joined back to positions. The
  *    join-back key is the raw trigram, which IS skewed under Zipf
  *    ("of the" everywhere) — that join is the one AQE-skew candidate in
  *    the plan and the reason scoring is factored through `distinct`
  *    rather than joining counts to positions directly. Per-doc
  *    aggregation keys on uniform doc ids.
  *  - A 100 TB corpus pays one counting scan + one shuffle to train; a
  *    daily batch pays O(batch) — the corpus count table is reusable
  *    across batches exactly like the q127 band index.
  *
  * Engine portability (the BM25 discipline): the score uses only IEEE-754
  * binary64 +,×,/ — correctly rounded, hence bit-identical across
  * engines for the same expression tree — and is floor-quantized to
  * integer micros before the per-doc sum, so the aggregate is exact
  * integer arithmetic. α = 0.4 is a stored literal parsed by both
  * engines; nested backoff multiplies α at each level (α·(α·x), never a
  * precomputed α² literal — 0.4*0.4 does not round to the same double as
  * the literal 0.16).
  */
object LanguageModel {

  /** Backoff discount (Brants et al. 2007 §4: "we use α = 0.4"). */
  val Alpha: Double = 0.4

  /** 1-based n-gram strings of order `n` over token array `t` (space-
    * joined; empty when the doc is shorter than n). */
  private def gramList(t: Column, n: Int): Column =
    if (n == 1) t
    else when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => concat_ws(" ", slice(t, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Train on `train`, score every document of `batch`: one row per batch
    * document — (idCol, n_tri, sb_micros) where sb_micros is the sum over
    * the doc's trigram positions of floor(1e6 · S). Documents with fewer
    * than 3 tokens keep their row with (0, 0) — a too-short doc scoring
    * as "no evidence" rather than vanishing is part of the filter
    * contract. */
  def stupidBackoff(train: DataFrame, batch: DataFrame,
                    idCol: String = "doc_id",
                    textCol: String = "text"): DataFrame =
    scoreAgainstCounts(trainCounts(train, textCol), batch, idCol, textCol)

  /** The TRAIN half alone: one explode scan of the corpus → the single
    * (gram, c) count table for orders 1-3 (a gram's order is
    * self-describing — n−1 spaces). This is the table to persist through
    * [[countsTap]] so daily batches score without re-counting the corpus
    * — the q127 band-index amortization. */
  def trainCounts(train: DataFrame, textCol: String = "text"): DataFrame = {
    // token array materialized BEFORE the gram lambdas: a split() subtree
    // inside transform re-evaluates per position (O(len²) per row); as an
    // attribute it splits once and the per-gram slices stay linear
    val t = col("__t")
    train
      .select(split(col(textCol), " ").as("__t"))
      .select(explode(concat(gramList(t, 1), gramList(t, 2), gramList(t, 3)))
        .as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("c"))
  }

  /** The tap a persisted count table is written through: bucketed by the
    * gram string — the key of every one of scoring's five lookups — so a
    * later batch scores with NO exchange on the count-table side: only
    * the batch's O(distinct batch grams) probe rows are exchanged into
    * the bucket layout. Size buckets so one bucket ≈ one task of count
    * rows at the target corpus scale. */
  def countsTap(table: String, buckets: Int): graft.sources.BucketedTap =
    graft.sources.BucketedTap(table, buckets, Seq("g"))

  /** The SCORE half against an existing count table ([[trainCounts]]
    * layout — read back through [[countsTap]] for the zero-exchange
    * plan). */
  def scoreAgainstCounts(counts: DataFrame, batch: DataFrame,
                         idCol: String = "doc_id",
                         textCol: String = "text"): DataFrame = {
    // unigram total N: O(vocab) reduce of the count table, 1-row broadcast
    val stats = counts.filter(!col("g").contains(" "))
      .agg(sum(col("c")).cast("double").as("n_tokens"))
    // batch trigram positions (one row per position, key = the gram text);
    // token array materialized first — see trainCounts
    val pos = batch
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .filter(size(col("__t")) >= 3)
      .select(col(idCol), explode(gramList(col("__t"), 3)).as("tg"))
    // score once per DISTINCT trigram: backoff over 5 count lookups
    val p = split(col("tg"), " ")
    val d = pos.select(col("tg")).distinct()
      .select(col("tg"),
        element_at(p, 2).as("w2"), element_at(p, 3).as("w3"),
        concat_ws(" ", element_at(p, 1), element_at(p, 2)).as("b12"),
        concat_ws(" ", element_at(p, 2), element_at(p, 3)).as("b23"))
    def cnt(alias: String) = counts.select(col("g"), col("c").as(alias))
    // the tg lookup goes LAST: the distinct-d probe arrives partitioned on
    // tg by its own aggregation exchange, and a first join keyed on tg
    // would "satisfy" the left requirement at the session partition count
    // — Spark then re-exchanges the (bucketed) count side up to match.
    // With tg last, every join's probe side adopts the count table's own
    // bucket layout instead (zero count-side exchanges at any
    // shuffle-partition setting — the q159 in-plan assert).
    val looked = d
      .join(cnt("cb12"), col("b12") === cnt("cb12")("g"), "left").drop("g")
      .join(cnt("cb23"), col("b23") === cnt("cb23")("g"), "left").drop("g")
      .join(cnt("cu2"), col("w2") === cnt("cu2")("g"), "left").drop("g")
      .join(cnt("cu3"), col("w3") === cnt("cu3")("g"), "left").drop("g")
      .join(cnt("ct"), col("tg") === cnt("ct")("g"), "left").drop("g")
      .crossJoin(broadcast(stats))
    val score =
      when(col("ct").isNotNull,
        col("ct").cast("double") / col("cb12").cast("double"))
      .otherwise(lit(Alpha) *
        when(col("cb23").isNotNull,
          col("cb23").cast("double") / col("cu2").cast("double"))
        .otherwise(lit(Alpha) *
          (coalesce(col("cu3"), lit(0L)).cast("double") / col("n_tokens"))))
    val scored = looked
      .select(col("tg"),
        floor(lit(1000000.0) * score).cast("bigint").as("s"))
    // join scores back to positions (the AQE-skew join), reduce per doc,
    // and drive from the batch side so <3-token docs keep a (0, 0) row
    val perDoc = pos.join(scored, Seq("tg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tri"), sum(col("s")).as("sb"))
    batch.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        coalesce(col("sb"), lit(0L)).as("sb_micros"))
  }

  /** Bigram-LM conditional surprisal — the CCNet perplexity-filter
    * signal in EXACT integer bits (the q115 `bin()` trick lifted from
    * marginal to conditional probabilities):
    *
    *   bits(w_i | w_{i-1}) = ⌊log2 c(w_{i-1}·)⌋ − ⌊log2 c(w_{i-1} w_i)⌋
    *
    * where c(prev·) is the CONTEXT count (occurrences of prev as the
    * left element of a bigram — the denominator under which p(·|prev)
    * sums to exactly 1; the doc-final occurrences a raw unigram count
    * would include are not contexts). ⌊log2 x⌋ = length(bin(x)) − 1 on
    * both engines, so the per-doc sum is exact integer arithmetic —
    * no libm, no float drift. Lower bits/bigram = more predictable text;
    * the filter verdict is a downstream threshold on
    * bigram_bits/n_bi, composed by the caller.
    *
    * Returns one row per document: (idCol, n_bi, bigram_bits); docs with
    * < 2 tokens keep a (0, 0) row — the [[stupidBackoff]] too-short
    * contract.
    *
    * Scale shape: one explode scan emits bigram positions; the context
    * and bigram count tables aggregate from it with map-side partials
    * (vocab- and bigram-vocab-sized). Scoring is factored through the
    * DISTINCT bigram table (the q155 discipline) — the two count joins
    * key on distinct grams, skew-free; the join BACK to positions keys
    * on the raw zipfian bigram and is the declared AQE-skew point. At
    * 100 TB the context table for a top-V vocabulary is O(V) rows —
    * broadcast it (the scale path: one broadcast + the single bigram
    * count shuffle); self-scoring here trains and scores in one pass.
    * The persisted/arrival form — [[scoreBigramBitsAgainstCounts]] over
    * [[bigramTrainCounts]] through [[bigramCountsTap]] — EXECUTES that
    * broadcast-context shape and is gated as q273 with the join plan
    * asserted in-query. */
  def bigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    // token array materialized before the slice/zip (the trainCounts
    // lambda-CSE note); adjacent pairs via slice+zip, linear per row
    val pos = docs
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol),
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("ls"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("rs"))
      .select(col(idCol), explode(arrays_zip(col("ls"), col("rs"))).as("p"))
      .select(col(idCol), col("p.ls").as("prev"),
        concat_ws(" ", col("p.ls"), col("p.rs")).as("bg"))
    val ctx = pos.groupBy(col("prev")).agg(count(lit(1)).as("c1"))
    val bic = pos.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    // score once per DISTINCT bigram (both lookups keyed on distinct
    // grams); every observed bigram has c1 ≥ c2 ≥ 1, so bits ≥ 0
    val scored = pos.select(col("bg"), col("prev")).distinct()
      .join(bic, Seq("bg"))
      .join(ctx, Seq("prev"))
      .select(col("bg"),
        ((length(bin(col("c1"))) - 1) - (length(bin(col("c2"))) - 1))
          .cast("long").as("bits"))
    val perDoc = pos.join(scored, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bi"),
        sum(col("bits")).cast("bigint").as("bigram_bits"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("bigram_bits"), lit(0L)).as("bigram_bits"))
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999 eq. 4.24) — the full CCNet-class LM filter:
    *
    *   p_KN(w | prev) = (c(prev w) − D) / c(prev·)
    *                  + D · N1+(prev·) / c(prev·) · p_cont(w)
    *   p_cont(w)      = N1+(·w) / N1+(··)
    *
    * with discount D = 0.75 (the standard value — and a DYADIC double,
    * exactly representable, the BM25-constant discipline). Self-scored
    * (train = score corpus), every position's bigram is observed, so
    * c(prev w) ≥ 1 > D and the discounted term stays positive. The
    * continuation distribution is what distinguishes KN from raw MLE
    * ([[bigramSurprisal]]): a word type that follows MANY distinct
    * contexts ("francisco" follows only "san") scores by its context
    * DIVERSITY, not its raw frequency.
    *
    * Engine portability: the score is +,−,×,/ over IEEE binary64 —
    * correctly rounded, bit-identical for the same expression tree,
    * which the oracle spells with matching parentheses — then floor-
    * quantized to integer micros per bigram BEFORE the per-doc sum
    * (exact integers from there; the [[stupidBackoff]] discipline,
    * which avoids libm log entirely). Returns (idCol, n_bi, kn_micros);
    * < 2-token docs keep a (0, 0) row.
    *
    * Scale shape: identical to [[bigramSurprisal]] — one explode scan,
    * four count tables aggregated from it (context totals, bigram
    * counts, forward type-counts N1+(prev·), backward type-counts
    * N1+(·w) — the last two from the DISTINCT-bigram type table, which
    * is also the scoring domain), a 1-row broadcast for N1+(··), and
    * the position join-back on the zipfian bigram as the declared
    * AQE-skew point. The persisted/arrival form is
    * [[scoreKneserNeyAgainstCounts]] over [[bigramTrainCounts]] —
    * gated as q274 with the bucket-local/broadcast join shape asserted
    * in-plan. */
  /** Bigram positions of a corpus: one row per adjacent token pair —
    * (prev, w, bg) with bg = "prev w". Token array materialized before
    * the slice/zip (the [[trainCounts]] lambda-CSE note); linear per
    * row. Shared by the bigram-family TRAIN/SCORE halves below; the
    * self-scoring forms ([[bigramSurprisal]]/[[kneserNeyBigram]]) keep
    * their own inlined copies so their gated plans stay byte-stable. */
  private def bigramPositions(docs: DataFrame, idCol: String,
                              textCol: String): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol),
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("ls"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("rs"))
      .select(col(idCol), explode(arrays_zip(col("ls"), col("rs"))).as("p"))
      .select(col(idCol), col("p.ls").as("prev"), col("p.rs").as("w"),
        concat_ws(" ", col("p.ls"), col("p.rs")).as("bg"))

  /** The bigram-family TRAIN half: one explode scan of the corpus → a
    * single self-describing (g, c, n1f, n1b) table serving BOTH bigram
    * filters ([[scoreBigramBitsAgainstCounts]] and
    * [[scoreKneserNeyAgainstCounts]]):
    *  - bigram rows (g has one space): c = c(prev w), n1f = n1b = 0;
    *  - unigram rows (no space): c = the CONTEXT count c(prev·)
    *    (occurrences as LEFT element — 0 for a token only ever
    *    doc-final), n1f = N1+(prev·) forward type count, n1b = N1+(·w)
    *    backward type count (0 for a token only ever doc-initial).
    * The context count and forward type count reduce in ONE aggregate
    * (count + count_distinct over the same grouping); the backward type
    * count is the only second shuffle, and both merge into the unigram
    * row via a vocab-sized full outer join — all train-once costs.
    * ntypes = Σ n1f over unigram rows, so the KN normalizer needs no
    * extra persisted row. Persist through [[bigramCountsTap]] (bucketed
    * by g) and daily batches score with ZERO count-side exchange — the
    * q159/[[countsTap]] amortization applied to the bigram family. */
  def bigramTrainCounts(train: DataFrame,
                        textCol: String = "text"): DataFrame = {
    val pos = bigramPositions(train.select(lit(0L).as("__id"),
      col(textCol)), "__id", textCol)
    val left = pos.groupBy(col("prev"))
      .agg(count(lit(1)).as("c"), count_distinct(col("bg")).as("n1f"))
    val right = pos.groupBy(col("w"))
      .agg(count_distinct(col("bg")).as("n1b"))
    val uni = left.withColumnRenamed("prev", "g")
      .join(right.withColumnRenamed("w", "g"), Seq("g"), "full")
      .select(col("g"), coalesce(col("c"), lit(0L)).as("c"),
        coalesce(col("n1f"), lit(0L)).as("n1f"),
        coalesce(col("n1b"), lit(0L)).as("n1b"))
    val bi = pos.groupBy(col("bg")).agg(count(lit(1)).as("c"))
      .select(col("bg").as("g"), col("c"),
        lit(0L).as("n1f"), lit(0L).as("n1b"))
    uni.unionAll(bi)
  }

  /** The tap a persisted bigram-family count table is written through:
    * bucketed by the gram string — the key of every scoring lookup.
    * Same sizing rule as [[countsTap]]. */
  def bigramCountsTap(table: String, buckets: Int): graft.sources.BucketedTap =
    graft.sources.BucketedTap(table, buckets, Seq("g"))

  /** [[bigramSurprisal]]'s SCORE half against a persisted
    * [[bigramTrainCounts]] table — value-identical to self-scoring when
    * batch = train (the index changes the plan, never the numbers; the
    * q159 contract), with the 100 TB join shape EXECUTED, not documented:
    *  - the bigram count lookup keys on the table's own bucket column
    *    (read through [[bigramCountsTap]] → bucket-aware scan, zero
    *    count-side exchange);
    *  - the CONTEXT lookup broadcasts the unigram slice — O(vocab) rows
    *    (cap to top-V upstream when the vocab is unbounded), which is
    *    what removes the zipfian context key from the shuffle entirely;
    *  - the join BACK to positions stays the declared AQE-skew point.
    * Arrival semantics (new in the persisted form — batch grams may be
    * absent from a FROZEN count table): a position whose CONTEXT is
    * unseen (no unigram row, or context count 0) is unsheltered evidence
    * — counted in n_oov, excluded from n_bi and the bit sum; a position
    * with a seen context but UNSEEN bigram scores ⌊log2 c1⌋ + 1 bits
    * (one bit beyond the rarest observed continuation c2 = 1, which
    * scores ⌊log2 c1⌋ — monotone, still exact integers). Self-scoring
    * has n_oov ≡ 0 and reproduces [[bigramSurprisal]] bit-for-bit.
    * Returns (idCol, n_bi, bigram_bits, n_oov); < 2-token docs keep a
    * (0, 0, 0) row. */
  def scoreBigramBitsAgainstCounts(counts: DataFrame, batch: DataFrame,
                                   idCol: String = "doc_id",
                                   textCol: String = "text"): DataFrame = {
    val pos = bigramPositions(batch, idCol, textCol)
      .select(col(idCol), col("prev"), col("bg"))
    val uniC = counts.filter(!col("g").contains(" "))
    val biC = counts.filter(col("g").contains(" "))
    val d = pos.select(col("prev"), col("bg")).distinct()
    val looked = d
      .join(biC.select(col("g"), col("c").as("c2")),
        col("bg") === col("g"), "left").drop("g")
      .join(broadcast(uniC.select(col("g"), col("c").as("c1"))),
        col("prev") === col("g"), "left").drop("g")
    val bits = when(col("c1").isNull || col("c1") === 0L,
        lit(null).cast("long"))
      .otherwise(when(col("c2").isNotNull,
        ((length(bin(col("c1"))) - 1) - (length(bin(col("c2"))) - 1))
          .cast("long"))
        .otherwise(length(bin(col("c1"))).cast("long")))
    val scored = looked.select(col("bg"), bits.as("bits"))
    val perDoc = pos.join(scored, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(col("bits")).as("n_bi"),
        sum(col("bits")).cast("bigint").as("bb"),
        count(when(col("bits").isNull, lit(1))).as("oov"))
    batch.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("bb"), lit(0L)).as("bigram_bits"),
        coalesce(col("oov"), lit(0L)).as("n_oov"))
  }

  /** [[kneserNeyBigram]]'s SCORE half against a persisted
    * [[bigramTrainCounts]] table — the same executed join shape as
    * [[scoreBigramBitsAgainstCounts]] (bucket-local bigram lookup,
    * BROADCAST unigram slice for both the context stats (c1, n1f) and
    * the continuation type count n1b, position join-back as the skew
    * point), plus the 1-row ntypes normalizer reduced from the unigram
    * slice (Σ n1f = |bigram types| — an O(vocab) scan, no second
    * corpus pass). Arrival semantics: interpolated KN SMOOTHES unseen
    * continuations natively — an unseen bigram under a seen context
    * scores max(c2−D, 0)/c1 + D·n1f/c1 · n1b/ntypes with c2 = 0 (pure
    * continuation mass; an unseen w has n1b = 0 → score 0) — so only
    * context-unseen positions are n_oov. The observed-bigram expression
    * tree is parenthesis-identical to [[kneserNeyBigram]] (max(x,0) = x
    * exactly when x > 0; coalesce over a non-null is the identity cast),
    * so self-scoring reproduces it bit-for-bit with n_oov ≡ 0.
    * Returns (idCol, n_bi, kn_micros, n_oov). */
  def scoreKneserNeyAgainstCounts(counts: DataFrame, batch: DataFrame,
                                  idCol: String = "doc_id",
                                  textCol: String = "text"): DataFrame = {
    val pos = bigramPositions(batch, idCol, textCol)
    val uniC = counts.filter(!col("g").contains(" "))
    val biC = counts.filter(col("g").contains(" "))
    val nt = uniC.agg(sum(col("n1f")).cast("double").as("ntypes"))
    val d = pos.select(col("prev"), col("w"), col("bg")).distinct()
    val looked = d
      .join(biC.select(col("g"), col("c").as("c2")),
        col("bg") === col("g"), "left").drop("g")
      .join(broadcast(uniC.select(col("g"), col("c").as("c1"),
          col("n1f").as("n1f"))),
        col("prev") === col("g"), "left").drop("g")
      .join(broadcast(uniC.select(col("g"), col("n1b").as("n1b"))),
        col("w") === col("g"), "left").drop("g")
      .crossJoin(broadcast(nt))
    val p =
      greatest(coalesce(col("c2"), lit(0L)).cast("double") - lit(0.75),
          lit(0.0)) / col("c1").cast("double") +
        ((lit(0.75) * col("n1f").cast("double")) / col("c1").cast("double")) *
          (coalesce(col("n1b"), lit(0L)).cast("double") / col("ntypes"))
    val score = when(col("c1").isNull || col("c1") === 0L,
        lit(null).cast("bigint"))
      .otherwise(floor(lit(1000000.0) * p).cast("bigint"))
    val scored = looked.select(col("bg"), score.as("s"))
    val perDoc = pos.join(scored, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(col("s")).as("n_bi"),
        sum(col("s")).cast("bigint").as("km"),
        count(when(col("s").isNull, lit(1))).as("oov"))
    batch.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("km"), lit(0L)).as("kn_micros"),
        coalesce(col("oov"), lit(0L)).as("n_oov"))
  }

  def kneserNeyBigram(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val pos = docs
      .select(col(idCol), split(col(textCol), " ").as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol),
        slice(col("__t"), lit(1), size(col("__t")) - 1).as("ls"),
        slice(col("__t"), lit(2), size(col("__t")) - 1).as("rs"))
      .select(col(idCol), explode(arrays_zip(col("ls"), col("rs"))).as("p"))
      .select(col(idCol), col("p.ls").as("prev"),
        concat_ws(" ", col("p.ls"), col("p.rs")).as("bg"))
    val ctx = pos.groupBy(col("prev")).agg(count(lit(1)).as("c1"))
    val bic = pos.groupBy(col("bg")).agg(count(lit(1)).as("c2"))
    // the bigram TYPE table: scoring domain AND source of both N1+ views
    // (tokens carry no spaces, so w recovers from the gram string)
    val typ = pos.select(col("prev"), col("bg")).distinct()
    val n1f = typ.groupBy(col("prev")).agg(count(lit(1)).as("n1f"))
    val n1b = typ
      .select(element_at(split(col("bg"), " "), 2).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n1b"))
    val nt = typ.agg(count(lit(1)).cast("double").as("ntypes"))
    val scored = typ
      .select(col("prev"), col("bg"),
        element_at(split(col("bg"), " "), 2).as("w"))
      .join(bic, Seq("bg"))
      .join(ctx, Seq("prev"))
      .join(n1f, Seq("prev"))
      .join(n1b, Seq("w"))
      .crossJoin(broadcast(nt))
      .select(col("bg"),
        floor(lit(1000000.0) * (
          (col("c2").cast("double") - lit(0.75)) / col("c1").cast("double")
          + ((lit(0.75) * col("n1f").cast("double"))
              / col("c1").cast("double"))
            * (col("n1b").cast("double") / col("ntypes"))))
          .cast("bigint").as("s"))
    val perDoc = pos.join(scored, Seq("bg"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bi"),
        sum(col("s")).cast("bigint").as("kn_micros"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bi"), lit(0L)).as("n_bi"),
        coalesce(col("kn_micros"), lit(0L)).as("kn_micros"))
  }
}
