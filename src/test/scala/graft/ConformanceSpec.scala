package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.model.{CFields, FieldSelector}
import graft.pipes._
import graft.exec.Flow
import graft.sources.DataFrameTap

/** Conformance slice of the cascading-platform suite — the reference's
  * whole test oracle (`/root/reference/pom.xml:446-448` scans the
  * `cascading:cascading-platform` test jar). The jar's sources are public
  * (cascading/cascading GitHub, platform module); each case below pins one
  * SEMANTICS CORNER from a named upstream test, re-derived from its
  * documented behavior over equivalent in-memory fixtures (FIXTURES.md §A)
  * with sorted-multiset assertions (sink order is not contract —
  * SURVEY.md §7.4).
  *
  * Divergence found by this port: Cascading's `UnGroup` function had no
  * equivalent here — now implemented (`pipes/Ops.scala`) and gated as
  * q135_ungroup. */
class ConformanceSpec extends SparkSpec {
  import spark.implicits._
  implicit def s: org.apache.spark.sql.SparkSession = spark

  private def pipe(df: org.apache.spark.sql.DataFrame): Pipe =
    Pipe.source(DataFrameTap(df))
  private def rows(p: Pipe): Set[Seq[Any]] =
    Flow.toDF(p).collect().toSet.map((r: Row) => r.toSeq)
  private def lower = Seq((1, "a"), (2, "b"), (3, "c"), (4, "d"), (5, "e"))
    .toDF("num", "ch")
  private def upper = Seq((1, "A"), (2, "B"), (3, "C"), (4, "D"), (5, "E"))
    .toDF("num", "ch")

  // FieldedPipesPlatformTest.testFilterAll: a filter that rejects every
  // row must yield an EMPTY flow that still completes, keeps its schema,
  // and feeds downstream ops (the empty-aggregate corner).
  test("filter-all yields empty output with intact schema; downstream group is empty") {
    val p = pipe(lower).filterBy(ExpressionFilter("true"))
    val df = Flow.toDF(p)
    assert(df.columns.toSeq == Seq("num", "ch"))
    assert(df.count() == 0)
    val g = p.groupBy("ch").every(Aggs.count("n"))
    assert(Flow.toDF(g).count() == 0)
  }

  // FieldedPipesPlatformTest.testGroupGroup: aggregate, then aggregate the
  // aggregates (counts-of-counts) — the second GroupBy keys on a column
  // the first one CREATED.
  test("group on a grouped result (counts of counts)") {
    val df = Seq("a", "b", "a", "c", "b", "a").toDF("ch")
    val p = pipe(df).groupBy("ch").every(Aggs.count("n"))
      .groupBy("n").every(Aggs.count("n_keys"))
    // a→3, b→2, c→1: one key each at counts 1, 2, 3
    assert(rows(p) == Set(Seq(1L, 1L), Seq(2L, 1L), Seq(3L, 1L)))
  }

  // FieldedPipesPlatformTest.testChainEndingWithEach: an Each AFTER the
  // Every — per-record ops must compose over aggregation results.
  test("Each after Every transforms aggregation output") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("ch", "v")
    val p = pipe(df).groupBy("ch").every(Aggs.sum("v", "s"))
      .each(ExpressionFunction("s2", "s * 10", LongType),
        args = FieldSelector("s"), out = FieldSelector.Swap)
    assert(rows(p) == Set(Seq("a", 30L), Seq("b", 50L)))
  }

  // FieldedPipesPlatformTest.testNone: Fields.NONE as ARGUMENT selector —
  // the op receives no arguments (Insert is the canonical user) and its
  // results append to the full incoming tuple.
  test("empty argument selector feeds a zero-arg Insert, out=ALL appends") {
    val p = pipe(lower).each(
      Insert(CFields.typed("tag" -> StringType), Seq("x")),
      args = FieldSelector.Named(Nil), out = FieldSelector.All)
    val df = Flow.toDF(p)
    assert(df.columns.toSeq == Seq("num", "ch", "tag"))
    assert(rows(p).forall(_.last == "x"))
  }

  // MergePipesPlatformTest.testSplitSameSourceMerged: ONE source pipe
  // object split into differently-filtered branches and merged back —
  // memoized split + union must not duplicate or drop.
  test("same-source split branches merge back (split + merge)") {
    val src = pipe(lower)
    val a = src.filterBy(ExpressionFilter("num > 2", removeMatch = false))
    val b = src.filterBy(ExpressionFilter("num <= 2", removeMatch = false))
    // removeMatch=false keeps matches: a = {3,4,5}, b = {1,2}
    val merged = a.merge(b)
    assert(rows(merged) == rows(src))
    assert(Flow.toDF(merged).count() == 5)
  }

  // MergePipesPlatformTest.testMergeThreeChainGroup: Cascading's
  // GroupBy(Pipe[]) — a MULTI-INPUT GroupBy is an implicit merge before
  // the grouping (three inputs here, one key appearing in all three).
  test("multi-input GroupBy merges three pipes before grouping") {
    val p1 = pipe(Seq(("a", 1), ("b", 2)).toDF("ch", "v"))
    val p2 = pipe(Seq(("a", 10), ("c", 3)).toDF("ch", "v"))
    val p3 = pipe(Seq(("a", 100), ("b", 20)).toDF("ch", "v"))
    val g = GroupByPipe(Seq(p1, p2, p3), Seq("ch"), Nil)
      .every(Aggs.count("n"), Aggs.sum("v", "s"))
    assert(rows(g) == Set(Seq("a", 3L, 111L), Seq("b", 2L, 22L),
      Seq("c", 1L, 3L)))
  }

  // MergePipesPlatformTest.testMergeIntoHashJoinStreamed: a merge feeding
  // the STREAMED (big) side of a HashJoin — the broadcast build side must
  // come from the other input, and merged duplicates must each join.
  test("merge feeding a hashJoin's streamed side") {
    val dim = pipe(Seq((1, "one"), (2, "two"), (3, "three"))
      .toDF("k", "word"))
    val merged = pipe(Seq((1, "x"), (2, "y")).toDF("num", "tag"))
      .merge(pipe(Seq((2, "z"), (9, "w")).toDF("num", "tag")))
    val j = merged.hashJoin(Seq("num"), dim, Seq("k"))
    assert(rows(j) == Set(
      Seq(1, "x", 1, "one"), Seq(2, "y", 2, "two"), Seq(2, "z", 2, "two")))
  }

  // FieldedPipesPlatformTest cogroup corners: OUTER join with DUPLICATE
  // keys on both sides — matched keys produce the per-key cross product,
  // unmatched keys null-pad exactly once per row.
  test("CoGroup outer with duplicate keys: per-key cross product + null padding") {
    val l = pipe(Seq((1, "l1"), (1, "l2"), (2, "lx")).toDF("num", "lv"))
    val r = pipe(Seq((1, "r1"), (1, "r2"), (3, "rx")).toDF("num2", "rv"))
    val j = l.coGroup(Seq("num"), r, Seq("num2"), Joiner.Outer)
    val got = rows(j)
    // key 1: 2×2 cross; key 2: left-only; key 3: right-only
    assert(got == Set(
      Seq(1, "l1", 1, "r1"), Seq(1, "l1", 1, "r2"),
      Seq(1, "l2", 1, "r1"), Seq(1, "l2", 1, "r2"),
      Seq(2, "lx", null, null), Seq(null, null, 3, "rx")))
  }

  // SortedValuesPlatformTest.testComprehensiveGroupBy slice: REVERSED key
  // order combined with a DESCENDING secondary sort — both reversals must
  // apply (reference FFS:527-531 reverses keys; sort dir is per-field).
  test("reverse group order with descending secondary sort") {
    val df = Seq((1, 30), (1, 10), (2, 5), (2, 50)).toDF("k", "v")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("seq" -> StringType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        Iterator.single(Seq(rs.map(_.getInt(1)).mkString(",")))
    }
    val p = pipe(df).groupBySorted(Seq("k"), Seq("v" -> false), reverse = true)
      .buffer(b)
    // per-group value order must be descending regardless of key order
    assert(rows(p) == Set(Seq(1, "30,10"), Seq(2, "50,5")))
    // key reversal is an intra-partition ordering property: observe it via
    // the group-runner's emission order within one partition
    val one = Flow.toDF(
      pipe(df.coalesce(1)).groupBySorted(Seq("k"), Seq("v" -> false),
        reverse = true).buffer(b)).collect().map(_.getInt(0)).toSeq
    assert(one == one.sorted.reverse, s"keys not reversed: $one")
  }

  // FieldedPipesPlatformTest.testUnGroup: (key, a, b) pivots to
  // (key, a), (key, b) — one row per value selector.
  test("UnGroup pivots one row into one row per value selector") {
    val df = Seq((1, "a1", "b1"), (2, "a2", "b2")).toDF("num", "va", "vb")
    val p = pipe(df).generate(
      UnGroup(CFields.typed("num" -> IntegerType, "v" -> StringType),
        numKeys = 1, valueSelectors = Seq(Seq(1), Seq(2))),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq(1, "a1"), Seq(1, "b1"),
      Seq(2, "a2"), Seq(2, "b2")))
  }

  // FieldedPipesPlatformTest.testUnGroupBySize: selectors wider than one
  // field — size-2 chunks pivot (key, a1, a2, b1, b2) into two (key, x, y)
  // rows.
  test("UnGroup with 2-wide value selectors") {
    val df = Seq((1, "a1", "a2", "b1", "b2")).toDF("num", "x1", "x2", "y1", "y2")
    val p = pipe(df).generate(
      UnGroup(CFields.typed("num" -> IntegerType,
        "u" -> StringType, "v" -> StringType),
        numKeys = 1, valueSelectors = Seq(Seq(1, 2), Seq(3, 4))),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq(1, "a1", "a2"), Seq(1, "b1", "b2")))
  }

  // RegressionPipesPlatformTest.testUnGroupBySize: the size-based UnGroup
  // constructor — value fields chunked into consecutive groups of `size`,
  // one output row per chunk. size=1 degenerates to one row per value field.
  test("UnGroup.bySize chunks value fields into consecutive groups") {
    val df = Seq(("a", 1, 2, 3, 4), ("b", 5, 6, 7, 8))
      .toDF("key", "v1", "v2", "v3", "v4")
    val p = pipe(df).generate(
      UnGroup.bySize(CFields.typed("key" -> StringType,
        "u" -> IntegerType, "v" -> IntegerType),
        numKeys = 1, numValues = 4, groupSize = 2),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("a", 1, 2), Seq("a", 3, 4),
      Seq("b", 5, 6), Seq("b", 7, 8)))
  }

  test("UnGroup.bySize with size=1 emits one row per value field") {
    val df = Seq(("a", 1, 2, 3)).toDF("key", "v1", "v2", "v3")
    val p = pipe(df).generate(
      UnGroup.bySize(CFields.typed("key" -> StringType, "v" -> IntegerType),
        numKeys = 1, numValues = 3, groupSize = 1),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("a", 1), Seq("a", 2), Seq("a", 3)))
    intercept[IllegalArgumentException] {
      UnGroup.bySize(CFields.typed("key" -> StringType, "v" -> IntegerType),
        numKeys = 1, numValues = 3, groupSize = 2)
    }
  }

  // FieldedPipesPlatformTest.testConcatenation: merge then GROUP on the
  // merged stream — grouping keys resolve against the merged schema and
  // counts span both inputs.
  test("merge then groupBy spans both inputs (concatenation)") {
    val g = pipe(lower).merge(pipe(upper)).groupBy("num")
      .every(Aggs.count("n"))
    assert(rows(g) == (1 to 5).map(i => Seq(i, 2L)).toSet)
  }

  // FieldedPipesPlatformTest.testCopy: the degenerate Each — an Identity
  // over ALL args with RESULTS output must be a faithful copy.
  test("Identity over ALL with RESULTS is a faithful copy") {
    val p = pipe(lower).each(
      Identity(CFields.typed("num" -> IntegerType, "ch" -> StringType)),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == rows(pipe(lower)))
  }

  // CoGroupFieldedPipesPlatformTest.testCross: key-less join of 3×4 rows
  // is the full cartesian product, every pair exactly once.
  test("key-less cross emits the full cartesian product") {
    val l = pipe(Seq((1, "a"), (2, "b"), (3, "c")).toDF("n", "lc"))
    val r = pipe(Seq(("x", 10), ("y", 20), ("z", 30), ("w", 40))
      .toDF("rc", "m"))
    val got = rows(l.cross(r))
    assert(got == (for {
      (n, lc) <- Seq((1, "a"), (2, "b"), (3, "c"))
      (rc, m) <- Seq(("x", 10), ("y", 20), ("z", 30), ("w", 40))
    } yield Seq(n, lc, rc, m)).toSet)
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupAroundCoGroup: the LEFT
  // input of a CoGroup is itself a CoGroup result — keys resolve against
  // the joined schema, and the inner join drops the first join's
  // null-padded key rows (null keys never match, SURVEY §2.5).
  test("CoGroup whose left input is a CoGroup (join around join)") {
    val a = pipe(Seq((1, "a1"), (2, "a2")).toDF("ka", "va"))
    val b = pipe(Seq((1, "b1"), (3, "b3")).toDF("kb", "vb"))
    val c = pipe(Seq((1, "c1"), (2, "c2")).toDF("kc", "vc"))
    val j = a.coGroup(Seq("ka"), b, Seq("kb"), Joiner.Outer)
      .coGroup(Seq("ka"), c, Seq("kc"), Joiner.Inner)
    assert(rows(j) == Set(
      Seq(1, "a1", 1, "b1", 1, "c1"),
      Seq(2, "a2", null, null, 2, "c2")))
  }

  // JoinFieldedPipesPlatformTest.testJoinAroundJoinLeftMost: chained
  // HashJoins keep the big pipe streamed and broadcast BOTH dims — the
  // scale property upstream's streamed/accumulated distinction encodes.
  // Plan-assert zero shuffle exchanges across the whole chain.
  test("HashJoin around HashJoin: chained broadcasts, zero shuffle") {
    val facts = pipe(Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v"))
    val d1 = pipe(Seq((1, "one"), (2, "two"), (3, "three")).toDF("k1", "w1"))
    val d2 = pipe(Seq((10, "X"), (20, "Y")).toDF("k2", "w2"))
    val j = facts.hashJoin(Seq("k"), d1, Seq("k1"))
      .hashJoin(Seq("v"), d2, Seq("k2"), Joiner.Left)
    val df = Flow.toDF(j)
    assert(rows(j) == Set(
      Seq(1, 10, 1, "one", 10, "X"), Seq(2, 20, 2, "two", 20, "Y"),
      Seq(3, 30, 3, "three", null, null)))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"chained dim joins must not shuffle:\n$plan")
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe: a HashJoin of a pipe
  // WITH ITSELF (same object on both sides) — declared fields
  // disambiguate the doubled schema.
  test("self hashJoin with declared output fields") {
    val p = pipe(lower)
    val j = p.hashJoin(Seq("num"), p, Seq("num"),
      declared = Some(Seq("num1", "ch1", "num2", "ch2")))
    val ch = "abcde"
    assert(rows(j) == (1 to 5).map(i =>
      Seq(i, ch(i - 1).toString, i, ch(i - 1).toString)).toSet)
    assert(Flow.toDF(j).columns.toSeq == Seq("num1", "ch1", "num2", "ch2"))
  }

  // FieldedPipesPlatformTest.testGeneratorAggregator: a 1→N generator
  // feeding GroupBy+Every — the aggregation sees the GENERATED rows.
  test("generator output feeds aggregation (generator-aggregator)") {
    val df = Seq("a b", "b c a").toDF("line")
    val p = pipe(df).generate(RegexSplitGenerator("word", " "),
        args = FieldSelector.All)
      .groupBy("word").every(Aggs.count("n"))
    assert(rows(p) == Set(Seq("a", 2L), Seq("b", 2L), Seq("c", 1L)))
  }

  // MergePipesPlatformTest.testMergeIntoHashJoinAccumulated: the merged
  // stream feeds the ACCUMULATED (broadcast build) side of the HashJoin.
  test("merge feeding a hashJoin's accumulated side") {
    val big = pipe(Seq((1, "x"), (2, "y"), (9, "q")).toDF("num", "tag"))
    val dim = pipe(Seq((1, "one")).toDF("k", "w"))
      .merge(pipe(Seq((2, "two")).toDF("k", "w")))
    val j = big.hashJoin(Seq("num"), dim, Seq("k"))
    assert(rows(j) == Set(Seq(1, "x", 1, "one"), Seq(2, "y", 2, "two")))
  }

  // FieldedPipesPlatformTest.testSplitComplex: split AFTER an
  // aggregation, each branch filtered differently and re-aggregated —
  // the split point computes once and the branches don't interfere.
  test("split after aggregation: branches re-aggregate independently") {
    val df = Seq("a", "b", "a", "c", "b", "a", "d").toDF("ch")
    val counted = pipe(df).groupBy("ch").every(Aggs.count("n"))
    val hi = counted.filterBy(ExpressionFilter("n >= 2", removeMatch = false))
      .groupAll.every(Aggs.count("n_hi"))
    val lo = counted.filterBy(ExpressionFilter("n < 2", removeMatch = false))
      .groupAll.every(Aggs.count("n_lo"))
    assert(rows(hi) == Set(Seq(2L))) // a(3), b(2)
    assert(rows(lo) == Set(Seq(2L))) // c(1), d(1)
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupGroupBy: GroupBy directly
  // on a CoGroup result — keys on a left-side field, aggregates a
  // right-side field, duplicate join matches each counted.
  test("groupBy on a coGrouped result keys on the joined schema") {
    val l = pipe(Seq((1, "x"), (2, "y"), (3, "x")).toDF("num", "cat"))
    val r = pipe(Seq((1, 10), (2, 20), (3, 30), (1, 11)).toDF("num2", "amt"))
    val g = l.coGroup(Seq("num"), r, Seq("num2"))
      .groupBy("cat").every(Aggs.sum("amt", "s"))
    assert(rows(g) == Set(Seq("x", 51L), Seq("y", 20L)))
  }

  // Upstream resolver contract (FieldsResolverException): grouping on a
  // field the incoming pipe does not declare fails at PLAN time with an
  // error NAMING the field — not at runtime with a partial flow.
  test("groupBy on an undeclared field fails at plan time, naming the field") {
    val e = intercept[Exception] {
      Flow.toDF(pipe(lower).groupBy("nope").every(Aggs.count("n")))
    }
    assert(e.getMessage.contains("nope"),
      s"error must name the field: ${e.getMessage}")
  }

  // AssemblyHelpersPlatformTest testSumBy/testAverageBy null corner —
  // DIVERGENCE FOUND BY THIS PORT: upstream Sum/Average read arguments
  // through Tuples.toDouble(null) == 0, so a null contributes 0 and still
  // counts toward the average denominator, and an all-null group sums to
  // 0; SQL sum/avg ignore nulls (all-null group → null, avg divides by
  // the non-null count). Both modes pinned; gated cross-engine as q137.
  test("SumBy/AverageBy null coercion: upstream nulls count as zero") {
    val df = Seq(("a", Some(2)), ("a", None), ("b", None), ("b", None))
      .toDF("k", "v")
    assert(rows(pipe(df).sumByCoerced(Seq("k"), "v", "s"))
      == Set(Seq("a", 2L), Seq("b", 0L)))
    assert(rows(pipe(df).averageByCoerced(Seq("k"), "v", "m"))
      == Set(Seq("a", 1.0), Seq("b", 0.0)))
    // the SQL mode the rest of the engine keeps
    assert(rows(pipe(df).sumBy(Seq("k"), "v", "s"))
      == Set(Seq("a", 2L), Seq("b", null)))
    assert(rows(pipe(df).averageBy(Seq("k"), "v", "m"))
      == Set(Seq("a", 2.0), Seq("b", null)))
  }

  // FieldedPipesPlatformTest.testStandardChain: several Every aggregators
  // CHAINED on one GroupBy — each sees the group's argument stream and
  // all results land side by side on the grouping key.
  test("chained Every aggregators on one GroupBy emit side-by-side results") {
    val df = Seq(("x", 1), ("x", 5), ("x", 3), ("y", 7), ("y", 2))
      .toDF("k", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.count("n"), Aggs.sum("v", "s"), Aggs.min("v", "lo"),
        Aggs.max("v", "hi"))
    assert(Flow.toDF(p).columns.toSeq == Seq("k", "n", "s", "lo", "hi"))
    assert(rows(p) == Set(Seq("x", 3L, 9L, 1, 5), Seq("y", 2L, 9L, 2, 7)))
  }

  // FieldedPipesPlatformTest.testGroupBySplitGroupByJoin: aggregate, SPLIT
  // the aggregated result, re-aggregate each branch differently, then join
  // the branches back — the aggregation-diamond. Catalyst shares no
  // subplans across DAG branches, so the split point re-executes unless
  // persisted; the Pipe DSL's persist() marks it (the Cascading
  // Checkpoint discipline) and the flow must still be value-correct.
  test("aggregation diamond: group, split, re-aggregate, join back") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3), ("b", 4), ("c", 5))
      .toDF("k", "v")
    val base = pipe(df).groupBy("k").every(Aggs.sum("v", "s")).persist()
    // keep-matches filters partition the keys: hi = {s > 3} = {b:7, c:5},
    // lo = {s <= 3} = {a:3}
    val hi = base.filterBy(ExpressionFilter("s > 3", removeMatch = false))
      .rename("s" -> "s_hi")
    val lo = base.filterBy(ExpressionFilter("s <= 3", removeMatch = false))
      .rename("s" -> "s_lo", "k" -> "k2")
    val joined = hi.coGroup(Seq("k"), lo, Seq("k2"), Joiner.Inner)
    // the branches partition the keys — inner join is EMPTY, outer pads
    assert(rows(joined) == Set.empty)
    val outer = hi.coGroup(Seq("k"), lo, Seq("k2"), Joiner.Outer)
    assert(rows(outer) == Set(
      Seq(null, null, "a", 3L), Seq("b", 7L, null, null),
      Seq("c", 5L, null, null)))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupSamePipeName /
  // testCoGroupDiffFieldsSameFile: two decorated branches of the SAME
  // source joined — field resolution must keep the branches' schemas
  // distinct while the source stays shared.
  test("coGroup two decorated branches of one source") {
    val df = Seq((1, "a"), (2, "b"), (3, "a")).toDF("num", "ch")
    val src = pipe(df)
    val left = src.each(Insert(CFields.typed("side" -> StringType), Seq("L")),
      args = FieldSelector.Named(Nil), out = FieldSelector.All)
    val right = src.each(Insert(CFields.typed("side2" -> StringType), Seq("R")),
      args = FieldSelector.Named(Nil), out = FieldSelector.All)
      .rename("num" -> "num2", "ch" -> "ch2")
    val j = left.coGroup(Seq("ch"), right, Seq("ch2"), Joiner.Inner)
    val got = rows(j)
    // 'a' appears twice on each side → 4 pairs; 'b' once → 1 pair
    assert(got.size == 5)
    assert(got.forall(r => r(1) == r(4) && r(2) == "L" && r(5) == "R"))
  }

  // AssemblyHelpersPlatformTest.testFirstBy with sort fields: First takes
  // the first argument under the DECLARED sort of the argument fields,
  // not arrival order — min_by/max_by on the sort key reproduces it.
  test("FirstBy/LastBy honor the declared argument sort, not arrival order") {
    val df = Seq(("g", 9, "late"), ("g", 1, "early"), ("g", 5, "mid"),
      ("h", 2, "only")).toDF("k", "ord", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.firstBy("v", "ord", "first_v"),
        Aggs.lastBy("v", "ord", "last_v"))
    assert(rows(p) == Set(Seq("g", "early", "late"), Seq("h", "only", "only")))
  }

  // FieldedPipesPlatformTest.testSameSourceMergeThreeChainGroup: THREE
  // branches of one source merged, then grouped — merge arity beyond the
  // pairwise case over a shared source.
  test("three same-source branches merge then group (merge arity 3)") {
    val df = Seq(("a", 1), ("b", 2)).toDF("ch", "v")
    val src = pipe(df)
    val m = src.merge(src, src).groupBy("ch").every(Aggs.count("n"),
      Aggs.sum("v", "s"))
    assert(rows(m) == Set(Seq("a", 3L, 3L), Seq("b", 3L, 6L)))
  }

  // SortedValuesPlatformTest.testSortedValues: the secondary sort compares
  // by the field's DECLARED type — numeric strings order lexically
  // ("10" < "9"), ints numerically. A type-blind comparator would agree on
  // one and flip the other.
  test("secondary sort compares by declared type: lexical for strings, " +
       "numeric for ints") {
    val df = Seq(("g", "9", 9), ("g", "10", 10), ("g", "2", 2))
      .toDF("k", "s", "i")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("seq" -> StringType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        Iterator.single(Seq(rs.map(r => r.getString(1)).mkString(",")))
    }
    val lex = rows(pipe(df).groupBySorted(Seq("k"), Seq("s" -> true)).buffer(b))
    assert(lex == Set(Seq("g", "10,2,9")))
    val num = rows(pipe(df).groupBySorted(Seq("k"), Seq("i" -> true)).buffer(b))
    assert(num == Set(Seq("g", "2,9,10")))
  }

  // SortedValuesPlatformTest.testComprehensiveGroupBy (null corners):
  // Cascading's tuple comparator orders null SMALLEST — nulls lead an
  // ascending secondary sort and trail a descending one.
  test("null sort values: first under ascending, last under descending") {
    val df = Seq(("g", Integer.valueOf(5)), ("g", null.asInstanceOf[Integer]),
      ("g", Integer.valueOf(1))).toDF("k", "v")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("seq" -> StringType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        Iterator.single(Seq(rs.map(r =>
          if (r.isNullAt(1)) "N" else r.getInt(1).toString).mkString(",")))
    }
    val asc = rows(pipe(df).groupBySorted(Seq("k"), Seq("v" -> true)).buffer(b))
    assert(asc == Set(Seq("g", "N,1,5")))
    val desc = rows(pipe(df).groupBySorted(Seq("k"), Seq("v" -> false)).buffer(b))
    assert(desc == Set(Seq("g", "5,1,N")))
  }

  // TrapPlatformTest.testTrapNone: a trap on a flow where nothing fails —
  // output is complete and the trap sink holds ZERO rows (a configured
  // trap must not perturb a healthy flow).
  test("trap on a healthy flow: complete output, empty trap sink") {
    val dir = java.nio.file.Files.createTempDirectory("trapnone").toString
    val fn = new CRowFunction {
      val resultFields: CFields = CFields.typed("twice" -> IntegerType)
      def apply(args: Row): Iterator[Seq[Any]] =
        Iterator.single(Seq(args.getInt(0) * 2))
    }
    val p = pipe(lower).eachRow(fn, args = FieldSelector("num"),
      out = FieldSelector.Results,
      trap = Some(graft.sources.ParquetTap(s"$dir/trap")))
    val good = Flow.toDFWithTraps(p)
    assert(good.collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4, 6, 8, 10))
    assert(spark.read.parquet(s"$dir/trap").count() == 0)
  }

  // TrapPlatformTest.testTrapEachAllSequence: EVERY row fails — the
  // success branch is empty but keeps its schema, and the trap holds the
  // whole input (original fields, not the op's output fields).
  test("trap-all: empty success output with schema, full input in trap") {
    val dir = java.nio.file.Files.createTempDirectory("trapall").toString
    val fn = new CRowFunction {
      val resultFields: CFields = CFields.typed("x" -> IntegerType)
      def apply(args: Row): Iterator[Seq[Any]] =
        throw new IllegalStateException("always fails")
    }
    val p = pipe(lower).eachRow(fn, args = FieldSelector("num"),
      out = FieldSelector.Results,
      trap = Some(graft.sources.ParquetTap(s"$dir/trap")))
    val good = Flow.toDFWithTraps(p)
    assert(good.columns.toSeq == Seq("x"))
    assert(good.count() == 0)
    val trapped = spark.read.parquet(s"$dir/trap")
    assert(trapped.columns.toSeq == Seq("num", "ch", "__trap_err"))
    assert(trapped.select("num").collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(1, 2, 3, 4, 5))
  }

  // TrapPlatformTest.testTrapDiagnostics: the trap record carries the
  // failure diagnostic — exception class and message — alongside the
  // offending input, so a trap file is debuggable without re-running.
  test("trap rows carry the exception class and message as the diagnostic") {
    val dir = java.nio.file.Files.createTempDirectory("trapdiag").toString
    val fn = new CRowFunction {
      val resultFields: CFields = CFields.typed("x" -> IntegerType)
      def apply(args: Row): Iterator[Seq[Any]] =
        if (args.getInt(0) == 3)
          throw new IllegalArgumentException("bad tuple 3")
        else Iterator.single(Seq(args.getInt(0)))
    }
    val p = pipe(lower).eachRow(fn, args = FieldSelector("num"),
      out = FieldSelector.Results,
      trap = Some(graft.sources.ParquetTap(s"$dir/trap")))
    Flow.toDFWithTraps(p).collect()
    val err = spark.read.parquet(s"$dir/trap")
      .select("__trap_err").collect().map(_.getString(0))
    assert(err.length == 1)
    assert(err(0).contains("IllegalArgumentException") &&
      err(0).contains("bad tuple 3"), s"diagnostic: ${err(0)}")
  }

  // TapPlatformTest.testSinkDeclaredFields: a sink declaring a field
  // subset writes ONLY those fields, in declared order — projection is a
  // sink property, not a separate pipe stage upstream must remember.
  test("sink with declared fields writes the subset in declared order") {
    val dir = java.nio.file.Files.createTempDirectory("sinkdecl").toString
    val p = pipe(lower.withColumn("extra",
      org.apache.spark.sql.functions.lit("zz"))).retain("ch", "num")
    Flow.write(p, graft.sources.ParquetTap(s"$dir/out"))
    val back = spark.read.parquet(s"$dir/out")
    assert(back.columns.toSeq == Seq("ch", "num"))
    assert(back.count() == 5)
  }

  // MergePipesPlatformTest.testSimpleMergeThreeChainCoGroup: a 2-branch
  // merge FEEDING one side of a CoGroup — merge output must carry a
  // joinable schema, not just sink-able rows.
  test("merge feeding a coGroup side") {
    val a = Seq((1, "a1"), (2, "a2")).toDF("num", "v")
    val b = Seq((2, "b2"), (3, "b3")).toDF("num", "v")
    val r = Seq((1, "R1"), (2, "R2"), (3, "R3")).toDF("num2", "tag")
    val m = pipe(a).merge(pipe(b))
      .coGroup(Seq("num"), pipe(r), Seq("num2"), Joiner.Inner)
    assert(rows(m) == Set(
      Seq(1, "a1", 1, "R1"), Seq(2, "a2", 2, "R2"), Seq(2, "b2", 2, "R2"),
      Seq(3, "b3", 3, "R3")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupAfterEvery: BOTH CoGroup
  // inputs are aggregation results — the join keys on columns the
  // upstream Every stages produced.
  test("coGroup of two aggregated branches (join after Every on both sides)") {
    val l = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("ch", "v")
    val r = Seq(("a", 10), ("b", 20), ("b", 30)).toDF("ch2", "w")
    val la = pipe(l).groupBy("ch").every(Aggs.sum("v", "sv"))
    val ra = pipe(r).groupBy("ch2").every(Aggs.count("n"))
    val j = la.coGroup(Seq("ch"), ra, Seq("ch2"), Joiner.Inner)
    assert(rows(j) == Set(
      Seq("a", 3L, "a", 1L), Seq("b", 5L, "b", 2L)))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupInnerOuter: INNER then
  // OUTER joiners chained in one n-way flow — null padding appears only
  // on the outer stage, and the inner stage's drops are final.
  test("n-way coGroup chains inner then outer joiners") {
    val a = Seq((1, "A1"), (2, "A2"), (9, "A9")).toDF("ka", "va")
    val b = Seq((1, "B1"), (2, "B2")).toDF("kb", "vb")
    val c = Seq((2, "C2"), (7, "C7")).toDF("kc", "vc")
    val j = pipe(a).coGroup(Seq("ka"), pipe(b), Seq("kb"), Joiner.Inner)
      .coGroup(Seq("ka"), pipe(c), Seq("kc"), Joiner.Outer)
    // inner drops ka=9 for good; outer pads ka=1 (no c) and kc=7 (no ab)
    assert(rows(j) == Set(
      Seq(1, "A1", 1, "B1", null, null),
      Seq(2, "A2", 2, "B2", 2, "C2"),
      Seq(null, null, null, null, 7, "C7")))
  }

  // BufferPipesPlatformTest.testIdentityBuffer: a Buffer that re-emits
  // each argument row unchanged — group boundaries must not add, drop,
  // or reorder rows within the declared sort.
  test("identity buffer re-emits every row under the declared group sort") {
    val df = Seq(("g", 3), ("g", 1), ("h", 7), ("g", 2)).toDF("k", "v")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("v_out" -> IntegerType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        rs.map(r => Seq(r.getInt(1)))
    }
    val p = pipe(df).groupBySorted(Seq("k"), Seq("v" -> true)).buffer(b)
    assert(rows(p) == Set(Seq("g", 1), Seq("g", 2), Seq("g", 3), Seq("h", 7)))
    assert(Flow.toDF(p).count() == 4)
  }

  // FieldedPipesPlatformTest (GroupBy null keys): Cascading groups null
  // keys TOGETHER (one group), unlike SQL GROUP BY engines that may drop
  // them — count must see the null group as a single key.
  test("GroupBy groups null keys together as one group") {
    val df = Seq(("a", 1), (null, 2), (null, 3), ("b", 4))
      .toDF("k", "v")
    val p = pipe(df).groupBy("k").every(Aggs.count("n"), Aggs.sum("v", "s"))
    assert(rows(p) == Set(
      Seq("a", 1L, 1L), Seq(null, 2L, 5L), Seq("b", 1L, 4L)))
  }

  // HashJoinFieldedPipesPlatformTest (null keys): Cascading joins null
  // keys TO EACH OTHER in a HashJoin (hashtable equality, not SQL
  // three-valued logic) — the broadcast path must honor the same
  // null-groups-together contract as the CoGroup path (q68/q69).
  test("null-safe hashJoin matches null keys on the broadcast path") {
    val l = Seq((Integer.valueOf(1), "l1"), (null.asInstanceOf[Integer], "lN"))
      .toDF("k", "lv")
    val r = Seq((Integer.valueOf(1), "r1"), (null.asInstanceOf[Integer], "rN"))
      .toDF("k2", "rv")
    val j = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"), Joiner.Inner,
      nullSafe = true)
    assert(rows(j) == Set(
      Seq(1, "l1", 1, "r1"), Seq(null, "lN", null, "rN")))
    // the default (SQL) mode must NOT match nulls — both contracts pinned
    // (distinct key names keep both key columns, same as the null-safe form)
    val sql = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"), Joiner.Inner)
    assert(rows(sql) == Set(Seq(1, "l1", 1, "r1")))
  }

  // BufferPipesPlatformTest (selective emission): a Buffer may emit ZERO
  // rows for some groups — those groups vanish from the output entirely
  // (no null padding, no empty row), while emitting groups are intact.
  test("buffer emitting zero rows for a group drops the group") {
    val df = Seq(("keep", 1), ("keep", 2), ("drop", 9)).toDF("k", "v")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("s" -> IntegerType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] = {
        val vs = rs.map(_.getInt(1)).toSeq
        if (key.head == "drop") Iterator.empty
        else Iterator.single(Seq(vs.sum))
      }
    }
    val p = pipe(df).groupBySorted(Seq("k"), Seq("v" -> true)).buffer(b)
    assert(rows(p) == Set(Seq("keep", 3)))
  }

  // TapPlatformTest.testMultiSinkTap: one flow, two sinks — both complete
  // in a single Flow.complete() with the shared DAG lowered once.
  test("multi-sink flow writes both sinks from one shared DAG") {
    val dir = java.nio.file.Files.createTempDirectory("multisink").toString
    val src = pipe(lower)
    // ExpressionFilter is a REMOVAL predicate (Cascading Filter.isRemove)
    val evens = src.filterBy(ExpressionFilter("num % 2 = 1"))
    val odds = src.filterBy(ExpressionFilter("num % 2 = 0"))
    Flow.writeAll(Seq(
      (evens, graft.sources.ParquetTap(s"$dir/evens"), graft.sources.SinkMode.Replace),
      (odds, graft.sources.ParquetTap(s"$dir/odds"), graft.sources.SinkMode.Replace)))
    assert(spark.read.parquet(s"$dir/evens").select("num")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 4))
    assert(spark.read.parquet(s"$dir/odds").select("num")
      .collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 3, 5))
  }

  // FieldedPipesPlatformTest.testReplace: Identity with the REPLACE
  // output selector coerces an argument field IN PLACE — same name, same
  // position, new type; untouched fields keep their positions.
  test("REPLACE selector coerces a field in place, preserving position") {
    // (StringType in CFields means "untyped" — CFields.of's default — so
    // the coercion corner uses a genuinely-typed target)
    val p = pipe(lower).each(
      Identity(CFields.typed("num" -> DoubleType)),
      args = FieldSelector("num"), out = FieldSelector.Replace)
    val df = Flow.toDF(p)
    assert(df.columns.toSeq == Seq("num", "ch"))
    assert(df.schema("num").dataType == DoubleType)
    assert(rows(p) == Set(Seq(1.0, "a"), Seq(2.0, "b"), Seq(3.0, "c"),
      Seq(4.0, "d"), Seq(5.0, "e")))
  }

  // CascadePlatformTest / checkpointed multi-flow chains: flow 1 writes
  // a sink tap, flow 2 reads the SAME tap as its source — the values and
  // schema must round-trip the storage boundary (the Cascading "chained
  // taps" contract that lets pipelines compose across flows).
  test("chained flows: second flow reads the first flow's sink tap") {
    val dir = java.nio.file.Files.createTempDirectory("chainedtaps").toString
    val tap = graft.sources.ParquetTap(s"$dir/mid")
    val f1 = pipe(lower).groupBy("ch").every(Aggs.sum("num", "s"))
    Flow.write(f1, tap)
    // ExpressionFilter REMOVES matches: s < 3 drops groups a (1) and b
    // (2), keeping {3, 4, 5} → total 12 over 3 groups
    val f2 = Pipe.source(tap).filterBy(ExpressionFilter("s < 3"))
      .groupAll.every(Aggs.sum("s", "total"), Aggs.count("n"))
    assert(rows(f2) == Set(Seq(12L, 3L)))
  }

  // BufferPipesPlatformTest.testSimpleBuffer: a Buffer may emit MORE
  // rows than its group holds — here each value row plus a trailing
  // per-group total row — and the group key is replicated onto every
  // emitted row by the runner (the Cascading group-fields contract).
  test("buffer emits extra summary rows; group key replicates onto each") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val b = new CBuffer {
      val resultFields: CFields =
        CFields.typed("tag" -> StringType, "x" -> IntegerType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] = {
        var total = 0
        val vals = rs.map { r =>
          total += r.getInt(r.fieldIndex("v")); Seq("val", r.getInt(r.fieldIndex("v")))
        }.toVector
        (vals :+ Seq("sum", total)).iterator
      }
    }
    val p = pipe(df).groupBySorted(Seq("k"), Seq("v" -> true)).buffer(b)
    assert(rows(p) == Set(
      Seq("a", "val", 1), Seq("a", "val", 2), Seq("a", "sum", 3),
      Seq("b", "val", 5), Seq("b", "sum", 5)))
  }

  // AssemblyHelpersPlatformTest.testCompositeAggregateBy: several
  // AggregateBys over ONE grouping fuse into a single partial-aggregated
  // pass — exactly one shuffle for count+sum+min+max together (the
  // map-side-combine fusion the upstream composite encodes).
  test("fused multi-aggregate runs in ONE exchange (composite AggregateBy)") {
    val df = Seq(("x", 1), ("x", 5), ("y", 7)).toDF("k", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.count("n"), Aggs.sum("v", "s"), Aggs.min("v", "lo"),
        Aggs.max("v", "hi"))
    val out = Flow.toDF(p)
    out.collect()
    // AQE's toString prints final AND initial plans — count the final only
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).length
    assert(exchanges == 1, s"expected one fused exchange:\n$plan")
    // fusion evidence: all four aggregates inside ONE HashAggregate node
    assert("HashAggregate\\(keys=\\[k[^\\]]*\\], functions=\\[count\\(1\\), sum\\([^)]*\\), min\\([^)]*\\), max\\([^)]*\\)".r
      .findFirstIn(plan).isDefined, s"aggregates not fused:\n$plan")
  }

  // TrapPlatformTest.testTrapEachEveryAllChained: ONE trap tap shared by
  // an Each stage and a Buffer stage — diagnostics from BOTH granularities
  // accumulate in the same trap, and the healthy rows keep flowing.
  test("one trap tap shared across Each and Buffer stages accumulates both") {
    val dir = java.nio.file.Files.createTempDirectory("trapshared").toString
    val trap = graft.sources.ParquetTap(s"$dir/trap")
    val fn = new CRowFunction {
      val resultFields: CFields = CFields.typed("num2" -> IntegerType)
      def apply(args: Row): Iterator[Seq[Any]] =
        if (args.getInt(0) == 2) throw new IllegalStateException("each-2")
        else Iterator.single(Seq(args.getInt(0)))
    }
    val buf = new CBuffer {
      val resultFields: CFields = CFields.typed("n" -> IntegerType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] = {
        val v = rs.toVector
        if (key.head == 1) throw new IllegalStateException("buffer-1")
        Iterator.single(Seq(v.size))
      }
    }
    val p = pipe(lower)
      .eachRow(fn, args = FieldSelector("num"), out = FieldSelector.Results,
        trap = Some(trap))
      .each(Identity(CFields.typed("g" -> IntegerType)),
        args = FieldSelector("num2"), out = FieldSelector.All)
      .groupBySorted(Seq("g"), Seq("num2" -> true)).buffer(buf, Some(trap))
    val good = Flow.toDFWithTraps(p)
    // rows 1..5 minus each-trapped 2, minus buffer-trapped group 1
    assert(good.collect().map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((3, 1), (4, 1), (5, 1)))
    val errs = spark.read.parquet(s"$dir/trap")
      .select("__trap_err").collect().map(_.getString(0))
    assert(errs.exists(_.contains("each-2")) &&
      errs.exists(_.contains("buffer-1")), errs.mkString("; "))
  }

  // MergePipesPlatformTest mismatched-fields corner: Merge requires
  // IDENTICAL declared fields — a renamed or REORDERED branch must fail
  // at plan time with both schemas named (a positional union would
  // silently zip ch into num's slot).
  test("merge of mismatched or reordered schemas fails directed at plan time") {
    val renamed = pipe(lower).rename("num" -> "n")
    val e1 = intercept[IllegalArgumentException] {
      Flow.toDF(pipe(lower).merge(renamed))
    }
    assert(e1.getMessage.contains("(num, ch)") &&
      e1.getMessage.contains("(n, ch)"), e1.getMessage)
    // reordered fields are the dangerous silent case
    val reordered = pipe(lower.select("ch", "num"))
    val e2 = intercept[IllegalArgumentException] {
      Flow.toDF(pipe(lower).merge(reordered))
    }
    assert(e2.getMessage.contains("(ch, num)"), e2.getMessage)
    // identical-schema merge still works
    assert(rows(pipe(lower).merge(pipe(lower))).size == 5)
  }

  // JoinFieldedPipesPlatformTest dup-key corner: duplicate keys on the
  // hashJoin's ACCUMULATED (broadcast) side produce the per-key cross
  // product, exactly like the shuffle CoGroup.
  test("hashJoin duplicate build-side keys emit the per-key cross product") {
    val facts = pipe(Seq((1, "x"), (2, "y")).toDF("k", "v"))
    val dims = pipe(Seq((1, "a"), (1, "b"), (3, "c")).toDF("k2", "w"))
    val j = facts.hashJoin(Seq("k"), dims, Seq("k2"))
    assert(rows(j) == Set(
      Seq(1, "x", 1, "a"), Seq(1, "x", 1, "b")))
  }

  // LimitPipesPlatformTest-shaped corner: limit AFTER aggregation is a
  // GLOBAL limit over the aggregated result (not per-slice — that is
  // sliceLimit's contract), deterministic under a declared order.
  test("limit after aggregation is global and order-respecting") {
    val df = Seq(("a", 1), ("b", 2), ("c", 3), ("d", 4), ("e", 5))
      .toDF("k", "v")
    val p = pipe(df).groupBy("k").every(Aggs.sum("v", "s"))
      .orderBy("s" -> false).limit(2)
    val got = Flow.toDF(p).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("e", 5L), ("d", 4L)))
  }

  // SortedValuesPlatformTest.testCoGroupComparatorValues: field
  // comparators on a CoGroup deliver each side's value iterator SORTED
  // (upstream wires them through the co-grouping serializers). Scrambled
  // input order, ascending left / DESCENDING right — the buffer must see
  // both sides in their declared orders, per key.
  test("bufferJoinSorted delivers each side's values in its declared " +
       "order (asc left, desc right)") {
    val left = Seq(("g", 3, "l3"), ("g", 1, "l1"), ("h", 9, "l9"),
      ("g", 2, "l2")).toDF("k", "s", "lv")
    val right = Seq(("g", 10, "r10"), ("g", 30, "r30"), ("g", 20, "r20"),
      ("h", 5, "r5")).toDF("k2", "t", "rv")
    val p = pipe(left).bufferJoinSorted(Seq("k"), pipe(right), Seq("k2"),
      leftSort = Seq("s" -> true), rightSort = Seq("t" -> false),
      CFields.typed("k" -> StringType, "lseq" -> StringType,
        "rseq" -> StringType),
      (key, ls, rs) => Iterator.single(Seq(key.head,
        ls.map(_.getString(2)).mkString(","),
        rs.map(_.getString(2)).mkString(","))))
    assert(rows(p) == Set(
      Seq("g", "l1,l2,l3", "r30,r20,r10"),
      Seq("h", "l9", "r5")))
  }

  // RegressionPipesPlatformTest.testDeepPipeline: a deep chain of Each
  // stages must plan and run (upstream stresses the planner's node
  // traversal; the Spark analog is codegen/analysis depth — whole-stage
  // codegen caps out and must FALL BACK, never fail).
  test("a 60-deep Each chain plans and computes correctly") {
    val df = Seq(1, 2, 3).toDF("v")
    val deep = (1 to 60).foldLeft(pipe(df)) { (p, _) =>
      p.each(ExpressionFunction("v", "v + 1", IntegerType),
        args = FieldSelector("v"), out = FieldSelector.Swap)
    }
    assert(rows(deep) == Set(Seq(61), Seq(62), Seq(63)))
  }

  // JoinFieldedPipesPlatformTest.testJoinAfterEvery: a HashJoin directly
  // consuming an Every's aggregated output — the aggregate's schema (key
  // + aggregate fields) is the streamed side's input schema, unchanged.
  test("hashJoin directly after Every joins the aggregated rows") {
    val facts = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val dims = Seq(("a", "A"), ("b", "B"), ("c", "C")).toDF("k2", "nm")
    val p = pipe(facts).groupBy("k").every(Aggs.sum("v", "s"))
      .hashJoin(Seq("k"), pipe(dims), Seq("k2"))
    assert(rows(p) == Set(
      Seq("a", 3L, "a", "A"), Seq("b", 5L, "b", "B")))
  }

  // SortedValuesPlatformTest null-comparator corner applied to the
  // sorted cogroup: this port's declared contract is Spark's comparator
  // defaults — ascending places nulls FIRST, descending places them
  // LAST (upstream leaves null order to the user comparator; a port
  // must pick one and pin it).
  test("bufferJoinSorted null placement: asc nulls first, desc nulls last") {
    val left = Seq(("g", Integer.valueOf(2), "l2"),
      ("g", null.asInstanceOf[Integer], "lN"),
      ("g", Integer.valueOf(1), "l1")).toDF("k", "s", "lv")
    val right = Seq(("g", Integer.valueOf(5), "r5"),
      ("g", null.asInstanceOf[Integer], "rN")).toDF("k2", "t", "rv")
    val p = pipe(left).bufferJoinSorted(Seq("k"), pipe(right), Seq("k2"),
      leftSort = Seq("s" -> true), rightSort = Seq("t" -> false),
      CFields.typed("k" -> StringType, "lseq" -> StringType,
        "rseq" -> StringType),
      (key, ls, rs) => Iterator.single(Seq(key.head,
        ls.map(_.getString(2)).mkString(","),
        rs.map(_.getString(2)).mkString(","))))
    assert(rows(p) == Set(Seq("g", "lN,l1,l2", "r5,rN")))
  }

  // JoinFieldedPipesPlatformTest.testJoinGroupBy-shaped SCALE corner: a
  // GroupBy keyed on the join key must REUSE the join's hash
  // partitioning — the exchanges feeding the join are the plan's only
  // exchanges (Catalyst sees the co-partitioning; a third exchange for
  // the aggregation would re-shuffle already-placed rows).
  test("groupBy on the join key adds no exchange after the coGroup") {
    val l = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val r = Seq((1, 10), (2, 20)).toDF("k2", "w")
    val p = pipe(l).coGroup(Seq("k"), pipe(r), Seq("k2"))
      .groupBy("k").every(Aggs.count("n"))
    val df = Flow.toDF(p)
    assert(rows(p) == Set(Seq(1, 2L), Seq(2, 1L)))
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"agg re-shuffled the joined rows:\n$plan")
  }

  // JoinFieldedPipesPlatformTest.testJoinNone: Fields.NONE join keys on
  // a HashJoin = the Cartesian product (upstream routes it through the
  // same crossWithTiny path as an explicit cross).
  test("hashJoin with empty key lists is the Cartesian product") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val r = Seq(("x", 10), ("y", 20), ("z", 30)).toDF("w", "n")
    val j = pipe(l).hashJoin(Seq(), pipe(r), Seq())
    assert(Flow.toDF(j).count() == 6)
    assert(rows(j).contains(Seq(1, "a", "z", 30)))
  }

  // Coercion contract corner (the typed-fields side of testCoerce):
  // coercing a non-castable string to a numeric type follows the
  // engine's ANSI contract — a DIRECTED runtime error, never a silent
  // null (the port pins ANSI mode as its Cascading coercion semantics).
  test("coerce of a non-numeric string fails loudly, valid strings coerce") {
    val good = pipe(Seq(("1", "a"), ("2", "b")).toDF("num", "ch"))
      .coerce("num" -> LongType)
    val got = Flow.toDF(good)
    assert(got.schema("num").dataType == LongType)
    assert(rows(good) == Set(Seq(1L, "a"), Seq(2L, "b")))
    val bad = pipe(Seq(("oops", "a")).toDF("num", "ch"))
      .coerce("num" -> LongType)
    val e = intercept[Exception] { Flow.toDF(bad).collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).mkString.toLowerCase.contains("cast"),
      messages(e).mkString("\n"))
  }

  // JoinFieldedPipesPlatformTest.testJoinsIntoCoGroupLhs: a HashJoin's
  // output feeds the LEFT side of a CoGroup — the broadcast join result
  // must flow into the shuffle join with its full (joined) schema.
  test("hashJoin output feeds a CoGroup's left side intact") {
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val dim = Seq((1, "D1"), (2, "D2")).toDF("kd", "dv")
    val b = Seq((1, "b1"), (2, "b2"), (3, "b3")).toDF("kb", "bv")
    val p = pipe(a).hashJoin(Seq("k"), pipe(dim), Seq("kd"))
      .coGroup(Seq("k"), pipe(b), Seq("kb"))
    assert(rows(p) == Set(
      Seq(1, "a1", 1, "D1", 1, "b1"),
      Seq(2, "a2", 2, "D2", 2, "b2")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupSplitPipe: ONE upstream
  // pipe splits into BOTH sides of a CoGroup (self-join through a
  // split) — the split must feed both branches the same rows and the
  // join must still pair per key.
  test("a split feeding both CoGroup sides self-joins correctly") {
    val df = Seq((1, "a"), (2, "b"), (1, "c")).toDF("k", "v")
    val base = pipe(df)
    val rhs = base.rename("k" -> "k2", "v" -> "v2")
    val j = base.coGroup(Seq("k"), rhs, Seq("k2"))
    assert(rows(j) == Set(
      Seq(1, "a", 1, "a"), Seq(1, "a", 1, "c"),
      Seq(1, "c", 1, "a"), Seq(1, "c", 1, "c"),
      Seq(2, "b", 2, "b")))
  }

  // cascading.pipe.assembly.Rename contract: the rename is ATOMIC over
  // the field-name pair list — rename(("a","b"),("b","a")) SWAPS the two
  // fields. (Divergence found by this port: a sequential per-pair rename
  // collides with the still-present target name and silently duplicates
  // columns — Lowering now renames via one atomic projection.)
  test("rename swaps two field names atomically") {
    val df = Seq((1, "x"), (2, "y")).toDF("a", "b")
    val p = pipe(df).rename("a" -> "b", "b" -> "a")
    val out = Flow.toDF(p)
    assert(out.columns.toSeq == Seq("b", "a"))
    assert(rows(p) == Set(Seq(1, "x"), Seq(2, "y")))
    // renaming a missing field fails directed at plan time
    val e = intercept[IllegalArgumentException] {
      Flow.toDF(pipe(df).rename("zz" -> "q"))
    }
    assert(e.getMessage.contains("zz"))
  }

  // REPLACE output-selector contract: every result field must NAME an
  // incoming field to replace — a stray result has nothing to overwrite
  // and upstream fails the flow at plan time (silently dropping it would
  // be data loss).
  test("REPLACE with a result field naming no incoming field fails " +
    "directed at plan time") {
    val df = Seq((1, "a")).toDF("num", "ch")
    val e = intercept[IllegalArgumentException] {
      Flow.toDF(pipe(df).each(
        ExpressionFunction("nosuch", "num + 1", IntegerType),
        args = FieldSelector("num"), out = FieldSelector.Replace))
    }
    assert(e.getMessage.contains("nosuch"))
  }

  // SortedValuesPlatformTest.testComparatorValues: a CUSTOM field
  // comparator on the secondary sort. The documented Spark mapping
  // (SURVEY.md §1.3) is a derived sort-key EXPRESSION — here "order
  // strings by numeric value", which disagrees with both lexical and
  // arrival order, ascending and descending.
  test("custom comparator sorting: secondary sort by a derived " +
    "expression, both directions") {
    val df = Seq(("g", "10"), ("g", "9"), ("g", "111"), ("h", "2"),
      ("h", "12")).toDF("k", "w")
    def seqOf(asc: Boolean) = {
      val p = pipe(df)
        .groupBySorted(Seq("k"), Seq("CAST(w AS INT)" -> asc))
        .buffer(new CBuffer {
          val resultFields = CFields.typed("seq" -> StringType)
          def operate(key: Seq[Any], rows0: Iterator[Row]) =
            Iterator.single(Seq(rows0.map(_.getString(1)).mkString(",")))
        })
      rows(p)
    }
    assert(seqOf(true) == Set(Seq("g", "9,10,111"), Seq("h", "2,12")))
    assert(seqOf(false) == Set(Seq("g", "111,10,9"), Seq("h", "12,2")))
  }

  // SortedValuesPlatformTest grouping-comparator corner
  // (Fields.setComparator on the GROUPING field changes key
  // equivalence — e.g. case-insensitive grouping). Spark mapping: a
  // derived grouping key column inserted before the GroupBy, original
  // field carried through as a value.
  test("custom comparator grouping: case-insensitive key equivalence " +
    "via a derived grouping key") {
    val df = Seq(("Ab", 1), ("aB", 2), ("cd", 4), ("CD", 8))
      .toDF("w", "v")
    val p = pipe(df)
      .each(ExpressionFunction("wk", "lower(w)", StringType),
        args = FieldSelector("w"), out = FieldSelector.All)
      .groupBy("wk").every(Aggs.sum("v", "s"), Aggs.count("n"))
    assert(rows(p) == Set(Seq("ab", 3L, 2L), Seq("cd", 12L, 2L)))
  }

  // SortedValuesPlatformTest.testCoGroupComparatorValues with a CUSTOM
  // comparator: the derived sort-key column is inserted on each side
  // BEFORE the sorted cogroup and declared as that side's order — the
  // same mapping as the grouping corner, applied to both iterators.
  test("sorted cogroup under a derived-expression comparator orders " +
    "both sides numerically") {
    val left = Seq(("g", "10", "l10"), ("g", "9", "l9"))
      .toDF("k", "s", "lv")
    val right = Seq(("g", "111", "r111"), ("g", "20", "r20"))
      .toDF("k2", "t", "rv")
    val lp = pipe(left).each(
      ExpressionFunction("sn", "CAST(s AS INT)", IntegerType),
      args = FieldSelector("s"), out = FieldSelector.All)
    val rp = pipe(right).each(
      ExpressionFunction("tn", "CAST(t AS INT)", IntegerType),
      args = FieldSelector("t"), out = FieldSelector.All)
    val p = lp.bufferJoinSorted(Seq("k"), rp, Seq("k2"),
      leftSort = Seq("sn" -> true), rightSort = Seq("tn" -> false),
      CFields.typed("k" -> StringType, "lseq" -> StringType,
        "rseq" -> StringType),
      (key, ls, rs) => Iterator.single(Seq(key.head,
        ls.map(_.getString(2)).mkString(","),
        rs.map(_.getString(2)).mkString(","))))
    assert(rows(p) == Set(Seq("g", "l9,l10", "r111,r20")))
  }

  // JoinFieldedPipesPlatformTest.testJoinAroundJoinRightMost: the first
  // HashJoin's output becomes the ACCUMULATED (build) side of the
  // second — the previous chain corner streams it; this one broadcasts
  // a broadcast result.
  test("hashJoin output as the accumulated side of a second hashJoin") {
    val a = Seq((1, "a1"), (2, "a2")).toDF("k", "av")
    val b = Seq((1, "b1"), (2, "b2")).toDF("kb", "bv")
    val c = Seq((1, "c1"), (2, "c2"), (3, "c3")).toDF("kc", "cv")
    val inner = pipe(a).hashJoin(Seq("k"), pipe(b), Seq("kb"))
    val p = pipe(c).hashJoin(Seq("kc"), inner, Seq("k"))
    assert(rows(p) == Set(
      Seq(1, "c1", 1, "a1", 1, "b1"),
      Seq(2, "c2", 2, "a2", 2, "b2")))
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe: both join sides read
  // the SAME TAP as independent pipes (not a split) — the self-join
  // must pair per key exactly like distinct sources.
  test("hashJoin of two independent reads of one tap self-joins per key") {
    val df = Seq((1, "a"), (2, "b"), (1, "c")).toDF("k", "v")
    val l = pipe(df)
    val r = pipe(df).rename("k" -> "k2", "v" -> "v2")
    val p = l.hashJoin(Seq("k"), r, Seq("k2"))
    assert(rows(p) == Set(
      Seq(1, "a", 1, "a"), Seq(1, "a", 1, "c"),
      Seq(1, "c", 1, "a"), Seq(1, "c", 1, "c"),
      Seq(2, "b", 2, "b")))
  }

  // CoGroupFieldedPipesPlatformTest outer-join field independence: a
  // CoGroup on DIFFERENTLY-NAMED keys keeps both key columns, and OUTER
  // padding nulls each side's keys independently (upstream emits the
  // full declared tuple with nulls on the absent side).
  test("outer coGroup on differently-named keys pads each side's key " +
    "column independently") {
    val l = Seq((1, "a"), (2, "b")).toDF("num", "v")
    val r = Seq((2, "B"), (3, "C")).toDF("id", "w")
    val p = pipe(l).coGroup(Seq("num"), pipe(r), Seq("id"), Joiner.Outer)
    assert(rows(p) == Set(
      Seq(1, "a", null, null),
      Seq(2, "b", 2, "B"),
      Seq(null, null, 3, "C")))
  }

  // cascading.operation.filter.Logic (And over legs with DISTINCT
  // argument selectors): upstream And/Or accept (selector, filter)
  // pairs; the port's documented equivalent composes ExpressionFilters
  // whose expressions each name their own argument fields.
  test("composed And/Not filters referencing different fields") {
    val df = Seq((1, "a"), (5, "a"), (1, "z"), (5, "z")).toDF("n", "c")
    // REMOVE rows where (n > 3) AND NOT(c = 'z') — keeps everything else
    val p = pipe(df).filterBy(AndFilter(
      ExpressionFilter("n > 3", removeMatch = true),
      NotFilter(ExpressionFilter("c = 'z'"))))
    assert(rows(p) == Set(Seq(1, "a"), Seq(1, "z"), Seq(5, "z")))
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipeAroundGroupBy: one
  // branch of a split aggregates, the other does not, and a HashJoin
  // re-joins them — the asymmetric split-join diamond.
  test("split-join diamond: raw branch hashJoins its own aggregate") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val base = pipe(df)
    val agg = base.groupBy("k").every(Aggs.sum("v", "s"))
      .rename("k" -> "ka")
    val p = base.hashJoin(Seq("k"), agg, Seq("ka"))
    assert(rows(p) == Set(
      Seq("a", 1, "a", 3L), Seq("a", 2, "a", 3L), Seq("b", 5, "b", 5L)))
  }

  // cascading.pipe.assembly.Unique contract: dedup by a FIELD SUBSET
  // keeps whole first tuples — the output schema retains every field,
  // one row per key, and each emitted row is one of that key's input
  // rows verbatim.
  test("unique by a subset keeps one whole tuple per key from the " +
    "key's own rows") {
    val df = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val p = pipe(df).unique("k")
    val out = Flow.toDF(p)
    assert(out.columns.toSeq == Seq("k", "v"))
    val got = out.collect().map(_.toSeq)
    assert(got.map(_.head).toSet == Set(1, 2))
    assert(got.length == 2)
    val byKey = Map(1 -> Set("a", "b"), 2 -> Set("c"))
    got.foreach { r =>
      assert(byKey(r.head.asInstanceOf[Int])
        .contains(r(1).asInstanceOf[String]))
    }
  }

  // Discard-after-Every (the Discard assembly on an aggregation
  // result): dropping the grouping key keeps only aggregate columns.
  test("discard of the grouping key after aggregation") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val p = pipe(df).groupBy("k").every(Aggs.sum("v", "s")).discard("k")
    val out = Flow.toDF(p)
    assert(out.columns.toSeq == Seq("s"))
    assert(rows(p) == Set(Seq(3L), Seq(5L)))
  }

  // FieldedPipesPlatformTest.testSameSourceMerge: the SAME tap read as
  // two independent pipes and merged — the union must double the
  // multiset (not dedupe, not collapse the shared scan's rows).
  test("merge of two independent reads of one tap doubles the multiset") {
    val df = Seq((1, "a"), (2, "b")).toDF("k", "v")
    val p = pipe(df).merge(pipe(df)).groupBy("k").every(Aggs.count("n"))
    assert(rows(p) == Set(Seq(1, 2L), Seq(2, 2L)))
  }

  // Every with the GROUP KEY among its argument fields: upstream allows
  // aggregator args to include grouping fields (count of distinct key
  // occurrences rides the key column itself).
  test("aggregator arguments may include the grouping key") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.countArg("k", "nk"), Aggs.max("v", "mx"))
    assert(rows(p) == Set(Seq("a", 2L, 2), Seq("b", 1L, 5)))
  }

  // FieldedPipesPlatformTest.testSplitOut: the two branches of a split
  // apply DIFFERENT Each transforms, align schemas, and merge — the
  // asymmetric split-merge (the existing corner merges identical
  // branches).
  test("split branches diverge through different Eaches then merge") {
    val df = Seq((1, "a"), (2, "b")).toDF("num", "ch")
    val base = pipe(df)
    val doubled = base.each(
      ExpressionFunction("v", "num * 2", IntegerType),
      args = FieldSelector("num"), out = FieldSelector.Results)
    val negated = base.each(
      ExpressionFunction("v", "-num", IntegerType),
      args = FieldSelector("num"), out = FieldSelector.Results)
    val p = doubled.merge(negated)
    assert(rows(p) == Set(Seq(2), Seq(4), Seq(-1), Seq(-2)))
  }

  // CoGroup nesting on the RIGHT: a CoGroup whose RIGHT input is itself
  // a CoGroup (the existing join-around-join corner nests on the left).
  test("CoGroup whose right input is a CoGroup") {
    val a = Seq((1, "a1"), (2, "a2")).toDF("ka", "av")
    val b = Seq((1, "b1"), (2, "b2")).toDF("kb", "bv")
    val c = Seq((1, "c1"), (3, "c3")).toDF("kc", "cv")
    val inner = pipe(b).coGroup(Seq("kb"), pipe(c), Seq("kc"))
    val p = pipe(a).coGroup(Seq("ka"), inner, Seq("kb"))
    assert(rows(p) == Set(Seq(1, "a1", 1, "b1", 1, "c1")))
  }

  // HashJoin LEFT-joiner contract: unmatched streamed rows survive with
  // null padding, and duplicate build-side keys still cross per key.
  test("hashJoin left joiner pads unmatched rows and crosses dup build " +
    "keys") {
    val l = Seq((1, "a"), (2, "b"), (3, "c")).toDF("k", "v")
    val r = Seq((1, "X"), (1, "Y")).toDF("k2", "w")
    val p = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"), Joiner.Left)
    assert(rows(p) == Set(
      Seq(1, "a", 1, "X"), Seq(1, "a", 1, "Y"),
      Seq(2, "b", null, null), Seq(3, "c", null, null)))
  }

  // cascading.pipe.assembly.Retain contract: the retained fields come
  // out in the DECLARED order (retain is a projection, not a mask).
  test("retain projects the declared fields in declared order") {
    val df = Seq((1, "a", true)).toDF("num", "ch", "fl")
    val p = pipe(df).retain("fl", "num")
    val out = Flow.toDF(p)
    assert(out.columns.toSeq == Seq("fl", "num"))
    assert(rows(p) == Set(Seq(true, 1)))
  }

  // Discard of an unknown field fails DIRECTED at plan time (upstream
  // resolves field selectors eagerly; Spark's drop() is silently lenient
  // — a typo'd discard would keep the column alive. Divergence found by
  // this corner; Lowering now validates).
  test("discard of an unknown field fails directed at plan time") {
    val df = Seq((1, "a")).toDF("num", "ch")
    val e = intercept[IllegalArgumentException] {
      Flow.toDF(pipe(df).discard("nosuch"))
    }
    assert(e.getMessage.contains("nosuch"))
    // and the valid discard still works
    assert(Flow.toDF(pipe(df).discard("ch")).columns.toSeq == Seq("num"))
  }

  // ---- round-10 corners (81-100) ---------------------------------------

  // JoinFieldedPipesPlatformTest.testJoinFilteredBranch: a HashJoin whose
  // BUILD side was filtered to EMPTY — left joiner pads every streamed
  // row, inner joiner yields the empty set, and the empty broadcast must
  // not fail the flow.
  test("hashJoin against a filtered-to-empty build side: left pads all, " +
       "inner empties") {
    // upstream joins declare distinct field names (same-named keys need
    // declaredFields there; here they'd merge via the USING extension)
    val empty = pipe(upper).rename("num" -> "num2", "ch" -> "CH")
      .filterBy(ExpressionFilter("true"))
    val left = pipe(lower).hashJoin(Seq("num"), empty, Seq("num2"),
      Joiner.Left)
    assert(rows(left) == Set(
      Seq(1, "a", null, null), Seq(2, "b", null, null),
      Seq(3, "c", null, null), Seq(4, "d", null, null),
      Seq(5, "e", null, null)))
    val inner = pipe(lower).hashJoin(Seq("num"), empty, Seq("num2"))
    assert(rows(inner).isEmpty)
    assert(Flow.toDF(inner).columns.length == 4)
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupFilteredBranch: an OUTER
  // CoGroup with one side filtered empty — the surviving side passes
  // through complete, null-padded on the empty side's fields.
  test("outer coGroup with a filtered-to-empty side null-pads the " +
       "surviving side") {
    val empty = pipe(upper).rename("num" -> "num2", "ch" -> "CH")
      .filterBy(ExpressionFilter("true"))
    val p = pipe(lower).coGroup(Seq("num"), empty, Seq("num2"), Joiner.Outer)
    assert(rows(p) == Set(
      Seq(1, "a", null, null), Seq(2, "b", null, null),
      Seq(3, "c", null, null), Seq(4, "d", null, null),
      Seq(5, "e", null, null)))
  }

  // CoGroupFieldedPipesPlatformTest (null join keys): under Cascading's
  // comparator semantics (nullSafe here) an INNER CoGroup matches null
  // keys TO EACH OTHER; under the ANSI default they never match.
  test("inner coGroup null keys: nullSafe matches them, default drops " +
       "them") {
    val l = Seq(("a", 1), (null, 2)).toDF("k", "v")
    val r = Seq(("a", 10), (null, 20)).toDF("k2", "w")
    val safe = pipe(l).coGroup(Seq("k"), pipe(r), Seq("k2"),
      nullSafe = true)
    assert(rows(safe) == Set(
      Seq("a", 1, "a", 10), Seq(null, 2, null, 20)))
    val ansi = pipe(l).coGroup(Seq("k"), pipe(r), Seq("k2"))
    assert(rows(ansi) == Set(Seq("a", 1, "a", 10)))
  }

  // JoinFieldedPipesPlatformTest.testJoin (duplicate keys BOTH sides):
  // m×n per-key cross product — 2 left × 2 right at key 1 = 4 rows.
  test("hashJoin duplicate keys on BOTH sides emit the m×n per-key " +
       "cross product") {
    val l = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "lv")
    val r = Seq((1, "X"), (1, "Y"), (3, "Z")).toDF("k2", "rv")
    val p = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"))
    assert(rows(p) == Set(
      Seq(1, "a", 1, "X"), Seq(1, "a", 1, "Y"),
      Seq(1, "b", 1, "X"), Seq(1, "b", 1, "Y")))
  }

  // JoinFieldedPipesPlatformTest.testJoin (differently-named keys): both
  // key columns survive into the joined tuple — upstream declares
  // lhs-fields ++ rhs-fields with no key merging.
  test("hashJoin on differently-named keys keeps BOTH key columns") {
    val l = Seq((1, "a"), (2, "b")).toDF("num", "ch")
    val r = Seq((1, 10.0), (2, 20.0)).toDF("id", "score")
    val p = pipe(l).hashJoin(Seq("num"), pipe(r), Seq("id"))
    val df = Flow.toDF(p)
    assert(df.columns.toSeq == Seq("num", "ch", "id", "score"))
    assert(rows(p) == Set(Seq(1, "a", 1, 10.0), Seq(2, "b", 2, 20.0)))
  }

  // JoinFieldedPipesPlatformTest.testJoinsIntoGroupBy: join output
  // grouped on a NON-key field of the streamed side — the join's tuple
  // layout must feed grouping on any of its fields.
  test("join output grouped on a non-key field") {
    val l = Seq((1, "x"), (2, "x"), (3, "y")).toDF("k", "tag")
    val r = Seq((1, 10), (2, 20), (3, 30)).toDF("k2", "w")
    val p = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"))
      .groupBy("tag").every(Aggs.sum("w", "s"))
    assert(rows(p) == Set(Seq("x", 30L), Seq("y", 30L)))
  }

  // JoinFieldedPipesPlatformTest (join → group → join): the aggregate of
  // a join re-joins a fresh read — pipeline composition across an
  // aggregation boundary.
  test("join then groupBy then join composes") {
    val l = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v")
    val r = Seq((1, 10), (2, 20)).toDF("k2", "w")
    val agg = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"))
      .groupBy("k").every(Aggs.sum("w", "s"))
    val back = agg.hashJoin(Seq("k"), pipe(r), Seq("k2"))
    assert(rows(back) == Set(
      Seq(1, 20L, 1, 10), Seq(2, 20L, 2, 20)))
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe2/3 family: two
  // branches of ONE source join each other, and the result joins a THIRD
  // read of the same source — the memoized source must serve all three
  // consumers.
  test("same-source triple: two branches join, result joins a third read") {
    val src = pipe(lower)
    val a = src.filterBy(ExpressionFilter("num > 3")) // keeps 1..3
    val b = src.rename("num" -> "num2", "ch" -> "ch2")
    val ab = a.hashJoin(Seq("num"), b, Seq("num2"))
    val abc = ab.hashJoin(Seq("num"), src.rename("num" -> "num3",
      "ch" -> "ch3"), Seq("num3"))
    assert(rows(abc) == Set(
      Seq(1, "a", 1, "a", 1, "a"), Seq(2, "b", 2, "b", 2, "b"),
      Seq(3, "c", 3, "c", 3, "c")))
  }

  // MergePipesPlatformTest.testSimpleMergeThreeChainCoGroup: a THREE-way
  // merge feeding one side of a CoGroup.
  test("three-way merge feeds a coGroup side") {
    val a = pipe(lower).filterBy(ExpressionFilter("num > 1"))  // keeps 1
    val b = pipe(lower).filterBy(ExpressionFilter("num <> 2")) // keeps 2
    val c = pipe(lower).filterBy(ExpressionFilter("num <> 3")) // keeps 3
    val merged = a.merge(b, c)
    val p = merged.coGroup(Seq("num"),
      pipe(upper).rename("num" -> "num2", "ch" -> "CH"), Seq("num2"))
    assert(rows(p) == Set(
      Seq(1, "a", 1, "A"), Seq(2, "b", 2, "B"), Seq(3, "c", 3, "C")))
  }

  // FieldedPipesPlatformTest.testSplitOut: one split branch writes a
  // sink DIRECTLY while the other aggregates into a second sink — the
  // raw and derived sinks share one DAG.
  test("split: raw branch to one sink, aggregated branch to another") {
    val dir = java.nio.file.Files.createTempDirectory("splitout").toString
    val src = pipe(Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v"))
    val agg = src.groupBy("k").every(Aggs.sum("v", "s"))
    Flow.writeAll(Seq(
      (src, graft.sources.ParquetTap(s"$dir/raw"), graft.sources.SinkMode.Replace),
      (agg, graft.sources.ParquetTap(s"$dir/agg"), graft.sources.SinkMode.Replace)))
    assert(spark.read.parquet(s"$dir/raw").count() == 3)
    assert(spark.read.parquet(s"$dir/agg").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("a", 3L), ("b", 5L)))
  }

  // cascading Every contract (Every javadoc: "an Every may follow a
  // GroupBy or CoGroup"): aggregating a CoGroup's key groups directly.
  // Here that composes as coGroup → groupBy(join key) → every, and the
  // plan must NOT re-shuffle (the join already partitioned by the key) —
  // the zero-exchange claim of case "groupBy on the join key adds no
  // exchange", now with the aggregate semantics pinned too.
  test("Every after CoGroup aggregates per join-key group without a new " +
       "exchange") {
    val l = Seq((1, 2), (1, 3), (2, 5)).toDF("k", "v")
    val r = Seq((1, 10), (2, 20), (2, 30)).toDF("k2", "w")
    val p = pipe(l).coGroup(Seq("k"), pipe(r), Seq("k2"))
      .groupBy("k").every(Aggs.sum("v", "sv"), Aggs.sum("w", "sw"))
    val df = Flow.toDF(p)
    assert(rows(p) == Set(Seq(1, 5L, 20L), Seq(2, 10L, 50L)))
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 2, s"Every after CoGroup re-shuffled:\n$plan")
  }

  // CoGroupFieldedPipesPlatformTest (composite keys): CoGroup on TWO key
  // fields — the pair is the group, single-field overlap must not match.
  test("coGroup on composite two-field keys") {
    val l = Seq((1, "x", 100), (1, "y", 200), (2, "x", 300))
      .toDF("a", "b", "v")
    val r = Seq((1, "x", "m1"), (2, "x", "m2"), (1, "z", "m3"))
      .toDF("a2", "b2", "tag")
    val p = pipe(l).coGroup(Seq("a", "b"), pipe(r), Seq("a2", "b2"))
    assert(rows(p) == Set(
      Seq(1, "x", 100, 1, "x", "m1"), Seq(2, "x", 300, 2, "x", "m2")))
  }

  // LimitPipesPlatformTest (degenerate): limit 0 completes with an EMPTY
  // result and an intact schema.
  test("limit 0 yields empty output with intact schema") {
    val p = pipe(lower).limit(0L)
    val df = Flow.toDF(p)
    assert(df.count() == 0)
    assert(df.columns.toSeq == Seq("num", "ch"))
  }

  // AssemblyHelpersPlatformTest (CountBy Include.NO_NULLS): counting a
  // FIELD counts only non-null values; counting tuples counts all —
  // both variants side by side on one grouping.
  test("CountBy Include.NO_NULLS counts non-null arguments only") {
    val df = Seq(("a", java.lang.Integer.valueOf(1)), ("a", null),
      ("b", java.lang.Integer.valueOf(2)))
      .toDF("k", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.count("n_all"), Aggs.countArg("v", "n_vals"))
    assert(rows(p) == Set(Seq("a", 2L, 1L), Seq("b", 1L, 1L)))
  }

  // JoinFieldedPipesPlatformTest (RightJoin): the build side is kept
  // complete; unmatched STREAMED rows drop and unmatched build rows pad.
  test("hashJoin right joiner keeps the build side complete") {
    val l = Seq((1, "a"), (2, "b")).toDF("k", "lv")
    val r = Seq((2, "X"), (3, "Y")).toDF("k2", "rv")
    val p = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"), Joiner.Right)
    assert(rows(p) == Set(
      Seq(2, "b", 2, "X"), Seq(null, null, 3, "Y")))
  }

  // TextDelimited quote contract (FlinkTestPlatform.java:153-167 builds
  // the scheme with quote support): fields containing the delimiter or
  // the quote char round-trip the CSV boundary byte-exactly.
  test("TextDelimited round-trips quoted fields containing delimiter " +
       "and quotes") {
    val dir = java.nio.file.Files.createTempDirectory("csvquote").toString
    val df = Seq((1, "plain"), (2, "has,comma"), (3, "has\"quote"))
      .toDF("num", "txt")
    val tap = graft.sources.CsvTap(s"$dir/q", header = true,
      schema = Some(StructType(Seq(
        StructField("num", IntegerType), StructField("txt", StringType)))))
    tap.write(Flow.toDF(pipe(df)), graft.sources.SinkMode.Replace)
    val back = rows(pipe(tap.read(spark)))
    assert(back == Set(Seq(1, "plain"), Seq(2, "has,comma"),
      Seq(3, "has\"quote")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupSelf with declaredFields:
  // a self-CoGroup disambiguates the doubled schema via declared output
  // names.
  test("self coGroup with declared output fields renames both sides") {
    val p = pipe(lower).coGroup(Seq("num"), pipe(lower), Seq("num"),
      declared = Some(Seq("n1", "c1", "n2", "c2")))
    val df = Flow.toDF(p)
    assert(df.columns.toSeq == Seq("n1", "c1", "n2", "c2"))
    assert(rows(p).size == 5)
    assert(rows(p).contains(Seq(3, "c", 3, "c")))
  }

  // cascading.operation.buffer.FirstNBuffer (BufferPipesPlatformTest
  // family): emit only the first N tuples of each group under the
  // declared sort.
  test("first-N buffer emits the leading N rows of each sorted group") {
    val df = Seq(("g", 3), ("g", 1), ("g", 2), ("h", 7)).toDF("k", "v")
    val firstN = new CBuffer {
      val resultFields: CFields = CFields.typed("v_out" -> IntegerType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        rs.take(2).map(r => Seq(r.getInt(r.fieldIndex("v"))))
    }
    val p = pipe(df).groupBySorted(Seq("k"), Seq("v" -> true))
      .buffer(firstN)
    assert(rows(p) == Set(Seq("g", 1), Seq("g", 2), Seq("h", 7)))
  }

  // AssemblyHelpersPlatformTest (MaxBy over strings): Max/Min compare by
  // the field's ordering — for strings that is LEXICAL, not arrival.
  test("MaxBy/MinBy on string values compare lexically") {
    val df = Seq(("a", "banana"), ("a", "apple"), ("a", "cherry"),
      ("b", "zzz")).toDF("k", "s")
    val p = pipe(df).groupBy("k")
      .every(Aggs.min("s", "lo"), Aggs.max("s", "hi"))
    assert(rows(p) == Set(
      Seq("a", "apple", "cherry"), Seq("b", "zzz", "zzz")))
  }

  // FieldedPipesPlatformTest.testCross (empty-side corner): a Cartesian
  // against an EMPTY side is the empty set — with schema intact.
  test("cross against an empty side is empty with the composite schema") {
    val empty = pipe(upper).filterBy(ExpressionFilter("true"))
    val p = pipe(lower).cross(empty)
    val df = Flow.toDF(p)
    assert(df.count() == 0)
    assert(df.columns.length == 4)
  }

  // MergePipesPlatformTest (empty-branch corner): merging an empty
  // branch is the identity on the other branch — no rows lost, no
  // schema drift.
  test("merge with a filtered-to-empty branch passes the other through") {
    val empty = pipe(lower).filterBy(ExpressionFilter("true"))
    val p = pipe(lower).merge(empty).groupBy("ch").every(Aggs.count("n"))
    assert(rows(p) == Set(Seq("a", 1L), Seq("b", 1L), Seq("c", 1L),
      Seq("d", 1L), Seq("e", 1L)))
  }

  // FieldedPipesPlatformTest (composite grouping): GroupBy on TWO key
  // fields with a secondary sort — the key is the PAIR; a buffer sees
  // each pair's rows in declared order.
  test("composite two-key groupBy with secondary sort") {
    val df = Seq(("a", 1, 30), ("a", 1, 10), ("a", 2, 5), ("b", 1, 7))
      .toDF("k1", "k2", "v")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("order" -> StringType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        Iterator(Seq(rs.map(_.getInt(2)).mkString("-")))
    }
    val p = pipe(df).groupBySorted(Seq("k1", "k2"), Seq("v" -> true))
      .buffer(b)
    assert(rows(p) == Set(
      Seq("a", 1, "10-30"), Seq("a", 2, "5"), Seq("b", 1, "7")))
  }

  // cascading.tap.hadoop.GlobHfs: one tap over a PATH PATTERN — N
  // physical directories read as one logical source.
  test("glob source path reads all matching directories as one source") {
    val dir = java.nio.file.Files.createTempDirectory("globsrc").toString
    Flow.toDF(pipe(lower.filter($"num" <= 2)))
      .write.parquet(s"$dir/part_a")
    Flow.toDF(pipe(lower.filter($"num" > 2)))
      .write.parquet(s"$dir/part_b")
    val p = pipe(graft.sources.ParquetTap(s"$dir/part_*").read(spark))
      .groupAll.every(Aggs.count("n"), Aggs.sum("num", "s"))
    assert(rows(p) == Set(Seq(5L, 15L)))
  }

  // cascading.tap.MultiSourceTap: several taps presented as ONE source —
  // a flow written against a single logical input runs unchanged over
  // N physical inputs.
  test("MultiSourceTap concatenates child taps into one source") {
    val t = graft.sources.MultiSourceTap(Seq(
      DataFrameTap(lower.filter($"num" <= 2)),
      DataFrameTap(lower.filter($"num" === 3)),
      DataFrameTap(lower.filter($"num" > 3))))
    val p = Pipe.source(t).groupBy("ch").every(Aggs.count("n"))
    assert(rows(p).size == 5)
    assert(rows(p).forall(_(1) == 1L))
    intercept[UnsupportedOperationException] {
      t.write(lower, graft.sources.SinkMode.Replace)
    }
  }

  // CoGroup declaredFields arity contract: upstream resolves the
  // declared schema eagerly and fails when its size ≠ lhs + rhs arity.
  test("coGroup declaredFields with wrong arity fails directed at plan " +
       "time") {
    val e = intercept[IllegalArgumentException] {
      Flow.toDF(pipe(lower).coGroup(Seq("num"), pipe(upper), Seq("num"),
        declared = Some(Seq("a", "b", "c")))) // needs 4
    }
    assert(e.getMessage.contains("arity"))
  }

  // cascading.pipe.assembly.Rename: renaming ONTO a still-present field
  // is a name collision the planner rejects (the non-swap case — a swap
  // renames BOTH, which the atomic-rename corner pins as legal).
  test("rename onto an existing field fails directed; swap stays legal") {
    val e = intercept[IllegalArgumentException] {
      Flow.toDF(pipe(lower).rename("num" -> "ch"))
    }
    assert(e.getMessage.contains("collide"))
    val swapped = Flow.toDF(pipe(lower).rename("num" -> "ch", "ch" -> "num"))
    assert(swapped.columns.toSeq == Seq("ch", "num"))
  }

  // cascading.pipe.assembly.Retain resolves its selector eagerly — an
  // unknown field fails at plan time, not as an empty column downstream.
  test("retain of an unknown field fails at plan time") {
    intercept[Exception] {
      Flow.toDF(pipe(lower).retain("num", "nosuch"))
    }
    ()
  }

  // Coercion contract for narrowing numeric casts: upstream Coerce goes
  // through Java's Long.intValue() — SILENT two's-complement truncation.
  // This engine's declared contract (the same one the non-castable-string
  // corner pins) is the ANSI one: overflow fails LOUDLY with a directed
  // error instead of silently corrupting values — an intentional
  // tightening, pinned here so a session-config change cannot silently
  // flip flow semantics either way.
  test("numeric narrowing coerce: in-range narrows, overflow fails " +
       "loudly (declared ANSI tightening of the upstream wrap)") {
    val ok = Flow.toDF(pipe(Seq((1, 41L)).toDF("id", "v"))
      .coerce("v" -> IntegerType))
    assert(ok.schema("v").dataType == IntegerType)
    assert(ok.collect().head.getInt(1) == 41)
    val e = intercept[Exception] {
      Flow.toDF(pipe(Seq((1, Int.MaxValue.toLong + 2L)).toDF("id", "v"))
        .coerce("v" -> IntegerType)).collect()
    }
    assert(e.getMessage.contains("CAST_OVERFLOW") ||
      e.getMessage.toLowerCase.contains("overflow"))
  }

  // FieldedPipesPlatformTest (generator semantics): a 1→N generator
  // yielding ZERO values for a row removes that row entirely (explode
  // of an empty array = no output tuples), not a null row.
  test("generator emitting zero values drops the row") {
    val df = Seq((1, "a b"), (2, ""), (3, "c")).toDF("id", "txt")
    val p = pipe(df).generate(RegexSplitGenerator("tok", " "),
      args = FieldSelector("txt"), out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("a"), Seq("b"), Seq("c")))
  }

  // cascading Checkpoint pipe: a checkpoint TAP materializes the
  // intermediate to durable storage and downstream consumes the COPY —
  // values unchanged, and the tap itself holds the intermediate (the
  // restartability contract).
  test("checkpoint tap materializes the intermediate; downstream reads " +
       "the copy") {
    val dir = java.nio.file.Files.createTempDirectory("ckpt").toString
    val tap = graft.sources.ParquetTap(s"$dir/mid")
    val p = pipe(lower).filterBy(ExpressionFilter("num > 3")) // keeps 1..3
      .checkpoint(Some(tap))
      .groupAll.every(Aggs.sum("num", "s"))
    assert(rows(p) == Set(Seq(6L)))
    // the intermediate itself landed in the tap
    assert(spark.read.parquet(s"$dir/mid").count() == 3)
  }

  // HashJoin LeftAnti with null keys, both semantics: under ANSI a null
  // left key matches nothing → the row SURVIVES the anti join; under
  // nullSafe (the Cascading comparator) null == null → it is dropped
  // when the build side holds a null key.
  test("anti hashJoin null keys: ANSI keeps them, nullSafe drops them") {
    val l = Seq(("a", 1), (null, 2)).toDF("k", "v")
    val r = Seq(("b", 10), (null, 20)).toDF("k2", "w")
    val ansi = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"),
      Joiner.LeftAnti)
    assert(rows(ansi) == Set(Seq("a", 1), Seq(null, 2)))
    val safe = pipe(l).hashJoin(Seq("k"), pipe(r), Seq("k2"),
      Joiner.LeftAnti, nullSafe = true)
    assert(rows(safe) == Set(Seq("a", 1)))
  }

  // FieldedPipesPlatformTest.testUnGroup → regroup: the pivoted rows
  // re-aggregate back to the pre-pivot totals (pivot round-trip).
  test("unGroup output regroups to the pre-pivot totals") {
    val df = Seq((1, 10, 20), (2, 30, 40)).toDF("id", "a", "b")
    val p = pipe(df)
      .generate(UnGroup(CFields.typed("id2" -> IntegerType,
        "v" -> IntegerType), numKeys = 1,
        valueSelectors = Seq(Seq(1), Seq(2))),
        args = FieldSelector.All, out = FieldSelector.Results)
      .groupBy("id2").every(Aggs.sum("v", "s"))
    assert(rows(p) == Set(Seq(1, 30L), Seq(2, 70L)))
  }

  // ---- round-11 wave: the JoinFieldedPipes inner/outer matrix (the
  // suite the reference's own CI EXCLUDES, pom.xml:274-279 — corners the
  // port can exceed it on), CoGroup field-name corners, TextDelimited
  // quoting, and resolver contracts. ------------------------------------

  // JoinFieldedPipesPlatformTest.testJoinOuter: a FULL OUTER through the
  // HashJoin surface — Spark cannot BROADCAST a full outer, so the
  // lowering must fall back to a shuffled join rather than fail or drop
  // the unmatched sides; values are the full outer matrix.
  test("hashJoin with Outer joiner: full-outer values survive the non-broadcastable shape") {
    val l = pipe(Seq((1, "l1"), (2, "l2")).toDF("ka", "va"))
    val r = pipe(Seq((2, "r2"), (3, "r3")).toDF("kb", "vb"))
    val j = l.hashJoin(Seq("ka"), r, Seq("kb"), Joiner.Outer)
    assert(rows(j) == Set(
      Seq(1, "l1", null, null),
      Seq(2, "l2", 2, "r2"),
      Seq(null, null, 3, "r3")))
  }

  // JoinFieldedPipesPlatformTest.testJoinInner: duplicate keys on BOTH
  // sides of the hash path — each left duplicate matches each broadcast
  // duplicate (the per-key cross product, 2×2 = 4 rows for key 1).
  test("hashJoin duplicate keys on both sides: per-key cross product") {
    val l = pipe(Seq((1, "lx"), (1, "ly"), (2, "lz")).toDF("ka", "va"))
    val r = pipe(Seq((1, "rx"), (1, "ry")).toDF("kb", "vb"))
    val j = l.hashJoin(Seq("ka"), r, Seq("kb"))
    assert(rows(j) == Set(
      Seq(1, "lx", 1, "rx"), Seq(1, "lx", 1, "ry"),
      Seq(1, "ly", 1, "rx"), Seq(1, "ly", 1, "ry")))
  }

  // JoinFieldedPipesPlatformTest.testJoinInnerOuter: the RIGHT-outer mix
  // on the hash path — unmatched build-side keys survive, left side
  // null-padded.
  test("hashJoin Right joiner: unmatched build rows survive null-padded") {
    val l = pipe(Seq((1, "l1")).toDF("ka", "va"))
    val r = pipe(Seq((1, "r1"), (7, "r7")).toDF("kb", "vb"))
    val j = l.hashJoin(Seq("ka"), r, Seq("kb"), Joiner.Right)
    assert(rows(j) == Set(
      Seq(1, "l1", 1, "r1"), Seq(null, null, 7, "r7")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupOuterInner: LEFT-outer
  // CoGroup with duplicate left keys — matched keys cross-product,
  // unmatched left keys null-pad, unmatched right keys drop.
  test("coGroup Left joiner: dup-key cross product + left-only padding") {
    val l = pipe(Seq((1, "a"), (1, "b"), (2, "c"), (5, "e")).toDF("ka", "va"))
    val r = pipe(Seq((1, 10), (3, 30)).toDF("kb", "vb"))
    val j = l.coGroup(Seq("ka"), r, Seq("kb"), Joiner.Left)
    assert(rows(j) == Set(
      Seq(1, "a", 1, 10), Seq(1, "b", 1, 10),
      Seq(2, "c", null, null), Seq(5, "e", null, null)))
  }

  // JoinFieldedPipesPlatformTest.testJoinDiffFields: differently-named
  // join keys — BOTH key columns appear in the output (the USING-merge
  // applies only to same-named keys), each carrying its own value.
  test("join on differently-named keys keeps both key columns") {
    val j = pipe(lower).hashJoin(Seq("num"),
      pipe(upper.withColumnRenamed("num", "id").withColumnRenamed("ch", "uc")),
      Seq("id"))
    val df = Flow.toDF(j)
    assert(df.columns.toSeq == Seq("num", "ch", "id", "uc"))
    assert(rows(j) == (1 to 5).map(i =>
      Seq(i, "abcde" (i - 1).toString, i, "ABCDE" (i - 1).toString)).toSet)
  }

  // JoinFieldedPipesPlatformTest.testJoinSelf: the same TAP read twice
  // (distinct pipe objects, one source) joined with itself. Same-named
  // keys USING-merge to ONE key column; the colliding non-key field is
  // retained TWICE (Cascading keeps both copies — addressable only
  // positionally), and declared fields name the copies apart. With
  // DIFFERENT key names the same collision fails directed instead
  // (pinned by the declaredFields-contract corner above).
  test("self join from one tap: key merges, non-key copies retained, declared renames") {
    val tap = DataFrameTap(lower)
    val raw = Flow.toDF(Pipe.source(tap).coGroup(Seq("num"),
      Pipe.source(tap), Seq("num")))
    assert(raw.columns.toSeq == Seq("num", "ch", "ch")) // both copies live
    assert(raw.count() == 5)
    val ok = Pipe.source(tap).coGroup(Seq("num"), Pipe.source(tap), Seq("num"),
      declared = Some(Seq("num1", "ch1", "num2", "ch2")))
    assert(rows(ok) == (1 to 5).map(i =>
      Seq(i, "abcde" (i - 1).toString, i, "abcde" (i - 1).toString)).toSet)
    assert(Flow.toDF(ok).columns.toSeq == Seq("num1", "ch1", "num2", "ch2"))
  }

  // JoinFieldedPipesPlatformTest.testJoinSplit: ONE joined result split
  // into two differently-filtered branches — the join computes once
  // (memoized split) and the branches never contaminate each other.
  test("join result split into two filtered branches") {
    val j = pipe(lower).hashJoin(Seq("num"),
      pipe(upper.withColumnRenamed("num", "id").withColumnRenamed("ch", "uc")),
      Seq("id"))
    val lo = j.filterBy(ExpressionFilter("num <= 2", removeMatch = false))
    val hi = j.filterBy(ExpressionFilter("num > 2", removeMatch = false))
    assert(Flow.toDF(lo).count() == 2 && Flow.toDF(hi).count() == 3)
    assert(rows(lo).map(_.head) == Set(1, 2))
    assert(rows(hi).map(_.head) == Set(3, 4, 5))
  }

  // JoinFieldedPipesPlatformTest.testJoinsIntoCoGroupRhs: two HashJoins
  // feeding the RIGHT side of a CoGroup — gate inputs compose from join
  // results on either side.
  test("hashJoins feeding the right side of a CoGroup") {
    val base = pipe(Seq((1, "x"), (2, "y")).toDF("k", "t"))
    val d1 = pipe(Seq((1, 10), (2, 20)).toDF("k1", "a"))
    val d2 = pipe(Seq((1, 100), (2, 200)).toDF("k2", "b"))
    val rhs = base.hashJoin(Seq("k"), d1, Seq("k1"))
      .hashJoin(Seq("k"), d2, Seq("k2"))
    val lhs = pipe(Seq((1, "L1"), (2, "L2"), (3, "L3")).toDF("kl", "vl"))
    val j = lhs.coGroup(Seq("kl"), rhs, Seq("k"), Joiner.Inner)
    assert(rows(j) == Set(
      Seq(1, "L1", 1, "x", 1, 10, 1, 100),
      Seq(2, "L2", 2, "y", 2, 20, 2, 200)))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupDiffFields: cogroup keys
  // named differently on the two sides — no merge, both retained, outer
  // padding falls on each side's own key column.
  test("coGroup on differently-named keys keeps both, outer pads per side") {
    val l = pipe(Seq((1, "a"), (2, "b")).toDF("ka", "va"))
    val r = pipe(Seq((2, "B"), (3, "C")).toDF("kb", "vb"))
    val j = l.coGroup(Seq("ka"), r, Seq("kb"), Joiner.Outer)
    val df = Flow.toDF(j)
    assert(df.columns.toSeq == Seq("ka", "va", "kb", "vb"))
    assert(rows(j) == Set(
      Seq(1, "a", null, null), Seq(2, "b", 2, "B"), Seq(null, null, 3, "C")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupDiffFieldsSameFile: BOTH
  // sides of the cogroup read the SAME tap, keyed through differently-
  // renamed fields — split memoization plus key renaming must not alias
  // the two sides.
  test("coGroup both sides from one tap via renamed keys") {
    val tap = DataFrameTap(lower)
    val l = Pipe.source(tap).rename("num" -> "ka", "ch" -> "va")
    val r = Pipe.source(tap).rename("num" -> "kb", "ch" -> "vb")
    val j = l.coGroup(Seq("ka"), r, Seq("kb"))
    assert(rows(j) == (1 to 5).map(i =>
      Seq(i, "abcde" (i - 1).toString, i, "abcde" (i - 1).toString)).toSet)
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupAfterEveryNoDeclared:
  // BOTH cogroup inputs are Every (aggregation) results whose agg output
  // columns share a name — the collision fails directed (naming it), and
  // declared fields resolve it, exactly like the raw-pipe case.
  test("coGroup of two Every results: same-named agg outputs need declared") {
    val a = pipe(Seq(("a", 1), ("a", 2), ("b", 5)).toDF("ka", "v"))
      .groupBy("ka").every(Aggs.sum("v", "s"))
    val b = pipe(Seq(("a", 10), ("b", 20)).toDF("kb", "v"))
      .groupBy("kb").every(Aggs.sum("v", "s"))
    val e = intercept[Exception] { Flow.toDF(a.coGroup(Seq("ka"), b, Seq("kb"))) }
    assert(e.getMessage.contains("s"), e.getMessage)
    val ok = a.coGroup(Seq("ka"), b, Seq("kb"),
      declared = Some(Seq("ka", "s1", "kb", "s2")))
    assert(rows(ok) == Set(Seq("a", 3L, "a", 10L), Seq("b", 5L, "b", 20L)))
  }

  // FieldedPipesPlatformTest.testSwap: Fields.SWAP with a MULTI-argument
  // function — all argument columns drop, the results take their place,
  // non-argument columns keep their positions.
  test("SWAP with multi-arg function drops all args, keeps bystanders") {
    val df = Seq((1, 2, "keep"), (30, 4, "also")).toDF("a", "b", "tag")
    val p = pipe(df).each(
      ExpressionFunction("apb", "a + b", IntegerType),
      args = FieldSelector.Named(Seq("a", "b")), out = FieldSelector.Swap)
    val out = Flow.toDF(p)
    assert(out.columns.toSeq == Seq("tag", "apb"))
    assert(rows(p) == Set(Seq("keep", 3), Seq("also", 34)))
  }

  // FieldedPipesPlatformTest.testSimpleChain: the canonical Each →
  // GroupBy → Every → Each chain, end-to-end values.
  test("simple chain: Each then GroupBy+Every then Each") {
    val df = Seq("a", "b", "a", "c", "b", "a").toDF("ch")
    val p = pipe(df)
      .each(ExpressionFunction("u", "upper(ch)", StringType),
        args = FieldSelector.Named(Seq("ch")), out = FieldSelector.Swap)
      .groupBy("u").every(Aggs.count("n"))
      .each(ExpressionFunction("n2", "n * 2", LongType),
        args = FieldSelector.Named(Seq("n")), out = FieldSelector.Swap)
    assert(rows(p) == Set(Seq("A", 6L), Seq("B", 4L), Seq("C", 2L)))
  }

  // TextDelimitedPlatformTest.testQuotedText: delimiter and quote chars
  // INSIDE a quoted field survive a CSV round-trip byte-exactly.
  test("TextDelimited quoted fields round-trip embedded delimiters and quotes") {
    val dir = java.nio.file.Files.createTempDirectory("csvq").toString
    val df = Seq(
      (1, "plain"),
      (2, "has,comma"),
      (3, "has \"quotes\" inside"),
      (4, "comma, and \"both\"")).toDF("id", "txt")
    val tap = graft.sources.CsvTap(s"$dir/t", header = true)
    tap.write(df, graft.sources.SinkMode.Replace)
    val back = tap.read(spark)
    assert(back.collect().map(r => (r.getInt(0), r.getString(1))).toSet
      == df.collect().map(r => (r.getInt(0), r.getString(1))).toSet)
  }

  // TextDelimitedPlatformTest.testHeader: header row carries the schema —
  // names survive the round-trip and the header row is never data.
  test("TextDelimited header round-trip: names preserved, header is not data") {
    val dir = java.nio.file.Files.createTempDirectory("csvh").toString
    val tap = graft.sources.CsvTap(s"$dir/t", header = true)
    tap.write(lower, graft.sources.SinkMode.Replace)
    val back = tap.read(spark)
    assert(back.columns.toSeq == Seq("num", "ch"))
    assert(back.count() == 5)
  }

  // Upstream resolver contract applied to SORT fields: a secondary-sort
  // column the pipe does not declare fails at PLAN time naming the field
  // (the grouping-key twin of this corner is already pinned above).
  test("secondary sort on an undeclared field fails at plan time, naming it") {
    val e = intercept[Exception] {
      Flow.toDF(pipe(lower)
        .groupBySorted(Seq("ch"), Seq(("missing_col", true)))
        .every(Aggs.count("n")))
    }
    assert(e.getMessage.contains("missing_col"), e.getMessage)
  }

  // MergePipesPlatformTest.testSimpleMerge: merge is UNION ALL — a row
  // appearing in both inputs (or twice in one) is kept every time, never
  // deduplicated.
  test("merge keeps duplicate rows across inputs (union-all semantics)") {
    val a = pipe(Seq((1, "a"), (2, "b"), (2, "b")).toDF("num", "ch"))
    val b = pipe(Seq((2, "b"), (3, "c")).toDF("num", "ch"))
    val m = a.merge(b)
    assert(Flow.toDF(m).count() == 5)
    val counted = m.groupBy("num", "ch").every(Aggs.count("n"))
    assert(rows(counted) == Set(Seq(1, "a", 1L), Seq(2, "b", 3L),
      Seq(3, "c", 1L)))
  }

  // AssemblyHelpersPlatformTest.testUniqueMerge: Unique over a merged
  // stream — dedup spans BOTH inputs, first/any single representative
  // per distinct tuple.
  test("unique over a merge dedups across inputs") {
    val a = pipe(Seq((1, "a"), (2, "b")).toDF("num", "ch"))
    val b = pipe(Seq((2, "b"), (3, "c"), (3, "c")).toDF("num", "ch"))
    val u = a.merge(b).unique()
    assert(rows(u) == Set(Seq(1, "a"), Seq(2, "b"), Seq(3, "c")))
  }

  // RegressionPipesPlatformTest.testComplexLogicAnd: And removes a row
  // only when EVERY child filter would remove it (children scoped to
  // different fields — the expression form scopes by name).
  test("And filter removes only rows ALL children would remove") {
    val p = pipe(lower).filterBy(AndFilter(
      ExpressionFilter("num = 1"), ExpressionFilter("ch = 'a'")))
    // only (1,"a") matches both → only it is removed
    assert(rows(p) == Set(Seq(2, "b"), Seq(3, "c"), Seq(4, "d"), Seq(5, "e")))
    val mixed = pipe(Seq((1, "z"), (9, "a"), (1, "a")).toDF("num", "ch"))
      .filterBy(AndFilter(
        ExpressionFilter("num = 1"), ExpressionFilter("ch = 'a'")))
    // one-sided matches survive — And is not Or
    assert(rows(mixed) == Set(Seq(1, "z"), Seq(9, "a")))
  }

  // RegressionPipesPlatformTest.testComplexLogicOr: Or removes a row
  // when ANY child filter would remove it.
  test("Or filter removes rows ANY child would remove") {
    val p = pipe(lower).filterBy(OrFilter(
      ExpressionFilter("num = 1"), ExpressionFilter("ch = 'c'")))
    assert(rows(p) == Set(Seq(2, "b"), Seq(4, "d"), Seq(5, "e")))
  }

  // RegressionPipesPlatformTest.testComplexLogicXor: Xor removes a row
  // when EXACTLY ONE of its two children would remove it — both-match
  // and neither-match rows pass through.
  test("Xor filter removes rows exactly one child would remove") {
    val p = pipe(Seq((1, "a"), (1, "z"), (9, "a"), (9, "z")).toDF("num", "ch"))
      .filterBy(XorFilter(
        ExpressionFilter("num = 1"), ExpressionFilter("ch = 'a'")))
    assert(rows(p) == Set(Seq(1, "a"), Seq(9, "z")))
  }

  // RegressionPipesPlatformTest.testCopy: Each + Identity over ALL
  // arguments is a faithful copy — every row, every field, no
  // reordering of the schema.
  test("Each Identity with ALL arguments copies the stream untouched") {
    val p = pipe(lower).each(Identity(CFields.of("num", "ch")),
      args = FieldSelector.All, out = FieldSelector.Results)
    val df = Flow.toDF(p)
    assert(df.columns.toSeq == Seq("num", "ch"))
    assert(rows(p) == rows(pipe(lower)))
  }

  // RegressionPipesPlatformTest.testLastEachNotModified: an Each AFTER
  // the final Every must not disturb the grouped results — aggregate
  // values and grouping keys survive alongside the new field.
  test("Each after the last Every leaves grouped results intact") {
    val p = pipe(Seq((1, "a"), (2, "a"), (3, "b")).toDF("num", "ch"))
      .groupBy("ch").every(Aggs.count("n"))
      .each(ExpressionFunction("ch2", "upper(ch)", StringType),
        args = FieldSelector.All, out = FieldSelector.All)
    assert(rows(p) == Set(Seq("a", 2L, "A"), Seq("b", 1L, "B")))
  }

  // RegressionPipesPlatformTest.testOOMEPostGroup: a failure inside an
  // operation AFTER the grouping boundary fails the flow (with the
  // original error visible) — it is never swallowed when no trap is
  // configured.
  test("post-group operation failure propagates when untrapped") {
    val p = pipe(lower).groupBy("ch").every(Aggs.count("n"))
      .each(ExpressionFunction("boom",
        "raise_error('post-group failure')", StringType),
        args = FieldSelector.All, out = FieldSelector.All)
    val e = intercept[Exception] { Flow.toDF(p).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("post-group failure")), e.toString)
  }

  // FieldedPipesPlatformTest.testChainEndingWithEach: a flow whose LAST
  // stage is an Each (not a group or sink aggregation) still plans and
  // carries the aggregate's outputs through the trailing map stage.
  test("chain ending with Each after group/every plans and computes") {
    val p = pipe(Seq((1, "a"), (2, "a"), (3, "b")).toDF("num", "ch"))
      .groupBy("ch")
      .every(Aggs.agg("s", org.apache.spark.sql.functions.sum($"num")))
      .each(ExpressionFunction("s2", "s * 10", LongType),
        args = FieldSelector.All, out = FieldSelector.All)
    assert(rows(p) == Set(Seq("a", 3L, 30L), Seq("b", 3L, 30L)))
  }

  // FieldedPipesPlatformTest.testConcatenation: two sources merged then
  // grouped — the group sees rows from BOTH inputs under one key space.
  test("concatenated sources group as one stream") {
    val m = pipe(lower).merge(pipe(upper))
      .groupBy("num").every(Aggs.count("n"))
    assert(rows(m) == (1 to 5).map(i => Seq(i, 2L)).toSet)
  }

  // TextDelimitedPlatformTest.testStrict: with `strict = true` a line
  // whose field count differs from the declared fields fails the flow;
  // the non-strict default pads short rows with null.
  test("TextDelimited strict mode fails short rows; lenient pads null") {
    val dir = java.nio.file.Files.createTempDirectory("csvs").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.csv"),
      java.util.Arrays.asList("1,a,x", "2,b"))
    val schema = StructType(Seq(StructField("num", IntegerType),
      StructField("ch", StringType), StructField("ex", StringType)))
    val lenient = graft.sources.CsvTap(s"$dir/d.csv", schema = Some(schema))
    assert(lenient.read(spark).collect().map(_.toSeq).toSet
      == Set(Seq(1, "a", "x"), Seq(2, "b", null)))
    val strictTap = graft.sources.CsvTap(s"$dir/d.csv",
      schema = Some(schema), strict = true)
    intercept[Exception] { strictTap.read(spark).collect() }
  }

  // TextDelimitedPlatformTest.testFieldCoercion: declared typed fields
  // coerce on read; a token that fails coercion becomes null under
  // `safe = true` (the default) and fails the flow under `safe = false`.
  test("TextDelimited coercion: safe nulls bad tokens, unsafe fails") {
    val dir = java.nio.file.Files.createTempDirectory("csvc").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/d.csv"),
      java.util.Arrays.asList("1,a", "oops,b"))
    val schema = StructType(Seq(StructField("num", IntegerType),
      StructField("ch", StringType)))
    val safeTap = graft.sources.CsvTap(s"$dir/d.csv", schema = Some(schema))
    assert(safeTap.read(spark).collect().map(_.toSeq).toSet
      == Set(Seq(1, "a"), Seq(null, "b")))
    val unsafeTap = graft.sources.CsvTap(s"$dir/d.csv",
      schema = Some(schema), safe = false)
    intercept[Exception] { unsafeTap.read(spark).collect() }
  }

  // AssemblyHelpersPlatformTest.testCountNullNotNull: count(field)
  // skips nulls while count(*) includes every row — and null GROUP KEYS
  // form their own single group (grouping nulls compare equal; join
  // keys do not — the null-semantics split the null-safe join corners
  // pin from the other side).
  test("null group keys form one group; count(field) skips null args") {
    val df = Seq((Some(1), "a"), (None, "b"), (None, "c"))
      .toDF("k", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.count("n_rows"), Aggs.countArg("v", "n_vals"))
    assert(rows(p) == Set(Seq(1, 1L, 1L), Seq(null, 2L, 2L)))
    val nulls = Seq((Some(1), Some("a")), (Some(1), None))
      .toDF("k", "v")
    val q = pipe(nulls).groupBy("k")
      .every(Aggs.count("n_rows"), Aggs.countArg("v", "n_vals"))
    assert(rows(q) == Set(Seq(1, 2L, 1L)))
  }

  // AssemblyHelpersPlatformTest.testMaxBy / testMinBy: max/min over
  // STRING arguments compare lexicographically, not by arrival order.
  test("MaxBy/MinBy over strings are lexicographic") {
    val df = Seq(("g", "pear"), ("g", "apple"), ("g", "fig")).toDF("k", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.sql("mx", "max(v)"), Aggs.sql("mn", "min(v)"))
    assert(rows(p) == Set(Seq("g", "pear", "apple")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupMixed: MIXED joiners in
  // one chain — inner for the second pipe, LEFT for the third. The
  // third join must null-pad rows that survived the inner step, and the
  // inner step's drops must never reach the outer one.
  test("mixed joiners chained: inner then left-outer pads only the survivors") {
    val a = Seq((1, "a1"), (2, "a2"), (3, "a3")).toDF("k", "av")
    val b = Seq((1, "b1"), (3, "b3")).toDF("kb", "bv")
    val c = Seq((3, "c3")).toDF("kc", "cv")
    val p = pipe(a)
      .coGroup(Seq("k"), pipe(b), Seq("kb")) // inner: drops k=2
      .coGroup(Seq("k"), pipe(c), Seq("kc"), joiner = Joiner.Left)
    assert(rows(p) == Set(
      Seq(1, "a1", 1, "b1", null, null),
      Seq(3, "a3", 3, "b3", 3, "c3")))
  }

  // JoinFieldedPipesPlatformTest (JoinerClosure contract): a BufferJoin
  // key present on only ONE side still invokes the buffer — the missing
  // side arrives as an EMPTY iterator, not a skipped key (upstream
  // OuterJoin/MixedJoin are built on exactly this closure shape).
  test("bufferJoin invokes the buffer with an empty iterator for one-sided keys") {
    val left = Seq((1, "l1"), (2, "l2")).toDF("k", "lv")
    val right = Seq((2, "r2"), (9, "r9")).toDF("k2", "rv")
    val fields = CFields.typed("key" -> IntegerType,
      "nl" -> IntegerType, "nr" -> IntegerType)
    val p = pipe(left).bufferJoin(Seq("k"), pipe(right), Seq("k2"), fields,
      (key, ls, rs) => Iterator.single(Seq(key.head, ls.size, rs.size)))
    assert(rows(p) == Set(
      Seq(1, 1, 0), // right side empty, buffer still ran
      Seq(2, 1, 1),
      Seq(9, 0, 1))) // left side empty too
  }

  // FieldedPipesPlatformTest (Every chains): multiple Every on one
  // GroupBy each consume the GROUP's argument stream and APPEND their
  // declared results — the second aggregate reads the input values, not
  // the first aggregate's output.
  test("chained Everys on one GroupBy append results from the group stream") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 20.0), ("b", 5, 50.0))
      .toDF("k", "v", "w")
    val p = pipe(df).groupBy("k")
      .every(Aggs.sum("v", "sv"))
      .every(Aggs.sum("w", "sw"))
      .every(Aggs.count("n"))
    assert(rows(p) == Set(
      Seq("a", 3L, 30.0, 2L), Seq("b", 5L, 50.0, 1L)))
  }

  // AssemblyHelpersPlatformTest.testRenameNamed (the swap corner):
  // renaming a→b while b→a must resolve ATOMICALLY against the incoming
  // schema — sequential application would alias both onto one column.
  test("rename swapping two field names is atomic") {
    val df = Seq((1, "x")).toDF("a", "b")
    val p = pipe(df).rename("a" -> "b", "b" -> "a")
    val out = Flow.toDF(p)
    assert(out.columns.toSeq == Seq("b", "a"))
    assert(out.collect().map(_.toSeq).toSeq == Seq(Seq(1, "x")))
  }

  // TextDelimitedPlatformTest (null round-trip): a null field writes as
  // an EMPTY token and reads back as null under the declared typed
  // schema (upstream DelimitedParser's safe coercion of the empty
  // string) — never as the literal string "null" or a 0.
  test("TextDelimited null fields round-trip as nulls under a typed schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_null").toString
    val df = Seq((1, Some("x"), Some(2.5)), (2, None, None))
      .toDF("id", "s", "d")
    val tap = graft.sources.CsvTap(dir, schema = Some(StructType(Seq(
      StructField("id", IntegerType), StructField("s", StringType),
      StructField("d", DoubleType)))))
    tap.write(df, graft.sources.SinkMode.Replace)
    val back = rows(pipe(tap.read(spark)))
    assert(back == Set(Seq(1, "x", 2.5), Seq(2, null, null)))
  }

  // LimitPipesPlatformTest: a limit LARGER than the stream passes every
  // row through (no padding, no failure) — the complement of the
  // limit-0 corner above.
  test("limit beyond the row count returns the full stream") {
    assert(rows(pipe(lower).limit(100)) == rows(pipe(lower)))
  }

  // cascading Sample is seed-deterministic: the same (seed, fraction)
  // over the same input selects the SAME multiset on every planning of
  // the flow — two independent constructions must agree row-for-row.
  test("sample with a fixed seed is deterministic across plans") {
    val df = (1 to 1000).map(i => (i, s"r$i")).toDF("id", "s")
    val once = rows(pipe(df).sample(0.2, seed = 7L))
    val again = rows(pipe(df).sample(0.2, seed = 7L))
    assert(once == again)
    assert(once.nonEmpty && once.size < 1000)
  }

  // Join keys of DIFFERENT numeric widths: upstream Hadoop tuple
  // comparators would never match an Integer against a Long (distinct
  // serialized types) — our lowering DOCUMENTS the divergence: keys
  // widen per SQL rules and join BY VALUE. Pinning the choice keeps it
  // a decision, not an accident.
  test("int-vs-long join keys widen and match by value (documented divergence)") {
    val ints = Seq((1, "i1"), (2, "i2")).toDF("k", "iv")
    val longs = Seq((1L, "l1"), (3L, "l3")).toDF("k2", "lv")
    val p = pipe(ints).coGroup(Seq("k"), pipe(longs), Seq("k2"))
    assert(rows(p) == Set(Seq(1, "i1", 1L, "l1")))
  }

  // Grouping on DOUBLE keys at the IEEE edges: NaN keys form ONE group
  // (Double.compare semantics upstream, NaN-normalization here) and
  // -0.0 groups WITH 0.0 (SQL value equality — upstream Double.compare
  // would split them; divergence documented, matching Spark/DuckDB).
  test("double group keys: NaN forms one group, -0.0 groups with 0.0") {
    val df = Seq(Double.NaN, Double.NaN, -0.0, 0.0, 1.5)
      .map(d => (d, 1)).toDF("k", "v")
    val p = pipe(df).groupBy("k").every(Aggs.count("n"))
    val out = rows(p).map { case Seq(k, n) =>
      (if (k.asInstanceOf[Double].isNaN) "NaN" else k.toString, n) }
    assert(out == Set(("NaN", 2L), ("0.0", 2L), ("1.5", 1L)))
  }

  // FieldedPipesPlatformTest.testChainedTaps: a chain broken by
  // intermediate TEXT taps — fields and TYPES must survive each textual
  // round-trip mid-flow, and the downstream group computes on the copy
  // exactly as it would on the unbroken stream.
  test("chained text taps: types survive two mid-flow delimited round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("chain").toString
    val sch = StructType(Seq(StructField("num", IntegerType),
      StructField("ch", StringType)))
    val t1 = graft.sources.CsvTap(s"$dir/mid1", header = true,
      schema = Some(sch))
    val t2 = graft.sources.CsvTap(s"$dir/mid2", header = true,
      schema = Some(sch))
    val p = pipe(lower)
      .filterBy(ExpressionFilter("num > 4")) // keeps 1..4
      .checkpoint(Some(t1))
      .filterBy(ExpressionFilter("num = 2")) // drops 2
      .checkpoint(Some(t2))
      .groupBy("ch").every(Aggs.sum("num", "s"))
    assert(rows(p) == Set(Seq("a", 1L), Seq("c", 3L), Seq("d", 4L)))
    // both intermediates landed, and the first still holds the dropped row
    assert(t1.read(spark).count() == 4 && t2.read(spark).count() == 3)
    // the int type survived the text round-trip (not re-inferred as string)
    assert(t2.read(spark).schema("num").dataType == IntegerType)
  }

  // FieldedPipesPlatformTest.testSplit: one head split into two branches
  // of DIFFERENT SHAPE (a per-row branch and an aggregate branch), both
  // written in one flow execution — the split memo must not let one
  // branch's aggregation contaminate the other.
  test("split into per-row and aggregate branches, one writeAll") {
    val dir = java.nio.file.Files.createTempDirectory("split").toString
    val src = pipe(lower).filterBy(ExpressionFilter("num > 4")) // keeps 1..4
    val perRow = src.retain("ch")
    val agg = src.groupAll.every(Aggs.sum("num", "s"))
    Flow.writeAll(Seq(
      (perRow, graft.sources.ParquetTap(s"$dir/rows"),
        graft.sources.SinkMode.Replace),
      (agg, graft.sources.ParquetTap(s"$dir/agg"),
        graft.sources.SinkMode.Replace)))
    assert(spark.read.parquet(s"$dir/rows").collect().map(_.getString(0))
      .toSet == Set("a", "b", "c", "d"))
    assert(spark.read.parquet(s"$dir/agg").collect().map(_.getLong(0))
      .toSeq == Seq(10L))
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe3: the SAME tap joined
  // three ways — each leg under its own declared renames, key columns
  // all retained, 5 aligned rows out.
  test("triple self-join from one tap with declared renames") {
    val tap = DataFrameTap(lower)
    val a = Pipe.source(tap)
    val b = Pipe.source(tap).rename("num" -> "num2", "ch" -> "ch2")
    val c = Pipe.source(tap).rename("num" -> "num3", "ch" -> "ch3")
    val j = a.hashJoin(Seq("num"), b, Seq("num2"))
      .hashJoin(Seq("num"), c, Seq("num3"))
    assert(rows(j) == (1 to 5).map { i =>
      val s = "abcde"(i - 1).toString; Seq(i, s, i, s, i, s)
    }.toSet)
  }

  // cascading.operation.buffer.FirstNBuffer contract: a Buffer may stop
  // consuming its group iterator EARLY — the runner must skip the
  // remainder of the group (isolation: the next group's rows never leak
  // into this one), and the secondary sort decides WHICH rows are first.
  test("buffer early exit: first-2 per group honors sort, isolates groups") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9), ("b", 8), ("b", 7))
      .toDF("k", "v")
    val first2 = new CBuffer {
      val resultFields: CFields = CFields.typed("v1" -> IntegerType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        rs.take(2).map(r => Seq[Any](r.getInt(1)))
    }
    val p = pipe(df).groupBySorted(Seq("k"), Seq("v" -> true)).buffer(first2)
    assert(rows(p) == Set(Seq("a", 1), Seq("a", 2), Seq("b", 7), Seq("b", 8)))
    // descending sort flips which rows are "first"
    val pd = pipe(df).groupBySorted(Seq("k"), Seq("v" -> false)).buffer(first2)
    assert(rows(pd) == Set(Seq("a", 3), Seq("a", 2), Seq("b", 9), Seq("b", 8)))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupAroundCoGroupWith: a
  // coGroup whose LHS is itself a coGroup result with an interposed Each
  // — the middle op must not disturb the joined fields feeding the outer
  // coGroup.
  test("coGroup around coGroup with an interposed Each") {
    val a = pipe(Seq((1, "x"), (2, "y")).toDF("k", "va"))
    val b = pipe(Seq((1, 10), (2, 20)).toDF("kb", "vb"))
    val c = pipe(Seq((1, "C1"), (3, "C3")).toDF("kc", "vc"))
    val inner = a.coGroup(Seq("k"), b, Seq("kb"))
      .each(ExpressionFunction("vb2", "vb * 2", LongType),
        args = FieldSelector("vb"), out = FieldSelector.All)
    val outer = inner.coGroup(Seq("k"), c, Seq("kc"), Joiner.Left)
    assert(rows(outer) == Set(
      Seq(1, "x", 1, 10, 20L, 1, "C1"),
      Seq(2, "y", 2, 20, 40L, null, null)))
  }

  // JoinFieldedPipesPlatformTest.testJoinGroupByJoin: join → GroupBy over
  // the join result → join the AGGREGATE back to a third pipe — the
  // aggregation keys on a join output column, and the second join keys on
  // an aggregation output row set.
  test("join then groupBy then join-back chain") {
    val l = pipe(Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v"))
    val dim = pipe(Seq((1, 10), (2, 20)).toDF("dk", "w"))
    val agg = l.hashJoin(Seq("k"), dim, Seq("dk"))
      .groupBy("w").every(Aggs.count("n"))
    val names = pipe(Seq((10, "ten"), (20, "twenty")).toDF("wk", "name"))
    val j = agg.coGroup(Seq("w"), names, Seq("wk"))
    assert(rows(j) == Set(
      Seq(10, 2L, 10, "ten"), Seq(20, 1L, 20, "twenty")))
  }

  // cascading.tuple.Fields declared-size contract (CoGroup constructors
  // throw when declaredFields arity ≠ the joined tuple arity): the
  // mismatch must fail at PLAN time with both counts named, never
  // misalign columns silently.
  test("declared fields arity mismatch fails directed at plan time") {
    val l = pipe(lower)
    val r = pipe(upper).rename("num" -> "num2", "ch" -> "ch2")
    val bad = l.coGroup(Seq("num"), r, Seq("num2"),
      declared = Some(Seq("a", "b", "c"))) // needs 4
    val ex = intercept[IllegalArgumentException] { Flow.toDF(bad) }
    assert(ex.getMessage.contains("3") && ex.getMessage.contains("arity"))
  }

  // cascading.pipe.Merge contract: every merged branch must declare the
  // SAME fields — a positional union over mismatched schemas must fail
  // directed at plan time, not zip columns silently.
  test("merge of mismatched field layouts fails directed") {
    val a = pipe(lower)
    val b = pipe(upper).rename("ch" -> "letter")
    val ex = intercept[IllegalArgumentException] {
      Flow.toDF(a.merge(b))
    }
    assert(ex.getMessage.contains("identical declared fields"))
    // renaming the branch to one schema repairs the merge
    assert(rows(a.merge(pipe(upper))).size == 10)
  }

  // Coerce on an unparsable token MATCHES upstream: Tuples.coerce throws
  // NumberFormatException mid-flow, and this engine's ANSI cast fails the
  // flow the same way (CAST_INVALID_INPUT). The corner pins the match so
  // a future ANSI-mode flip cannot silently change coercion to
  // null-swallowing; null INPUTS still pass through as null (upstream
  // coerces null without error).
  test("coerce of an unparsable token fails the flow (upstream parity)") {
    val df = Seq(("1", "x"), ("oops", "y")).toDF("num", "ch")
    val p = pipe(df).coerce("num" ->
      org.apache.spark.sql.types.IntegerType)
    val ex = intercept[Exception] { rows(p) }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(chain(ex).exists(_.getMessage != null) &&
      chain(ex).exists(t => Option(t.getMessage)
        .exists(_.contains("CAST_INVALID_INPUT"))))
    // parsable tokens and null inputs coerce cleanly
    val ok = pipe(Seq(("1", "x"), (null, "y")).toDF("num", "ch"))
      .coerce("num" -> org.apache.spark.sql.types.IntegerType)
    assert(rows(ok) == Set(Seq(1, "x"), Seq(null, "y")))
  }

  // JoinFieldedPipesPlatformTest.testJoinsIntoCoGroup: hashJoins build
  // BOTH sides of a coGroup — the broadcast legs must survive on each
  // side of the shuffle boundary independently.
  test("hashJoins feeding both sides of a CoGroup") {
    val dim = pipe(Seq((1, "d1"), (2, "d2"), (3, "d3")).toDF("dk", "dv"))
    val lhs = pipe(Seq((1, "L1"), (2, "L2")).toDF("k", "lv"))
      .hashJoin(Seq("k"), dim, Seq("dk"))
    val rhs = pipe(Seq((1, 100), (3, 300)).toDF("k2", "rv"))
      .hashJoin(Seq("k2"), dim.rename("dk" -> "dk2", "dv" -> "dv2"),
        Seq("dk2"))
    val j = lhs.coGroup(Seq("k"), rhs, Seq("k2"), Joiner.Outer)
    assert(rows(j) == Set(
      Seq(1, "L1", 1, "d1", 1, 100, 1, "d1"),
      Seq(2, "L2", 2, "d2", null, null, null, null),
      Seq(null, null, null, null, 3, 300, 3, "d3")))
  }

  // ---- round-12 mining wave: BasicPipes / AssemblyHelpers / Assertions /
  // JoinFieldedPipes remainder ------------------------------------------

  // BasicPipesPlatformTest.testSimpleGroup: the canonical word count —
  // group on a data column, count per key, result carries (key, count).
  test("simple group: word count per key (the canonical shape)") {
    val df = Seq("apple", "banana", "apple", "cherry", "apple", "banana")
      .toDF("w")
    val p = pipe(df).groupBy("w").every(Aggs.count("n"))
    assert(rows(p) == Set(Seq("apple", 3L), Seq("banana", 2L),
      Seq("cherry", 1L)))
  }

  // BasicPipesPlatformTest.testFilter: Cascading Filter semantics REMOVE
  // on match (isRemove = true) — ExpressionFilter drops rows where the
  // predicate is TRUE, the opposite polarity of SQL WHERE. Both the
  // removal direction and the keep-matches escape hatch are contract.
  test("filter polarity: ExpressionFilter REMOVES on match") {
    val p = pipe(lower).filterBy(ExpressionFilter("num > 3"))
    assert(rows(p).map(_.head) == Set(1, 2, 3))
    val keep = pipe(lower)
      .filterBy(ExpressionFilter("num > 3", removeMatch = false))
    assert(rows(keep).map(_.head) == Set(4, 5))
  }

  // BasicPipesPlatformTest.testCoGroup: the basic inner cogroup layout —
  // BOTH key columns survive side by side (Cascading declares
  // lhs-fields ++ rhs-fields; nothing merges), left fields first.
  test("basic coGroup keeps both key columns, left fields first") {
    val r = pipe(lower).coGroup(Seq("num"),
      pipe(upper).rename("num" -> "num2", "ch" -> "ch2"), Seq("num2"),
      Joiner.Inner)
    val df = Flow.toDF(r)
    assert(df.columns.toSeq == Seq("num", "ch", "num2", "ch2"))
    assert(rows(r) == Set(Seq(1, "a", 1, "A"), Seq(2, "b", 2, "B"),
      Seq(3, "c", 3, "C"), Seq(4, "d", 4, "D"), Seq(5, "e", 5, "E")))
  }

  // AssemblyHelpersPlatformTest.testCountBy: the CountBy assembly —
  // grouped count with a declared result name, long-typed.
  test("CountBy assembly: named long count per key") {
    val df = Seq(("a", 1), ("a", 2), ("b", 3)).toDF("k", "v")
    val out = Flow.toDF(pipe(df).countBy(Seq("k"), "ct"))
    assert(out.columns.toSeq == Seq("k", "ct"))
    assert(out.schema("ct").dataType ==
      org.apache.spark.sql.types.LongType)
    assert(rows(pipe(df).countBy(Seq("k"), "ct"))
      == Set(Seq("a", 2L), Seq("b", 1L)))
  }

  // AssemblyHelpersPlatformTest.testCountAll: key-less CountBy — the
  // global count as a 1-row flow (groupAll, no grouping column in the
  // output).
  test("CountAll: key-less count yields exactly one row") {
    val df = Seq(1, 2, 3, 4).toDF("v")
    val out = Flow.toDF(pipe(df).countBy(Seq.empty, "ct"))
    assert(out.columns.toSeq == Seq("ct"))
    assert(rows(pipe(df).countBy(Seq.empty, "ct")) == Set(Seq(4L)))
  }

  // AssemblyHelpersPlatformTest.testMaxBy/testMinBy: the Max/Min
  // assemblies are TYPE-AWARE (numeric comparison on numbers, lexical on
  // strings) — "10" < "9" lexically but 10 > 9 numerically.
  test("MaxBy/MinBy compare by column type, not string form") {
    val nums = Seq(("g", 10), ("g", 9), ("g", 2)).toDF("k", "v")
    assert(rows(pipe(nums).maxBy(Seq("k"), "v", "mx"))
      == Set(Seq("g", 10)))
    assert(rows(pipe(nums).minBy(Seq("k"), "v", "mn"))
      == Set(Seq("g", 2)))
    val strs = Seq(("g", "10"), ("g", "9"), ("g", "2")).toDF("k", "v")
    assert(rows(pipe(strs).maxBy(Seq("k"), "v", "mx"))
      == Set(Seq("g", "9"))) // lexical max
    assert(rows(pipe(strs).minBy(Seq("k"), "v", "mn"))
      == Set(Seq("g", "10"))) // lexical min
  }

  // AssemblyHelpersPlatformTest.testCoerce: the Coerce assembly —
  // string→int parses, int→string formats, null passes through in both
  // directions (Tuples.coerce(null) == null).
  test("Coerce assembly: cross-type with null passthrough") {
    val df = Seq((Some("42"), Some(7)), (None, None))
      .toDF("s", "i")
    val p = pipe(df).coerce(
      "s" -> org.apache.spark.sql.types.IntegerType,
      "i" -> org.apache.spark.sql.types.StringType)
    val out = Flow.toDF(p)
    assert(out.schema("s").dataType ==
      org.apache.spark.sql.types.IntegerType)
    assert(out.schema("i").dataType ==
      org.apache.spark.sql.types.StringType)
    assert(rows(p) == Set(Seq(42, "7"), Seq(null, null)))
  }

  // AssemblyHelpersPlatformTest.testUnique: the Unique assembly keeps ONE
  // copy per key INCLUDING one row for the null key (null is a value to
  // Unique) — the NO_NULLS include mode is the one that discards.
  test("Unique assembly: one copy per key, null key kept once") {
    val df = Seq(Some("a"), None, Some("a"), None, Some("b"))
      .toDF("k")
    assert(rows(pipe(df).unique("k"))
      == Set(Seq("a"), Seq("b"), Seq(null)))
    assert(rows(pipe(df).uniqueNoNulls("k"))
      == Set(Seq("a"), Seq("b")))
  }

  // AssertionsPlatformTest (value assertions): a passing AssertExpression
  // is invisible to the flow; a failing one raises a DIRECTED error
  // carrying the declared message — never a partial result.
  test("value assertions: pass is invisible, fail is directed") {
    val ok = pipe(lower).assertRows("num >= 1", "positive ids")
    assert(rows(ok).size == 5)
    val bad = pipe(lower).assertRows("num <= 3", "id cap exceeded")
    val e = intercept[Exception] { Flow.toDF(bad).collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("id cap exceeded")))
  }

  // AssertionsPlatformTest (assertion strip, both LEVELS): the planner
  // strips row AND group assertions when the flow runs with assertions
  // disabled (ApplyAssertionLevelTransformer, FlinkConnector.java:126-127)
  // — a failing assertion of EITHER kind must vanish, not fire.
  test("assertion strip removes failing row AND group assertions") {
    val p = pipe(lower).assertRows("num <= 3", "boom")
      .groupBy("ch").every(Aggs.count("n"))
    val g = pipe(lower).groupBy("ch").every(Aggs.count("n"))
      .asInstanceOf[AggregatePipe]
      .assertGroup("__group_size >= 2", "groups too small")
    intercept[Exception] { Flow.toDF(p).collect() }
    intercept[Exception] { Flow.toDF(g).collect() }
    val low = new graft.exec.Lowering(spark, keepAssertions = false)
    assert(low.lower(p).count() == 5)
    assert(low.lower(g).count() == 5)
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe2: the SAME pipe
  // instance hash-joined with itself on the SAME key (rhs renamed) —
  // self-join without an intermediate tap.
  test("hashJoin of a pipe with itself on the same key") {
    val src = pipe(lower)
    val j = src.hashJoin(Seq("num"),
      src.rename("num" -> "num2", "ch" -> "ch2"), Seq("num2"))
    assert(rows(j) == Set(
      Seq(1, "a", 1, "a"), Seq(2, "b", 2, "b"), Seq(3, "c", 3, "c"),
      Seq(4, "d", 4, "d"), Seq(5, "e", 5, "e")))
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe3: the same pipe joined
  // with itself on DIFFERENT fields — key resolution must not conflate
  // the two sides' columns even though they share a source.
  test("hashJoin of a pipe with itself on different fields") {
    val df = Seq((1, 2), (2, 3), (3, 4)).toDF("a", "b")
    val src = pipe(df)
    // join a-side's b against the copy's a: (1,2)x(2,3), (2,3)x(3,4)
    val j = src.hashJoin(Seq("b"),
      src.rename("a" -> "a2", "b" -> "b2"), Seq("a2"))
    assert(rows(j) == Set(Seq(1, 2, 2, 3), Seq(2, 3, 3, 4)))
  }

  // MergePipesPlatformTest.testSimpleMergeThreeChain: THREE distinct
  // sources merged without any group — arity-3 union-all straight to the
  // sink, duplicates preserved.
  test("three distinct sources merge without grouping; duplicates survive") {
    val a = pipe(Seq(("x", 1)).toDF("ch", "v"))
    val b = pipe(Seq(("x", 1), ("y", 2)).toDF("ch", "v"))
    val c = pipe(Seq(("z", 3)).toDF("ch", "v"))
    val m = Flow.toDF(a.merge(b, c)).collect().map(_.toSeq).toSeq
    assert(m.size == 4) // union-ALL: the duplicate ("x", 1) survives
    assert(m.toSet == Set(Seq("x", 1), Seq("y", 2), Seq("z", 3)))
  }

  // AssemblyHelpersPlatformTest.testCountMerged/testSumMerged: the
  // assemblies over a MERGE of two sources — the map-side partials these
  // assemblies exist for must compose across the union-all (one grouped
  // aggregate over both inputs, not one per input).
  test("CountBy/SumBy over a merge of two sources aggregate across both") {
    val a = pipe(Seq(("k1", 1), ("k2", 2)).toDF("k", "v"))
    val b = pipe(Seq(("k1", 10), ("k3", 30)).toDF("k", "v"))
    val m = a.merge(b)
    assert(rows(m.countBy(Seq("k"), "ct"))
      == Set(Seq("k1", 2L), Seq("k2", 1L), Seq("k3", 1L)))
    assert(rows(m.sumBy(Seq("k"), "v", "s"))
      == Set(Seq("k1", 11L), Seq("k2", 2L), Seq("k3", 30L)))
  }

  // AssemblyHelpersPlatformTest.testRenameNamed: the Rename assembly
  // renames IN PLACE — untouched columns keep their positions, renamed
  // ones keep theirs under the new name (field ORDER is contract in
  // Cascading; a rename must never reorder).
  test("Rename assembly renames in place, preserving field order") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    val out = Flow.toDF(pipe(df).rename("y" -> "why"))
    assert(out.columns.toSeq == Seq("x", "why", "z"))
    assert(rows(pipe(df).rename("y" -> "why")) == Set(Seq(1, "a", 2.0)))
  }

  // AssemblyHelpersPlatformTest.testRetainNarrow: Retain keeps ONLY the
  // named fields, in the DECLARED order (not source order) — retain is
  // both a projection and a reordering.
  test("Retain assembly projects to the declared order") {
    val df = Seq((1, "a", 2.0)).toDF("x", "y", "z")
    val out = Flow.toDF(pipe(df).retain("z", "x"))
    assert(out.columns.toSeq == Seq("z", "x"))
    assert(rows(pipe(df).retain("z", "x")) == Set(Seq(2.0, 1)))
  }

  // AssemblyHelpersPlatformTest.testDiscardNarrow: Discard removes the
  // named fields and leaves the rest in SOURCE order.
  test("Discard assembly drops named fields, keeps source order") {
    val df = Seq((1, "a", 2.0, true)).toDF("x", "y", "z", "w")
    val out = Flow.toDF(pipe(df).discard("y", "w"))
    assert(out.columns.toSeq == Seq("x", "z"))
    assert(rows(pipe(df).discard("y", "w")) == Set(Seq(1, 2.0)))
  }

  // FieldedPipesPlatformTest.testSplitNonSafe: a split below a NON-SAFE
  // operation — both branches must observe the SAME rows (the operation
  // is not replayed divergently per branch). persist() is the DSL's
  // explicit memo point (the flinkMemo discipline); a seeded sample
  // stands in for the unsafe op.
  test("split below a sampled (non-replayable) op: branches agree") {
    val big = spark.range(200).selectExpr("id", "id % 7 as m")
    val base = pipe(big.toDF()).sample(0.5, seed = 7L).persist()
    val left = rows(base.retain("id"))
    val right = rows(base.filterBy(ExpressionFilter("false")).retain("id"))
    assert(left == right, "both branches must see the same sampled rows")
  }

  // ---- round-13 wave: the AggregateBy/Buffer remainder of the
  // cascading-platform pool (AssemblyHelpers aggregate family,
  // BufferPipes cardinality/joiner corners, the each-only flow) --------

  // AssemblyHelpersPlatformTest.testSumBy: SumBy groups on the key and
  // sums the value field into the declared result — integer input, LONG
  // result (SQL sum widens; upstream declares the result type).
  test("SumBy sums per key into the declared result field") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("ch", "v")
    val p = pipe(df).sumBy(Seq("ch"), "v", "s")
    assert(Flow.toDF(p).columns.toSeq == Seq("ch", "s"))
    assert(rows(p) == Set(Seq("a", 3L), Seq("b", 5L)))
  }

  // AssemblyHelpersPlatformTest.testAverageBy: AverageBy yields a DOUBLE
  // mean per key — exact here (dyadic operands) so the assert is exact.
  test("AverageBy yields the per-key double mean") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("ch", "v")
    assert(rows(pipe(df).averageBy(Seq("ch"), "v", "m")) ==
      Set(Seq("a", 1.5), Seq("b", 5.0)))
  }

  // AssemblyHelpersPlatformTest.testMinBy: MinBy keeps the per-key
  // minimum (testMaxBy's dual — both ride one partial-aggregated pass).
  test("MinBy keeps the per-key minimum") {
    val df = Seq(("a", 3), ("a", 1), ("b", 5)).toDF("ch", "v")
    assert(rows(pipe(df).minBy(Seq("ch"), "v", "lo")) ==
      Set(Seq("a", 1), Seq("b", 5)))
  }

  // AssemblyHelpersPlatformTest.testMinByString: Min over a STRING field
  // — comparator semantics are lexicographic in both engines (cascading
  // compares Comparables; Spark's min on StringType is binary collation).
  test("MinBy over strings is lexicographic") {
    val df = Seq((1, "pear"), (1, "apple"), (2, "fig")).toDF("k", "w")
    assert(rows(pipe(df).minBy(Seq("k"), "w", "first")) ==
      Set(Seq(1, "apple"), Seq(2, "fig")))
  }

  // AssemblyHelpersPlatformTest.testSumByNulls: upstream Sum reads its
  // argument through Tuples.toDouble(null) == 0 — a null contributes 0
  // and an ALL-NULL group sums to 0, never null. SQL sum would return
  // null for the all-null group; the coerced variant pins upstream.
  test("SumBy null coercion: nulls contribute 0; all-null group sums 0") {
    val df = Seq(("a", Some(1)), ("a", None), ("b", None), ("b", None))
      .toDF("ch", "v")
    assert(rows(pipe(df).sumByCoerced(Seq("ch"), "v", "s")) ==
      Set(Seq("a", 1L), Seq("b", 0L)))
    // and the PLAIN (SQL-semantics) form differs exactly on the all-null
    // group — the divergence this corner exists to document
    assert(rows(pipe(df).sumBy(Seq("ch"), "v", "s")) ==
      Set(Seq("a", 1L), Seq("b", null)))
  }

  // AssemblyHelpersPlatformTest.testAverageByNull: upstream Average
  // counts EVERY tuple into the denominator (null → 0 value, still one
  // tuple); SQL avg divides by the non-null count only.
  test("AverageBy null coercion: null counts into the denominator") {
    val df = Seq(("a", Some(3)), ("a", None)).toDF("ch", "v")
    assert(rows(pipe(df).averageByCoerced(Seq("ch"), "v", "m")) ==
      Set(Seq("a", 1.5)))
    assert(rows(pipe(df).averageBy(Seq("ch"), "v", "m")) ==
      Set(Seq("a", 3.0)))
  }

  // AssemblyHelpersPlatformTest.testParallelAggregates: several
  // AggregateBy assemblies over ONE grouping compose into a single pass
  // (upstream shares the partial-aggregation hash table; here Spark's
  // multi-aggregate HashAggregate is that single pass).
  test("parallel aggregates compose over one grouping in one pass") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("ch", "v")
    val p = pipe(df).groupBy("ch")
      .every(Aggs.count("n"), Aggs.sum("v", "s"), Aggs.avg("v", "m"),
        Aggs.min("v", "lo"), Aggs.max("v", "hi"))
    assert(rows(p) == Set(
      Seq("a", 2L, 3L, 1.5, 1, 2), Seq("b", 1L, 5L, 5.0, 5, 5)))
    // one aggregation in the plan — the assemblies fused, not chained
    val plan = Flow.toDF(p).queryExecution.executedPlan.toString
    assert("HashAggregate".r.findAllMatchIn(plan).size <= 2,
      "expected one partial+final aggregate pair:\n" + plan)
  }

  // AssemblyHelpersPlatformTest.testParallelAggregatesMerged: the same
  // parallel composition over a MERGED (multi-pipe) input — the merge
  // must happen before the single aggregation pass.
  test("parallel aggregates over a merged input") {
    val p1 = pipe(Seq(("a", 1), ("b", 2)).toDF("ch", "v"))
    val p2 = pipe(Seq(("a", 10)).toDF("ch", "v"))
    val p = p1.merge(p2).groupBy("ch")
      .every(Aggs.count("n"), Aggs.sum("v", "s"))
    assert(rows(p) == Set(Seq("a", 2L, 11L), Seq("b", 1L, 2L)))
  }

  // AssemblyHelpersPlatformTest.testRename: the positional Rename of
  // EVERY field — order preserved, data untouched.
  test("Rename of all fields keeps order and data") {
    val out = Flow.toDF(pipe(lower).rename("num" -> "id", "ch" -> "name"))
    assert(out.columns.toSeq == Seq("id", "name"))
    assert(out.count() == 5)
  }

  // AssemblyHelpersPlatformTest.testRetain: Retain with the FULL field
  // list is the identity (the degenerate projection upstream pins).
  test("Retain of every field is the identity") {
    assert(rows(pipe(lower).retain("num", "ch")) == rows(pipe(lower)))
  }

  // AssemblyHelpersPlatformTest.testDiscard: Discard of one field — the
  // complement of retain; remaining fields keep source order.
  test("Discard of a single field keeps the rest in source order") {
    val out = Flow.toDF(pipe(lower).discard("num"))
    assert(out.columns.toSeq == Seq("ch"))
    assert(rows(pipe(lower).discard("num")) ==
      Set(Seq("a"), Seq("b"), Seq("c"), Seq("d"), Seq("e")))
  }

  // FieldedPipesPlatformTest.testNoGroup: an Each-only flow (no GroupBy
  // anywhere) — per-record ops alone must plan and run (no implicit
  // grouping, no shuffle).
  test("each-only flow runs without any grouping; plan has no exchange") {
    val p = pipe(lower).each(
      ExpressionFunction("up", "upper(ch)", StringType),
      args = FieldSelector("ch"), out = FieldSelector.All)
    val df = Flow.toDF(p)
    assert(rows(p).map(_.last) == Set("A", "B", "C", "D", "E"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"),
      "an each-only flow must not shuffle")
  }

  // BufferPipesPlatformTest.testSimpleBuffer2: Buffer output cardinality
  // is FREE downward too — a buffer may emit fewer rows than the group,
  // including NONE (the group is then absent from the output entirely,
  // not null-padded).
  test("buffer may emit zero rows for a group — group absent, not null") {
    val df = Seq(("a", 1), ("a", 2), ("b", 5)).toDF("k", "v")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("s" -> IntegerType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] = {
        val total = rs.map(_.getInt(1)).sum
        if (total % 2 == 0) Iterator.empty else Iterator.single(Seq(total))
      }
    }
    val p = pipe(df).groupBySorted(Seq("k"), Seq("v" -> true)).buffer(b)
    // a sums to 3 (odd → emitted), b sums to 5 (odd → emitted); with a
    // third all-even group the row disappears
    val df2 = Seq(("a", 1), ("b", 2), ("b", 2)).toDF("k", "v")
    val p2 = pipe(df2).groupBySorted(Seq("k"), Seq("v" -> true)).buffer(b)
    assert(rows(p) == Set(Seq("a", 3), Seq("b", 5)))
    assert(rows(p2) == Set(Seq("a", 1)))
  }

  // BufferPipesPlatformTest.testJoinerClosure: the BufferJoin form — a
  // custom joiner sees BOTH sides' iterators per key (the JoinerClosure
  // API) and emits any shape; keys missing from one side still reach the
  // joiner with an empty iterator (full-outer delivery, joiner decides).
  test("bufferJoin joiner sees both iterators per key, empty side included") {
    val left = pipe(Seq((1, "x"), (1, "y"), (3, "z")).toDF("k", "lv"))
    val right = pipe(Seq((1, "A"), (2, "B")).toDF("rk", "rv"))
    val out = left.bufferJoin(Seq("k"), right, Seq("rk"),
      CFields.typed("k" -> IntegerType, "nl" -> IntegerType,
        "nr" -> IntegerType, "cat" -> StringType),
      (key, ls, rs) => {
        val l = ls.map(_.getString(1)).toVector
        val r = rs.map(_.getString(1)).toVector
        Iterator.single(Seq(key.head, l.length, r.length,
          (l ++ r).sorted.mkString("")))
      })
    assert(rows(out) == Set(
      Seq(1, 2, 1, "Axy"), Seq(3, 1, 0, "z"), Seq(2, 0, 1, "B")))
  }

  // ---- wave 14: TextDelimited quote-escaping file-format parity +
  //      the Coercions primitive/object split ----

  // TextDelimitedPlatformTest.testQuotedText (file-format half):
  // upstream's DelimitedParser escapes a quote inside a quoted field by
  // DOUBLING it (RFC 4180) — an upstream-written file must parse here.
  // Spark's CSV default escape is '\', which silently misparses the
  // doubled form; CsvTap pins escape = quote (the divergence this corner
  // exists to keep fixed).
  test("TextDelimited parses upstream-style DOUBLED quotes in quoted fields") {
    val dir = java.nio.file.Files.createTempDirectory("csvdq")
    java.nio.file.Files.writeString(dir.resolve("part-00000.csv"),
      "\"a\"\"b\",c\n\"x,y\",\"say \"\"hi\"\" twice\"\n")
    val tap = graft.sources.CsvTap(dir.toString,
      schema = Some(StructType(Seq(StructField("p", StringType),
        StructField("q", StringType)))))
    val got = tap.read(spark).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a\"b", "c"), ("x,y", "say \"hi\" twice")))
  }

  // TextDelimitedPlatformTest.testQuotedText (writer half): what CsvTap
  // WRITES must be readable by upstream — quotes double in the raw
  // bytes, never backslash-escape.
  test("TextDelimited writes RFC-doubled quotes, not backslash escapes") {
    val dir = java.nio.file.Files.createTempDirectory("csvwq").toString
    val tap = graft.sources.CsvTap(s"$dir/t")
    tap.write(Seq(("a\"b", "x,y")).toDF("p", "q"),
      graft.sources.SinkMode.Replace)
    val part = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".csv")).head
    val bytes = new String(java.nio.file.Files.readAllBytes(part.toPath))
    assert(bytes.contains("\"a\"\"b\""), s"raw bytes were: $bytes")
    assert(!bytes.contains("\\\""), s"backslash escape leaked: $bytes")
    // and the round-trip still closes
    assert(tap.read(spark).collect().map(_.getString(0)).toSeq == Seq("a\"b"))
  }

  // cascading/tuple/coerce/Coercions.java keeps TWO coercers per type:
  // object (Integer.class — null stays null) and primitive (int.class —
  // null becomes 0, boolean.class false). `coerce` is the object form;
  // `coercePrimitive` pins the primitive form from both sides.
  test("Coercions primitive/object split: null → 0/false vs null stays null") {
    val df = Seq(("a", Some("3"), Some("true")), ("b", None, None))
      .toDF("k", "n", "fl")
    // object form (Integer.class): null survives the cast
    assert(rows(pipe(df).coerce("n" -> IntegerType, "fl" -> BooleanType)) ==
      Set(Seq("a", 3, true), Seq("b", null, null)))
    // primitive form (int.class / boolean.class): null-defaults
    assert(rows(pipe(df).coercePrimitive(
      "n" -> IntegerType, "fl" -> BooleanType)) ==
      Set(Seq("a", 3, true), Seq("b", 0, false)))
    // the long.class / double.class coercers share the split: 0L and
    // 0.0 primitive defaults, null under the object form
    assert(rows(pipe(df).coercePrimitive(
      "n" -> LongType, "fl" -> BooleanType)) ==
      Set(Seq("a", 3L, true), Seq("b", 0L, false)))
    assert(rows(pipe(df).coercePrimitive("n" -> DoubleType)) ==
      Set(Seq("a", 3.0, "true"), Seq("b", 0.0, null)))
  }

  // Coercions.java throws NumberFormatException on an unparseable
  // numeric string ("1.5" through Integer.valueOf) — and Spark 4's ANSI
  // cast AGREES (CAST_INVALID_INPUT), in both the object and the
  // primitive form: the coercion failure is a flow failure on both
  // engines, never a silent null/default. (The null-on-failure mapping
  // upstream exposes is the TAP's `safe = true`, pinned separately in
  // the TextDelimited coercion corner.)
  test("unparseable numeric string FAILS coercion on both engines " +
       "(Coercions NumberFormatException ≙ ANSI CAST_INVALID_INPUT)") {
    val df = Seq(("a", "1.5"), ("b", "7")).toDF("k", "n")
    val e1 = intercept[Exception] { rows(pipe(df).coerce("n" -> IntegerType)) }
    assert(e1.toString.contains("CAST_INVALID_INPUT")
      || e1.getMessage.contains("CAST_INVALID_INPUT"), e1.toString)
    val e2 = intercept[Exception] {
      rows(pipe(df).coercePrimitive("n" -> IntegerType)) }
    assert(e2.toString.contains("CAST_INVALID_INPUT")
      || e2.getMessage.contains("CAST_INVALID_INPUT"), e2.toString)
    // parseable rows coerce identically in both forms
    val ok = Seq(("b", "7"), ("c", null: String)).toDF("k", "n")
    assert(rows(pipe(ok).coerce("n" -> IntegerType)) ==
      Set(Seq("b", 7), Seq("c", null)))
    assert(rows(pipe(ok).coercePrimitive("n" -> IntegerType)) ==
      Set(Seq("b", 7), Seq("c", 0)))
  }

  // Boolean string literal sets DIVERGE: Boolean.parseBoolean accepts
  // only case-insensitive "true" (everything else false, never an
  // error); Spark's cast accepts the SQL literal family
  // t/true/y/yes/1 — so "yes" is true here where upstream says false.
  // Pinned as a documented divergence (the Filter REMOVE-polarity
  // precedent): agreement on "true"/"TRUE", the wider literal set named.
  test("boolean coercion: case-insensitive true agrees; Spark's SQL " +
       "literal set is WIDER ('yes' → true, upstream false)") {
    val df = Seq(("a", "TRUE"), ("b", "true"), ("c", "yes"))
      .toDF("k", "fl")
    assert(rows(pipe(df).coerce("fl" -> BooleanType)) ==
      Set(Seq("a", true), Seq("b", true), Seq("c", true)))
    assert(rows(pipe(df).coercePrimitive("fl" -> BooleanType)) ==
      Set(Seq("a", true), Seq("b", true), Seq("c", true)))
  }

  // ------------------------------------------------------------------
  // Conformance wave 15 (round 14): MergePipes / JoinFieldedPipes /
  // CoGroupFieldedPipes / AssemblyHelpers / TextDelimited remainder
  // ------------------------------------------------------------------

  // MergePipesPlatformTest.testSimpleMergeFail: merging streams whose
  // declared fields DIFFER is an assembly-time error upstream — and a
  // plan-time directed error here, including the same-names-reordered
  // shape a positional union would silently zip.
  test("merge of mismatched declared fields fails DIRECTED at plan " +
       "time; reordered same-name fields fail too") {
    val a = Seq((1, "a")).toDF("num", "ch")
    val b = Seq(("b", 2)).toDF("ch", "num")
    val c = Seq((3, "c")).toDF("num", "other")
    val e1 = intercept[IllegalArgumentException] {
      rows(pipe(a).merge(pipe(c)))
    }
    assert(e1.getMessage.contains("identical declared fields"))
    // same names, different ORDER: still a refusal, never a silent zip
    val e2 = intercept[IllegalArgumentException] {
      rows(pipe(a).merge(pipe(b)))
    }
    assert(e2.getMessage.contains("identical declared fields"))
    // the fix upstream prescribes — rename/retain to one schema — works
    assert(rows(pipe(a).merge(pipe(b).retain("num", "ch"))) ==
      Set(Seq(1, "a"), Seq(2, "b")))
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe2: the SAME pipe
  // object on both sides where one side is additionally NARROWED — the
  // planner must branch the shared upstream, not conflate the selectors.
  test("self hashJoin where the rhs branch narrows the shared pipe") {
    val p = pipe(lower)
    val j = p.hashJoin(Seq("num"), p.retain("num"), Seq("num"),
      declared = Some(Seq("num1", "ch1", "num2")))
    assert(Flow.toDF(j).columns.toSeq == Seq("num1", "ch1", "num2"))
    assert(rows(j) == (1 to 5).map(i =>
      Seq(i, "abcde"(i - 1).toString, i)).toSet)
  }

  // JoinFieldedPipesPlatformTest.testJoinSamePipe3: the same pipe
  // object joined with itself on a DIFFERENT key pair (ch → ch) — key
  // resolution must bind per SIDE, not per shared object.
  test("self hashJoin on a non-leading key field of the same object") {
    val p = pipe(lower)
    val j = p.hashJoin(Seq("ch"), p, Seq("ch"),
      declared = Some(Seq("num1", "ch1", "num2", "ch2")))
    assert(rows(j) == (1 to 5).map(i =>
      Seq(i, "abcde"(i - 1).toString, i, "abcde"(i - 1).toString)).toSet)
  }

  // JoinFieldedPipesPlatformTest.testJoinWithUnknowns: one join side's
  // fields are not user-declared — they resolve at plan time from an
  // upstream GENERATOR (Fields.UNKNOWN upstream); the join binds the
  // resolved names.
  test("hashJoin against a generator-resolved (undeclared) schema") {
    val wide = Seq((1, "x1", "y1"), (2, "x2", "y2")).toDF("num", "va", "vb")
    val gen = pipe(wide).generate(
      UnGroup(CFields.typed("k" -> IntegerType, "v" -> StringType),
        numKeys = 1, valueSelectors = Seq(Seq(1), Seq(2))),
      args = FieldSelector.All, out = FieldSelector.Results)
    val j = pipe(lower).hashJoin(Seq("num"), gen, Seq("k"),
      declared = Some(Seq("num", "ch", "k", "v")))
    assert(rows(j) == Set(
      Seq(1, "a", 1, "x1"), Seq(1, "a", 1, "y1"),
      Seq(2, "b", 2, "x2"), Seq(2, "b", 2, "y2")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupWithUnknowns: the same
  // resolved-schema contract through the SHUFFLE join, with the outer
  // joiner's null padding on the generator side.
  test("outer coGroup against a generator-resolved schema pads nulls") {
    val wide = Seq((1, "x1", "y1")).toDF("num", "va", "vb")
    val gen = pipe(wide).generate(
      UnGroup(CFields.typed("k" -> IntegerType, "v" -> StringType),
        numKeys = 1, valueSelectors = Seq(Seq(1), Seq(2))),
      args = FieldSelector.All, out = FieldSelector.Results)
    val j = pipe(lower).coGroup(Seq("num"), gen, Seq("k"),
      joiner = Joiner.Left,
      declared = Some(Seq("num", "ch", "k", "v")))
    assert(rows(j) == Set(
      Seq(1, "a", 1, "x1"), Seq(1, "a", 1, "y1"),
      Seq(2, "b", null, null), Seq(3, "c", null, null),
      Seq(4, "d", null, null), Seq(5, "e", null, null)))
  }

  // AssemblyHelpersPlatformTest.testMaxByString: MaxBy over a STRING
  // argument — lexicographic comparator, the MinByString twin.
  test("maxBy on strings is lexicographic (MinByString's twin)") {
    val df = Seq((1, "pear"), (1, "apple"), (2, "Zebra"), (2, "zebra"))
      .toDF("k", "s")
    // ASCII order: uppercase 'Z' < lowercase 'z'
    assert(rows(pipe(df).maxBy(Seq("k"), "s", "mx")) ==
      Set(Seq(1, "pear"), Seq(2, "zebra")))
  }

  // AssemblyHelpersPlatformTest.testAverageMerged: AverageBy over the
  // MERGE of branches — partials combine across inputs before the
  // average divides (the SumMerged/CountMerged triple completed).
  test("averageBy over merged branches divides the combined totals") {
    val a = Seq(("x", 1), ("y", 10)).toDF("ch", "v")
    val b = Seq(("x", 3), ("y", 20), ("y", 30)).toDF("ch", "v")
    val p = pipe(a).merge(pipe(b)).averageBy(Seq("ch"), "v", "mean")
    assert(rows(p) == Set(Seq("x", 2.0), Seq("y", 20.0)))
  }

  // AssemblyHelpersPlatformTest.testFirstBy's dual: Last under the
  // declared argument sort — max_by on the sort key, deterministic on
  // any partitioning (never "last seen").
  test("lastBy takes the value at the MAX of the declared sort key") {
    val df = Seq((1, "a", 10), (1, "b", 30), (1, "c", 20), (2, "d", 5))
      .toDF("k", "v", "ord")
    val p = pipe(df).groupBy("k").every(Aggs.lastBy("v", "ord", "last_v"),
      Aggs.firstBy("v", "ord", "first_v"))
    assert(rows(p) == Set(Seq(1, "b", "a"), Seq(2, "d", "d")))
  }

  // TextDelimitedPlatformTest.testQuotedTextAll: a file where EVERY
  // field is quoted — including numerics — parses identically to its
  // unquoted spelling (quotes are a transport artifact, not data).
  test("all-fields-quoted CSV parses identically to unquoted") {
    val dir = java.nio.file.Files.createTempDirectory("csvall")
    java.nio.file.Files.write(dir.resolve("d.csv"),
      "\"1\",\"a b\"\n\"2\",\"c,d\"\n".getBytes("UTF-8"))
    val schema = StructType(Seq(StructField("n", IntegerType),
      StructField("s", StringType)))
    val tap = graft.sources.CsvTap(dir.toString, schema = Some(schema))
    assert(tap.read(spark).collect().toSet.map((r: Row) => r.toSeq) ==
      Set(Seq(1, "a b"), Seq(2, "c,d")))
  }

  // TextDelimitedPlatformTest.testQuotedText — the spec-char bytes the
  // round-13 RFC fix implies: delimiter inside a quoted value, the
  // quote char at field EDGES (doubled), and the empty quoted field,
  // round-tripped in both directions.
  test("CSV spec-char round-trip: delimiter-in-value, edge quotes, " +
       "empty quoted field") {
    val vals = Seq("a,b", "\"edge\"", "", "plain")
    val dir = java.nio.file.Files.createTempDirectory("csvspec").toString
    val tap = graft.sources.CsvTap(s"$dir/out",
      schema = Some(StructType(Seq(StructField("s", StringType)))))
    tap.write(vals.toDF("s"), graft.sources.SinkMode.Replace)
    val bytes = java.nio.file.Files.list(java.nio.file.Paths.get(s"$dir/out"))
      .toArray.map(_.toString).filter(_.endsWith(".csv"))
      .flatMap(p => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(p)), "UTF-8").linesIterator)
      .toSet
    // RFC 4180 bytes: comma forces quoting; quotes double; empty stays
    assert(bytes.contains("\"a,b\""), bytes.toString)
    assert(bytes.contains("\"\"\"edge\"\"\""), bytes.toString)
    val back = tap.read(spark).collect().map(_.getString(0)).toSet
    assert((back - null) == Set("a,b", "\"edge\"", "plain"),
      back.toString) // empty string reads back null (Spark CSV contract)
  }

  // JoinFieldedPipesPlatformTest family — the empty-stream corner
  // (testFilterAll composed into HashJoin): an all-filtered build side
  // must yield an empty inner join WITH the joined schema, and a left
  // outer join that null-pads every probe row.
  test("hashJoin with an empty (filter-all) build side: inner empty " +
       "with intact schema, left outer fully null-padded") {
    val empty = pipe(upper).filterBy(ExpressionFilter("true"))
      .rename("num" -> "num2", "ch" -> "ch2")
    val inner = pipe(lower).hashJoin(Seq("num"), empty, Seq("num2"))
    assert(Flow.toDF(inner).columns.toSeq ==
      Seq("num", "ch", "num2", "ch2"))
    assert(Flow.toDF(inner).count() == 0)
    val louter = pipe(lower).hashJoin(Seq("num"), empty, Seq("num2"),
      joiner = Joiner.Left)
    assert(rows(louter) == (1 to 5).map(i =>
      Seq(i, "abcde"(i - 1).toString, null, null)).toSet)
  }

  // The LeftSemi/LeftAnti joiners at the PIPE level (the q13/q14
  // operators' semantics corner): duplicate keys on the probe-side
  // build table must never multiply semi-join output rows, and the two
  // joiners partition the lhs exactly.
  test("semi join never multiplies on dup build keys; semi + anti " +
       "partition the lhs") {
    val dups = Seq((1, "x"), (1, "y"), (3, "z")).toDF("num2", "v")
    val semi = pipe(lower).hashJoin(Seq("num"), pipe(dups), Seq("num2"),
      joiner = Joiner.LeftSemi)
    assert(Flow.toDF(semi).columns.toSeq == Seq("num", "ch"))
    assert(rows(semi) == Set(Seq(1, "a"), Seq(3, "c")))
    val anti = pipe(lower).hashJoin(Seq("num"), pipe(dups), Seq("num2"),
      joiner = Joiner.LeftAnti)
    assert(rows(anti) == Set(Seq(2, "b"), Seq(4, "d"), Seq(5, "e")))
  }

  // The null-key grouping contract (the CoGroup null-safe family's
  // GroupBy side): GroupBy and Unique treat null as ONE ordinary key —
  // only the NO_NULLS include mode drops such tuples.
  test("GroupBy groups null keys as one group; unique keeps one null " +
       "row; NO_NULLS drops them") {
    val df = Seq((Some("a"), 1), (None, 2), (None, 3), (Some("a"), 4))
      .toDF("k", "v")
    assert(rows(pipe(df).groupBy("k").every(Aggs.sum("v", "s"))) ==
      Set(Seq("a", 5L), Seq(null, 5L)))
    assert(rows(pipe(df).retain("k").unique("k")) ==
      Set(Seq("a"), Seq(null)))
    assert(rows(pipe(df).retain("k").uniqueNoNulls("k")) == Set(Seq("a")))
  }

  // ---- wave 16: FieldedPipes/CoGroupFieldedPipes remainder + the
  // cascading-core regex/text operation suite ----

  // FieldedPipesPlatformTest.testSimpleGroup: the suite's canonical
  // first test — RegexParser selecting capture group 1 (the ip) out of
  // an apache-style line, groupBy ip, count.
  test("RegexParser group selection feeds groupBy count " +
       "(testSimpleGroup)") {
    val logs = Seq("10.0.0.1 GET /a", "10.0.0.2 GET /b",
      "10.0.0.1 POST /c").toDF("line")
    val p = pipe(logs)
      .each(RegexParser(CFields.typed("ip" -> StringType),
          "^([^ ]*) .*$", Seq(1)),
        args = FieldSelector.All, out = FieldSelector.Results)
      .groupBy("ip").every(Aggs.count("count"))
    assert(rows(p) == Set(Seq("10.0.0.1", 2L), Seq("10.0.0.2", 1L)))
  }

  // cascading-core RegexParser (testParserDeclared family): a SUBSET of
  // capture groups, in caller order, with per-field type coercion — the
  // groups int[] contract.
  test("RegexParser group subset with typed coercion") {
    val df = Seq("2026-08-16", "1999-01-02").toDF("d")
    val p = pipe(df).each(
      RegexParser(CFields.typed("y" -> IntegerType, "day" -> IntegerType),
        "(\\d+)-(\\d+)-(\\d+)", Seq(1, 3)),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq(2026, 16), Seq(1999, 2)))
  }

  // cascading-core text operations (DateParser → DateFormatter): parse a
  // formatted date to a timestamp, re-format it in a different pattern —
  // the round-trip the upstream text suite pins.
  test("DateParser to DateFormatter round-trip") {
    val df = Seq("2023/01/05", "1970/12/31").toDF("raw")
    val p = pipe(df)
      .each(DateParser("ts", "yyyy/MM/dd"),
        args = FieldSelector.All, out = FieldSelector.Results)
      .each(DateFormatter("d", "yyyy-MM-dd"),
        args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("2023-01-05"), Seq("1970-12-31")))
  }

  // cascading-core FieldFormatter: java.util.Formatter semantics over
  // the argument fields (format_string is the same Formatter).
  test("FieldFormatter printf over argument fields") {
    val df = Seq(("a", 7), ("bb", 123)).toDF("s", "n")
    val p = pipe(df).each(FieldFormatter("f", "%s:%03d"),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("a:007"), Seq("bb:123")))
  }

  // cascading-core FieldJoiner: all argument fields joined by the
  // delimiter, numeric fields stringified.
  test("FieldJoiner concatenates args with the delimiter") {
    val df = Seq(("a", 1, "x")).toDF("p", "q", "r")
    val p = pipe(df).each(FieldJoiner("j", "-"),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("a-1-x")))
  }

  // cascading-core Sum/Average null coercion (Tuples.toDouble — the
  // documented upstream contract in Aggs): a null argument coerces to 0
  // but still COUNTS, so an all-null group sums to 0 (not SQL null) and
  // the average divides by EVERY tuple.
  test("sumCoerced/avgCoerced: all-null group sums 0, average counts " +
       "every tuple") {
    val df = Seq((1, Some(10)), (1, None), (2, None))
      .toDF("k", "v")
    val p = pipe(df).groupBy("k")
      .every(Aggs.sumCoerced("v", "s"), Aggs.avgCoerced("v", "a"))
    assert(rows(p) == Set(Seq(1, 10L, 5.0), Seq(2, 0L, 0.0)))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupSamePipe/SamePipe3: the
  // SAME memoized pipe branch cogroups ITSELF (one side a renamed
  // view) — self-join alias handling must not cross the branches, and
  // duplicate keys produce the per-key cross product.
  test("self coGroup over one memoized source; dup keys cross") {
    val src = pipe(lower)
    val j = src.coGroup(Seq("num"),
      src.rename("num" -> "num2", "ch" -> "ch2"), Seq("num2"))
    assert(rows(j) == lower.collect().map(r =>
      Seq(r.getInt(0), r.getString(1), r.getInt(0), r.getString(1))).toSet)
    val dup = pipe(Seq((1, "x"), (1, "y")).toDF("num", "ch"))
    val jd = dup.coGroup(Seq("num"),
      dup.rename("num" -> "num2", "ch" -> "ch2"), Seq("num2"))
    assert(rows(jd) == Set(
      Seq(1, "x", 1, "x"), Seq(1, "x", 1, "y"),
      Seq(1, "y", 1, "x"), Seq(1, "y", 1, "y")))
  }

  // CoGroupFieldedPipesPlatformTest.testCoGroupInnerSingleField: both
  // sides are key-only single-field pipes — output is (k, k) with full
  // multiplicity (a Set assertion would hide the duplicate).
  test("single-field inner coGroup keeps multiplicity") {
    val l = Seq(Tuple1(1), Tuple1(1), Tuple1(2)).toDF("num")
    val r = Seq(Tuple1(1), Tuple1(3)).toDF("num2")
    val j = pipe(l).coGroup(Seq("num"), pipe(r), Seq("num2"))
    val got = Flow.toDF(j).collect().map(_.toSeq)
    assert(got.length == 2 && got.toSet == Set(Seq(1, 1)), got.toSeq)
  }

  // The Each trap discipline on a REAL operation failure (the q52
  // contract over DateParser): under ANSI an unparseable date fails the
  // row; with a trap tap the flow completes, good rows flow, bad rows
  // land in the trap.
  test("DateParser failure: directed without a trap, trapped with one") {
    val df = Seq("2023/01/05", "not-a-date").toDF("raw")
    intercept[Exception] {
      rows(pipe(df).each(DateParser("ts", "yyyy/MM/dd"),
        args = FieldSelector.All, out = FieldSelector.Results))
    }
    val dir = java.nio.file.Files.createTempDirectory("dptrap").toString
    val trap = graft.sources.ParquetTap(s"$dir/trap")
    val good = Flow.toDFWithTraps(pipe(df)
      .each(DateParser("ts", "yyyy/MM/dd"),
        args = FieldSelector.All, out = FieldSelector.Results,
        trap = Some(trap))
      .each(DateFormatter("d", "yyyy-MM-dd"),
        args = FieldSelector.All, out = FieldSelector.Results))
      .collect().map(_.toSeq).toSet
    assert(good == Set(Seq("2023-01-05")))
    assert(trap.read(spark).collect().map(_.getString(0)).toSeq ==
      Seq("not-a-date"))
  }

  // FieldedPipesPlatformTest.testConcatenation / testSameSourceMerge
  // corner not yet pinned: a merge of a pipe with ITSELF (the same
  // branch twice) doubles every row — merge is multiset union, never
  // a distinct.
  test("merge of a branch with itself doubles rows (multiset union)") {
    val src = pipe(lower).filterBy(ExpressionFilter("num > 2")) // keeps 1,2
    val m = Flow.toDF(src.merge(src)).collect().map(_.toSeq)
    assert(m.length == 4 &&
      m.toSet == Set(Seq(1, "a"), Seq(2, "b")), m.toSeq)
  }

  // ---- wave 17 ----

  // SortedValuesPlatformTest.testComprehensiveGroupBy slice not yet
  // pinned: TWO secondary-sort fields with MIXED directions — the
  // per-field direction list applies field-by-field.
  test("secondary sort on two fields with mixed directions") {
    val df = Seq((1, 5, "x"), (1, 5, "a"), (1, 2, "m"), (2, 9, "q"))
      .toDF("k", "v1", "v2")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("seq" -> StringType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        Iterator.single(Seq(
          rs.map(r => s"${r.getInt(1)}${r.getString(2)}").mkString(",")))
    }
    val p = pipe(df)
      .groupBySorted(Seq("k"), Seq("v1" -> true, "v2" -> false))
      .buffer(b)
    // k=1: v1 asc, then v2 DESC within equal v1 → 2m, 5x, 5a
    assert(rows(p) == Set(Seq(1, "2m,5x,5a"), Seq(2, "9q")))
  }

  // Cascading Fields.GROUP/Fields.VALUES are grouping-context
  // selectors; using one as an Each output selector throws in the
  // upstream planner too — pinned as a directed refusal.
  test("GROUP/VALUES selectors outside a grouping context refuse " +
       "directed") {
    for (sel <- Seq(FieldSelector.Group, FieldSelector.Values)) {
      val ex = intercept[Exception] {
        rows(pipe(lower).each(Identity(CFields.of("num", "ch")),
          args = FieldSelector.All, out = sel))
      }
      assert(ex.getMessage != null &&
        (ex.getMessage.contains("grouping context") ||
          ex.getMessage.contains("bad out selector")), s"$sel: $ex")
    }
  }

  // cascading-core Identity(Fields, Class...): declared result TYPES
  // coerce the arguments — the Each-level cast path (upstream
  // FieldTypeInfo coercion applied by Identity).
  test("Identity with declared types coerces arguments") {
    val df = Seq(("12", "3.5"), ("7", "0.25")).toDF("a", "b")
    val p = pipe(df).each(
      Identity(CFields.typed("a" -> IntegerType, "b" -> DoubleType)),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq(12, 3.5), Seq(7, 0.25)))
  }

  // Negative positional selectors (cascading Fields(-1) resolves from
  // the end of the tuple).
  test("negative positional selector resolves from the tuple end") {
    val p = pipe(Seq((1, "a", true)).toDF("x", "y", "z"))
      .each(Identity(CFields.of("y2")), args = FieldSelector(Seq("-2"): _*),
        out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("a")))
  }

  // cascading-core FieldFormatter with Formatter integer conversions —
  // hex and zero-padding follow java.util.Formatter on both paths.
  test("FieldFormatter hex and zero-pad conversions") {
    val df = Seq((255, 7)).toDF("m", "n")
    val p = pipe(df).each(FieldFormatter("f", "%x|%04d"),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("ff|0007")))
  }

  // DateParser/DateFormatter timezone pin: the session runs UTC, so an
  // epoch-anchored parse formats back without an offset (the
  // cross-engine TZ trap the oracle gotchas document).
  test("date round-trip is UTC-stable including time-of-day") {
    val p = pipe(Seq("1970/01/02 03:04").toDF("raw"))
      .each(DateParser("ts", "yyyy/MM/dd HH:mm"),
        args = FieldSelector.All, out = FieldSelector.Results)
      .each(DateFormatter("d", "yyyy-MM-dd HH:mm"),
        args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("1970-01-02 03:04")))
  }

  // ------------------------------------------------------------------
  // Wave 18 — FieldedPipes/CoGroupFieldedPipes/MergePipes/SortedValues
  // remainder (/root/reference/pom.xml:446-448 runs the whole platform
  // suite as its CI).

  // CoGroupFieldedPipesPlatformTest.testCoGroupAroundCoGroupWithout:
  // the chained-CoGroup WITHOUT-declared-fields variant — the second
  // CoGroup keys on the FIRST's carried-through key column under its
  // ORIGINAL name (no rename between stages).
  test("cogroup around cogroup keying on the carried original key name") {
    val a = pipe(Seq((1, "a1"), (2, "a2")).toDF("k", "va"))
    val b = pipe(Seq((1, "b1"), (3, "b3")).toDF("kb", "vb"))
    val c = pipe(Seq((1, "c1"), (2, "c2"), (4, "c4")).toDF("kc", "vc"))
    val j = a.coGroup(Seq("k"), b, Seq("kb"), Joiner.Outer)
      .coGroup(Seq("k"), c, Seq("kc"), Joiner.Inner)
    // outer(a,b) keeps keys 1,2,3 (3 with null a-side); inner with c on
    // the ORIGINAL 'k' drops key 3 (its k is null after padding — the
    // ANSI null-key default) and key 4 (absent upstream)
    assert(rows(j) == Set(
      Seq(1, "a1", 1, "b1", 1, "c1"),
      Seq(2, "a2", null, null, 2, "c2")))
  }

  // SortedValuesPlatformTest (reversed CUSTOM comparator): Cascading
  // sorts group values through Fields.setComparator; the Spark mapping
  // is a DERIVED sort-key column (SURVEY §1.3) — here length-then-text,
  // reversed, with the helper column discarded before the buffer output.
  test("custom-comparator secondary sort via a derived key column, " +
       "reversed") {
    val df = Seq(("g", "bbb"), ("g", "a"), ("g", "cc"), ("g", "b"))
      .toDF("k", "v")
    val b = new CBuffer {
      val resultFields: CFields = CFields.typed("seq" -> StringType)
      def operate(key: Seq[Any], rs: Iterator[Row]): Iterator[Seq[Any]] =
        Iterator.single(Seq(rs.map(_.getString(1)).mkString(",")))
    }
    val p = pipe(df)
      .each(ExpressionFunction("sk", "concat(length(v), v)", StringType),
        args = FieldSelector.All, out = FieldSelector.All)
      .groupBySorted(Seq("k"), Seq("sk" -> false))
      .buffer(b)
    // comparator = (length, text) → asc "1a,1b,2cc,3bbb"; reversed:
    assert(rows(p) == Set(Seq("g", "3bbb,2cc,1b,1a"))
      || rows(p) == Set(Seq("g", "bbb,cc,b,a")), rows(p).toString)
  }

  // SortedValuesPlatformTest (invalid sort field): a sort key that
  // resolves to NO field is a PLAN-TIME failure upstream (Cascading's
  // FieldsResolverException) — never a silently-ignored sort.
  test("sorting on a nonexistent field refuses directed at plan time") {
    val df = Seq(("g", 1)).toDF("k", "v")
    val ex = intercept[Exception] {
      Flow.toDF(pipe(df).groupBySorted(Seq("k"), Seq("nope" -> true))
        .every(Aggs.count("n")))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("nope")),
      ex.toString)
  }

  // JoinFieldedPipesPlatformTest (single-field sides with duplicate
  // keys): both sides carry ONLY their key column; the inner HashJoin
  // multiplies multiplicities and the result is exactly the two key
  // columns (no value fields to carry).
  test("single-field inner hash join multiplies duplicate keys") {
    val l = pipe(Seq(1, 1, 2, 3).toDF("num"))
    val r = pipe(Seq(1, 2, 2).toDF("num2"))
    val j = l.hashJoin(Seq("num"), r, Seq("num2"))
    val df = Flow.toDF(j)
    assert(df.columns.toSeq == Seq("num", "num2"))
    val got = df.collect().map(x => (x.getInt(0), x.getInt(1))).toSeq
      .groupBy(identity).view.mapValues(_.size).toMap
    assert(got == Map((1, 1) -> 2, (2, 2) -> 2), got.toString)
  }

  // MergePipesPlatformTest (both HashJoin sides are merges): streamed =
  // merge(a, b), accumulated = merge(c, d) — the broadcast side being
  // itself a union must still plan as a broadcast hash join.
  test("hash join of a merged stream against a merged accumulated side") {
    val streamed = pipe(Seq((1, "s1"), (2, "s2")).toDF("num", "sv"))
      .merge(pipe(Seq((2, "s3"), (3, "s4")).toDF("num", "sv")))
    val acc = pipe(Seq((1, "d1")).toDF("k", "dv"))
      .merge(pipe(Seq((2, "d2"), (9, "d9")).toDF("k", "dv")))
    val j = streamed.hashJoin(Seq("num"), acc, Seq("k"))
    val df = Flow.toDF(j)
    assert(df.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))
    assert(df.collect().map(x =>
      (x.getInt(0), x.getString(1), x.getString(3))).toSet ==
      Set((1, "s1", "d1"), (2, "s2", "d2"), (2, "s3", "d2")))
  }

  // CoGroupFieldedPipesPlatformTest (outer padding vs genuine null
  // values): Cascading emits the SAME null for an outer-join pad and a
  // genuinely-null value field — downstream cannot distinguish them,
  // and neither does the Spark lowering.
  test("outer-join padding null and genuine value null are " +
       "indistinguishable") {
    val l = pipe(Seq((1, "l1"), (2, "l2")).toDF("k", "lv"))
    val rdf = Seq((1, null.asInstanceOf[String]), (3, "r3"))
      .toDF("k2", "rv")
    val j = l.coGroup(Seq("k"), pipe(rdf), Seq("k2"), Joiner.Outer)
    // key 1: rv is a GENUINE null; key 2: rv is a PADDING null — rows
    // carry identical null shapes either way
    assert(rows(j) == Set(
      Seq(1, "l1", 1, null),
      Seq(2, "l2", null, null),
      Seq(null, null, 3, "r3")))
  }

  // MergePipesPlatformTest (merge of a merge): nested Merge keeps
  // multiset semantics — every input row counts once through both
  // levels, pinned through a GroupBy count.
  test("merge of a merge keeps multiset counts through a group") {
    val a = pipe(Seq("x", "y").toDF("ch"))
    val b = pipe(Seq("y", "z").toDF("ch"))
    val c = pipe(Seq("x", "x").toDF("ch"))
    val p = a.merge(b).merge(c).groupBy("ch").every(Aggs.count("n"))
    assert(rows(p) == Set(Seq("x", 3L), Seq("y", 2L), Seq("z", 1L)))
  }

  // FieldedPipesPlatformTest (UnGroup selector reusing the key
  // position): a value selector may re-select the KEY column — the key
  // then appears twice in those output rows (upstream UnGroup places
  // whatever the selector names).
  test("UnGroup value selector may reuse the key position") {
    val df = Seq(("k1", "a", "b")).toDF("num", "c1", "c2")
    val p = pipe(df).generate(
      UnGroup(CFields.typed("num" -> StringType, "ch" -> StringType),
        numKeys = 1, valueSelectors = Seq(Seq(1), Seq(0))),
      args = FieldSelector.All, out = FieldSelector.Results)
    assert(rows(p) == Set(Seq("k1", "a"), Seq("k1", "k1")))
  }

  // FieldedPipesPlatformTest.testSplitEach: one head SPLIT into two
  // branches that apply DIFFERENT Each transforms, merged back — the
  // split memo must give each branch an independent transform chain.
  test("split branches transform independently, then merge back") {
    val src = pipe(Seq((1, "a"), (2, "b")).toDF("num", "ch"))
    val up = src.each(ExpressionFunction("t", "upper(ch)", StringType),
      args = FieldSelector("ch"), out = FieldSelector.Swap)
    val tag = src.each(ExpressionFunction("t", "concat(ch, '!')",
        StringType),
      args = FieldSelector("ch"), out = FieldSelector.Swap)
    assert(rows(up.merge(tag)) == Set(
      Seq(1, "A"), Seq(2, "B"), Seq(1, "a!"), Seq(2, "b!")))
  }

  // CoGroupFieldedPipesPlatformTest (full outer through BOTH stages of
  // a 3-way chain): rows living only in the THIRD input surface with
  // nulls across all carried columns of the first two.
  test("three-way cogroup, outer at both stages") {
    val a = pipe(Seq((1, "a1")).toDF("k", "va"))
    val b = pipe(Seq((2, "b2")).toDF("kb", "vb"))
    val c = pipe(Seq((3, "c3")).toDF("kc", "vc"))
    val j = a.coGroup(Seq("k"), b, Seq("kb"), Joiner.Outer)
      .coGroup(Seq("k"), c, Seq("kc"), Joiner.Outer)
    assert(rows(j) == Set(
      Seq(1, "a1", null, null, null, null),
      Seq(null, null, 2, "b2", null, null),
      Seq(null, null, null, null, 3, "c3")))
  }
}
