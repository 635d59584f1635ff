package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.model.FieldSelector._

/** Property-based checks for the pure layers (no Spark session).
  * Uses scalacheck generators with explicit sampling (the
  * scalatest-scalacheck bridge artifact is not on the offline classpath). */
class PropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 200): Seq[T] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  private val nameGen = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString)
  private val namesGen = Gen.nonEmptyListOf(nameGen).map(_.distinct)

  test("RESULTS always returns exactly the result fields") {
    for ((in, res) <- samples(namesGen).zip(samples(namesGen)))
      assert(resolveOutput(Results, in, Nil, res) == res)
  }

  test("SWAP removes argument fields unless re-emitted as results") {
    for (in <- samples(namesGen)) {
      val args = in.take(1)
      val out = resolveOutput(Swap, in, args, List("zz_result"))
      assert(!out.contains(args.head) || args.head == "zz_result")
      assert(out.contains("zz_result"))
    }
  }

  test("ALL preserves every incoming field without duplicates") {
    for ((in, res) <- samples(namesGen).zip(samples(namesGen))) {
      val out = resolveOutput(All, in, Nil, res)
      assert(in.forall(out.contains))
      assert(out.distinct == out)
    }
  }

  test("negative positions agree with positive positions") {
    for (in <- samples(namesGen); i <- in.indices)
      assert(resolvePos(i.toString, in) ==
        resolvePos((i - in.length).toString, in))
  }

  test("Md5Prefix40.hash is stable and within 40 bits") {
    for (s <- samples(Gen.asciiPrintableStr, 500)) {
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      val h = graft.catalyst.Md5Prefix40.hash(u)
      assert(h >= 0L && h < (1L << 40))
      assert(h == graft.catalyst.Md5Prefix40.hash(u))
    }
  }

  test("MinKPairsAgg heap keeps the k smallest pairs, insertion-order independent") {
    val rnd = new scala.util.Random(77)
    for (_ <- 1 to 50) {
      val n = 1 + rnd.nextInt(300)
      val k = 1 + rnd.nextInt(20)
      // coarse values force ties; unique ids make the expected set total
      val pairs = (1 to n).map(i => (rnd.nextInt(40).toLong, i.toLong))
      val expect = pairs.sorted.take(k)
      def run(ps: Seq[(Long, Long)]): Seq[(Long, Long)] = {
        val h = new graft.catalyst.MinKPairsAgg.PairHeap(k)
        ps.foreach { case (v, id) => h.offer(v, id) }
        val (vs, ids) = h.sortedAsc()
        vs.zip(ids).toSeq
      }
      assert(run(pairs) == expect)
      assert(run(rnd.shuffle(pairs)) == expect)
    }
  }

  test("MinHash permutation coefficients stay within the field") {
    import graft.functions.Dedup.{aCoef, bCoef, P}
    (0 until 64).foreach { i =>
      assert(aCoef(i) >= 0 && aCoef(i) < P)
      assert(bCoef(i) >= 0 && bCoef(i) < P)
      // multiplication headroom: (P-1) * aCoef + bCoef must not overflow
      assert(BigInt(P - 1) * aCoef(i) + bCoef(i) <= BigInt(Long.MaxValue))
    }
  }

  test("PII redaction is idempotent: placeholders never re-match any pattern") {
    // Spark's regexp_replace uses java.util.regex — the same engine this
    // property exercises, so the pattern-level property transfers exactly.
    import graft.functions.Governance._
    def redact(s: String): String = s
      .replaceAll(EmailRegex, "<EMAIL>")
      .replaceAll(PhoneRegex, "<PHONE>")
      .replaceAll(Ipv4Regex, "<IP>")
    val piiGen = Gen.oneOf(
      "a.user@mail.example.com", "x@y.io", "call 555-0142",
      "415-555-0142", "10.0.0.1", "192.168.255.3")
    val docGen = for {
      words <- Gen.listOfN(8, Gen.alphaStr)
      pii <- Gen.listOfN(2, piiGen)
    } yield scala.util.Random.shuffle(words ++ pii).mkString(" ")
    for (doc <- samples(docGen, 300)) {
      val once = redact(doc)
      assert(redact(once) == once, s"not idempotent on: $doc")
      assert(!once.contains("@") || doc.contains("@@"), s"email survived: $once")
    }
    for (ph <- Seq("<EMAIL>", "<PHONE>", "<IP>"))
      assert(redact(ph) == ph)
  }

  test("Misra-Gries: candidates always cover the true heavy hitters, any split") {
    import graft.catalyst.MisraGriesAgg.Sketch
    val streamGen = for {
      nItems <- Gen.choose(1, 40)     // distinct universe size
      len    <- Gen.choose(50, 500)
      items  <- Gen.listOfN(len, Gen.choose(0, nItems - 1))
    } yield items.map(i => s"i$i")
    for ((stream, seed) <- samples(streamGen, 60).zipWithIndex) {
      val k = 8
      // split into 1..4 partial sketches by a varying stripe, then merge —
      // the guarantee must hold under every merge shape
      val parts = 1 + seed % 4
      val sketches = Array.fill(parts)(new Sketch(k))
      stream.zipWithIndex.foreach { case (it, i) => sketches(i % parts).offer(it) }
      val merged = sketches.reduce { (a, b) => a.mergeIn(b); a }
      assert(merged.counts.size <= k)
      val exact = stream.groupBy(identity).view.mapValues(_.size)
      val bound = stream.size.toDouble / (k + 1)
      for ((item, n) <- exact if n > bound)
        assert(merged.counts.containsKey(item),
          s"heavy item $item (n=$n > bound=$bound) evicted; stream size ${stream.size}")
    }
  }

  test("zkey is monotone in each dim at fixed other dim, and injective on the grid") {
    import graft.functions.ZOrder
    // pure-JVM mirror of the Column expression (same shifts/masks)
    def z(x: Long, y: Long): Long =
      (0 until ZOrder.Bits).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val g = Gen.choose(0L, (1L << ZOrder.Bits) - 1)
    val pts = samples(Gen.zip(g, g), 300)
    // injective: distinct (x, y) → distinct keys
    assert(pts.distinct.map { case (x, y) => z(x, y) }.distinct.size ==
      pts.distinct.size)
    // strictly monotone per dimension (interleave preserves bit order)
    for ((x, y) <- pts.take(50)) {
      if (x + 1 < (1L << ZOrder.Bits)) assert(z(x + 1, y) > z(x, y))
      if (y + 1 < (1L << ZOrder.Bits)) assert(z(x, y + 1) > z(x, y))
    }
  }

  test("BM25 constants are stored literals, not runtime sums (cross-engine drift trap)") {
    import graft.functions.Relevance._
    assert(K1Plus1 == "2.2".toDouble)
    assert(K1 == "1.2".toDouble && B == "0.75".toDouble &&
      OneMinusB == "0.25".toDouble)
    // the trap this guards: 1.2 + 1.0 in binary64 does NOT round to the
    // same double as parsing "2.2" — if that ever becomes equal on some
    // platform the literal is still correct, but the reverse would
    // silently diverge the Spark plan from the DuckDB oracle
    assert(OneMinusB == 1.0 - B) // exact: 0.75 and 0.25 are dyadic
  }
}
