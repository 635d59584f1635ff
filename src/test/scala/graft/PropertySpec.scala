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
