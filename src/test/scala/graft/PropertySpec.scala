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
}
