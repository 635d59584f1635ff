package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.model.FieldSelector
import graft.model.FieldSelector._

/** Field-selector algebra (SURVEY.md §1.1): Cascading ALL/RESULTS/SWAP/
  * REPLACE output-selector semantics + relative negative positions. */
class ModelSpec extends AnyFunSuite {
  private val in = Seq("a", "b", "c")

  test("ALL = incoming ++ new results") {
    assert(resolveOutput(All, in, Seq("a"), Seq("r")) == Seq("a", "b", "c", "r"))
  }
  test("ALL does not duplicate same-named results") {
    assert(resolveOutput(All, in, Seq("a"), Seq("b")) == Seq("a", "b", "c"))
  }
  test("RESULTS = results only") {
    assert(resolveOutput(Results, in, Seq("a"), Seq("r1", "r2")) == Seq("r1", "r2"))
  }
  test("SWAP = incoming minus args plus results") {
    assert(resolveOutput(Swap, in, Seq("b"), Seq("r")) == Seq("a", "c", "r"))
  }
  test("negative positions resolve from the end") {
    assert(resolvePos("-1", in) == "c")
    assert(resolvePos("0", in) == "a")
    assert(resolvePos("b", in) == "b")
  }
  test("out-of-range position throws") {
    intercept[IllegalArgumentException](resolvePos("7", in))
  }
  test("grouping selectors rejected outside grouping context") {
    intercept[IllegalArgumentException](
      resolveOutput(Group, in, Nil, Nil))
  }
}
