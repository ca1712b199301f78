package graft

import graft.operators.BlockingScheme
import org.scalatest.funsuite.AnyFunSuite

/** Adaptive blocking-scheme selection: the greedy chain on
  * hand-computable channels (marginal counts, pick order, zero-coverage
  * tail), the alphabetical tie-break, and determinism. */
class BlockingSchemeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def pairsDf(ps: (String, String)*) = {
    import spark.implicits._
    ps.toDF("tokA", "tokB")
  }

  test("greedy chain: marginal ratios, picks, and the zero-coverage tail are exact") {
    val truth = pairsDf(("a", "b"), ("c", "d"), ("e", "f"))
    val chain = BlockingScheme.greedyChain(Seq(
      "tight" -> pairsDf(("a", "b")),
      "broad" -> pairsDf(("a", "b"), ("c", "d"), ("e", "f"), ("x", "y"),
        ("p", "q"), ("r", "s")),
      "junk" -> pairsDf(("x", "y"), ("z", "w"))), truth)
    val byStep = chain.groupBy(_.step).map { case (s, es) =>
      s -> es.map(e => (e.scheme, e.marginalTruth, e.marginalPairs, e.chosen)).toSet
    }
    // step 1: tight 1/1 beats broad 3/6 beats junk 0/2
    assert(byStep(1) === Set(("tight", 1L, 1L, true), ("broad", 3L, 6L, false),
      ("junk", 0L, 2L, false)))
    // step 2: (a,b) selected — broad offers 2/5, junk 0/2
    assert(byStep(2) === Set(("broad", 2L, 5L, true), ("junk", 0L, 2L, false)))
    // step 3: only (z,w) is fresh for junk; zero coverage, still emitted
    assert(byStep(3) === Set(("junk", 0L, 1L, true)))
  }

  test("equal ratios break alphabetically; identical channels stay deterministic") {
    val truth = pairsDf(("a", "b"))
    val chain = BlockingScheme.greedyChain(Seq(
      "zeta" -> pairsDf(("a", "b"), ("x", "y")),
      "alpha" -> pairsDf(("a", "b"), ("p", "q"))), truth)
    assert(chain.filter(_.chosen).map(e => (e.step, e.scheme)) ===
      Seq((1, "alpha"), (2, "zeta")))
    // second pick's marginals: (a,b) gone, (x,y) fresh, no truth left
    assert(chain.find(e => e.step == 2 && e.scheme == "zeta").get.marginalPairs === 1L)
    val again = BlockingScheme.greedyChain(Seq(
      "zeta" -> pairsDf(("a", "b"), ("x", "y")),
      "alpha" -> pairsDf(("a", "b"), ("p", "q"))), truth)
    assert(again === chain)
  }
}
