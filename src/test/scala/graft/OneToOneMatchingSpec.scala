package graft

import graft.operators.OneToOneMatching
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Greedy maximum-weight 1:1 matching: differential against the
  * sequential greedy over the same total order (the round-equivalence
  * the er_link_1to1 oracle relies on), matching invariants, tie
  * handling, and the convergence bound. */
class OneToOneMatchingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def toDf(edges: Seq[(String, String, Double)]): DataFrame = {
    import spark.implicits._
    edges.toDF("lft", "rgt", "w")
  }

  private def run(edges: Seq[(String, String, Double)]): Set[(String, String, Double)] =
    OneToOneMatching.greedyMatch(toDf(edges))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet

  test("distributed rounds == sequential greedy (random graphs, heavy ties)") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 8) {
      // few distinct weights on purpose: ties must resolve identically
      // through the (w DESC, lft, rgt) order on both sides
      val edges = (for {
        l <- 0 until 12; r <- 0 until 12
        if rnd.nextDouble() < 0.3
      } yield (f"l$l%02d", f"r$r%02d", (1 + rnd.nextInt(4)).toDouble / 2)).toList
      assert(run(edges) == OneToOneMatching.sequentialGreedy(edges).toSet,
        s"trial $trial (${edges.size} edges)")
    }
  }

  test("result is a maximal 1:1 matching") {
    val rnd = new scala.util.Random(7)
    val edges = (for {
      l <- 0 until 15; r <- 0 until 15
      if rnd.nextDouble() < 0.25
    } yield (f"l$l%02d", f"r$r%02d", rnd.nextInt(10).toDouble)).toList
    val m = run(edges)
    val ls = m.map(_._1); val rs = m.map(_._2)
    assert(ls.size == m.size, "a left id matched twice")
    assert(rs.size == m.size, "a right id matched twice")
    // maximality: no input edge has BOTH endpoints unmatched
    assert(edges.forall { case (l, r, _) => ls(l) || rs(r) })
  }

  test("golden: best edge wins, blocked neighbors cascade by round") {
    // l1-r1(10) beats l2-r1(9); l2 then takes r2(8) in round 2,
    // blocking l3-r2(7); l3 takes r3(6) in round 3
    val edges = Seq(("l1", "r1", 10.0), ("l2", "r1", 9.0), ("l2", "r2", 8.0),
      ("l3", "r2", 7.0), ("l3", "r3", 6.0), ("l4", "r3", 5.0))
    val out = OneToOneMatching.greedyMatch(toDf(edges))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(3))).toSet
    assert(out == Set(("l1", "r1", 1), ("l2", "r2", 2), ("l3", "r3", 3)))
  }

  test("empty input yields an empty matching with the full schema") {
    val out = OneToOneMatching.greedyMatch(toDf(Nil))
    assert(out.columns.toSeq == Seq("lft", "rgt", "w", "round"))
    assert(out.count() == 0L)
  }

  test("convergence bound: a long decreasing chain exceeds maxRounds") {
    // the golden chain needs 3 rounds; maxRounds = 2 must fail loudly
    val edges = Seq(("l1", "r1", 10.0), ("l2", "r1", 9.0), ("l2", "r2", 8.0),
      ("l3", "r2", 7.0), ("l3", "r3", 6.0), ("l4", "r3", 5.0))
    val ex = intercept[IllegalArgumentException] {
      OneToOneMatching.greedyMatch(toDf(edges), maxRounds = 2)
    }
    assert(ex.getMessage.contains("did not converge"))
  }
}
