package graft

import graft.operators.GroupLinkage
import org.scalatest.funsuite.AnyFunSuite

/** Group linkage: weight arithmetic on a hand-built non-diagonal case
  * (the corpus query's group graph is diagonal by construction — the
  * spec is where cross-group competition is exercised), duplicate-edge
  * dedup, thresholding, and the group-grain 1:1 assignment. */
class GroupLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def fixtures = {
    import spark.implicits._
    val left = Seq(
      ("l1", "A"), ("l2", "A"), ("l3", "A"),
      ("l4", "B"), ("l5", "B"), ("l6", "C")).toDF("id", "gid")
    val right = Seq(
      ("r1", "X"), ("r2", "X"),
      ("r3", "Y"), ("r4", "Y"), ("r5", "Y"), ("r6", "Z")).toDF("id", "gid")
    val edges = Seq(
      ("l1", "r1"), ("l1", "r1"), // duplicate row must not double-count
      ("l2", "r2"), ("l3", "r3"), ("l4", "r4"), ("l6", "r6"))
      .toDF("lft", "rgt")
    (edges, left, right)
  }

  test("groupWeights: counts, sizes, jaccard/dice/overlap") {
    import spark.implicits._
    val (edges, left, right) = fixtures
    val w = GroupLinkage.groupWeights(edges, left, right)
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect().map(r => (r._1, r._2) -> r).toMap
    assert(w.size == 4)
    assert(w(("A", "X")) == ("A", "X", 2L, 3L, 2L, 0.666667, 0.8, 1.0))
    assert(w(("A", "Y")) == ("A", "Y", 1L, 3L, 3L, 0.2, 0.333333, 0.333333))
    assert(w(("B", "Y")) == ("B", "Y", 1L, 2L, 3L, 0.25, 0.4, 0.5))
    assert(w(("C", "Z")) == ("C", "Z", 1L, 1L, 1L, 1.0, 1.0, 1.0))
  }

  test("matchGroups: greedy 1:1 over jaccard, equal to sequential greedy") {
    import spark.implicits._
    val (edges, left, right) = fixtures
    val weights = GroupLinkage.groupWeights(edges, left, right)
    val got = GroupLinkage.matchGroups(weights, GroupLinkage.DefaultMinJaccard)
      .as[(String, String, Double, Int)].collect()
      .map(r => (r._1, r._2, r._3)).toSet
    // A-Y (0.2) loses both endpoints to A-X (0.666667) and B-Y (0.25)
    assert(got == Set(("C", "Z", 1.0), ("A", "X", 0.666667), ("B", "Y", 0.25)))
    val seq = graft.operators.OneToOneMatching.sequentialGreedy(
      weights.as[(String, String, Long, Long, Long, Double, Double, Double)]
        .collect().toSeq
        .filter(_._6 >= GroupLinkage.DefaultMinJaccard)
        .map(r => (r._1, r._2, r._6))).toSet
    assert(got == seq.map(e => (e._1, e._2, e._3)))
  }

  test("matchGroups: threshold prunes before the assignment") {
    import spark.implicits._
    val (edges, left, right) = fixtures
    val got = GroupLinkage.matchGroups(
      GroupLinkage.groupWeights(edges, left, right), 0.3)
      .as[(String, String, Double, Int)].collect()
      .map(r => (r._1, r._2)).toSet
    assert(got == Set(("C", "Z"), ("A", "X")))
  }

  test("perfect member matching gives jaccard = dice = overlap = 1") {
    import spark.implicits._
    val left = Seq(("a1", "G"), ("a2", "G")).toDF("id", "gid")
    val right = Seq(("b1", "H"), ("b2", "H")).toDF("id", "gid")
    val edges = Seq(("a1", "b1"), ("a2", "b2")).toDF("lft", "rgt")
    val r = GroupLinkage.groupWeights(edges, left, right)
      .as[(String, String, Long, Long, Long, Double, Double, Double)]
      .collect()
    assert(r.toSeq == Seq(("G", "H", 2L, 2L, 2L, 1.0, 1.0, 1.0)))
  }
}
