package graft

import graft.operators.SetSimJoin
import org.scalatest.funsuite.AnyFunSuite

/** Exact set-similarity join: brute-force differential (no false
  * negatives AND no false positives), threshold edges, and skewed token
  * frequencies. */
class SetSimJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def jaccard(a: Set[String], b: Set[String]): Double =
    a.intersect(b).size.toDouble / a.union(b).size

  private def brute(docs: Seq[(String, Set[String])], tNum: Int, tDen: Int) =
    (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (ia, ta) = docs(i); (ib, tb) = docs(j)
      if ta.intersect(tb).size * tDen >= ta.union(tb).size * tNum
    } yield (if (ia < ib) (ia, ib) else (ib, ia))).toSet

  private def run(docs: Seq[(String, Set[String])], tNum: Int, tDen: Int) = {
    import spark.implicits._
    val df = docs.map { case (id, t) => (id, t.toSeq) }.toDF("id", "toks")
    SetSimJoin.join(df, tNum, tDen)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("differential vs brute force over random token sets") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 40).map(i => f"t$i%02d")
    for (trial <- 0 until 5) {
      val docs = (0 until 30).map { i =>
        val k = 3 + rnd.nextInt(10)
        (f"d$i%02d", rnd.shuffle(vocab).take(k).toSet)
      }
      for ((num, den) <- Seq((1, 2), (7, 10), (9, 10)))
        assert(run(docs, num, den) == brute(docs, num, den),
          s"trial $trial t=$num/$den")
    }
  }

  test("identical sets always match at t=1; disjoint sets never do") {
    val docs = Seq(
      ("a", Set("x", "y", "z")), ("b", Set("x", "y", "z")),
      ("c", Set("p", "q")))
    assert(run(docs, 1, 1) == Set(("a", "b")))
  }

  test("threshold boundary is inclusive and integer-exact") {
    // |x∩y| = 3 of |x∪y| = 4 → jaccard exactly 3/4
    val docs = Seq(("a", Set("1", "2", "3")), ("b", Set("1", "2", "3", "4")))
    assert(run(docs, 3, 4) == Set(("a", "b"))) // == t kept
    assert(run(docs, 4, 5).isEmpty) // just above → dropped
  }

  test("skewed frequencies: a universal token does not break exactness") {
    // every doc shares token "the" — with rare-first ordering it should
    // rarely be a prefix token, but even when it must be, results stay
    // exact
    val docs = Seq(
      ("a", Set("the", "u1", "u2")),
      ("b", Set("the", "u1", "u2")),
      ("c", Set("the", "v1", "v2")),
      ("d", Set("the", "w1")))
    assert(run(docs, 9, 10) == brute(docs, 9, 10))
    assert(run(docs, 1, 4) == brute(docs, 1, 4))
  }

  test("plan lock: no cartesian/nested-loop join anywhere in the pipeline") {
    import spark.implicits._
    val df = (0 until 20).map(i => (s"d$i", Seq(s"t$i", s"t${i + 1}", "common")))
      .toDF("id", "toks")
    val plan = SetSimJoin.join(df, 1, 2).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), "must never plan a cross product")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "must never nested-loop join")
  }

  test("jaccard/intersect/union columns are exact") {
    import spark.implicits._
    val df = Seq(("a", Seq("1", "2", "3")), ("b", Seq("2", "3", "4"))).toDF("id", "toks")
    val r = SetSimJoin.join(df, 1, 2).collect()
    assert(r.length == 1)
    assert(r.head.getInt(2) == 2 && r.head.getInt(3) == 4)
    assert(r.head.getDouble(4) == 0.5)
  }

  // ---- cosine twin ----

  private def bruteCos(docs: Seq[(String, Set[String])], tNum: Int, tDen: Int) =
    (for {
      i <- docs.indices; j <- (i + 1) until docs.length
      (ia, ta) = docs(i); (ib, tb) = docs(j)
      is = ta.intersect(tb).size.toLong
      if is * is * tDen * tDen >= ta.size.toLong * tb.size * tNum * tNum
    } yield (if (ia < ib) (ia, ib) else (ib, ia))).toSet

  private def runCos(docs: Seq[(String, Set[String])], tNum: Int, tDen: Int) = {
    import spark.implicits._
    val df = docs.map { case (id, t) => (id, t.toSeq) }.toDF("id", "toks")
    SetSimJoin.cosineJoin(df, tNum, tDen)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("cosine differential vs brute force over random token sets") {
    val rnd = new scala.util.Random(23)
    val vocab = (0 until 40).map(i => f"t$i%02d")
    for (trial <- 0 until 5) {
      val docs = (0 until 30).map { i =>
        val k = 1 + rnd.nextInt(12) // singletons included: α = 1 edge
        (f"d$i%02d", rnd.shuffle(vocab).take(k).toSet)
      }
      for ((num, den) <- Seq((1, 2), (7, 10), (9, 10), (1, 1)))
        assert(runCos(docs, num, den) == bruteCos(docs, num, den),
          s"trial $trial t=$num/$den")
    }
  }

  // ---- PPJoin (positional filter) twin ----

  private def runPp(docs: Seq[(String, Set[String])], tNum: Int, tDen: Int) = {
    import spark.implicits._
    val df = docs.map { case (id, t) => (id, t.toSeq) }.toDF("id", "toks")
    SetSimJoin.ppjoin(df, tNum, tDen)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("ppjoin differential: identical result to brute force AND to join()") {
    val rnd = new scala.util.Random(37)
    val vocab = (0 until 40).map(i => f"t$i%02d")
    for (trial <- 0 until 5) {
      val docs = (0 until 30).map { i =>
        val k = 2 + rnd.nextInt(11)
        (f"d$i%02d", rnd.shuffle(vocab).take(k).toSet)
      }
      for ((num, den) <- Seq((1, 2), (7, 10), (9, 10), (1, 1))) {
        val want = brute(docs, num, den)
        assert(runPp(docs, num, den) == want, s"trial $trial t=$num/$den vs brute")
        assert(run(docs, num, den) == want, s"trial $trial t=$num/$den join twin")
      }
    }
  }

  test("positional filter strictly prunes candidates without losing pairs") {
    import spark.implicits._
    // a/b share an 8-token tail behind 2 unique heads (n = 10 each,
    // t = 7/10): the first common token sits at position 3 of both
    // rare-first orders — inside the prefix (len 4), so the pair IS a
    // prefix candidate — but ubound = 1 + min(10−3, 10−3) = 8 < α = 9
    // (true overlap 8, J = 8/12 < 0.7), so the positional bound prunes
    // it before the verification join. c = a exactly, so a–c survives
    // everything (first common token at position 1, ubound 10 ≥ 9).
    val shared = (0 until 8).map(i => s"s$i")
    val docs = Seq(
      ("a", Seq("u1", "u2") ++ shared),
      ("b", Seq("v1", "v2") ++ shared),
      ("c", Seq("u1", "u2") ++ shared))
    val df = docs.toDF("id", "toks")
    val st = SetSimJoin.ppjoinStats(df, 7, 10).collect().head
    val (pre, pos, fin) = (st.getLong(0), st.getLong(1), st.getLong(2))
    assert(pre == 3L, s"all three pairs are prefix candidates: pre=$pre")
    assert(pos == 1L, s"a–b and b–c must be positionally pruned: pos=$pos")
    assert(fin == 1L, "only the identical a–c pair verifies")
    assert(SetSimJoin.join(df, 7, 10).count() == fin)
    assert(runPp(docs.map { case (id, t) => (id, t.toSet) }, 7, 10) == Set(("a", "c")))
  }

  test("ppjoin funnel counts are consistent on random corpora") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val vocab = (0 until 30).map(i => f"v$i%02d")
    val docs = (0 until 25).map { i =>
      val k = 3 + rnd.nextInt(9)
      (f"p$i%02d", rnd.shuffle(vocab).take(k))
    }
    val df = docs.toDF("id", "toks")
    val st = SetSimJoin.ppjoinStats(df, 7, 10).collect().head
    val (pre, pos, fin) = (st.getLong(0), st.getLong(1), st.getLong(2))
    assert(pre >= pos && pos >= fin)
    assert(fin == SetSimJoin.join(df, 7, 10).count())
  }

  test("cosine threshold is inclusive, integer-exact, and sqrt-free") {
    // isect = 2, |a| = 2, |b| = 4 → cos² = 4/8 exactly: cos = 1/√2
    val docs = Seq(("a", Set("1", "2")), ("b", Set("1", "2", "3", "4")))
    // t = 7/10: cos² = 0.5 ≥ 0.49 → kept
    assert(runCos(docs, 7, 10) == Set(("a", "b")))
    // t = 8/10: 0.5·100 = 50 < 64 → dropped (50 vs 64 — no float near-miss)
    assert(runCos(docs, 8, 10).isEmpty)
    // containment pair a ⊂ b, |a| = 3, |b| = 4: cos² = 9/12 = 0.75;
    // the integer predicate is 9·tDen² ≥ 12·tNum²
    val sub = Seq(("a", Set("1", "2", "3")), ("b", Set("1", "2", "3", "4")))
    assert(runCos(sub, 86, 100) == Set(("a", "b"))) // 90000 ≥ 88752 → kept
    assert(runCos(sub, 87, 100).isEmpty)            // 90000 < 90828 → dropped
  }
}
