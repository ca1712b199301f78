package graft

import graft.operators.{Clustering, HashToMin}
import org.scalatest.funsuite.AnyFunSuite

/** Hash-to-Min CC: differential against an in-memory union-find AND
  * against the star-contraction path on random graphs, logarithmic
  * round growth on path graphs (the headline claim vs naive label
  * propagation), fixpoint sanity on singletons/self-loops/duplicate
  * edges. */
class HashToMinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def unionFind(nodes: Seq[String], edges: Seq[(String, String)])
      : Map[String, String] = {
    val parent = scala.collection.mutable.Map(nodes.map(v => v -> v): _*)
    def find(x: String): String = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    // roots are not guaranteed minimal under naive union; normalize
    val byRoot = nodes.groupBy(find)
    byRoot.flatMap { case (_, ms) => val mn = ms.min; ms.map(_ -> mn) }
  }

  private def run(nodes: Seq[String], edges: Seq[(String, String)])
      : (Map[String, String], Int) = {
    val s = spark; import s.implicits._
    val e = edges.toDF("idA", "idB")
    val n = nodes.toDF("id")
    val (df, rounds) = HashToMin.run(e, n)
    (df.collect().map(r => r.getString(0) -> r.getString(1)).toMap, rounds)
  }

  test("differential: hash-to-min == union-find == star contraction on random graphs") {
    val s = spark; import s.implicits._
    val rng = new scala.util.Random(23)
    for (trial <- 1 to 10) {
      val n = 5 + rng.nextInt(40)
      val nodes = (0 until n).map(i => f"h$trial%02d_$i%02d")
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rng.nextDouble() < 0.08
      } yield (nodes(i), nodes(j)))
      val (got, _) = run(nodes, edges)
      val want = unionFind(nodes, edges)
      assert(got == want, s"trial $trial vs union-find")
      val star = Clustering
        .connectedComponents(edges.toDF("idA", "idB"), nodes.toDF("id"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(got == star, s"trial $trial vs star contraction")
    }
  }

  test("path graph converges in O(log d) rounds, far under the diameter") {
    // 48-node path: naive label propagation needs ~47 rounds;
    // hash-to-min doubles reach per round — well under 12
    val nodes = (0 until 48).map(i => f"p_$i%02d")
    val edges = (0 until 47).map(i => (nodes(i), nodes(i + 1)))
    val (got, rounds) = run(nodes, edges)
    assert(got.values.toSet == Set(nodes.head))
    assert(rounds <= 12, s"rounds=$rounds (diameter 47)")
  }

  test("singletons, duplicate and self edges, empty edge set") {
    val s = spark; import s.implicits._
    val nodes = Seq("a", "b", "c", "d")
    // self loop + duplicate in both orientations
    val edges = Seq(("a", "b"), ("b", "a"), ("c", "c"))
    val (got, _) = run(nodes, edges)
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "c", "d" -> "d"))
    val (empty, rounds0) = run(Seq("x", "y"), Seq.empty)
    assert(empty == Map("x" -> "x", "y" -> "y"))
    assert(rounds0 <= 1, s"empty graph should fixpoint immediately, rounds=$rounds0")
  }
}
