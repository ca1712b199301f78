package graft

import graft.operators.Feedback
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Clerical-feedback constrained clustering: edge edits, indirect-path
  * violations, the deterministic π-larger eviction, and the repair
  * guarantee (no cannot-link pair co-clustered afterwards — ever). */
class FeedbackSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def pi(id: String) = md5hex(id) + id

  private def run(edges: Seq[(String, String)], must: Seq[(String, String)],
                  cannot: Seq[(String, String)], nodes: Seq[String]) = {
    val s = spark; import s.implicits._
    Feedback.constrainedClusters(
        edges.toDF("idA", "idB"), must.toDF("idA", "idB"),
        cannot.toDF("idA", "idB"), nodes.toDF("id"))
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
  }

  test("cannot-link removes the edge; must-link adds one; direct effect") {
    val got = run(
      edges = Seq("a" -> "b", "c" -> "d"),
      must = Seq("b" -> "c"),
      cannot = Seq("c" -> "d"),
      nodes = Seq("a", "b", "c", "d", "e"))
    // a-b-c connected via the must-link; c-d edge removed; e singleton
    assert(got("a")._1 == got("b")._1 && got("b")._1 == got("c")._1)
    assert(got("d")._1 != got("c")._1)
    assert(got("e")._1 == "e")
    assert(got.values.forall(_._2 == 0), "no eviction needed")
  }

  test("indirect violation: the pi-larger endpoint is evicted to a singleton") {
    // x-y-z chain; cannot(x, z) is violated through y
    val got = run(
      edges = Seq("x" -> "y", "y" -> "z"),
      must = Seq(), cannot = Seq("x" -> "z"),
      nodes = Seq("x", "y", "z"))
    val loser = if (pi("x") > pi("z")) "x" else "z"
    val keeper = if (loser == "x") "z" else "x"
    assert(got(loser) == (s"ev:$loser", 1), "pi-larger endpoint evicted to singleton")
    assert(got(keeper)._1 == got("y")._1 && got(keeper)._2 == 0)
    assert(got(loser)._1 != got(keeper)._1)
  }

  test("must outranks cannot: the endpoint WITH a confirmed partner is spared") {
    // x-y-z chain, cannot(x, z); must(x, y) protects x even when x is
    // the pi-larger endpoint — z is evicted instead
    for ((a, c) <- Seq(("x", "z"), ("z", "x"))) {
      val got = run(
        edges = Seq(a -> "y", "y" -> c),
        must = Seq(a -> "y"), cannot = Seq(a -> c),
        nodes = Seq(a, "y", c))
      assert(got(c) == (s"ev:$c", 1), s"unprotected $c must be evicted")
      assert(got(a)._1 == got("y")._1 && got(a)._2 == 0,
        "the must-linked endpoint stays with its confirmed partner")
    }
  }

  test("repair guarantee: no cannot pair co-clustered after, on random graphs") {
    val rng = new scala.util.Random(41)
    for (trial <- 1 to 6) {
      val n = 14 + rng.nextInt(10)
      val nodes = (0 until n).map(i => f"t${trial}n$i%02d")
      val edges = for {
        i <- 0 until n; j <- (i + 1) until n if rng.nextDouble() < 0.15
      } yield (nodes(i), nodes(j))
      val cannot = for {
        i <- 0 until n; j <- (i + 1) until n if rng.nextDouble() < 0.08
      } yield (nodes(i), nodes(j))
      val got = run(edges, Seq(), cannot, nodes)
      for ((a, b) <- cannot)
        assert(got(a)._1 != got(b)._1, s"trial $trial: cannot($a,$b) co-clustered")
      // evicted nodes are singletons, and only violated endpoints pay
      for ((id, (c, ev)) <- got if ev == 1) assert(c == s"ev:$id")
    }
  }
}
