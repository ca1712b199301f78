package graft

import graft.operators.PivotClustering
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** CC-Pivot via parallel greedy-MIS rounds: exact differential against
  * an in-memory SEQUENTIAL CC-Pivot scan under the same π on random
  * graphs, MIS structural properties, over-merge resistance vs
  * connected components, and singleton handling. */
class PivotClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def pi(id: String): String = md5hex(id) + id

  /** The sequential specification: scan nodes in π order; an
    * unclustered node becomes a pivot and absorbs every still-
    * unclustered neighbor. Returns id -> (clusterId, isPivot). */
  private def sequential(nodes: Seq[String], edges: Seq[(String, String)])
      : Map[String, (String, Int)] = {
    val nb = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val assigned = scala.collection.mutable.Map.empty[String, (String, Int)]
    for (v <- nodes.sortBy(pi)) {
      if (!assigned.contains(v)) {
        assigned(v) = (v, 1)
        for (u <- nb.getOrElse(v, Set.empty) if !assigned.contains(u))
          assigned(u) = (v, 0)
      }
    }
    assigned.toMap
  }

  private def run(nodes: Seq[String], edges: Seq[(String, String)])
      : Map[String, (String, Int)] = {
    val s = spark; import s.implicits._
    val e = edges.toDF("src", "dst")
    val n = nodes.toDF("id")
    PivotClustering.cluster(e, n).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2))).toMap
  }

  test("differential: distributed rounds == sequential scan on random graphs") {
    val rng = new scala.util.Random(11)
    for (trial <- 1 to 12) {
      val n = 5 + rng.nextInt(30)
      val nodes = (0 until n).map(i => f"n$trial%02d_$i%02d")
      val edges = (for {
        i <- 0 until n; j <- (i + 1) until n
        if rng.nextDouble() < 0.12
      } yield (nodes(i), nodes(j)))
      val got = run(nodes, edges)
      val want = sequential(nodes, edges)
      assert(got == want, s"trial $trial: $got vs $want")
    }
  }

  test("pivot set is a maximal independent set; assignment is pi-min pivot neighbor") {
    val nodes = (0 until 24).map(i => f"m$i%02d")
    val rng = new scala.util.Random(5)
    val edges = (for {
      i <- 0 until 24; j <- (i + 1) until 24 if rng.nextDouble() < 0.2
    } yield (nodes(i), nodes(j)))
    val got = run(nodes, edges)
    val pivots = got.filter(_._2._2 == 1).keySet
    val nb = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    for ((a, b) <- edges)
      assert(!(pivots(a) && pivots(b)), s"independence violated: $a-$b")
    for (v <- nodes if !pivots(v)) {
      val pvNb = nb.getOrElse(v, Set.empty).filter(pivots)
      assert(pvNb.nonEmpty, s"maximality violated at $v")
      assert(got(v)._1 == pvNb.minBy(pi), s"not pi-min pivot at $v")
      assert(pi(got(v)._1) < pi(v), "assigned pivot precedes the node in pi")
    }
  }

  test("over-merge resistance: a path clusters into stars, never one chain") {
    // p0-p1-p2-p3-p4: CC would produce ONE cluster; CC-Pivot must not
    val nodes = (0 to 4).map(i => s"p$i")
    val edges = (0 to 3).map(i => (s"p$i", s"p${i + 1}"))
    val got = run(nodes, edges)
    assert(got.values.map(_._1).toSet.size >= 2)
    assert(got == sequential(nodes, edges))
  }

  test("isolated nodes become singleton pivots with round 0") {
    val s = spark; import s.implicits._
    val got = PivotClustering.cluster(
      Seq(("a", "b")).toDF("src", "dst"),
      Seq("a", "b", "lonely").toDF("id")).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(got("lonely") == ("lonely", 1, 0))
    assert(got.size == 3)
    val pivotAb = Seq("a", "b").minBy(pi)
    assert(got(pivotAb)._1 == pivotAb && got(pivotAb)._2 == 1)
  }
}
