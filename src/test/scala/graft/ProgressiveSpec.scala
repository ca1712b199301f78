package graft

import graft.operators.Progressive
import org.scalatest.funsuite.AnyFunSuite

/** Progressive ER quality curve: differential against a sequential
  * replica of the schedule (sort, integer deciles, cumulative recall),
  * the front-loading property under a perfect proxy, and determinism
  * of the tie-break. */
class ProgressiveSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(pairs: Seq[(String, String, Long)],
      labels: Seq[(String, Int)]): Array[(Int, Long, Long, Double, Double)] = {
    import spark.implicits._
    Progressive.curve(
        pairs.toDF("idA", "idB", "weight"),
        labels.toDF("id", "groupId"), parts = 4)
      .orderBy("decile")
      .as[(Int, Long, Long, Double, Double)].collect()
  }

  /** Sequential replica straight from the schedule definition. */
  private def brute(pairs: Seq[(String, String, Long)],
      labels: Map[String, Int]): Seq[(Int, Long, Long, Double, Double)] = {
    val n = pairs.size.toLong
    def dup(a: String, b: String) =
      labels(a) == labels(b) && labels(a) >= 0
    val ranked = pairs.sortBy { case (a, b, w) => (-w, a, b) }.zipWithIndex
      .map { case ((a, b, _), i) => (i + 1L, dup(a, b)) }
    val captured = ranked.count(_._2).toLong
    val truthTotal = labels.filter(_._2 >= 0).groupBy(_._2).values
      .map(g => g.size.toLong * (g.size - 1) / 2).sum
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    (1 to 10).map { d =>
      val inBudget = ranked.filter { case (r, _) => (r * 10 + n - 1) / n <= d }
      val nTrue = inBudget.count(_._2).toLong
      (d, inBudget.size.toLong, nTrue,
        r6(nTrue.toDouble / captured), r6(nTrue.toDouble / truthTotal))
    }
  }

  test("differential vs the sequential schedule on random inputs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 4) {
      val ids = (0 until 30).map(i => f"x$i%02d")
      val labels = ids.map(i => i -> (rnd.nextInt(8) - 1)) // −1 = no group
      val lm = labels.toMap
      val pairs = (for {
        i <- ids.indices; j <- (i + 1) until ids.size
        if rnd.nextBoolean()
      } yield (ids(i), ids(j), rnd.nextInt(5).toLong)).toSeq
      if (pairs.nonEmpty && pairs.exists(p => lm(p._1) == lm(p._2) && lm(p._1) >= 0)
          && labels.exists(_._2 >= 0)) {
        assert(run(pairs, labels) sameElements brute(pairs, lm), s"trial $trial")
      }
    }
  }

  test("perfect proxy front-loads every duplicate into the earliest deciles") {
    val ids = (0 until 40).map(i => f"x$i%02d")
    // 4 dup pairs among 40 ids; everything else singleton
    val labels = ids.zipWithIndex.map { case (id, i) =>
      id -> (if (i < 8) i / 2 else -1) }
    val lm = labels.toMap
    val allPairs = for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (ids(i), ids(j),
        if (lm(ids(i)) == lm(ids(j)) && lm(ids(i)) >= 0) 10L else 0L)
    val curve = run(allPairs, labels)
    // 4 true pairs of 780 → all fall inside decile 1 under the perfect proxy
    assert(curve.head._3 == 4L && curve.head._4 == 1.0 && curve.head._5 == 1.0)
    // cumulative pair counts partition the schedule (last = all pairs)
    assert(curve.last._2 == allPairs.size.toLong)
    assert(curve.map(_._2).toSeq == curve.map(_._2).toSeq.sorted)
  }

  test("deterministic: weight ties broken by ids — identical reruns") {
    val ids = (0 until 12).map(i => s"x$i")
    // one dup group keeps both recall denominators nonzero
    val labels = ids.map(i => i -> (if (i == "x0" || i == "x1") 0 else -1))
    val pairs = for (i <- ids.indices; j <- (i + 1) until ids.size)
      yield (ids(i), ids(j), 1L) // all tied
    val a = run(pairs, labels).map(r => (r._1, r._2, r._3))
    val b = run(pairs, labels).map(r => (r._1, r._2, r._3))
    assert(a sameElements b)
  }
}
