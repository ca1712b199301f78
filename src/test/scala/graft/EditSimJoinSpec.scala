package graft

import graft.operators.EditSimJoin
import org.scalatest.funsuite.AnyFunSuite

/** Exact edit-distance join: hand cases across the gram/short-band
  * boundary, then a randomized differential against an in-memory
  * brute-force Levenshtein over all pairs — the no-false-negatives
  * contract checked directly at several (k, q). */
class EditSimJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val cur = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = cur
      }
    }
    d(a.length)
  }

  private def run(rows: Seq[(String, String)], k: Int, q: Int = 2) = {
    import spark.implicits._
    EditSimJoin.join(rows.toDF("id", "s"), k, q)
      .as[(String, String, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
  }

  private def brute(rows: Seq[(String, String)], k: Int) = (for {
    (a, sa) <- rows; (b, sb) <- rows if a < b
    d = lev(sa, sb) if d <= k
  } yield (a, b) -> d).toMap

  test("hand case: path-like strings, k=1 — siblings and near-misses") {
    val rows = Seq(
      "p1" -> "g5/m0.src", "p2" -> "g5/m1.src", // substitute: dist 1
      "p3" -> "g6/m0.src", // vs p1 dist 1, vs p2 dist 2
      "p4" -> "g50/m0.src", // vs p1 dist 1 (insert); vs p3 dist 2 (sub+ins)
      "p5" -> "h7/x9.bin") // matches nothing
    val got = run(rows, 1)
    assert(got == Map(("p1", "p2") -> 1, ("p1", "p3") -> 1, ("p1", "p4") -> 1))
  }

  test("short band: empties and sub-gram strings are not lost") {
    val rows = Seq("a" -> "", "b" -> "x", "c" -> "xy", "d" -> "zz",
      "e" -> "xyz", "f" -> "wxyz")
    val got = run(rows, 1)
    assert(got == brute(rows, 1), s"got=$got brute=${brute(rows, 1)}")
    // "" vs "x" (dist 1) crosses the empty-gram hole the short band plugs
    assert(got(("a", "b")) == 1 && got(("c", "e")) == 1)
  }

  test("duplicate string values meet at distance 0") {
    val rows = Seq("i1" -> "same", "i2" -> "same", "i3" -> "samX")
    val got = run(rows, 0)
    assert(got == Map(("i1", "i2") -> 0))
  }

  test("randomized differential vs brute force at (k,q) = (1,2),(2,2),(1,3)") {
    val rng = new scala.util.Random(13)
    val rows = (0 until 140).map { i =>
      val n = rng.nextInt(9)
      f"s$i%03d" -> (0 until n).map(_ => ('a' + rng.nextInt(3)).toChar).mkString
    }
    for ((k, q) <- Seq((1, 2), (2, 2), (1, 3))) {
      val got = run(rows, k, q)
      val want = brute(rows, k)
      assert(got == want,
        s"(k=$k,q=$q) missing=${(want.keySet -- got.keySet).take(5)} " +
          s"extra=${(got.keySet -- want.keySet).take(5)}")
    }
  }
}
