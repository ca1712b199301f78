package graft

import graft.operators.{Clustering, MatchMerge}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Iterative match-merge: differential against a sequential reference
  * of the round fixpoint, the emergent-merge golden (merge creates a
  * match CC over the original graph cannot), idempotence at the
  * fixpoint, and the convergence guard. */
class MatchMergeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def run(profiles: Seq[(Long, Seq[Long])], num: Int, den: Int,
      maxRounds: Int = MatchMerge.MaxRounds): Map[Long, (Long, Int, Int)] = {
    import spark.implicits._
    MatchMerge.resolve(profiles.toDF("id", "toks"), num, den, maxRounds)
      .as[(Long, Long, Int, Int)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
  }

  /** Sequential reference: rounds of (brute-force match over current
    * entities → union-find CC → union-merge) until a matchless round. */
  private def brute(profiles: Seq[(Long, Seq[Long])], num: Int,
      den: Int): Map[Long, (Long, Int, Int)] = {
    var cur = profiles.map { case (id, ts) => id -> (Set(id), ts.toSet) }.toMap
    var changed = true
    while (changed) {
      val ids = cur.keys.toSeq.sorted
      val pairs = for {
        i <- ids.indices; j <- (i + 1) until ids.size
        a = cur(ids(i))._2; b = cur(ids(j))._2
        if (a & b).size * den >= (a | b).size * num
      } yield (ids(i), ids(j))
      if (pairs.isEmpty) changed = false
      else {
        val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
        def find(x: Long): Long =
          if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
        for ((a, b) <- pairs) {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
        cur = ids.groupBy(find).map { case (root, ms) =>
          root -> (ms.map(cur(_)._1).reduce(_ | _), ms.map(cur(_)._2).reduce(_ | _))
        }
      }
    }
    cur.flatMap { case (eid, (members, toks)) =>
      members.map(m => m -> (eid, members.size, toks.size))
    }
  }

  private val chain = Seq(
    1L -> Seq(1L, 2L, 3L, 4L),          // inner left
    2L -> Seq(3L, 4L, 5L, 6L),          // inner right (matches left: 2/6)
    3L -> Seq(1L, 2L, 5L, 6L, 7L, 8L))  // outer: 2/8 to each inner,
                                        // 4/8 to their union

  test("emergent merge: the outer record joins only AFTER the inners merge") {
    import spark.implicits._
    // premise: CC over the ROUND-1 match graph leaves the outer apart
    val t = (a: Seq[Long], b: Seq[Long]) => {
      val (x, y) = (a.toSet, b.toSet)
      (x & y).size * 3 >= (x | y).size
    }
    assert(t(chain(0)._2, chain(1)._2))
    assert(!t(chain(0)._2, chain(2)._2) && !t(chain(1)._2, chain(2)._2))
    val cc = Clustering.connectedComponents(
      Seq((1L, 2L)).toDF("idA", "idB"), Seq(1L, 2L, 3L).toDF("id"))
      .as[(Long, Long)].collect().toMap
    assert(cc(3L) == 3L, "one-shot CC must NOT absorb the outer record")
    // match-merge does: one entity {1,2,3} with all 8 features
    val got = run(chain, 1, 3)
    assert(got(1L) == ((1L, 3, 8)) && got(2L) == ((1L, 3, 8)) &&
      got(3L) == ((1L, 3, 8)))
  }

  test("differential: distributed fixpoint == sequential reference") {
    val rnd = new scala.util.Random(47)
    for (trial <- 0 until 4) {
      val profiles = (0 until 24).map { i =>
        i.toLong -> (0 until 3 + rnd.nextInt(4)).map(_ => rnd.nextInt(20).toLong).distinct
      }
      val want = brute(profiles, 1, 2)
      // reference may need more rounds than the demo bound on random data
      val got = run(profiles, 1, 2, maxRounds = 8)
      assert(got == want, s"trial $trial")
    }
  }

  test("idempotent at the fixpoint: resolving resolved entities changes nothing") {
    import spark.implicits._
    val resolved = MatchMerge.resolve(chain.toDF("id", "toks"), 1, 3)
    // rebuild entity profiles from the fixpoint and resolve again
    val entities = Seq((1L, Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L)))
    val again = run(entities, 1, 3)
    assert(again(1L) == ((1L, 1, 8)))
    assert(resolved.count() == 3)
  }

  test("convergence guard: a bound too small throws instead of looping blind") {
    val e = intercept[IllegalArgumentException](run(chain, 1, 3, maxRounds = 1))
    assert(e.getMessage.contains("fixpoint"))
  }
}
