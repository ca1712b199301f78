package graft

import graft.operators.CollectiveEr
import org.scalatest.funsuite.AnyFunSuite

/** Collective ER: contextual rescue of borderline pairs, per-channel
  * self-exclusion (no bootstrap from nothing), a genuine CROSS-CHANNEL
  * multi-round propagation chain, monotone fixpoint stability, and an
  * in-memory fixpoint differential on random instances. */
class CollectiveErSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** ctx: id -> Seq((channel, ctx)). Returns pair -> (base, support, final). */
  private def run(pairs: Seq[(String, String, Double)],
      ctx: Map[String, Seq[(String, String)]],
      tauHi: Double, tauLo: Double, minSupport: Int, rounds: Int)
      : Map[(String, String), (Boolean, Long, Boolean)] = {
    val s = spark; import s.implicits._
    val p = pairs.toDF("idA", "idB", "dist")
    val c = ctx.toSeq.flatMap { case (id, chs) => chs.map { case (ch, v) => (id, ch, v) } }
      .toDF("id", "channel", "ctx")
    CollectiveEr.resolve(p, c, tauHi, tauLo, minSupport, rounds)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getBoolean(3), r.getLong(4), r.getBoolean(5))))
      .toMap
  }

  /** Sequential reference: iterate the same monotone rule in memory. */
  private def reference(pairs: Seq[(String, String, Double)],
      ctx: Map[String, Seq[(String, String)]],
      tauHi: Double, tauLo: Double, minSupport: Int, rounds: Int)
      : Map[(String, String), Boolean] = {
    def cpairs(a: String, b: String): Seq[(String, String, String)] = {
      val ca = ctx(a).toMap; val cb = ctx(b).toMap
      ca.keySet.intersect(cb.keySet).toSeq.sorted.map { ch =>
        val (x, y) = (ca(ch), cb(ch))
        (ch, if (x <= y) x else y, if (x <= y) y else x)
      }
    }
    var m = pairs.map { case (a, b, d) => (a, b) -> (d <= tauHi) }.toMap
    for (_ <- 1 to rounds) {
      val aff = pairs.filter { case (a, b, _) => m((a, b)) }
        .flatMap { case (a, b, _) => cpairs(a, b) }
        .groupBy(identity).map { case (k, v) => k -> v.size }
      m = pairs.map { case (a, b, d) =>
        val self = if (m((a, b))) 1 else 0
        val sup = cpairs(a, b).map(cp => aff.getOrElse(cp, 0) - self).sum
        (a, b) -> (d <= tauHi || (d <= tauLo && sup >= minSupport))
      }.toMap
    }
    m
  }

  test("borderline pair rescued by an independent confident pair sharing a channel") {
    val ctx = Map(
      "x1" -> Seq("r" -> "X", "d" -> "p1"), "y1" -> Seq("r" -> "Y", "d" -> "q1"),
      "x2" -> Seq("r" -> "X", "d" -> "p2"), "y2" -> Seq("r" -> "Y", "d" -> "q2"))
    val pairs = Seq(
      ("x1", "y1", 0.005), // confident (base)
      ("x2", "y2", 0.06))  // borderline, shares the (X, Y) repo pair
    val got = run(pairs, ctx, 0.01, 0.08, 1, 3)
    assert(got(("x1", "y1"))._1 && got(("x1", "y1"))._3)
    assert(got(("x2", "y2")) == ((false, 1L, true)), "rescued via the repo channel")
  }

  test("self-exclusion: a lone borderline pair can never bootstrap itself") {
    val ctx = Map("a" -> Seq("r" -> "A", "d" -> "da"), "b" -> Seq("r" -> "B", "d" -> "db"))
    val got = run(Seq(("a", "b", 0.05)), ctx, 0.01, 0.08, 1, 5)
    assert(got(("a", "b")) == ((false, 0L, false)))
  }

  test("two borderline pairs cannot bootstrap each other from nothing") {
    val ctx = Map(
      "a1" -> Seq("r" -> "A"), "b1" -> Seq("r" -> "B"),
      "a2" -> Seq("r" -> "A"), "b2" -> Seq("r" -> "B"))
    val pairs = Seq(("a1", "b1", 0.05), ("a2", "b2", 0.06))
    val got = run(pairs, ctx, 0.01, 0.08, 1, 5)
    assert(got.values.forall { case (base, sup, fin) => !base && sup == 0L && !fin })
  }

  test("cross-channel propagation chain needs exactly two rounds") {
    // P0 (base) shares the repo pair with P1; P1 shares only the DIR
    // pair with P2. Round 1 rescues P1 via repos; round 2 rescues P2
    // via the directory evidence P1 just created. One round is not
    // enough for P2; two are.
    val ctx = Map(
      "a1" -> Seq("r" -> "Ra", "d" -> "D1"), "b1" -> Seq("r" -> "Rb", "d" -> "D2"),
      "a2" -> Seq("r" -> "Ra", "d" -> "Dx"), "b2" -> Seq("r" -> "Rb", "d" -> "Dy"),
      "a3" -> Seq("r" -> "Rc", "d" -> "Dx"), "b3" -> Seq("r" -> "Rd", "d" -> "Dy"))
    val pairs = Seq(
      ("a1", "b1", 0.005),
      ("a2", "b2", 0.05),
      ("a3", "b3", 0.06))
    val one = run(pairs, ctx, 0.01, 0.08, 1, 1)
    assert(one(("a2", "b2"))._3 === true)
    assert(one(("a3", "b3"))._3 === false, "round 1 cannot reach P2")
    val three = run(pairs, ctx, 0.01, 0.08, 1, 3)
    assert(three(("a2", "b2"))._3 === true)
    assert(three(("a3", "b3")) == ((false, 1L, true)), "rescued at round 2 via dirs")
  }

  test("fixpoint: extra rounds never change decisions (monotone); matches reference") {
    val rnd = new scala.util.Random(7)
    val repos = Seq("P", "Q", "R")
    val dirs = Seq("s", "t", "u", "v")
    val ids = (0 until 18).map(i => s"n$i")
    val ctx = ids.map(i =>
      i -> Seq("r" -> repos(rnd.nextInt(3)), "d" -> dirs(rnd.nextInt(4)))).toMap
    val pairs = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if rnd.nextDouble() < 0.2
    } yield (ids(i), ids(j), math.floor(rnd.nextDouble() * 0.12 * 1000) / 1000)).toSeq
    val a = run(pairs, ctx, 0.01, 0.08, 1, 5)
    val b = run(pairs, ctx, 0.01, 0.08, 1, 8)
    assert(a == b, "decisions and support must be at fixpoint by round 5 here")
    val ref = reference(pairs, ctx, 0.01, 0.08, 1, 5)
    assert(a.map { case (k, v) => k -> v._3 } == ref)
    val ref2 = reference(pairs, ctx, 0.01, 0.08, 2, 5)
    val a2 = run(pairs, ctx, 0.01, 0.08, 2, 5)
    assert(a2.map { case (k, v) => k -> v._3 } == ref2, "minSupport=2 differential")
  }
}
