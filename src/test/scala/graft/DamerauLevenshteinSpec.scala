package graft

import graft.functions.{DamerauLevenshteinFn, DamerauLevenshteinKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Unrestricted Damerau–Levenshtein comparator: golden values pinned to
  * DuckDB's independent implementation (the er_damerau oracle), the
  * full-vs-OSA distinction on the canonical cases, metric properties
  * (full DL IS a metric; OSA is not), bounds against a test-local
  * Levenshtein/OSA reference, and the codegen'd DataFrame surface. */
class DamerauLevenshteinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def dl(a: String, b: String): Int =
    DamerauLevenshteinKernel.distance(
      UTF8String.fromString(a), UTF8String.fromString(b))

  /** Test-local OSA (restricted transposition) — a DIFFERENT, simpler
    * published recurrence used as an upper bound + distinction witness,
    * not a copy of the kernel under test. */
  private def osa(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    val d = Array.ofDim[Int](la + 1, lb + 1)
    for (i <- 0 to la) d(i)(0) = i
    for (j <- 0 to lb) d(0)(j) = j
    for (i <- 1 to la; j <- 1 to lb) {
      val cost = if (a(i - 1) == b(j - 1)) 0 else 1
      var m = math.min(d(i - 1)(j) + 1, math.min(d(i)(j - 1) + 1, d(i - 1)(j - 1) + cost))
      if (i > 1 && j > 1 && a(i - 1) == b(j - 2) && a(i - 2) == b(j - 1))
        m = math.min(m, d(i - 2)(j - 2) + 1)
      d(i)(j) = m
    }
    d(la)(lb)
  }

  test("golden values match DuckDB's implementation (probed literals)") {
    val cases = Seq(
      ("martha", "marhta", 1), ("smtih", "smith", 1),
      ("a cat", "an act", 2), ("a cat", "a abct", 2),
      ("abcdef", "badcfe", 3), ("foo/bar.c", "foo/baz.c", 1),
      ("g12/m3.src", "g12/m30.src", 1), ("kitten", "sitting", 3),
      ("xxabc", "abcxx", 4), ("abcde", "edcba", 4),
      ("", "", 0), ("", "abc", 3), ("abc", "", 3),
      ("aa", "aaaa", 2), ("ba", "abc", 2), ("eza", "aeb", 3))
    for ((a, b, e) <- cases)
      assert(dl(a, b) == e, s"dl($a,$b)=${dl(a, b)} expected $e")
  }

  test("full (unrestricted) variant: edits after a transposition are allowed") {
    // the canonical full-vs-OSA witness: CA -> AC -> ABC
    assert(dl("CA", "ABC") == 2)
    assert(osa("CA", "ABC") == 3)
  }

  test("byte-based over UTF-8, matching DuckDB (probed)") {
    assert(dl("é", "e") == 2)   // 2-byte é vs 1-byte e
    assert(dl("öx", "xö") == 2) // multi-byte "transposition" is NOT one op
  }

  test("metric properties + bounds on random strings") {
    val rng = new scala.util.Random(7)
    def randStr() = {
      val n = rng.nextInt(10)
      (0 until n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
    }
    for (_ <- 1 to 3000) {
      val a = randStr(); val b = randStr(); val c = randStr()
      val ab = dl(a, b)
      assert(ab == dl(b, a), s"symmetry $a/$b")
      assert(ab >= math.abs(a.length - b.length), s"length lower bound $a/$b")
      assert(ab <= math.max(a.length, b.length), s"upper bound $a/$b")
      assert(ab <= osa(a, b), s"dl <= osa $a/$b")
      assert((ab == 0) == (a == b), s"identity $a/$b")
      assert(ab <= dl(a, c) + dl(c, b), s"triangle $a/$b via $c")
    }
  }

  test("DataFrame surface: codegen'd expression equals the kernel, null-safe") {
    val s = spark
    import s.implicits._
    DamerauLevenshteinFn.register(s)
    val df = Seq(("martha", "marhta"), ("CA", "ABC"), ("", "x"))
      .toDF("a", "b")
    val got = df.select(DamerauLevenshteinFn.dl($"a", $"b")).as[Int].collect().toSeq
    assert(got == Seq(1, 2, 1))
    val sql = s.sql("SELECT damerau_levenshtein('a cat', 'an act')")
      .collect()(0).getInt(0)
    assert(sql == 2)
    val withNull = df.select(
      DamerauLevenshteinFn.dl(lit(null).cast("string"), $"b")).collect()
    assert(withNull.forall(_.isNullAt(0)))
  }
}
