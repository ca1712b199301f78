package graft

import graft.functions.{SmithWatermanFn, SmithWatermanKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Smith–Waterman local alignment: goldens, a DP-free brute-force
  * differential (enumerate ALL increasing matchings, score them by the
  * local-alignment semantics directly), structural properties, matrix ⇄
  * rolling-row agreement, and the codegen + SQL surfaces. */
class SmithWatermanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def u(s: String) = UTF8String.fromString(s)
  private def sw(a: String, b: String): Int =
    SmithWatermanKernel.score(u(a), u(b))

  /** Independent reference: a local alignment IS an increasing matching
    * between positions of a and b; its score is Σ (+Match / −Mismatch)
    * over the aligned pairs minus Gap per unmatched position strictly
    * INSIDE the matched span of either string (characters outside the
    * span are free — that is what makes it local). The score is the max
    * over all matchings, floored at 0 (the empty alignment). Derived
    * straight from the semantics, no DP. */
  private def brute(a: String, b: String): Int = {
    val la = a.length; val lb = b.length
    def enum(i: Int, j: Int): Seq[List[(Int, Int)]] =
      if (i == la) Seq(Nil)
      else enum(i + 1, j) ++
        (j until lb).flatMap(j2 => enum(i + 1, j2 + 1).map((i, j2) :: _))
    val scores = enum(0, 0).map {
      case Nil => 0
      case m =>
        val pairScore = m.map { case (i, j) =>
          if (a(i) == b(j)) SmithWatermanKernel.MatchScore
          else -SmithWatermanKernel.MismatchPenalty
        }.sum
        val spanA = m.last._1 - m.head._1 + 1
        val spanB = m.last._2 - m.head._2 + 1
        val gaps = (spanA - m.length) + (spanB - m.length)
        pairScore - SmithWatermanKernel.GapPenalty * gaps
    }
    math.max(0, scores.max)
  }

  test("goldens: exact match, local core, mismatch vs gap, nothing aligns") {
    assert(sw("abc", "abc") == 6)
    assert(sw("", "abc") == 0 && sw("abc", "") == 0 && sw("", "") == 0)
    assert(sw("abc", "xyz") == 0)             // disjoint alphabets
    assert(sw("xxabcxx", "yyabcyy") == 6)     // flanks are free (local)
    assert(sw("abcdef", "abXdef") == 9)       // 5 matches − 1 mismatch
    assert(sw("ab", "ba") == 2)               // best single-char core
    // one-char gap inside the core beats abandoning the alignment:
    // abdef vs abcdef = 4 matches + gap? abdef aligns ab..def with one
    // gap in the shorter: 5 matches·2 − 1 gap = 9
    assert(sw("abdef", "abcdef") == 9)
  }

  test("differential: kernel == enumeration reference on random strings") {
    val rng = new scala.util.Random(13)
    val alpha = "abc"
    for (n <- 0 until 200) {
      val a = (0 until rng.nextInt(6)).map(_ => alpha(rng.nextInt(3))).mkString
      val b = (0 until rng.nextInt(6)).map(_ => alpha(rng.nextInt(3))).mkString
      assert(sw(a, b) == brute(a, b), s"case $n: '$a' vs '$b'")
    }
  }

  test("structural properties: identity, symmetry, bounds") {
    val rng = new scala.util.Random(17)
    val alpha = "abcd"
    def lcsubstr(a: String, b: String): Int =
      (for (i <- 0 to a.length; j <- i to a.length
            if b.contains(a.substring(i, j))) yield j - i).max
    for (_ <- 0 until 100) {
      val a = (0 until rng.nextInt(10)).map(_ => alpha(rng.nextInt(4))).mkString
      val b = (0 until rng.nextInt(10)).map(_ => alpha(rng.nextInt(4))).mkString
      assert(sw(a, a) == SmithWatermanKernel.MatchScore * a.length)
      assert(sw(a, b) == sw(b, a))
      assert(sw(a, b) <= SmithWatermanKernel.MatchScore * math.min(a.length, b.length))
      // a common substring aligned gap-free is always available
      assert(sw(a, b) >= SmithWatermanKernel.MatchScore * lcsubstr(a, b))
    }
  }

  test("matrix dump: borders zero, dims complete, max == rolling-row score") {
    for ((a, b) <- Seq("kitten" -> "sitting", "abc" -> "", "xy" -> "xy",
        "abcdef" -> "abXdef")) {
      val cells = SmithWatermanKernel.matrix(u(a), u(b))
      assert(cells.length == (a.length + 1) * (b.length + 1))
      assert(cells.forall { case (i, j, h) => (i != 0 && j != 0) || h == 0 })
      val best = if (cells.isEmpty) 0 else cells.map(_._3).max
      assert(best == sw(a, b), s"'$a' vs '$b'")
    }
  }

  test("DataFrame surface: codegen'd, null-safe, inside WholeStageCodegen; SQL registry") {
    val s = spark; import s.implicits._
    SmithWatermanFn.register(spark)
    val df = Seq(
      (Option("kitten"), Option("sitting")),
      (None: Option[String], Option("x")),
      (Option("x"), None: Option[String]))
      .toDF("a", "b")
      .repartition(1)
      .select(SmithWatermanFn.smithWaterman(col("a"), col("b")).as("sw"))
    val rows = df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[smithwaterman""".r.findFirstIn(plan).isDefined,
      s"expected the smith-waterman projection inside a WholeStageCodegen stage:\n$plan")
    assert(rows(0).getInt(0) == sw("kitten", "sitting"))
    assert(rows(1).isNullAt(0) && rows(2).isNullAt(0))
    val viaSql = spark.sql("SELECT smith_waterman('kitten', 'sitting') AS d")
      .collect()(0).getInt(0)
    assert(viaSql == sw("kitten", "sitting"))
  }
}
